"""Property-based tests (hypothesis) for the pure function library."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ragflow_core16_ray.config import ExtractConfig
from ragflow_core16_ray.functions.merge import naive_merge, split_on_delimiters
from ragflow_core16_ray.functions.txt_json import json_split, txt_split
from ragflow_core16_ray.stages.shard import split_shards

TEXT = st.text(
    alphabet=st.characters(codec="utf-8",
                           categories=("L", "N", "P", "Zs")),
    max_size=200)


@given(st.lists(TEXT, max_size=20), st.integers(1, 64))
@settings(max_examples=50, deadline=None)
def test_naive_merge_preserves_text(sections, budget):
    chunks = naive_merge(sections, chunk_token_num=budget)
    # every non-whitespace char of input appears in output (order kept);
    # merging only inserts newlines and strips edges
    want = "".join("".join(s.split()) for s in sections)
    got = "".join("".join(c.split()) for c in chunks)
    assert got == want


@given(TEXT)
@settings(max_examples=50, deadline=None)
def test_split_on_delimiters_roundtrip(text):
    pieces = split_on_delimiters(text, "\n!?。；！？.")
    assert "".join(pieces) == text


@given(TEXT, st.integers(1, 32))
@settings(max_examples=50, deadline=None)
def test_txt_split_preserves_nonspace(text, budget):
    chunks = txt_split(text, chunk_token_num=budget)
    assert "".join("".join(c.split()) for c in chunks) == \
        "".join(text.split())


@given(st.integers(1, 500), st.integers(1, 64))
@settings(max_examples=30, deadline=None)
def test_split_shards_partitions_exactly(n_spans, threshold):
    spans = [{"kind": "text", "text": f"t{i}", "media_ref": "", "offset": i}
             for i in range(n_spans)]
    cfg = ExtractConfig(shard_span_threshold=threshold)
    shards = split_shards(spans, "naive", cfg)
    flat = [s for sh in shards for s in sh]
    assert flat == spans


@given(st.recursive(
    st.one_of(st.integers(-1000, 1000), st.text(max_size=30), st.booleans()),
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=8), children, max_size=5)),
    max_leaves=20))
@settings(max_examples=40, deadline=None)
def test_json_split_valid_json(obj):
    import json

    for chunk in json_split(obj, max_size=100):
        json.loads(chunk)  # every chunk is valid JSON


@given(st.lists(st.text(alphabet="数据流处理引擎学研究生命科学xyz", min_size=1,
                        max_size=8), max_size=12))
@settings(max_examples=50, deadline=None)
def test_fine_grained_preserves_chars(tokens):
    from ragflow_core16_ray.functions.tokenizer import fine_grained_tokenize

    out = fine_grained_tokenize(tokens)
    # re-segmentation never invents or drops characters ('/' separators
    # may be dropped on the non-CJK path)
    assert "".join(out).replace("/", "") == \
        "".join(tokens).replace("/", "")


@given(st.lists(st.tuples(st.integers(0, 2),          # page
                          st.integers(0, 40),         # top slot
                          st.integers(0, 5)),         # col slot
                min_size=1, max_size=30))
@settings(max_examples=50, deadline=None)
def test_infer_grid_invariants(slots):
    from ragflow_core16_ray.functions.pdfish import Box, _infer_grid

    cells = [Box(f"c{i}", 60.0 + 100 * c, 140.0 + 100 * c,
                 float(20 * t), float(20 * t + 15), p, "table")
             for i, (p, t, c) in enumerate(slots)]
    _infer_grid(cells)
    # every cell got a grid position
    assert all(c.row is not None and c.col is not None for c in cells)
    # rows follow (page, top): sorting by assigned row never inverts page
    # order, and within a page never inverts top order beyond the cluster
    for a in cells:
        for b in cells:
            if a.page < b.page:
                assert a.row < b.row or (a.row is None)
            if a.page == b.page and a.row < b.row:
                assert a.top <= b.top
    # columns follow x0 ordering
    for a in cells:
        for b in cells:
            if a.col < b.col:
                assert a.x0 < b.x0
