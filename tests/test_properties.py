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
