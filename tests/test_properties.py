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


# --------------------------------------------------------------------------
# Cross-page table merge under shard cuts (pdf_parser.py:701-716 semantics;
# phase A ships raw table_cells fragments, phase B merges + renders —
# stages/extract.py render path). Property: the rendered output must be
# SHARD-POSITION INVARIANT — wherever the page-range cut falls (including
# inside a multi-page row cluster, and between two abutting tables), the
# sharded pipeline must reproduce the unsharded output exactly.

def _tbox(t, x0, top, page, lay="table", **tags):
    import json

    d = {"t": t, "x0": float(x0), "x1": float(x0) + 80.0, "top": float(top),
         "bot": float(top) + 18.0, "page": page, "lay": lay, **tags}
    return {"kind": "box", "text": json.dumps(d, sort_keys=True),
            "media_ref": "", "offset": 0}


def _body(t, page, top):
    import json

    d = {"t": t, "x0": 60.0, "x1": 540.0, "top": float(top),
         "bot": float(top) + 20.0, "page": page, "lay": "text"}
    return {"kind": "box", "text": json.dumps(d, sort_keys=True),
            "media_ref": "", "offset": 0}


def _table_doc(tables, n_pages=15):
    """Build a page-ordered span list: 2 body lines per page + the given
    tables. Each table: (start_page, n_pages_spanned, rows_per_page,
    hug_top, tagged). hug_top puts continuation rows at the very top of
    the next page (the cut falls INSIDE the visual row cluster); tagged
    tables carry explicit row/col/tno."""
    spans = []
    for page in range(n_pages):
        for ti, (p0, span_pages, rpp, hug, tagged) in enumerate(tables):
            if p0 <= page < p0 + span_pages:
                local = page - p0
                base_top = 30.0 if (hug and local > 0) else 700.0
                for r in range(rpp):
                    row_abs = local * rpp + r
                    for c in range(2):
                        tags = ({"row": row_abs, "col": c, "tno": ti}
                                if tagged else {})
                        spans.append(_tbox(f"t{ti}r{row_abs}c{c}",
                                           60 + 140 * c,
                                           base_top + 25 * r, page, **tags))
        for i in range(2):
            spans.append(_body(f"body {page}-{i}.", page, 200.0 + 60 * i))
    return spans


@given(
    st.lists(
        st.tuples(st.integers(0, 12),      # start page
                  st.integers(1, 3),       # pages spanned
                  st.integers(1, 2),       # rows per page
                  st.booleans(),           # hug_top (cut inside row cluster)
                  st.booleans()),          # tagged (row/col/tno) vs inferred
        min_size=1, max_size=3),
    st.sampled_from([8, 12, 20, 40]),      # shard_span_threshold sweep —
)                                          # moves the cut position around
@settings(max_examples=40, deadline=None)
def test_table_render_shard_position_invariance(tables, threshold):
    from ragflow_core16_ray.stages.extract import extract_doc

    spans = _table_doc(tables)
    _, unsharded, one = extract_doc(spans, ExtractConfig())
    assert one == 1
    _, sharded, n_shards = extract_doc(
        spans, ExtractConfig(shard_span_threshold=threshold))
    assert [(s["kind"], s["text"]) for s in sharded] == \
        [(s["kind"], s["text"]) for s in unsharded]


def test_two_distinct_untagged_tables_abutting_the_cut():
    """Two untagged tables on pages 11 and 12 (the 12-page task cut falls
    between them): the ≤1-page proximity rule merges them — the same
    best-effort continuation contract as the unsharded parse — and the
    sharded result must equal the unsharded one. At a ≥2-page gap they
    stay separate tables in both."""
    from ragflow_core16_ray.stages.extract import extract_doc

    def doc(gap):
        return _table_doc([(11, 1, 2, False, False),
                           (12 + gap, 1, 2, False, False)], n_pages=16)

    for gap in (0, 2):
        spans = doc(gap)
        _, unsharded, _ = extract_doc(spans, ExtractConfig())
        _, sharded, n_shards = extract_doc(
            spans, ExtractConfig(shard_span_threshold=12))
        assert n_shards > 1
        assert [(s["kind"], s["text"]) for s in sharded] == \
            [(s["kind"], s["text"]) for s in unsharded]
        rows = [s["text"] for s in sharded if s["kind"] == "table_row"]
        if gap == 0:
            # adjacent pages: one merged table, all four rows contiguous
            assert len(rows) == 4
            assert any("t0r0c0" in r for r in rows)
            assert any("t1r0c0" in r for r in rows)
        else:
            # two pages apart: still four rows but from two separate
            # renders — each table's own grid, no cross-contamination
            assert len(rows) == 4


# --- PII regex: Python (re.ASCII) vs DuckDB (RE2) agreement ---------------
# The pii_scrub oracle hashes the redacted text, so ANY divergence between
# the two regex engines on any input is a correctness bug. Hypothesis
# sweeps adversarial text (digits, dots, @, CJK adjacency, long octets)
# through both engines and demands byte-identical redaction + counts.

_PII_ALPHABET = st.sampled_from(
    list("ab1.9@-+ \n\t") + ["中", "編", "№", "x", "%", "_"])
_PII_TEXT = st.lists(_PII_ALPHABET, max_size=60).map("".join)


@given(_PII_TEXT)
@settings(max_examples=120, deadline=None)
def test_pii_redaction_matches_duckdb_and_is_fixpoint(text):
    import duckdb

    from ragflow_core16_ray.pipelines.text_analysis import (_PII_EMAIL,
                                                            _PII_EMAIL_RE,
                                                            _PII_IPV4,
                                                            _PII_IPV4_RE,
                                                            _PII_PHONE,
                                                            _PII_PHONE_RE)

    t1 = _PII_EMAIL_RE.sub("<EMAIL>", text)
    t2 = _PII_IPV4_RE.sub("<IP>", t1)
    t3 = _PII_PHONE_RE.sub("<PHONE>", t2)

    con = duckdb.connect()
    got = con.execute(
        "SELECT regexp_replace(regexp_replace(regexp_replace(?, ?, "
        "'<EMAIL>', 'g'), ?, '<IP>', 'g'), ?, '<PHONE>', 'g')",
        [text, _PII_EMAIL, _PII_IPV4, _PII_PHONE]).fetchone()[0]
    assert got == t3

    # redaction is a fixpoint: a second pass changes nothing (replacement
    # tokens cannot re-match any pattern)
    u1 = _PII_EMAIL_RE.sub("<EMAIL>", t3)
    u2 = _PII_IPV4_RE.sub("<IP>", u1)
    assert _PII_PHONE_RE.sub("<PHONE>", u2) == t3


@given(_PII_TEXT)
@settings(max_examples=120, deadline=None)
def test_pii_counts_match_duckdb(text):
    import duckdb

    from ragflow_core16_ray.pipelines.text_analysis import (_PII_EMAIL,
                                                            _PII_EMAIL_RE,
                                                            _PII_IPV4,
                                                            _PII_IPV4_RE)

    con = duckdb.connect()
    n_em_sql, = con.execute(
        "SELECT len(regexp_extract_all(?, ?))",
        [text, _PII_EMAIL]).fetchone()
    assert n_em_sql == len(_PII_EMAIL_RE.findall(text))
    t1 = _PII_EMAIL_RE.sub("<EMAIL>", text)
    n_ip_sql, = con.execute(
        "SELECT len(regexp_extract_all(?, ?))",
        [t1, _PII_IPV4]).fetchone()
    assert n_ip_sql == len(_PII_IPV4_RE.findall(t1))


@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=1, max_size=60),
       st.integers(1, 8))
@settings(max_examples=25, deadline=None)
def test_label_propagation_equals_union_find_property(ray_session,
                                                      edges, n_buckets):
    """Distributed min-label CC == a local union-find on arbitrary
    graphs (self-loops, duplicate edges, any bucketing)."""
    import pandas as pd

    from ragflow_core16_ray.pipelines.dedup import _cc_label_propagation

    pairs = pd.DataFrame({"id_a": [a for a, _ in edges],
                          "id_b": [b for _, b in edges]})
    got = _cc_label_propagation(pairs, n_buckets=n_buckets)

    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    want = sorted((n, find(n)) for n in parent)
    assert list(zip(got["doc_id"], got["cluster_id"])) == want


@given(st.lists(st.text(alphabet="abcd ", min_size=0, max_size=12),
                min_size=1, max_size=24),
       st.integers(1, 4))
@settings(max_examples=10, deadline=None)
def test_incremental_bloom_equals_exact_property(ray_session, tmp_path_factory,
                                                 texts, bits):
    """Bloom fast path == exact anti-join on arbitrary corpora (dup-heavy
    tiny alphabet) at any filter size, including 1-bit/key filters that
    are mostly false positives."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.dedup import (incremental_dedup,
                                                    incremental_dedup_bloom)

    tmp = tmp_path_factory.mktemp("bloomprop")
    df = pd.DataFrame({
        "doc_id": pd.array(range(len(texts)), dtype="int64"),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": [f"src{i % 4}" for i in range(len(texts))],
        "n_chars": pd.array([len(t) for t in texts], dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp / "documents.parquet"))

    def ids(ds):
        df = ds.to_pandas()
        # a fully-filtered Dataset loses its schema in to_pandas
        return sorted(df["doc_id"]) if "doc_id" in df.columns else []

    want = ids(incremental_dedup(str(tmp)))
    got = ids(incremental_dedup_bloom(str(tmp), bits_per_key=bits,
                                      k_hashes=2))
    assert got == want


@given(st.lists(st.text(alphabet="ab \n\t", min_size=0, max_size=80),
                min_size=1, max_size=12),
       st.integers(2, 9), st.integers(1, 9))
@settings(max_examples=10, deadline=None)
def test_sliding_chunks_cover_property(ray_session, tmp_path_factory,
                                       texts, size, stride):
    """For any corpus and window geometry: windows tile every token
    stream with the declared stride, cover all tokens, never exceed
    ``size``, and the union of [start, start+n) intervals is exactly
    [0, n_tokens)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.text_analysis import sliding_chunks

    stride = min(stride, size)
    tmp = tmp_path_factory.mktemp("slidep")
    df = pd.DataFrame({
        "doc_id": pd.array(range(len(texts)), dtype="int64"),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["src0"] * len(texts),
        "n_chars": pd.array([len(t) for t in texts], dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp / "documents.parquet"))

    out = sliding_chunks(str(tmp), size=size, stride=stride).to_pandas()
    plans = (out.groupby("doc_id") if len(out) else [])
    seen = set(out["doc_id"]) if len(out) else set()
    for did, t in zip(df["doc_id"], df["text"]):
        n = len(t.split())
        if n == 0:
            assert did not in seen
            continue
        g = out[out["doc_id"] == did].sort_values("chunk_idx")
        assert list(g["chunk_idx"]) == list(range(len(g)))
        assert list(g["start_tok"]) == [i * stride for i in range(len(g))]
        assert (g["n_toks"] <= size).all() and (g["n_toks"] > 0).all()
        covered = set()
        for s, k in zip(g["start_tok"], g["n_toks"]):
            covered |= set(range(s, s + k))
        assert covered == set(range(n))


# ------------------------------------------------- round-4 codec fuzz ----

@given(st.integers(1, 40), st.integers(1, 40),
       st.sampled_from([None, 3, 4]), st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(h, w, channels, seed):
    import numpy as np

    from ragflow_core16_ray.functions.png import decode_png, encode_png

    shape = (h, w) if channels is None else (h, w, channels)
    arr = np.random.RandomState(seed).randint(0, 256, shape).astype("uint8")
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape and (out == arr).all()


@given(st.lists(st.text(alphabet="ABCXYZ 0123", min_size=0, max_size=20),
                min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_glyph_ocr_roundtrip_property(lines):
    from ragflow_core16_ray.functions.glyphs import (normalize_text,
                                                     ocr_glyphs, render_text)

    want = [normalize_text(ln).rstrip() for ln in lines]
    while want and not want[-1]:
        want.pop()
    assert ocr_glyphs(render_text(lines)) == "\n".join(want)


@given(st.lists(st.lists(
    st.tuples(st.integers(20, 500),        # x
              st.integers(40, 900),        # top
              st.sampled_from([8, 10, 14]),  # size
              st.text(alphabet=st.characters(codec="ascii",
                                             categories=("L", "N", "Zs")),
                      min_size=1, max_size=40)),
    max_size=5), min_size=1, max_size=3))
@settings(max_examples=30, deadline=None)
def test_pdf_build_parse_recovers_text(pages):
    import json

    from ragflow_core16_ray.functions.pdf_bytes import build_pdf, pdf_to_boxes

    # line assembly may merge same-baseline shows (inserting at most a
    # single space at word gaps), so the invariant is per-page character
    # preservation modulo whitespace — no glyph lost, none invented
    def keyof(pairs):
        out = {}
        for pno, t in pairs:
            out.setdefault(pno, []).extend(c for c in t if not c.isspace())
        return {p: sorted(cs) for p, cs in out.items() if cs}

    want = keyof((pno, t.strip()) for pno, lines in enumerate(pages)
                 for (_, _, _, t) in lines if t.strip())
    boxes = pdf_to_boxes(build_pdf(
        [list(lines) for lines in pages], media_box=(600.0, 1000.0)))
    got = keyof((json.loads(b["text"])["page"],
                 json.loads(b["text"])["t"]) for b in boxes)
    assert got == want


@given(st.binary(max_size=2000))
@settings(max_examples=120, deadline=None)
def test_warc_parse_never_crashes(data):
    from ragflow_core16_ray.sources.warc import _parse_records

    rows = _parse_records(data, "fuzz")
    # every row is typed; corrupt rows carry the sentinel shape
    for r in rows:
        assert r["warc_type"] == "corrupt" or isinstance(r["body"], bytes)
        assert isinstance(r["http_status"], int)


@given(st.lists(st.tuples(st.text(max_size=40), st.binary(max_size=200)),
                max_size=6))
@settings(max_examples=60, deadline=None)
def test_warc_build_parse_roundtrip_bodies(recs):
    import gzip

    from ragflow_core16_ray.sources.warc import (_parse_records,
                                                 build_warc_gz)

    # URIs must be header-safe: no CR/LF injection from the fuzz text
    clean = [{"uri": u.replace("\r", "").replace("\n", ""),
              "payload": b, "mime": "application/octet-stream"}
             for u, b in recs]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "f.warc.gz")
        build_warc_gz(clean, path)
        rows = _parse_records(gzip.decompress(open(path, "rb").read()),
                              path)
    assert [r["body"] for r in rows] == [r["payload"] for r in clean]
    assert all(r["warc_type"] == "response" for r in rows)


@given(st.binary(min_size=0, max_size=400),
       st.sampled_from([b"/Filter /FlateDecode", b"/Filter /LZWDecode",
                        b"/Filter /ASCII85Decode",
                        b"/Filter /ASCIIHexDecode",
                        b"/Filter /RunLengthDecode",
                        b"/Filter [ /ASCIIHexDecode /FlateDecode ]",
                        b"/Filter /FlateDecode /DecodeParms "
                        b"<< /Predictor 12 /Columns 5 >>"]))
@settings(max_examples=80, deadline=None)
def test_filter_chain_never_crashes_on_garbage(raw, filt):
    # arbitrary stream bytes through any filter chain: decoded bytes or
    # None (treated as no-text), never an exception
    from ragflow_core16_ray.functions.pdf_bytes import _apply_filters

    body = b"<< /Length " + str(len(raw)).encode() + b" " + filt \
        + b" >>\nstream\n" + raw + b"\nendstream"
    out = _apply_filters(body, raw)
    assert out is None or isinstance(out, bytes)
