"""html4excel table form (deepdoc/parser/excel_parser.py:73-103 semantics
behind the parser_config flag, rag/app/naive.py:418)."""

from ragflow_core16_ray.config import ExtractConfig
from ragflow_core16_ray.functions.table import tsv_to_html_chunks
from ragflow_core16_ray.schemas import make_span
from ragflow_core16_ray.stages.extract import extract_doc


def test_tsv_to_html_chunks_shape():
    rows = ["a\tb"] + [f"{i}\t{i * 2}" for i in range(30)]
    chunks = tsv_to_html_chunks(rows, chunk_rows=12)
    assert len(chunks) == 3  # 30 rows → 12 + 12 + 6
    for c in chunks:
        assert c.startswith("<table><tr><th>a</th><th>b</th></tr>")
    assert "<td>0</td><td>0</td>" in chunks[0]
    assert "<td>29</td><td>58</td>" in chunks[-1]


def test_tsv_to_html_keeps_deformed_rows():
    # html mode does no arity check (unlike the typed row-line form)
    chunks = tsv_to_html_chunks(["a\tb", "only-one-cell"])
    assert "<td>only-one-cell</td>" in chunks[0]


def test_header_only_table_one_chunk():
    assert len(tsv_to_html_chunks(["a\tb"])) == 1


def test_extract_doc_html4excel_flag():
    spans = [make_span("row", "x\ty")] + [
        make_span("row", f"{i}\t{i}") for i in range(20)]
    cfg = ExtractConfig(html4excel=True)
    tmpl, out, _ = extract_doc(spans, cfg)
    assert tmpl == "table"
    assert [s["kind"] for s in out] == ["table_html", "table_html"]
    # default config still emits typed row lines
    _, out2, _ = extract_doc(spans)
    assert all(s["kind"] == "table_row" for s in out2)


def test_html4excel_sharded_equals_fused():
    # mega table: sharding copies the header into every shard; the html
    # chunk sequence must equal the unsharded-per-shard concatenation
    spans = [make_span("row", "h1\th2")] + [
        make_span("row", f"{i}\t{i}") for i in range(50)]
    cfg_shard = ExtractConfig(html4excel=True, shard_span_threshold=10,
                              table_shard_rows=20, html_chunk_rows=12)
    _, sharded, n = extract_doc(spans, cfg_shard)
    assert n > 1
    cfg_fused = ExtractConfig(html4excel=True, html_chunk_rows=12)
    # same shard split applied manually: 20-row groups, each html-chunked
    texts = [s["text"] for s in sharded]
    assert all(t.startswith("<table><tr><th>h1</th>") for t in texts)
    # 50 rows → shards of 20/20/10 → chunks 12+8 / 12+8 / 10 = 5 chunks
    assert len(texts) == 5
