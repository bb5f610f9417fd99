"""Distributed-pipeline correctness: the Ray pipeline's output must equal
the single-process per-doc reference function ``extract_doc`` on
``(kind, text, media_ref, order)`` for EVERY document — the span-sequence
equality contract from BASELINE.json. This exercises shard explode,
actor-pool parse, the groupby(doc_id) reassembly shuffle, and ordering
restoration."""

import shutil

import pytest

from ragflow_core16_ray.config import ExtractConfig
from ragflow_core16_ray.schemas import spans_to_pylist
from ragflow_core16_ray.sources.synth import gen_doc, write_corpus
from ragflow_core16_ray.stages.extract import extract_doc

N_DOCS = 120
MEGA_EVERY = 60  # → 2 mega-docs in the corpus
# low threshold so sharding triggers on ordinary docs too
CFG = ExtractConfig(shard_span_threshold=256)


@pytest.fixture(scope="module")
def extracted(ray_session, tmp_path_factory):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.extract import run_extract

    root = tmp_path_factory.mktemp("pipe")
    corpus = str(root / "corpus")
    out = str(root / "out")
    write_corpus(corpus, n_docs=N_DOCS, seed=7, mega_every=MEGA_EVERY)
    run_extract(corpus, out, cfg=CFG)
    df = rd.read_parquet(out + "/docs").to_pandas()
    shutil.rmtree(corpus, ignore_errors=True)
    return df


def test_all_docs_present_once(extracted):
    assert len(extracted) == N_DOCS
    assert extracted.doc_id.is_unique


def test_mega_docs_went_through_shuffle(extracted):
    assert (extracted.n_shards > 1).sum() >= 2


def test_span_sequence_equality(extracted):
    for _, row in extracted.iterrows():
        idx = int(row.doc_id.rsplit("-", 1)[1])
        doc = gen_doc(7, idx, mega_every=MEGA_EVERY)
        assert doc["doc_id"] == row.doc_id
        template, golden, _ = extract_doc(doc["spans"], CFG)
        assert template == row.template, row.doc_id
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in spans_to_pylist(row.spans)]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in golden]
        assert got == want, f"span mismatch for {row.doc_id}"


def test_offsets_are_dense(extracted):
    for _, row in extracted.iterrows():
        offs = [s["offset"] for s in spans_to_pylist(row.spans)]
        assert offs == list(range(len(offs))), row.doc_id


def test_auto_batch_size_clamps(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.extract import _auto_batch_size

    t = pa.table({"doc_id": [f"d{i}" for i in range(100)]})
    pq.write_table(t, str(tmp_path / "a.parquet"))
    # 100 rows on a >=4-core session -> clamps to the floor
    assert _auto_batch_size(str(tmp_path)) == 16
    # non-parquet layout: not cheaply knowable -> the large-batch cap
    assert _auto_batch_size(str(tmp_path / "nothing_here")) == 128
    assert _auto_batch_size(["x.lance"]) == 128


def test_big_pdf_page_range_parse_sharding(ray_session, tmp_path):
    """A raw PDF at/above pdf_page_shard_min pages must fan its PARSE
    into page-range shard tasks (blob staged once, shard rows carry a
    (path, range) ref) and reassemble to EXACTLY the fused single-task
    result — for both a text-layer PDF and a scanned (OCR) PDF."""
    import base64

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ragflow_core16_ray.config import ExtractConfig
    from ragflow_core16_ray.functions.pdf_bytes import (build_pdf,
                                                        build_scanned_pdf,
                                                        expand_pdf_spans)
    from ragflow_core16_ray.pipelines.extract import run_extract
    from ragflow_core16_ray.schemas import (DOCUMENTS_SCHEMA,
                                            finalize_offsets, make_span)
    from ragflow_core16_ray.stages.extract import extract_doc

    n_pages = 60
    text_pdf = build_pdf(
        [[(60, 900, 10, f"Page {p} line {i} of the running text.")
          for i in range(4)] for p in range(n_pages)],
        media_box=(600.0, 1000.0))
    # first 14 pages BLANK: template routing must probe past empty
    # ranges (a blank cover must not route the doc to 'naive')
    blank_lead_pdf = build_pdf(
        [[] if p < 14 else
         [(60, 900, 10, f"Late page {p} line {i}.") for i in range(4)]
         for p in range(n_pages)],
        media_box=(600.0, 1000.0))
    scan_pages = []
    for p in range(n_pages):
        scan_pages.append(
            ["BIG SCAN HEADER"] + [""] * 5
            + [f"SCANNED PAGE {p} BODY LINE {i}." for i in range(3)]
            + [""] * 89 + [f"PAGE {p + 1}/{n_pages}"])
    scan_pdf = build_scanned_pdf(scan_pages, media_box=(600.0, 1000.0))

    docs = [
        {"doc_id": "doc-bigpdf-text", "spans": finalize_offsets(
            [make_span("pdf", base64.b64encode(text_pdf).decode())])},
        {"doc_id": "doc-bigpdf-scan", "spans": finalize_offsets(
            [make_span("pdf", base64.b64encode(scan_pdf).decode())])},
        {"doc_id": "doc-bigpdf-blanklead", "spans": finalize_offsets(
            [make_span("pdf",
                       base64.b64encode(blank_lead_pdf).decode())])},
    ]
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    import os

    os.makedirs(corpus, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA),
                   os.path.join(corpus, "part0.parquet"))
    cfg = ExtractConfig()
    run_extract(corpus, out, cfg=cfg)
    got = rd.read_parquet(os.path.join(out, "docs")).to_pandas()
    got = got.set_index("doc_id")
    assert int(got.loc["doc-bigpdf-text", "n_shards"]) == 5  # 60/12
    assert int(got.loc["doc-bigpdf-scan", "n_shards"]) == 5
    assert got.loc["doc-bigpdf-blanklead", "template"] == "pdfish"
    # blob staged once per doc, not per shard
    blob_dir = os.path.join(out, "_staging_blobs")
    assert sorted(os.listdir(blob_dir)) == ["doc-bigpdf-blanklead.pdf",
                                            "doc-bigpdf-scan.pdf",
                                            "doc-bigpdf-text.pdf"]
    # sharded output == fused single-task extraction, span for span
    for d in docs:
        tmpl, fused, _ = extract_doc(
            finalize_offsets(expand_pdf_spans(d["spans"])), cfg)
        row = got.loc[d["doc_id"]]
        assert row["template"] == tmpl
        got_spans = [(s["kind"], s["text"]) for s in row["spans"]]
        assert got_spans == [(s["kind"], s["text"]) for s in fused]
