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
