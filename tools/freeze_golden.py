"""Deliberately (re-)freeze the committed extraction golden.

Runs the full two-pass pipeline over the deterministic sf0.001 corpus
(same synth parameters as __ray_entry__._corpus_for) and writes the
flattened span stream — (doc_id, offset, kind, text, media_ref) sorted by
(doc_id, offset) — to tests/data/golden_extract_sf0001.parquet.

tests/test_golden_frozen.py compares a fresh pipeline run against this
file value-for-value. Any semantic change to the parse — even one applied
consistently to both the fused and sharded paths, which the
pipeline==extract_doc equality tests cannot see — fails that test until
this script is re-run ON PURPOSE and the diff is reviewed.

Usage:  python tools/freeze_golden.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_PATH = os.path.join(REPO, "tests", "data",
                           "golden_extract_sf0001.parquet")
# mirror __ray_entry__._corpus_for("/root/testdata/sf0.001") exactly
N_DOCS, SEED, MEGA_EVERY, PARALLELISM = 200, 42, 150, 8


def golden_corpus_dir() -> str:
    from ragflow_core16_ray.sources.synth import CORPUS_VERSION

    return f"/tmp/graft_corpus_sf0.001_v{CORPUS_VERSION}p8_{SEED}_{N_DOCS}"


def build_flat_extraction(tmp_out: str):
    """Corpus → two-pass pipeline → sorted flat span table (pa.Table)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ragflow_core16_ray.pipelines.extract import run_extract
    from ragflow_core16_ray.schemas import explode_spans
    from ragflow_core16_ray.sources.synth import write_corpus

    corpus = golden_corpus_dir()
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        write_corpus(corpus, n_docs=N_DOCS, seed=SEED,
                     mega_every=MEGA_EVERY, parallelism=PARALLELISM)
        open(os.path.join(corpus, "_DONE"), "w").close()
    run_extract(corpus, tmp_out)

    def flatten(batch):
        return explode_spans(batch)

    tbl = (rd.read_parquet(os.path.join(tmp_out, "docs"))
           .map_batches(flatten, batch_format="pyarrow")
           .to_arrow_refs())
    import pyarrow as pa
    import ray

    tbl = pa.concat_tables([ray.get(r) for r in tbl])
    idx = pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending"),
                                          ("offset", "ascending"),
                                          ("kind", "ascending"),
                                          ("text", "ascending")])
    return tbl.take(idx).select(
        ["doc_id", "offset", "kind", "text", "media_ref"])


if __name__ == "__main__":
    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    tbl = build_flat_extraction("/tmp/freeze_golden_out")
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    pq.write_table(tbl, GOLDEN_PATH, compression="zstd")
    print(f"froze {tbl.num_rows} spans → {GOLDEN_PATH}")
    ray.shutdown()
