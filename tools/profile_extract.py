"""Per-archetype CPU attribution for extract pass 1 (VERDICT r4 fix #1).

Runs the EXACT pass-1 UDF body (``ExtractRouter.__call__``) serially over
the bench corpus, one document per call, timing each call with
``time.process_time`` (CPU time — robust to host contention) and grouping
by the archetype embedded in ``doc_id`` (``doc-<arch>-<idx>``). The summed
total is directly comparable to the ``pass1_udf_cpu_sec`` that bench.py
extracts from ``Dataset.stats()``: if the two agree within ~15%, the
headline's pass-1 CPU is fully attributed to intrinsic per-archetype work.

    GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_extract.py

Prints one JSON line: per-archetype {n_docs, cpu_sec, ms_per_doc, pct}
plus the serial total.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    import __ray_entry__ as e
    from ragflow_core16_ray.config import DEFAULT_CONFIG
    from ragflow_core16_ray.pipelines.extract import ExtractRouter
    from ragflow_core16_ray.schemas import DOCUMENTS_SCHEMA

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    corpus = os.environ.get("GRAFT_BENCH_CORPUS") or e._corpus_for(sf_dir)
    staging = "/tmp/graft_profile_staging"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(staging + "_blobs", ignore_errors=True)
    router = ExtractRouter(DEFAULT_CONFIG, staging)

    files = sorted(f for f in os.listdir(corpus) if f.endswith(".parquet"))
    stats: dict[str, dict] = {}
    total = 0.0
    for fname in files:
        tbl = pq.read_table(os.path.join(corpus, fname))
        for i in range(tbl.num_rows):
            row = tbl.slice(i, 1)
            doc_id = row["doc_id"][0].as_py()
            arch = doc_id.split("-")[1] if doc_id.startswith("doc-") else "?"
            one = pa.Table.from_pylist(row.to_pylist(),
                                       schema=DOCUMENTS_SCHEMA)
            t0 = time.process_time()
            router(one)
            dt = time.process_time() - t0
            s = stats.setdefault(arch, {"n_docs": 0, "cpu_sec": 0.0})
            s["n_docs"] += 1
            s["cpu_sec"] += dt
            total += dt

    for s in stats.values():
        s["cpu_sec"] = round(s["cpu_sec"], 3)
        s["ms_per_doc"] = round(1000 * s["cpu_sec"] / s["n_docs"], 2)
        s["pct"] = round(100 * s["cpu_sec"] / total, 1)
    out = {
        "corpus": corpus,
        "n_docs": sum(s["n_docs"] for s in stats.values()),
        "serial_pass1_cpu_sec": round(total, 2),
        "by_archetype": dict(sorted(stats.items(),
                                    key=lambda kv: -kv[1]["cpu_sec"])),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
