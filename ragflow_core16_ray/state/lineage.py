"""Per-partition lineage + resume-from-checkpoint.

Design (mirrors the reference's task-digest reuse,
api/db/services/task_service.py:349-433, re-expressed for partitioned
batch output):

- The input is split into P deterministic partitions (the input's parquet
  fragments, grouped). Each partition runs as an independent sub-pipeline
  writing to ``out/part={i}/`` (write to a temp dir, atomic rename), then a
  manifest ``out/_lineage/part-{i}.json`` records the partition digest
  (input files + config), row/span counters and wall time.
- A partition is COMPLETE iff its manifest exists and its digest matches.
  ``run_partitioned`` skips complete partitions — so a killed run resumes
  idempotently and reruns produce byte-identical content (ids and outputs
  are pure functions of the input).
- Metrics roll up from the manifests (docs/sec per partition, totals).

At 100 TB: P is thousands; partitions are the unit of retry, progress and
operational visibility, exactly like the reference's page-range tasks.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time

from ..config import DEFAULT_CONFIG, DEFAULT_RUNTIME, ExtractConfig, RuntimeConfig


def _partition_digest(files: list[str], cfg: ExtractConfig) -> str:
    h = hashlib.blake2b(digest_size=12)
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}".encode())
    h.update(cfg.digest_payload().encode())
    return h.hexdigest()


def plan_partitions(input_uri: str, n_partitions: int = 0) -> list[list[str]]:
    """Group the input parquet fragments into partitions (round-robin by
    sorted name → deterministic)."""
    if os.path.isfile(input_uri):
        return [[input_uri]]
    files = sorted(glob.glob(os.path.join(input_uri, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet under {input_uri}")
    if n_partitions <= 0:
        n_partitions = len(files)
    n_partitions = min(n_partitions, len(files))
    parts: list[list[str]] = [[] for _ in range(n_partitions)]
    for i, f in enumerate(files):
        parts[i % n_partitions].append(f)
    return parts


def run_partitioned(input_uri: str, output_dir: str,
                    cfg: ExtractConfig = DEFAULT_CONFIG,
                    runtime: RuntimeConfig = DEFAULT_RUNTIME,
                    n_partitions: int = 0) -> dict:
    """Resumable partitioned extraction. ``output_dir`` may be a
    ``pyarrow.fs`` URI. Returns rollup metrics.

    Publish protocol: on a LOCAL filesystem the partition writes to a
    temp dir and ``os.replace``s it into place (directory rename is
    atomic there). Object stores have no directory rename, so the
    non-local path writes data files straight into ``part={i}`` and
    commits by writing the MANIFEST last — a partition is complete iff
    its manifest exists with a matching digest, so a crash between data
    and manifest simply reruns (after clearing the partial dir)."""
    from ..pipelines.extract import run_extract
    from . import fsio

    local = fsio.is_local(output_dir)
    lineage_dir = fsio.join(output_dir, "_lineage")
    fsio.makedirs(lineage_dir)
    parts = plan_partitions(input_uri, n_partitions)

    n_done_prior = n_ran = 0
    for i, files in enumerate(parts):
        digest = _partition_digest(files, cfg)
        manifest_path = fsio.join(lineage_dir, f"part-{i}.json")
        part_dir = fsio.join(output_dir, f"part={i}")
        if fsio.exists(manifest_path):
            m = fsio.read_json(manifest_path)
            if m.get("digest") == digest and fsio.exists(part_dir):
                n_done_prior += 1
                continue  # complete → skip (the resume path)
        t0 = time.perf_counter()
        import ray.data as rd

        if local:
            tmp_dir = fsio.join(output_dir, f"_tmp-part={i}")
            shutil.rmtree(tmp_dir, ignore_errors=True)
            shutil.rmtree(part_dir, ignore_errors=True)
            run_extract(files, tmp_dir, cfg, runtime)
            wall = time.perf_counter() - t0
            n_docs = rd.read_parquet(os.path.join(tmp_dir, "docs")).count()
            os.replace(os.path.join(tmp_dir, "docs"), part_dir)  # atomic
            shutil.rmtree(tmp_dir, ignore_errors=True)
        else:
            # extract into a tmp dir, then publish ONLY the docs
            # parquet files into part={i} by per-file move (object
            # stores have no directory rename) — same flat
            # part=*/*.parquet layout as the local branch, and the
            # tmp rmtree drops run_extract's _staging/_staging_blobs
            # side dirs instead of publishing them; manifest-last
            # remains the commit point
            tmp_dir = fsio.join(output_dir, f"_tmp-part={i}")
            fsio.rmtree(tmp_dir)
            fsio.rmtree(part_dir)
            run_extract(files, tmp_dir, cfg, runtime)
            wall = time.perf_counter() - t0
            fs, docs_path = fsio.resolve(fsio.join(tmp_dir, "docs"))
            n_docs = rd.read_parquet(docs_path, filesystem=fs).count()
            _pfs, ppath = fsio.resolve(part_dir)
            _pfs.create_dir(ppath, recursive=True)
            for src in fsio.list_files((fs, docs_path), ".parquet"):
                fs.move(src, f"{ppath}/{src.rsplit('/', 1)[1]}")
            fsio.rmtree(tmp_dir)
        fsio.write_json(manifest_path, {
            "digest": digest,
            "files": [os.path.basename(f) for f in files],
            "n_docs": n_docs, "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 2) if wall else None})
        n_ran += 1

    manifests = [fsio.read_json((fsio.resolve(lineage_dir)[0], p))
                 for p in fsio.list_files(lineage_dir, ".json")
                 if os.path.basename(p).startswith("part-")]
    return {
        "n_partitions": len(parts),
        "n_resumed_skips": n_done_prior,
        "n_ran": n_ran,
        "n_docs": sum(m["n_docs"] for m in manifests),
        "wall_sec_total": round(sum(m["wall_sec"] for m in manifests), 3),
        "output": output_dir,
    }
