"""JSONL(.gz) source and sink for the documents table.

Web-scale text corpora ship as line-delimited JSON (one document per
line, gzip per shard — the Common Crawl / RedPajama / Dolma interchange
convention), not parquet. This module makes that format a first-class
engine input: a deterministic partitioned writer (one sorted
``part-NNNNN.jsonl[.gz]`` per doc_id bucket, written atomically via
temp-file + ``os.replace`` so a crashed writer never leaves a readable
half-shard) and a schema-canonicalizing reader over Ray's streaming
JSON scan (gzip inferred from the ``.gz`` extension, one file per block
— the shard IS the parallelism unit, exactly how a 100 TB jsonl corpus
is laid out).

The round-trip is lossless for the documents schema (UTF-8 text
preserved verbatim via ``force_ascii=False``; int64 ids/counters parse
back as int64), which the driver proves end-to-end: the
``jsonl_token_counts`` query writes the sf corpus to jsonl.gz once,
reads it back through this source, and hash-matches the parquet-based
SQL oracle.
"""

from __future__ import annotations

import gzip
import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

DOC_FIELDS = ("doc_id", "text", "lang", "source", "n_chars")
_INT_FIELDS = {"doc_id", "n_chars"}


def write_documents_jsonl(docs: rd.Dataset, out_dir: str,
                          n_files: int = 8,
                          compression: str = "gzip") -> pd.DataFrame:
    """Write a documents-schema Dataset as ``n_files`` jsonl shards.

    Deterministic layout: rows bucket by ``doc_id % n_files`` and each
    shard is written doc_id-sorted by the one task that owns the whole
    bucket, so two runs over the same data produce byte-identical files
    (a digest-keyed cache can trust the directory). Serialization is
    pandas ``to_json(lines=True)`` — vectorized, no per-row Python dump.
    Returns the (path, n_rows) manifest."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".jsonl.gz" if compression == "gzip" else ".jsonl"

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bucket"] = (batch["doc_id"] % n_files).astype("int32")
        return batch

    def dump(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["_bucket"].iloc[0])
        g = g.sort_values("doc_id").drop(columns=["_bucket"])
        g = g[[c for c in DOC_FIELDS if c in g.columns]]
        path = os.path.join(out_dir, f"part-{bk:05d}{ext}")
        tmp = path + ".tmp"
        payload = g.to_json(orient="records", lines=True,
                            force_ascii=False)
        if compression == "gzip":
            # fixed mtime so the gzip container is run-deterministic too
            with open(tmp, "wb") as f:
                f.write(gzip.compress(payload.encode("utf-8"), mtime=0))
        else:
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(payload)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path],
                             "n_rows": pd.array([len(g)], dtype="int64")})

    return (docs.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(dump, batch_format="pandas")
            .to_pandas().sort_values("path").reset_index(drop=True))


def read_documents_jsonl(path: str) -> rd.Dataset:
    """Streaming read of a jsonl[.gz] documents directory (or file) into
    the canonical documents schema: int64 ids/counters, string text
    columns, canonical column order. Ray infers gzip from the extension
    and scans one shard per block — no driver materialization."""

    if os.path.isdir(path):
        import glob
        # only jsonl shards — a corpus dir also carries markers/manifests
        shards = sorted(glob.glob(os.path.join(path, "*.jsonl"))
                        + glob.glob(os.path.join(path, "*.jsonl.gz")))
        if not shards:
            raise FileNotFoundError(f"no *.jsonl[.gz] shards in {path}")
        path = shards

    def canon(t: pa.Table) -> pa.Table:
        cols, names = [], []
        for c in DOC_FIELDS:
            if c not in t.column_names:
                continue
            arr = t.column(c)
            want = pa.int64() if c in _INT_FIELDS else pa.string()
            if arr.type != want:
                arr = arr.cast(want)
            cols.append(arr)
            names.append(c)
        return pa.table(cols, names=names)

    return rd.read_json(path).map_batches(canon, batch_format="pyarrow")
