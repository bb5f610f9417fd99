"""Arrow IPC (Feather v2) source and sink for the documents table.

The Arrow IPC file format is the zero-copy interchange format of the
Arrow ecosystem (feather v2 — what polars/pandas/R exchange and what
Arrow Flight ships on the wire). This module makes it a first-class
engine input next to parquet/jsonl/csv/warc: a deterministic
partitioned writer (one ``part-NNNNN.arrow`` per doc_id bucket, written
atomically via temp-file + ``os.replace``) and a streaming reader
(``read_binary_files`` one shard per block, then an in-worker
``pa.ipc.open_file`` — the mmap-style decode is a single buffer wrap,
no row-level parsing at all, which is the whole point of IPC vs CSV).

Round-trip losslessness is proven end-to-end by the driver's
``ipc_token_counts`` query hash-matching the parquet-based SQL oracle.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

DOC_FIELDS = ("doc_id", "text", "lang", "source", "n_chars")
_INT_FIELDS = {"doc_id", "n_chars"}


def write_documents_ipc(docs: rd.Dataset, out_dir: str,
                        n_files: int = 8) -> pd.DataFrame:
    """Write a documents-schema Dataset as ``n_files`` Arrow IPC file
    shards. Deterministic layout: rows bucket by ``doc_id % n_files``,
    each shard written doc_id-sorted by the one task owning the bucket,
    so two runs produce byte-identical files. Returns the
    (path, n_rows) manifest."""
    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bucket"] = (batch["doc_id"] % n_files).astype("int32")
        return batch

    def dump(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["_bucket"].iloc[0])
        g = g.sort_values("doc_id").drop(columns=["_bucket"])
        g = g[[c for c in DOC_FIELDS if c in g.columns]]
        path = os.path.join(out_dir, f"part-{bk:05d}.arrow")
        tmp = path + ".tmp"
        table = pa.Table.from_pandas(g, preserve_index=False)
        with pa.OSFile(tmp, "wb") as f:
            with pa.ipc.new_file(f, table.schema) as w:
                w.write_table(table)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path],
                             "n_rows": pd.array([len(g)], dtype="int64")})

    return (docs.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(dump, batch_format="pandas")
            .to_pandas().sort_values("path").reset_index(drop=True))


def read_documents_ipc(path: str) -> rd.Dataset:
    """Streaming read of an Arrow IPC shard directory (or file) into
    the canonical documents schema. One shard per block; the decode is
    a buffer wrap (`pa.ipc.open_file`), not a parse."""
    if os.path.isdir(path):
        import glob
        shards = sorted(glob.glob(os.path.join(path, "*.arrow")))
        if not shards:
            raise FileNotFoundError(f"no *.arrow shards in {path}")
        path = shards

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for raw in batch.column("bytes").to_pylist():
            t = pa.ipc.open_file(pa.BufferReader(raw)).read_all()
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
            tables.append(pa.table(cols, names=names))
        return pa.concat_tables(tables)

    return rd.read_binary_files(path).map_batches(
        decode, batch_format="pyarrow")
