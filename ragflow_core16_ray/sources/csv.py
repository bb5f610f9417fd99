"""CSV(.gz) source and sink for the documents table.

The third interchange format next to parquet and jsonl (sources/jsonl.py):
plenty of real corpora and eval sets ship as RFC-4180 CSV. Same contract
as the jsonl pair — a deterministic partitioned writer (one doc_id-sorted
``part-NNNNN.csv[.gz]`` per bucket, atomic temp + ``os.replace``,
fixed-mtime gzip ⇒ byte-identical reruns) and a schema-canonicalizing
streaming reader (one shard per block). Quoting is RFC 4180 (pandas
``to_csv`` minimal quoting out, pyarrow's csv parser in,
``newlines_in_values`` on), so embedded commas, quotes and newlines in
``text`` survive; the driver's ``csv_token_counts`` query proves the
round-trip by hash-matching the parquet-based token_counts oracle."""

from __future__ import annotations

import gzip
import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

from .jsonl import DOC_FIELDS, _INT_FIELDS


def write_documents_csv(docs: rd.Dataset, out_dir: str,
                        n_files: int = 8,
                        compression: str = "gzip") -> pd.DataFrame:
    """Write a documents-schema Dataset as ``n_files`` CSV shards
    (deterministic bucket-sorted layout; see module docstring).
    Returns the (path, n_rows) manifest."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".csv.gz" if compression == "gzip" else ".csv"

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
        import csv as _csv
        # QUOTE_NONNUMERIC: pandas' minimal quoting leaves a bare \r
        # unquoted (it only checks its own lineterminator), and pyarrow's
        # parser reads \r as a row break — always-quote the string
        # columns instead; int columns stay bare
        payload = g.to_csv(index=False, lineterminator="\n",
                           quoting=_csv.QUOTE_NONNUMERIC)
        if compression == "gzip":
            with open(tmp, "wb") as f:
                f.write(gzip.compress(payload.encode("utf-8"), mtime=0))
        else:
            with open(tmp, "w", encoding="utf-8", newline="") as f:
                f.write(payload)
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path],
                             "n_rows": pd.array([len(g)], dtype="int64")})

    return (docs.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket").map_groups(dump, batch_format="pandas")
            .to_pandas().sort_values("path").reset_index(drop=True))


def read_documents_csv(path: str) -> rd.Dataset:
    """Streaming read of a csv[.gz] documents directory (or file) into
    the canonical documents schema. ``newlines_in_values`` is on so
    quoted multi-line text cells parse; empty text cells stay ""
    (strings_can_be_null off)."""
    from pyarrow import csv as pacsv

    if os.path.isdir(path):
        import glob
        shards = sorted(glob.glob(os.path.join(path, "*.csv"))
                        + glob.glob(os.path.join(path, "*.csv.gz")))
        if not shards:
            raise FileNotFoundError(f"no *.csv[.gz] shards in {path}")
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
            # an all-empty string shard column can infer as null-typed;
            # empty text must stay "", never null
            if pa.types.is_string(want):
                import pyarrow.compute as pc
                arr = pc.fill_null(arr, "")
            cols.append(arr)
            names.append(c)
        return pa.table(cols, names=names)

    # explicit column types: inference would turn a numeric-LOOKING text
    # cell ("007") into an int and lose bytes
    types = {c: (pa.int64() if c in _INT_FIELDS else pa.string())
             for c in DOC_FIELDS}
    return rd.read_csv(
        path,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(column_types=types),
    ).map_batches(canon, batch_format="pyarrow")
