"""CSV(.gz) source/sink: RFC-4180 lossless round-trip (embedded commas,
quotes, newlines-in-text, unicode), deterministic shards, schema
canonicalization. Driver-level proof = csv_token_counts hash-matching
the parquet oracle."""

import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

CSV_TRICKY = [
    "plain ascii words",
    "comma, separated, values",
    'quotes "inside" and more ""doubles""',
    "newline\ninside a quoted cell",
    "return\rinside too",
    "中文文本 and emoji 🙂",
    "007",  # numeric-looking text must stay a string
    "",
    "trailing spaces   ",
]


def _docs_df():
    return pd.DataFrame({
        "doc_id": pd.array(range(len(CSV_TRICKY)), dtype="int64"),
        "text": CSV_TRICKY,
        "lang": ["en"] * len(CSV_TRICKY),
        "source": [f"s{i % 2}" for i in range(len(CSV_TRICKY))],
        "n_chars": pd.array([len(t) for t in CSV_TRICKY], dtype="int64"),
    })


def _roundtrip(tmp_path, compression):
    import ray.data as rd

    from ragflow_core16_ray.sources.csv import (read_documents_csv,
                                                write_documents_csv)

    src = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pandas(_docs_df(), preserve_index=False),
                   src)
    out = str(tmp_path / f"csv_{compression}")
    man = write_documents_csv(rd.read_parquet(src), out, n_files=3,
                              compression=compression)
    back = (read_documents_csv(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    return man, back


def _assert_lossless(back):
    want = _docs_df()
    pd.testing.assert_frame_equal(back[want.columns.tolist()], want,
                                  check_dtype=False)


def test_csv_roundtrip_lossless_gzip(ray_session, tmp_path):
    man, back = _roundtrip(tmp_path, "gzip")
    assert int(man["n_rows"].sum()) == len(CSV_TRICKY)
    _assert_lossless(back)


def test_csv_roundtrip_lossless_plain(ray_session, tmp_path):
    _, back = _roundtrip(tmp_path, "none")
    _assert_lossless(back)


def test_csv_writer_is_byte_deterministic(ray_session, tmp_path):
    import ray.data as rd

    from ragflow_core16_ray.sources.csv import write_documents_csv

    src = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pandas(_docs_df(), preserve_index=False),
                   src)
    digests = []
    for run in range(2):
        out = str(tmp_path / f"run{run}")
        # different input partitioning each run — shard bytes must not
        # depend on batching
        ds = rd.read_parquet(src).repartition(1 + run * 3)
        write_documents_csv(ds, out, n_files=3)
        h = hashlib.md5()
        for f in sorted(os.listdir(out)):
            h.update(open(os.path.join(out, f), "rb").read())
        digests.append(h.hexdigest())
    assert digests[0] == digests[1]


def test_csv_reader_rejects_empty_dir(ray_session, tmp_path):
    import pytest as _pytest

    from ragflow_core16_ray.sources.csv import read_documents_csv

    os.makedirs(str(tmp_path / "empty"), exist_ok=True)
    with _pytest.raises(FileNotFoundError):
        read_documents_csv(str(tmp_path / "empty"))
