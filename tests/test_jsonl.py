"""JSONL(.gz) source/sink: lossless round-trip, deterministic shards,
schema canonicalization. The driver-level proof (jsonl_token_counts
hash-matching the parquet oracle) lives in tools/check_oracle.py; these
tests cover what word-soup corpora can't — unicode, embedded quotes,
newlines-in-text (JSON-escaped), and writer determinism."""

import hashlib
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TRICKY_TEXTS = [
    "plain ascii words",
    "中文文本 with mixed スクリプト",
    'quotes "inside" and \\backslashes\\',
    "tab\tand newline\nand return\rinside",
    "emoji 🙂 and combining é",
    "",
    "trailing spaces   ",
]


def _docs_df():
    return pd.DataFrame({
        "doc_id": pd.array(range(len(TRICKY_TEXTS)), dtype="int64"),
        "text": TRICKY_TEXTS,
        "lang": ["en"] * len(TRICKY_TEXTS),
        "source": [f"s{i % 2}" for i in range(len(TRICKY_TEXTS))],
        "n_chars": pd.array([len(t) for t in TRICKY_TEXTS], dtype="int64"),
    })


def _roundtrip(tmp_path, compression):
    import ray.data as rd

    from ragflow_core16_ray.sources.jsonl import (read_documents_jsonl,
                                                  write_documents_jsonl)

    src = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pandas(_docs_df(), preserve_index=False),
                   src)
    out = str(tmp_path / f"jl_{compression}")
    man = write_documents_jsonl(rd.read_parquet(src), out, n_files=3,
                                compression=compression)
    back = (read_documents_jsonl(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    return man, back


def test_jsonl_roundtrip_lossless_gzip(ray_session, tmp_path):
    man, back = _roundtrip(tmp_path, "gzip")
    pd.testing.assert_frame_equal(back, _docs_df())
    assert int(man["n_rows"].sum()) == len(TRICKY_TEXTS)
    assert all(p.endswith(".jsonl.gz") for p in man["path"])


def test_jsonl_roundtrip_lossless_plain(ray_session, tmp_path):
    man, back = _roundtrip(tmp_path, "none")
    pd.testing.assert_frame_equal(back, _docs_df())
    assert all(p.endswith(".jsonl") for p in man["path"])


def test_jsonl_writer_is_byte_deterministic(ray_session, tmp_path):
    import ray.data as rd

    from ragflow_core16_ray.sources.jsonl import write_documents_jsonl

    src = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pandas(_docs_df(), preserve_index=False),
                   src)

    def digest(d):
        h = hashlib.md5()
        for name in sorted(os.listdir(d)):
            with open(os.path.join(d, name), "rb") as f:
                h.update(name.encode() + f.read())
        return h.hexdigest()

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    # different input partitioning must not change the shard bytes
    write_documents_jsonl(rd.read_parquet(src), a, n_files=3)
    write_documents_jsonl(rd.read_parquet(src).repartition(5), b, n_files=3)
    assert digest(a) == digest(b)


def test_jsonl_reader_skips_non_shard_files(ray_session, tmp_path):
    import ray.data as rd

    from ragflow_core16_ray.sources.jsonl import (read_documents_jsonl,
                                                  write_documents_jsonl)

    src = str(tmp_path / "documents.parquet")
    pq.write_table(pa.Table.from_pandas(_docs_df(), preserve_index=False),
                   src)
    out = str(tmp_path / "jl")
    write_documents_jsonl(rd.read_parquet(src), out, n_files=2)
    open(os.path.join(out, "_GRAFT_DONE"), "w").close()
    back = read_documents_jsonl(out).to_pandas()
    assert len(back) == len(TRICKY_TEXTS)
    assert list(back.columns) == ["doc_id", "text", "lang", "source",
                                  "n_chars"]
    assert back["doc_id"].dtype == "int64"
