"""Arrow IPC (feather v2) source/sink: lossless round-trip, writer
determinism, schema canonicalization. Driver-level proof
(ipc_token_counts vs the parquet oracle) lives in tools/check_oracle.py."""

import hashlib

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


def _write(tmp_path, name):
    import ray.data as rd

    from ragflow_core16_ray.sources.ipc import write_documents_ipc

    src = str(tmp_path / "documents.parquet")
    import os
    if not os.path.exists(src):
        pq.write_table(pa.Table.from_pandas(_docs_df(),
                                            preserve_index=False), src)
    out = str(tmp_path / name)
    return out, write_documents_ipc(rd.read_parquet(src), out, n_files=3)


def test_ipc_roundtrip_lossless(ray_session, tmp_path):
    from ragflow_core16_ray.sources.ipc import read_documents_ipc

    out, man = _write(tmp_path, "ipc")
    back = (read_documents_ipc(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back, _docs_df())
    assert int(man["n_rows"].sum()) == len(TRICKY_TEXTS)
    assert all(p.endswith(".arrow") for p in man["path"])


def test_ipc_writer_deterministic(ray_session, tmp_path):
    _, man1 = _write(tmp_path, "w1")
    _, man2 = _write(tmp_path, "w2")
    for p1, p2 in zip(sorted(man1["path"]), sorted(man2["path"])):
        assert (hashlib.md5(open(p1, "rb").read()).hexdigest()
                == hashlib.md5(open(p2, "rb").read()).hexdigest())
