"""Per-document fault isolation: a malformed document yields an error row,
never a failed job (the reference's per-task containment,
rag/svr/task_executor.py:604-616)."""

import pyarrow as pa
import pyarrow.parquet as pq


def test_poison_doc_contained(ray_session, tmp_path):
    import ray.data as rd

    from ragflow_core16_ray.pipelines.extract import run_extract
    from ragflow_core16_ray.schemas import DOCUMENTS_SCHEMA

    t = pa.Table.from_pylist([
        {"doc_id": "doc-ok-1", "spans": [
            {"kind": "text", "text": "fine.", "media_ref": "", "offset": 0}]},
        {"doc_id": "doc-poison-1", "spans": [
            {"kind": "box", "text": "{not valid json", "media_ref": "",
             "offset": 0}]},
    ], schema=DOCUMENTS_SCHEMA)
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "out")
    run_extract(src, out)
    df = rd.read_parquet(out + "/docs").to_pandas().set_index("doc_id")
    assert df.loc["doc-ok-1", "template"] == "naive"
    assert df.loc["doc-poison-1", "template"] == "error"
    assert len(df.loc["doc-poison-1", "spans"]) == 0


def test_poison_mega_shard_contained(ray_session, tmp_path):
    # pass-2 containment: a MEGA doc (sharded through the staging dir)
    # with one malformed shard must still reassemble — the poisoned
    # shard contributes nothing, the doc row survives
    import json

    import ray.data as rd

    from ragflow_core16_ray.config import ExtractConfig
    from ragflow_core16_ray.pipelines.extract import run_extract
    from ragflow_core16_ray.schemas import DOCUMENTS_SCHEMA

    def tb(text, page):
        d = {"t": text, "x0": 60.0, "x1": 540.0, "top": 100.0, "bot": 120.0,
             "page": page, "lay": "text"}
        return {"kind": "box", "text": json.dumps(d), "media_ref": "",
                "offset": 0}

    spans = [tb(f"line {p}.", p) for p in range(40)]
    spans[25] = {"kind": "box", "text": "{corrupt", "media_ref": "",
                 "offset": 0}
    t = pa.Table.from_pylist(
        [{"doc_id": "doc-mega-poison", "spans": spans}],
        schema=DOCUMENTS_SCHEMA)
    src = str(tmp_path / "in.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "out")
    run_extract(src, out, cfg=ExtractConfig(shard_span_threshold=8))
    df = rd.read_parquet(out + "/docs").to_pandas().set_index("doc_id")
    row = df.loc["doc-mega-poison"]
    assert row["n_shards"] > 1
    texts = " ".join(s["text"] for s in row["spans"])
    assert "line 0." in texts and "line 39." in texts


def test_extract_router_null_and_empty_spans(ray_session, tmp_path):
    """Degenerate input rows — null spans cell, empty span list — must
    flow through pass 1 as benign empty docs, not crash a task."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ragflow_core16_ray.config import DEFAULT_CONFIG
    from ragflow_core16_ray.pipelines.extract import ExtractRouter
    from ragflow_core16_ray.schemas import DOCUMENTS_SCHEMA, SPAN_STRUCT

    mk = lambda k, t: {"kind": k, "text": t, "media_ref": "", "offset": 0}
    tbl = pa.Table.from_pylist([
        {"doc_id": "ok", "spans": [mk("text", "a normal line.")]},
        {"doc_id": "nul", "spans": None},
        {"doc_id": "empty", "spans": []},
    ], schema=DOCUMENTS_SCHEMA)
    out = ExtractRouter(DEFAULT_CONFIG, str(tmp_path / "stage"))(tbl)
    got = {r["doc_id"]: r for r in out.to_pylist()}
    assert set(got) == {"ok", "nul", "empty"}
    assert got["ok"]["spans"] and got["ok"]["template"] != "error"
    for d in ("nul", "empty"):
        assert got[d]["spans"] == []
        assert got[d]["n_shards"] == 1
