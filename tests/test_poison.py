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
