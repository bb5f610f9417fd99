"""Legacy .doc (Word 97–2003, [MS-CFB]+[MS-DOC]) reader: container
round-trip, piece-table decode, compressed-piece path, and the span
routing through the extract pipeline."""

import base64
import struct

import pytest

from ragflow_core16_ray.functions.doc_legacy import (cfb_streams,
                                                     doc_text_paragraphs,
                                                     expand_doc_spans,
                                                     make_doc_bytes)


def test_cfb_roundtrip_streams():
    raw = make_doc_bytes(["alpha", "beta"])
    st = cfb_streams(raw)
    assert set(st) == {"WordDocument", "1Table"}
    assert struct.unpack_from("<H", st["WordDocument"], 0)[0] == 0xA5EC


def test_paragraph_roundtrip():
    paras = ["first paragraph of the legacy doc",
             "second with 数据 cjk", "third"]
    assert doc_text_paragraphs(make_doc_bytes(paras)) == paras
    # multi-sector text
    many = [f"paragraph {i} " + "word " * 40 for i in range(60)]
    got = doc_text_paragraphs(make_doc_bytes(many))
    assert [p.rstrip() for p in got] == [p.rstrip() for p in many]


def test_compressed_piece_decodes_cp1252():
    """Hand-build a doc whose single piece is fCompressed (CP-1252 at
    fc/2) — the dominant real-world layout for ASCII files."""
    raw = bytearray(make_doc_bytes(["placeholder"]))
    st = cfb_streams(bytes(raw))
    text = "legacy ansi text\r"
    # locate the WordDocument stream in the container (sector 2 onward
    # per the fixture writer's layout) and plant CP-1252 bytes at 1024
    wd_off = 512 + 2 * 512
    raw[wd_off + 1024:wd_off + 1024 + len(text)] = text.encode("cp1252")
    struct.pack_into("<I", raw, wd_off + 0x4C, len(text))
    # rewrite the PCD inside 1Table: fc = 2048 (byte 1024·2), bit30 set
    n_wd = (len(st["WordDocument"]) + 511) // 512
    tb_off = 512 + (2 + n_wd) * 512
    plc = struct.pack("<II", 0, len(text)) \
        + struct.pack("<HIH", 0, 2048 | (1 << 30), 0)
    clx = bytes([2]) + struct.pack("<I", len(plc)) + plc
    raw[tb_off:tb_off + len(clx)] = clx
    struct.pack_into("<I", raw, wd_off + 0x1A6, len(clx))
    assert doc_text_paragraphs(bytes(raw)) == ["legacy ansi text"]


def test_expand_doc_spans_and_routing():
    from ragflow_core16_ray.schemas import make_span
    from ragflow_core16_ray.stages.extract import route_template

    payload = base64.b64encode(make_doc_bytes(
        ["a heading style paragraph",
         "body text follows the heading with several words",
         "another body paragraph"])).decode()
    spans = [make_span("doc", payload)]
    got = expand_doc_spans(spans)
    assert [s["kind"] for s in got] == ["text", "text", "text"]
    assert got[0]["text"] == "a heading style paragraph"
    assert route_template(got) is not None
    # idempotent on non-doc spans; poison payload drops, never raises
    plain = [make_span("text", "hello")]
    assert expand_doc_spans(plain) is plain
    assert expand_doc_spans(
        [make_span("doc", base64.b64encode(b"garbage").decode())]) == []


def test_doc_through_extract_pipeline(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from ragflow_core16_ray.pipelines.extract import run_extract
    from ragflow_core16_ray.schemas import (DOCUMENTS_SCHEMA,
                                            finalize_offsets, make_span)

    payload = base64.b64encode(make_doc_bytes(
        [f"paragraph {i} stream batch table scan merge sort"
         for i in range(8)])).decode()
    rows = [{"doc_id": "doc-legacy-0",
             "spans": finalize_offsets([make_span("doc", payload)])}]
    corpus = str(tmp_path / "corpus")
    import pyarrow.parquet as pq
    import os
    os.makedirs(corpus)
    pq.write_table(pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA),
                   corpus + "/part.parquet")
    run_extract(corpus, str(tmp_path / "out"))
    df = rd.read_parquet(str(tmp_path / "out/docs")).to_pandas()
    assert len(df) == 1
    assert df.iloc[0]["template"] != "error"
    texts = " ".join(s["text"] for s in df.iloc[0]["spans"])
    assert "paragraph 7" in texts
