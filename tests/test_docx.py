"""DOCX reader tests (reference semantics: rag/app/naive.py:175-238,
deepdoc/parser/docx_parser.py:116-139) — OOXML built by hand or via the
synth generator, parsed by the from-scratch zipfile+ElementTree reader."""

import base64
import random

import pytest

from ragflow_core16_ray.functions.docx import parse_docx
from ragflow_core16_ray.schemas import finalize_offsets, make_span
from ragflow_core16_ray.sources.synth import (_docx_bytes, _gen_docx,
                                              _xml_p, _xml_tbl)
from ragflow_core16_ray.stages.extract import extract_doc, route_template


def _doc(body_xml: str, rels=None) -> bytes:
    return _docx_bytes(body_xml, rels or {})


def test_paragraphs_in_order_runs_concatenated():
    body = (_xml_p("Title Line", style="Title")
            + _xml_p("A heading", style="Heading1")
            + _xml_p("a body paragraph long enough to be split into runs"))
    p = parse_docx(_doc(body))
    assert [t for t, _, _ in p.paragraphs] == [
        "Title Line", "A heading",
        "a body paragraph long enough to be split into runs"]
    assert [s for _, s, _ in p.paragraphs] == ["Title", "Heading1", ""]


def test_inline_image_resolved_through_rels():
    rels = {"rId1": "media/image1.png"}
    body = _xml_p("text before") + _xml_p("", rid="rId1") + _xml_p("after")
    p = parse_docx(_doc(body, rels))
    # image-only paragraph attaches to the PREVIOUS text paragraph
    # (naive.py:202-205: lines[-1][1].append(current_image))
    assert p.paragraphs[0][2] == ["media/image1.png"]
    assert p.paragraphs[1][2] == []


def test_leading_image_holds_for_next_paragraph():
    rels = {"rId1": "media/image1.png"}
    body = _xml_p("", rid="rId1") + _xml_p("first text")
    p = parse_docx(_doc(body, rels))
    # last_image behavior (naive.py:206-208,196-199)
    assert p.paragraphs[0][2] == ["media/image1.png"]


def test_caption_steals_preceding_image():
    rels = {"rId1": "media/image1.png"}
    body = (_xml_p("body text") + _xml_p("", rid="rId1")
            + _xml_p("Figure 1: something", style="Caption"))
    p = parse_docx(_doc(body, rels))
    # the caption paragraph claims the image (naive.py:186-193)
    assert p.paragraphs[0][2] == []
    assert p.paragraphs[1] == ("Figure 1: something", "Caption",
                               ["media/image1.png"])


def test_table_colspan_on_adjacent_equal_cells():
    body = _xml_tbl([["merged", "merged", "other"], ["1", "2", "3"]])
    p = parse_docx(_doc(body))
    assert p.tables == [
        "<table><tr><td colspan='2'>merged</td><td>other</td></tr>"
        "<tr><td>1</td><td>2</td><td>3</td></tr></table>"]


def test_tables_and_paragraphs_both_collected():
    body = (_xml_p("before table") + _xml_tbl([["h1", "h2"], ["a", "b"]])
            + _xml_p("after table"))
    p = parse_docx(_doc(body))
    assert [t for t, _, _ in p.paragraphs] == ["before table", "after table"]
    assert len(p.tables) == 1


def test_non_docx_payload_raises():
    with pytest.raises(ValueError):
        parse_docx(b"this is not a zip")
    with pytest.raises(ValueError):
        parse_docx(base64.b64encode(b"also not a zip").decode())


def test_route_and_extract_end_to_end():
    r = random.Random(11)
    spans = finalize_offsets(_gen_docx(r, "doc-docx-11"))
    assert route_template(spans) == "docx"
    tmpl, out, n_shards = extract_doc(spans)
    assert tmpl == "docx"
    kinds = [s["kind"] for s in out]
    assert kinds.count("title") == 1  # first Title para only
    assert "section" in kinds
    # offsets are the emission order contract
    assert [s["offset"] for s in out] == list(range(len(out)))
    # figures carry docx:// media refs resolved through the rels part
    for s in out:
        if s["kind"] == "figure":
            assert s["media_ref"].startswith("docx://media/image")


def test_extract_accepts_caption_figures():
    rels = {"rId1": "media/image1.png"}
    body = (_xml_p("The Doc", style="Title") + _xml_p("some body text here")
            + _xml_p("", rid="rId1")
            + _xml_p("Figure 1: a chart", style="Caption"))
    payload = base64.b64encode(_doc(body, rels)).decode()
    spans = finalize_offsets([make_span("docx", payload)])
    _, out, _ = extract_doc(spans)
    figs = [s for s in out if s["kind"] == "figure"]
    assert len(figs) == 1
    assert figs[0]["text"] == "Figure 1: a chart"  # caption rides the figure
    assert figs[0]["media_ref"] == "docx://media/image1.png"


def test_docx_qa_mode():
    # rag/app/qa.py:185-257 Docx + docx_question_level: Heading-N styles
    # are level-N questions, the heading stack forms the question path,
    # body paragraphs extend the answer, tables fold into the answer
    from ragflow_core16_ray.config import ExtractConfig

    body = (_xml_p("Guide", style="Heading1")
            + _xml_p("What is a shard?", style="Heading2")
            + _xml_p("A unit of parallel work.")
            + _xml_p("Sizing", style="Heading2")
            + _xml_p("How many pages?", style="Heading3")
            + _xml_p("Twelve pages each.")
            + _xml_tbl([["k", "v"], ["a", "1"]]))
    blob = base64.b64encode(_doc(body)).decode()
    spans = [make_span("docx", blob)]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="qa"))
    assert tmpl == "qa"
    qa = [s["text"] for s in out if s["kind"] == "qa"]
    assert qa[0] == "Guide\nWhat is a shard?\nA unit of parallel work."
    assert qa[1].startswith("Guide\nSizing\nHow many pages?\nTwelve pages each.")
    # the trailing table rides the last open answer
    assert "<table>" in qa[1]


def test_docx_qa_mode_mid_document_table_extends_preceding_answer():
    # a table BETWEEN two headings belongs to the heading it follows, not
    # the last heading of the file (the reference's qa.py Docx mode
    # processes body children at position; ParsedDocx.body preserves the
    # paragraph/table interleaving the flat lists lose)
    from ragflow_core16_ray.config import ExtractConfig

    body = (_xml_p("First question?", style="Heading1")
            + _xml_p("First answer.")
            + _xml_tbl([["k", "v"], ["a", "1"]])
            + _xml_p("Second question?", style="Heading1")
            + _xml_p("Second answer."))
    blob = base64.b64encode(_doc(body)).decode()
    spans = [make_span("docx", blob)]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="qa"))
    qa = [s["text"] for s in out if s["kind"] == "qa"]
    assert len(qa) == 2
    assert qa[0].startswith("First question?\nFirst answer.")
    assert "<table>" in qa[0]          # table rides the FIRST answer
    assert "<table>" not in qa[1]
    assert qa[1] == "Second question?\nSecond answer."


def test_parse_docx_body_interleaving_order():
    body = (_xml_p("before") + _xml_tbl([["a"]]) + _xml_p("after")
            + _xml_tbl([["b"]]))
    p = parse_docx(_doc(body))
    assert p.body == [("p", 0), ("tbl", 0), ("p", 1), ("tbl", 1)]
