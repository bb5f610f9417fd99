"""PDF-from-bytes ingestion (functions/pdf_bytes.py): the pure-Python
text-layer extractor standing in for pdfplumber char extraction
(deepdoc/parser/pdf_parser.py:994-1113), plus its integration with the
extraction engine (pdf payload span → boxes → pdfish)."""

import base64
import json
import zlib

import pytest

from ragflow_core16_ray.config import ExtractConfig
from ragflow_core16_ray.functions.pdf_bytes import (build_pdf,
                                                    expand_pdf_spans,
                                                    pdf_to_boxes)
from ragflow_core16_ray.schemas import finalize_offsets, make_span
from ragflow_core16_ray.stages.extract import extract_doc


def _texts(boxes):
    return [json.loads(b["text"])["t"] for b in boxes]


def test_roundtrip_text_and_geometry():
    pages = [[(100, 82, 18, "The Title Line"),
              (60, 150, 10, "Body with (parens) and \\ backslash.")],
             [(320, 200, 10, "Second page, right column.")]]
    boxes = pdf_to_boxes(build_pdf(pages, media_box=(600.0, 1000.0)))
    assert _texts(boxes) == ["The Title Line",
                             "Body with (parens) and \\ backslash.",
                             "Second page, right column."]
    ds = [json.loads(b["text"]) for b in boxes]
    assert [d["page"] for d in ds] == [0, 0, 1]
    # 600x1000 media box carries box-IR coords through unscaled
    assert ds[0]["top"] == pytest.approx(82, abs=0.5)
    assert ds[0]["bot"] - ds[0]["top"] == pytest.approx(18, abs=0.5)
    assert ds[2]["x0"] == pytest.approx(320, abs=0.5)


def test_mediabox_scaling_to_1000():
    # US-Letter page: y scales by 1000/792
    boxes = pdf_to_boxes(build_pdf([[(61.6, 79.2, 15.84, "Scaled")]],
                                   media_box=(612.0, 792.0)))
    d = json.loads(boxes[0]["text"])
    assert d["top"] == pytest.approx(100, abs=0.5)
    assert d["bot"] - d["top"] == pytest.approx(20, abs=0.5)
    assert d["x0"] == pytest.approx(77.8, abs=0.5)


def test_content_stream_operators():
    # hand-written content stream exercising TL/T*/Tm/TJ/'/" and escapes
    content = b"""BT
/F1 12 Tf 14 TL 50 700 Td
(first line) Tj
(second via quote) '
[(kerned ) -120 (array)] TJ
1 0 0 1 50 600 Tm
(via Tm) Tj
T* (after Tstar) Tj
<68657821> Tj
(octal \\101\\102) Tj
ET"""
    stream = zlib.compress(content)
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
           b"/MediaBox [0 0 600 1000] /Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(stream)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + stream
           + b"\nendstream\nendobj\n")
    texts = _texts(pdf_to_boxes(pdf))
    # line assembly: shows continuing at the pen position on one
    # baseline are ONE visual line (zero gap → no space inserted)
    assert texts == ["first line", "second via quotekerned array",
                     "via Tm", "after Tstarhex!octal AB"]


def test_quote_advances_line():
    boxes = pdf_to_boxes(build_pdf([[(50, 100, 10, "a")]]))
    base = json.loads(boxes[0]["text"])
    content = b"BT /F1 10 Tf 12 TL 50 900 Td (a) Tj (b) ' ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /MediaBox [0 0 600 1000] "
           b"/Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    a, b = (json.loads(x["text"]) for x in pdf_to_boxes(pdf))
    assert b["top"] - a["top"] == pytest.approx(12, abs=0.1)
    assert base  # silence unused warning


def test_rejects_non_pdf_and_empty_text_layer():
    with pytest.raises(ValueError):
        pdf_to_boxes(b"GIF89a not a pdf")
    # a structurally valid PDF with no text ops (scanned page) yields []
    assert pdf_to_boxes(build_pdf([[]])) == []


def test_expand_pdf_spans_idempotent_and_poison_safe():
    payload = base64.b64encode(
        build_pdf([[(60, 200, 10, "hello pdf")]],
                  media_box=(600.0, 1000.0))).decode()
    spans = finalize_offsets([make_span("pdf", payload)])
    out = expand_pdf_spans(spans)
    assert [s["kind"] for s in out] == ["box"]
    assert expand_pdf_spans(out) is out  # no-op without pdf kinds
    junk = finalize_offsets([make_span("pdf", "bm90IGEgcGRm")])
    assert expand_pdf_spans(junk) == []


def test_extract_doc_from_pdf_bytes_end_to_end():
    from ragflow_core16_ray.sources.synth import _gen_pdf, _rng

    spans = finalize_offsets(_gen_pdf(_rng(43, 1), "doc-pdf-00000001"))
    tmpl, out, _ = extract_doc(spans)
    assert tmpl == "pdfish"
    joined = "\n".join(s["text"] for s in out)
    assert joined
    assert "Jrnl of" not in joined     # repeated header stripped
    assert "page 1/" not in joined     # footer stripped
    assert any(s["kind"] == "title" for s in out)


def test_pdf_shard_path_equals_fused():
    pages = [[(50, 12, 9, "HDR repeated")]
             + [(60, 120 + 55 * i, 10,
                 f"line {p}-{i} alpha beta gamma delta.") for i in range(12)]
             + [(270, 965, 8, f"page {p + 1}/30")]
             for p in range(30)]
    payload = base64.b64encode(
        build_pdf(pages, media_box=(600.0, 1000.0))).decode()
    spans = finalize_offsets([make_span("pdf", payload)])
    t1, out1, n1 = extract_doc(
        spans, ExtractConfig(shard_span_threshold=50, task_page_size=8))
    t2, out2, n2 = extract_doc(spans, ExtractConfig())
    assert n1 > 1 and n2 == 1 and t1 == t2 == "pdfish"
    assert [(s["kind"], s["text"]) for s in out1] \
        == [(s["kind"], s["text"]) for s in out2]


def test_objstm_layout_parses_identically():
    """PDF 1.5+ compressed object streams (/Type /ObjStm) hold the
    catalog/pages/page dicts in most real-world PDFs; the scanner's
    second-pass unpack must recover them (PDF 32000-1 §7.5.7)."""
    pages = [[(100, 82, 18, "Title Here"), (60, 150, 10, "Body line one.")],
             [(60, 120, 10, "Page two body.")]]
    classic = pdf_to_boxes(build_pdf(pages, media_box=(600.0, 1000.0)))
    objstm = pdf_to_boxes(build_pdf(pages, media_box=(600.0, 1000.0),
                                    use_objstm=True))
    key = [(json.loads(b["text"])["t"], json.loads(b["text"])["page"])
           for b in classic]
    assert key == [("Title Here", 0), ("Body line one.", 0),
                   ("Page two body.", 1)]
    assert [(json.loads(b["text"])["t"], json.loads(b["text"])["page"])
            for b in objstm] == key


def _outline_pdf(objstm=False):
    # two chapters whose headings match the outline titles; bodies long
    # enough (>32 tokens) that manual packing does not glue everything
    body1 = " ".join(f"alpha{i}" for i in range(40))
    body2 = " ".join(f"beta{i}" for i in range(40))
    pages = [[(72, 80, 16, "Chapter One Overview"),
              (72, 120, 10, body1)],
             [(72, 80, 16, "Chapter Two Details"),
              (72, 120, 10, body2)]]
    ol = [("Chapter One Overview", 0), ("Chapter Two Details", 0)]
    return build_pdf(pages, use_objstm=objstm, outlines=ol), ol


def test_outline_roundtrip_nested_and_escaped():
    from ragflow_core16_ray.functions.pdf_bytes import pdf_outlines

    pages = [[(72, 80, 12, "x")]]
    ol = [("Top (one)", 0), ("Child \\ two", 1), ("Grand", 2),
          ("Top2", 0)]
    for objstm in (False, True):
        data = build_pdf(pages, use_objstm=objstm, outlines=ol)
        assert pdf_outlines(data) == ol
    assert pdf_outlines(build_pdf(pages)) == []


def test_expand_emits_toc_spans_and_phaseb_strips_them():
    import base64 as b64

    from ragflow_core16_ray.functions.pdf_bytes import expand_pdf_spans

    data, ol = _outline_pdf()
    spans = finalize_offsets([make_span("pdf",
                                        b64.b64encode(data).decode())])
    expanded = expand_pdf_spans(spans)
    toc = [s for s in expanded if s["kind"] == "toc_entry"]
    assert len(toc) == 2
    tmpl, out, _ = extract_doc(spans)
    assert all(s["kind"] != "toc_entry" for s in out)


def test_manual_template_uses_outline_levels():
    import base64 as b64

    data, ol = _outline_pdf()
    spans = finalize_offsets([make_span("pdf",
                                        b64.b64encode(data).decode())])
    from ragflow_core16_ray.config import ExtractConfig

    tmpl, out, _ = extract_doc(
        spans, ExtractConfig(template_override="manual"))
    assert tmpl == "manual"
    secs = [s["text"] for s in out if s["kind"] == "section"]
    # outline pivot: each chapter heading starts its own chunk
    assert len(secs) == 2
    assert secs[0].startswith("Chapter One Overview")
    assert secs[1].startswith("Chapter Two Details")
    assert "toc_entry" not in {s["kind"] for s in out}


def test_manual_outline_sharded_equals_fused():
    import base64 as b64

    from ragflow_core16_ray.config import ExtractConfig

    data, ol = _outline_pdf(objstm=True)
    spans = finalize_offsets([make_span("pdf",
                                        b64.b64encode(data).decode())])
    cfg_small = ExtractConfig(template_override="manual",
                              shard_span_threshold=2, task_page_size=1)
    t1, out1, n1 = extract_doc(spans, cfg_small)
    t2, out2, n2 = extract_doc(
        spans, ExtractConfig(template_override="manual"))
    assert n1 > 1 and n2 == 1
    assert [(s["kind"], s["text"]) for s in out1] \
        == [(s["kind"], s["text"]) for s in out2]


def test_outline_cycle_terminates():
    from ragflow_core16_ray.functions.pdf_bytes import pdf_outlines

    # hand-built PDF whose outline items /Next each other in a cycle —
    # the walk must visit each once and stop
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R /Outlines 5 0 R >>"
            b"\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Count 0 /Kids [] >>\nendobj\n"
            b"5 0 obj\n<< /Type /Outlines /First 6 0 R >>\nendobj\n"
            b"6 0 obj\n<< /Title (A) /Parent 5 0 R /Next 7 0 R >>\nendobj\n"
            b"7 0 obj\n<< /Title (B) /Parent 5 0 R /Next 6 0 R >>\nendobj\n"
            b"trailer\n<< /Size 8 /Root 1 0 R >>\n%%EOF\n")
    assert pdf_outlines(body) == [("A", 0), ("B", 0)]
    # self-referential /First: child loop also terminates
    body2 = body.replace(b"<< /Title (A) /Parent 5 0 R /Next 7 0 R >>",
                         b"<< /Title (A) /Parent 5 0 R /First 6 0 R >>")
    assert pdf_outlines(body2) == [("A", 0)]


def test_cid_font_cjk_roundtrip():
    import json as _json

    pages = [[(72, 80, 14, "Latin Heading"),
              (72, 120, 10, "数据流处理引擎的核心组件"),
              (72, 160, 10, "mixed 中文 and ascii")]]
    for objstm in (False, True):
        data = build_pdf(pages, use_objstm=objstm)
        texts = [_json.loads(b["text"])["t"] for b in pdf_to_boxes(data)]
        assert texts == ["Latin Heading", "数据流处理引擎的核心组件",
                         "mixed 中文 and ascii"], objstm
    # astral chars degrade to U+FFFD (2-byte CID limit), latin survives
    data = build_pdf([[(72, 80, 10, "emoji 🙂 x")]])
    t = _json.loads(pdf_to_boxes(data)[0]["text"])["t"]
    assert t == "emoji � x"


def test_cmap_bfchar_and_both_bfrange_forms():
    from ragflow_core16_ray.functions.pdf_bytes import (_cmap_decoder,
                                                        _parse_cmap)

    cm = (b"2 beginbfchar\n<0001> <4E2D>\n<0002> <6587>\nendbfchar\n"
          b"1 beginbfrange\n<0010> <0012> [<0041> <0042> <0043>]\n"
          b"endbfrange\n"
          b"1 beginbfrange\n<0100> <0102> <0061>\nendbfrange\n")
    chars, ranges, nb = _parse_cmap(cm)
    assert nb == 2
    dec = _cmap_decoder(chars, ranges, nb)
    src = ("".join(chr(0) + chr(c) for c in (1, 2, 0x10, 0x11, 0x12))
           + chr(1) + chr(0) + chr(1) + chr(2) + chr(0) + chr(0xFF))
    # bfchar hits, array range A/B/C, offset range a..c, unmapped FFFD
    assert dec(src) == "中文ABCac�"
    # multi-code-unit destination (surrogate-free BMP pair)
    chars2, _, _nb2 = _parse_cmap(b"1 beginbfchar\n<0003> <00480049>\n"
                                  b"endbfchar\n")
    assert _cmap_decoder(chars2, [])(chr(0) + chr(3)) == "HI"


def test_encrypted_pdf_refused_loudly_and_contained():
    import base64 as b64

    import pytest as _pt

    from ragflow_core16_ray.functions.pdf_bytes import expand_pdf_spans

    data = build_pdf([[(72, 80, 10, "secret")]])
    enc = data.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with _pt.raises(ValueError, match="encrypted"):
        pdf_to_boxes(enc)
    # poison containment: the payload span degrades to nothing rather
    # than crashing the doc (same path as undecodable bytes)
    spans = finalize_offsets([make_span("pdf",
                                        b64.b64encode(enc).decode())])
    assert expand_pdf_spans(spans) == []


def test_embedded_image_xobject_extracts_and_decodes():
    import base64 as b64

    import numpy as np

    from ragflow_core16_ray.functions.image_ops import decode_image

    # hand-built PDF: one raw DeviceRGB 4x2 image placed via cm + Do
    pix = bytes(range(24))
    content = zlib.compress(b"q 100 0 0 50 30 600 cm /Im1 Do Q")
    img = (b"<< /Subtype /Image /Width 4 /Height 2 /BitsPerComponent 8 "
           b"/ColorSpace /DeviceRGB /Length " + str(len(pix)).encode()
           + b" >>\nstream\n" + pix + b"\nendstream")
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
           b"/MediaBox [0 0 600 1000] /Resources << /XObject "
           b"<< /Im1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + content
           + b"\nendstream\nendobj\n"
           b"5 0 obj\n" + img + b"\nendobj\n")
    boxes = pdf_to_boxes(pdf)
    kinds = [b["kind"] for b in boxes]
    assert kinds == ["box", "image"]
    import json as _json
    fig = _json.loads(boxes[0]["text"])
    assert fig["lay"] == "figure"
    assert abs(fig["x0"] - 30.0) < 1 and abs(fig["x1"] - 130.0) < 1
    # the raw bitmap transcoded to PNG by the in-house codec — and
    # decodes back to the exact pixels
    arr = decode_image(b64.b64decode(boxes[1]["text"]))
    assert arr.shape == (2, 4, 3)
    assert bytes(np.asarray(arr, dtype=np.uint8).tobytes()) == pix
    assert boxes[1]["media_ref"] == "pdf://0/Im1"


def test_outline_utf16be_titles_decode():
    from ragflow_core16_ray.functions.pdf_bytes import pdf_outlines

    # real-world writers emit non-ASCII outline titles as UTF-16BE with
    # a BOM inside the literal string
    title = "제1장 개요"
    lit = b"\xfe\xff" + title.encode("utf-16-be")
    esc = lit.replace(b"\\", rb"\\").replace(b"(", rb"\(") \
             .replace(b")", rb"\)")
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R /Outlines 5 0 R >>"
            b"\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Count 0 /Kids [] >>\nendobj\n"
            b"5 0 obj\n<< /Type /Outlines /First 6 0 R >>\nendobj\n"
            b"6 0 obj\n<< /Title (" + esc + b") /Parent 5 0 R >>"
            b"\nendobj\ntrailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n")
    assert pdf_outlines(body) == [(title, 0)]


# ----------------------------------------------------- font metrics ----

def test_helvetica_widths_drive_x1():
    # builder stamps the core-14 Helvetica /Widths on /F1; the parser
    # must read them back: x1 - x0 == sum(AFM widths)/1000 * size
    from ragflow_core16_ray.functions.pdf_bytes import _HELV_WIDTHS
    boxes = pdf_to_boxes(build_pdf([[(100, 200, 10, "Hi")]],
                                   media_box=(600.0, 1000.0)))
    d = json.loads(boxes[0]["text"])
    want = (_HELV_WIDTHS[ord("H") - 32]
            + _HELV_WIDTHS[ord("i") - 32]) / 1000.0 * 10
    assert d["x1"] - d["x0"] == pytest.approx(want, abs=0.05)
    assert want == pytest.approx(9.44, abs=0.01)   # 722 + 222


def test_builder_kerned_tj_roundtrips():
    # 'alpha title' hits the builder's crc32%4==0 kerned-TJ branch: the
    # emitted bytes contain a TJ array and the parser re-joins the two
    # pieces through metric-exact advances
    pdf = build_pdf([[(50, 100, 12, "alpha title")]])
    assert b"] TJ" in zlib.decompress(
        pdf[pdf.find(b"stream\n") + 7:pdf.find(b"\nendstream")])
    assert _texts(pdf_to_boxes(pdf)) == ["alpha title"]


def test_tj_elementwise_positions_split_columns():
    # a huge positive kern moves the pen LEFT-to-RIGHT by 3 em — far
    # past the 1-em merge ceiling, so the two TJ elements must surface
    # as separate boxes at metric-exact x positions (the old
    # join-the-strings interpreter would emit one box)
    content = b"BT /F1 10 Tf 50 900 Td [(left) -3000 (right)] TJ ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /MediaBox [0 0 600 1000] "
           b"/Resources << /Font << /F1 5 0 R >> >> "
           b"/Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
           b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont "
           b"/Helvetica /FirstChar 108 /LastChar 116 /Widths "
           b"[222 833 556 556 556 556 333 500 278] >>\nendobj\n")
    a, b = (json.loads(x["text"]) for x in pdf_to_boxes(pdf))
    assert [a["t"], b["t"]] == ["left", "right"]
    # width('left') = 222+556+278+278... chars l,e,f,t: 222+556+333?
    # use the /Widths above: l=222 e(101)<FirstChar→default, so just
    # assert the 3-em kern separates the pieces by more than 25pt
    assert b["x0"] - a["x1"] == pytest.approx(30, abs=6)


def test_indirect_widths_array_and_tc_tw():
    # /Widths behind an indirect ref + Tc/Tw spacing: advance =
    # sum(w)/1000*size + Tc*len + Tw*spaces   (PDF 32000-1 9.4.4)
    content = b"BT /F1 10 Tf 2 Tc 5 Tw 50 900 Td (a b) Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /MediaBox [0 0 600 1000] "
           b"/Resources << /Font << /F1 5 0 R >> >> "
           b"/Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
           b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
           b" /FirstChar 32 /LastChar 98 /Widths 6 0 R >>\nendobj\n"
           b"6 0 obj\n[" + b" ".join(
               b"278" if i == 32 else b"556" for i in range(32, 99))
           + b"]\nendobj\n")
    d = json.loads(pdf_to_boxes(pdf)[0]["text"])
    # (556 + 278 + 556)/1000*10 + 2*3 + 5*1 = 13.9 + 6 + 5 = 24.9
    assert d["x1"] - d["x0"] == pytest.approx(24.9, abs=0.05)


def test_cid_w_array_and_dw_advances():
    # builder CID font: /DW 1000 (CJK full-width) + /W [32 126 500]
    # (halfwidth latin range); '研 究' = 1000 + 500 + 1000 units
    boxes = pdf_to_boxes(build_pdf([[(50, 100, 10, "研 究")]],
                                   media_box=(600.0, 1000.0)))
    d = json.loads(boxes[0]["text"])
    assert d["t"] == "研 究"
    assert d["x1"] - d["x0"] == pytest.approx(25.0, abs=0.05)


def test_parse_w_array_both_forms():
    from ragflow_core16_ray.functions.pdf_bytes import _parse_w_array
    w = _parse_w_array(b"[ 1 [ 600 650 ] 10 12 800 20 [ 300 ] ]")
    assert w == {1: 600.0, 2: 650.0, 10: 800.0, 11: 800.0, 12: 800.0,
                 20: 300.0}


def test_tz_horizontal_scaling():
    content = b"BT /F1 10 Tf 200 Tz 50 900 Td (aa) Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /MediaBox [0 0 600 1000] "
           b"/Resources << /Font << /F1 5 0 R >> >> "
           b"/Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
           b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
           b" /FirstChar 97 /LastChar 97 /Widths [500] >>\nendobj\n")
    d = json.loads(pdf_to_boxes(pdf)[0]["text"])
    # 2 glyphs * 500/1000 * 10pt, doubled by Tz 200
    assert d["x1"] - d["x0"] == pytest.approx(20.0, abs=0.05)


# ------------------------------------------- simple-font encodings ----

def _one_page_pdf(content: bytes, font_obj: bytes) -> bytes:
    return (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /MediaBox [0 0 600 1000] "
            b"/Resources << /Font << /F1 5 0 R >> >> "
            b"/Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
            b"5 0 obj\n" + font_obj + b"\nendobj\n")


def test_winansi_encoding_decodes_cp1252_range():
    # 0x96 = en dash, 0x99 = trademark in WinAnsi (cp1252); latin-1
    # passthrough would leak C1 control chars — 28/29 of the reference
    # repo's real broker PDFs declare /WinAnsiEncoding
    content = b"BT /F1 10 Tf 50 900 Td (a\x96b\x99c) Tj ET"
    pdf = _one_page_pdf(
        content, b"<< /Type /Font /Subtype /TrueType /BaseFont /Arial "
                 b"/Encoding /WinAnsiEncoding >>")
    assert _texts(pdf_to_boxes(pdf)) == ["a–b™c"]


def test_differences_encoding_remaps_codes():
    # an /Encoding dict: MacRoman base + /Differences re-mapping 0x27
    # to quoteright and 0xd0 to emdash (Adobe Glyph List names)
    content = b"BT /F1 10 Tf 50 900 Td (x\x27y\xd0z) Tj ET"
    pdf = _one_page_pdf(
        content,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/Encoding << /BaseEncoding /MacRomanEncoding "
        b"/Differences [ 39 /quoteright 208 /emdash ] >> >>")
    assert _texts(pdf_to_boxes(pdf)) == ["x’y—z"]


def test_differences_uniXXXX_and_unknown_names():
    content = b"BT /F1 10 Tf 50 900 Td (\x41\x42\x43) Tj ET"
    pdf = _one_page_pdf(
        content,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/Encoding << /Differences [ 65 /uni20AC /nosuchglyph "
        b"/Agrave ] >> >>")
    assert _texts(pdf_to_boxes(pdf)) == ["€�À"]


def test_identity_h_without_tounicode_degrades_to_fffd():
    # Type0/Identity-H with NO /ToUnicode: codes are private glyph IDs;
    # decoding them as latin-1 pairs is mojibake — each 2-byte code
    # must degrade to one U+FFFD (geometry kept, text marked unknown)
    content = b"BT /F1 10 Tf 50 900 Td <04190814> Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /MediaBox [0 0 600 1000] "
           b"/Resources << /Font << /F1 5 0 R >> >> "
           b"/Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
           b"5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Priv "
           b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>\nendobj\n"
           b"6 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont "
           b"/Priv /DW 1000 >>\nendobj\n")
    assert _texts(pdf_to_boxes(pdf)) == ["��"]


# ------------------------------------------------- stream filters ----

def _filtered_pdf(stream: bytes, filt: bytes) -> bytes:
    return _one_page_pdf_stream(stream, filt)


def _one_page_pdf_stream(stream: bytes, filt: bytes) -> bytes:
    return (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /MediaBox [0 0 600 1000] "
            b"/Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(stream)).encode()
            + b" " + filt + b" >>\nstream\n" + stream
            + b"\nendstream\nendobj\n")


CONTENT = b"BT /F1 10 Tf 50 900 Td (filtered text) Tj ET"


def test_ascii85_and_asciihex_filters():
    import base64 as b64
    a85 = b64.a85encode(CONTENT, adobe=True)
    assert _texts(pdf_to_boxes(_filtered_pdf(
        a85, b"/Filter /ASCII85Decode"))) == ["filtered text"]
    ahx = CONTENT.hex().encode() + b">"
    assert _texts(pdf_to_boxes(_filtered_pdf(
        ahx, b"/Filter /ASCIIHexDecode"))) == ["filtered text"]


def test_runlength_and_chained_filters():
    # RunLength-encode: literal runs only (len <= 128)
    rle = b""
    for i in range(0, len(CONTENT), 100):
        chunk = CONTENT[i:i + 100]
        rle += bytes([len(chunk) - 1]) + chunk
    rle += b"\x80"
    assert _texts(pdf_to_boxes(_filtered_pdf(
        rle, b"/Filter /RunLengthDecode"))) == ["filtered text"]
    # chained: RunLength THEN ASCIIHex on the wire = decode AHx first
    chained = rle.hex().encode() + b">"
    assert _texts(pdf_to_boxes(_filtered_pdf(
        chained,
        b"/Filter [ /ASCIIHexDecode /RunLengthDecode ]"))) \
        == ["filtered text"]


def test_lzw_filter_roundtrip():
    from ragflow_core16_ray.functions.pdf_bytes import _lzw_decode

    # hand-build an LZW encoder (PDF variant) to prove the decoder
    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code, bits = 258, 9
        out, buf, nbits = bytearray(), 0, 0

        def emit(code):
            nonlocal buf, nbits
            buf = (buf << bits) | code
            nbits += bits
            while nbits >= 8:
                out.append((buf >> (nbits - 8)) & 0xFF)
                nbits -= 8

        emit(256)
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            emit(table[w])
            table[wc] = next_code
            next_code += 1
            if next_code + 1 >= (1 << bits) and bits < 12:
                bits += 1
            w = bytes([ch])
        if w:
            emit(table[w])
        emit(257)
        if nbits:
            out.append((buf << (8 - nbits)) & 0xFF)
        return bytes(out)

    payload = CONTENT * 3
    assert _lzw_decode(lzw_encode(payload)) == payload
    assert _texts(pdf_to_boxes(_filtered_pdf(
        lzw_encode(CONTENT), b"/Filter /LZWDecode"))) == ["filtered text"]


def test_unknown_filter_yields_no_text_not_crash():
    assert pdf_to_boxes(_filtered_pdf(
        b"\x00\x01\x02", b"/Filter /CCITTFaxDecode")) == []


def test_inline_image_data_skipped():
    # BI…ID <binary with ( and Tj lookalikes> EI must not derail the
    # lexer; text after EI still parses
    content = (b"BT /F1 10 Tf 50 900 Td (before) Tj ET\n"
               b"BI /W 2 /H 2 /CS /G /BPC 8 ID \x00(\xffTj(\x9d EI\n"
               b"BT /F1 10 Tf 50 800 Td (after) Tj ET")
    pdf = _one_page_pdf_stream(content, b"")
    assert _texts(pdf_to_boxes(pdf)) == ["before", "after"]


def test_inherited_mediabox_and_resources():
    # the page node carries neither /MediaBox nor /Resources — both
    # inherit from the /Pages ancestor (PDF 32000-1 7.7.3.4)
    content = b"BT /F1 10 Tf 50 900 Td (inherited) Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] "
           b"/MediaBox [0 0 600 1000] "
           b"/Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
           b"/Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
           b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
           b" /FirstChar 97 /LastChar 122 /Widths [" + b" ".join(
               [b"500"] * 26) + b"] >>\nendobj\n")
    boxes = pdf_to_boxes(pdf)
    d = json.loads(boxes[0]["text"])
    assert d["t"] == "inherited"
    # inherited 1000-high MediaBox → unscaled coords (top = 1000-900-10)
    assert d["top"] == pytest.approx(90, abs=0.5)
    # inherited /Resources → /Widths metrics drive x1 (9 glyphs x 0.5em;
    # 'inherited' = 9 lowercase letters @ 500 units @ 10pt)
    assert d["x1"] - d["x0"] == pytest.approx(45.0, abs=0.1)


def test_indirect_length_resolves():
    # /Length N 0 R — the writer streamed before knowing the size; the
    # trailing garbage after the real payload must not leak in
    content = b"BT /F1 10 Tf 50 900 Td (sized) Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /MediaBox [0 0 600 1000] "
           b"/Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length 6 0 R >>\nstream\n" + content
           + b" (garbage) Tj\nendstream\nendobj\n"
           b"6 0 obj\n" + str(len(content)).encode() + b"\nendobj\n")
    assert _texts(pdf_to_boxes(pdf)) == ["sized"]


def test_flate_png_predictor_decodes():
    # Flate + /Predictor 12 (PNG Up) over fixed-width rows — the layout
    # xref/ObjStm writers emit; here on a content stream for coverage
    import numpy as np
    content = b"BT /F1 10 Tf 50 900 Td (predicted) Tj ET"
    cols = 20
    pad = (-len(content)) % cols
    data = np.frombuffer(content + b" " * pad, np.uint8).reshape(-1, cols)
    # PNG Up filter: row - prev_row, filter byte 2 per row
    filtered = bytearray()
    prev = np.zeros(cols, np.uint8)
    for row in data:
        filtered.append(2)
        filtered += ((row.astype(np.int16) - prev) % 256).astype(
            np.uint8).tobytes()
        prev = row
    stream = zlib.compress(bytes(filtered))
    pdf = _one_page_pdf_stream(
        stream,
        f"/Filter /FlateDecode /DecodeParms << /Predictor 12 "
        f"/Columns {cols} >>".encode())
    assert _texts(pdf_to_boxes(pdf)) == ["predicted"]


def test_rotated_page_normalizes_to_reading_space():
    # /Rotate 90 page (displays rotated clockwise): text written going UP
    # the device page (Tm = 90° CCW rotation) reads horizontally after
    # normalization; two fragments on the rotated baseline must assemble
    # into one line with sane reading-space geometry
    content = (b"BT /F1 10 Tf"
               b" 0 1 -1 0 500 100 Tm (rotated ) Tj"
               b" 0 1 -1 0 500 150 Tm (line) Tj ET")
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Rotate 90 >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
           b"/MediaBox [0 0 600 1000] /Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    boxes = pdf_to_boxes(pdf)
    assert _texts(boxes) == ["rotated line"]
    d = json.loads(boxes[0]["text"])
    # display page is 1000 wide x 600 high; scale = 1000/600
    # device (500,100) -> display (100, 600-500=100): x0 = 100*1000/600
    assert d["x0"] == pytest.approx(100 * 1000 / 600, abs=1.0)
    assert d["top"] == pytest.approx((600 - 100 - 10) * 1000 / 600, abs=2.0)


def test_one_byte_tounicode_cmap_simple_font():
    # subsetted simple fonts ship 1-BYTE ToUnicode CMaps; decoding them
    # as 2-byte CIDs mojibakes whole documents (reviewer-found)
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"begincmap\n1 begincodespacerange\n<00> <FF>\n"
            b"endcodespacerange\n"
            b"2 beginbfchar\n<48> <0048>\n<69> <0069>\nendbfchar\n"
            b"endcmap\nend\n")
    content = b"BT /F1 10 Tf 50 900 Td (Hi) Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /MediaBox [0 0 600 1000] "
           b"/Resources << /Font << /F1 5 0 R >> >> "
           b"/Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
           b"5 0 obj\n<< /Type /Font /Subtype /TrueType /BaseFont /Sub "
           b"/Encoding /WinAnsiEncoding /ToUnicode 6 0 R >>\nendobj\n"
           b"6 0 obj\n<< /Length " + str(len(cmap)).encode()
           + b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n")
    assert _texts(pdf_to_boxes(pdf)) == ["Hi"]


def test_indirect_length_with_endobj_in_stream():
    # in-stream 'endobj' bytes must not truncate an indirect-/Length
    # object at scan time (reviewer-found)
    content = b"BT /F1 10 Tf 50 900 Td (before) Tj ET\n% endobj\n" \
              b"BT /F1 10 Tf 50 800 Td (after) Tj ET"
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] >>\nendobj\n"
           b"3 0 obj\n<< /Type /Page /MediaBox [0 0 600 1000] "
           b"/Contents 4 0 R >>\nendobj\n"
           b"4 0 obj\n<< /Length 6 0 R >>\nstream\n" + content
           + b"\nendstream\nendobj\n"
           b"6 0 obj\n" + str(len(content)).encode() + b"\nendobj\n")
    assert _texts(pdf_to_boxes(pdf)) == ["before", "after"]


def test_encrypted_big_pdf_not_page_range_staged():
    """pdf_page_count refuses encrypted PDFs, so a big encrypted doc
    takes the single-task contained-refusal path instead of fanning out
    shard tasks that would each refuse."""
    import pytest as _pt

    from ragflow_core16_ray.functions.pdf_bytes import (build_pdf,
                                                        pdf_page_count)

    pdf = build_pdf([[(60, 900, 10, "line")] for _ in range(60)],
                    media_box=(600.0, 1000.0))
    assert pdf_page_count(pdf) == 60
    enc = pdf.replace(b"trailer\n<<", b"trailer\n<< /Encrypt 9 0 R", 1)
    with _pt.raises(ValueError, match="encrypted"):
        pdf_page_count(enc)
