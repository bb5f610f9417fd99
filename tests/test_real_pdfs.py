"""Real-world PDF parsing: the reference repo ships real Korean broker
research PDFs (its own test inputs, /root/reference/noodle/data/paper).
The pure-Python parser must recover their text layers — real FlateDecode
object streams, real CID fonts with real ToUnicode CMaps — and the full
extraction pipeline must chunk them. Skipped when the reference tree is
absent; assertions are lower bounds so parser improvements don't break
them."""

import glob
import json
import os

import pytest

REF_DIR = "/root/reference/noodle/data/paper"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference PDFs not present")


def _pdfs():
    return sorted(glob.glob(os.path.join(REF_DIR, "*", "*.pdf")))


def test_every_reference_pdf_parses_with_substance():
    from ragflow_core16_ray.functions.pdf_bytes import pdf_to_boxes

    pdfs = _pdfs()
    assert len(pdfs) >= 20
    total_boxes = 0
    hangul_rich = 0
    for p in pdfs:
        boxes = [b for b in pdf_to_boxes(open(p, "rb").read())
                 if b["kind"] == "box"]
        # every cover page has a text layer; /Widths-exact advances make
        # line assembly merge whole visual lines, so the floor is lines,
        # not fragments (min observed 57/doc)
        assert len(boxes) >= 50, p
        total_boxes += len(boxes)
        hangul = sum(1 for b in boxes
                     for ch in json.loads(b["text"])["t"]
                     if "가" <= ch <= "힣")
        if hangul >= 500:
            hangul_rich += 1
    assert total_boxes >= 8_000
    # 27/29 decode real Korean through their ToUnicode CMaps (incl.
    # indirect /Resources and underscore font names); the two misses
    # render their Korean as raster images — OCR territory, out of scope
    assert hangul_rich >= 26


def test_reference_pdf_known_content_recovered():
    from ragflow_core16_ray.functions.pdf_bytes import pdf_to_boxes

    target = [p for p in _pdfs() if "4Q24_Review" in p]
    assert target
    boxes = pdf_to_boxes(open(target[0], "rb").read())
    text = "".join(json.loads(b["text"])["t"] for b in boxes
                   if b["kind"] == "box")
    assert "조선" in text               # sector label on the cover
    assert "orea" in text              # 'Korea' split across Tj runs


def test_reference_pdf_through_full_extraction():
    import base64

    from ragflow_core16_ray.schemas import finalize_offsets, make_span
    from ragflow_core16_ray.stages.extract import extract_doc

    p = _pdfs()[0]
    payload = base64.b64encode(open(p, "rb").read()).decode("ascii")
    spans = finalize_offsets([make_span("pdf", payload)])
    tmpl, out, n_shards = extract_doc(spans)
    assert tmpl == "pdfish"
    secs = [s for s in out if s["kind"] in ("section", "title")]
    assert len(secs) >= 5              # real chunks out of a real PDF


XLSX = "/root/reference/noodle/output/reports/result.xlsx"


@pytest.mark.skipif(not os.path.exists(XLSX), reason="no reference xlsx")
def test_reference_xlsx_reads_and_extracts():
    import base64

    from ragflow_core16_ray.functions.xlsx import read_xlsx
    from ragflow_core16_ray.schemas import finalize_offsets, make_span
    from ragflow_core16_ray.stages.extract import extract_doc

    data = open(XLSX, "rb").read()
    sheets = read_xlsx(data)
    assert len(sheets) == 1
    name, rows = sheets[0]
    assert rows and rows[0][0] == "회사명"     # real sharedStrings decode
    payload = base64.b64encode(data).decode("ascii")
    tmpl, out, _ = extract_doc(
        finalize_offsets([make_span("xlsx", payload)]))
    assert tmpl == "table"
    assert len(out) >= 1


README = "/root/reference/README.md"


@pytest.mark.skipif(not os.path.exists(README), reason="no reference md")
def test_reference_readme_markdown_extracts():
    from ragflow_core16_ray.schemas import finalize_offsets, make_span
    from ragflow_core16_ray.stages.extract import extract_doc

    text = open(README, encoding="utf-8").read()
    tmpl, out, _ = extract_doc(
        finalize_offsets([make_span("md", text)]))
    assert tmpl == "md"
    secs = [s["text"] for s in out if s["kind"] == "section"]
    assert len(secs) >= 3
    assert any("RAGFlow" in s for s in secs)


def test_reference_pdfs_yield_decodable_embedded_images():
    import base64

    from ragflow_core16_ray.functions.image_ops import decode_image
    from ragflow_core16_ray.functions.pdf_bytes import pdf_to_boxes

    decoded = 0
    found = 0
    for p in _pdfs()[:10]:
        boxes = pdf_to_boxes(open(p, "rb").read())
        for b in boxes:
            if b["kind"] != "image":
                continue
            found += 1
            if b["text"]:
                arr = decode_image(base64.b64decode(b["text"]))
                assert arr.ndim in (2, 3) and arr.shape[0] >= 1
                decoded += 1
    assert found >= 15       # real embedded figures surface
    assert decoded >= 10     # most carry in-house-decodable payloads
