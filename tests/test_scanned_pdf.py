"""Scanned-PDF OCR path: full-page-image pages with no text layer are
detected and read by the from-scratch det/rec pipeline (functions/
glyphs.ocr_page + functions/pdf_bytes.build_scanned_pdf/pdf_to_boxes),
the role of the reference's rasterize → OCR flow (deepdoc/parser/
pdf_parser.py:994-1113, deepdoc/vision/ocr.py:70-398)."""

import base64
import json

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ragflow_core16_ray.config import ExtractConfig
from ragflow_core16_ray.functions.glyphs import (CELL_H, CELL_W, PITCH_X,
                                                 _FONT_ROWS,
                                                 _run_length_gcd, _tight,
                                                 _tight_templates,
                                                 normalize_text, ocr_page,
                                                 ocr_page_oriented,
                                                 render_text)
from ragflow_core16_ray.functions.pdf_bytes import (build_pdf,
                                                    build_scanned_pdf,
                                                    expand_pdf_spans,
                                                    pdf_to_boxes)
from ragflow_core16_ray.schemas import finalize_offsets, make_span
from ragflow_core16_ray.stages.extract import extract_doc


def _box_texts(spans):
    return [json.loads(s["text"])["t"] for s in spans if s["kind"] == "box"]


# ------------------------------------------------------------ det/rec ----

def test_font_tight_patterns_unique_and_connected():
    """The classifier's exactness contract: every glyph has a DISTINCT
    ink-tight pattern, and no glyph splits into two ink-column runs
    (segmentation can never cut a glyph in half)."""
    pats = [(p.shape, p.tobytes()) for _, p, _, _ in _tight_templates()]
    assert len(set(pats)) == len(pats)
    for ch, rows in _FONT_ROWS.items():
        if ch == " ":
            continue
        t = _tight(np.array([[(r >> (CELL_W - 1 - x)) & 1
                              for x in range(CELL_W)] for r in rows],
                            dtype=np.uint8))
        assert t is not None
        assert t[0].any(axis=0).all(), f"glyph {ch!r} has a blank column"


def test_ocr_page_arbitrary_offset():
    img = render_text(["HELLO WORLD 42", "PUNCT: A-B, C? D!"])
    page = np.zeros((300, 400), dtype=np.uint8)
    page[91:91 + img.shape[0], 57:57 + img.shape[1]] = img
    lines = ocr_page(page)
    assert [d["text"] for d in lines] == ["HELLO WORLD 42",
                                          "PUNCT: A-B, C? D!"]
    # geometry: full 7-row line frames at the pasted offset
    assert lines[0]["y0"] == 91 + 2          # render margin
    assert lines[0]["y1"] - lines[0]["y0"] == CELL_H
    assert lines[1]["y0"] - lines[0]["y0"] == 9  # line pitch


def test_ocr_page_punct_only_lines_do_not_split():
    """':' and '!' have an internal blank ROW — the band merger must not
    read one line as two."""
    img = render_text(["::::", "!!!!"])
    out = ocr_page(img)
    assert [d["text"] for d in out] == ["::::", "!!!!"]


def test_ocr_page_rejects_non_glyph_images():
    rng = np.random.RandomState(7)
    noise = (rng.rand(60, 60) > 0.5).astype(np.uint8) * 255
    assert ocr_page(noise) == []
    assert ocr_page(np.zeros((20, 20), dtype=np.uint8)) == []
    # a solid blob wider than a glyph cell: photo territory
    blob = np.zeros((30, 30), dtype=np.uint8)
    blob[10:20, 5:25] = 255
    assert ocr_page(blob) == []


_ALPHABET = "".join(c for c in _FONT_ROWS if c != " ")


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.text(alphabet=_ALPHABET + " ", min_size=1, max_size=24),
    min_size=1, max_size=5))
def test_ocr_page_roundtrips_any_font_text(lines):
    rendered = [normalize_text(ln) for ln in lines]
    img = render_text(lines)
    got = [d["text"] for d in ocr_page(img)]
    exp = [ln.strip() for ln in rendered]
    # rendering keeps leading spaces but OCR pen-reconstruction anchors
    # at the first ink, so compare stripped; blank lines vanish
    assert got == [e for e in (ln.strip() for ln in rendered) if e]


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHABET + " ", min_size=1,
                        max_size=16), min_size=1, max_size=3),
       st.integers(min_value=1, max_value=3),
       st.integers(min_value=0, max_value=3))
def test_ocr_oriented_roundtrips_any_dpi_and_rotation(lines, k, rot):
    """Det/rec is exact under the full scanner-variation product:
    any font text × any integer DPI × any quarter-turn feed. A fixed
    asymmetric header line anchors the orientation — a page of ONLY
    180°-symmetric glyphs ('1' vs 'I', 'O', 'X') is genuinely
    orientation-ambiguous, and real scans always carry furniture."""
    lines = ["THE QUICK 2345."] + lines
    img = render_text(lines)
    if k > 1:
        img = np.kron(img, np.ones((k, k), dtype=np.uint8))
    page = np.zeros((img.shape[0] + 2 * k + 11,
                     img.shape[1] + 2 * k + 17), dtype=np.uint8)
    page[2 * k + 4:2 * k + 4 + img.shape[0],
         k + 6:k + 6 + img.shape[1]] = img
    fed = np.rot90(page, -rot).copy()
    got, _r, shape, _sl = ocr_page_oriented(fed)
    exp = [e for e in (normalize_text(ln).strip() for ln in lines) if e]
    assert [d["text"] for d in got] == exp
    if exp:
        assert shape == page.shape


# ----------------------------------------------- scale + orientation ----

@pytest.mark.parametrize("k", [2, 3, 4])
def test_ocr_page_reads_higher_dpi_scans(k):
    """A k-times nearest-neighbor upscale (higher scanner DPI) reads the
    same text; line geometry comes back in INPUT-resolution pixels."""
    base = render_text(["HELLO WORLD 42", "SECOND LINE."])
    img = np.kron(base, np.ones((k, k), dtype=np.uint8))
    page = np.zeros((img.shape[0] + 50, img.shape[1] + 73), dtype=np.uint8)
    page[31:31 + img.shape[0], 57:57 + img.shape[1]] = img
    lines = ocr_page(page)
    assert [d["text"] for d in lines] == ["HELLO WORLD 42", "SECOND LINE."]
    assert lines[0]["y1"] - lines[0]["y0"] == CELL_H * k
    assert lines[1]["y0"] - lines[0]["y0"] == 9 * k


def test_run_length_gcd():
    base = render_text(["MIXED RUN LENGTHS: A-B!"])
    assert _run_length_gcd(base) == 1
    assert _run_length_gcd(np.kron(base, np.ones((3, 3),
                                                 dtype=np.uint8))) == 3


@pytest.mark.parametrize("rot", [0, 1, 2, 3])
def test_ocr_page_oriented_corrects_feed_rotation(rot):
    img = render_text(["UPSIDE DOWN FEED?", "SECOND LINE HERE."])
    page = np.zeros((240, 300), dtype=np.uint8)
    page[61:61 + img.shape[0], 43:43 + img.shape[1]] = img
    fed = np.rot90(page, -rot).copy()   # scanner rotated the page CW
    lines, got_rot, (h, w), _sl = ocr_page_oriented(fed)
    assert [d["text"] for d in lines] == ["UPSIDE DOWN FEED?",
                                          "SECOND LINE HERE."]
    # corrected frame matches the original page dims and geometry
    assert (h, w) == page.shape
    assert lines[0]["y0"] == 61 + 2 and lines[1]["y0"] - lines[0]["y0"] == 9
    if rot == 0:
        assert got_rot == 0


def test_ocr_page_tolerates_small_glyph_noise():
    """A pixel flipped ON strictly inside a glyph's tight frame stays
    within the Hamming cap — the line still reads correctly."""
    img = render_text(["HELLO WORLD"]).copy()
    # the hollow center of the 'O' (5th char: cell x0=2+4*6, mid row/col)
    assert img[5, 28] == 0
    img[5, 28] = 255
    assert [d["text"] for d in ocr_page(img)] == ["HELLO WORLD"]


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=60),
       st.integers(min_value=1, max_value=60),
       st.integers(min_value=0, max_value=2**32 - 1))
def test_ocr_never_crashes_on_arbitrary_bitmaps(h, w, seed):
    """Crash-safety fuzz: ANY uint8 bitmap either reads or returns [] —
    never raises (the poison-containment contract of the scan path)."""
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w) * 255).astype(np.uint8)
    assert isinstance(ocr_page(img), list)
    lines, rot, shape, _sl = ocr_page_oriented(img)
    assert isinstance(lines, list) and rot in (0, 1, 2, 3)


def test_rotated_text_rejected_without_orientation_search():
    """Plain ocr_page must NOT garbage-read a rotated page — the Hamming
    cap rejects mirrored glyph patterns outright."""
    img = render_text(["GLYPHS DO NOT SURVIVE TURNS", "EXCEPT SYMMETRIC"])
    assert ocr_page(np.rot90(img, 2).copy()) == []


# --------------------------------------------------- scanned PDF bytes ----

def test_scanned_pdf_roundtrip_boxes():
    pdf = build_scanned_pdf(
        [["FIRST PAGE TITLE", "", "BODY LINE ONE.", "BODY LINE TWO."],
         ["SECOND PAGE."]], media_box=(600.0, 1000.0))
    boxes = pdf_to_boxes(pdf)
    assert all(s["kind"] == "box" for s in boxes)
    assert _box_texts(boxes) == ["FIRST PAGE TITLE", "BODY LINE ONE.",
                                 "BODY LINE TWO.", "SECOND PAGE."]
    ds = [json.loads(s["text"]) for s in boxes]
    assert [d["page"] for d in ds] == [0, 0, 0, 1]
    # geometry: 36px margin at 1 px/pt on a 1000-unit page → top ≈ 38
    assert ds[0]["top"] == pytest.approx(38.0, abs=1.0)
    assert ds[1]["top"] - ds[0]["top"] == pytest.approx(18.0, abs=1.0)
    # tops strictly increasing within the page
    assert ds[0]["top"] < ds[1]["top"] < ds[2]["top"]


def test_scanned_page_with_unreadable_image_stays_figure():
    """A textless page whose image is NOT glyph text keeps the figure +
    image spans (OCR refuses, nothing is invented)."""
    import zlib

    # build a scanned pdf, then corrupt the image pixels into a blob
    pdf = build_scanned_pdf([["SOME TEXT"]], media_box=(600.0, 1000.0))
    blob = np.zeros((1000, 600), dtype=np.uint8)
    blob[100:300, 100:500] = 255
    z_new = zlib.compress(blob.tobytes(), 6)
    # swap the image stream payload
    marker = b"/Filter /FlateDecode /Length "
    at = pdf.index(marker)
    end = pdf.index(b" ", at + len(marker))
    old_len = int(pdf[at + len(marker):end])
    s0 = pdf.index(b"stream\n", at) + len(b"stream\n")
    pdf2 = (pdf[:at + len(marker)] + str(len(z_new)).encode()
            + pdf[end:s0] + z_new + pdf[s0 + old_len:])
    spans = pdf_to_boxes(pdf2)
    kinds = [s["kind"] for s in spans]
    assert "image" in kinds
    figs = [json.loads(s["text"]) for s in spans if s["kind"] == "box"]
    assert figs and all(d.get("lay") == "figure" for d in figs)


@pytest.mark.parametrize("dpi,rot", [(2, 0), (1, 2), (3, 1), (2, 3)])
def test_scanned_pdf_dpi_and_feed_rotation(dpi, rot):
    """Higher-DPI and rotated scanner feeds decode to the same text in
    reading order; tops stay increasing in the corrected frame."""
    pdf = build_scanned_pdf(
        [["FIRST PAGE TITLE", "", "BODY LINE ONE.", "BODY LINE TWO."]],
        media_box=(600.0, 1000.0), dpi_scale=dpi, feed_rot=rot)
    boxes = pdf_to_boxes(pdf)
    assert _box_texts(boxes) == ["FIRST PAGE TITLE", "BODY LINE ONE.",
                                 "BODY LINE TWO."]
    ds = [json.loads(s["text"]) for s in boxes]
    assert ds[0]["top"] < ds[1]["top"] < ds[2]["top"]


def test_mixed_doc_text_page_and_scanned_page():
    """Text-layer pages keep the interpreter path; OCR only fires on the
    pages with no shows."""
    text_pdf = build_pdf([[(60, 120, 10, "Vector text line.")]],
                         media_box=(600.0, 1000.0))
    scan_pdf = build_scanned_pdf([["RASTER TEXT LINE."]],
                                 media_box=(600.0, 1000.0))
    t_boxes = _box_texts(pdf_to_boxes(text_pdf))
    s_boxes = _box_texts(pdf_to_boxes(scan_pdf))
    assert t_boxes == ["Vector text line."]
    assert s_boxes == ["RASTER TEXT LINE."]


def test_scanned_pdf_through_extract_doc():
    body = ["INTRO HEADING:", "", "STREAM BATCH TABLE SCAN.",
            "MERGE SORT JOIN FILTER."]
    lines = ["DOC HEADER"] + [""] * 5 + body + [""] * 89 + ["PAGE 1/1"]
    pdf = build_scanned_pdf([lines], media_box=(600.0, 1000.0))
    spans = finalize_offsets(expand_pdf_spans(
        [make_span("pdf", base64.b64encode(pdf).decode("ascii"))]))
    tmpl, out, _ = extract_doc(spans, ExtractConfig())
    text = " ".join(s["text"] for s in out)
    assert "STREAM BATCH TABLE SCAN." in text
    assert "MERGE SORT JOIN FILTER." in text
    # furniture (header band + bottom page number) never reaches output
    assert "DOC HEADER" not in text
    assert "PAGE 1" not in text


def test_scanned_table_recovers_cells_and_rows():
    """An aligned multi-space column block on a scanned page comes back
    as per-cell table boxes (lay=table) and extracts to header-keyed
    table rows — the role of TSR over scanned input
    (table_structure_recognizer.py:29-92)."""
    lines = (["DOC HEADER", "", "", "", "", "",
              "SOME BODY SENTENCE HERE.",
              "",
              "ITEM          QTY     PRICE",
              "ALPHA         2       300",
              "BETA          17      925",
              "",
              "MORE PROSE AFTER THE TABLE."]
             + [""] * 87 + ["PAGE 1/1"])
    pdf = build_scanned_pdf([lines], media_box=(600.0, 1000.0))
    boxes = pdf_to_boxes(pdf)
    cells = [json.loads(s["text"]) for s in boxes
             if json.loads(s["text"]).get("lay") == "table"]
    assert [c["t"] for c in cells] == ["ITEM", "QTY", "PRICE",
                                       "ALPHA", "2", "300",
                                       "BETA", "17", "925"]
    # column alignment: same x0 within a column, distinct across
    assert cells[0]["x0"] == cells[3]["x0"] == cells[6]["x0"]
    assert cells[0]["x0"] < cells[1]["x0"] < cells[2]["x0"]
    spans = finalize_offsets(expand_pdf_spans(
        [make_span("pdf", base64.b64encode(pdf).decode("ascii"))]))
    _tmpl, out, _ = extract_doc(spans, ExtractConfig())
    rows = [s["text"] for s in out if s["kind"] == "table_row"]
    assert rows == ["ITEM：ALPHA; QTY：2; PRICE：300",
                    "ITEM：BETA; QTY：17; PRICE：925"]
    texts = " ".join(s["text"] for s in out)
    assert "SOME BODY SENTENCE HERE." in texts
    assert "MORE PROSE AFTER THE TABLE." in texts


def test_scan_table_detection_requires_aligned_run():
    """A single multi-segment line (no aligned neighbor) stays prose;
    misaligned multi-segment lines stay prose; 2-segment aligned runs
    are COLUMNS (not tables) — table regions need >=3 segments."""
    from ragflow_core16_ray.functions.pdf_bytes import _detect_scan_tables

    mk = lambda t, y: {"text": t, "x0": 0, "x1": 10, "y0": y, "y1": y + 7}
    # one tabular-looking line alone
    got = _detect_scan_tables([mk("A    B    C", 0),
                               mk("PLAIN PROSE", 9)])
    assert [s for _, s in got] == [None, None]
    # two lines with different column starts
    got = _detect_scan_tables([mk("AA    B    C", 0),
                               mk("A    BB    C", 9)])
    assert [s for _, s in got] == [None, None]
    # two aligned 3-segment lines -> both tables
    got = _detect_scan_tables([mk("AA    B    C", 0),
                               mk("XY    Z    W", 9)])
    assert all(s is not None and len(s) == 3 for _, s in got)
    # two aligned 2-SEGMENT lines: two-column text, not a table
    got = _detect_scan_tables([mk("AA    B", 0), mk("XY    Z", 9)])
    assert [s for _, s in got] == [None, None]


def test_scanned_two_column_page_splits_and_orders():
    """A two-column scanned page emits one box per column block, and
    pdfish's two-column ordering reads the LEFT column fully before the
    right — the text-PDF column contract, now from scans."""
    left = ["LEFT ONE FIRST LINE HERE.", "LEFT TWO SECOND LINE NOW.",
            "LEFT THREE GOES ON MORE.", "LEFT FOUR KEEPS GOING TOO.",
            "LEFT FIVE STILL MORE TEXT.", "LEFT SIX ALMOST DONE NOW.",
            "LEFT SEVEN LAST OF COLUMN."]
    right = ["RIGHT ONE STARTS COLUMN B.", "RIGHT TWO CONTINUES IT ON.",
             "RIGHT THREE MORE OF THAT.", "RIGHT FOUR KEEPS FILLING.",
             "RIGHT FIVE NEARLY THERE.", "RIGHT SIX AND THEN SOME.",
             "RIGHT SEVEN ENDS THE PAGE."]
    body = [(a.ljust(30) + "          " + b)
            for a, b in zip(left, right)]
    lines = (["DOC HEADER"] + [""] * 5 + body + [""] * 87
             + ["PAGE 1/1"])
    pdf = build_scanned_pdf([lines], media_box=(600.0, 1000.0))
    boxes = [json.loads(s["text"]) for s in pdf_to_boxes(pdf)]
    body_boxes = [b for b in boxes
                  if b["t"].startswith(("LEFT", "RIGHT"))]
    assert len(body_boxes) == 14        # one box per column block
    xs = {b["t"].split()[0] for b in body_boxes if b["x0"] < 200}
    assert xs == {"LEFT"}
    spans = finalize_offsets(expand_pdf_spans(
        [make_span("pdf", base64.b64encode(pdf).decode("ascii"))]))
    _tmpl, out, _ = extract_doc(spans, ExtractConfig())
    text = " ".join(s["text"] for s in out)
    assert text.index("LEFT SEVEN") < text.index("RIGHT ONE")


def test_scanned_mixed_text_and_photo_page():
    """A photo region amid scanned text: the text still reads, the
    photo band comes back as a lay=figure box plus an image span whose
    payload is the REAL pixel crop of the region."""
    from ragflow_core16_ray.functions.image_ops import decode_image

    lines = (["DOC HEADER", "", "", "", "", "",
              "TEXT ABOVE THE PHOTO."]
             + [""] * 8 + ["TEXT BELOW THE PHOTO."]
             + [""] * 83 + ["PAGE 1/1"])
    pdf = build_scanned_pdf([lines], media_box=(600.0, 1000.0),
                            photos=[[(110, 100, 60, 300, 3)]])
    spans = pdf_to_boxes(pdf)
    texts = _box_texts(spans)
    assert "TEXT ABOVE THE PHOTO." in texts
    assert "TEXT BELOW THE PHOTO." in texts
    figs = [json.loads(s["text"]) for s in spans
            if s["kind"] == "box"
            and json.loads(s["text"]).get("lay") == "figure"]
    assert len(figs) == 1
    assert figs[0]["top"] == pytest.approx(110.0, abs=1.0)
    imgs = [s for s in spans if s["kind"] == "image"]
    assert len(imgs) == 1 and imgs[0]["media_ref"] == "pdf://0/Im0/scanfig0"
    crop = decode_image(base64.b64decode(imgs[0]["text"]))
    assert crop.shape == (60, 300)
    # extraction: sections + a figure, photo pixels never become text
    doc = finalize_offsets(expand_pdf_spans(
        [make_span("pdf", base64.b64encode(pdf).decode("ascii"))]))
    _tmpl, out, _ = extract_doc(doc, ExtractConfig())
    text = " ".join(s["text"] for s in out)
    assert "TEXT ABOVE THE PHOTO." in text
    assert "TEXT BELOW THE PHOTO." in text
    assert any(s["kind"] == "figure" for s in out)


def test_scanned_mixed_page_at_higher_dpi():
    """The photo region and text both survive a 2x-DPI scan — the
    whole sheet (photo included) samples at the scanner DPI, and the
    scale detector's block-constancy check still accepts the page."""
    lines = (["DOC HEADER", "", "", "", "", "",
              "TEXT NEXT TO A PHOTO."] + [""] * 93 + ["PAGE 1/1"])
    pdf = build_scanned_pdf([lines], media_box=(600.0, 1000.0),
                            dpi_scale=2,
                            photos=[[(140, 80, 40, 200, 9)]])
    spans = pdf_to_boxes(pdf)
    assert "TEXT NEXT TO A PHOTO." in _box_texts(spans)
    assert any(s["kind"] == "image" for s in spans)


def test_scan_archetype_generates_and_extracts():
    from ragflow_core16_ray.sources.synth import gen_doc

    d = gen_doc(42, 155, mega_every=150)
    assert d["doc_id"].startswith("doc-scan-")
    spans = expand_pdf_spans(d["spans"])
    # boxes plus (for pages with a photo region) real image crops
    assert {s["kind"] for s in spans} <= {"box", "image"}
    assert any(s["kind"] == "box" for s in spans)
    tmpl, out, _ = extract_doc(finalize_offsets(spans), ExtractConfig())
    assert tmpl != "error" and len(out) >= 1
    assert all(s["text"] == s["text"].upper() for s in out
               if s["kind"] == "section")


@pytest.mark.parametrize("kw", [
    {"skew_slope": 0.013}, {"skew_slope": -0.027},
    {"skew_slope": 0.04}, {"skew_slope": 0.02, "dpi_scale": 2},
    {"skew_slope": 0.02, "feed_rot": 2},
    {"skew_slope": -0.015, "dpi_scale": 3, "feed_rot": 1}])
def test_scanned_pdf_deskew(kw):
    """Small-angle scanner skew (integer column-shear model) deskews
    exactly — alone and combined with DPI scaling and feed rotation."""
    lines = (["DOC HEADER", "", "", "", "", "",
              "SKEWED BODY LINE ONE.", "SKEWED BODY LINE TWO.",
              "AND A THIRD LINE HERE."] + [""] * 88 + ["PAGE 1/1"])
    pdf = build_scanned_pdf([lines], media_box=(600.0, 1000.0), **kw)
    texts = _box_texts(pdf_to_boxes(pdf))
    assert texts == ["DOC HEADER", "SKEWED BODY LINE ONE.",
                     "SKEWED BODY LINE TWO.", "AND A THIRD LINE HERE.",
                     "PAGE 1 1"]


def test_shear_estimator_zero_on_straight_pages():
    from ragflow_core16_ray.functions.glyphs import (_estimate_shear,
                                                     _unshear)

    img = render_text(["A PERFECTLY STRAIGHT LINE.", "AND ANOTHER ONE."])
    b = (img > 127).astype(np.uint8)
    assert _estimate_shear(b) == 0.0
    assert _unshear(b, 0.0) is b
