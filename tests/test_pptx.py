"""PPTX codec: reference ppt_parser semantics over real deck bytes.

Pins the behaviors deepdoc/parser/ppt_parser.py:22-80 gets from
python-pptx: geometric shape sort (top // 10, left), bulleted-paragraph
rendering ('  ' * level + '.' + text), table rows against the header
row, recursive groups, and picture→media-part resolution."""

import base64

import pytest

from ragflow_core16_ray.functions.pptx import (build_pptx, expand_pptx_spans,
                                               is_pptx, read_pptx)
from ragflow_core16_ray.schemas import make_span


def _text_shape(paras, top=0, left=0):
    return {"kind": "text", "paras": paras, "top": top, "left": left}


def test_roundtrip_plain_text_slides():
    deck = build_pptx([
        [_text_shape(["Title One"]), _text_shape(["alpha", "beta"],
                                                 top=1000)],
        [_text_shape(["Title Two"])],
    ])
    assert is_pptx(deck)
    slides = read_pptx(deck)
    assert [s["text"] for s in slides] == ["Title One\nalpha\nbeta",
                                           "Title Two"]


def test_geometric_sort_restores_reading_order():
    # shapes written bottom-first; (top // 10, left) must restore order,
    # including the //10 coarse-bucket tie broken by left
    deck = build_pptx([[
        _text_shape(["footer"], top=50000, left=0),
        _text_shape(["right"], top=103, left=9000),
        _text_shape(["left"], top=101, left=100),  # same top bucket (10)
        _text_shape(["title"], top=0, left=0),
    ]])
    assert read_pptx(deck)[0]["text"] == "title\nleft\nright\nfooter"


def test_bulleted_paragraphs_render_with_level_indent():
    deck = build_pptx([[_text_shape([
        ("Heading", 0, False),
        ("first point", 0, True),
        ("sub point", 1, True),
        ("deep point", 2, True),
    ])]])
    assert read_pptx(deck)[0]["text"] == (
        "Heading\n.first point\n  .sub point\n    .deep point")


def test_empty_paragraphs_are_skipped():
    deck = build_pptx([[_text_shape(["kept", "", "   ", "also kept"])]])
    assert read_pptx(deck)[0]["text"] == "kept\nalso kept"


def test_table_rows_render_against_header():
    deck = build_pptx([[
        {"kind": "table", "top": 200, "left": 0,
         "rows": [["metric", "value"], ["rows", "12"], ["cols", "3"]]},
        _text_shape(["Stats"], top=0),
    ]])
    assert read_pptx(deck)[0]["text"] == (
        "Stats\nmetric: rows; value: 12\nmetric: cols; value: 3")


def test_group_shapes_recurse_with_geometric_sort():
    deck = build_pptx([[
        {"kind": "group", "top": 100, "left": 0, "shapes": [
            _text_shape(["second"], top=900),
            _text_shape(["first"], top=10),
        ]},
        _text_shape(["title"], top=0),
    ]])
    assert read_pptx(deck)[0]["text"] == "title\nfirst\nsecond"


def test_pictures_resolve_to_media_parts():
    png = b"\x89PNG\r\n\x1a\nfakepayload"
    deck = build_pptx([
        [_text_shape(["s1"]), {"kind": "pic", "data": png, "top": 500}],
        [_text_shape(["s2"])],
    ])
    slides = read_pptx(deck)
    assert slides[0]["pics"] == ["ppt/media/image1.png"]
    assert slides[1]["pics"] == []
    # the media part carries the exact bytes
    import io
    import zipfile
    zf = zipfile.ZipFile(io.BytesIO(deck))
    assert zf.read("ppt/media/image1.png") == png


def test_expand_pptx_spans_yields_slide_spans():
    deck = build_pptx([
        [_text_shape(["Intro"]),
         {"kind": "pic", "data": b"\x89PNGxxxx", "top": 9000}],
        [_text_shape(["Body", "line"])],
    ])
    payload = base64.b64encode(deck).decode("ascii")
    spans = expand_pptx_spans([make_span("pptx", payload)])
    assert [s["kind"] for s in spans] == ["slide", "slide"]
    assert spans[0]["text"] == "Intro"
    assert spans[0]["media_ref"] == "pptx://ppt/media/image1.png"
    assert spans[1]["media_ref"] == ""
    assert [s["offset"] for s in spans] == [0, 1]


def test_expand_is_identity_without_pptx_spans():
    spans = [make_span("slide", "hello")]
    assert expand_pptx_spans(spans) is spans


def test_poison_payload_is_dropped_not_raised():
    spans = expand_pptx_spans([
        make_span("slide", "keep me"),
        make_span("pptx", base64.b64encode(b"not a zip").decode()),
    ])
    assert [s["text"] for s in spans] == ["keep me"]


def test_empty_deck_raises():
    with pytest.raises(ValueError):
        read_pptx(build_pptx([]))


def test_special_chars_survive_xml_escaping():
    deck = build_pptx([[_text_shape(['a < b & "c" > d'])]])
    assert read_pptx(deck)[0]["text"] == 'a < b & "c" > d'
