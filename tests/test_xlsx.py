"""Real .xlsx entry point (functions/xlsx.py): zip+XML codec roundtrip
and the expand-to-row-spans equivalence with the TSV path."""

import base64

import pytest

from ragflow_core16_ray.functions.xlsx import (build_xlsx, expand_xlsx_spans,
                                               is_xlsx, read_xlsx)
from ragflow_core16_ray.schemas import make_span


def test_roundtrip_strings_numbers_exact():
    rows = [["item id", "price", "note"],
            ["17", "12.50", "alpha beta"],
            ["-3", ".5", "  leading and trailing  "],
            ["1e3", "2.5E-2", "x<y&z>\"q'"],
            ["deformed row"]]
    raw = build_xlsx(rows)
    assert is_xlsx(raw)
    sheets = read_xlsx(raw)
    assert len(sheets) == 1 and sheets[0][0] == "Sheet1"
    assert sheets[0][1] == rows


def test_roundtrip_deterministic_bytes():
    rows = [["a", "1"], ["b", "2"]]
    assert build_xlsx(rows) == build_xlsx(rows)


def test_sparse_and_inline_cells():
    # hand-built sheet with a sparse row (cell C only) and an inlineStr
    raw = build_xlsx([["a", "b"]])
    import io
    import zipfile

    zf = zipfile.ZipFile(io.BytesIO(raw))
    parts = {n: zf.read(n) for n in zf.namelist()}
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    parts["xl/worksheets/sheet1.xml"] = (
        f'<worksheet xmlns="{ns}"><sheetData>'
        '<row r="1"><c r="C1" t="inlineStr"><is><t>only c</t></is></c>'
        '</row><row r="2"><c r="A2"><v>7</v></c>'
        '<c r="C2" t="b"><v>1</v></c></row>'
        '</sheetData></worksheet>').encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as out:
        for n, payload in parts.items():
            out.writestr(n, payload)
    sheets = read_xlsx(buf.getvalue())
    assert sheets[0][1] == [["", "", "only c"], ["7", "", "true"]]


def test_rejections():
    with pytest.raises(Exception):
        read_xlsx(b"PK\x03\x04 not a real zip")
    assert not is_xlsx(b"\x89PNG\r\n\x1a\n")


def test_expand_equivalence_with_tsv_path(ray_session):
    """extract_doc over an `xlsx` payload doc == extract_doc over the
    equivalent tab-joined `row` spans — the real-bytes entry point
    changes nothing downstream (template routing, typing, chunking)."""
    from ragflow_core16_ray.stages.extract import extract_doc

    rows = [["item id", "price", "ship date", "active", "note"],
            ["12", "3.50", "2001-05-02", "yes", "first row"],
            ["990", "41.00", "2001-06-07", "no", "second row"],
            ["deformed row"],
            ["7", "8.25", "2001-07-09", "true", "third row"]]
    tsv_spans = [make_span("row", "\t".join(r)) for r in rows]
    xlsx_spans = [make_span(
        "xlsx", base64.b64encode(build_xlsx(rows)).decode("ascii"))]
    t1, out1, n1 = extract_doc(tsv_spans)
    t2, out2, n2 = extract_doc(xlsx_spans)
    assert t1 == t2 == "table"
    assert out1 == out2
    assert n1 == n2


def test_expand_is_idempotent_and_poison_safe():
    spans = [make_span("row", "a\tb")]
    assert expand_xlsx_spans(spans) is spans  # no xlsx kind: same object
    bad = [make_span("xlsx", base64.b64encode(b"garbage").decode()),
           make_span("row", "x\ty")]
    out = expand_xlsx_spans(bad)
    assert [s["kind"] for s in out] == ["row"]
