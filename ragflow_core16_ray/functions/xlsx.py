"""Minimal OOXML spreadsheet (.xlsx) codec — no openpyxl.

The reference ingests real workbook BYTES (deepdoc/parser/
excel_parser.py:107-130 loads them with openpyxl and walks
sheet.rows); this engine's table machinery starts at tab-joined `row`
spans. This module closes the gap the same way functions/pdf_bytes.py
did for PDF: an `xlsx` span carries the raw zip, ``expand_xlsx_spans``
turns it into the `row` spans every downstream table stage already
understands — so a real .xlsx file can enter the pipeline.

Reader: zipfile + ElementTree over xl/workbook.xml (+ its rels for
sheet targets, in workbook order), xl/sharedStrings.xml (shared ``si``
entries incl. rich-text runs) and each worksheet's ``sheetData``. Cell
types: ``s`` shared string, ``inlineStr``, ``b`` bool, ``str`` formula
cache, numbers (default) — numbers keep their LEXICAL ``<v>`` text, so
values like "12.50" survive exactly. Missing cells (sparse ``r``
refs) pad as empty strings.

Writer: deterministic zip (fixed timestamps) with the six canonical
parts; numeric-looking cells are written as real number cells, the
rest via sharedStrings (with xml:space preserved). Tabs inside cell
text are replaced by spaces on read — the row span is tab-joined.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_R = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
         "relationships}")
_NUM_RE = re.compile(r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def is_xlsx(data: bytes) -> bool:
    return data[:4] == b"PK\x03\x04" and b"xl/workbook.xml" in data[:4096]


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26, 'BC12'→54 (digits ignored)."""
    n = 0
    for ch in ref:
        if ch.isdigit():
            break
        n = n * 26 + (ord(ch.upper()) - 64)
    return n - 1


def _cell_text(c, shared: list[str]) -> str:
    t = c.get("t", "n")
    if t == "s":
        v = c.find(f"{_NS}v")
        return shared[int(v.text)] if v is not None and v.text else ""
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return ""
        return "".join(el.text or "" for el in is_el.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    raw = v.text if v is not None and v.text is not None else ""
    if t == "b":
        return "true" if raw == "1" else "false"
    return raw  # n / str: the lexical value text


def read_xlsx(data: bytes) -> list[tuple[str, list[list[str]]]]:
    """Workbook bytes → [(sheet name, rows of cell strings)], sheets in
    workbook order, sparse cells padded with ''."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = set(zf.namelist())

    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{_NS}si"):
            shared.append("".join(el.text or ""
                                  for el in si.iter(f"{_NS}t")))

    rels: dict[str, str] = {}
    if "xl/_rels/workbook.xml.rels" in names:
        rroot = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rroot:
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target[1:]
            elif not target.startswith("xl/"):
                target = "xl/" + target
            rels[rel.get("Id", "")] = target

    out: list[tuple[str, list[list[str]]]] = []
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    for sheet in wb.iter(f"{_NS}sheet"):
        name = sheet.get("name", "Sheet")
        target = rels.get(sheet.get(f"{_NS_R}id", ""),
                          "xl/worksheets/sheet1.xml")
        if target not in names:
            continue
        sroot = ET.fromstring(zf.read(target))
        rows: list[list[str]] = []
        for row in sroot.iter(f"{_NS}row"):
            cells: list[str] = []
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r")
                col = _col_index(ref) if ref else len(cells)
                while len(cells) < col:
                    cells.append("")  # sparse refs pad as empty
                cells.append(_cell_text(c, shared).replace("\t", " "))
            rows.append(cells)
        out.append((name, rows))
    if not out:
        raise ValueError("workbook carries no sheets")
    return out


# ---------------------------------------------------------------- writer ----

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
    'worksheet+xml"/>'
    '<Override PartName="/xl/sharedStrings.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
    '</Types>')

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>')

_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/sharedStrings" '
    'Target="sharedStrings.xml"/></Relationships>')


def _col_ref(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def build_xlsx(rows: list[list[str]], sheet_name: str = "Sheet1") -> bytes:
    """Rows of cell strings → a real single-sheet .xlsx. Numeric-looking
    cells become number cells (lexical value preserved); everything else
    goes through sharedStrings. Deterministic bytes (fixed zip
    timestamps) so corpus generation is reproducible."""
    shared: list[str] = []
    shared_ix: dict[str, int] = {}
    body = ['<sheetData>']
    for ri, row in enumerate(rows, start=1):
        body.append(f'<row r="{ri}">')
        for ci, cell in enumerate(row):
            ref = f"{_col_ref(ci)}{ri}"
            if _NUM_RE.match(cell):
                body.append(f'<c r="{ref}"><v>{cell}</v></c>')
            else:
                ix = shared_ix.get(cell)
                if ix is None:
                    ix = shared_ix[cell] = len(shared)
                    shared.append(cell)
                body.append(f'<c r="{ref}" t="s"><v>{ix}</v></c>')
        body.append('</row>')
    body.append('</sheetData>')
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS[1:-1]}">' + "".join(body) + '</worksheet>')
    sst = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
           f'<sst xmlns="{_NS[1:-1]}" count="{len(shared)}" '
           f'uniqueCount="{len(shared)}">']
    for s in shared:
        sst.append(f'<si><t xml:space="preserve">{escape(s)}</t></si>')
    sst.append('</sst>')
    wb_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS[1:-1]}" xmlns:r="{_NS_R[1:-1]}"><sheets>'
        f'<sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/>'
        '</sheets></workbook>')

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, payload in (
                ("[Content_Types].xml", _CONTENT_TYPES),
                ("_rels/.rels", _ROOT_RELS),
                ("xl/workbook.xml", wb_xml),
                ("xl/_rels/workbook.xml.rels", _WB_RELS),
                ("xl/worksheets/sheet1.xml", sheet_xml),
                ("xl/sharedStrings.xml", "".join(sst))):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, payload)
    return buf.getvalue()


def expand_xlsx_spans(spans: list[dict]) -> list[dict]:
    """Replace `xlsx` payload spans (base64 workbook bytes in `text`)
    with tab-joined `row` spans — all sheets in workbook order, exactly
    the IR the table template parses. Idempotent: span lists with no
    `xlsx` kind come back as the same object; undecodable payloads are
    dropped (the poison row is contained one level up)."""
    if not any(s["kind"] == "xlsx" for s in spans):
        return spans
    import base64

    from ..schemas import finalize_offsets, make_span

    out: list[dict] = []
    for s in spans:
        if s["kind"] != "xlsx":
            out.append(s)
            continue
        try:
            for _name, rows in read_xlsx(base64.b64decode(s["text"])):
                for cells in rows:
                    out.append(make_span("row", "\t".join(cells)))
        except Exception:  # noqa: BLE001 — undecodable payload: skip
            pass
    return finalize_offsets(out)
