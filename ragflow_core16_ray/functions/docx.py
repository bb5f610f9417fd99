"""DOCX (OOXML) reader — from scratch on stdlib zipfile + xml.etree.

python-docx is absent from this container, but a .docx file is just a zip
of XML parts, so the reader the reference gets from python-docx
(rag/app/naive.py:175-238 ``Docx.__call__`` and the simpler
deepdoc/parser/docx_parser.py:116-139) is rebuilt here directly over the
OOXML markup:

- ``word/document.xml`` body children are walked IN ORDER (``w:p``
  paragraphs and ``w:tbl`` tables interleave exactly as in the document);
- paragraph text = concatenation of every ``w:t`` run text (the
  reference's ``"".join(run.text)``, docx_parser.py:129-135);
- paragraph style = ``w:pPr/w:pStyle/@w:val`` (``Title`` / ``Heading1`` /
  ``Caption`` …), the same style names python-docx surfaces;
- inline images = ``a:blip/@r:embed`` relationship ids resolved through
  ``word/_rels/document.xml.rels`` to their media part names — the role
  of python-docx's ``Document.part.related_parts`` in
  ``Docx.get_picture`` (naive.py:120-126);
- a ``Caption``-styled paragraph is associated with the nearest preceding
  image, mirroring naive.py:186-193's former_image pairing (we attach the
  caption text to the figure instead of concatenating pixel images);
- tables render to one HTML string per table with the reference's
  colspan rule: runs of adjacent cells with IDENTICAL text collapse into
  one ``<td colspan='n'>`` (naive.py:216-231 — python-docx repeats the
  text of horizontally merged cells).

The binary travels base64-encoded in the span ``text`` field because the
fixed input schema is all-string; a production Lance table would use a
``binary`` column and skip the base64 hop.
"""

from __future__ import annotations

import base64
import io
import zipfile
from dataclasses import dataclass, field
from xml.etree import ElementTree as ET

_NS_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_NS_R = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_NS_PR = "http://schemas.openxmlformats.org/package/2006/relationships"


def _w(tag: str) -> str:
    return f"{{{_NS_W}}}{tag}"


@dataclass
class ParsedDocx:
    # (text, style, [media part names]) per non-empty paragraph, in order
    paragraphs: list[tuple[str, str, list[str]]] = field(default_factory=list)
    tables: list[str] = field(default_factory=list)  # one HTML string each
    # document order of body children: ("p", paragraph index) and
    # ("tbl", table index) interleaved exactly as in the document — the
    # two flat lists above lose relative position, which matters to
    # consumers like the QA template where a mid-document table must
    # extend the heading it follows (rag/app/qa.py Docx processes tables
    # at position)
    body: list[tuple[str, int]] = field(default_factory=list)


def _load_rels(zf: zipfile.ZipFile) -> dict[str, str]:
    """rId → target part name (word/media/image1.png …)."""
    try:
        raw = zf.read("word/_rels/document.xml.rels")
    except KeyError:
        return {}
    rels = {}
    for rel in ET.fromstring(raw).iter(f"{{{_NS_PR}}}Relationship"):
        rid, target = rel.get("Id"), rel.get("Target", "")
        if rid:
            rels[rid] = target.lstrip("/")
    return rels


def _para_text(p: ET.Element) -> str:
    return "".join(t.text or "" for t in p.iter(_w("t")))


def _para_style(p: ET.Element) -> str:
    ppr = p.find(_w("pPr"))
    if ppr is not None:
        st = ppr.find(_w("pStyle"))
        if st is not None:
            return st.get(_w("val"), "") or ""
    return ""


def _para_images(p: ET.Element, rels: dict[str, str]) -> list[str]:
    refs = []
    for blip in p.iter(f"{{{_NS_A}}}blip"):
        rid = blip.get(f"{{{_NS_R}}}embed")
        if rid and rid in rels:
            refs.append(rels[rid])
    return refs


def _table_html(tbl: ET.Element) -> str:
    """Reference colspan rule (naive.py:216-231): adjacent cells with
    identical text collapse into one colspan'd cell."""
    html = ["<table>"]
    for tr in tbl.findall(_w("tr")):
        cells = ["\n".join(_para_text(p) for p in tc.findall(_w("p")))
                 for tc in tr.findall(_w("tc"))]
        html.append("<tr>")
        i = 0
        while i < len(cells):
            span = 1
            while i + span < len(cells) and cells[i + span] == cells[i]:
                span += 1
            if span == 1:
                html.append(f"<td>{cells[i]}</td>")
            else:
                html.append(f"<td colspan='{span}'>{cells[i]}</td>")
            i += span
        html.append("</tr>")
    html.append("</table>")
    return "".join(html)


def parse_docx(payload: bytes | str) -> ParsedDocx:
    """Parse .docx bytes (or their base64 string form) into ordered
    paragraphs + table HTML. Raises ValueError on a non-docx payload (the
    poison-row path turns that into an error span)."""
    if isinstance(payload, str):
        payload = base64.b64decode(payload)
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
        doc = ET.fromstring(zf.read("word/document.xml"))
    except (zipfile.BadZipFile, KeyError, ET.ParseError) as ex:
        raise ValueError(f"not a docx payload: {ex}") from ex

    rels = _load_rels(zf)
    out = ParsedDocx()
    body = doc.find(_w("body"))
    if body is None:
        return out
    pending_images: list[str] = []  # image-only paragraphs awaiting text
    for child in body:
        if child.tag == _w("tbl"):
            out.body.append(("tbl", len(out.tables)))
            out.tables.append(_table_html(child))
        elif child.tag == _w("p"):
            text = _para_text(child).strip()
            images = _para_images(child, rels)
            if not text:
                # image-only paragraph: attach to the previous text
                # paragraph if any, else hold for the next one
                # (naive.py:202-208 last_image behavior)
                if images:
                    if out.paragraphs:
                        out.paragraphs[-1][2].extend(images)
                    else:
                        pending_images.extend(images)
                continue
            style = _para_style(child)
            if style == "Caption" and not images:
                # caption pairs with the nearest preceding image
                # (naive.py:186-193): steal it from the previous line
                if out.paragraphs and out.paragraphs[-1][2]:
                    images = [out.paragraphs[-1][2].pop()]
            if pending_images:
                images = pending_images + images
                pending_images = []
            out.body.append(("p", len(out.paragraphs)))
            out.paragraphs.append((text, style, images))
    return out
