"""Minimal OOXML presentation (.pptx) codec — no python-pptx.

The reference ingests real presentation BYTES: deepdoc/parser/
ppt_parser.py:22-80 walks the deck with python-pptx (shapes sorted by
``(top // 10, left)``; a bulleted paragraph renders as
``'  ' * level + '.' + text``; a table shape renders data rows as
``'hdr0: c0; hdr1: c1; …'`` against its header row; group shapes
recurse with the same geometric sort), and rag/app/presentation.py
then treats every slide as one chunk. This engine's presentation
template starts at pre-parsed ``slide`` spans; this module closes the
gap the way functions/pdf_bytes.py and functions/xlsx.py do for their
formats — a ``pptx`` span carries the raw zip (base64 in ``text``)
and ``expand_pptx_spans`` turns it into one ``slide`` span per slide.

Reader: zipfile + ElementTree over ppt/presentation.xml (sldIdLst in
deck order, resolved through ppt/_rels/presentation.xml.rels), each
slide's spTree, and each slide's own rels for embedded pictures. Shape
kinds mirrored from the reference: text bodies (``p:sp``), tables
(``p:graphicFrame`` with ``a:tbl``), groups (``p:grpSp``), pictures
(``p:pic`` — no text, surfaced as the slide's media part name).

Writer: deterministic zip (fixed timestamps); shapes may be written
out of reading order — the reader's geometric sort is what restores
it, exactly the invariant the reference relies on.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_R = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
      "relationships}")


def is_pptx(data: bytes) -> bool:
    return (data[:4] == b"PK\x03\x04"
            and b"ppt/presentation.xml" in data[:8192])


# ---------------------------------------------------------------- reader ----

def _para_text(p) -> str:
    """Paragraph text = concatenation of every run/field ``a:t``
    (python-pptx ``paragraph.text``)."""
    return "".join(t.text or "" for t in p.iter(f"{_A}t"))


def _bulleted_text(p) -> str:
    """ppt_parser.py:26-31 __get_bulleted_text: a paragraph whose pPr
    carries buChar / buAutoNum / buBlip renders indented with a leading
    dot; anything else is its plain text."""
    text = _para_text(p)
    ppr = p.find(f"{_A}pPr")
    if ppr is not None and (
            ppr.find(f"{_A}buChar") is not None
            or ppr.find(f"{_A}buAutoNum") is not None
            or ppr.find(f"{_A}buBlip") is not None):
        level = int(ppr.get("lvl", "0") or 0)
        return f"{'  ' * level}.{text}"
    return text


def _cell_text(tc) -> str:
    """Table cell text — paragraphs of the cell's txBody joined with
    newlines (python-pptx ``_Cell.text``)."""
    body = tc.find(f"{_A}txBody")
    if body is None:
        return ""
    return "\n".join(_para_text(p) for p in body.findall(f"{_A}p"))


def _off(el, holder: str) -> tuple[int, int]:
    """(top, left) of a shape from its xfrm offset; missing → (0, 0)
    (the reference's ``x.top if x.top is not None else 0``)."""
    off = el.find(f"{_P}{holder}/{_A}xfrm/{_A}off")
    if off is None:  # graphicFrame keeps xfrm directly under itself
        off = el.find(f"{_P}xfrm/{_A}off")
    if off is None:
        return 0, 0
    return int(off.get("y", "0") or 0), int(off.get("x", "0") or 0)


def _shape_entries(parent) -> list[tuple[tuple[int, int], object, str]]:
    """spTree / group children → [(sort key, element, kind)] with the
    reference's ``(top // 10, left)`` ordering key."""
    out = []
    for el in parent:
        if el.tag == f"{_P}sp":
            top, left = _off(el, "spPr")
            out.append(((top // 10, left), el, "sp"))
        elif el.tag == f"{_P}graphicFrame":
            top, left = _off(el, "xfrm")
            out.append(((top // 10, left), el, "table"))
        elif el.tag == f"{_P}grpSp":
            top, left = _off(el, "grpSpPr")
            out.append(((top // 10, left), el, "group"))
        elif el.tag == f"{_P}pic":
            top, left = _off(el, "spPr")
            out.append(((top // 10, left), el, "pic"))
    out.sort(key=lambda e: e[0])
    return out


def _extract_shape(el, kind: str, pics: list[str],
                   rels: dict[str, str]) -> str | None:
    """ppt_parser.py:33-56 __extract, one shape → text (None = no
    text). Pictures contribute their resolved media part name to
    ``pics`` instead."""
    if kind == "table":
        tbl = el.find(f".//{_A}tbl")
        if tbl is None:
            return None
        trs = tbl.findall(f"{_A}tr")
        if not trs:
            return None
        header = [_cell_text(tc) for tc in trs[0].findall(f"{_A}tc")]
        rows = []
        for tr in trs[1:]:
            cells = [_cell_text(tc) for tc in tr.findall(f"{_A}tc")]
            rows.append("; ".join(
                f"{header[j]}: {cells[j]}"
                for j in range(min(len(header), len(cells)))))
        return "\n".join(rows)
    if kind == "sp":
        body = el.find(f"{_P}txBody")
        if body is None:
            return None
        texts = [_bulleted_text(p) for p in body.findall(f"{_A}p")
                 if _para_text(p).strip()]
        return "\n".join(texts)
    if kind == "group":
        texts = []
        for _key, child, ckind in _shape_entries(el):
            t = _extract_shape(child, ckind, pics, rels)
            if t:
                texts.append(t)
        return "\n".join(texts)
    if kind == "pic":
        blip = el.find(f".//{_A}blip")
        if blip is not None:
            target = rels.get(blip.get(f"{_R}embed", ""), "")
            if target:
                pics.append(target)
    return None


def _read_rels(zf: zipfile.ZipFile, part: str) -> dict[str, str]:
    """Relationships of `part` → {rId: absolute part name}."""
    base, _, name = part.rpartition("/")
    rels_name = f"{base}/_rels/{name}.rels"
    if rels_name not in zf.namelist():
        return {}
    out = {}
    for rel in ET.fromstring(zf.read(rels_name)):
        target = rel.get("Target", "")
        if target.startswith("/"):
            target = target[1:]
        else:  # relative to the part's directory
            segs = (base.split("/") if base else []) + target.split("/")
            stack: list[str] = []
            for s in segs:
                if s == "..":
                    if stack:
                        stack.pop()
                elif s not in ("", "."):
                    stack.append(s)
            target = "/".join(stack)
        out[rel.get("Id", "")] = target
    return out


def read_pptx(data: bytes) -> list[dict]:
    """Presentation bytes → one dict per slide, in deck order:
    ``{"text": str, "pics": [media part name, …]}`` with the
    reference's per-slide text semantics."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    names = set(zf.namelist())
    pres_rels = _read_rels(zf, "ppt/presentation.xml")
    pres = ET.fromstring(zf.read("ppt/presentation.xml"))
    slides = []
    for sld_id in pres.iter(f"{_P}sldId"):
        target = pres_rels.get(sld_id.get(f"{_R}id", ""), "")
        if target not in names:
            continue
        slide_rels = _read_rels(zf, target)
        root = ET.fromstring(zf.read(target))
        tree = root.find(f"{_P}cSld/{_P}spTree")
        texts: list[str] = []
        pics: list[str] = []
        if tree is not None:
            for _key, el, kind in _shape_entries(tree):
                t = _extract_shape(el, kind, pics, slide_rels)
                if t:
                    texts.append(t)
        slides.append({"text": "\n".join(texts), "pics": pics})
    if not slides:
        raise ValueError("presentation carries no slides")
    return slides


# ---------------------------------------------------------------- writer ----

def _esc(s: str) -> str:
    return escape(s, {'"': "&quot;"})


def _para_xml(text: str, level: int = 0, bulleted: bool = False) -> str:
    if bulleted:
        ppr = f'<a:pPr lvl="{level}"><a:buChar char="•"/></a:pPr>'
    else:
        ppr = '<a:pPr><a:buNone/></a:pPr>'
    return f'<a:p>{ppr}<a:r><a:t>{_esc(text)}</a:t></a:r></a:p>'


def _shape_xml(shape: dict, rid_of_pic: dict[int, str]) -> str:
    kind = shape.get("kind", "text")
    top, left = int(shape.get("top", 0)), int(shape.get("left", 0))
    xfrm = (f'<a:xfrm><a:off x="{left}" y="{top}"/>'
            '<a:ext cx="914400" cy="914400"/></a:xfrm>')
    if kind == "text":
        paras = []
        for p in shape["paras"]:
            if isinstance(p, str):
                paras.append(_para_xml(p))
            else:  # (text, level, bulleted)
                paras.append(_para_xml(p[0], p[1], p[2]))
        return (f'<p:sp><p:spPr>{xfrm}</p:spPr>'
                f'<p:txBody><a:bodyPr/>{"".join(paras)}</p:txBody></p:sp>')
    if kind == "table":
        trs = []
        for row in shape["rows"]:
            tcs = "".join(
                f'<a:tc><a:txBody><a:bodyPr/>'
                f'<a:p><a:r><a:t>{_esc(c)}</a:t></a:r></a:p>'
                f'</a:txBody></a:tc>' for c in row)
            trs.append(f'<a:tr h="370840">{tcs}</a:tr>')
        return (f'<p:graphicFrame><p:xfrm>{xfrm[8:-9]}</p:xfrm>'
                '<a:graphic><a:graphicData uri="http://schemas.'
                'openxmlformats.org/drawingml/2006/table">'
                f'<a:tbl>{"".join(trs)}</a:tbl>'
                '</a:graphicData></a:graphic></p:graphicFrame>')
    if kind == "group":
        inner = "".join(_shape_xml(s, rid_of_pic)
                        for s in shape["shapes"])
        return (f'<p:grpSp><p:grpSpPr>{xfrm}</p:grpSpPr>{inner}</p:grpSp>')
    if kind == "pic":
        rid = rid_of_pic[id(shape)]
        return (f'<p:pic><p:blipFill><a:blip r:embed="{rid}"/>'
                '<a:stretch/></p:blipFill>'
                f'<p:spPr>{xfrm}</p:spPr></p:pic>')
    raise ValueError(f"unknown shape kind {kind!r}")


def _walk_pics(shapes: list[dict]):
    for s in shapes:
        if s.get("kind") == "pic":
            yield s
        elif s.get("kind") == "group":
            yield from _walk_pics(s["shapes"])


def build_pptx(slides: list[list[dict]]) -> bytes:
    """Slides (each a list of shape dicts) → a real .pptx. Shape dicts:
    ``{"kind": "text", "paras": [str | (text, level, bulleted)…]}``,
    ``{"kind": "table", "rows": [[…]]}``, ``{"kind": "group",
    "shapes": […]}``, ``{"kind": "pic", "data": bytes}``, each with
    optional ``top`` / ``left`` EMU offsets. Deterministic bytes
    (fixed zip timestamps). Shapes are written in the GIVEN order —
    scramble it and let the reader's geometric sort restore reading
    order, as the reference does."""
    ns = ('xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
          'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/'
          'main" '
          'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
          'relationships"')
    parts: list[tuple[str, bytes | str]] = []
    media: list[bytes] = []
    slide_xmls: list[str] = []
    slide_rels: list[str] = []
    for shapes in slides:
        rid_of_pic: dict[int, str] = {}
        rels = []
        for pic in _walk_pics(shapes):
            media.append(pic["data"])
            rid = f"rId{len(rels) + 1}"
            rid_of_pic[id(pic)] = rid
            rels.append(
                f'<Relationship Id="{rid}" Type="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships/'
                f'image" Target="../media/image{len(media)}.png"/>')
        body = "".join(_shape_xml(s, rid_of_pic) for s in shapes)
        slide_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld {ns}><p:cSld><p:spTree>{body}</p:spTree></p:cSld>'
            '</p:sld>')
        slide_rels.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{"".join(rels)}</Relationships>')

    n = len(slide_xmls)
    overrides = "".join(
        f'<Override PartName="/ppt/slides/slide{i + 1}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.'
        'slide+xml"/>' for i in range(n))
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="png" ContentType="image/png"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.'
        'presentation.main+xml"/>' + overrides + '</Types>')
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="ppt/presentation.xml"/></Relationships>')
    sld_ids = "".join(
        f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>' for i in range(n))
    pres_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation {ns}><p:sldIdLst>{sld_ids}</p:sldIdLst>'
        '</p:presentation>')
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">' + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/slide" '
            f'Target="slides/slide{i + 1}.xml"/>' for i in range(n))
        + '</Relationships>')

    parts.append(("[Content_Types].xml", content_types))
    parts.append(("_rels/.rels", root_rels))
    parts.append(("ppt/presentation.xml", pres_xml))
    parts.append(("ppt/_rels/presentation.xml.rels", pres_rels))
    for i, (sx, sr) in enumerate(zip(slide_xmls, slide_rels)):
        parts.append((f"ppt/slides/slide{i + 1}.xml", sx))
        parts.append((f"ppt/slides/_rels/slide{i + 1}.xml.rels", sr))
    for i, blob in enumerate(media):
        parts.append((f"ppt/media/image{i + 1}.png", blob))

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, payload in parts:
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, payload)
    return buf.getvalue()


def expand_pptx_spans(spans: list[dict]) -> list[dict]:
    """Replace `pptx` payload spans (base64 deck bytes in `text`) with
    one `slide` span per slide — exactly the IR the presentation
    template consumes (every slide one chunk,
    rag/app/presentation.py:30-49). A slide with an embedded picture
    gets its first media part name as ``media_ref`` (the reference
    pairs each slide chunk with a thumbnail image; rasterizing the
    slide itself needs a renderer, so the embedded media part stands
    in). Idempotent: span lists with no `pptx` kind come back as the
    same object; undecodable payloads are dropped (the poison row is
    contained one level up)."""
    if not any(s["kind"] == "pptx" for s in spans):
        return spans
    import base64

    from ..schemas import finalize_offsets, make_span

    out: list[dict] = []
    for s in spans:
        if s["kind"] != "pptx":
            out.append(s)
            continue
        try:
            for slide in read_pptx(base64.b64decode(s["text"])):
                ref = f"pptx://{slide['pics'][0]}" if slide["pics"] else ""
                out.append(make_span("slide", slide["text"], ref))
        except Exception:  # noqa: BLE001 — undecodable payload: skip
            pass
    return finalize_offsets(out)
