"""Deterministic synthetic interleaved-document corpus generator.

Produces the exact input-table shape from BASELINE.json / FIXTURES.md:
``doc_id:string, spans:list<struct<kind,text,media_ref,offset>>`` with the
archetype mix html 28% / pdfish 22% / book 10% / md 10% / table 10% /
docx 6% / txt 4% / ppt 4% / eml 3% / json 3% plus a handful of mega-docs
(skew), exercising every reference behavior catalogued in SURVEY.md §2
(boilerplate strip, layout ordering, ToC removal, bullet hierarchies,
typed table rows, OOXML walk, token packing, CJK normalization).

Everything is a pure function of ``(seed, doc_index)`` — no wall clock, no
global RNG — so any shard of the corpus can be (re)generated independently
on any worker: generation itself is a Ray Data pipeline
(``rd.range(n).map_batches(...)``), which is how a 10^12-row corpus would be
synthesized on a real cluster without a driver-side loop.
"""

from __future__ import annotations

import random

import pyarrow as pa

from ..schemas import DOCUMENTS_SCHEMA, finalize_offsets, make_span

ARCHETYPES = ("html", "pdfish", "pdf", "scan", "book", "md", "table",
              "docx", "txt", "ppt", "eml", "json", "picture", "audio")
# cumulative proportions for the seed-stable assignment. The scan band is
# carved out of the old pdf band (0.47–0.49) so every OTHER archetype
# assignment is unchanged across the version bump.
_CUM = ((0.27, "html"), (0.47, "pdfish"), (0.478, "pdf"), (0.49, "scan"),
        (0.59, "book"), (0.69, "md"), (0.79, "table"), (0.85, "docx"),
        (0.89, "txt"), (0.93, "ppt"), (0.96, "eml"), (0.972, "json"),
        (0.992, "picture"), (1.0, "audio"))

# bump when generator output changes so cached corpora regenerate
CORPUS_VERSION = 30

_EN_WORDS = (
    "stream batch table scan merge sort join filter window group key value "
    "column row vector hash range shard block spill actor worker schedule "
    "layout anchor figure caption heading margin corpus token chunk span "
    "offset index quality density extract boiler nav footer sidebar main "
    "article content data pipeline engine cluster node memory disk cache"
).split()
_ZH_CHARS = "数据流批处理表扫描合并排序连接过滤窗口分组键值列行向量哈希范围分片块溢出算子工作调度布局锚点图表标题边距语料标记块跨度偏移索引质量密度提取导航页脚侧栏主文内容管道引擎集群节点内存磁盘缓存"
_DELIMS_CJK = "。；！？"


def _rng(seed: int, idx: int) -> random.Random:
    return random.Random((seed * 1_000_003 + idx) & 0x7FFFFFFFFFFFFFFF)


def archetype_for(seed: int, idx: int, mega_every: int = 2500) -> str:
    if mega_every and idx % mega_every == mega_every - 1:
        return "mega"
    u = _rng(seed ^ 0x5EED, idx).random()
    for cut, name in _CUM:
        if u <= cut:
            return name
    return "txt"


def _words(r: random.Random, n: int) -> str:
    return " ".join(r.choice(_EN_WORDS) for _ in range(n))


def _zh(r: random.Random, n: int) -> str:
    return "".join(r.choice(_ZH_CHARS) for _ in range(n))


def _sentence(r: random.Random) -> str:
    """Mixed-language sentence ending in a delimiter (exercises the CJK
    delimiter set and full-width normalization)."""
    if r.random() < 0.25:
        s = _zh(r, r.randint(6, 24)) + r.choice(_DELIMS_CJK)
        if r.random() < 0.15:
            s = "ＨＩ" + s  # full-width latin → exercises str_q2b
        return s
    end = r.choice([".", "!", "?", "."])
    return _words(r, r.randint(5, 18)).capitalize() + end


def _paragraph(r: random.Random, nsent=None) -> str:
    nsent = nsent or r.randint(1, 4)
    return " ".join(_sentence(r) for _ in range(nsent))


# ---------------------------------------------------------------- html ----

def _gen_html(r: random.Random, doc_id: str) -> list[dict]:
    title = _words(r, r.randint(3, 7)).title()
    n_paras = r.randint(3, 10)
    paras = [_paragraph(r) for _ in range(n_paras)]
    nav_links = " ".join(
        f'<a href="/{w}">{w.title()}</a>' for w in r.sample(_EN_WORDS, 6)
    )
    farm = " ".join(
        f'<a href="/l/{i}">{_words(r, 2)}</a>' for i in range(r.randint(8, 20))
    )
    n_imgs = r.randint(0, 3)
    body_parts = []
    img_ids = []
    for i, p in enumerate(paras):
        body_parts.append(f"<p>{p}</p>")
        if img_ids.__len__() < n_imgs and r.random() < 0.3:
            k = len(img_ids)
            img_ids.append(k)
            body_parts.append(f'<img src="media://{doc_id}/{k}" alt="fig{k}"/>')
    html = (
        f"<html><head><title>{title}</title>"
        f"<script>var x = 1;</script><style>p {{margin: 0}}</style></head><body>"
        f'<nav class="nav">{nav_links}</nav>'
        f'<div class="sidebar">{farm}</div>'
        f'<div class="content"><h1>{title}</h1>{"".join(body_parts)}</div>'
        f'<footer><a href="/privacy">Privacy</a> (c) example</footer>'
        f"</body></html>"
    )
    spans = [make_span("html", html)]
    for k in range(len(img_ids)):
        spans.append(make_span("image", "", f"media://{doc_id}/{k}"))
    return spans


# -------------------------------------------------------------- pdfish ----

def _box(text, x0, x1, top, bot, page, lay, row=None, col=None, tno=None):
    import json

    d = {"t": text, "x0": x0, "x1": x1, "top": top, "bot": bot,
         "page": page, "lay": lay}
    if row is not None:
        d["row"] = row
        d["col"] = col
        d["tno"] = tno
    return make_span("box", json.dumps(d, ensure_ascii=False, sort_keys=True))


def _gen_pdfish(r: random.Random, doc_id: str, n_pages=None) -> list[dict]:
    n_pages = n_pages or r.randint(1, 12)
    spans: list[dict] = []
    header_txt = "Proceedings of " + _words(r, 3).title()
    has_toc = n_pages >= 4 and r.random() < 0.4
    tno = 0
    fig = 0
    carry: list[dict] = []  # table cells continuing onto this page
    for page in range(n_pages):
        # repeated page header/footer (must be stripped everywhere —
        # layout_recognizer.py:149-156 behavior)
        spans.append(_box(header_txt, 50, 550, 10, 30, page, "header"))
        if carry:
            spans.extend(carry)
            carry = []
        two_col = n_pages >= 2 and r.random() < 0.3
        if page == 0:
            spans.append(_box(_words(r, 5).title(), 100, 500, 60, 90, page, "title"))
            if r.random() < 0.4:
                spans.append(_box("Abstract", 260, 340, 95, 115, page, "title"))
                spans.append(_box(_sentence(r), 60, 540, 120, 140, page, "text"))
        if has_toc and page == 1:
            spans.append(_box("Contents", 250, 350, 60, 80, page, "title"))
            for i in range(r.randint(4, 8)):
                spans.append(
                    _box(f"{_words(r, 3).title()} " + "." * 12 + f" {i + 2}",
                         80, 520, 100 + 30 * i, 120 + 30 * i, page, "text"))
            spans.append(_box(f"page {page + 1}/{n_pages}", 270, 330, 960, 980,
                              page, "footer"))
            continue
        n_lines = r.randint(4, 14)
        if two_col:
            half = max(1, n_lines // 2)
            for i in range(n_lines):
                colx = 50 if i < half else 320
                y = 100 + 60 * (i if i < half else i - half)
                spans.append(_box(_sentence(r), colx, colx + 230, y, y + 20,
                                  page, "text"))
        else:
            for i in range(n_lines):
                y = 100 + 55 * i
                txt = _sentence(r)
                if r.random() < 0.05:
                    txt = r.choice(["• • •",
                                    "https://example.com/x",
                                    "(cid:42)"])  # garbage lines
                spans.append(_box(txt, 60, 540, y, y + 20, page, "text"))
        # occasionally a small table with caption; ~1 in 3 of those spills
        # its tail rows onto the next page (same tno — the reference's
        # cross-page table case, pdf_parser.py:701-716; when the page
        # break is also a shard cut this exercises the cross-shard merge)
        if r.random() < 0.25:
            nrows, ncols = r.randint(2, 6), r.randint(2, 4)
            spills = page + 1 < n_pages and nrows >= 4 and r.random() < 0.35
            split_at = nrows - r.randint(1, 2) if spills else nrows
            ty = 820
            for ri in range(nrows):
                for ci in range(ncols):
                    cell = (_words(r, 1) if ri == 0 else str(r.randint(0, 999)))
                    if ri < split_at:
                        spans.append(_box(cell, 60 + 120 * ci, 170 + 120 * ci,
                                          ty + 25 * ri, ty + 20 + 25 * ri,
                                          page, "table", row=ri, col=ci,
                                          tno=tno))
                    else:
                        cy = 40 + 25 * (ri - split_at)
                        carry.append(_box(cell, 60 + 120 * ci, 170 + 120 * ci,
                                          cy, cy + 20, page + 1, "table",
                                          row=ri, col=ci, tno=tno))
            spans.append(make_span("caption", f"Table {tno + 1}: " + _words(r, 4)))
            tno += 1
        if r.random() < 0.2:
            spans.append(_box("", 200, 400, 700, 800, page, "figure"))
            spans.append(make_span("image", "", f"media://{doc_id}/f{fig}"))
            spans.append(make_span("caption", f"Figure {fig + 1}: " + _words(r, 4)))
            fig += 1
        spans.append(_box(f"page {page + 1}/{n_pages}", 270, 330, 960, 980,
                          page, "footer"))
    return spans


# ---------------------------------------------------------------- book ----

_EN_BULLETS = ("Chapter {n}. {t}", "{n}.{m} {t}", "({a}) {t}")
_ZH_DIGITS = "零一二三四五六七八九"


def _zh_num(n: int) -> str:
    """CJK numeral for 1..99 (十, 二十三, …)."""
    if n < 10:
        return _ZH_DIGITS[n]
    tens, ones = divmod(n, 10)
    out = ("" if tens == 1 else _ZH_DIGITS[tens]) + "十"
    return out + (_ZH_DIGITS[ones] if ones else "")


def _gen_book(r: random.Random, doc_id: str, n_chapters=None) -> list[dict]:
    cjk = r.random() < 0.3
    n_chapters = n_chapters or r.randint(2, 5)
    spans = []
    for c in range(1, n_chapters + 1):
        if cjk:
            spans.append(make_span("text", f"第{_zh_num(c)}章 {_zh(r, 6)}"))
        else:
            spans.append(make_span("text", f"Chapter {c}. {_words(r, 3).title()}"))
        for s in range(1, r.randint(2, 4) + 1):
            if cjk:
                spans.append(make_span("text", f"{c}.{s} {_zh(r, 5)}"))
            else:
                spans.append(make_span("text", f"{c}.{s} {_words(r, 3).title()}"))
            for _ in range(r.randint(2, 8)):
                spans.append(make_span("text", _paragraph(r, 1)))
            if r.random() < 0.2:
                spans.append(make_span("text",
                                       f"{_words(r, 2).title()}: {_paragraph(r, 2)}"))
    return spans


# ------------------------------------------------------------------ md ----

def _gen_md(r: random.Random, doc_id: str) -> list[dict]:
    spans = [make_span("md", "# " + _words(r, 4).title())]
    for _ in range(r.randint(2, 5)):
        spans.append(make_span("md", "## " + _words(r, 3).title()))
        for _ in range(r.randint(1, 4)):
            spans.append(make_span("md", _paragraph(r)))
        if r.random() < 0.35:
            ncols = r.randint(2, 4)
            hdr = [_words(r, 1) for _ in range(ncols)]
            spans.append(make_span("md", "| " + " | ".join(hdr) + " |"))
            spans.append(make_span("md", "|" + "---|" * ncols))
            for _ in range(r.randint(1, 5)):
                spans.append(make_span(
                    "md", "| " + " | ".join(str(r.randint(0, 99))
                                            for _ in range(ncols)) + " |"))
    return spans


# --------------------------------------------------------------- table ----

_DATE_FMTS = ("2023-{m:02d}-{d:02d}", "2024-{m:02d}-{d:02d}")


def _gen_table(r: random.Random, doc_id: str, n_rows=None) -> list[dict]:
    n_rows = n_rows or r.randint(40, 400)
    headers = ["item id", "price", "ship date", "active", "note"]
    rows = [headers]
    for i in range(n_rows):
        if r.random() < 0.02:
            rows.append(["deformed row"])  # wrong arity → dropped
            continue
        rows.append([
            str(r.randint(1, 10_000)),
            f"{r.uniform(1, 500):.2f}",
            r.choice(_DATE_FMTS).format(m=r.randint(1, 12), d=r.randint(1, 28)),
            r.choice(["yes", "no", "true", "false"]),
            _words(r, r.randint(1, 4)),
        ])
    if r.random() < 0.4:
        # the document IS a real .xlsx (the reference receives workbook
        # bytes, deepdoc/parser/excel_parser.py:107-130) — the xlsx span
        # expands to the same `row` spans at the extract entry point
        import base64

        from ..functions.xlsx import build_xlsx

        payload = base64.b64encode(build_xlsx(rows)).decode("ascii")
        return [make_span("xlsx", payload)]
    return [make_span("row", "\t".join(row)) for row in rows]


# ----------------------------------------------------------------- txt ----

def _gen_txt(r: random.Random, doc_id: str) -> list[dict]:
    return [make_span("text", _paragraph(r)) for _ in range(r.randint(20, 120))]


# ----------------------------------------------------------------- ppt ----

def _gen_ppt(r: random.Random, doc_id: str) -> list[dict]:
    """Presentation: one `slide` span per slide (title + bullet lines),
    media_ref = the slide thumbnail the reference stores per chunk
    (rag/app/presentation.py: every page is a chunk + its thumbnail).
    ~40% of decks are real .pptx BYTES (the reference receives the raw
    deck, deepdoc/parser/ppt_parser.py:58-80) — shapes written
    scrambled so extraction must restore reading order by geometry,
    with bullet levels, a stats table and an embedded picture in the
    mix; the pptx span expands to `slide` spans at the extract entry
    point."""
    n_slides = r.randint(4, 25)
    if r.random() < 0.4:
        import base64

        from ..functions.pptx import build_pptx

        slides = []
        for i in range(n_slides):
            title = _words(r, r.randint(2, 6)).title()
            shapes = [{"kind": "text", "paras": [title],
                       "top": 0, "left": 0}]
            bullets = [(_sentence(r), r.choice([0, 0, 0, 1, 1, 2]), True)
                       for _ in range(r.randint(2, 6))]
            shapes.append({"kind": "text", "paras": bullets,
                           "top": 1_000_000, "left": 0})
            roll = r.random()
            if roll < 0.15:
                rows = [["metric", "value"]] + [
                    [_words(r, 1), str(r.randint(1, 999))]
                    for _ in range(r.randint(2, 5))]
                shapes.append({"kind": "table", "rows": rows,
                               "top": 3_000_000, "left": 0})
            elif roll < 0.25:
                shapes.append({"kind": "group", "top": 3_000_000,
                               "left": 0, "shapes": [
                                   {"kind": "text",
                                    "paras": [_sentence(r)],
                                    "top": 10, "left": 0},
                                   {"kind": "text",
                                    "paras": [_sentence(r)],
                                    "top": 500, "left": 0}]})
            if i == 0 and r.random() < 0.5:
                from ..functions.glyphs import normalize_text, render_text
                from ..functions.png import encode_png

                img = render_text([normalize_text(_words(r, 2))])
                shapes.append({"kind": "pic", "data": encode_png(img),
                               "top": 5_000_000, "left": 0})
            r.shuffle(shapes)  # geometry, not file order, is the order
            slides.append(shapes)
        payload = base64.b64encode(build_pptx(slides)).decode("ascii")
        return [make_span("pptx", payload)]
    spans = []
    for i in range(n_slides):
        lines = [_words(r, r.randint(2, 6)).title()]
        for _ in range(r.randint(2, 6)):
            lines.append("- " + _sentence(r))
        spans.append(make_span("slide", "\n".join(lines),
                               f"media://{doc_id}/slide{i}"))
    return spans


# ----------------------------------------------------------------- eml ----

def _gen_eml(r: random.Random, doc_id: str) -> list[dict]:
    """RFC-822 message with deterministic MIME boundary: headers +
    text/plain body, ~half also a text/html alternative, occasionally a
    named attachment."""
    subject = _words(r, r.randint(3, 6)).title()
    sender = f"{r.choice(_EN_WORDS)}@example.com"
    rcpt = f"{r.choice(_EN_WORDS)}@example.org"
    date = (f"{r.randint(1, 28):02d} Mar 2024 "
            f"{r.randint(0, 23):02d}:{r.randint(0, 59):02d}:00 +0000")
    # ASCII-only bodies: unencoded 8-bit payloads are not valid RFC-822
    # (and the stdlib would mangle them without a base64/qp CTE)
    body_paras = [
        " ".join(_words(r, r.randint(6, 16)).capitalize() + "."
                 for _ in range(r.randint(1, 3)))
        for _ in range(r.randint(2, 6))]
    has_html = r.random() < 0.5
    has_attach = r.random() < 0.3
    attach_name = f"report-{r.randint(1, 99)}.dat"

    headers = [f"From: {sender}", f"To: {rcpt}", f"Subject: {subject}",
               f"Date: {date}", "MIME-Version: 1.0"]
    boundary = f"=-graft-{doc_id}"
    if has_html or has_attach:
        parts = [f'Content-Type: multipart/mixed; boundary="{boundary}"',
                 "", "preamble"]
        parts += [f"--{boundary}",
                  'Content-Type: text/plain; charset="utf-8"', "",
                  "\n".join(body_paras)]
        if has_html:
            html_body = "".join(f"<p>{p}</p>" for p in body_paras)
            parts += [f"--{boundary}",
                      'Content-Type: text/html; charset="utf-8"', "",
                      f"<html><body><div class='content'>{html_body}</div>"
                      f"</body></html>"]
        if has_attach:
            parts += [f"--{boundary}",
                      "Content-Type: application/octet-stream",
                      f'Content-Disposition: attachment; filename="{attach_name}"',
                      "Content-Transfer-Encoding: base64", "", "QUJD"]
        parts.append(f"--{boundary}--")
        raw = "\n".join(headers + parts)
    else:
        raw = "\n".join(headers
                        + ['Content-Type: text/plain; charset="utf-8"', "",
                           "\n".join(body_paras)])
    return [make_span("eml", raw)]


# ---------------------------------------------------------------- docx ----

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"


def _xml_p(text: str, style: str = "", rid: str = "") -> str:
    """One w:p element; text optionally split across two runs (exercising
    run concatenation), optionally carrying an inline a:blip drawing."""
    from xml.sax.saxutils import escape

    ppr = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
    runs = ""
    if text:
        cut = len(text) // 2 if len(text) > 8 else 0
        if cut:
            runs = (f"<w:r><w:t xml:space=\"preserve\">{escape(text[:cut])}"
                    f"</w:t></w:r><w:r><w:t xml:space=\"preserve\">"
                    f"{escape(text[cut:])}</w:t></w:r>")
        else:
            runs = f"<w:r><w:t>{escape(text)}</w:t></w:r>"
    if rid:
        runs += (f'<w:r><w:drawing><a:blip r:embed="{rid}"/>'
                 f"</w:drawing></w:r>")
    return f"<w:p>{ppr}{runs}</w:p>"


def _xml_tbl(rows: list[list[str]]) -> str:
    from xml.sax.saxutils import escape

    trs = []
    for row in rows:
        tcs = "".join(
            f"<w:tc><w:p><w:r><w:t>{escape(c)}</w:t></w:r></w:p></w:tc>"
            for c in row)
        trs.append(f"<w:tr>{tcs}</w:tr>")
    return f"<w:tbl>{''.join(trs)}</w:tbl>"


def _docx_bytes(body_xml: str, rels: dict[str, str]) -> bytes:
    """Assemble a minimal valid .docx zip. Deterministic: fixed ZipInfo
    timestamps (zipfile.writestr would otherwise stamp wall-clock time
    into the archive and break seed-stable corpora)."""
    import io
    import zipfile

    doc = (f'<w:document xmlns:w="{_W_NS}" xmlns:r="{_R_NS}" '
           f'xmlns:a="{_A_NS}"><w:body>{body_xml}</w:body></w:document>')
    rel_items = "".join(
        f'<Relationship Id="{rid}" Type="http://schemas.openxmlformats.org/'
        f'officeDocument/2006/relationships/image" Target="{target}"/>'
        for rid, target in sorted(rels.items()))
    rels_xml = ('<Relationships xmlns="http://schemas.openxmlformats.org/'
                f'package/2006/relationships">{rel_items}</Relationships>')
    ctypes = ('<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
              'content-types"><Default Extension="xml" ContentType="applicati'
              'on/xml"/><Default Extension="png" ContentType="image/png"/>'
              "</Types>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in (("[Content_Types].xml", ctypes),
                           ("word/document.xml", doc),
                           ("word/_rels/document.xml.rels", rels_xml),
                           *((t, "PNG" + t) for t in rels.values())):
            info = zipfile.ZipInfo(name if name.startswith(("word/", "["))
                                   else "word/" + name,
                                   date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, data)
    return buf.getvalue()


def _gen_docx(r: random.Random, doc_id: str) -> list[dict]:
    """One `docx` span: base64 of a real OOXML zip — Title/Heading/Caption
    styles, two-run paragraphs, inline images through document.xml.rels,
    tables with adjacent-equal merged cells (→ colspan in the reader)."""
    import base64

    body: list[str] = []
    rels: dict[str, str] = {}
    body.append(_xml_p(_words(r, r.randint(3, 6)).title(), style="Title"))
    img_n = 0
    for h in range(r.randint(2, 5)):
        body.append(_xml_p(_words(r, 3).title(),
                           style=r.choice(["Heading1", "Heading2"])))
        for _ in range(r.randint(1, 4)):
            body.append(_xml_p(_paragraph(r)))
        if r.random() < 0.35:
            img_n += 1
            rid = f"rId{img_n}"
            rels[rid] = f"media/image{img_n}.png"
            body.append(_xml_p("", rid=rid))  # image-only paragraph
            if r.random() < 0.6:
                body.append(_xml_p(f"Figure {img_n}: " + _words(r, 4),
                                   style="Caption"))
        if r.random() < 0.3:
            ncols = r.randint(2, 4)
            header = [_words(r, 1) for _ in range(ncols)]
            if ncols >= 3 and r.random() < 0.5:
                header[1] = header[0]  # merged cell → colspan in reader
            rows = [header]
            for _ in range(r.randint(1, 4)):
                rows.append([str(r.randint(0, 999)) for _ in range(ncols)])
            body.append(_xml_tbl(rows))
    payload = _docx_bytes("".join(body), rels)
    return [make_span("docx", base64.b64encode(payload).decode("ascii"))]


# ---------------------------------------------------------------- json ----

def _gen_json(r: random.Random, doc_id: str) -> list[dict]:
    """One `json` span: a nested config/record-like structure (dicts,
    lists, mixed scalars) exercising the structure-preserving splitter."""
    def value(depth: int):
        if depth <= 0 or r.random() < 0.4:
            return r.choice([
                r.randint(0, 10_000),
                round(r.uniform(0, 100), 2),
                _words(r, r.randint(1, 8)),
                r.random() < 0.5,
            ])
        if r.random() < 0.5:
            return {(_words(r, 1) + str(r.randint(0, 99))): value(depth - 1)
                    for _ in range(r.randint(2, 6))}
        return [value(depth - 1) for _ in range(r.randint(2, 8))]

    import json

    obj = {(_words(r, 1)): value(r.randint(1, 4))
           for _ in range(r.randint(3, 10))}
    return [make_span("json", json.dumps(obj, ensure_ascii=False,
                                         sort_keys=True))]


# ---------------------------------------------------------------- scan ----

def _gen_scan(r: random.Random, doc_id: str) -> list[dict]:
    """Scanner-output PDF: every page is a full-page DeviceGray /Image
    XObject with NO text layer (functions/pdf_bytes.build_scanned_pdf) —
    the input class the reference rasterizes and OCRs (pdf_parser.py:
    994-1113 + deepdoc/vision/ocr.py). The box IR is recovered by the
    det/rec OCR in pdf_to_boxes; text is glyph-font (uppercase latin),
    the page header sits inside the 8% furniture band and body text
    below it, so layout inference treats a scan exactly like a text
    PDF."""
    import base64

    from ..functions.glyphs import normalize_text
    from ..functions.pdf_bytes import build_scanned_pdf

    n_pages = r.randint(1, 4)
    header = normalize_text("SCAN " + _words(r, 2).upper())[:38]
    pages: list[list[str]] = []
    photos: list[list[tuple]] = []
    for page in range(n_pages):
        page_photos: list[tuple] = []
        # header at ~38/1000 (inside the top-8% band); 5 blank lines push
        # the first body line past 85/1000
        lines: list[str] = [header, "", "", "", "", ""]
        if page == 0:
            lines.append(normalize_text(_words(r, 4).upper()) + ":")
            lines.append("")
        if page > 0 and r.random() < 0.25:
            # two-column page: left-aligned columns with a >=10-char
            # gutter — pdf_bytes splits the OCR lines at the gutter and
            # pdfish's two-column ordering reads left column first
            for _ in range(r.randint(3, 6)):
                lt = (normalize_text(_words(r, r.randint(2, 4)).upper())
                      .strip() + ".")[:26]
                rt = (normalize_text(_words(r, r.randint(2, 4)).upper())
                      .strip() + ".")[:26]
                lines.append(lt.ljust(30) + "          " + rt)
        else:
            for _ in range(r.randint(3, 9)):
                sent = normalize_text(_words(r, r.randint(3, 8)).upper())
                lines.append(sent.strip() + ".")
        if r.random() < 0.35:
            # an aligned table block: left-justified columns separated by
            # >=3 spaces — recovered by pdf_bytes._detect_scan_tables +
            # grid inference into a real table chunk
            widths = (14, 8, 8)
            rows = [("ITEM", "QTY", "PRICE")]
            for _ in range(r.randint(2, 5)):
                rows.append((normalize_text(_words(r, 1).upper())[:10],
                             str(r.randint(1, 99)),
                             str(r.randint(100, 999))))
            lines.append("")
            lines.extend("".join(c.ljust(w) for c, w in
                                 zip(row, widths)).rstrip()
                         for row in rows)
            lines.append("")
        if r.random() < 0.18:
            # a PHOTO region amid the text (dithered block): OCR keeps
            # the text and crops the photo into a figure span
            y_px = 36 + (len(lines) + 1) * 9 + 4
            bh = r.randint(36, 81)
            if y_px + bh < 900:
                page_photos.append((y_px, r.randint(60, 180), bh,
                                    r.randint(140, 340),
                                    r.randrange(2**31)))
                lines.extend([""] * ((bh + 17) // 9 + 2))
        # footer in the bottom margin band (top > 92%): blank-pad so the
        # page-number line lands at pixel row 36 + 100*9 = 936
        lines.extend([""] * (100 - len(lines)))
        lines.append(f"PAGE {page + 1}/{n_pages}")
        pages.append(lines)
        photos.append(page_photos)
    # scanner variation: resolution 72/144/216 dpi and occasional
    # upside-down or sideways feeds — the OCR side detects both
    # (glyphs._run_length_gcd scale estimate + ocr_page_oriented)
    u = r.random()
    dpi_scale = 1 if u < 0.6 else (2 if u < 0.85 else 3)
    v = r.random()
    feed_rot = 0 if v < 0.80 else (2 if v < 0.92 else (1 if v < 0.96
                                                       else 3))
    # small-angle scanner skew (shear model) on ~15% of scans — the
    # deskew estimator's grid is i/1000, so draw from the same grid
    skew = (r.choice([-1, 1]) * r.randint(8, 40) / 1000
            if r.random() < 0.15 else 0.0)
    payload = base64.b64encode(
        build_scanned_pdf(pages, media_box=(600.0, 1000.0), margin_px=36,
                          dpi_scale=dpi_scale, feed_rot=feed_rot,
                          photos=photos,
                          skew_slope=skew)).decode("ascii")
    return [make_span("pdf", payload)]


# ----------------------------------------------------------------- pdf ----

def _gen_pdf(r: random.Random, doc_id: str) -> list[dict]:
    """Real PDF bytes (functions/pdf_bytes.build_pdf): the document enters
    the pipeline as a base64 `pdf` payload span and the content-stream
    parser recovers the boxes — the raw-binary entry point the reference
    gets from pdfplumber (pdf_parser.py:994-1113). A 600x1000 media box
    keeps coordinates in the box-IR convention. Mixed-language text:
    latin lines are literal strings, CJK lines ride the Type0/Identity-H
    CID font + ToUnicode CMap path (functions/pdf_bytes)."""
    import base64

    from ..functions.pdf_bytes import build_pdf

    n_pages = r.randint(1, 6)
    header = ("Jrnl of " + _words(r, 2).title())[:40]
    # ~40% of pdf docs carry a document outline (bookmarks) whose titles
    # are the per-page chapter headings — the manual template's outline
    # pivot path (rag/app/manual.py:196-210) then sees real /Outlines
    with_outline = r.random() < 0.4
    outlines: list[tuple[str, int]] = []
    pages: list[list[tuple[float, float, float, str]]] = []
    for page in range(n_pages):
        lines: list[tuple[float, float, float, str]] = [
            (50, 12, 9, header)]
        if page == 0:
            # below the 8% header band (functions/pdfish._infer_layout)
            lines.append((100, 82, 18, _words(r, 5).title()))
        elif with_outline:
            chap = f"Chapter {page} " + _words(r, 3).title()
            lines.append((60, 82, 14, chap))
            outlines.append((chap, 0))
        two_col = n_pages >= 2 and r.random() < 0.3
        n_lines = r.randint(4, 12)
        if two_col:
            half = max(1, n_lines // 2)
            for i in range(n_lines):
                colx = 50 if i < half else 320
                y = 120 + 55 * (i if i < half else i - half)
                lines.append((colx, y, 10, _words(r, r.randint(4, 8))))
        else:
            # mixed-language body (same _sentence mix as the pdfish
            # archetype): CJK lines ride the Type0/Identity-H CID font
            # with a ToUnicode CMap — real CJK-in-PDF bytes end to end
            for i in range(n_lines):
                lines.append((60, 120 + 55 * i, 10, _sentence(r)))
        lines.append((270, 965, 8, f"page {page + 1}/{n_pages}"))
        pages.append(lines)
    payload = base64.b64encode(
        build_pdf(pages, media_box=(600.0, 1000.0),
                  use_objstm=r.random() < 0.3,
                  outlines=outlines or None)).decode("ascii")
    return [make_span("pdf", payload)]


# ------------------------------------------------------------- picture ----

# fixed stock glyph renders for the planted cross-format image dups —
# two distinct images keep the pair structure non-trivial (pairs must
# not bridge stock A and stock B)
_STOCK_PICTURES = (
    ("STOCK CHART QUARTERLY REVENUE", "UP AND TO THE RIGHT",
     "SOURCE ANNUAL REPORT"),
    ("DIAGRAM PIPELINE OVERVIEW", "READ PARSE CHUNK EMIT"),
)


def _gen_picture(r: random.Random, doc_id: str) -> list[dict]:
    """Image-only doc: the document IS a real image — PNG, GIF or
    baseline JPEG (rag/app/picture.py receives the raw file bytes).
    Rendered from the 5x7 glyph font so the
    extraction side's rule-OCR can recover the text; ~1 in 4 renders a
    short caption (≤32 chars) to exercise the reference's too-short-for-
    text branch (picture.py:42 → CV-LLM path, out of scope → no chunk)."""
    import base64

    from ..functions.glyphs import normalize_text, render_text
    from ..functions.png import encode_png

    if r.random() < 0.50:
        # STOCK image: a fixed glyph render shared corpus-wide, so the
        # same pixels recur under different encodings — the planted
        # ground truth for cross-format perceptual-hash dedup
        # (multimodal.image_dhash_dups; mirrors real crawls, where one
        # viral image circulates as PNG/GIF/JPEG re-encodes). Stock
        # docs stay static: frame fades would change later frames but
        # not frame 0, hiding nothing — static keeps the planted pair
        # semantics obvious.
        lines = _STOCK_PICTURES[r.randrange(len(_STOCK_PICTURES))]
        img = render_text(list(lines))
        fmt = r.random()
        if fmt < 0.35:
            from ..functions.gif import encode_gif

            raw = encode_gif(img)
        elif fmt < 0.60:
            from ..functions.jpeg import encode_jpeg

            raw = encode_jpeg(img)
        else:
            raw = encode_png(img)
        payload = base64.b64encode(raw).decode("ascii")
        return [make_span("image", payload, f"media://{doc_id}/pic")]
    if r.random() < 0.25:
        lines = [normalize_text(_words(r, r.randint(1, 4)))]
    else:
        lines = [normalize_text(_words(r, r.randint(3, 9)))
                 for _ in range(r.randint(2, 12))]
    img = render_text(lines)
    fmt = r.random()  # format share — exercises the magic-sniffing
    # decode dispatch on three real public formats (PNG / GIF / JPEG;
    # animated pictures stay APNG/GIF, JPEG has no animation)
    use_gif = fmt < 0.35
    if r.random() < 0.45:  # animated share — high enough that sf0.01's
        # handful of picture docs still exercises the real frame-decode
        # path (APNG / GIF / MJPEG-AVI) at driver scale
        # animated picture (real APNG, animated GIF or MJPEG-AVI video):
        # frame 0 carries the glyph text — decode_image reads frame 0,
        # so the OCR path is unchanged — later frames are deterministic
        # brightness fades the frame sampler real-decodes
        # (multimodal.FrameSampler)
        import numpy as np

        fades = [((img.astype(np.int32) * (4 - k)) // 4).astype(np.uint8)
                 for k in range(1, r.randint(2, 5))]
        frames = [img] + fades
        if r.random() < 0.40:
            # second SHOT: a hard cut to the inverted render then one
            # fade — the planted ground truth for shot-boundary
            # detection (multimodal.SceneCuts); frame 0 still carries
            # the OCR text
            inv = (255 - img).astype(np.uint8)
            frames += [inv, ((inv.astype(np.int32) * 3) // 4)
                       .astype(np.uint8)]
        delay = r.choice([40, 80, 120])
        if use_gif:
            from ..functions.gif import encode_gif_animated

            raw = encode_gif_animated(frames, delay_ms=delay)
        elif fmt < 0.60:
            # real VIDEO container: Motion-JPEG in AVI. fps must DIVIDE
            # 1000 (encode_avi_mjpeg's exact-timing contract — 1000//80
            # would be 12 fps, decoding to 83 ms, not the drawn delay),
            # so the delay maps onto the nearest dividing rate. Frame 0
            # still OCRs via decode_image.
            from ..functions.avi import encode_avi_mjpeg

            fps = {40: 25, 80: 10, 120: 5}[delay]
            raw = encode_avi_mjpeg(frames, fps=fps)
        else:
            from ..functions.png import encode_apng

            raw = encode_apng(frames, delay_ms=delay)
        payload = base64.b64encode(raw).decode("ascii")
    elif use_gif:
        from ..functions.gif import encode_gif

        payload = base64.b64encode(encode_gif(img)).decode("ascii")
    elif fmt < 0.60:
        # lossy but deterministic: the rule-OCR's min-Hamming glyph
        # matching survives quality-88 ringing (tests/test_jpeg.py)
        from ..functions.jpeg import encode_jpeg

        payload = base64.b64encode(encode_jpeg(img)).decode("ascii")
    else:
        payload = base64.b64encode(encode_png(img)).decode("ascii")
    return [make_span("image", payload, f"media://{doc_id}/pic")]


# --------------------------------------------------------------- audio ----

def _gen_audio(r: random.Random, doc_id: str) -> list[dict]:
    """Audio-only doc: the document IS a real PCM16 WAV (sine bursts with
    silence gaps — gives the segmenter real energy/silence structure).
    The reference's audio template sends these bytes to a remote ASR LLM
    (rag/app/audio.py, out of scope); here the real part is the probe +
    framing over real samples."""
    import base64

    import numpy as np

    from ..functions.wav import encode_wav

    rate = r.choice([8_000, 16_000])
    dur_s = r.uniform(0.5, 5.0)
    n = int(rate * dur_s)
    t = np.arange(n, dtype=np.float64) / rate
    sig = np.zeros(n)
    pos = 0.0
    while pos < dur_s:
        burst = r.uniform(0.2, 0.8)
        freq = r.uniform(120.0, 1200.0)
        amp = r.uniform(0.2, 0.9)
        i0, i1 = int(pos * rate), min(int((pos + burst) * rate), n)
        sig[i0:i1] = amp * np.sin(2 * np.pi * freq * t[i0:i1])
        pos += burst + r.uniform(0.1, 0.6)  # silence gap
    samples = np.clip(sig * 32767, -32768, 32767).astype(np.int16)
    payload = base64.b64encode(encode_wav(samples, rate)).decode("ascii")
    return [make_span("audio", payload, f"media://{doc_id}/wav")]


# ---------------------------------------------------------------- mega ----

def _gen_mega(r: random.Random, doc_id: str) -> list[dict]:
    """Skewed mega-doc: a long pdfish (hundreds of pages), a huge book /
    table, or a many-page SCANNED PDF — exercises shard-explode → parse
    → groupby(doc_id) reassembly, and for the scan the parse-stage
    page-range fan-out (blob staged once, per-range OCR tasks)."""
    kind = r.choice(["pdfish", "book", "table", "scanpdf"])
    if kind == "pdfish":
        return _gen_pdfish(r, doc_id, n_pages=r.randint(60, 160))
    if kind == "book":
        return _gen_book(r, doc_id, n_chapters=r.randint(40, 90))
    if kind == "scanpdf":
        import base64

        from ..functions.glyphs import normalize_text
        from ..functions.pdf_bytes import build_scanned_pdf

        n_pages = r.randint(50, 90)
        header = normalize_text("MEGA SCAN " + _words(r, 2).upper())[:38]
        pages = []
        for page in range(n_pages):
            lines = [header, "", "", "", "", ""]
            for _ in range(r.randint(3, 7)):
                lines.append(normalize_text(
                    _words(r, r.randint(3, 8)).upper()).strip() + ".")
            lines.extend([""] * (100 - len(lines)))
            lines.append(f"PAGE {page + 1}/{n_pages}")
            pages.append(lines)
        payload = base64.b64encode(build_scanned_pdf(
            pages, media_box=(600.0, 1000.0),
            margin_px=36)).decode("ascii")
        return [make_span("pdf", payload)]
    return _gen_table(r, doc_id, n_rows=r.randint(6000, 12000))


_GEN = {"html": _gen_html, "pdfish": _gen_pdfish, "book": _gen_book,
        "md": _gen_md, "table": _gen_table, "docx": _gen_docx,
        "txt": _gen_txt, "ppt": _gen_ppt, "eml": _gen_eml,
        "json": _gen_json, "picture": _gen_picture, "pdf": _gen_pdf,
        "scan": _gen_scan, "audio": _gen_audio, "mega": _gen_mega}


def gen_doc(seed: int, idx: int, mega_every: int = 2500) -> dict:
    """Pure function (seed, idx) → one document row."""
    arch = archetype_for(seed, idx, mega_every)
    r = _rng(seed, idx)
    doc_id = f"doc-{arch}-{idx:08d}"
    spans = finalize_offsets(_GEN[arch](r, doc_id))
    return {"doc_id": doc_id, "spans": spans}


def gen_batch(seed: int, indices, mega_every: int = 2500) -> pa.Table:
    rows = [gen_doc(seed, int(i), mega_every) for i in indices]
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def corpus_dataset(n_docs: int, seed: int = 42, mega_every: int = 2500,
                   parallelism: int = -1):
    """Distributed corpus synthesis as a Ray Data pipeline — no driver-side
    loop, scales to any n_docs."""
    import ray.data as rd

    base = rd.range(n_docs, override_num_blocks=parallelism if parallelism > 0 else None)

    def _gen(batch: pa.Table) -> pa.Table:
        return gen_batch(seed, batch["id"].to_pylist(), mega_every)

    return base.map_batches(_gen, batch_format="pyarrow", batch_size=256)


def write_corpus(path: str, n_docs: int, seed: int = 42,
                 mega_every: int = 2500, parallelism: int = -1) -> str:
    ds = corpus_dataset(n_docs, seed, mega_every, parallelism)
    if parallelism > 0:
        # one output file per partition (the resume/lineage unit)
        ds = ds.repartition(parallelism)
    ds.write_parquet(path)
    return path
