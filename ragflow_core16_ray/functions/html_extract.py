"""HTML main-content extraction (boilerplate strip), from scratch.

Role of the reference's ``deepdoc/parser/html_parser.py:30-50`` which
delegates to the readability + html_text libraries: title + main-content
text sections out of a raw HTML page. Neither library exists here, so this
is a self-contained implementation of the published Readability/jusText
family of heuristics:

- regex HTML tokenizer (tags / text / comments; script+style bodies skipped),
- per-container accumulation of text length and link-text length,
- score = text_len * (1 - link_density) + class/id/tag hints
  (positive: article|main|content|post|body; negative:
  nav|footer|sidebar|aside|comment|ad|menu|banner),
- the best-scoring container's paragraphs become the sections, in document
  order; ``<img src>`` inside it become figure refs.

Pure function; regexes compiled at import (once per worker process).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape

_TOKEN_RE = re.compile(
    r"<!--.*?-->"                      # comment
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<!DOCTYPE[^>]*>"
    r"|<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:[^>'\"]|'[^']*'|\"[^\"]*\")*)(/?)>"
    r"|[^<]+",
    re.DOTALL,
)
_ATTR_RE = re.compile(
    r"""([a-zA-Z-]+)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""")
_WS_RE = re.compile(r"[ \t\r\f\v]+")

BLOCK_TAGS = frozenset(
    "html body div article main section aside nav header footer table tr td "
    "th ul ol li p h1 h2 h3 h4 h5 h6 blockquote pre figure figcaption "
    "form".split())
_SELF_CLOSING = frozenset("br hr img meta link input".split())
_SKIP_CONTENT = frozenset("script style noscript svg".split())
_NEG_RE = re.compile(
    r"nav|footer|sidebar|side-bar|aside|comment|advert|\bad\b|ads|menu|"
    r"banner|breadcrumb|share|social|promo", re.I)
_POS_RE = re.compile(r"article|main|content|post|body|entry|text|story", re.I)
_NEG_TAGS = frozenset("nav footer aside header form".split())
_POS_TAGS = frozenset("article main".split())


@dataclass
class _Container:
    cid: int
    tag: str
    hint: float
    text_len: int = 0
    link_len: int = 0
    paras: list = field(default_factory=list)  # ordered: ("p", text) | ("img", src)


def _attrs(raw: str) -> dict:
    out = {}
    for m in _ATTR_RE.finditer(raw or ""):
        out[m.group(1).lower()] = m.group(3) or m.group(4) or m.group(5) or ""
    return out


def _hint(tag: str, attrs: dict) -> float:
    h = 0.0
    if tag in _POS_TAGS:
        h += 80.0
    if tag in _NEG_TAGS:
        h -= 200.0
    blob = (attrs.get("class", "") + " " + attrs.get("id", ""))
    if blob.strip():
        if _NEG_RE.search(blob):
            h -= 200.0
        if _POS_RE.search(blob):
            h += 80.0
    return h


@dataclass
class HtmlDoc:
    title: str
    sections: list[str]
    figures: list[str]  # media refs (img src) in document order


def extract_html(html: str) -> HtmlDoc:
    """Strip boilerplate; return title + main-content sections + figure refs."""
    title = ""
    containers: list[_Container] = []
    open_stack: list[_Container] = []   # open block containers, outermost first
    link_depth = 0
    skip_depth = 0
    title_depth = 0
    hbuf: list[str] = []                # <title> text buffer
    pbuf: list[str] = []                # current paragraph text buffer
    next_cid = 0

    table_depth = 0
    row_cells: list[str] = []

    def flush_para():
        nonlocal pbuf
        text = _WS_RE.sub(" ", "".join(pbuf)).strip()
        pbuf = []
        if not text:
            return
        if table_depth:
            row_cells.append(text)      # assembled into a row at </tr>
            return
        for c in open_stack:
            c.paras.append(("p", text))

    def flush_row():
        nonlocal row_cells
        cells = [c for c in row_cells if c]
        row_cells = []
        if not cells:
            return
        row = " | ".join(cells)         # one section per table ROW —
        for c in open_stack:            # cell-per-section loses the grid
            c.paras.append(("p", row))

    for m in _TOKEN_RE.finditer(html):
        if m.group(2) is None:  # text / comment / doctype
            tok = m.group(0)
            if tok.startswith("<!"):
                continue
            if skip_depth:
                continue
            text = unescape(tok)
            if title_depth:
                hbuf.append(text)
                continue
            stripped = text.strip()
            if not stripped and not pbuf:
                continue
            pbuf.append(text)
            tl = len(_WS_RE.sub(" ", text).strip())
            for c in open_stack:
                c.text_len += tl
                if link_depth:
                    c.link_len += tl
            continue
        closing, tag, rawattrs, selfclose = (
            m.group(1) == "/", m.group(2).lower(), m.group(3), m.group(4) == "/")
        if tag in _SKIP_CONTENT:
            if not selfclose:
                skip_depth = max(0, skip_depth + (-1 if closing else 1))
            continue
        if skip_depth:
            continue
        if tag == "title":
            if closing:
                if title_depth:
                    title_depth = 0
                    if not title:
                        title = _WS_RE.sub(" ", "".join(hbuf)).strip()
                    hbuf = []
            else:
                title_depth = 1
            continue
        if tag == "a":
            link_depth = max(0, link_depth + (-1 if closing else 1))
            continue
        if tag == "img":
            src = _attrs(rawattrs).get("src", "")
            flush_para()
            if src:
                for c in open_stack:
                    c.paras.append(("img", src))
            continue
        if tag == "br":
            flush_para()
            continue
        if tag not in BLOCK_TAGS:
            continue
        # block boundary (headings included: they become their own paragraphs)
        flush_para()
        if tag == "table":
            if closing:
                flush_row()             # tables without a final </tr>
                table_depth = max(0, table_depth - 1)
            elif not selfclose:
                table_depth += 1
        elif table_depth:
            # inside a table: tr delimits rows, td/th delimit cells
            # (flush_para above moved cell text into row_cells); neither
            # opens a container — the table itself is the scored unit.
            # flush on OPEN too: real-world rows often omit </tr>
            if tag == "tr":
                flush_row()
                continue
            if tag in ("td", "th", "thead", "tbody", "tfoot", "caption",
                       "colgroup"):
                continue
            if closing and any(c.tag == tag for c in open_stack):
                # a closing block whose matching container was opened
                # OUTSIDE the table (</body>, the wrapping </div>…)
                # while a table is still open = the sloppy-HTML
                # unclosed <table>; force-close it so later content
                # isn't swallowed into row_cells forever. (Blocks
                # opened INSIDE cells never created containers, so
                # their closes don't match and stay cell-local.)
                flush_row()
                table_depth = 0
                # fall through to normal closing-tag handling
            else:
                continue    # <p>/<div> inside a cell: paragraph break
        if tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            continue
        if closing:
            if open_stack and any(c.tag == tag for c in open_stack):
                # pop to the nearest matching open container
                while open_stack:
                    c = open_stack.pop()
                    if c.tag == tag:
                        break
            continue
        if selfclose:
            continue
        c = _Container(next_cid, tag, _hint(tag, _attrs(rawattrs)))
        next_cid += 1
        containers.append(c)
        open_stack.append(c)
    flush_para()

    if not containers:
        text = _WS_RE.sub(" ", unescape(re.sub(r"<[^>]*>", " ", html))).strip()
        return HtmlDoc(title, [s for s in [text] if s], [])

    # score every container; on near-ties (within 2%) prefer the
    # later-opened (inner) one — a wrapper scoring the same as its child is
    # redundant boilerplate plus the child
    best = None
    best_score = float("-inf")
    for c in containers:
        if c.text_len <= 0:
            continue
        link_density = c.link_len / c.text_len
        score = c.text_len * (1.0 - link_density) + c.hint
        if best is None or score > best_score * 1.02 or (
                score >= best_score * 0.98 and c.cid > best.cid):
            best, best_score = c, max(score, best_score)
    if best is None:
        best = max(containers, key=lambda c: c.text_len)

    sections: list[str] = []
    figures: list[str] = []
    for kind, payload in best.paras:
        if kind == "p":
            sections.append(payload)
        else:
            figures.append(payload)
    if not title and sections:
        # promote the first section to title only when it LOOKS like a
        # heading (short, no sentence-final punctuation) — a titleless
        # page whose first block is a full paragraph keeps it as content
        head = sections[0].strip()
        if len(head) <= 80 and not head.endswith((".", "!", "?", "。",
                                                  "！", "？", ";", ":")):
            title = head
    # drop a leading section that just repeats the title (the h1)
    if sections and title and sections[0].strip() == title.strip():
        sections = sections[1:]
    return HtmlDoc(title, sections, figures)


_HREF_RE = None


def extract_links(html: str) -> list:
    """(href, anchor_text) pairs from raw HTML, in document order — the
    link-graph harvest step of a web-crawl pipeline (outlink counts,
    nav-vs-content link ratio). Tag-tolerant regex pass (same stance as
    the extractor's own tokenizer: no external HTML lib), anchor text
    stripped of nested tags and whitespace-normalized."""
    import re

    global _HREF_RE
    if _HREF_RE is None:
        _HREF_RE = re.compile(
            r"<a\b[^>]*?href\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))"
            r"[^>]*>(.*?)</a>",
            re.IGNORECASE | re.DOTALL)
    out = []
    for m in _HREF_RE.finditer(html):
        href = m.group(2) or m.group(3) or m.group(4) or ""
        text = re.sub(r"<[^>]*>", " ", m.group(5))
        text = " ".join(text.split())
        out.append((href, text))
    return out
