"""PDF-like layout parsing over pre-OCR box spans (doc-local, pure).

The reference's PDF path runs OCR + layout + table-structure ONNX models and
then a long chain of box-list passes (SURVEY.md §3.3). The models are out of
sandbox scope; our input ``box`` spans are the reference's *post-OCR IR*
(text boxes with coordinates, page number and a layout class —
deepdoc/parser/pdf_parser.py:296-352). This module reimplements, from
scratch and deterministically, the behaviors layered on top of that IR:

- garbage-line filter (deepdoc/vision/layout_recognizer.py:62-67),
- repeated page header/footer removal across pages (:149-156),
- ToC page removal (deepdoc/parser/pdf_parser.py:581-630 _filter_forpages),
- reading-order recovery: Y-then-X with fuzz, two-column column-major
  ordering (deepdoc/vision/recognizer.py:54-72,
  deepdoc/parser/pdf_parser.py:182-195),
- horizontal same-line merge + vertical concat gated by the reference's
  32-feature up/down vector with a deterministic rule threshold
  (deepdoc/parser/pdf_parser.py:125-180,540-543 — the XGBoost booster is
  external, so functions/concat_gate.py reimplements the features and
  freezes the decisions with a fixture table, per SURVEY.md §7),
- table reconstruction from row/col-tagged cells
  (deepdoc/vision/table_structure_recognizer.py:136-351), caption
  attachment to the nearest table/figure (pdf_parser.py:721-768),
- figure spans carry their media_ref and caption.

Input spans are assumed page-ordered (they are written that way); all
coordinates live in a synthetic page box of height ``page_height``.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from ..schemas import make_span

_GARBAGE_RES = (
    re.compile(r"^[•·●\s]+$"),
    re.compile(r"^•(\s*•)+$"),
    re.compile(r"^https?://\S+$"),
    re.compile(r"^\(cid:\d+\)"),
    re.compile(r"^page\s*\d+\s*/\s*\d+$", re.I),
)
_TOC_HEAD_RE = re.compile(r"^\s*(contents|table of contents|目\s*录|目次)\s*$", re.I)
_TOC_LINE_RE = re.compile(r"[\.…·]{4,}\s*\d+\s*$")
# boundary chars that take a joining space when lines concat
# (pdf_parser.py:566-568: latin/digit boundaries get " ", CJK does not)
_JOIN_SPACE_RE = re.compile(r"[0-9\.a-zA-Z]+$")
# join rule: a space UNLESS the boundary char on either side is CJK or
# fullwidth punctuation. Deliberate divergence from the reference's
# literal check (pdf_parser.py:566-568 tests the LAST char of BOTH lines,
# so 'proposal,' + 'and ...' concatenates to 'proposal,and' — corrupted
# English); the evident intent — spaces for latin text, none inside CJK —
# is what we implement.
_CJK_BOUND_RE = re.compile(
    r"[⺀-鿿豈-﫿＀-￯　-〿]")
_CAPTION_TABLE_RE = re.compile(r"^\s*(table|表)\s*\d*", re.I)
_CAPTION_FIGURE_RE = re.compile(r"^\s*(fig(ure)?|图)\s*\d*", re.I)


@dataclass
class Box:
    text: str
    x0: float
    x1: float
    top: float
    bot: float
    page: int
    lay: str | None  # None = untagged, resolved by _infer_layout
    row: int | None = None
    col: int | None = None
    tno: int | None = None
    in_row: int = 0  # same-row neighbor count (pdf_parser.py:473-487)


@dataclass
class _Table:
    tno: int
    page: int
    top: float
    x0: float
    cells: list[Box] = field(default_factory=list)
    caption: str = ""


@dataclass
class _Figure:
    page: int
    top: float
    x0: float
    media_ref: str = ""
    caption: str = ""


def parse_box(span_text: str) -> Box:
    d = json.loads(span_text)
    # absent lay stays None so layout inference can tell "untagged" from
    # an explicit "text" label
    return Box(d.get("t", ""), d.get("x0", 0.0), d.get("x1", 0.0),
               d.get("top", 0.0), d.get("bot", 0.0), int(d.get("page", 0)),
               d.get("lay"), d.get("row"), d.get("col"), d.get("tno"))


_SENT_END_LAY = re.compile(r"[.!?。！？;；,，]\s*$")

# model-backed layout head (functions/vision_onnx.OnnxLayout.classify):
# installed per batch by the extract router when
# layout_recognize="onnx" and layout.onnx is present, None = rule head
_LAYOUT_MODEL = None
LAYOUT_CLASSES = ("header", "footer", "title", "text")


def set_layout_model(fn) -> None:
    """Install/remove the model-backed layout classifier (a callable
    ``feats[n,5] → class index into LAYOUT_CLASSES``)."""
    global _LAYOUT_MODEL
    _LAYOUT_MODEL = fn


def layout_features(untagged: list[Box], boxes: list[Box],
                    page_height: int):
    """Per-box geometry features for the layout head — the same five
    signals the rule thresholds on, as a float32 matrix: [short,
    top-margin, bottom-margin, tall-type, sentence-punctuated]."""
    import numpy as np

    heights = sorted(b.bot - b.top for b in boxes)
    med_h = max(heights[len(heights) // 2], 1e-6)
    f = np.zeros((len(untagged), 5), dtype=np.float32)
    for i, b in enumerate(untagged):
        f[i, 0] = len(b.text.strip()) <= 60
        f[i, 1] = b.bot < 0.08 * page_height
        f[i, 2] = b.top > 0.92 * page_height
        f[i, 3] = (b.bot - b.top) >= 1.3 * med_h
        f[i, 4] = bool(_SENT_END_LAY.search(b.text))
    return f


def _infer_layout(boxes: list[Box], page_height: int) -> None:
    """Layout classification for untagged boxes — the role of the
    reference's 10-class layout model (deepdoc/vision/
    layout_recognizer.py:31-161) re-expressed as deterministic page
    heuristics, applied ONLY to boxes whose input carried no ``lay``:
    short lines hugging the top/bottom page margins become header/footer;
    lines set in type ≥1.3× the page's median line height, short and not
    sentence-punctuated, become titles; everything else is body text.
    Tagged boxes are never reclassified. When a model head is installed
    (set_layout_model), it classifies the same feature rows instead."""
    untagged = [b for b in boxes if b.lay is None]
    if not untagged:
        return
    if _LAYOUT_MODEL is not None:
        idx = _LAYOUT_MODEL(layout_features(untagged, boxes, page_height))
        for b, i in zip(untagged, idx):
            b.lay = LAYOUT_CLASSES[int(i)]
        return
    heights = sorted(b.bot - b.top for b in boxes)
    med_h = max(heights[len(heights) // 2], 1e-6)
    for b in untagged:
        short = len(b.text.strip()) <= 60
        if short and b.bot < 0.08 * page_height:
            b.lay = "header"
        elif short and b.top > 0.92 * page_height:
            b.lay = "footer"
        elif ((b.bot - b.top) >= 1.3 * med_h and short
              and not _SENT_END_LAY.search(b.text)):
            b.lay = "title"
        else:
            b.lay = "text"


def _is_garbage(text: str) -> bool:
    t = text.strip()
    return any(p.match(t) for p in _GARBAGE_RES)


def _infer_grid(cells: list[Box]) -> None:
    """Geometry-based table structure recovery — the role of the
    reference's TSR model (deepdoc/vision/table_structure_recognizer.py:
    29-92) re-expressed as deterministic clustering, used when a table's
    boxes carry no row/col tags: rows are top-coordinate clusters (split
    where the gap to the previous cell top exceeds half the median cell
    height), numbered per page and continued across pages so a multi-page
    table keeps one consistent grid; columns are x0 clusters over the
    whole table (split at gaps wider than half the median cell width).
    No-op when ANY cell already carries a tag (never second-guess real
    structure)."""
    if not cells or any(c.row is not None or c.col is not None
                        for c in cells):
        return
    heights = sorted(c.bot - c.top for c in cells)
    half_h = max(heights[len(heights) // 2] * 0.5, 1.0)
    # PAGE-SCOPED row ids (page*10^5 + per-page cluster index): fragments
    # of a table split across page-range shards re-infer independently,
    # and a 0-based numbering restarted per shard would collide page-2
    # rows onto page-1 rows when render_table_cells merges the fragments;
    # page-scoped ids stay collision-free and sort in reading order
    for page in sorted({c.page for c in cells}):
        row_id = page * 100_000
        prev_top = None
        for c in sorted((c for c in cells if c.page == page),
                        key=lambda c: c.top):
            if prev_top is not None and c.top - prev_top > half_h:
                row_id += 1
            c.row = row_id
            prev_top = c.top
    widths = sorted(c.x1 - c.x0 for c in cells)
    min_gap = max(widths[len(widths) // 2] * 0.5, 4.0)
    col = 0
    prev_x = None
    col_of: dict[float, int] = {}
    for x in sorted({c.x0 for c in cells}):
        if prev_x is not None and x - prev_x > min_gap:
            col += 1
        col_of[x] = col
        prev_x = x
    for c in cells:
        c.col = col_of[c.x0]


def extract_pdfish(spans: list[dict], page_height: int = 1000,
                   keep_positions: bool = False) -> list[dict]:
    """spans (kind ∈ box/caption/image, in write order) → ordered phase-A
    output spans (title/section/table_cells/figure).

    ``keep_positions`` weaves the reference's in-band positional tags
    (``@@page\tx0\tx1\ttop\tbottom##``, pdf_parser.py:893-908 _line_tag)
    into title/section text; consumers strip/parse them with
    functions/postag.py. Merge decisions are made on the UNTAGGED text so
    the section structure is identical with and without tags."""
    from .postag import encode_tag
    boxes: list[Box] = []
    tables: dict[int, _Table] = {}
    table_order: list[int] = []
    figures: list[_Figure] = []
    # walk in input order so captions/images attach to the object emitted
    # just before them (nearest-preceding, the generator/reference layout)
    last_obj: object = None
    # untagged tables get distinct negative auto keys per contiguous run
    # of table boxes (a constant key would merge every untagged table in
    # the doc into one); a table SPLIT across page-range shards still
    # merges, because each shard's run of the same table is the first one
    # and auto keys restart per shard — a best-effort continuation
    # contract in the absence of tno tags
    auto_tno = 0
    auto_open = False
    for sp in spans:
        kind = sp["kind"]
        if kind == "box":
            b = parse_box(sp["text"])
            if b.lay != "table":
                auto_open = False
            if b.lay == "table":
                if b.tno is None and not auto_open:
                    auto_tno -= 1
                    auto_open = True
                tno = b.tno if b.tno is not None else auto_tno
                if tno not in tables:
                    tables[tno] = _Table(tno, b.page, b.top, b.x0)
                    table_order.append(tno)
                t = tables[tno]
                t.cells.append(b)
                # reading-order anchor = first page the table appears on
                # and its min top THERE — a continuation row's
                # top-of-next-page y must not drag the table upward
                if b.page < t.page:
                    t.page, t.top, t.x0 = b.page, b.top, b.x0
                elif b.page == t.page:
                    t.top = min(t.top, b.top)
                last_obj = t
            elif b.lay == "figure":
                f = _Figure(b.page, b.top, b.x0)
                figures.append(f)
                last_obj = f
            else:
                boxes.append(b)
        elif kind == "image":
            if isinstance(last_obj, _Figure) and not last_obj.media_ref:
                last_obj.media_ref = sp.get("media_ref", "")
            else:
                f = _Figure(boxes[-1].page if boxes else 0,
                            boxes[-1].top if boxes else 0.0, 0.0,
                            media_ref=sp.get("media_ref", ""))
                figures.append(f)
                last_obj = f
        elif kind == "caption":
            text = sp["text"]
            target = last_obj
            # caption prefix can override the positional attachment
            if _CAPTION_FIGURE_RE.match(text) and not _CAPTION_TABLE_RE.match(text):
                if not isinstance(target, _Figure):
                    target = figures[-1] if figures else None
            elif _CAPTION_TABLE_RE.match(text):
                if not isinstance(target, _Table):
                    target = tables[table_order[-1]] if table_order else None
            if isinstance(target, (_Table, _Figure)) and not target.caption:
                target.caption = text
            elif text.strip():
                # orphan caption → plain text line at its position
                boxes.append(Box(text, 0, 0,
                                 boxes[-1].bot + 1 if boxes else 0.0, 0,
                                 boxes[-1].page if boxes else 0, "text"))

    # ---- layout inference for untagged boxes -------------------------
    _infer_layout(boxes, page_height)

    # ---- garbage filter ----------------------------------------------
    boxes = [b for b in boxes if b.text.strip() and not _is_garbage(b.text)]

    # ---- repeated header/footer removal ------------------------------
    hf_texts = {b.text.strip() for b in boxes if b.lay in ("header", "footer")}
    boxes = [b for b in boxes
             if b.lay not in ("header", "footer")
             and b.text.strip() not in hf_texts]

    # ---- ToC removal --------------------------------------------------
    toc_pages = {b.page for b in boxes
                 if b.lay == "title" and _TOC_HEAD_RE.match(b.text)}
    if toc_pages:
        boxes = [b for b in boxes
                 if not (b.page in toc_pages
                         and (_TOC_HEAD_RE.match(b.text)
                              or _TOC_LINE_RE.search(b.text)))]

    # ---- reading order ------------------------------------------------
    # order items = text/title boxes + table groups + figures, keyed by
    # (page, column, top, x0); two-column detection per page over text boxes
    pages: dict[int, list] = {}
    for b in boxes:
        pages.setdefault(b.page, []).append(("box", b))
    for t in tables.values():
        pages.setdefault(t.page, []).append(("table", t))
    for f in figures:
        pages.setdefault(f.page, []).append(("figure", f))

    ordered: list[tuple[str, object]] = []
    for page in sorted(pages):
        items = pages[page]
        tx0 = sorted({it[1].x0 for it in items
                      if it[0] == "box" and it[1].lay == "text"})
        two_col = False
        split_x = 0.0
        if len(tx0) >= 2:
            mid = (tx0[0] + tx0[-1]) / 2.0
            left = [x for x in tx0 if x < mid]
            right = [x for x in tx0 if x >= mid]
            # distinct, non-overlapping x-start clusters → column-major
            if left and right and min(right) - max(left) > 100:
                two_col, split_x = True, mid

        def key(it):
            kind, o = it
            x0 = o.x0
            top = o.top
            col = 1 if (two_col and x0 >= split_x) else 0
            return (col, round(top, 1), x0)

        ordered.extend(sorted(items, key=key))

    # ---- in-row neighbor counts (pdf_parser.py:473-487) ---------------
    # per page: a text box's in_row = number of other text boxes whose
    # vertical center sits within one mean line height of its own
    for page, items in pages.items():
        tb = [o for k, o in items if k == "box"]
        if len(tb) < 2:
            continue
        mh = sum(b.bot - b.top for b in tb) / len(tb) or 1.0
        centers = [(b.top + b.bot) / 2 for b in tb]
        for i, b in enumerate(tb):
            b.in_row = sum(
                1 for j, c in enumerate(centers)
                if j != i and abs(c - centers[i]) < mh)

    # ---- merge text flow + emit --------------------------------------
    from .concat_gate import LineGeom, should_concat

    def geom(b: Box) -> LineGeom:
        return LineGeom(b.text.strip(), b.x0, b.x1, b.top, b.bot, b.page,
                        b.lay, b.in_row)

    out: list[dict] = []
    cur: str | None = None
    cur_plain: str | None = None  # tag-free shadow driving merge decisions
    prev_geom: LineGeom | None = None  # last line's geometry, built ONCE —
    # the gate memoizes per-line regex features on it, and every line is
    # scored once as `down` then once as `up` along the chain
    cur_page = -1

    def flush():
        nonlocal cur, cur_plain, prev_geom
        if cur is not None and cur.strip():
            out.append(make_span("section", cur.strip()))
        cur = None
        cur_plain = None
        prev_geom = None

    for kind, o in ordered:
        # text flow never merges across a page boundary, so page-aligned
        # shard cuts reproduce the unsharded output exactly (the reference
        # also parses page-range tasks independently, task_service.py:321)
        if o.page != cur_page:
            flush()
            cur_page = o.page
        if kind == "table":
            flush()
            # emit RAW cells (not rendered rows): a table can continue in
            # the next page-range shard (the reference merges tables ≤1
            # page apart, pdf_parser.py:701-716), so rendering happens in
            # phase B after same-tno fragments are merged across shards
            # (functions/pdfish.py::render_table_cells)
            import json as _json

            _infer_grid(o.cells)
            # each cell carries its PAGE explicitly: the phase-B proximity
            # merge needs real pages, and deriving them from row ids only
            # works for _infer_grid's page-scoped numbering (cells with
            # explicit row tags would all report page 0)
            payload = _json.dumps({
                "tno": o.tno,
                "caption": o.caption.strip() if o.caption else "",
                "cells": [[c.row or 0, c.col or 0, c.text, c.page]
                          for c in sorted(o.cells,
                                          key=lambda c: (c.row or 0,
                                                         c.col or 0))],
            }, ensure_ascii=False)
            out.append(make_span("table_cells", payload))
            continue
        if kind == "figure":
            flush()
            out.append(make_span("figure", o.caption.strip(), o.media_ref))
            continue
        b = o
        tag = (encode_tag(b.page, b.x0, b.x1, b.top, b.bot)
               if keep_positions else "")
        if b.lay == "title":
            # every title box keeps kind "title" here; phase B decides
            # (naive: first stays title, rest demote to sections; paper:
            # titles are the section-grouping pivots)
            flush()
            out.append(make_span("title", b.text.strip() + tag))
            continue
        # text flow: the 32-feature gate decides whether this line
        # continues the previous one (pdf_parser.py:540-543); decisions
        # use the UNTAGGED text and the line geometry
        t_plain = b.text.strip()
        t = t_plain + tag
        g = geom(b)
        if cur is None:
            cur, cur_plain = t, t_plain
        elif prev_geom is not None and should_concat(prev_geom, g):
            # joining space unless the boundary is CJK (see _CJK_BOUND_RE)
            join = (" " if cur_plain and t_plain
                    and not _CJK_BOUND_RE.match(cur_plain[-1])
                    and not _CJK_BOUND_RE.match(t_plain[0]) else "")
            cur += join + t
            cur_plain += join + t_plain
        else:
            flush()
            cur, cur_plain = t, t_plain
        prev_geom = g
    flush()
    return out


def render_table_cells(spans: list[dict]) -> list[dict]:
    """Phase-B pre-pass: merge `table_cells` fragments sharing a table id
    (a table split by a page-range shard cut arrives as one fragment per
    shard) and render each merged table — caption section + one
    `table_row` span per grid row — at its FIRST occurrence position.
    Role of the reference's cross-page table merge
    (deepdoc/parser/pdf_parser.py:701-716). Other spans pass through."""
    import json as _json

    merged: dict[int, dict] = {}
    out: list[dict] = []
    auto_key = 0
    for s in spans:
        if s["kind"] != "table_cells":
            out.append(s)
            continue
        d = _json.loads(s["text"])
        tno = d.get("tno")
        if tno is None or int(tno) < 0:
            # auto-keyed (untagged) fragment: shard-local keys collide
            # across shards for DIFFERENT tables, so every fragment gets
            # a unique key here and the proximity pass below decides what
            # merges — never the raw key
            auto_key -= 1
            key = auto_key
        else:
            key = int(tno)
        if key in merged:
            merged[key]["cells"].extend(d["cells"])
            if not merged[key]["caption"] and d.get("caption"):
                merged[key]["caption"] = d["caption"]
        else:
            merged[key] = {"caption": d.get("caption", ""),
                           "cells": list(d["cells"])}
            out.append({"kind": "_table_slot", "text": "", "media_ref": "",
                        "offset": 0, "_key": key})

    if not merged:
        return out

    # proximity merge for untagged tables (the reference's rule: tables
    # no more than one page apart merge, pdf_parser.py:701-716). Cells
    # carry their page explicitly (4th element); legacy 3-element payloads
    # fall back to the page-scoped row-id encoding (row // 1e5).
    def _pages(k):
        return [(c[3] if len(c) > 3 else c[0] // 100_000)
                for c in merged[k]["cells"]]

    autos = sorted((k for k in merged if k < 0 and merged[k]["cells"]),
                   key=lambda k: min(_pages(k)))
    dropped: set[int] = set()
    kept = None
    kept_max = -10
    for k in autos:
        pages = _pages(k)
        if kept is not None and min(pages) - kept_max <= 1:
            merged[kept]["cells"].extend(merged[k]["cells"])
            if not merged[kept]["caption"] and merged[k]["caption"]:
                merged[kept]["caption"] = merged[k]["caption"]
            kept_max = max(kept_max, max(pages))
            del merged[k]
            dropped.add(k)
            continue
        kept, kept_max = k, max(pages)
    if dropped:
        out = [s for s in out
               if s.get("kind") != "_table_slot" or s["_key"] not in dropped]

    rendered: list[dict] = []
    for s in out:
        if s.get("kind") != "_table_slot":
            rendered.append(s)
            continue
        d = merged[s["_key"]]
        if d["caption"]:
            rendered.append(make_span("section", d["caption"]))
        # positional grid → NL row descriptions with header composition
        # (table_structure_recognizer.py:399-501 __desc_table semantics;
        # caption divergence: emitted ONCE as a section above instead of
        # suffixed onto every row)
        from .table import describe_grid_rows

        cells: dict[int, dict[int, str]] = {}
        for cell in sorted(d["cells"]):
            r, c, text = cell[0], cell[1], cell[2]
            row = cells.setdefault(r, {})
            row[c] = (row.get(c, "") + " " + text).strip()
        ncol = max((max(cs) + 1 for cs in cells.values()), default=0)
        grid = [[cells[r].get(c, "") for c in range(ncol)]
                for r in sorted(cells)]
        for line in describe_grid_rows(grid):
            rendered.append(make_span("table_row", line))
    return rendered
