"""Template routing + the two extraction phases.

Phase A (heavy, shard-local): kind-specific parsing — HTML boilerplate
strip, pdfish layout recovery, markdown/table parsing — emitting
partially-extracted spans in reading order. Runs inside `map_batches`
(actor pool) on shard rows; a shard never needs state from another shard
except what phase B restores.

Phase B (light, doc-local): the chunk-template merges — token packing,
bullet hierarchy, ToC/colon-title passes — over the concatenation of a
doc's phase-A spans in shard order. Runs fused with phase A for unsharded
docs, or inside `groupby(doc_id).map_groups` for exploded mega-docs.

This mirrors the reference split: parse per page-range task
(rag/svr/task_executor.py), merge per template (rag/app/*.py) — except our
merge is per *whole doc* after reassembly, which is strictly stronger than
the reference's per-task merge.

Router (role of the FACTORY registry, rag/svr/task_executor.py:67-84):
content-driven — box spans → pdfish, row spans → table, html → html,
md → md, else book when a bullet family matches, else naive.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..schemas import (EXTRACTED_SCHEMA, finalize_offsets, make_span,
                       spans_to_pylist)
from ..functions.bullets import (bullets_category, hierarchical_merge,
                                 make_colon_as_title, remove_contents_table,
                                 title_frequency)
from ..functions.html_extract import extract_html
from ..functions.markdown import extract_markdown
from ..functions.merge import naive_merge
from ..functions.pdfish import extract_pdfish
from ..functions.table import parse_tsv_rows

TEMPLATES = ("html", "pdfish", "book", "md", "table", "naive",
             "presentation", "email", "docx",
             # template_override-selected:
             "one", "qa", "paper", "laws", "manual", "tag", "picture")


def route_template(spans: list[dict]) -> str:
    kinds = {s["kind"] for s in spans}
    if "box" in kinds:
        return "pdfish"
    if "row" in kinds:
        return "table"
    if "slide" in kinds:
        return "presentation"
    if "eml" in kinds:
        return "email"
    if "docx" in kinds:
        return "docx"
    if "html" in kinds:
        return "html"
    if "md" in kinds:
        return "md"
    if kinds and kinds <= {"image"}:
        # the document IS an image (rag/app/picture.py chunker input)
        return "picture"
    texts = [s["text"] for s in spans if s["kind"] == "text"]
    if texts and bullets_category(texts) >= 0:
        return "book"
    return "naive"


# ------------------------------------------------------------- phase A ----

def _qa_stack(leveled: list[tuple[int, str]]) -> list[dict]:
    """Shared heading-stack Q/A pairing (the state machine of both
    rag/app/qa.py:413-447 markdown mode and :185-257 Docx mode): level>0
    lines are questions — the question TEXT is the join of the live
    heading stack (deeper headings stack, a heading pops everything at
    its level or deeper); level==0 (or >6) lines extend the answer; pairs
    with an empty answer are dropped."""
    out: list[dict] = []
    question_stack: list[str] = []
    level_stack: list[int] = []
    last_answer = ""

    def emit():
        nonlocal last_answer
        if last_answer.strip() and question_stack:
            out.append(make_span(
                "qa", "\n".join(question_stack) + "\n" + last_answer.strip()))
        last_answer = ""

    for level, text in leveled:
        if not level or level > 6:
            last_answer += "\n" + text
            continue
        emit()
        while question_stack and level <= level_stack[-1]:
            question_stack.pop()
            level_stack.pop()
        question_stack.append(text)
        level_stack.append(level)
    emit()
    return out


def _qa_from_md(lines: list[str]) -> list[dict]:
    """Markdown QA mode (rag/app/qa.py:413-447): a `#`-heading is a
    question (`#` inside fenced code blocks is not a heading). The
    reference renders the answer markdown to HTML (the `markdown` lib is
    absent here — the raw answer text is kept, same pairing)."""
    leveled: list[tuple[int, str]] = []
    code_block = False
    for line in lines:
        if line.strip().startswith("```"):
            code_block = not code_block
        level = 0
        if not code_block:
            i = 0
            while i < len(line) and line[i] == "#":
                i += 1
            level = i
        leveled.append((level, line.lstrip("#").lstrip() if level else line))
    return _qa_stack(leveled)


_HEADING_STYLE_RE = re.compile(r"Heading ?(\d+)$")


def _qa_from_docx(spans: list[dict]) -> list[dict]:
    """DOCX QA mode (rag/app/qa.py:185-257 Docx + rag/nlp
    docx_question_level): a Heading-N-styled paragraph is a level-N
    question; other paragraphs and tables extend the answer, with the
    same heading-stack pairing as markdown."""
    from ..functions.docx import parse_docx

    leveled: list[tuple[int, str]] = []
    for s in spans:
        if s["kind"] == "docx":
            parsed = parse_docx(s["text"])
            # walk body children IN DOCUMENT ORDER: a mid-document table
            # extends the answer of the heading it follows, not the last
            # heading of the file (the reference's qa.py Docx mode
            # processes tables at position)
            for kind, idx in parsed.body:
                if kind == "p":
                    text, style, _images = parsed.paragraphs[idx]
                    m = _HEADING_STYLE_RE.match(style)
                    leveled.append((int(m.group(1)) if m else 0, text))
                else:
                    leveled.append((0, parsed.tables[idx]))
        elif s["kind"] == "text":
            leveled.append((0, s["text"]))
    return _qa_stack(leveled)


def _qa_from_pdf(spans: list[dict]) -> list[dict]:
    """PDF Q-bullet mode (rag/app/qa.py:103-170 Pdf + qbullets_category):
    vote ONE question-numbering convention over the doc's lines, then a
    state machine in reading order — a line starting with the voted bullet
    flushes the open pair and opens a new question (question text runs
    through the first ？/? or to end of line, the remainder of the line
    seeds the answer); any other line extends the open answer; a table
    encountered mid-answer is folded into the answer stream (the
    reference's interleaved tbl_text insertion). Lines before the first
    question are dropped. Returns [] when no family wins the vote (caller
    falls back to the generic ?-suffix pairing), mirroring the reference's
    'Unable to recognize Q&A structure' failure path. Assumes tag-free
    text (keep_positions off), as positions live in crops there."""
    from ..functions.bullets import QBULLET_FAMILIES, qbullets_category

    stream: list[tuple[str, str]] = []
    for s in spans:
        if s["kind"] in ("section", "title"):
            stream.extend(("line", ln) for ln in s["text"].split("\n")
                          if ln.strip())
        elif s["kind"] == "table_row":
            stream.append(("table", s["text"]))
    fam = qbullets_category([t for k, t in stream if k == "line"])
    if fam < 0:
        return []
    bullet = QBULLET_FAMILIES[fam]
    q_re = re.compile(bullet.pattern + r".*?(?:[?？]|$)", bullet.flags)
    out: list[dict] = []
    q = a = ""

    def flush():
        nonlocal q, a
        if q:
            out.append(make_span("qa", f"{q}\n{a.strip()}" if a.strip() else q))
        q = a = ""

    for kind, text in stream:
        t = text.strip()
        if kind == "table" or not bullet.match(t):
            if q:
                a += "\n" + t
            continue
        flush()
        m = q_re.match(t)
        q = m.group(0) if m else t
        a = t[len(q):]
    flush()
    return out


def _norm_tags(raw: str) -> str:
    """Tag normalization of rag/app/tag.py:31 (beAdoc): comma-split,
    strip, '.' -> '_', empties dropped; kept comma-joined in one span."""
    return ",".join(t.strip().replace(".", "_")
                    for t in raw.split(",") if t.strip())


def _tag_from_rows(rows: list[str]) -> list[dict]:
    """Tag-KB excel mode (rag/app/tag.py:55-60, via qa.py:36-77 Excel
    cell semantics): per row the first non-empty cell is the content, the
    second the comma-separated tag list; rows without both are failures
    and are skipped. Each pair emits a (tag, tag_kwd) span pair — the
    span-IR encoding of the reference's content_with_weight + tag_kwd
    chunk fields."""
    out: list[dict] = []
    for row in rows:
        cells = [c.strip() for c in row.split("\t") if c.strip()]
        if len(cells) >= 2:
            out.append(make_span("tag", cells[0]))
            out.append(make_span("tag_kwd", _norm_tags(cells[1])))
    return out


def _tag_from_txt(lines: list[str]) -> list[dict]:
    """Tag-KB txt/csv mode (rag/app/tag.py:61-92): vote ONE delimiter for
    the doc (TAB iff at least as many 2-field TAB lines as comma lines),
    then a state machine over the lines — a non-2-field line extends the
    pending content; a 2-field line closes a pair whose content is the
    accumulated prefix plus its first field and whose tags are the second.
    Content left pending at EOF is dropped (reference behavior)."""
    comma = sum(1 for ln in lines if len(ln.split(",")) == 2)
    tab = sum(1 for ln in lines if len(ln.split("\t")) == 2)
    delim = "\t" if tab >= comma else ","
    out: list[dict] = []
    content = ""
    for ln in lines:
        arr = ln.split(delim)
        if len(arr) != 2:
            content += "\n" + ln
        else:
            content += "\n" + arr[0]
            out.append(make_span("tag", content.strip()))
            out.append(make_span("tag_kwd", _norm_tags(arr[1])))
            content = ""
    return out


def _qa_from_rows(rows: list[str]) -> list[dict]:
    """Two-column QA mode (rag/app/qa.py:36-77 Excel semantics): per row,
    the first non-empty cell is the question, the second the answer; rows
    without both are failures and are skipped. No header convention."""
    out: list[dict] = []
    for row in rows:
        cells = [c.strip() for c in row.split("\t") if c.strip()]
        if len(cells) >= 2:
            out.append(make_span("qa", cells[0] + "\n" + cells[1]))
    return out


def phase_a(template: str, spans: list[dict], cfg: ExtractConfig) -> list[dict]:
    # the qa template replaces the whole parse for md/table inputs, like
    # the reference's qa chunker dispatching on file type (rag/app/qa.py)
    if cfg.template_override == "qa":
        if template == "md":
            return _qa_from_md(
                [s["text"] for s in spans if s["kind"] == "md"])
        if template == "table":
            return _qa_from_rows(
                [s["text"] for s in spans if s["kind"] == "row"])
        if template == "docx":
            return _qa_from_docx(spans)
    if cfg.template_override == "tag" and template == "table":
        # tag-KB excel mode has no header convention (rag/app/tag.py:55-60:
        # "2 column content and tags without header")
        return _tag_from_rows(
            [s["text"] for s in spans if s["kind"] == "row"])
    if template == "pdfish":
        # outline metadata spans (from PDF bookmarks) pass through phase
        # A untouched — extract_pdfish's box walk would drop them; phase
        # B consumes them for manual-template levels and strips them
        toc = [s for s in spans if s["kind"] == "toc_entry"]
        if toc:
            spans = [s for s in spans if s["kind"] != "toc_entry"]
        if cfg.layout_recognize == "plain":
            # "Plain Text" mode (rag/app/naive.py:282-299 PlainParser via
            # layout_recognize): raw text lines in input order — no
            # ordering/two-column/table/ToC machinery; tables degrade to
            # their cell text at input position
            from ..functions.pdfish import parse_box

            out = []
            for s in spans:
                if s["kind"] == "box":
                    t = parse_box(s["text"]).text.strip()
                elif s["kind"] == "caption":
                    t = s["text"].strip()
                else:
                    continue
                if t:
                    out.append(make_span("section", t))
            return out + toc
        return extract_pdfish(spans, page_height=cfg.page_height,
                              keep_positions=cfg.keep_positions) + toc
    if template == "table":
        rows = [s["text"] for s in spans if s["kind"] == "row"]
        if cfg.html4excel:
            from ..functions.table import tsv_to_html_chunks

            return [make_span("table_html", h)
                    for h in tsv_to_html_chunks(rows,
                                                chunk_rows=cfg.html_chunk_rows)]
        return [make_span("table_row", line)
                for line in parse_tsv_rows(rows).row_lines()]
    if template == "html":
        out: list[dict] = []
        seen_refs: set[str] = set()
        for s in spans:
            if s["kind"] == "html":
                h = extract_html(s["text"])
                if h.title:
                    out.append(make_span("title", h.title))
                for sec in h.sections:
                    out.append(make_span("section", sec))
                for ref in h.figures:
                    if ref not in seen_refs:
                        seen_refs.add(ref)
                        out.append(make_span("figure", "", ref))
            elif s["kind"] == "image":
                ref = s.get("media_ref", "")
                # standalone media spans duplicate in-page <img> refs;
                # emit each figure once
                if ref and ref not in seen_refs:
                    seen_refs.add(ref)
                    out.append(make_span("figure", "", ref))
            elif s["kind"] == "text":
                out.append(make_span("section", s["text"]))
        return out
    if template == "md":
        md = extract_markdown([s["text"] for s in spans if s["kind"] == "md"])
        out = []
        if md.title:
            out.append(make_span("title", md.title))
        out.extend(make_span("section", sec) for sec in md.sections)
        out.extend(make_span("table_html", t) for t in md.tables)
        for s in spans:
            if s["kind"] == "image" and s.get("media_ref"):
                out.append(make_span("figure", "", s["media_ref"]))
        return out
    if template == "presentation":
        # each slide is its own chunk-to-be; phase B passes slides through
        # (rag/app/presentation.py: "Every page will be treated as a chunk"
        # with its thumbnail stored alongside)
        out = []
        for s in spans:
            if s["kind"] == "slide":
                out.append(make_span("slide", s["text"], s.get("media_ref", "")))
            elif s["kind"] == "image" and s.get("media_ref"):
                out.append(make_span("figure", "", s["media_ref"]))
            elif s["kind"] in ("text", "caption"):
                out.append(make_span("section", s["text"]))
        return out
    if template == "docx":
        # OOXML walk (functions/docx.py): paragraphs in document order —
        # first Title-styled paragraph becomes the doc title — then the
        # tables, matching the reference's (lines, tbls) return shape
        # (rag/app/naive.py:175-238); inline images surface as figures
        # with their caption text when a Caption paragraph claimed them
        from ..functions.docx import parse_docx

        out = []
        for s in spans:
            if s["kind"] == "docx":
                parsed = parse_docx(s["text"])
                titled = False
                for text, style, images in parsed.paragraphs:
                    cap = text if style == "Caption" else ""
                    if style == "Title" and not titled:
                        titled = True
                        out.append(make_span("title", text))
                    elif not (cap and images):
                        out.append(make_span("section", text))
                    for part in images:
                        out.append(make_span("figure", cap, f"docx://{part}"))
                for html in parsed.tables:
                    out.append(make_span("table_html", html))
            elif s["kind"] == "text":
                out.append(make_span("section", s["text"]))
            elif s["kind"] == "image" and s.get("media_ref"):
                out.append(make_span("figure", "", s["media_ref"]))
        return out
    if template == "email":
        # headers → text lines → html-extracted sections, in that order
        # (rag/app/email.py:58-85); attachments become media refs
        from ..functions.eml import parse_eml

        out = []
        for s in spans:
            if s["kind"] == "eml":
                parsed = parse_eml(s["text"])
                for line in parsed.headers:
                    out.append(make_span("section", line))
                for line in parsed.text_lines:
                    out.append(make_span("section", line))
                for html in parsed.html_parts:
                    h = extract_html(html)
                    if h.title:
                        out.append(make_span("section", h.title))
                    for sec in h.sections:
                        out.append(make_span("section", sec))
                for name in parsed.attachments:
                    out.append(make_span("figure", "", f"attach://{name}"))
            elif s["kind"] == "text":
                out.append(make_span("section", s["text"]))
            elif s["kind"] == "image" and s.get("media_ref"):
                out.append(make_span("figure", "", s["media_ref"]))
        return out
    if template == "picture":
        # rule-OCR (binarize → segment → classify, functions/glyphs.py)
        # stands in for the det/rec models the reference runs here
        # (rag/app/picture.py:38 ocr(np.array(img)), deepdoc/vision/ocr.py);
        # the payload travels WITH the doc like the reference keeps
        # doc["image"] alongside its chunk (picture.py:34-36)
        import base64

        from ..functions.glyphs import ocr_glyphs
        from ..functions.image_ops import decode_image

        out = []
        for s in spans:
            if s["kind"] != "image":
                continue
            out.append(make_span("image", s["text"], s.get("media_ref", "")))
            try:
                txt = ocr_glyphs(decode_image(base64.b64decode(s["text"])))
            except Exception:  # noqa: BLE001 — undecodable payload: ref only
                continue
            if txt:
                out.append(make_span("ocr_text", txt))
        return out
    # naive / book: raw sections pass through; merges happen in phase B
    out = []
    for s in spans:
        if s["kind"] == "text":
            out.append(make_span("section", s["text"]))
        elif s["kind"] == "json":
            # structure-preserving recursive split, one section per chunk
            # (deepdoc/parser/json_parser.py:25-133 semantics; the naive
            # template's .json branch)
            import json as _json

            from ..functions.txt_json import json_split

            try:
                obj = _json.loads(s["text"])
            except ValueError:
                out.append(make_span("section", s["text"]))
                continue
            out.extend(make_span("section", c)
                       for c in json_split(obj,
                                           max_size=cfg.chunk_token_num * 4))
        elif s["kind"] == "image" and s.get("media_ref"):
            out.append(make_span("figure", "", s["media_ref"]))
        elif s["kind"] == "audio":
            # audio payloads pass through WITH the doc (their text side is
            # the reference's remote-ASR call, rag/app/audio.py — out of
            # scope); the framing stage decodes them downstream
            out.append(s)
        elif s["kind"] == "caption":
            out.append(make_span("section", s["text"]))
    return out


# ------------------------------------------------------------- phase B ----

def _counter_for(cfg: ExtractConfig):
    """Token currency for chunk budgets (ExtractConfig.token_counter):
    None → naive_merge's default max-match counter; the frozen-vocab BPE
    counter gives tiktoken-style reproducible budgets."""
    if cfg.token_counter == "bpe":
        from ..functions.bpe_counter import bpe_num_tokens

        return bpe_num_tokens
    from ..functions.tokenizer import num_tokens

    return num_tokens


def _pack_sections(spans: list[dict], cfg: ExtractConfig) -> list[dict]:
    """Merge runs of consecutive `section` spans with the token-budget
    packer; non-section spans (title/table_row/figure/...) break runs and
    pass through in place."""
    out: list[dict] = []
    buf: list[str] = []

    def flush():
        nonlocal buf
        if buf:
            for chunk in naive_merge(buf, cfg.chunk_token_num, cfg.delimiter,
                                      counter=_counter_for(cfg)):
                out.append(make_span("section", chunk))
            buf = []

    for s in spans:
        if s["kind"] == "section":
            buf.append(s["text"])
        else:
            flush()
            out.append(s)
    flush()
    return out


_QUESTION_RE = None


def _question_re():
    global _QUESTION_RE
    if _QUESTION_RE is None:
        import re

        # question-line taxonomy (role of rag/nlp/__init__.py:74-86
        # QUESTION_PATTERN, simplified to the deterministic core)
        _QUESTION_RE = re.compile(
            r"(.*[?？]\s*$)|(^Q\d*[\.:：]\s)|(^(question|问题?)[\s::：])", re.I)
    return _QUESTION_RE


def _qa_pairs(texts: list[str]) -> list[tuple[str, str]]:
    """Pair question lines with the answer text that follows them
    (rag/app/qa.py text-mode semantics: content before the first question
    is dropped; an unanswered trailing question keeps an empty answer)."""
    qre = _question_re()
    pairs: list[tuple[str, str]] = []
    q: str | None = None
    a: list[str] = []
    for t in texts:
        if qre.match(t.strip()):
            if q is not None:
                pairs.append((q, "\n".join(a)))
            q, a = t.strip(), []
        elif q is not None:
            a.append(t)
    if q is not None:
        pairs.append((q, "\n".join(a)))
    return pairs


_ABSTRACT_RE = None


def _abstract_re():
    global _ABSTRACT_RE
    if _ABSTRACT_RE is None:
        import re

        _ABSTRACT_RE = re.compile(r"^\s*(abstract|摘\s*要)\b", re.I)
    return _ABSTRACT_RE


def _demote_extra_titles(spans: list[dict]) -> list[dict]:
    """First title span stays the doc title; later title boxes become
    section headings (the naive-template treatment of layout titles)."""
    out = []
    seen_title = False
    for s in spans:
        if s["kind"] == "title":
            if seen_title:
                s = make_span("section", s["text"], s["media_ref"])
            seen_title = True
        out.append(s)
    return out


def _paper_merge(spans: list[dict], cfg: ExtractConfig) -> list[dict]:
    """Paper template (rag/app/paper.py:173-206 semantics): sections group
    under their preceding layout title; each group packs to the token
    budget with the title prefixed; a group titled Abstract/摘要 emits one
    `abstract` span. The first title is the doc title."""
    out: list[dict] = []
    doc_title: str | None = None
    cur_title: str | None = None
    buf: list[str] = []

    def flush():
        nonlocal buf, cur_title
        if not buf and cur_title is None:
            return
        if cur_title and _abstract_re().match(cur_title):
            body = "\n".join(buf)
            out.append(make_span("abstract",
                                 cur_title + ("\n" + body if body else "")))
        else:
            chunks = naive_merge(buf, cfg.chunk_token_num, cfg.delimiter,
                                      counter=_counter_for(cfg))
            for c in chunks:
                out.append(make_span(
                    "section", (cur_title + "\n" + c) if cur_title else c))
            if cur_title and not chunks:
                out.append(make_span("section", cur_title))
        buf = []
        cur_title = None

    for s in spans:
        if s["kind"] == "title":
            if doc_title is None:
                doc_title = s["text"]
                out.append(make_span("title", doc_title))
                continue
            flush()
            cur_title = s["text"]
        elif s["kind"] == "section":
            buf.append(s["text"])
        else:
            flush()
            out.append(s)
    flush()
    return finalize_offsets(out)


def _manual_merge(spans: list[dict], cfg: ExtractConfig,
                  toc: list[tuple[str, int]] | None = None) -> list[dict]:
    """Manual template (rag/app/manual.py:214-258 semantics): pick the most
    frequent heading level as the pivot, assign a section id that advances
    at every pivot-level heading, then greedily pack consecutive sections —
    always glue while a chunk holds <32 tokens, keep gluing to 1024 tokens
    while the section id is unchanged.

    When the doc carries a PDF outline covering >3% of its sections,
    levels come from the outline instead of bullet frequency: each
    section takes the level of the first outline title whose
    character-bigram set overlaps its text >0.8 (Jaccard over the larger
    set), unmatched lines rank below every outline level — the
    reference's outline pivot path (rag/app/manual.py:196-210)."""
    num_tokens = _counter_for(cfg)

    texts = [s["text"] for s in spans if s["kind"] in ("section", "title")]
    others = [s for s in spans if s["kind"] not in ("section", "title")]
    if texts and toc and len(toc) / len(texts) > 0.03:
        max_lvl = max(lvl for _, lvl in toc)
        most = max(0, max_lvl - 1)
        levels = []
        for txt in texts:
            for t, lvl in toc:
                tks = {t[i] + t[i + 1] for i in range(len(t) - 1)}
                tks_ = {txt[i] + txt[i + 1]
                        for i in range(min(len(t), len(txt) - 1))}
                if len(tks & tks_) / max(len(tks), len(tks_), 1) > 0.8:
                    levels.append(lvl)
                    break
            else:
                levels.append(max_lvl + 1)
    else:
        fam = bullets_category(texts)
        most, levels = title_frequency(texts, fam)
    # content lines rank below every heading (reference: max_lvl + 1,
    # manual.py:209-210)
    deep = 1 << 10
    sec_ids: list[int] = []
    sid = 0
    prev = None
    for i, lvl in enumerate(levels):
        lvl = lvl if lvl >= 0 else deep
        if lvl <= most and i > 0 and lvl != prev:
            sid += 1
        sec_ids.append(sid)
        prev = lvl
    chunks: list[str] = []
    last_sid = -2
    tk = 0
    for txt, sec_id in zip(texts, sec_ids):
        if chunks and (tk < 32 or (tk < 1024 and sec_id == last_sid)):
            chunks[-1] += "\n" + txt
            tk += num_tokens(txt)
            continue
        chunks.append(txt)
        tk = num_tokens(txt)
        last_sid = sec_id
    merged = [make_span("section", c) for c in chunks]
    return finalize_offsets(merged + others)


def phase_b(template: str, spans: list[dict], cfg: ExtractConfig,
            base: str | None = None) -> list[dict]:
    # cross-shard table continuation: merge same-tno table_cells fragments
    # (a table split by a page-range shard cut) and render them before any
    # template merge — the reference's cross-page table merge,
    # pdf_parser.py:701-716
    if any(s["kind"] == "table_cells" for s in spans):
        from ..functions.pdfish import render_table_cells

        spans = render_table_cells(spans)
    # outline metadata (PDF bookmarks) never reaches the output span
    # stream; the manual template consumes it for section levels
    toc_pairs: list[tuple[str, int]] = []
    if any(s["kind"] == "toc_entry" for s in spans):
        from ..functions.pdf_bytes import parse_toc_span

        toc_pairs = [parse_toc_span(s) for s in spans
                     if s["kind"] == "toc_entry"]
        spans = [s for s in spans if s["kind"] != "toc_entry"]
    if template == "paper":
        return _paper_merge(spans, cfg)
    if template == "manual":
        return _manual_merge(spans, cfg, toc=toc_pairs)
    if template == "laws":
        # like book but strictly hierarchical: a doc with no recognizable
        # bullet family yields no text chunks (rag/app/laws.py:200-208
        # "No chunk parsed out" — there is no naive_merge fallback)
        texts = [s["text"] for s in spans if s["kind"] in ("section", "title")]
        others = [s for s in spans if s["kind"] not in ("section", "title")]
        texts = remove_contents_table(texts)
        texts = make_colon_as_title(texts)
        fam = bullets_category(texts)
        chunks = (hierarchical_merge(texts, fam, cfg.max_hierarchy_depth)
                  if fam >= 0 else [])
        merged = [make_span("section", c) for c in chunks]
        return finalize_offsets(merged + others)
    if template == "presentation":
        # every slide stays one chunk (rag/app/presentation.py); when the
        # base parse produced plain sections (pdf page text), each section
        # likewise stays unpacked
        return finalize_offsets(list(spans))
    if template == "one":
        # whole-doc single chunk (rag/app/one.py): ALL textual content —
        # sections, titles and table rows — joined in reading order into
        # one chunk (the reference's excel branch likewise renders the
        # whole sheet into the single chunk, one.py:94-97); only figures
        # (media refs) pass through after it
        textual = ("section", "title", "table_row", "table_html")
        texts = [s["text"] for s in spans if s["kind"] in textual]
        others = [s for s in spans if s["kind"] not in textual]
        joined = "\n".join(t for t in texts if t)
        merged = [make_span("section", joined)] if joined else []
        return finalize_offsets(merged + others)
    if template == "qa":
        if base == "pdfish":
            # PDF docs get the Q-bullet state machine; tables were folded
            # into answers, so only figures pass through
            pdf_pairs = _qa_from_pdf(spans)
            if pdf_pairs:
                figures = [s for s in spans if s["kind"] == "figure"]
                return finalize_offsets(pdf_pairs + figures)
        texts = [s["text"] for s in spans if s["kind"] == "section"]
        others = [s for s in spans if s["kind"] not in ("section", "title")]
        merged = [make_span("qa", f"{q}\n{a}" if a else q)
                  for q, a in _qa_pairs(texts)]
        return finalize_offsets(merged + others)
    if template == "picture":
        # the whole OCR text is ONE chunk iff it clears the length gate
        # ((eng and words > 32) or chars > 32, rag/app/picture.py:42);
        # shorter text goes to the CV-LLM in the reference (out of scope
        # per the north rule) → no text chunk. Non-image inputs under the
        # override yield media refs only (the reference raises
        # NotImplementedError for them, picture.py accepts images alone).
        from ..functions.tokenizer import is_english

        texts = [s["text"] for s in spans if s["kind"] == "ocr_text"]
        media = [s for s in spans if s["kind"] in ("image", "figure")]
        txt = "\n".join(texts)
        long_enough = ((is_english(txt.split()) and len(txt.split()) > 32)
                       or len(txt) > 32)
        merged = [make_span("section", txt)] if txt and long_enough else []
        return finalize_offsets(merged + media)
    if template == "tag":
        # excel mode already produced (tag, tag_kwd) pairs in phase A;
        # every other archetype runs the txt/csv line state machine
        # (rag/app/tag.py:61-92) over its textual content in reading order.
        # Only the pair spans survive — the reference's tag chunker emits
        # nothing else ("All the deformed lines will be ignored").
        pairs = [s for s in spans if s["kind"] in ("tag", "tag_kwd")]
        if not pairs:
            lines = [ln
                     for s in spans
                     if s["kind"] in ("section", "title", "table_row")
                     for ln in s["text"].split("\n")]
            pairs = _tag_from_txt(lines)
        return finalize_offsets(pairs)
    if template == "book":
        texts = [s["text"] for s in spans if s["kind"] == "section"]
        others = [s for s in spans if s["kind"] != "section"]
        texts = remove_contents_table(texts)
        texts = make_colon_as_title(texts)
        fam = bullets_category(texts)
        if fam >= 0:
            chunks = hierarchical_merge(texts, fam, cfg.max_hierarchy_depth)
        else:
            chunks = naive_merge(texts, cfg.chunk_token_num, cfg.delimiter,
                                 counter=_counter_for(cfg))
        merged = [make_span("section", c) for c in chunks]
        # non-text spans (figures) follow the merged text
        return finalize_offsets(merged + others)
    if template == "table":
        return finalize_offsets(list(spans))
    return finalize_offsets(_pack_sections(_demote_extra_titles(spans), cfg))


def extract_doc(spans: list[dict], cfg: ExtractConfig = DEFAULT_CONFIG,
                template: str | None = None) -> tuple[str, list[dict], int]:
    """Whole-doc extraction. Applies the SAME shard split as the
    distributed path (stages/shard.py), runs phase A per shard, phase B on
    the concatenation — so pipeline output equals this per-doc function
    exactly (the golden-equality contract in tests/).
    Returns (template, output spans, n_shards)."""
    from ..functions.pdf_bytes import expand_pdf_spans
    from ..functions.pptx import expand_pptx_spans
    from ..functions.xlsx import expand_xlsx_spans
    from .shard import split_shards

    # raw-binary entry points: `pdf` payload spans become box spans,
    # `xlsx` payloads become `row` spans and `pptx` payloads become
    # `slide` spans before routing/sharding (no-op when none present —
    # the distributed router already expanded them so page/row/slide-
    # range sharding sees the parsed spans)
    spans = expand_pptx_spans(expand_xlsx_spans(expand_pdf_spans(spans)))
    base = route_template(spans)
    template = template or cfg.template_override or base
    # parsing (phase A) always follows the CONTENT (base) template; the
    # requested template only changes the phase-B chunking — mirroring the
    # reference where e.g. the `one` parser still runs the full PDF passes
    # (rag/app/one.py) before emitting a single chunk
    shards = split_shards(spans, base, cfg)
    parsed: list[dict] = []
    for sh in shards:
        parsed.extend(phase_a(base, sh, cfg))
    return template, phase_b(template, parsed, cfg, base=base), len(shards)


# --------------------------------------------------- map_batches stages ----

class ExtractFused:
    """Stateless-shaped but run as an actor pool: parses whole (unsharded)
    docs, phase A + B fused — the fast path that bypasses the reassembly
    shuffle entirely."""

    def __init__(self, cfg: ExtractConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..schemas import spans_column_to_pylists

        doc_ids = batch["doc_id"].to_pylist()
        spans_col = spans_column_to_pylists(batch["spans"])
        rows = []
        for doc_id, spans in zip(doc_ids, spans_col):
            template, out, n_shards = extract_doc(spans, self.cfg)
            rows.append({
                "doc_id": doc_id,
                "template": template,
                "spans": out,
                "n_input_spans": len(spans),
                "n_shards": n_shards,
            })
        return pa.Table.from_pylist(rows, schema=EXTRACTED_SCHEMA)


def _expand_pdf_ref(spans: list[dict], blob_fs=None) -> list[dict]:
    """Expand a page-range parse shard: a single ``pdf_ref`` span
    carrying (path, from, to) loads the staged blob — through the
    staging FILESYSTEM (``blob_fs``, pickled in from the driver; local
    when None), since the blob dir lives on shared storage on a real
    cluster — and parses ONLY its page range (boxes keep global page
    numbers, so shard concatenation equals the whole-doc parse;
    outlines ride with range 0 only). Non-ref shard rows pass through
    unchanged."""
    if len(spans) != 1 or spans[0]["kind"] != "pdf_ref":
        return spans
    import json as _json

    from ..functions.pdf_bytes import (make_toc_span, pdf_outlines,
                                       pdf_to_boxes)
    from ..schemas import finalize_offsets
    from ..state import fsio

    d = _json.loads(spans[0]["text"])
    raw = fsio.read_bytes((blob_fs, d["path"]) if blob_fs is not None
                          else d["path"])
    boxes = pdf_to_boxes(raw, d["from"], d["to"])
    toc = ([make_toc_span(t, lvl) for t, lvl in pdf_outlines(raw)]
           if d["from"] == 0 else [])
    return finalize_offsets(toc + boxes)


class ExtractShard:
    """Phase A over shard rows (SHARD_SCHEMA in/out); phase B happens after
    the groupby(doc_id) reassembly."""

    def __init__(self, cfg: ExtractConfig = DEFAULT_CONFIG, blob_fs=None):
        self.cfg = cfg
        self.blob_fs = blob_fs
        # same model slot as pass 1 (ExtractRouter): mega scanned PDFs
        # OCR their page ranges HERE, so the det/rec pair must be
        # available in this stage too
        # lazy per-process loads (see ExtractRouter): this instance is
        # pickled into tasks by reassemble_staged, so sessions must not
        # load on the driver or travel by pickle
        self.ocr = None
        self.layout = None
        self._onnx_weights = None
        self._models_ready = False
        if cfg.layout_recognize == "onnx":
            import os as _os

            self._onnx_weights = (cfg.onnx_dir
                                  or _os.environ.get("RAGFLOW_ONNX_DIR"))

    def _ensure_models(self) -> None:
        if self._models_ready or not self._onnx_weights:
            return
        from ..functions.vision_onnx import load_layout, load_ocr

        try:
            self.ocr = load_ocr(self._onnx_weights)
        except (FileNotFoundError, OSError):
            self.ocr = None
        try:
            self.layout = load_layout(self._onnx_weights)
        except (FileNotFoundError, OSError):
            self.layout = None
        self._models_ready = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure_models()
        if self.ocr is not None:
            from ..functions.glyphs import set_core_ocr

            set_core_ocr(self.ocr.ocr_binary)
        if self.layout is not None:
            from ..functions.pdfish import set_layout_model

            set_layout_model(self.layout.classify)
        try:
            return self._shard_batch(batch)
        finally:
            if self.ocr is not None:
                set_core_ocr(None)
            if self.layout is not None:
                set_layout_model(None)

    def _shard_batch(self, batch: pa.Table) -> pa.Table:
        from ..schemas import spans_column_to_pylists

        out_spans = []
        for template, spans in zip(batch["template"].to_pylist(),
                                   spans_column_to_pylists(batch["spans"])):
            try:
                spans = _expand_pdf_ref(spans, self.blob_fs)
                out_spans.append(phase_a(template, spans, self.cfg))
            except Exception:  # noqa: BLE001 — poison-shard containment
                # same contract as pass 1 (ExtractRouter): one malformed
                # shard must not kill the job; the empty shard keeps its
                # row so reassembly still emits the doc (partial)
                out_spans.append([])
        return batch.set_column(
            batch.schema.get_field_index("spans"), "spans",
            pa.array(out_spans, type=batch.schema.field("spans").type))


def make_reassembler(cfg: ExtractConfig = DEFAULT_CONFIG):
    """`map_groups` fn: shards of one doc (any order) → one extracted row."""
    import pandas as pd

    def reassemble(group: pd.DataFrame) -> pa.Table:
        group = group.sort_values("shard_id")
        spans: list[dict] = []
        for shard_spans in group["spans"]:
            spans.extend(spans_to_pylist(shard_spans))
        # shard rows carry the content (base) template; an override only
        # changes the phase-B chunking
        base = group["template"].iloc[0]
        template = cfg.template_override or base
        try:
            out = phase_b(template, spans, cfg, base=base)
        except Exception:  # noqa: BLE001 — poison-doc containment
            template, out = "error", []
        return pa.Table.from_pylist([{
            "doc_id": group["doc_id"].iloc[0],
            "template": template,
            "spans": out,
            "n_input_spans": int(group["n_input_spans"].iloc[0]),
            "n_shards": int(group["n_shards"].iloc[0]),
        }], schema=EXTRACTED_SCHEMA)

    return reassemble
