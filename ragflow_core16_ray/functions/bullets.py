"""Bullet/heading taxonomies + hierarchical chunking.

From-scratch implementation of the reference behaviors:
- bullet-pattern families & voting (rag/nlp/__init__.py:168-224
  BULLET_PATTERN / bullets_category): the family whose patterns match the
  most *distinct levels* (ties → most total hits) wins;
- hierarchical merge (rag/nlp/__init__.py:420-507 hierarchical_merge):
  chunks = deepest-heading groups prefixed with their ancestor headings;
- colon-title promotion (rag/nlp/__init__.py:368-387 make_colon_as_title);
- title-level frequency pivot (rag/nlp/__init__.py:390-409
  title_frequency) for the paper template;
- ToC removal for plain-text docs (rag/nlp/__init__.py:336-365
  remove_contents_table).

All pure functions over lists of section strings.
"""

from __future__ import annotations

import re

# Each family is an ordered list of level patterns (level = list index).
BULLET_FAMILIES: list[list[re.Pattern]] = [
    # 0: English book style
    [
        re.compile(r"^Chapter\s+\d+[\.\s]", re.I),
        re.compile(r"^\d+\.\d+\s+\S"),
        re.compile(r"^\([a-z]\)\s+\S"),
    ],
    # 1: CJK legal/book style
    [
        re.compile(r"^第[零一二三四五六七八九十百0-9]+章"),
        re.compile(r"^第[零一二三四五六七八九十百0-9]+节"),
        re.compile(r"^[一二三四五六七八九十]+、"),
        re.compile(r"^（[一二三四五六七八九十]+）"),
    ],
    # 2: plain numeric outline
    [
        re.compile(r"^\d+\s+\S"),
        re.compile(r"^\d+\.\d+\s+\S"),
        re.compile(r"^\d+\.\d+\.\d+\s+\S"),
    ],
]


# every pattern above is start-anchored with a known literal first-char
# class; a section whose first char is outside this set can match nothing,
# so the vote skips it without touching a regex (the common case)
_BULLET_FIRST_CHARS = frozenset("0123456789Cc(第（一二三四五六七八九十")


def bullets_category(sections: list[str]) -> int:
    """Pick the bullet family: most distinct matched levels, then most
    total hits; -1 if nothing matches."""
    candidates = [s for s in sections if s and s[0] in _BULLET_FIRST_CHARS]
    best, best_key = -1, (0, 0)
    for fi, fam in enumerate(BULLET_FAMILIES):
        levels = set()
        hits = 0
        for s in candidates:
            for li, pat in enumerate(fam):
                if pat.match(s):
                    levels.add(li)
                    hits += 1
                    break
        key = (len(levels), hits)
        if key > best_key:
            best, best_key = fi, key
    return best


def line_level(text: str, family: int) -> int:
    """Heading level of a line under a family; -1 = content."""
    if family < 0 or not text or text[0] not in _BULLET_FIRST_CHARS:
        return -1
    for li, pat in enumerate(BULLET_FAMILIES[family]):
        if pat.match(text):
            return li
    return -1


_CJK_DIGITS = {"零": 0, "一": 1, "二": 2, "三": 3, "四": 4, "五": 5,
               "六": 6, "七": 7, "八": 8, "九": 9}
_ROMAN = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100}


def index_int(text: str) -> int:
    """Heading index → int: arabic, CJK numerals (十/百 composition) or
    roman (role of rag/nlp/__init__.py:132-147 index_int; cn2an /
    word2number are absent so the core cases are hand-rolled).
    Returns -1 when unparseable."""
    t = text.strip().lower()
    if t.isdigit():
        return int(t)
    if t and all(c in _CJK_DIGITS or c in "十百" for c in t):
        total, num = 0, 0
        for c in t:
            if c in _CJK_DIGITS:
                num = _CJK_DIGITS[c]
            elif c == "十":
                total += (num or 1) * 10
                num = 0
            else:  # 百
                total += (num or 1) * 100
                num = 0
        return total + num
    if t and all(c in _ROMAN for c in t):
        vals = [_ROMAN[c] for c in t]
        return sum(-v if i + 1 < len(vals) and v < vals[i + 1] else v
                   for i, v in enumerate(vals))
    return -1


# Question-numbering taxonomy for the PDF Q/A mode (role of
# rag/nlp/__init__.py:74-86 QUESTION_PATTERN + :151-165 qbullets_category).
# One flat family list: unlike section bullets there is no level hierarchy —
# a question list uses a single numbering convention throughout.
_CJK_NUM = "[零一二三四五六七八九十百0-9]"
QBULLET_FAMILIES: list[re.Pattern] = [
    re.compile(rf"^第{_CJK_NUM}+问"),
    re.compile(rf"^第{_CJK_NUM}+条"),
    re.compile(r"^[（(][零一二三四五六七八九十百]+[)）]"),
    re.compile(r"^\d{1,2}[.、]\s*"),
    re.compile(r"^[（(]\d{1,2}[)）]"),
    re.compile(r"^[零一二三四五六七八九十百]+、"),
    re.compile(r"^(?:QUESTION|Q)[\s.]*\d+", re.I),
    re.compile(r"^QUESTION\s+(?:[IVX]+|ONE|TWO|THREE|FOUR|FIVE|SIX|SEVEN"
               r"|EIGHT|NINE|TEN)\b", re.I),
]


def qbullets_category(lines: list[str]) -> int:
    """Vote the question-numbering convention: the pattern matching the
    most lines wins; -1 when no pattern reaches TWO hits (one stray
    numbered line must not hijack the doc into Q-bullet mode — the
    caller falls back to the generic ?-suffix pairing)."""
    best, best_hits = -1, 1
    for fi, pat in enumerate(QBULLET_FAMILIES):
        hits = sum(1 for s in lines if pat.match(s.strip()))
        if hits > best_hits:
            best, best_hits = fi, hits
    return best


_COLON_RE = re.compile(r"^([^:：\n]{2,40})[:：]\s*(\S.{19,})$", re.DOTALL)


def make_colon_as_title(sections: list[str]) -> list[str]:
    """'Short prefix: long text' → synthesize a title line before the text
    (semantics of rag/nlp/__init__.py:368-387)."""
    out: list[str] = []
    for s in sections:
        m = _COLON_RE.match(s)
        if m:
            out.append(m.group(1).strip())
            out.append(m.group(2).strip())
        else:
            out.append(s)
    return out


_TOC_HEAD_RE = re.compile(r"^\s*(contents|table of contents|目\s*录|目次)\s*$", re.I)
_TOC_LINE_RE = re.compile(r"[\.…·]{4,}\s*\d+\s*$")


def remove_contents_table(sections: list[str]) -> list[str]:
    """Drop a 'Contents' heading and its dotted-leader lines
    (rag/nlp/__init__.py:336-365 behavior, deterministic subset)."""
    out: list[str] = []
    i = 0
    n = len(sections)
    while i < n:
        if _TOC_HEAD_RE.match(sections[i]):
            i += 1
            while i < n and _TOC_LINE_RE.search(sections[i]):
                i += 1
            continue
        out.append(sections[i])
        i += 1
    return out


def title_frequency(sections: list[str], family: int) -> tuple[int, list[int]]:
    """(most frequent heading level, per-section levels) — the paper
    template's pivot (rag/nlp/__init__.py:390-409)."""
    levels = [line_level(s, family) for s in sections]
    from collections import Counter

    c = Counter(l for l in levels if l >= 0)
    most = c.most_common(1)[0][0] if c else -1
    return most, levels


def hierarchical_merge(sections: list[str], family: int,
                       max_depth: int = 5) -> list[str]:
    """Group content under its deepest heading; each chunk = ancestor
    heading path + heading + content lines (newline-joined). Content before
    any heading forms its own leading chunk."""
    chunks: list[str] = []
    stack: list[tuple[int, str]] = []  # (level, heading)
    buf: list[str] = []

    def flush():
        nonlocal buf
        if not buf:
            return
        path = [h for _, h in stack[:max_depth]]
        chunks.append("\n".join([*path, "\n".join(buf)]))
        buf = []

    for s in sections:
        lvl = line_level(s, family)
        if lvl < 0:
            buf.append(s)
            continue
        flush()
        while stack and stack[-1][0] >= lvl:
            stack.pop()
        stack.append((lvl, s))
    flush()
    return chunks
