r"""Up/down cross-line concat gate — the reference's 32-feature vector with
a deterministic rule threshold.

The reference scores every candidate (up, down) box pair with an XGBoost
booster over 32 handcrafted features (deepdoc/parser/pdf_parser.py:125-180
``_updown_concat_features``, applied at :540-543 inside ``_concat_downward``).
The booster weights are an external binary, so this module reimplements the
FEATURE VECTOR faithfully and replaces the booster with a transparent
integer-weighted rule (``should_concat``) whose decisions are frozen by the
fixture table in tests/test_concat_gate.py — the "implement the 32 features
+ rule threshold" plan from SURVEY.md §7.

Feature-by-feature mapping (indices = the reference's list order):

 0  same table-row id                 (up.R == down.R; our IR keeps table
                                       cells out of the text flow, so both
                                       sides are always row-less → True)
 1  y-gap / max line height
 2  page delta
 3  same layout type
 4  up is body text                   5  down is body text
 6  up is table                       7  down is table
 8  up ends a sentence                ([。？！；!?;+)）] or "a-z.")
 9  up ends with continuation punct   ([，：‘“、0-9（+-])
10  down starts with closing punct    (^.?[/,?;:\]，。；：'"？！》】）-])
11  up is a fully-parenthesized line
12  up has a comma with no period after it        (13 duplicates 12,
                                                   faithfully)
14  up opens a paren that down closes
15  down matches a bullet/projection pattern      (_match_proj)
16  down starts with an uppercase letter
17  up ends with an uppercase letter
18  up ends with lowercase/digit
19  down is purely numeric/percent
20  last-2-chars of up == last-2 of down
21  up starts right of down's end (column wrap)
22  height ratio gap
23  x-distance / max char width
24  relative length difference
25  boundary token fusion count       (len(tks_all)-len(tks_up)-len(tks_down))
26  token count asymmetry
27  boundary tokens equal
28  max in-row count                  29  in-row count difference
30  down's first token is a single noun   (needs the reference's POS dict;
31  up's last token is a single noun       substituted with a deterministic
                                          heuristic: alphabetic, >3 chars,
                                          not a function word)

All text features operate on the reference's 6-char boundary windows using
our tokenizer (functions/tokenizer.py) in place of rag_tokenizer.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .tokenizer import tokenize

# the reference's bullet/projection taxonomy (_match_proj,
# pdf_parser.py:112-123) re-expressed
_PROJ_PATTERNS = (
    r"第[零一二三四五六七八九十百]+章",
    r"第[零一二三四五六七八九十百]+[条节]",
    r"[零一二三四五六七八九十百]+[、是 　]",
    r"[\(（][零一二三四五六七八九十百]+[）\)]",
    r"[\(（][0-9]+[）\)]",
    r"[0-9]+(、|\.[　 ]|）|\.[^0-9./a-zA-Z_%><-]{4,})",
    r"[0-9]+\.[0-9.]+(、|\.[ 　])",
    r"[⚫•➢①② ]",
)
_PROJ_RES = tuple(re.compile(p) for p in _PROJ_PATTERNS)
# one alternation is match-equivalent to any(p.match): for anchored
# match, success of the ordered alternation == success of any member;
# this runs once per line pair in the pdfish hot loop
_PROJ_COMBINED = re.compile("|".join(f"(?:{p})" for p in _PROJ_PATTERNS))

_SENT_END = re.compile(r"([。？！；!?;+)）]|[a-z]\.)$")
_CONT_END = re.compile(r"[，：‘“、0-9（+-]$")
_DOWN_CLOSE = re.compile(r"(^.?[/,?;:\]，。；：’”？！》】）-])")
_PAREN_LINE = re.compile(r"[\(（][^\(\)（）]+[）\)]$")
_COMMA_TAIL = re.compile(r"[，,][^。.]+$")
_PAREN_OPEN = re.compile(r"[\(（][^\)）]+$")
_PAREN_CLOSE = re.compile(r"[\)）]")
_UPPER = re.compile(r"[A-Z]")
_LOWER_DIGIT = re.compile(r"[a-z0-9]")
_NUMERIC = re.compile(r"[0-9.%,-]+$")
_ALPHA_WORD = re.compile(r"^[A-Za-z]{4,}$")
_FUNCTION_WORDS = frozenset(
    "the and for with from that this have been will would could into"
    " over under about their there which while".split())


def match_proj(text: str) -> bool:
    return _PROJ_COMBINED.match(text) is not None


@dataclass
class LineGeom:
    """The geometry slice of a text box the gate needs (page-local
    coordinates, matching functions/pdfish.py Box fields)."""
    text: str
    x0: float
    x1: float
    top: float
    bot: float
    page: int
    lay: str
    in_row: int = 0
    # lazy regex-feature bundles: in a merge chain every line is scored
    # once as `down` (pair i) and once as `up` (pair i+1); memoizing per
    # line halves the gate's regex work when the caller reuses the object
    _up_feats: tuple | None = field(default=None, repr=False, compare=False)
    _down_feats: tuple | None = field(default=None, repr=False, compare=False)

    @property
    def height(self) -> float:
        return max(self.bot - self.top, 1e-6)

    @property
    def char_width(self) -> float:
        return (self.x1 - self.x0) / max(len(self.text), 1)

    def up_feats(self) -> tuple:
        """(sent_end, cont_end, paren_open, last_is_lower_digit)."""
        f = self._up_feats
        if f is None:
            ut = self.text
            f = (bool(_SENT_END.search(ut)), bool(_CONT_END.search(ut)),
                 bool(_PAREN_OPEN.search(ut)),
                 bool(ut and _LOWER_DIGIT.match(ut[-1])))
            self._up_feats = f
        return f

    def down_feats(self) -> tuple:
        """(is_proj, down_close, paren_close, upper_start, numeric)."""
        f = self._down_feats
        if f is None:
            dt = self.text
            f = (_PROJ_COMBINED.match(dt) is not None,
                 bool(_DOWN_CLOSE.search(dt)), bool(_PAREN_CLOSE.search(dt)),
                 bool(_UPPER.match(dt)), bool(_NUMERIC.match(dt)))
            self._down_feats = f
        return f


def _nounish(token: str) -> bool:
    """Deterministic stand-in for rag_tokenizer.tag(t).find('n') >= 0 (the
    POS dict is reference-internal): a standalone alphabetic content word."""
    return bool(_ALPHA_WORD.match(token)) and token.lower() not in _FUNCTION_WORDS


def updown_concat_features(up: LineGeom, down: LineGeom) -> list:
    """The reference's 32-entry feature vector
    (pdf_parser.py:125-180), computed deterministically."""
    w = max(up.char_width, down.char_width)
    h = max(up.height, down.height)
    y_dis = (down.top + down.bot - up.top - up.bot) / 2
    x_dis = min(abs(up.x1 - down.x0), abs(up.x0 - down.x1),
                abs(up.x0 + up.x1 - down.x0 - down.x1) / 2)
    LEN = 6
    # tokenize the RAW boundary windows — the reference strips only when
    # building the joint string (pdf_parser.py:137-141
    # rag_tokenizer.tokenize(down['text'][:LEN])), and a window ending in
    # whitespace must count the same tokens it would there
    tks_down = tokenize(down.text[:LEN])
    tks_up = tokenize(up.text[-LEN:])
    joint = up.text[-LEN:].strip()
    if up.text and down.text and re.match(
            r"[a-zA-Z0-9]+", up.text[-1] + down.text[0]):
        joint += " "
    joint += down.text[:LEN].strip()
    tks_all = tokenize(joint)
    ut, dt = up.text, down.text
    return [
        True,                                             # 0: same row id
        y_dis / h,                                        # 1
        down.page - up.page,                              # 2
        up.lay == down.lay,                               # 3
        up.lay == "text",                                 # 4
        down.lay == "text",                               # 5
        up.lay == "table",                                # 6
        down.lay == "table",                              # 7
        bool(_SENT_END.search(ut)),                       # 8
        bool(_CONT_END.search(ut)),                       # 9
        bool(_DOWN_CLOSE.search(dt)),                     # 10
        bool(_PAREN_LINE.match(ut)),                      # 11
        bool(_COMMA_TAIL.search(ut)),                     # 12
        bool(_COMMA_TAIL.search(ut)),                     # 13 (ref dupes 12)
        bool(_PAREN_OPEN.search(ut) and _PAREN_CLOSE.search(dt)),  # 14
        match_proj(dt),                                   # 15
        bool(_UPPER.match(dt)),                           # 16
        bool(ut and _UPPER.match(ut[-1])),                # 17
        bool(ut and _LOWER_DIGIT.match(ut[-1])),          # 18
        bool(_NUMERIC.match(dt)),                         # 19
        (ut.strip()[-2:] == dt.strip()[-2:]
         if len(ut.strip()) > 1 and len(dt.strip()) > 1 else False),  # 20
        up.x0 > down.x1,                                  # 21
        abs(up.height - down.height) / min(up.height, down.height),  # 22
        x_dis / max(w, 1e-6),                             # 23
        (len(ut) - len(dt)) / max(len(ut), len(dt), 1),   # 24
        len(tks_all) - len(tks_up) - len(tks_down),       # 25
        len(tks_down) - len(tks_up),                      # 26
        (tks_down[-1] == tks_up[-1]) if tks_down and tks_up else False,  # 27
        max(down.in_row, up.in_row),                      # 28
        abs(down.in_row - up.in_row),                     # 29
        len(tks_down) == 1 and _nounish(tks_down[0]),     # 30
        len(tks_up) == 1 and _nounish(tks_up[0]),         # 31
    ]


def should_concat(up: LineGeom, down: LineGeom) -> bool:
    """Deterministic threshold over the feature vector, replacing the
    booster's predict() <= 0.5 gate (pdf_parser.py:540-543). Weights are
    hand-set to reproduce the booster's *decisions* on the fixture table
    (tests/test_concat_gate.py) — continuation typography concatenates,
    sentence/bullet/table boundaries do not.

    Hot path note: only the geometry/regex features participate in the
    rule threshold, so they are computed directly here; the token-overlap
    features (25-27, 30-31 — booster-only signal we cannot weight without
    the trained model) live in :func:`updown_concat_features`, which this
    MUST stay decision-equivalent to on the fixture table (asserted by
    tests/test_concat_gate.py::test_gate_uses_feature_vector). This runs
    once per adjacent line pair of every PDF page — it was ~half of
    pdfish parse time when it tokenized."""
    if up.lay != down.lay:         # fea[3]: layout type change, never concat
        return False
    proj, down_close, paren_close, upper_start, numeric = down.down_feats()
    if proj:                       # fea[15]: down starts a bullet/number
        return False
    sent_end, cont_end, paren_open, last_lower_digit = up.up_feats()
    h = max(up.height, down.height)
    y_rel = ((down.top + down.bot - up.top - up.bot) / 2) / h  # fea[1]
    score = 0
    score += 1 if not sent_end else 0  # unfinished sentence continues (fea[8])
    score -= 3 if sent_end else 0      # up ended a sentence
    score += 3 if cont_end else 0      # fea[9]: mid-clause
    score += 2 if down_close else 0    # fea[10]: closing punct
    score += 4 if (paren_open and paren_close) else 0  # fea[14]
    score += 1 if last_lower_digit else 0              # fea[18]
    score -= 1 if (upper_start and sent_end) else 0    # fea[16]&[8]
    score -= 2 if numeric else 0       # fea[19]: bare number
    if y_rel > 2.5:                # vertical whitespace ≥ ~2.5 line heights
        score -= 2
    if y_rel < -0.5:               # down sits ABOVE up: a column/flow break
        score -= 3                 # (the reference's Y-sorted dfs never
                                   # descends upward; our column-major
                                   # stream can, so gate it explicitly)
    x_dis = min(abs(up.x1 - down.x0), abs(up.x0 - down.x1),
                abs(up.x0 + up.x1 - down.x0 - down.x1) / 2)
    if x_dis / max(max(up.char_width, down.char_width), 1e-6) > 8:
        score -= 1                 # fea[23]: horizontal gap / indent jump
    if abs(up.height - down.height) / min(up.height, down.height) > 0.5:
        score -= 1                 # fea[22]: strong font-size change
    if max(down.in_row, up.in_row) >= 2:
        score -= 1                 # fea[28]: both lines in multi-box rows
    return score > 0
