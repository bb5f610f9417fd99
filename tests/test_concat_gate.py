"""Fixture table for the 32-feature up/down concat gate
(functions/concat_gate.py), decisions hand-traced from the reference's
feature semantics (deepdoc/parser/pdf_parser.py:125-180,540-543):
continuation typography concatenates, sentence/bullet/table boundaries do
not. These fixtures FREEZE the gate's behavior — change the weights only
with a corresponding trace here."""

import pytest

from ragflow_core16_ray.functions.concat_gate import (LineGeom, match_proj,
                                                      should_concat,
                                                      updown_concat_features)


def _line(text, top=100.0, bot=120.0, x0=60.0, x1=540.0, page=0, lay="text",
          in_row=0):
    return LineGeom(text, x0, x1, top, bot, page, lay, in_row)


def _pair(up_text, down_text, up_kw=None, **down_kw):
    up = _line(up_text, **(up_kw or {}))
    down = _line(down_text, top=down_kw.pop("top", 130.0),
                 bot=down_kw.pop("bot", 150.0), **down_kw)
    return up, down


# (name, up_text, down_text, down_overrides, expected_concat)
# down_overrides may carry "up_kw": {...} to override the UP line too.
# Every decision below is hand-traced against the reference's feature
# math (deepdoc/parser/pdf_parser.py:125-180) and the rule threshold.
CASES = [
    # wrapped mid-sentence latin line → continues
    ("wrapped_latin", "The quick brown fox jumps over", "the lazy dog.",
     {}, True),
    # finished sentence, next starts a new one → break
    ("sentence_break", "It works correctly.", "Next point follows here.",
     {}, False),
    # CJK comma continuation (feature 9) → continues
    ("cjk_comma", "数据流处理管道，", "批处理继续执行。", {}, True),
    # CJK line without any ending punctuation → continues
    ("cjk_unfinished", "数据流批处理管道设计", "继续处理细节。", {}, True),
    # CJK sentence ender 。 → break
    ("cjk_sentence_break", "数据流处理完成。", "下一段开始。", {}, False),
    # down is a numbered bullet (the reference's _match_proj) → break
    ("bullet_down", "intro text continues here", "1. First item", {}, False),
    ("bullet_cjk", "前文继续", "第一章 概述", {}, False),
    # open paren in up, closed in down (feature 14) → continues
    ("paren_span", "as shown (see Figure", "3) in the text.", {}, True),
    # bare page-number-like numeric line (feature 19) → break
    ("numeric_down", "some unfinished line over", "123", {}, False),
    # vertical whitespace ≥ 2.5 line heights (feature 1) → break
    ("big_gap", "The quick brown fox jumps over", "the lazy dog.",
     {"top": 180.0, "bot": 200.0}, False),
    # layout class change (feature 3) → never concat
    ("layout_change", "body text without an ending", "A Title Line",
     {"lay": "title"}, False),
    # finished sentence + font-size jump → break
    ("font_jump", "It ends here.", "bigger font text",
     {"top": 130.0, "bot": 174.0}, False),
    # down starts with continuation punctuation (feature 10) on an
    # unfinished up → continues
    ("down_closing", "the value is stored", "，然后继续", {}, True),
    # ---- column wrap (feature 21 territory: up below/right of down) ----
    # mid-clause comma at the bottom of the left column continues at the
    # top of the right column despite the upward y jump
    ("colwrap_comma_continues", "数据继续处理，", "下一列顶部继续",
     {"up_kw": {"x0": 50, "x1": 280, "top": 400.0, "bot": 420.0},
      "x0": 320, "x1": 540, "top": 100.0, "bot": 120.0}, True),
    # a finished sentence does NOT leak across the column wrap
    ("colwrap_sentence_breaks", "数据处理完成。", "新段落开始",
     {"up_kw": {"x0": 50, "x1": 280, "top": 400.0, "bot": 420.0},
      "x0": 320, "x1": 540, "top": 100.0, "bot": 120.0}, False),
    # ---- font-size change (feature 22) ----
    # strong continuation (comma) survives a 2.2× line-height jump
    ("font_jump_comma_continues", "前半句仍在继续，", "较大字号的后半句",
     {"top": 130.0, "bot": 174.0}, True),
    # weak continuation + font jump + big gap → break
    ("font_jump_with_gap_breaks", "a heading-ish lead…", "Bigger follows",
     {"top": 160.0, "bot": 204.0}, False),
    # ---- in-row counts (features 28/29) ----
    # both lines sit in multi-box rows (table-ish) with neutral text → break
    ("inrow_cells_break", "VALUE", "NEXT",
     {"up_kw": {"in_row": 2}, "in_row": 2}, False),
    # identical text/geometry without the in-row signal → continues
    ("inrow_zero_continues", "VALUE", "NEXT", {}, True),
    # one side in a multi-box row is enough (max of the two, feature 28)
    ("inrow_asymmetric_breaks", "VALUE", "NEXT", {"in_row": 3}, False),
    # ---- CJK continuation punctuation (feature 9 variants) ----
    ("cjk_colon_continues", "配置如下：", "排序与分组设置", {}, True),
    ("cjk_enum_comma_continues", "包括排序、", "过滤和分组。", {}, True),
    # down starting with a closing quote (feature 10) rides the dialogue
    ("cjk_quote_close_continues", "他说", "”不行。", {}, True),
    # latin hyphenation wrap: '-' is continuation punctuation
    ("hyphen_wrap_continues", "a well-known pro-", "cessing engine", {}, True),
    # percent figure alone on the next line is a table-ish break (fea 19)
    ("numeric_percent_breaks", "growth rate was", "42.5%", {}, False),
    # ---- horizontal gap / indent jump (feature 23) ----
    # far x-distance + neutral caps tail → break
    ("xgap_caps_breaks", "ENDS IN CAPS HERE NOW AND MORE PADDING TEXT",
     "tail", {"x0": 700, "x1": 740}, False),
    # same geometry but a lowercase tail tips it to continue
    ("xgap_lower_continues", "ends in lower case tail with padding text",
     "tail", {"x0": 700, "x1": 740}, True),
]


@pytest.mark.parametrize("name,up,down,kw,expected",
                         CASES, ids=[c[0] for c in CASES])
def test_gate_fixture(name, up, down, kw, expected):
    kw = dict(kw)
    up_kw = kw.pop("up_kw", None)
    u, d = _pair(up, down, up_kw=up_kw, **kw)
    assert should_concat(u, d) is expected


def test_feature_vector_shape_and_indices():
    u, d = _pair("ends with, comma tail", "closing text here.")
    fea = updown_concat_features(u, d)
    assert len(fea) == 32
    assert fea[0] is True                 # row ids equal (text flow)
    assert fea[2] == 0                    # same page
    assert fea[3] is True and fea[4] is True and fea[5] is True
    assert fea[6] is False and fea[7] is False  # neither is a table
    assert fea[12] == fea[13]             # reference duplicates 12 as 13
    assert isinstance(fea[1], float) and isinstance(fea[23], float)


def test_feature_sentence_and_continuation_punct():
    u, d = _pair("it ends here.", "And continues.")
    fea = updown_concat_features(u, d)
    assert fea[8] is True                 # [a-z]\.$ matches
    assert fea[9] is False
    u2, d2 = _pair("前半句，", "后半句。")
    fea2 = updown_concat_features(u2, d2)
    assert fea2[8] is False
    assert fea2[9] is True                # ，$ matches


def test_match_proj_taxonomy():
    assert match_proj("第三章 总则")
    assert match_proj("（12）子项")
    assert match_proj("3.1、嵌套")
    assert not match_proj("plain prose line")
    assert not match_proj("3.14159 is pi")


def test_column_wrap_feature():
    # up sits right of down (up ends a right column, down starts the next
    # left column) → feature 21
    u = _line("right column tail", x0=320, x1=540)
    d = _line("left column head", x0=50, x1=280, top=100, bot=120)
    assert updown_concat_features(u, d)[21] is True


def _score_from_vector(fea):
    """The rule threshold expressed over the full 32-feature vector —
    the spec should_concat's fast path must stay decision-equivalent to."""
    if not fea[3] or fea[15]:
        return False
    score = 0
    score += 1 if not fea[8] else -3
    score += 3 if fea[9] else 0
    score += 2 if fea[10] else 0
    score += 4 if fea[14] else 0
    score += 1 if fea[18] else 0
    score -= 1 if fea[16] and fea[8] else 0
    score -= 2 if fea[19] else 0
    if fea[1] > 2.5:
        score -= 2
    if fea[1] < -0.5:
        score -= 3
    if fea[23] > 8:
        score -= 1
    if fea[22] > 0.5:
        score -= 1
    if fea[28] >= 2:
        score -= 1
    return score > 0


def test_gate_uses_feature_vector():
    # the tokenize-free fast path in should_concat must match the
    # vector-based scoring on every fixture pair AND on a geometry sweep
    pairs = []
    for c in CASES:
        kw = dict(c[3])
        pairs.append(_pair(c[1], c[2], up_kw=kw.pop("up_kw", None), **kw))
    for dy in (5.0, 25.0, 80.0, -40.0):
        for lay in ("text", "table"):
            for txt in ("continues without end", "Ends here.", "第 3 页"):
                pairs.append((_line("an unfinished leading line"),
                              _line(txt, top=120 + dy, bot=140 + dy,
                                    lay=lay, in_row=2)))
    for u, d in pairs:
        assert should_concat(u, d) == _score_from_vector(
            updown_concat_features(u, d)), (u.text, d.text)
