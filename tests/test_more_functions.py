"""Tests for TXT/JSON splitters, the positional tag codec, and the
one/qa chunking templates."""

import json

from ragflow_core16_ray.config import ExtractConfig
from ragflow_core16_ray.functions.postag import (encode_tag, parse_tags,
                                                 strip_tags)
from ragflow_core16_ray.functions.txt_json import (json_split,
                                                   parse_delimiters,
                                                   txt_split)
from ragflow_core16_ray.schemas import make_span
from ragflow_core16_ray.stages.extract import extract_doc


def test_parse_delimiters_backticks():
    assert parse_delimiters("\n!?`##`") == ["##", "\n", "!", "?"]
    assert parse_delimiters("?!\n`##`") == ["##", "\n", "!", "?"]


def test_txt_split_multichar_delim():
    chunks = txt_split("part one##part two##part three",
                       chunk_token_num=2, delimiter="`##`")
    assert chunks == ["part one##", "part two##", "part three"]


def test_txt_split_budget_merge():
    chunks = txt_split("a.b.c.d", chunk_token_num=100, delimiter=".")
    assert chunks == ["a.b.c.d"]


def test_json_split_small_passthrough():
    assert json_split({"a": 1}) == ['{"a": 1}']


def test_json_split_large_dict():
    obj = {f"k{i}": "x" * 50 for i in range(20)}
    chunks = json_split(obj, max_size=200)
    assert len(chunks) > 1
    merged = {}
    for c in chunks:
        merged.update(json.loads(c))
    assert merged == obj


def test_json_split_nested_list():
    obj = {"items": [{"v": "y" * 80} for _ in range(10)]}
    chunks = json_split(obj, max_size=150)
    assert all(len(c) <= 200 for c in chunks)
    assert sum("y" in c for c in chunks) >= 5


def test_postag_roundtrip():
    tag = encode_tag(3, 10.0, 20.0, 30.5, 40.25)
    text = f"hello{tag}world"
    assert strip_tags(text) == "helloworld"
    assert parse_tags(text) == [(3, 10.0, 20.0, 30.5, 40.2)]


def test_template_one():
    spans = [make_span("text", "First line.", offset=0),
             make_span("text", "Second line.", offset=1)]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="one"))
    assert tmpl == "one"
    assert [s["text"] for s in out] == ["First line.\nSecond line."]


def test_template_qa():
    spans = [make_span("text", "Intro line dropped.", offset=0),
             make_span("text", "What is a shard?", offset=1),
             make_span("text", "A unit of parallel work.", offset=2),
             make_span("text", "Q2: How many?", offset=3),
             make_span("text", "Twelve pages each.", offset=4)]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="qa"))
    assert tmpl == "qa"
    assert [(s["kind"], s["text"]) for s in out] == [
        ("qa", "What is a shard?\nA unit of parallel work."),
        ("qa", "Q2: How many?\nTwelve pages each."),
    ]


def test_codec_sniff():
    from ragflow_core16_ray.functions.codec import get_text, sniff_codec

    assert sniff_codec("hello".encode()) == "utf-8"
    assert sniff_codec("数据".encode("utf-8")) == "utf-8"
    assert get_text("caf\xe9".encode("latin-1")) == "café"
    assert get_text(b"\xef\xbb\xbfhi") == "hi"


def test_index_int():
    from ragflow_core16_ray.functions.bullets import index_int

    assert index_int("12") == 12
    assert index_int("十") == 10
    assert index_int("二十三") == 23
    assert index_int("一百零五") == 105
    assert index_int("iv") == 4
    assert index_int("xii") == 12
    assert index_int("?!") == -1


def _pdf_box(t, page, top, lay, x0=60):
    import json

    return make_span("box", json.dumps(
        {"t": t, "x0": x0, "x1": x0 + 480, "top": top, "bot": top + 20,
         "page": page, "lay": lay}, sort_keys=True))


def test_template_paper():
    spans = [
        _pdf_box("A Study Of Shards", 0, 60, "title"),
        _pdf_box("Abstract", 0, 100, "title"),
        _pdf_box("We study sharding.", 0, 140, "text"),
        _pdf_box("Introduction", 0, 200, "title"),
        _pdf_box("Body sentence one.", 0, 240, "text"),
        _pdf_box("Body sentence two.", 0, 300, "text"),
    ]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="paper"))
    assert tmpl == "paper"
    assert [(s["kind"], s["text"]) for s in out] == [
        ("title", "A Study Of Shards"),
        ("abstract", "Abstract\nWe study sharding."),
        ("section", "Introduction\nBody sentence one.\nBody sentence two."),
    ]


def test_pdfish_extra_titles_demoted_in_naive():
    spans = [
        _pdf_box("Doc Title", 0, 60, "title"),
        _pdf_box("Second Heading", 0, 200, "title"),
        _pdf_box("Some text.", 0, 240, "text"),
    ]
    tmpl, out, _ = extract_doc(spans, ExtractConfig())
    assert tmpl == "pdfish"
    assert out[0]["kind"] == "title"
    assert all(s["kind"] == "section" for s in out[1:])

def test_template_qa_markdown_mode():
    # rag/app/qa.py:413-447: heading stack forms the question path; code
    # blocks shield '#'; empty-answer headings emit nothing on their own
    md = [
        "# Guide",
        "## What is a shard?",
        "A unit of parallel work.",
        "```",
        "# not a heading",
        "```",
        "## Sizing",
        "### How many pages?",
        "Twelve pages each.",
        "## Reset level",
        "Back at level two.",
    ]
    spans = [make_span("md", line, offset=i) for i, line in enumerate(md)]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="qa"))
    assert tmpl == "qa"
    assert [(s["kind"], s["text"]) for s in out] == [
        ("qa", "Guide\nWhat is a shard?\nA unit of parallel work.\n```\n"
               "# not a heading\n```"),
        ("qa", "Guide\nSizing\nHow many pages?\nTwelve pages each."),
        ("qa", "Guide\nReset level\nBack at level two."),
    ]


def test_template_qa_two_column_mode():
    # rag/app/qa.py:36-77 Excel semantics: first two non-empty cells are
    # (q, a); deformed rows are skipped; no header convention
    rows = ["What is Ray?\tA compute engine.\textra ignored",
            "only one cell",
            "\tWhat about empties?\tSkips blank cells."]
    spans = [make_span("row", r, offset=i) for i, r in enumerate(rows)]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="qa"))
    assert tmpl == "qa"
    assert [(s["kind"], s["text"]) for s in out] == [
        ("qa", "What is Ray?\nA compute engine."),
        ("qa", "What about empties?\nSkips blank cells."),
    ]


def _pdf_textbox(text, page, top):
    d = {"t": text, "x0": 60.0, "x1": 540.0, "top": float(top),
         "bot": float(top + 20), "page": page, "lay": "text"}
    return make_span("box", json.dumps(d, sort_keys=True))


def test_template_qa_pdf_mode():
    # rag/app/qa.py:103-170 Pdf + rag/nlp qbullets_category: vote one
    # question-numbering family, then bullet lines open questions, other
    # lines extend answers, tables fold into the open answer, preamble
    # before the first bullet is dropped.
    def tbox(text, page, top, row):
        d = {"t": text, "x0": 60.0, "x1": 170.0, "top": float(top),
             "bot": float(top + 20), "page": page, "lay": "table",
             "row": row, "col": 0, "tno": 0}
        return make_span("box", json.dumps(d, sort_keys=True))

    spans = [
        _pdf_textbox("Exam preamble, not a question.", 0, 100),
        _pdf_textbox("1. What is a shard?", 0, 200),
        _pdf_textbox("A unit of parallel work.", 0, 300),
        tbox("eight pages", 0, 400, 0),
        _pdf_textbox("2. How many pages? Twelve pages each.", 0, 500),
    ]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="qa"))
    assert tmpl == "qa"
    qa = [(s["kind"], s["text"]) for s in out if s["kind"] == "qa"]
    assert qa == [
        ("qa", "1. What is a shard?\nA unit of parallel work.\neight pages"),
        ("qa", "2. How many pages?\nTwelve pages each."),
    ]


def test_qbullets_category_vote():
    from ragflow_core16_ray.functions.bullets import qbullets_category

    # arabic "N." outnumbers the single parenthesized line -> family 3
    assert qbullets_category(
        ["1. first?", "2. second?", "(3) other"]) == 3
    assert qbullets_category(["no bullets here", "plain text"]) == -1
    assert qbullets_category(["第一问 什么?", "第二问 为何?"]) == 0


def test_template_one_table_doc():
    # one.py:94-97: an excel/table doc under the `one` template becomes a
    # SINGLE chunk containing the whole sheet, not per-row chunks
    spans = [make_span("row", "a\tb", offset=0),
             make_span("row", "1\t2", offset=1),
             make_span("row", "3\t4", offset=2)]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="one"))
    assert tmpl == "one"
    assert len([s for s in out if s["kind"] == "section"]) == 1
    sec = out[0]["text"]
    assert "a_long:1" in sec and "a_long:3" in sec


def test_plain_text_layout_mode():
    # layout_recognize="plain" (rag/app/naive.py:282-299 PlainParser):
    # raw lines in input order; no hf-removal, no reordering, no tables
    spans = [
        _pdf_textbox("Second visually.", 0, 500),
        _pdf_textbox("First visually.", 0, 100),
    ]
    tmpl, out, _ = extract_doc(
        spans, ExtractConfig(layout_recognize="plain", chunk_token_num=1))
    assert tmpl == "pdfish"
    texts = "\n".join(s["text"] for s in out)
    # input order preserved (no Y-sort), both lines present
    assert texts.index("Second visually.") < texts.index("First visually.")


def test_qa_table_sharding_no_header_duplication():
    # Regression: the table shard splitter copies the header row into
    # every shard for type re-voting, but the qa excel mode has no header
    # convention — a sharded qa table must yield exactly one pair per row
    spans = [make_span("row", f"q{i}?\ta{i}", offset=i) for i in range(40)]
    sharded = ExtractConfig(template_override="qa",
                            shard_span_threshold=8, table_shard_rows=10)
    tmpl, out, n_shards = extract_doc(spans, sharded)
    assert tmpl == "qa" and n_shards > 1
    qa = [s["text"] for s in out if s["kind"] == "qa"]
    assert len(qa) == 40
    assert qa[0] == "q0?\na0" and qa[-1] == "q39?\na39"
    _, unsharded, _ = extract_doc(spans, ExtractConfig(template_override="qa"))
    assert [s["text"] for s in unsharded if s["kind"] == "qa"] == qa


def test_bimm_segmentation_parity_fixtures():
    """Authored CJK segmentation fixtures pinning the BiMM tokenizer
    (role of rag/nlp/rag_tokenizer.py:217-263 fw/bw max-match + :119-167
    disambiguation): lexicon edits or matcher changes that shift chunk
    boundaries must fail here visibly. 研究生命科学 is the classic BiMM
    disambiguation case — backward (研究/生命/科学, 0 singles) must beat
    forward (研究生/命/科学, 1 single) on the tie."""
    from ragflow_core16_ray.functions.tokenizer import tokenize

    fixtures = [
        ("数据流处理引擎", ["数据流", "处理", "引擎"]),
        ("研究生命科学", ["研究", "生命", "科学"]),
        ("机器学习模型训练", ["机器", "学习", "模型", "训", "练"]),
        ("我们使用批处理管道处理语料",
         ["我", "们", "使", "用", "批处理", "管道", "处理", "语料"]),
        ("Ray数据引擎支持分区与排序",
         ["ray", "数据", "引擎", "支", "持", "分区", "与", "排序"]),
        ("性能优化和内存管理", ["性能", "优化", "和", "内存", "管", "理"]),
        ("这是一个测试句子", ["这", "是", "一", "个", "测试", "句子"]),
        # trad→simp + full→half width normalization runs BEFORE matching
        # (rag_tokenizer.tokenize:291-300 chain)
        ("數據處理，ＡＢＣ！", ["数据", "处理", ",", "abc", "!"]),
        ("機器學習", ["机器", "学习"]),
    ]
    for text, want in fixtures:
        assert tokenize(text) == want, text


def test_fine_grained_parity_fixtures():
    """fine_grained_tokenize fixtures (rag_tokenizer.py:364-402 role):
    lexicon compounds decompose (数据流 → 数据/流), tokens whose only
    decomposition is all singles stay whole, short/numeric tokens pass
    through, and '/'-compounds split in mostly-latin streams."""
    from ragflow_core16_ray.functions.tokenizer import (
        fine_grained_tokenize, tokenize)

    assert fine_grained_tokenize(tokenize("数据流处理引擎")) == \
        ["数据", "流", "处理", "引擎"]
    assert fine_grained_tokenize(tokenize("研究生命科学")) == \
        ["研究", "生命", "科学"]
    assert fine_grained_tokenize(tokenize("我们使用批处理管道处理语料")) == \
        ["我", "们", "使", "用", "批", "处理", "管道", "处理", "语料"]
    # mostly-latin list: only '/'-compounds split
    assert fine_grained_tokenize(["read/write", "path", "42"]) == \
        ["read", "write", "path", "42"]


def test_ascii_tokenizer_specialization_equivalence():
    """_TOKEN_RE_ASCII (stdlib re, hot-path specialization) must tokenize
    LOWERED pure-ASCII text exactly like the general _TOKEN_RE (regex
    module): exhaustive over ASCII char pairs plus fuzz — including the
    \\x1c-\\x1f controls where the two engines' \\s classes differ."""
    import itertools
    import random

    from ragflow_core16_ray.functions.tokenizer import (_TOKEN_RE,
                                                        _TOKEN_RE_ASCII)

    chars = [chr(i) for i in range(128)]
    for a, b in itertools.product(chars, chars):
        s = (a + b).lower()
        assert _TOKEN_RE.findall(s) == _TOKEN_RE_ASCII.findall(s), repr(s)
    rng = random.Random(0)
    for _ in range(3000):
        s = "".join(rng.choice(chars)
                    for _ in range(rng.randint(0, 60))).lower()
        assert _TOKEN_RE.findall(s) == _TOKEN_RE_ASCII.findall(s), repr(s)


def test_bpe_counter_frozen_vocab():
    """Frozen-vocab BPE counting (functions/bpe_counter.py), the
    reproducible substitute for tiktoken budgets (rag/utils/
    __init__.py:81-90): in-vocab words fully merge to 1 token; unknown
    words degrade toward characters (budget upper bound, not under)."""
    from ragflow_core16_ray.functions.bpe_counter import (bpe_encode_word,
                                                          bpe_num_tokens,
                                                          load_ranks)

    ranks = load_ranks()
    assert ranks  # the packaged data/bpe_merges.tsv loaded
    assert bpe_num_tokens("") == 0
    # 12 common corpus words -> 12 tokens (each fully merged)
    assert bpe_num_tokens("stream batch table scan merge sort join filter "
                          "window group key value") == 12
    # out-of-closure word: near-character-level
    assert bpe_num_tokens("zzqx") == len(bpe_encode_word("zzqx", ranks)) >= 4
    # counting is additive over whitespace words
    assert bpe_num_tokens("stream stream") == 2


def test_chunk_boundaries_pinned_under_both_counters():
    """The same doc packs differently under the two token currencies
    (unknown words cost more BPE tokens, flushing chunks earlier) — both
    boundary sets are pinned so a counter change shows up here."""
    sents = [f"stream batch zzqx{i} table merge." for i in range(8)]
    spans = [make_span("text", s, offset=i) for i, s in enumerate(sents)]

    def zz_per_chunk(tc):
        _, out, _ = extract_doc(
            spans, ExtractConfig(chunk_token_num=20, token_counter=tc))
        return [s["text"].count("zzqx") for s in out]

    assert zz_per_chunk("maxmatch") == [3, 3, 2]
    assert zz_per_chunk("bpe") == [2, 2, 2, 2]
