"""Unit tests for the pure extraction-function library, with hand-written
expected outputs (the reference has no parser unit tests — SURVEY.md §5 —
so these fixtures pin OUR semantics deterministically)."""

from ragflow_core16_ray.functions.bullets import (bullets_category,
                                                  hierarchical_merge,
                                                  line_level,
                                                  make_colon_as_title,
                                                  remove_contents_table)
from ragflow_core16_ray.functions.hashing import (content_id, hash64,
                                                  md5_hex,
                                                  winnow_fingerprint)
from ragflow_core16_ray.functions.html_extract import extract_html
from ragflow_core16_ray.functions.markdown import extract_markdown
from ragflow_core16_ray.functions.merge import naive_merge, split_on_delimiters
from ragflow_core16_ray.functions.pdfish import extract_pdfish
from ragflow_core16_ray.functions.table import (coerce, column_types,
                                                field_name, parse_tsv_rows)
from ragflow_core16_ray.functions.textstats import (lang_id, quality_counts,
                                                    word_shingles)
from ragflow_core16_ray.functions.tokenizer import (is_english, num_tokens,
                                                    str_q2b, ws_tokens)


# ------------------------------------------------------------ tokenizer ---

def test_num_tokens_en():
    assert num_tokens("hello world") == 2
    assert num_tokens("") == 0


def test_num_tokens_cjk_word_units():
    # lexicon max-match: a known CJK word is ONE budget unit; unknown
    # chars still count per char
    assert num_tokens("数据流") == 1
    assert num_tokens("鑫垚") == 2


def test_str_q2b():
    assert str_q2b("ＡＢＣ！　x") == "ABC! x"


def test_is_english():
    assert is_english(["the quick brown fox"])
    assert not is_english(["数据流处理引擎"])


def test_ws_tokens():
    assert ws_tokens("  a  b\tc ") == ["a", "b", "c"]
    assert ws_tokens("   ") == []


# -------------------------------------------------------------- hashing ---

def test_hash_stability():
    assert hash64("abc") == hash64("abc")
    assert content_id("x", "d1") != content_id("x", "d2")
    assert md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"


def test_winnow_fingerprint_locality():
    a = "the quick brown fox jumps over the lazy dog " * 10
    assert winnow_fingerprint(a) == winnow_fingerprint(a)
    assert winnow_fingerprint(a) != winnow_fingerprint(a.replace("fox", "cat"))


# ---------------------------------------------------------------- merge ---

def test_split_on_delimiters_roundtrip():
    s = "One. Two! 三。Four"
    pieces = split_on_delimiters(s, "\n!?。；！？.")
    assert "".join(pieces) == s
    assert pieces == ["One.", " Two!", " 三。", "Four"]


def test_naive_merge_budget():
    secs = ["alpha beta gamma."] * 10
    chunks = naive_merge(secs, chunk_token_num=8, delimiter="\n!?。；！？")
    assert len(chunks) > 1
    # merging all chunk text back (minus separators) covers all sections
    joined = "\n".join(chunks)
    assert joined.count("alpha beta gamma.") == 10


def test_naive_merge_single_small():
    assert naive_merge(["tiny"], 128) == ["tiny"]


# -------------------------------------------------------------- bullets ---

def test_bullets_and_hierarchy():
    secs = [
        "Chapter 1. Intro",
        "1.1 Basics",
        "content line one.",
        "content line two.",
        "1.2 More",
        "second content.",
        "Chapter 2. Next",
        "2.1 Again",
        "third content.",
    ]
    fam = bullets_category(secs)
    assert fam == 0
    assert line_level("Chapter 1. Intro", fam) == 0
    assert line_level("1.1 Basics", fam) == 1
    chunks = hierarchical_merge(secs, fam)
    assert chunks == [
        "Chapter 1. Intro\n1.1 Basics\ncontent line one.\ncontent line two.",
        "Chapter 1. Intro\n1.2 More\nsecond content.",
        "Chapter 2. Next\n2.1 Again\nthird content.",
    ]


def test_cjk_bullets():
    secs = ["第一章 绪论", "一、背景", "正文内容。", "第二章 方法", "一、步骤", "更多内容。"]
    fam = bullets_category(secs)
    assert fam == 1
    chunks = hierarchical_merge(secs, fam)
    assert chunks[0] == "第一章 绪论\n一、背景\n正文内容。"


def test_colon_title():
    out = make_colon_as_title(
        ["Summary: this is a sufficiently long trailing text body here"])
    assert out[0] == "Summary"
    assert out[1].startswith("this is")


def test_remove_contents_table():
    secs = ["Contents", "Intro ........ 2", "Methods ....... 3", "Real text."]
    assert remove_contents_table(secs) == ["Real text."]


# ----------------------------------------------------------------- html ---

def test_html_main_content():
    html = (
        "<html><head><title>My Page</title><script>junk()</script></head>"
        "<body><nav><a href='/'>Home</a><a href='/a'>About</a></nav>"
        "<div class='sidebar'>" + "".join(f"<a href='/l{i}'>link {i}</a>" for i in range(10)) +
        "</div><div class='content'><h1>My Page</h1>"
        "<p>First paragraph with plenty of meaningful words inside it.</p>"
        "<img src='media://d/0'/>"
        "<p>Second paragraph, also with a decent amount of text content.</p>"
        "</div><footer><a href='/p'>Privacy</a></footer></body></html>"
    )
    doc = extract_html(html)
    assert doc.title == "My Page"
    assert doc.sections == [
        "First paragraph with plenty of meaningful words inside it.",
        "Second paragraph, also with a decent amount of text content.",
    ]
    assert doc.figures == ["media://d/0"]


def test_html_entities_and_no_blocks():
    doc = extract_html("plain &amp; simple text with no tags at all")
    assert doc.sections == ["plain & simple text with no tags at all"]


# ------------------------------------------------------------- markdown ---

def test_markdown_tables_and_headings():
    lines = [
        "# Title",
        "## Section One",
        "Body line one.\nBody line two.",
        "| a | b |",
        "|---|---|",
        "| 1 | 2 |",
        "Tail text.",
    ]
    doc = extract_markdown(lines)
    assert doc.title == "Title"
    assert doc.tables == [
        "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>"]
    assert doc.sections[0] == "Section One\nBody line one.\nBody line two."
    assert doc.sections[1] == "Tail text."


# ---------------------------------------------------------------- table ---

def test_column_types_and_coerce():
    cols = [["1", "x", "y"], ["1.5", "2", "3.25"], ["yes", "no", "true"],
            ["2023-01-02", "2023/1/3", "bad"]]
    types = column_types(cols)
    assert types == ["text", "float", "bool", "date"]
    # 2/3 ints beats the 0.6 majority bar → int column
    assert column_types([["1", "2", "x"]]) == ["int"]
    assert coerce("2023/1/3", "date") == "2023-01-03"
    assert coerce("yes", "bool") == "true"
    assert coerce("2", "float") == "2"


def test_parse_tsv_rows():
    t = parse_tsv_rows([
        "item id\tprice\tactive",
        "1\t9.50\tyes",
        "deformed",
        "2\t3.25\tno",
    ])
    assert t.fields == ["item_id_long", "price_flt", "active_kwd"]
    assert t.row_lines() == [
        "item_id_long:1; price_flt:9.5; active_kwd:true",
        "item_id_long:2; price_flt:3.25; active_kwd:false",
    ]


def test_field_name():
    assert field_name("Ship Date", "date") == "ship_date_dt"


# --------------------------------------------------------------- pdfish ---

def _mk_box(t, x0, x1, top, bot, page, lay, **kw):
    import json

    d = {"t": t, "x0": x0, "x1": x1, "top": top, "bot": bot, "page": page,
         "lay": lay, **kw}
    return {"kind": "box", "text": json.dumps(d, sort_keys=True),
            "media_ref": "", "offset": 0}


def test_pdfish_order_garbage_hf():
    spans = [
        _mk_box("Running Head", 50, 550, 10, 30, 0, "header"),
        _mk_box("Doc Title", 100, 500, 60, 90, 0, "title"),
        _mk_box("Second line.", 60, 540, 200, 220, 0, "text"),
        _mk_box("First line.", 60, 540, 100, 120, 0, "text"),
        _mk_box("• • •", 60, 540, 300, 320, 0, "text"),
        _mk_box("page 1/2", 270, 330, 960, 980, 0, "footer"),
        _mk_box("Running Head", 50, 550, 10, 30, 1, "header"),
        _mk_box("Next page.", 60, 540, 100, 120, 1, "text"),
    ]
    out = extract_pdfish(spans)
    assert [(s["kind"], s["text"]) for s in out] == [
        ("title", "Doc Title"),
        ("section", "First line."),
        ("section", "Second line."),
        ("section", "Next page."),
    ]


def test_pdfish_two_column():
    spans = [
        _mk_box("L1.", 50, 280, 100, 120, 0, "text"),
        _mk_box("L2.", 50, 280, 160, 180, 0, "text"),
        _mk_box("R1.", 320, 550, 100, 120, 0, "text"),
        _mk_box("R2.", 320, 550, 160, 180, 0, "text"),
    ]
    out = extract_pdfish(spans)
    assert [s["text"] for s in out] == ["L1.", "L2.", "R1.", "R2."]


def test_pdfish_table_and_caption():
    spans = [
        _mk_box("h1", 60, 170, 820, 840, 0, "table", row=0, col=0, tno=0),
        _mk_box("h2", 180, 290, 820, 840, 0, "table", row=0, col=1, tno=0),
        _mk_box("7", 60, 170, 845, 865, 0, "table", row=1, col=0, tno=0),
        _mk_box("8", 180, 290, 845, 865, 0, "table", row=1, col=1, tno=0),
        {"kind": "caption", "text": "Table 1: numbers", "media_ref": "", "offset": 0},
    ]
    out = extract_pdfish(spans)
    # phase A now emits raw table_cells (so shards can merge split
    # tables); rendering happens in the phase-B pre-pass
    assert [s["kind"] for s in out] == ["table_cells"]
    from ragflow_core16_ray.functions.pdfish import render_table_cells

    rendered = render_table_cells(out)
    # NL description form (__desc_table semantics): header row composed
    # onto the numeric data row, not emitted separately
    assert [(s["kind"], s["text"]) for s in rendered] == [
        ("section", "Table 1: numbers"),
        ("table_row", "h1：7; h2：8"),
    ]


def test_pdfish_figure_and_toc():
    spans = [
        _mk_box("Contents", 250, 350, 60, 80, 0, "title"),
        _mk_box("Intro ............ 2", 80, 520, 100, 120, 0, "text"),
        _mk_box("Real text.", 60, 540, 100, 120, 1, "text"),
        _mk_box("", 200, 400, 700, 800, 1, "figure"),
        {"kind": "image", "text": "", "media_ref": "media://d/f0", "offset": 0},
        {"kind": "caption", "text": "Figure 1: something", "media_ref": "", "offset": 0},
    ]
    out = extract_pdfish(spans)
    assert [(s["kind"], s["text"], s["media_ref"]) for s in out] == [
        ("section", "Real text.", ""),
        ("figure", "Figure 1: something", "media://d/f0"),
    ]


def test_pdfish_sentence_concat():
    spans = [
        _mk_box("A line that does not end", 60, 540, 100, 120, 0, "text"),
        _mk_box("but continues here.", 60, 540, 150, 170, 0, "text"),
    ]
    out = extract_pdfish(spans)
    assert [s["text"] for s in out] == [
        "A line that does not end but continues here."]


# ------------------------------------------------------------ textstats ---

def test_lang_id():
    assert lang_id("the cat and the dog sat in the house") == "en"
    assert lang_id("le chat et la maison est une belle chose") == "fr"
    assert lang_id("数据流处理引擎集群节点") == "zh"


def test_quality_counts():
    q = quality_counts("The cat, the hat!")
    assert q["n_ws_tokens"] == 4
    assert q["n_punct"] == 2
    assert q["n_stop"] == 2


def test_word_shingles():
    assert word_shingles("a b c d", k=3) == {"a b c", "b c d"}


def test_cjk_bimm_segmentation():
    from ragflow_core16_ray.functions.tokenizer import (bimm_segment,
                                                        num_tokens, tokenize)

    # lexicon words come out whole
    assert bimm_segment("数据流处理") == ["数据流", "处理"]
    # the classic BiMM disambiguation: backward beats forward because it
    # produces no single-char strays (研究生|命|科学 vs 研究|生命|科学)
    assert bimm_segment("研究生命科学") == ["研究", "生命", "科学"]
    # out-of-lexicon runs fall back to per-char
    assert bimm_segment("鑫垚") == ["鑫", "垚"]
    # mixed text: latin words + segmented CJK in reading order; the
    # pretokenizer's leading-space remainder is NOT a token (it would
    # inflate the packing budget at every script boundary)
    assert tokenize("use 数据流处理 now") == [
        "use", "数据流", "处理", " now"]
    assert num_tokens("Hello 世界") == 2
    # token budgets count CJK words, not chars
    assert num_tokens("数据流处理") == 2


def test_tradi2simp():
    from ragflow_core16_ray.functions.tokenizer import tokenize, tradi2simp

    assert tradi2simp("數據處理引擎") == "数据处理引擎"
    assert tradi2simp("simple stays") == "simple stays"
    # the tokenize chain normalizes trad → simp before lexicon max-match,
    # so traditional spellings hit the simplified lexicon words
    assert tokenize("數據流處理") == ["数据流", "处理"]
    # and full-width latin + case fold first (rag_tokenizer chain)
    assert tokenize("ＡＢＣ Data") == ["abc", " data"]


def test_fine_grained_tokenize():
    from ragflow_core16_ray.functions.tokenizer import (fine_grained_tokenize,
                                                        tokenize)

    # mostly-CJK list: a 3-char lexicon compound decomposes into its parts
    # (rag_tokenizer.fine_grained_tokenize:364-402 second-best dict split)
    assert fine_grained_tokenize(["研究生", "科学"]) == ["研究", "生", "科学"]
    # short / numeric tokens kept whole
    assert fine_grained_tokenize(["数据", "12.5", "科学"]) == [
        "数据", "12.5", "科学"]
    # mostly-non-CJK list: only '/'-compounds split
    assert fine_grained_tokenize(["tcp/ip", "stack"]) == ["tcp", "ip", "stack"]
    # end-to-end: tokenize then refine
    toks = tokenize("研究生命科学")
    assert fine_grained_tokenize(toks) == ["研究", "生命", "科学"]


def test_chunk_doc_tokens_fields(ray_session, tmp_path):
    import pyarrow as pa

    from ragflow_core16_ray.stages.enrich import tokenize_chunk_batch

    batch = pa.table({
        "doc_id": ["d1"],
        "template": ["naive"],
        "spans": [[{"kind": "section", "text": "Streams of 数据流处理 rock.",
                    "media_ref": "", "offset": 0},
                   {"kind": "table_html",
                    "text": "<table><tr><td>a b</td></tr></table>",
                    "media_ref": "", "offset": 1}]],
    })
    out = tokenize_chunk_batch(batch)
    assert out.column("content_ltks").to_pylist()[0] == \
        "streams  of 数据流 处理  rock ."
    # table markup stripped before tokenizing (rag/nlp/__init__.py:253)
    assert "table" not in out.column("content_ltks").to_pylist()[1]
    assert out.column("content_with_weight").to_pylist()[1].startswith("<table>")
    # content-hash chunk ids (task_executor.py:266 role): deterministic,
    # distinct per chunk, doc-scoped
    from ragflow_core16_ray.functions.hashing import content_id
    ids = out.column("id").to_pylist()
    assert ids[0] == content_id("Streams of 数据流处理 rock.", "d1")
    assert len(set(ids)) == 2
    # title fields from the doc name (rag/nlp/__init__.py:251-257 role),
    # identical across a doc's chunks
    assert out.column("title_tks").to_pylist() == ["d 1", "d 1"]


def test_field_name_pinyin():
    from ragflow_core16_ray.functions.table import field_name

    # rag/app/table.py:196-211: pinyin-joined header + type suffix,
    # '/alt' and parenthesized hints stripped first
    assert field_name("年龄", "int") == "nian_ling_long"
    assert field_name("姓名（必填）", "text") == "xing_ming_tks"
    assert field_name("price/单价", "float") == "price_flt"
    assert field_name("金额(元)", "float") == "jin_e_flt"
    # unknown Han chars stay verbatim rather than guessing a reading
    assert field_name("鑫垚", "text") == "鑫垚_tks"


def test_pdfish_two_column_edge_cases():
    # Edge cases hand-traced from the reference's ordering semantics
    # (deepdoc/parser/pdf_parser.py sort_Y_firstly + column handling):
    # (a) same-visual-line fuzz — tops within the rounding fuzz order by
    # x0; (b) a column-start gap NOT exceeding the 100pt bar stays
    # row-major; (c) on a real two-column page a full-width title at the
    # top leads its column flow, and a figure in the right column joins
    # that column's stream at its y-position.
    # (a) fuzz: tops 100.04 vs 100.06 round to the same line -> x0 order
    spans = [
        _mk_box("right.", 320, 550, 100.06, 120, 0, "text"),
        _mk_box("left.", 50, 280, 100.04, 120, 0, "text"),
    ]
    # gap 320-280=40 <= 100: row-major, x0 breaks the tie
    assert [s["text"] for s in extract_pdfish(spans)] == ["left.", "right."]

    # (b) borderline x0-cluster gap exactly 100 is NOT two-column (strict
    # > 100): row-major by top, x0 inside a line
    spans = [
        _mk_box("A1.", 50, 140, 100, 120, 0, "text"),
        _mk_box("B1.", 150, 550, 100, 120, 0, "text"),
        _mk_box("A2.", 50, 140, 160, 180, 0, "text"),
        _mk_box("B2.", 150, 550, 160, 180, 0, "text"),
    ]
    # x0 clusters {50},{150}: min(right)-max(left) = 100 -> row-major;
    # the concat gate then merges the same-visual-line halves, and the
    # sentence end before A2 breaks the flow between rows
    assert [s["text"] for s in extract_pdfish(spans)] == [
        "A1. B1.", "A2. B2."]

    # (c) two-column page: title tops the left flow, right-column figure
    # rides its column at its y
    spans = [
        _mk_box("Doc Title", 50, 550, 40, 70, 0, "title"),
        _mk_box("L1.", 50, 280, 100, 120, 0, "text"),
        _mk_box("L2.", 50, 280, 160, 180, 0, "text"),
        _mk_box("R1.", 420, 550, 100, 120, 0, "text"),
        _mk_box("R2.", 420, 550, 200, 220, 0, "text"),
        _mk_box("Fig body", 420, 550, 140, 180, 0, "figure"),
    ]
    out = extract_pdfish(spans)
    kinds_texts = [(s["kind"], s["text"]) for s in out]
    assert kinds_texts[0] == ("title", "Doc Title")
    texts = [s["text"] for s in out if s["kind"] == "section"]
    assert texts == ["L1.", "L2.", "R1.", "R2."]
    # the figure span sits between R1 and R2 in the emitted stream
    kinds = [s["kind"] for s in out]
    assert "figure" in kinds
    fig_i = kinds.index("figure")
    r1_i = [i for i, s in enumerate(out) if s["text"] == "R1."][0]
    r2_i = [i for i, s in enumerate(out) if s["text"] == "R2."][0]
    assert r1_i < fig_i < r2_i


def test_untagged_table_grid_inference():
    # geometry-only TSR substitute (_infer_grid, role of
    # table_structure_recognizer.py:29-92): no row/col/tno tags on the
    # boxes — rows recovered from top clusters (with jitter), columns
    # from x0 clusters, continuation page rows keep numbering
    def cell(t, x0, top, page=0):
        import json

        d = {"t": t, "x0": x0, "x1": x0 + 80, "top": top, "bot": top + 18,
             "page": page, "lay": "table"}
        return {"kind": "box", "text": json.dumps(d, sort_keys=True),
                "media_ref": "", "offset": 0}

    spans = [
        cell("h1", 60, 100.0), cell("h2", 200, 101.2),   # jittered header
        cell("a1", 60, 130.0), cell("a2", 200, 129.5),
        cell("b1", 60, 40.0, page=1), cell("b2", 200, 40.5, page=1),
        _mk_box("body text after the table.", 60, 540, 300, 320, 1, "text"),
    ]
    out = extract_pdfish(spans)
    import json

    cells = json.loads([s for s in out if s["kind"] == "table_cells"][0]["text"])
    # row ids are page-scoped (page*1e5 + cluster) so shard-local
    # re-inference can never collide when fragments merge; each cell
    # carries its page explicitly (4th element) for the phase-B
    # proximity merge
    assert cells["cells"] == [
        [0, 0, "h1", 0], [0, 1, "h2", 0],
        [1, 0, "a1", 0], [1, 1, "a2", 0],
        [100000, 0, "b1", 1], [100000, 1, "b2", 1],
    ]


def test_untagged_layout_inference():
    # _infer_layout (role of layout_recognizer.py:31-161) on boxes with NO
    # lay key: margin-hugging short lines -> header/footer (dropped),
    # outsized short unpunctuated line -> title, rest -> text flow
    def bare(t, top, bot, x0=60.0, x1=540.0, page=0):
        import json

        d = {"t": t, "x0": x0, "x1": x1, "top": top, "bot": bot, "page": page}
        return {"kind": "box", "text": json.dumps(d, sort_keys=True),
                "media_ref": "", "offset": 0}

    spans = [
        bare("Running Head", 10, 30),            # top margin -> header
        bare("Grand Title", 60, 100),            # 40pt vs 20pt median
        bare("First body sentence runs here.", 150, 170),
        bare("Second body line continues on.", 200, 220),
        bare("7", 960, 980),                     # bottom margin -> footer
    ]
    out = extract_pdfish(spans)
    assert [(s["kind"], s["text"]) for s in out] == [
        ("title", "Grand Title"),
        ("section", "First body sentence runs here."),
        ("section", "Second body line continues on."),
    ]


def test_describe_grid_rows_header_composition():
    from ragflow_core16_ray.functions.table import describe_grid_rows

    # single header row over numeric data
    assert describe_grid_rows([["h1", "h2"], ["7", "8"]]) == ["h1：7; h2：8"]
    # stacked headers: child composes with parent via ' for '/'的';
    # empty header cells inherit the cell above
    # (table_structure_recognizer.py:408-445)
    assert describe_grid_rows(
        [["price", ""], ["low", "high"], ["1", "2"]]) == \
        ["price for low：1; high：2"]
    # an empty second-header cell inherits the header above it
    assert describe_grid_rows(
        [["price", "qty"], ["low", ""], ["1", "2"]]) == \
        ["price for low：1; qty：2"]
    # text-only 2-col grid: key-value join, no header guessing
    assert describe_grid_rows([["k", "v"], ["a", "b"]]) == ["k：v", "a：b"]
    # empty rows dropped
    assert describe_grid_rows([["x", "y"], ["", ""]]) == ["x：y"]


def test_describe_grid_rows_majority_body():
    from ragflow_core16_ray.functions.table import describe_grid_rows

    # a minority textual row (subtotal/footnote) must NOT disable header
    # composition
    assert describe_grid_rows(
        [["region", "sales"], ["north", "5"], ["south", "7"],
         ["east", "9"], ["subtotal pending", "tbd"]])[0] == \
        "region：north; sales：5"


def test_row_tagged_untagged_tno_tables_do_not_merge_across_far_pages():
    # two tno-less tables whose cells carry EXPLICIT row tags (legal per
    # parse_box; _infer_grid no-ops then) on pages 0 and 5: the phase-B
    # proximity rule must see their REAL pages (carried per cell) — the
    # old row-id page encoding reported page 0 for both and merged them
    import json

    def tagged_cell(t, x0, top, page, row, col):
        d = {"t": t, "x0": x0, "x1": x0 + 80, "top": top, "bot": top + 18,
             "page": page, "lay": "table", "row": row, "col": col}
        return {"kind": "box", "text": json.dumps(d, sort_keys=True),
                "media_ref": "", "offset": 0}

    def body(t, page):
        return _mk_box(t, 60, 540, 300, 320, page, "text")

    spans = [
        tagged_cell("a1", 60, 100, 0, 0, 0), tagged_cell("a2", 200, 100, 0, 0, 1),
        body("separating body text on page two.", 2),
        tagged_cell("b1", 60, 100, 5, 0, 0), tagged_cell("b2", 200, 100, 5, 0, 1),
    ]
    from ragflow_core16_ray.functions.pdfish import render_table_cells
    out = extract_pdfish(spans)
    assert sum(1 for s in out if s["kind"] == "table_cells") == 2
    rendered = render_table_cells(out)
    rows = [s["text"] for s in rendered if s["kind"] == "table_row"]
    # tables >1 page apart stay separate: one row per table, and the
    # page-5 cells never collide onto the page-0 grid row
    assert len(rows) == 2
    assert any("a1" in r for r in rows) and any("b1" in r for r in rows)
    assert not any("a1" in r and "b1" in r for r in rows)
