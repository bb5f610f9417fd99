"""Unit tests for the laws / manual / presentation / email templates
(reference semantics: rag/app/{laws,manual,presentation,email}.py)."""

from ragflow_core16_ray.config import ExtractConfig
from ragflow_core16_ray.functions.eml import parse_eml
from ragflow_core16_ray.schemas import make_span
from ragflow_core16_ray.stages.extract import extract_doc, route_template


def _texts(spans, kind="section"):
    return [s["text"] for s in spans if s["kind"] == kind]


BOOK_SPANS = [
    make_span("text", "Chapter 1. Introduction"),
    make_span("text", "1.1 Scope"),
    make_span("text", "Alpha beta gamma."),
    make_span("text", "Delta epsilon."),
    make_span("text", "1.2 Terms"),
    make_span("text", "Zeta eta."),
    make_span("text", "Chapter 2. Rules"),
    make_span("text", "2.1 General"),
    make_span("text", "Theta iota."),
]


def test_laws_hierarchical_no_fallback():
    tmpl, out, _ = extract_doc(BOOK_SPANS,
                               ExtractConfig(template_override="laws"))
    assert tmpl == "laws"
    secs = _texts(out)
    # every content chunk is prefixed with its full heading path
    assert any(s.startswith("Chapter 1. Introduction\n1.1 Scope") for s in secs)
    assert any(s.startswith("Chapter 2. Rules\n2.1 General") for s in secs)


def test_laws_bulletless_doc_yields_no_chunks():
    spans = [make_span("text", "just prose with no headings at all."),
             make_span("text", "more prose here.")]
    _, out, _ = extract_doc(spans, ExtractConfig(template_override="laws"))
    assert _texts(out) == []  # rag/app/laws.py: "No chunk parsed out"


def test_manual_packs_by_pivot_section():
    # long content so the 32-token always-glue floor is passed within a
    # section but chunks still split at pivot headings
    filler = " ".join(["alpha beta gamma delta epsilon"] * 10)
    spans = [
        make_span("text", "Chapter 1. Setup"),
        make_span("text", filler),
        make_span("text", "Chapter 2. Usage"),
        make_span("text", filler),
    ]
    _, out, _ = extract_doc(spans, ExtractConfig(template_override="manual"))
    secs = _texts(out)
    assert len(secs) == 2
    assert secs[0].startswith("Chapter 1. Setup")
    assert secs[1].startswith("Chapter 2. Usage")


def test_manual_small_sections_glue():
    # tiny sections (<32 tokens running total) glue across the pivot
    spans = [
        make_span("text", "Chapter 1. A"),
        make_span("text", "x."),
        make_span("text", "Chapter 2. B"),
        make_span("text", "y."),
    ]
    _, out, _ = extract_doc(spans, ExtractConfig(template_override="manual"))
    assert len(_texts(out)) == 1


def test_presentation_one_chunk_per_slide():
    spans = [make_span("slide", f"Slide {i}\n- point", f"media://d/s{i}")
             for i in range(5)]
    assert route_template(spans) == "presentation"
    tmpl, out, _ = extract_doc(spans)
    assert tmpl == "presentation"
    assert [s["kind"] for s in out] == ["slide"] * 5
    assert [s["media_ref"] for s in out] == [f"media://d/s{i}" for i in range(5)]
    assert [s["offset"] for s in out] == list(range(5))


RAW_EML = """From: a@example.com
To: b@example.org
Subject: Quarterly sync
MIME-Version: 1.0
Content-Type: multipart/mixed; boundary="=-b1"

preamble
--=-b1
Content-Type: text/plain; charset="utf-8"

Hello team.
Numbers look good.
--=-b1
Content-Type: text/html; charset="utf-8"

<html><body><div class="content"><p>Hello team in html form with quite a
lot of words so density scoring keeps it.</p></div></body></html>
--=-b1
Content-Type: application/octet-stream
Content-Disposition: attachment; filename="q3.xlsx"
Content-Transfer-Encoding: base64

QUJD
--=-b1--
"""


def test_parse_eml_decomposition():
    p = parse_eml(RAW_EML)
    assert "Subject: Quarterly sync" in p.headers
    assert "Hello team." in p.text_lines
    assert len(p.html_parts) == 1
    assert p.attachments == ["q3.xlsx"]


def test_email_template_end_to_end():
    spans = [make_span("eml", RAW_EML)]
    assert route_template(spans) == "email"
    tmpl, out, _ = extract_doc(spans)
    assert tmpl == "email"
    joined = "\n".join(_texts(out))
    assert "Subject: Quarterly sync" in joined
    assert "Hello team." in joined        # text/plain part
    assert "density scoring" in joined    # html part survived the strip
    figs = [s["media_ref"] for s in out if s["kind"] == "figure"]
    assert figs == ["attach://q3.xlsx"]


def test_json_kind_splits_and_packs():
    import json as _json

    obj = {"config": {"a": list(range(50)), "b": "x" * 200},
           "meta": {"k": 1}}
    spans = [make_span("json", _json.dumps(obj))]
    tmpl, out, _ = extract_doc(spans)
    assert tmpl == "naive"
    secs = _texts(out)
    assert secs, "json doc produced no sections"
    # every piece of the structure survives somewhere in the output
    joined = "\n".join(secs)
    assert '"b"' in joined and "xxx" in joined


def test_json_invalid_falls_back_to_raw():
    spans = [make_span("json", "{not valid json")]
    _, out, _ = extract_doc(spans)
    assert _texts(out) == ["{not valid json"]


def test_cross_shard_table_merge():
    """A table whose rows straddle the 12-page shard cut must come back as
    ONE table (caption once, rows contiguous) — and the sharded result
    must equal the unsharded one (pdf_parser.py:701-716 cross-page merge,
    here across page-range shards)."""
    import json

    def box(text, page, top, row, col):
        d = {"t": text, "x0": 60.0 + 120 * col, "x1": 170.0 + 120 * col,
             "top": float(top), "bot": float(top + 20), "page": page,
             "lay": "table", "row": row, "col": col, "tno": 0}
        return make_span("box", json.dumps(d, sort_keys=True))

    def textbox(text, page, top):
        d = {"t": text, "x0": 60.0, "x1": 540.0, "top": float(top),
             "bot": float(top + 20), "page": page, "lay": "text"}
        return make_span("box", json.dumps(d, sort_keys=True))

    # spans in page order (the input contract split_shards relies on);
    # table rows 0-2 at the bottom of page 11, rows 3-4 at top of page 12
    spans = []
    for page in range(14):
        if page == 12:
            for ri in (3, 4):
                for ci in range(2):
                    spans.append(box(f"c{ri}{ci}", 12, 40 + 25 * (ri - 3),
                                     ri, ci))
        for i in range(4):
            spans.append(textbox(f"line {page}-{i}.", page, 100 + 50 * i))
        if page == 11:
            for ri in range(3):
                for ci in range(2):
                    spans.append(box(f"c{ri}{ci}", 11, 820 + 25 * ri, ri, ci))
            spans.append(make_span("caption", "Table 1: split"))

    sharded_cfg = ExtractConfig(shard_span_threshold=16)
    _, sharded, n_shards = extract_doc(spans, sharded_cfg)
    assert n_shards > 1
    _, unsharded, one = extract_doc(spans, ExtractConfig())
    assert one == 1

    key = [(s["kind"], s["text"]) for s in sharded]
    assert key == [(s["kind"], s["text"]) for s in unsharded]
    rows = [t for k, t in key if k == "table_row"]
    # 2-col text grid renders key-value style (__desc_table headerless
    # 2-column branch); rows contiguous across the shard cut
    assert rows == ["c00：c01", "c10：c11", "c20：c21", "c30：c31",
                    "c40：c41"]
    # caption appears exactly once (it may be packed into a neighboring
    # section chunk by the token-budget merge)
    assert sum(t.count("Table 1: split") for _, t in key) == 1


def test_keep_positions_tags():
    """keep_positions weaves in-band @@page\\tx0..## tags through pdfish
    text; stripping them recovers the exact untagged output, and the tags
    parse back to the source coordinates (pdf_parser.py:893-908)."""
    import json

    from ragflow_core16_ray.functions.postag import parse_tags, strip_tags

    def tb(text, page, top):
        d = {"t": text, "x0": 60.0, "x1": 540.0, "top": float(top),
             "bot": float(top + 20), "page": page, "lay": "text"}
        return make_span("box", json.dumps(d, sort_keys=True))

    spans = [tb("First sentence.", 0, 100), tb("Second line", 0, 150),
             tb("continues here.", 0, 200)]
    _, plain, _ = extract_doc(spans)
    _, tagged, _ = extract_doc(spans, ExtractConfig(keep_positions=True))

    plain_texts = [s["text"] for s in plain]
    tagged_texts = [s["text"] for s in tagged]
    assert [strip_tags(t).replace("  ", " ").strip() for t in tagged_texts] \
        == plain_texts
    all_tags = [t for txt in tagged_texts for t in parse_tags(txt)]
    assert (0, 60.0, 540.0, 100.0, 120.0) in all_tags
    assert len(all_tags) == 3


def test_keep_positions_tags_survive_packing():
    """Chunk boundaries must be IDENTICAL with and without tags even when
    naive_merge actually packs (the token counter sees tag-free text;
    tags would otherwise inflate counts and shift boundaries —
    rag/nlp/__init__.py naive_merge counts tag-free, positions ride
    separately)."""
    import json

    from ragflow_core16_ray.functions.postag import strip_tags

    def tb(text, page, top):
        d = {"t": text, "x0": 60.0, "x1": 540.0, "top": float(top),
             "bot": float(top + 20), "page": page, "lay": "text"}
        return make_span("box", json.dumps(d, sort_keys=True))

    # 60 sentence-ended lines → several chunks at the default budget
    spans = [tb(f"Sentence number {i} fills the running token budget "
                f"with several words.", 0, 100 + 25 * i)
             for i in range(60)]
    _, plain, _ = extract_doc(spans)
    _, tagged, _ = extract_doc(spans, ExtractConfig(keep_positions=True))
    plain_texts = [s["text"] for s in plain]
    tagged_texts = [s["text"] for s in tagged]
    assert len(plain_texts) > 1  # packing actually happened
    assert len(tagged_texts) == len(plain_texts)
    assert [strip_tags(t) for t in tagged_texts] == plain_texts


def test_untagged_table_across_shard_cut():
    """Regression: an UNTAGGED (grid-inferred) table split by a page-range
    shard cut must reassemble without row collisions, and sharded output
    must equal unsharded (rows were previously renumbered from 0 per
    shard and merged cell-onto-cell)."""
    import json

    def cell(t, x0, top, page):
        d = {"t": t, "x0": x0, "x1": x0 + 80.0, "top": float(top),
             "bot": float(top + 18), "page": page, "lay": "table"}
        return make_span("box", json.dumps(d, sort_keys=True))

    def textbox(t, page, top):
        d = {"t": t, "x0": 60.0, "x1": 540.0, "top": float(top),
             "bot": float(top + 20), "page": page, "lay": "text"}
        return make_span("box", json.dumps(d, sort_keys=True))

    spans = []
    for page in range(14):
        for i in range(3):
            spans.append(textbox(f"line {page}-{i}.", page, 100 + 50 * i))
        if page == 11:  # header + first data row at the bottom of page 11
            spans.append(cell("h1", 60, 900, 11))
            spans.append(cell("h2", 200, 900, 11))
            spans.append(cell("1", 60, 925, 11))
            spans.append(cell("2", 200, 925, 11))
        if page == 12:  # continuation row at the top of page 12
            spans.append(cell("3", 60, 40, 12))
            spans.append(cell("4", 200, 40, 12))

    sharded_cfg = ExtractConfig(shard_span_threshold=16)
    _, sharded, n_shards = extract_doc(spans, sharded_cfg)
    assert n_shards > 1
    _, unsharded, one = extract_doc(spans, ExtractConfig())
    assert one == 1
    assert [(s["kind"], s["text"]) for s in sharded] == \
        [(s["kind"], s["text"]) for s in unsharded]
    rows = [t for k, t in ((s["kind"], s["text"]) for s in sharded)
            if k == "table_row"]
    assert rows == ["h1：1; h2：2", "h1：3; h2：4"]


# ------------------------------------------------------------ tag ---------

def test_tag_excel_mode_pairs():
    # excel mode (rag/app/tag.py:55-60): first cell = content, second =
    # comma-separated tags; deformed rows skipped; '.' -> '_' in tags
    spans = [make_span("row", "alpha doc\tml,nlp.v2", offset=0),
             make_span("row", "only one cell", offset=1),
             make_span("row", "beta doc\t solo ", offset=2)]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="tag"))
    assert tmpl == "tag"
    assert [(s["kind"], s["text"]) for s in out] == [
        ("tag", "alpha doc"), ("tag_kwd", "ml,nlp_v2"),
        ("tag", "beta doc"), ("tag_kwd", "solo"),
    ]


def test_tag_txt_mode_delimiter_vote_and_accumulation():
    # txt mode (rag/app/tag.py:61-92): one delimiter voted per doc; a
    # non-2-field line extends the pending content; pending-at-EOF dropped
    spans = [make_span("text", "intro line with no delimiter", offset=0),
             make_span("text", "first doc\ttopic.a,topic.b", offset=1),
             make_span("text", "second doc\tx", offset=2),
             make_span("text", "dangling content never closed", offset=3)]
    tmpl, out, _ = extract_doc(spans, ExtractConfig(template_override="tag"))
    assert tmpl == "tag"
    assert [(s["kind"], s["text"]) for s in out] == [
        ("tag", "intro line with no delimiter\nfirst doc"),
        ("tag_kwd", "topic_a,topic_b"),
        ("tag", "second doc"), ("tag_kwd", "x"),
    ]


def test_tag_txt_comma_delimiter_wins():
    spans = [make_span("text", "a,t1"), make_span("text", "b,t2"),
             make_span("text", "c,t3")]
    _, out, _ = extract_doc(spans, ExtractConfig(template_override="tag"))
    assert [s["text"] for s in out if s["kind"] == "tag"] == ["a", "b", "c"]
    assert [s["text"] for s in out if s["kind"] == "tag_kwd"] == \
        ["t1", "t2", "t3"]


def test_tag_table_sharding_no_header_duplication():
    # same no-header contract as qa excel mode (tag.py: "without header")
    spans = [make_span("row", f"content {i}\ttag{i}", offset=i)
             for i in range(40)]
    sharded = ExtractConfig(template_override="tag",
                            shard_span_threshold=8, table_shard_rows=10)
    tmpl, out, n_shards = extract_doc(spans, sharded)
    assert tmpl == "tag" and n_shards > 1
    tags = [s["text"] for s in out if s["kind"] == "tag"]
    assert len(tags) == 40 and tags[0] == "content 0"
    _, unsharded, _ = extract_doc(spans, ExtractConfig(template_override="tag"))
    assert [s["text"] for s in unsharded if s["kind"] == "tag"] == tags
