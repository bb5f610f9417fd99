"""Query-side rewrite (functions/query_rewrite.py — FulltextQueryer +
synonym Dealer roles): fixture-pinned rewrite of the default question,
composition ratios (syn w/4, phrase 2·max), and the weighted retrieval
query wired on top of it."""

import pytest

from ragflow_core16_ray.functions.query_rewrite import (compose, lookup,
                                                        query_string,
                                                        rewrite_query,
                                                        rm_www)


def test_rewrite_default_question_pinned():
    """The exact rewrite the weighted_query_bm25_topk ORACLE hardcodes —
    change either side and this fixture breaks first."""
    rw = rewrite_query("what is the hash table scan")
    assert rw.tokens == ["hash", "table", "scan"]
    assert rw.synonyms == {"hash": ["digest", "checksum", "key"],
                           "table": ["relation", "grid"],
                           "scan": ["sweep", "read", "filter"]}
    assert rw.phrases == [("hash", "table"), ("table", "scan")]
    assert rw.keywords == ["hash", "table", "scan", "digest", "checksum",
                           "key", "relation", "grid", "sweep", "read",
                           "filter"]
    qs = query_string(rw, {t: 1.0 for t in rw.tokens})
    assert qs == ('(hash^0.3333 "digest"^0.0833 "checksum"^0.0833 '
                  '"key"^0.0833) (table^0.3333 "relation"^0.0833 '
                  '"grid"^0.0833) (scan^0.3333 "sweep"^0.0833 '
                  '"read"^0.0833 "filter"^0.0833) '
                  '"hash table"^0.6667 "table scan"^0.6667')


def test_rm_www_and_normalization():
    assert rewrite_query("WHAT is THE merge sort").tokens \
        == ["merge", "sort"]
    # full-width + punctuation normalize before tokenizing
    assert rewrite_query("ｍｅｒｇｅ，ｓｏｒｔ？").tokens == ["merge", "sort"]
    # all-stripped falls back to the original tokens (rmWWW contract)
    assert rm_www(["what", "is", "the"]) == ["what", "is", "the"]
    assert rewrite_query("what is the").tokens == ["what", "is", "the"]


def test_lookup_caps_and_misses():
    assert lookup("hash") == ["digest", "checksum", "key"]
    assert lookup("hash", topn=1) == ["digest"]
    assert lookup("HASH") == ["digest", "checksum", "key"]
    assert lookup("nonexistent-token") == []


def test_compose_ratios():
    rw = rewrite_query("hash scan")
    plan = compose(rw, {"hash": 3.0, "scan": 1.0})
    d = {(k, t): w for k, t, w in plan}
    assert d[("term", "hash")] == pytest.approx(0.75)
    assert d[("term", "scan")] == pytest.approx(0.25)
    assert d[("syn", "digest")] == pytest.approx(0.75 / 4)
    assert d[("syn", "sweep")] == pytest.approx(0.25 / 4)
    assert d[("phrase", "hash scan")] == pytest.approx(2 * 0.75)
    # deterministic order: unigrams+syns first (rewrite order), phrases
    assert [k for k, _t, _w in plan] == ["term", "syn", "syn", "syn",
                                         "term", "syn", "syn", "syn",
                                         "phrase"]


def test_weighted_retrieval_end_to_end(ray_session):
    from ragflow_core16_ray.pipelines.similarity import (
        bm25_topk, weighted_query_bm25_topk)

    sf = "/root/testdata/sf0.001"
    df = weighted_query_bm25_topk(sf)
    assert list(df.columns) == ["rank", "doc_id", "score_q"]
    assert len(df) == 10
    assert (df["score_q"] > 0).all()
    assert list(df["rank"]) == list(range(1, 11))
    # the rewrite genuinely changes the ranking vs the raw term query
    plain = bm25_topk(sf, query="hash table scan")
    assert list(df["score_q"]) != list(plain["score_q"])
