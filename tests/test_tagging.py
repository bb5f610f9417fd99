"""Chunk↔tag-KB retrieval assignment (rag/nlp/search.py:458-469 minus
ES): scoring-formula replica, keep_zero candidate surfacing, and the
fall-to-LLM (no positive score) behavior the soup corpus exercises."""

import pandas as pd

from ragflow_core16_ray.pipelines.tagging import (build_tag_prior,
                                                  chunk_tags, tag_one)


def _kb():
    # 2 "infra" rows that match + 98 junk rows that don't: prior_infra
    # is small, a matching doc's aggs are 100% infra -> enrichment
    kb = [("ray data engine", ["infra"]), ("ray data engine", ["infra"])]
    kb += [(f"zzz filler{i}", [f"junk{i}"]) for i in range(98)]
    return kb


def test_tag_one_scoring_replica():
    kb = _kb()
    prior = build_tag_prior(kb, S=10)
    assert abs(prior["infra"] - 3 / 110) < 1e-12
    from ragflow_core16_ray.pipelines.tagging import _toks
    toks = [frozenset(_toks(c)) for c, _ in kb]
    tags = [t for _, t in kb]
    got = tag_one("ray data engine pipeline", toks, tags, prior, S=10)
    # aggs {infra: 2}, cnt 2: score = round(0.1*3/12 / (3/110)) =
    # round(0.9166..) = 1
    assert got == [("infra", 1, 2, 2)]
    # unmatched doc: no aggs at all
    assert tag_one("completely disjoint words", toks, tags, prior,
                   S=10) == []


def test_chunk_tags_reference_contract_vs_keep_zero(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": pd.array([1, 2], dtype="int64"),
        "text": ["ray data engine pipeline", "qqq www eee"]})
    ds = rd.from_pandas(docs)
    # reference contract: only positive scores assign
    got = chunk_tags(ds, _kb(), S=10).to_pandas()
    assert list(zip(got["doc_id"], got["tag"], got["score"],
                    got["c"], got["cnt"])) == [(1, "infra", 1, 2, 2)]
    # with the production S=1000 smoothing nothing clears the bar
    # (the reference's fall-to-LLM condition) — keep_zero surfaces the
    # candidate evidence instead
    assert len(chunk_tags(ds, _kb(), S=1000).to_pandas()) == 0
    kz = chunk_tags(ds, _kb(), S=1000, keep_zero=True).to_pandas()
    assert list(zip(kz["doc_id"], kz["tag"], kz["score"])) == [
        (1, "infra", 0)]


def test_chunk_tags_empty_kb(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({"doc_id": pd.array([1], dtype="int64"),
                         "text": ["anything"]})
    ds_out = chunk_tags(rd.from_pandas(docs), [], keep_zero=True)
    assert ds_out.count() == 0
    # per-block schema stays typed (Ray may collapse the all-empty
    # dataset's driver-side schema, but each block is explicit Arrow)
    assert [f.name for f in ds_out.schema().base_schema] \
        == ["doc_id", "tag", "score", "c", "cnt"]


def test_tag_query_floors_scores_at_one():
    from ragflow_core16_ray.pipelines.tagging import tag_query

    kb = _kb()
    # same match as the chunk case, S=1000: raw score rounds to 0 but
    # the query-side contract floors kept tags at 1 (search.py:485)
    got = tag_query("ray data engine pipeline", kb, S=1000)
    assert got == {"infra": 1}
    # fully disjoint question -> no tags at all
    assert tag_query("qqq www eee", kb, S=10) == {}


def test_rank_feature_scores_matches_reference_loop(ray_session):
    """rank_feature_scores == the reference's _rank_feature_scores loop
    (search.py:249-272) on a hand-built tag table, including the
    no-tags → 0 and denor == 0 → 0 paths."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ragflow_core16_ray.pipelines.tagging import rank_feature_scores

    rows = pd.DataFrame({
        "doc_id": pd.array([1, 1, 2, 3, 3, 4], dtype="int64"),
        "tag": ["alpha", "beta", "gamma", "alpha", "gamma", "delta"],
        "score": pd.array([3, 1, 2, 5, 1, 0], dtype="int64")})
    q = {"alpha": 2, "gamma": 1}
    got = (rank_feature_scores(rd.from_pandas(rows), q).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    q_denor = np.sqrt(sum(s * s for s in q.values()))
    want = {}
    for did, g in rows.groupby("doc_id"):
        nor = sum(q.get(t, 0) * s for t, s in zip(g["tag"], g["score"]))
        denor = float((g["score"] ** 2).sum())
        fea = 0.0 if denor == 0 else nor / np.sqrt(denor) / q_denor
        want[did] = int(np.floor(fea * 10.0 * 1e6 + 0.5))
    assert dict(zip(got["doc_id"], got["rank_fea_q"])) == want
    assert want[4] == 0  # zero-score tags → denor 0 → 0
