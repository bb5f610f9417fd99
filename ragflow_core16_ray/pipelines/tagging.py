"""Chunk ↔ tag-KB assignment — the reference's retrieval-based content
tagging (rag/nlp/search.py:446-469 ``all_tags_in_portion`` +
``tag_content``), the non-LLM path of task_executor.py:334-355: a chunk
queries the tag knowledge base with its top keywords, the matched KB
rows' tags aggregate, and each candidate tag scores
``round(0.1·(c+1)/(cnt+S) / max(1e-6, p_tag))`` — matched-tag frequency
relative to its global KB prior. Chunks the retrieval can't tag fall to
the LLM in the reference (out of scope here; they simply emit no row).

Ray shape: the tag KB is a DIMENSION (thousands of (content, tags)
pairs, not corpus-scale), so it broadcasts once via ``ray.put`` as
pre-tokenized frozensets + the prior dict, and tagging is one streaming
``map_batches`` over the chunk stream — no shuffle, no index server
(the reference's ES match query becomes a keyword-overlap test against
the broadcast rows; substitution documented, semantics pinned by a
pure-Python replica fixture).
"""

from __future__ import annotations

import re

import pandas as pd
import ray
import ray.data as rd

_TOK_RE = re.compile(r"[A-Za-z0-9]+")


def _toks(text: str, min_len: int = 2) -> list[str]:
    return [w.lower() for w in _TOK_RE.findall(text) if len(w) >= min_len]


def build_tag_prior(kb_pairs: list[tuple[str, list[str]]],
                    S: int = 1000) -> dict[str, float]:
    """``all_tags_in_portion`` (search.py:451-455): per-tag KB frequency
    smoothed to (c+1)/(total+S)."""
    counts: dict[str, int] = {}
    for _, tags in kb_pairs:
        for t in tags:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    return {t: (c + 1) / (total + S) for t, c in counts.items()}


def tag_one(text: str, kb_tokens: list[frozenset],
            kb_tags: list[list[str]], prior: dict[str, float],
            topn_tags: int = 3, keywords_topn: int = 30,
            S: int = 1000) -> list[tuple[str, int]]:
    """``tag_content`` for one chunk (search.py:458-469): top keywords
    by (tf desc, term asc) — the dictionary-free stand-in for the
    term-weighted ES paragraph query — match KB rows sharing ≥1
    keyword, aggregate matched rows per tag, score with the reference's
    exact formula (Python round = banker's, kept verbatim), keep
    positive scores, top-n by (score desc, tag asc)."""
    tf: dict[str, int] = {}
    for w in _toks(text):
        tf[w] = tf.get(w, 0) + 1
    kws = frozenset(w for w, _ in sorted(
        tf.items(), key=lambda kv: (-kv[1], kv[0]))[:keywords_topn])
    if not kws:
        return []
    aggs: dict[str, int] = {}
    n_matched = 0
    for toks, tags in zip(kb_tokens, kb_tags):
        if kws & toks:
            n_matched += 1
            for t in tags:
                aggs[t] = aggs.get(t, 0) + 1
    if not aggs:
        return []
    cnt = sum(aggs.values())
    feats = [(a, round(0.1 * (c + 1) / (cnt + S)
                       / max(1e-6, prior.get(a, 0.0001))), c)
             for a, c in aggs.items()]
    feats = sorted(feats, key=lambda x: (-x[1], -x[2], x[0]))[:topn_tags]
    return [(a, int(s), int(c), int(cnt)) for a, s, c in feats]


def chunk_tags(docs: rd.Dataset,
               kb_pairs: list[tuple[str, list[str]]],
               topn_tags: int = 3, keywords_topn: int = 30,
               S: int = 1000, keep_zero: bool = False) -> rd.Dataset:
    """Tag every document/chunk against the KB. Output rows
    (doc_id, tag, score, c, cnt) — ≤ topn_tags per doc, ordered by the
    reference's score. ``keep_zero=False`` is the reference contract
    (only score>0 tags assign; everything else falls to its LLM path);
    ``keep_zero=True`` keeps the top candidates with their exact-int
    match counts (c = matched KB rows carrying the tag, cnt = total
    matched tag occurrences) — the retrieval evidence a word-soup
    corpus produces even when no tag clears the scoring bar."""
    prior = build_tag_prior(kb_pairs, S)
    kb_ref = ray.put(([frozenset(_toks(c)) for c, _ in kb_pairs],
                      [t for _, t in kb_pairs], prior))

    import pyarrow as pa

    def fn(batch: pd.DataFrame):
        kb_tokens, kb_tags, pri = ray.get(kb_ref)
        rows = []
        for did, text in zip(batch["doc_id"], batch["text"]):
            for tag, score, c, cnt in tag_one(
                    text, kb_tokens, kb_tags, pri,
                    topn_tags, keywords_topn, S):
                if score > 0 or keep_zero:
                    rows.append({"doc_id": did, "tag": tag,
                                 "score": score, "c": c, "cnt": cnt})
        # explicit Arrow schema: an all-empty partial as a pandas frame
        # has object key columns that trip Ray's block size estimator
        did_t = (pa.string() if batch["doc_id"].dtype == object
                 else pa.from_numpy_dtype(batch["doc_id"].to_numpy().dtype))
        schema = pa.schema([("doc_id", did_t), ("tag", pa.string()),
                            ("score", pa.int64()), ("c", pa.int64()),
                            ("cnt", pa.int64())])
        return pa.Table.from_pylist(rows, schema=schema)

    return docs.map_batches(fn, batch_format="pandas")


def tag_query(question: str, kb_pairs: list[tuple[str, list[str]]],
              topn_tags: int = 3, S: int = 1000) -> dict[str, int]:
    """Query-side tag inference (search.py:471-485 ``tag_query``): the
    SAME retrieval + scoring as chunk tagging, but for a user question
    at serving time, and with the reference's floor — every kept tag
    scores at least 1 (``max(1, c)``), because a query must always land
    somewhere. Driver-side by nature (one question, KB is a broadcast
    dimension)."""
    prior = build_tag_prior(kb_pairs, S)
    toks = [frozenset(_toks(c)) for c, _ in kb_pairs]
    tags = [t for _, t in kb_pairs]
    feats = tag_one(question, toks, tags, prior,
                    topn_tags=topn_tags, keywords_topn=10 ** 9, S=S)
    return {a: max(1, s) for a, s, _, _ in feats}


def rank_feature_scores(tag_rows: rd.Dataset,
                        query_rfea: dict[str, int],
                        value_col: str = "score") -> rd.Dataset:
    """Tag-feature rank boost (search.py:249-272
    ``_rank_feature_scores``): per document,
    ``10 · (Σ_t q[t]·sc[t]) / (√Σ sc² · √Σ q²)`` — the cosine between
    the query's inferred tag vector (tag_query) and the chunk's stored
    tag vector, scaled ×10; docs with no tags (or zero denominator)
    score 0. The reference adds a per-chunk PAGERANK field on top —
    absent from this corpus, so the additive term is 0 (the formula's
    own default). Every input is an exact int, so the double result is
    deterministic; emitted quantized ×1e6.

    Input: chunk_tags output rows (doc_id, tag, score, ...);
    ``value_col`` picks the stored tag value — "score" is the
    reference's TAG_FLD payload, "c" (exact match counts) is the
    keep_zero candidates' evidence on a corpus whose scores all floor
    to 0 (see chunk_tags). Per-block
    groupby is safe: a doc's ≤topn tag rows are emitted inside one
    chunk_tags output block. Output: (doc_id, rank_fea_q)."""
    import numpy as np

    q_denor = float(np.sqrt(sum(float(s) * float(s)
                                for s in query_rfea.values())))
    q_ref = ray.put((query_rfea, q_denor))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        q, qd = ray.get(q_ref)
        doc_ids, feas = [], []
        for did, g in batch.groupby("doc_id", sort=False):
            sc = g[value_col].to_numpy()
            nor = sum(float(q[t]) * float(s)
                      for t, s in zip(g["tag"], sc) if t in q)
            denor = float((sc.astype("float64") ** 2).sum())
            fea = 0.0 if (denor == 0 or qd == 0) \
                else nor / np.sqrt(denor) / qd
            doc_ids.append(did)
            feas.append(int(np.floor(fea * 10.0 * 1e6 + 0.5)))
        return pd.DataFrame({
            "doc_id": pd.array(doc_ids, dtype="int64"),
            "rank_fea_q": pd.array(feas, dtype="int64")})

    return tag_rows.map_batches(fn, batch_format="pandas",
                                batch_size=None)
