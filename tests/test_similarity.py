"""Similarity-search variants: exact brute-force is ground truth; the
LSH and IVF scale paths must scan a strict subset yet keep high recall on
the clustered synthetic embeddings."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _n_vecs():
    return pq.read_metadata(SF + "/embeddings.parquet").num_rows


def test_brute_topk_is_exact(ray_session):
    from ragflow_core16_ray.pipelines.similarity import brute_topk, load_query

    got = brute_topk(SF, query_vec_id=0, k=10)["vec_id"].tolist()
    # local ground truth
    t = pq.read_table(SF + "/embeddings.parquet")
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    q = load_query(SF, 0)
    q /= np.linalg.norm(q)
    sims = m @ q
    ids = np.array(t["vec_id"].to_pylist())
    want = ids[np.lexsort((ids, -sims))[:10]].tolist()
    assert got == want


def test_ivf_topk_subset_scan_high_recall(ray_session):
    from ragflow_core16_ray.pipelines.similarity import brute_topk, ivf_topk

    exact = set(brute_topk(SF, query_vec_id=0, k=10)["vec_id"])
    approx = ivf_topk(SF, query_vec_id=0, k=10, n_centroids=8, nprobe=4)
    assert 0 < approx["scanned"].iloc[0] < _n_vecs()  # strictly sub-linear
    recall = len(set(approx["vec_id"]) & exact) / len(exact)
    assert recall >= 0.8


def test_lsh_topk_subset_scan_recall(ray_session):
    from ragflow_core16_ray.pipelines.similarity import brute_topk, lsh_topk

    exact = set(brute_topk(SF, query_vec_id=0, k=10)["vec_id"])
    approx = lsh_topk(SF, query_vec_id=0, k=10, probe_hamming=1)
    scanned = int(approx["scanned"].iloc[0])
    # sub-linear: candidates scanned strictly fewer than the table
    assert 0 < scanned < _n_vecs()
    recall = len(set(approx["vec_id"]) & exact) / len(exact)
    # the sf0.001 embeddings are weakly clustered (top-10 cosine ≈ 0.3),
    # so the right bound is information-theoretic, not absolute: LSH must
    # beat a random scan of the same cost by ≥3× (a uniform sample of
    # `scanned` vectors would recall ≈ scanned/n in expectation)
    assert recall >= 3 * scanned / _n_vecs()
    assert recall >= 0.15


def test_minhash_lsh_candidate_recall(ray_session):
    """Candidate recall of banded MinHash-LSH vs exact Jaccard pairs: at
    the verified-pairs operating point (32 bands × 2 rows, est ≥ 0.25) a
    true pair at J=0.5 is missed w.p. (1-0.5²)³² ≈ 1e-4, so every exact
    pair must appear among candidates on this corpus."""
    from ragflow_core16_ray.pipelines.dedup import (jaccard_dup_pairs,
                                                    minhash_lsh_pairs)

    exact = jaccard_dup_pairs(SF)
    truth = set(zip(exact["id_a"], exact["id_b"]))
    cand = minhash_lsh_pairs(SF, est_threshold=0.25, n_bands=32)
    got = set(zip(cand["id_a"], cand["id_b"]))
    assert truth, "corpus should contain near-dup pairs"
    assert truth <= got  # full candidate recall at this operating point
    # and the default 16×4 banding still reaches the theory bound
    # (collision prob at J≥0.8 is ≥ 1-(1-0.8⁴)¹⁶ ≈ 0.9996)
    cand16 = minhash_lsh_pairs(SF, est_threshold=0.35)
    got16 = set(zip(cand16["id_a"], cand16["id_b"]))
    recall16 = len(truth & got16) / len(truth)
    assert recall16 >= 0.9


def test_ivf_centroids_deterministic():
    from ragflow_core16_ray.pipelines.similarity import train_centroids

    rng = np.random.RandomState(1)
    x = rng.normal(size=(200, 16))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    c1 = train_centroids(x, 4)
    c2 = train_centroids(x, 4)
    assert np.array_equal(c1, c2)


def test_length_histogram_counts(ray_session):
    from ragflow_core16_ray.pipelines.text_analysis import length_histogram

    df = length_histogram(SF)
    docs = pq.read_table(SF + "/documents.parquet").to_pandas()
    want = (docs["text"].str.len() // 100).value_counts().sort_index()
    assert list(df["bucket"]) == list(want.index)
    assert list(df["n"]) == list(want.values)


def test_stratified_sample_deterministic_and_rate_bound(ray_session):
    from ragflow_core16_ray.functions.hashing import md5_hex
    from ragflow_core16_ray.pipelines.text_analysis import (
        STRATA_RATES, sample_cutoff_hex, stratified_sample)

    a = stratified_sample(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = stratified_sample(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert a.equals(b)
    assert 0 < len(a) < _n_docs()
    # every kept doc satisfies its stratum's cutoff rule
    for d, lg in zip(a["doc_id"], a["lang_pred"]):
        assert md5_hex(str(d))[:8] < sample_cutoff_hex(STRATA_RATES[lg])


def _n_docs():
    return pq.read_metadata(SF + "/documents.parquet").num_rows


def test_near_dup_removal_drops_nonrepresentatives(ray_session):
    from ragflow_core16_ray.pipelines.dedup import (jaccard_clusters,
                                                    near_dup_removal)

    clusters = jaccard_clusters(SF)
    kept = set(near_dup_removal(SF).to_pandas()["doc_id"])
    for d, c in zip(clusters["doc_id"], clusters["cluster_id"]):
        if d == c:
            assert d in kept      # representatives survive
        else:
            assert d not in kept  # members are removed
    # docs outside any cluster survive
    all_ids = set(pq.read_table(SF + "/documents.parquet")
                  .column("doc_id").to_pylist())
    unclustered = all_ids - set(clusters["doc_id"])
    assert unclustered <= kept


def test_ivf_indexed_matches_fused_and_prunes_read(ray_session, tmp_path):
    """The partitioned-index path must return exactly what the fused IVF
    scan returns (same quantizer seed/sample → same probed cells → same
    candidate set), while reading only the probed cell partitions."""
    from ragflow_core16_ray.pipelines.similarity import (ivf_build_index,
                                                         ivf_topk,
                                                         ivf_topk_indexed)

    idx = str(tmp_path / "ivf_index")
    fused = ivf_topk(SF, query_vec_id=0, k=10, n_centroids=8, nprobe=4)
    indexed = ivf_topk_indexed(SF, index_dir=idx, query_vec_id=0, k=10,
                               n_centroids=8, nprobe=4)
    assert list(indexed["vec_id"]) == list(fused["vec_id"])
    # pruned read: rows read == rows the fused path masked in, < corpus
    assert int(indexed["scanned"].iloc[0]) == int(fused["scanned"].iloc[0])
    assert 0 < int(indexed["scanned"].iloc[0]) < _n_vecs()
    # the index is a real partitioned layout, reusable across queries
    import os
    cells = [d for d in os.listdir(idx) if d.startswith("cell=")]
    assert len(cells) > 4
    # second query hits the existing index (idempotent build)
    again = ivf_topk_indexed(SF, index_dir=idx, query_vec_id=3, k=5,
                             n_centroids=8, nprobe=4)
    assert len(again) == 5


def test_jaccard_max_doc_freq_stop_shingles(ray_session):
    """The hot-shingle mitigation: with a df cap, stop-shingles are
    dropped before the quadratic self-merge — the cap can only LOSE
    pairs, never invent them, and the default (None) measure is
    unchanged."""
    from ragflow_core16_ray.pipelines.dedup import jaccard_dup_pairs

    exact = jaccard_dup_pairs(SF, k=3, threshold=0.5)
    capped = jaccard_dup_pairs(SF, k=3, threshold=0.5, max_doc_freq=2)
    exact_set = set(zip(exact["id_a"], exact["id_b"]))
    capped_set = set(zip(capped["id_a"], capped["id_b"]))
    assert capped_set <= exact_set
    # a tight cap on this corpus must actually drop something somewhere
    # (near-dup docs share shingles with df >= 2 by construction)
    assert len(capped_set) < len(exact_set) or len(exact_set) == 0


def test_approx_distinct_words_hll_accuracy(ray_session):
    """HLL sketch: deterministic, and within the theoretical error band
    of the exact distinct count (≈1.04/√m ⇒ use a generous 5% bound at
    p=12)."""
    from ragflow_core16_ray.pipelines.text_analysis import (
        approx_distinct_words)

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["text"]).to_pandas()
    exact = len({w for t in docs["text"] for w in t.split()})
    a = approx_distinct_words(SF)
    b = approx_distinct_words(SF)
    est = int(a["n_distinct_est"].iloc[0])
    assert est == int(b["n_distinct_est"].iloc[0])  # deterministic
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_top_bigrams_matches_local_count(ray_session):
    from ragflow_core16_ray.pipelines.text_analysis import top_bigrams

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["text"]).to_pandas()
    from collections import Counter
    want = Counter()
    for t in docs["text"]:
        ts = t.split()
        want.update(a + " " + b for a, b in zip(ts, ts[1:]))
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = top_bigrams(SF, k=20)
    assert list(got["bigram"]) == [b for b, _ in top]
    assert list(got["cnt"]) == [c for _, c in top]


def test_term_weights_tf_df_rank(ray_session):
    """tf/df exact vs a local recompute; ranks dense 1..k per doc with the
    (tf desc, df asc, term asc) order."""
    import re
    from collections import Counter

    from ragflow_core16_ray.pipelines.text_analysis import term_weights

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    tok = re.compile(r"[A-Za-z0-9]+")
    tf = {}
    df = Counter()
    for did, t in zip(docs["doc_id"], docs["text"]):
        c = Counter(w.lower() for w in tok.findall(t) if len(w) >= 2)
        tf[did] = c
        df.update(c.keys())

    got = term_weights(SF, k=5).to_pandas()
    for did, g in got.groupby("doc_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        want = sorted(tf[did].items(),
                      key=lambda kv: (-kv[1], df[kv[0]], kv[0]))[:5]
        assert list(g["term"]) == [w for w, _ in want]
        assert list(g["tf"]) == [c for _, c in want]
        assert list(g["df"]) == [df[w] for w, _ in want]
    # every doc with at least one token appears
    n_docs_with_terms = sum(1 for c in tf.values() if c)
    assert got["doc_id"].nunique() == n_docs_with_terms


def test_repetition_stats_matches_local_count(ray_session):
    """Gopher-style counters vs a local Counter recompute per doc."""
    from collections import Counter

    from ragflow_core16_ray.pipelines.text_analysis import repetition_stats

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    got = repetition_stats(SF).to_pandas().set_index("doc_id")
    n_expected = 0
    for did, t in zip(docs["doc_id"], docs["text"]):
        ws = t.split()
        if not ws:
            assert did not in got.index
            continue
        n_expected += 1
        r = got.loc[did]
        wc = Counter(ws)
        bc = Counter(a + " " + b for a, b in zip(ws, ws[1:]))
        tc = Counter(" ".join(g) for g in zip(ws, ws[1:], ws[2:]))
        assert r["n_words"] == len(ws)
        assert r["max_word_cnt"] == max(wc.values())
        assert r["n_bigrams"] == max(len(ws) - 1, 0)
        assert r["top_bigram_cnt"] == (max(bc.values()) if bc else 0)
        assert r["n_trigrams"] == max(len(ws) - 2, 0)
        assert r["dup_trigram_cnt"] == sum(c for c in tc.values() if c > 1)
    assert len(got) == n_expected


def test_decontam_ngrams_flags_eval_overlap(ray_session):
    """Every doc sharing a 5-gram with the eval split has n_hits > 0;
    n_grams/n_hits match a local set recompute; eval docs are excluded."""
    from ragflow_core16_ray.pipelines.text_analysis import decontam_ngrams

    n, mod = 5, 29
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()

    def grams(t):
        ws = t.split()
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    ev = set()
    for did, t in zip(docs["doc_id"], docs["text"]):
        if did % mod == 0:
            ev |= grams(t)
    assert ev, "fixture must have a non-empty eval split"

    got = decontam_ngrams(SF, n=n, eval_mod=mod).to_pandas()
    assert (got["doc_id"] % mod != 0).all()
    by_id = got.set_index("doc_id")
    for did, t in zip(docs["doc_id"], docs["text"]):
        if did % mod == 0:
            continue
        gs = grams(t)
        if not gs:
            assert did not in by_id.index
            continue
        assert by_id.loc[did, "n_grams"] == len(gs)
        assert by_id.loc[did, "n_hits"] == len(gs & ev)


def test_winnow_fps_guarantee_and_rightmost_min(ray_session):
    """The winnowing guarantee: two docs sharing a substring of length
    ≥ k + w - 1 share at least one fingerprint; selection picks the
    rightmost window minimum (checked against a naive reimplementation)."""
    import hashlib

    from ragflow_core16_ray.pipelines.dedup import winnow_fps

    k, w = 16, 8
    shared = "the quick brown fox jumps over it"  # 33 ≥ k+w-1 = 23
    a = "left padding text then " + shared + " tail a"
    b = "completely different lead-in " + shared + " other end"
    fa, fb = winnow_fps(a, k, w), winnow_fps(b, k, w)
    assert set(fa.tolist()) & set(fb.tolist())

    def md5h(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                              "little")

    def naive(text):
        hs = [md5h(text[i:i + k]) for i in range(len(text) - k + 1)]
        if len(hs) < w:
            return set()
        sel = set()
        for p in range(len(hs) - w + 1):
            win = hs[p:p + w]
            m = min(win)
            sel.add(hs[p + max(i for i, v in enumerate(win) if v == m)])
        return sel

    for t in (a, b, "short", "x" * 40, "ab" * 30):
        assert set(winnow_fps(t, k, w).tolist()) == naive(t), t


def test_winnow_matches_counts_shared_fps(ray_session):
    """Pair counts equal a local distinct-fingerprint intersection."""
    from collections import Counter

    from ragflow_core16_ray.pipelines.dedup import winnow_fps, winnow_matches

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    fps = {did: set(winnow_fps(t).tolist())
           for did, t in zip(docs["doc_id"], docs["text"])}
    want = Counter()
    ids = sorted(fps)
    inv = {}
    for did in ids:
        for f in fps[did]:
            inv.setdefault(f, []).append(did)
    for f, ds in inv.items():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                want[(ds[i], ds[j])] += 1
    want = {p: c for p, c in want.items() if c >= 2}

    got = winnow_matches(SF, min_shared=2)
    got_d = {(a, b): c for a, b, c in
             zip(got["id_a"], got["id_b"], got["n_shared"])}
    assert got_d == want


def test_dup_passage_stats_matches_local(ray_session):
    """Per-doc passage counts equal a local Counter recompute; docs
    shorter than one passage emit nothing."""
    from collections import Counter

    from ragflow_core16_ray.pipelines.dedup import dup_passage_stats

    P = 10
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    passages = {}
    global_cnt = Counter()
    for did, t in zip(docs["doc_id"], docs["text"]):
        ws = t.split()
        ps = [" ".join(ws[j * P:(j + 1) * P]) for j in range(len(ws) // P)]
        passages[did] = ps
        global_cnt.update(ps)

    got = dup_passage_stats(SF, passage_words=P).to_pandas()
    got = got.set_index("doc_id")
    for did, ps in passages.items():
        if not ps:
            assert did not in got.index
            continue
        assert got.loc[did, "n_passages"] == len(ps)
        assert got.loc[did, "n_dup_passages"] == sum(
            1 for p in ps if global_cnt[p] > 1)
    assert len(got) == sum(1 for ps in passages.values() if ps)


def test_bm25_topk_matches_local_recompute(ray_session):
    """Distributed scatter-gather BM25 equals a single-process recompute
    of the same Okapi formula over the whole corpus (exact, not just
    top-k overlap), proving the per-batch top-k merge loses nothing."""
    import math

    from ragflow_core16_ray.pipelines.similarity import bm25_topk

    k1, b, terms, k = 1.2, 0.75, ["hash", "table", "scan"], 10
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs[docs["text"].str.strip() != ""]
    split = [t.split() for t in docs["text"]]
    n = len(split)
    avgdl = sum(len(ws) for ws in split) / n
    dfs = {t: sum(1 for ws in split if t in ws) for t in terms}
    idf = {t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
           for t in terms}
    scores = []
    for did, ws in zip(docs["doc_id"], split):
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            s += idf[t] * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(ws) / avgdl))
        q = round(s * 1e6)
        if q > 0:
            scores.append((did, int(q)))
    want = sorted(scores, key=lambda x: (-x[1], x[0]))[:k]

    got = bm25_topk(SF, k=k)
    assert list(got["rank"]) == list(range(1, len(want) + 1))
    assert list(zip(got["doc_id"], got["score_q"])) == want


def test_lm_quality_rank_is_a_permutation(ray_session):
    """Ranks are a dense 1..N permutation ordered by (avg_logprob_q desc,
    doc_id asc), and scores match a local unigram-LM recompute."""
    import math
    from collections import Counter

    from ragflow_core16_ray.pipelines.text_analysis import lm_quality_rank

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs[docs["text"].str.strip() != ""]
    cnt = Counter(w for t in docs["text"] for w in t.split())
    denom = sum(cnt.values()) + len(cnt)
    want_q = {}
    for did, t in zip(docs["doc_id"], docs["text"]):
        ws = t.split()
        lp = sum(math.log((cnt[w] + 1.0) / denom) for w in ws)
        want_q[did] = round(lp / len(ws) * 1e6)

    got = lm_quality_rank(SF).to_pandas()
    assert len(got) == len(want_q)
    assert dict(zip(got["doc_id"], got["avg_logprob_q"])) == want_q
    ordered = got.sort_values("rank")
    assert list(ordered["rank"]) == list(range(1, len(got) + 1))
    keys = list(zip(-ordered["avg_logprob_q"], ordered["doc_id"]))
    assert keys == sorted(keys)


def test_pack_sequences_layout_invariants(ray_session):
    """Within every shard: contiguous non-overlapping token stream in
    doc_id order; bin spans consistent with the 256 budget; totals match
    token counts."""
    from ragflow_core16_ray.pipelines.text_analysis import pack_sequences

    budget = 256
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    toklen = {did: len(t.split())
              for did, t in zip(docs["doc_id"], docs["text"])
              if t.split()}

    got = pack_sequences(SF, budget=budget).to_pandas()
    assert set(got["doc_id"]) == set(toklen)
    assert (got["n_tokens"].values ==
            [toklen[d] for d in got["doc_id"]]).all()
    for _, g in got.groupby("shard"):
        g = g.sort_values("doc_id")
        # contiguous: each start is the previous end
        ends = (g["start_offset"] + g["n_tokens"]).values
        assert g["start_offset"].iloc[0] == 0
        assert (g["start_offset"].values[1:] == ends[:-1]).all()
        assert (g["first_bin"] == g["start_offset"] // budget).all()
        assert (g["last_bin"] ==
                (g["start_offset"] + g["n_tokens"] - 1) // budget).all()
        assert (g["doc_id"] % 16 == g["shard"]).all()


def test_corpus_shuffle_deterministic_balanced_permutation(ray_session):
    """Same salt → identical placement; different salt → different order;
    per-shard positions dense from 0; all docs present exactly once."""
    from ragflow_core16_ray.pipelines.text_analysis import corpus_shuffle

    a = corpus_shuffle(SF).to_pandas().sort_values("doc_id")
    b = corpus_shuffle(SF).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    c = corpus_shuffle(SF, salt="epoch1").to_pandas().sort_values("doc_id")
    assert not a[["shard", "pos"]].reset_index(drop=True).equals(
        c[["shard", "pos"]].reset_index(drop=True))
    n = pq.read_metadata(SF + "/documents.parquet").num_rows
    assert len(a) == n and a["doc_id"].is_unique
    for _, g in a.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))


def test_source_vocab_matches_local(ray_session):
    from collections import Counter

    from ragflow_core16_ray.pipelines.text_analysis import source_vocab

    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    per_src = {}
    for s, t in zip(docs["source"], docs["text"]):
        per_src.setdefault(s, Counter()).update(t.split())
    got = source_vocab(SF)
    assert set(got["source"]) == set(per_src)
    for _, r in got.iterrows():
        c = per_src[r["source"]]
        assert r["n_types"] == len(c)
        assert r["n_tokens"] == sum(c.values())
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (r["top_word"], r["top_word_cnt"]) == best


def _local_kmeans(k=8, iters=5):
    """Driver-free replica of kmeans_clusters' exact arithmetic: seeds =
    first k rows in file order, argmin ties to the lowest cluster."""
    t = pq.read_table(SF + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    ids = np.array(t["vec_id"].to_pylist(), dtype="int64")
    cents = m[:k].copy()
    for _ in range(iters):
        d2 = -2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)
        assign = np.argmin(d2, axis=1)
        new = cents.copy()
        for c in range(k):
            sel = m[assign == c]
            if len(sel):
                new[c] = sel.sum(axis=0) / len(sel)
        cents = new
    d2 = -2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)
    return ids, np.argmin(d2, axis=1), m


def test_kmeans_matches_local_lloyd(ray_session):
    from ragflow_core16_ray.pipelines.similarity import kmeans_clusters

    got = (kmeans_clusters(SF, k=8, iters=5).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    ids, want, _ = _local_kmeans(8, 5)
    order = np.argsort(ids)
    assert got["vec_id"].tolist() == ids[order].tolist()
    assert got["cluster"].tolist() == want[order].tolist()
    # every cluster is used on the clustered synthetic embeddings
    assert got["cluster"].nunique() > 1


def test_kmeans_deterministic_across_runs(ray_session):
    from ragflow_core16_ray.pipelines.similarity import kmeans_clusters

    a = (kmeans_clusters(SF, k=4, iters=3).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (kmeans_clusters(SF, k=4, iters=3).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    assert a["cluster"].tolist() == b["cluster"].tolist()


def test_semantic_dedup_exact_within_clusters(ray_session):
    from ragflow_core16_ray.pipelines.dedup import semantic_dedup

    thr = 0.4
    got = semantic_dedup(SF, k=8, iters=5, threshold=thr)
    pairs = set(zip(got["vec_id_a"], got["vec_id_b"]))

    ids, assign, m = _local_kmeans(8, 5)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    ia, ib = np.triu_indices(len(ids), k=1)
    true_mask = sims[ia, ib] >= thr
    id_a, id_b = ids[ia], ids[ib]
    true_pairs = {(min(a, b), max(a, b))
                  for a, b in zip(id_a[true_mask], id_b[true_mask])}
    same_cluster = {(min(a, b), max(a, b))
                    for a, b, t in zip(id_a, id_b,
                                       assign[ia] == assign[ib])
                    if t}
    # precision 1.0: every emitted pair is a true cosine>=thr pair
    assert pairs <= true_pairs
    # exact within clusters: every true pair that shares a cluster is found
    assert (true_pairs & same_cluster) <= pairs
    # and the pass actually finds dups on the clustered synthetic data
    assert len(pairs) > 0


def test_hybrid_topk_fuses_both_arms(ray_session):
    from ragflow_core16_ray.pipelines.similarity import (brute_topk,
                                                         bm25_topk,
                                                         hybrid_topk)

    fused = hybrid_topk(SF, k=10, k_each=20)
    assert len(fused) == 10
    assert fused["rrf_q"].is_monotonic_decreasing
    lex = set(bm25_topk(SF, k=20)["doc_id"])
    vec = set(brute_topk(SF, k=20)["vec_id"])
    # every fused doc came from at least one arm
    assert set(fused["doc_id"]) <= (lex | vec)
    # a doc present in BOTH arms collects two contributions: its score
    # must strictly exceed the single-arm score of the worst-ranked doc
    both = set(fused["doc_id"]) & lex & vec
    if both:
        import math
        single_max = int(1e9 // 61 + 1)  # best possible single-arm score
        best_both = fused.set_index("doc_id").loc[list(both), "rrf_q"].max()
        assert best_both > single_max // 2


def test_pq_topk_recall_vs_brute(ray_session):
    from ragflow_core16_ray.pipelines.similarity import brute_topk, pq_topk

    exact = set(brute_topk(SF, query_vec_id=0, k=10)["vec_id"])
    approx = pq_topk(SF, query_vec_id=0, k=10)
    assert len(approx) == 10
    recall = len(set(approx["vec_id"]) & exact) / len(exact)
    assert recall >= 0.6  # 32x compression trades recall; bound pins it
    # deterministic across runs
    again = pq_topk(SF, query_vec_id=0, k=10)
    assert approx["vec_id"].tolist() == again["vec_id"].tolist()


def test_label_propagation_matches_union_find_on_graph(ray_session):
    """Distributed min-label CC on a hand graph: a 5-node chain fed in
    the direction that forces the min label to travel the full diameter
    (multiple propagation rounds), a star, and an isolated pair."""
    import pandas as pd

    from ragflow_core16_ray.pipelines.dedup import _cc_label_propagation

    pairs = pd.DataFrame({
        "id_a": [5, 4, 3, 2, 10, 10, 30],
        "id_b": [4, 3, 2, 1, 11, 12, 31],
    })
    out = _cc_label_propagation(pairs, n_buckets=4)
    assert list(zip(out["doc_id"], out["cluster_id"])) == [
        (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
        (10, 10), (11, 10), (12, 10), (30, 30), (31, 30)]

    empty = _cc_label_propagation(pairs.iloc[:0])
    assert empty.empty and list(empty.columns) == ["doc_id", "cluster_id"]


def test_jaccard_clusters_dist_equals_union_find(ray_session):
    """The fully distributed label-propagation variant must reproduce
    the driver union-find clustering exactly on the real corpus."""
    import pandas as pd

    from ragflow_core16_ray.pipelines.dedup import (jaccard_clusters,
                                                    jaccard_clusters_dist)

    a = jaccard_clusters(SF).reset_index(drop=True)
    b = jaccard_clusters_dist(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_near_dup_removal_scalable_equals_exact(ray_session):
    """The all-scale-shape composition (LSH+verify pairs, distributed
    CC, broadcast drop-set) must keep exactly the docs the exact
    variant keeps."""
    from ragflow_core16_ray.pipelines.dedup import (near_dup_removal,
                                                    near_dup_removal_scalable)

    want = sorted(near_dup_removal(SF).to_pandas()["doc_id"])
    got = sorted(near_dup_removal_scalable(SF).to_pandas()["doc_id"])
    assert got == want


def test_label_propagation_nonconvergence_raises(ray_session):
    """A graph needing more relax rounds than max_iters must raise,
    never return wrong labels silently. With pointer jumping a monotone
    chain collapses in one round, so use a two-valley graph (0-5, 5-1):
    round 1 pulls 0 onto node 5 but node 1 keeps its own smaller label
    (1 < 5), so a second relax is required to reach 1 — and a third to
    observe the fixpoint."""
    import pandas as pd
    import pytest

    from ragflow_core16_ray.pipelines.dedup import _cc_label_propagation

    valleys = pd.DataFrame({"id_a": [0, 5], "id_b": [5, 1]})
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_label_propagation(valleys, n_buckets=2, max_iters=2)


def test_ngram_novelty_exact_dup_owns_nothing(ray_session):
    """Exact duplicate docs: only the min doc_id owns their shared
    grams; totals are consistent with the shingle sets."""
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.dedup import _shingles, ngram_novelty

    got = ngram_novelty(SF).set_index("doc_id")
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    # local replica on a sample of docs
    sh = {d: _shingles(t) for d, t in zip(docs["doc_id"], docs["text"])
          if t.strip()}
    owner = {}
    for d in sorted(sh):
        for g in sh[d]:
            owner.setdefault(g, d)
    for d in list(sorted(sh))[:50]:
        assert got.loc[d, "n_grams"] == len(sh[d])
        assert got.loc[d, "n_novel"] == sum(owner[g] == d for g in sh[d])
    # and on a hand corpus: a verbatim restatement owns nothing
    import os

    import pandas as pd
    import pyarrow as pa

    tmp = "/tmp/novelty_fixture"
    os.makedirs(tmp, exist_ok=True)
    df = pd.DataFrame({
        "doc_id": pd.array([0, 1, 2], dtype="int64"),
        "text": ["alpha beta gamma delta", "alpha beta gamma delta",
                 "epsilon zeta eta theta"],
        "lang": ["en"] * 3, "source": ["src0"] * 3,
        "n_chars": pd.array([22, 22, 22], dtype="int64")})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp, "documents.parquet"))
    h = ngram_novelty(tmp).set_index("doc_id")
    assert h.loc[0, "n_novel"] == h.loc[0, "n_grams"] == 2
    assert h.loc[1, "n_novel"] == 0 and h.loc[1, "n_grams"] == 2
    assert h.loc[2, "n_novel"] == 2


def test_brute_topk_batch_matches_single(ray_session):
    """Each query's slice of the batched result equals the single-query
    brute top-k."""
    from ragflow_core16_ray.pipelines.similarity import (brute_topk,
                                                         brute_topk_batch)

    batch = brute_topk_batch(SF, query_vec_ids=(0, 3, 7))
    for q in (0, 3, 7):
        single = brute_topk(SF, query_vec_id=q)["vec_id"].tolist()
        sliced = (batch[batch["query_vec_id"] == q]
                  .sort_values("rank")["vec_id"].tolist())
        assert sliced == single


def test_coreset_single_bucket_equals_exact_greedy(ray_session):
    """n_buckets=1 routes the whole table through one local FPS — must
    equal a driver-side numpy replica of greedy k-center exactly."""
    import numpy as np
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.similarity import (_fps_greedy, _norm,
                                                         coreset_sample)

    sf = "/root/testdata/sf0.001"
    got = coreset_sample(sf, k=16, n_buckets=1)
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    x = _norm(np.array(t["embedding"].to_pylist(), dtype=np.float64))
    order = np.argsort(ids, kind="stable")
    ids, x = ids[order], x[order]
    want = ids[_fps_greedy(ids, x, 16)]
    assert got["vec_id"].tolist() == want.tolist()
    assert got["selection_order"].tolist() == list(range(16))
    assert got["gap_q"].iloc[0] == 0 and (got["gap_q"].iloc[1:] > 0).all()
    # FPS invariant: the coverage gap never increases along the curve
    assert (np.diff(got["gap_q"].iloc[1:]) <= 0).all()


def test_coreset_two_level_radius_bound(ray_session):
    """The composable two-level FPS keeps coverage radius within 2× of
    single-level greedy (the classic composable-coreset bound), and is
    deterministic across calls."""
    import numpy as np
    import pyarrow.parquet as pq

    from ragflow_core16_ray.pipelines.similarity import _norm, coreset_sample

    sf = "/root/testdata/sf0.001"
    k = 16
    two = coreset_sample(sf, k=k, n_buckets=16)
    again = coreset_sample(sf, k=k, n_buckets=16)
    assert two["vec_id"].tolist() == again["vec_id"].tolist()
    one = coreset_sample(sf, k=k, n_buckets=1)

    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    x = _norm(np.array(t["embedding"].to_pylist(), dtype=np.float64))

    def radius(sel_ids):
        sel = x[np.isin(ids, np.asarray(sel_ids))]
        d = np.linalg.norm(x[:, None, :] - sel[None, :, :], axis=2)
        return d.min(axis=1).max()

    assert radius(two["vec_id"]) <= 2.0 * radius(one["vec_id"]) + 1e-9


def test_bm25_indexed_equals_streaming(ray_session, tmp_path):
    """The posting-list index returns bit-identical quantized scores to
    the streaming corpus scan for hit-rich, sparse and zero-hit
    queries; the index only reads the query terms' bucket partitions."""
    import os

    import pandas as pd

    from ragflow_core16_ray.pipelines.similarity import (bm25_build_index,
                                                         bm25_topk,
                                                         bm25_topk_indexed)

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "bm25_idx")
    bm25_build_index(sf, idx)
    assert os.path.exists(os.path.join(idx, "_INDEX_DONE"))
    n_parts = len([d for d in os.listdir(idx) if d.startswith("bucket=")])
    assert n_parts > 1  # partitioned, not one blob
    for q in ("hash table scan", "merge sort join", "window",
              "zzz-nonexistent-term"):
        a = bm25_topk(sf, query=q).reset_index(drop=True)
        b = bm25_topk_indexed(sf, index_dir=idx, query=q) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b), q


def test_hybrid_indexed_exhaustive_probe_equals_streaming(ray_session):
    """With nprobe = n_centroids the IVF arm scans every cell (exact),
    so the fully-indexed hybrid equals the streaming hybrid bit-for-bit;
    the default pruned probe still returns a full well-formed top-k."""
    import pandas as pd

    from ragflow_core16_ray.pipelines.similarity import (hybrid_indexed_topk,
                                                         hybrid_topk)

    sf = "/root/testdata/sf0.001"
    want = hybrid_topk(sf)
    got = hybrid_indexed_topk(sf, nprobe=16, n_centroids=16)
    pd.testing.assert_frame_equal(got, want)
    pruned = hybrid_indexed_topk(sf, nprobe=4, n_centroids=16)
    assert list(pruned.columns) == ["rank", "doc_id", "rrf_q"]
    assert len(pruned) == 10
    assert pruned["rrf_q"].is_monotonic_decreasing


def test_bm25_indexed_duplicate_terms_and_digest_keying(ray_session,
                                                        tmp_path):
    """Duplicate query terms score once per OCCURRENCE in both paths
    (the index weights each unique term by its multiplicity), and the
    default index cache keys on the DOCUMENTS table's content — two
    corpora differing only in documents.parquet get different dirs."""
    import pandas as pd

    from ragflow_core16_ray.pipelines.similarity import (_corpus_digest,
                                                         bm25_topk,
                                                         bm25_topk_indexed)

    sf = "/root/testdata/sf0.001"
    a = bm25_topk(sf, query="scan scan table").reset_index(drop=True)
    b = bm25_topk_indexed(sf, index_dir=str(tmp_path / "dup_idx"),
                          query="scan scan table").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # duplicates must actually matter (not be collapsed): the doubled
    # term outranks the single-occurrence ranking for some doc
    single = bm25_topk(sf, query="scan table").reset_index(drop=True)
    assert not a.equals(single)

    import shutil

    d1, d2 = tmp_path / "c1", tmp_path / "c2"
    for d in (d1, d2):
        d.mkdir()
        shutil.copy(f"{sf}/embeddings.parquet", d / "embeddings.parquet")
    shutil.copy(f"{sf}/documents.parquet", d1 / "documents.parquet")
    # different documents content, same embeddings
    pd.DataFrame({"doc_id": [1], "text": ["totally different corpus"]}) \
        .to_parquet(d2 / "documents.parquet")
    assert (_corpus_digest(str(d1), "documents.parquet")
            != _corpus_digest(str(d2), "documents.parquet"))
    # while the embeddings digests (the IVF key) are identical sizes —
    # proving the BM25 key would have been blind to this change
    # (mtimes differ across copies, so compare what the key protects)
    assert (_corpus_digest(str(d1), "documents.parquet")
            != _corpus_digest(str(d1), "embeddings.parquet"))


def test_knn_label_accuracy_matches_local_replica(ray_session):
    """Distributed streaming top-k merge == a single-machine numpy
    leave-one-out kNN on the same quantized grid. (The synthetic
    label column is near-independent of embedding geometry — measured
    intra/inter pair distances 1.390 vs 1.412 — so accuracy sits near
    the 10-class chance floor; the probe measures it, whatever it is,
    and the test pins exact per-label counts, not a quality bar.)"""
    import pandas as pd

    from ragflow_core16_ray.pipelines.similarity import (_quantize,
                                                         knn_label_accuracy)

    got = knn_label_accuracy(SF, k=10, eval_every=5)
    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    Q = _quantize(np.stack(t["embedding"].to_numpy()))
    ids = t["vec_id"].to_numpy(np.int64)
    labels = t["label"].to_numpy(np.int64)
    ev = np.where(ids % 5 == 0)[0]
    d2 = ((Q[ev] ** 2).sum(1)[:, None] + (Q ** 2).sum(1)[None, :]
          - 2.0 * (Q[ev] @ Q.T))
    d2[np.equal(ids[ev][:, None], ids[None, :])] = np.inf
    rows = []
    for i, e in enumerate(ev):
        order = np.lexsort((ids, d2[i]))[:10]
        votes = pd.Series(labels[order]).value_counts()
        best = votes[votes == votes.max()].index.min()
        rows.append((labels[e], best == labels[e]))
    rep = (pd.DataFrame(rows, columns=["label", "correct"])
           .groupby("label")
           .agg(n_eval=("correct", "size"), n_correct=("correct", "sum"))
           .reset_index())
    assert got["label"].tolist() == rep["label"].tolist()
    assert got["n_eval"].tolist() == rep["n_eval"].tolist()
    assert got["n_correct"].tolist() == rep["n_correct"].tolist()
    assert int(got["n_eval"].sum()) == len(ev)


def test_radius_counts_match_local_and_include_zeros(ray_session):
    from ragflow_core16_ray.pipelines.similarity import (
        _Q_SCALE, _quantize, radius_neighbor_counts)

    got = radius_neighbor_counts(SF, radius=1.2, eval_every=5)
    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id").reset_index(drop=True)
    Q = _quantize(np.stack(t["embedding"].to_numpy()))
    ids = t["vec_id"].to_numpy(np.int64)
    ev = np.where(ids % 5 == 0)[0]
    thr = float(int(np.floor(1.2 * _Q_SCALE + 0.5)) ** 2)
    d2 = ((Q[ev] ** 2).sum(1)[:, None] + (Q ** 2).sum(1)[None, :]
          - 2.0 * (Q[ev] @ Q.T))
    within = (d2 <= thr) & ~np.equal(ids[ev][:, None], ids[None, :])
    assert got["vec_id"].tolist() == ids[ev].tolist()  # zeros included
    assert got["n_within"].tolist() == within.sum(1).tolist()


def test_embedding_gram_matches_local_exact(ray_session):
    from ragflow_core16_ray.pipelines.similarity import (_quantize,
                                                         embedding_gram)

    got = embedding_gram(SF)
    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    Q = _quantize(np.stack(t["embedding"].to_numpy())).astype(np.int64)
    G = Q.T @ Q
    d = Q.shape[1]
    iu, ju = np.triu_indices(d)
    assert len(got) == d * (d + 1) // 2
    assert got["i"].tolist() == iu.tolist()
    assert got["j"].tolist() == ju.tolist()
    assert got["g"].tolist() == G[iu, ju].tolist()


def test_embedding_gram_partition_invariant(ray_session):
    """The combiner-tree sum is exact whatever the batching — rerunning
    must reproduce identical int64 entries (no float accumulation)."""
    from ragflow_core16_ray.pipelines.similarity import embedding_gram

    a = embedding_gram(SF)
    b = embedding_gram(SF)
    assert a.equals(b)


def test_pca_spectrum_matches_numpy_covariance(ray_session):
    from ragflow_core16_ray.pipelines.similarity import (_Q_SCALE,
                                                         _quantize,
                                                         pca_spectrum)

    got = pca_spectrum(SF)
    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    Q = _quantize(np.stack(t["embedding"].to_numpy()))
    X = Q / _Q_SCALE
    cov = np.cov(X, rowvar=False, bias=True)
    ev = np.linalg.eigvalsh(cov)[::-1]
    want_q = np.floor(ev * 1e6 + 0.5).astype(np.int64)
    assert got["eigval_q"].tolist() == want_q.tolist()
    # descending order and the trace identity (Σλ == Σ var_i)
    assert (np.diff(got["eigval_q"].to_numpy()) <= 0).all()
    assert got["rank"].tolist() == list(range(len(ev)))
    # cumulative variance ends at 100% (quantized)
    assert int(got["cum_var_q"].iloc[-1]) == 1_000_000


def _agreement_fixture(tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq_

    texts = [
        "alpha beta gamma delta epsilon zeta",   # text pair with 1
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six",           # text pair with 3
        "one two three four five six",
        "nothing shared here at all truly",      # emb pair with 5, no text
        "completely different words appear now",
    ]
    docs = pd.DataFrame({
        "doc_id": pd.array(range(6), dtype="int64"),
        "text": texts,
        "lang": ["en"] * 6,
        "source": ["s"] * 6,
        "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
    })
    e = np.zeros((6, 8), dtype=np.float32)
    e[0, 0] = e[1, 0] = 1.0   # emb pair (0,1) — agrees with text
    e[2, 1] = 1.0
    e[3, 2] = 1.0             # (2,3) orthogonal: text pair only
    e[4, 3] = e[5, 3] = 1.0   # emb pair (4,5) — no text overlap
    emb = pd.DataFrame({
        "vec_id": pd.array(range(6), dtype="int64"),
        "embedding": list(e),
        "label": pd.array([0] * 6, dtype="int32"),
    })
    pq_.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                    str(tmp_path / "documents.parquet"))
    pq_.write_table(pa.Table.from_pandas(emb, preserve_index=False),
                    str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_emb_text_dup_agreement_fixture(ray_session, tmp_path):
    from ragflow_core16_ray.pipelines.dedup import emb_text_dup_agreement

    sf = _agreement_fixture(tmp_path)
    got = emb_text_dup_agreement(sf)
    assert got.iloc[0].tolist() == [2, 2, 1, 500000, 500000]


def test_emb_text_dup_agreement_matches_oracle(ray_session, tmp_path):
    import duckdb
    import pandas as pd

    import __ray_entry__ as e
    from ragflow_core16_ray.pipelines.dedup import emb_text_dup_agreement

    sf = _agreement_fixture(tmp_path)
    got = emb_text_dup_agreement(sf)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(e.oracle_sql()["emb_text_dup_agreement"]).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_minhash_estimator_accuracy_replica_and_bound(ray_session):
    """The distributed estimate/exact pairing equals a single-machine
    replica, and every estimate sits within the Broder concentration
    bound for 64 permutations (4σ ≤ 0.25 ⇒ |est − J| ≤ 0.25 + the
    1e-6 quantization)."""
    import pandas as pd

    from ragflow_core16_ray.pipelines.dedup import (
        _shingle_hashes31, _shingles, minhash_estimator_accuracy,
        minhash_signature)

    got = minhash_estimator_accuracy(SF)
    assert len(got) > 0, "corpus should contain LSH candidate pairs"
    docs = pq.read_table(SF + "/documents.parquet").to_pandas()
    txt = dict(zip(docs["doc_id"], docs["text"]))
    for _, r in got.iterrows():
        a, b = txt[r["id_a"]], txt[r["id_b"]]
        sa = minhash_signature(_shingle_hashes31(a, 3))
        sb = minhash_signature(_shingle_hashes31(b, 3))
        est = float((sa == sb).mean())
        wa, wb = _shingles(a, 3), _shingles(b, 3)
        exact = len(wa & wb) / len(wa | wb)
        assert r["est_q"] == int(np.floor(est * 1e6 + 0.5))
        assert r["exact_q"] == int(np.floor(exact * 1e6 + 0.5))
        assert r["abs_err_q"] == abs(r["est_q"] - r["exact_q"])
    assert int(got["abs_err_q"].max()) <= 250_001


def test_weighted_sample_replica_and_weight_bias(ray_session, tmp_path):
    """ES keys replicate exactly; a doc with overwhelming weight is
    (essentially) always sampled when k is a large fraction."""
    import hashlib
    import math

    import pandas as pd
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from ragflow_core16_ray.pipelines.text_analysis import weighted_sample

    n = 40
    w = [10] * n
    w[7] = 100000  # heavyweight doc
    df = pd.DataFrame({
        "doc_id": pd.array(range(n), dtype="int64"),
        "text": ["x" * v for v in w],
        "lang": ["en"] * n, "source": ["s"] * n,
        "n_chars": pd.array(w, dtype="int64")})
    import os
    os.makedirs(str(tmp_path), exist_ok=True)
    pq_.write_table(pa_.Table.from_pandas(df, preserve_index=False),
                    str(tmp_path / "documents.parquet"))
    got = weighted_sample(str(tmp_path), k=10)
    assert len(got) == 10
    # replica: recompute every key, take top 10
    keys = {}
    for d, wt in enumerate(w):
        u = (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
             + 1) / 2 ** 32
        keys[d] = math.log(u) / wt
    want = sorted(keys, key=lambda d: (-keys[d], d))[:10]
    assert sorted(got["doc_id"]) == sorted(want)
    assert 7 in set(got["doc_id"])  # the heavyweight is in
    for _, r in got.iterrows():
        assert r["key_q"] == math.floor(keys[r["doc_id"]] * 1e6 + 0.5)


def test_source_centroid_distances_hand(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from ragflow_core16_ray.pipelines.similarity import (
        source_centroid_distances)

    # source A at e1, source B at e1 (identical centroid), source C at e2
    e = np.zeros((6, 4), dtype=np.float32)
    e[0, 0] = e[1, 0] = 1.0       # A
    e[2, 0] = e[3, 0] = 1.0       # B
    e[4, 1] = e[5, 1] = 1.0       # C
    docs = pd.DataFrame({
        "doc_id": pd.array(range(6), dtype="int64"),
        "text": ["t"] * 6, "lang": ["en"] * 6,
        "source": ["A", "A", "B", "B", "C", "C"],
        "n_chars": pd.array([1] * 6, dtype="int64")})
    emb = pd.DataFrame({
        "vec_id": pd.array(range(6), dtype="int64"),
        "embedding": list(e),
        "label": pd.array([0] * 6, dtype="int32")})
    import os
    os.makedirs(str(tmp_path), exist_ok=True)
    pq_.write_table(pa_.Table.from_pandas(docs, preserve_index=False),
                    str(tmp_path / "documents.parquet"))
    pq_.write_table(pa_.Table.from_pandas(emb, preserve_index=False),
                    str(tmp_path / "embeddings.parquet"))
    got = source_centroid_distances(str(tmp_path)).set_index(
        ["src_a", "src_b"])
    assert got.loc[("A", "B"), "dist2_q"] == 0          # redundant pair
    assert got.loc[("A", "C"), "dist2_q"] == 2_000_000  # |e1-e2|² = 2
    assert got.loc[("B", "C"), "dist2_q"] == 2_000_000


def test_pq_distortion_replica_and_monotonicity(ray_session):
    from ragflow_core16_ray.pipelines.similarity import (
        _norm, _pq_train_codebooks, pq_distortion_stats)

    got16 = pq_distortion_stats(SF, n_codes=16)
    # replica on the full table
    t = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    X = _norm(np.stack(t["embedding"].to_numpy()).astype(np.float64))
    sample = X[:512]
    books = _pq_train_codebooks(sample, 8, 16)
    sub = X.shape[1] // 8
    err = np.zeros(len(X))
    for s in range(8):
        x = X[:, s * sub:(s + 1) * sub]
        d2 = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        err += d2.min(axis=1)
    assert int(got16["n_vecs"][0]) == len(X)
    # float partials sum in block order; allow the last-ulp quantization
    # wobble across batchings
    assert abs(int(got16["mean_q"][0])
               - int(np.floor(err.mean() * 1e6 + 0.5))) <= 1
    assert int(got16["p_max_q"][0]) == int(np.floor(err.max() * 1e6
                                                    + 0.5))
    # more codes -> lower (or equal) mean distortion
    got32 = pq_distortion_stats(SF, n_codes=32)
    assert int(got32["mean_q"][0]) <= int(got16["mean_q"][0])


def test_mmr_topk_replica_and_diversity(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from ragflow_core16_ray.pipelines.similarity import mmr_topk

    # equal-relevance candidates along DIFFERENT residual directions,
    # plus a near-twin of candidate 1: pure relevance cannot separate
    # them, MMR must skip the twin in favor of the fresh directions
    vecs = np.array([
        [1.0, 0.0, 0.0, 0.0],      # 0: the query
        [0.8, 0.6, 0.0, 0.0],      # 1: direction A
        [0.8, 0.5999, 0.012, 0.0],  # 2: near-twin of 1
        [0.8, 0.0, 0.6, 0.0],      # 3: direction B
        [0.8, 0.0, 0.0, 0.6],      # 4: direction C
        [0.0, 1.0, 0.0, 0.0],      # 5: irrelevant
    ])
    tbl = pa_.table({
        "vec_id": pa_.array(range(6), type=pa_.int64()),
        "embedding": pa_.array([list(map(float, v)) for v in vecs],
                               type=pa_.list_(pa_.float32())),
        "label": pa_.array([0] * 6, type=pa_.int32())})
    pq_.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = mmr_topk(str(tmp_path), query_vec_id=0, k=4)
    order = list(got["vec_id"])
    # query first; then direction A (tie-break by id), then the FRESH
    # directions — the near-twin 2 is excluded despite equal relevance
    assert order == [0, 1, 3, 4]
    # replica: integer-exact greedy over the quantized sims
    V = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    rel = np.floor(1e6 * (V @ V[0]) + 0.5).astype(np.int64)
    pair = np.floor(1e6 * (V @ V.T) + 0.5).astype(np.int64)
    chosen, rem = [], list(range(6))
    for _ in range(4):
        key = min(((-(7 * int(rel[i]) - 3 * (max(int(pair[i][j])
                    for j in chosen) if chosen else 0)), i)
                   for i in rem))
        chosen.append(key[1]); rem.remove(key[1])
    assert order == chosen
    # deterministic across runs
    got2 = mmr_topk(str(tmp_path), query_vec_id=0, k=4)
    assert list(got2["vec_id"]) == order
