"""Text-analysis operators over the `documents` table (training-data
pipeline ops): token counting, quality counters, language id, document
fingerprints, corpus word frequencies.

All stages are vectorized `map_batches` with column-pruned reads; global
aggregations pre-aggregate per batch before the (tiny) groupby shuffle.
Integer / string outputs only, so the DuckDB oracle value-hashes match
bit-exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import md5_hex
from ..functions.textstats import lang_id, quality_counts


def _docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def token_counts(sf_dir: str, docs: rd.Dataset | None = None) -> rd.Dataset:
    """doc_id, n_tokens (whitespace tokens — SQL-parity definition).
    ``docs`` overrides the parquet read — any Dataset with the documents
    schema (e.g. the jsonl source) plugs into the same count."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_tokens": batch["text"].str.strip().str.split().str.len()
            .fillna(0).astype("int64"),
        })

    base = docs if docs is not None else _docs(sf_dir, ["doc_id", "text"])
    return base.map_batches(fn, batch_format="pandas")


def quality_stats(sf_dir: str) -> rd.Dataset:
    """Integer quality counters per doc (ratios derivable client-side)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = [quality_counts(t) for t in batch["text"]]
        out = pd.DataFrame(rows)
        out.insert(0, "doc_id", batch["doc_id"].values)
        return out

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas")


def lang_pred(sf_dir: str) -> rd.Dataset:
    """doc_id, predicted language. The heuristic (CJK density, then
    function-word argmax with fixed tie-break) is reproduced exactly in
    the DuckDB oracle, so this query is hash-checked; accuracy is also
    asserted in tests."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "lang_pred": [lang_id(t) for t in batch["text"]],
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas")


def fingerprints(sf_dir: str) -> rd.Dataset:
    """doc_id, fp = md5(text) — DuckDB's md5() emits the identical hex."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "fp": [md5_hex(t) for t in batch["text"]],
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas")


def top_words(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global word frequencies, top-k. Pre-aggregates counts per batch
    (one row per word per batch) so the groupby shuffle moves word partials,
    not the corpus — the combiner pattern for 100 TB."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = (batch["text"].str.strip().str.split().explode()
                  .value_counts())
        return pd.DataFrame({"word": counts.index, "cnt": counts.values})

    ds = _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pandas")
    df = combine_partials(ds, ["word"], {"cnt": "sum"}).to_pandas()
    df["cnt"] = df["cnt"].astype("int64")
    return (df.sort_values(["cnt", "word"], ascending=[False, True])
            .head(k).reset_index(drop=True))


def approx_distinct_words(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Distributed HyperLogLog: approximate distinct whitespace-word count
    over the corpus. Per batch, words hash (stable 64-bit) into 2**p
    registers keeping the max first-set-bit rank of the remaining hash
    bits (geometric, like the classic leading-zero rank); partials are
    (register, rho)
    rows merged with MAX through the combiner tree — the shuffle moves at
    most 2**p tiny rows per block regardless of corpus size, the defining
    property of a mergeable sketch (vs. exact distinct's full shuffle of
    every word). Deterministic (no RNG): same corpus → same estimate.
    Output: one row (n_distinct_est, n_registers). Accuracy ≈1.04/√2**p
    (~1.6% at p=12), asserted against the exact count in tests."""
    import numpy as np

    from ..functions.hashing import hash64
    from ..stages.agg import combine_partials

    m = 1 << p

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype="int64")
        for text in batch["text"]:
            for w in text.split():
                h = hash64(w)
                reg = h & (m - 1)
                rest = h >> p
                # rank = position of first set bit in the remaining 64-p
                # bits (1-based); all-zero rest → max rank
                rho = (64 - p) + 1 if rest == 0 else (
                    (rest & -rest).bit_length())
                if rho > regs[reg]:
                    regs[reg] = rho
        occupied = np.nonzero(regs)[0]
        return pd.DataFrame({"register": occupied.astype("int64"),
                             "rho": regs[occupied]})

    ds = _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pandas")
    merged = combine_partials(ds, ["register"], {"rho": "max"}).to_pandas()
    regs = np.zeros(m, dtype="float64")
    regs[merged["register"].to_numpy()] = merged["rho"].to_numpy()
    # standard HLL estimator with the small-range (linear counting) fix
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.sum(regs == 0))
    if raw <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    else:
        est = raw
    return pd.DataFrame({"n_distinct_est": pd.array([int(round(est))],
                                                    dtype="int64"),
                         "n_registers": pd.array([m], dtype="int64")})


def length_histogram(sf_dir: str, bucket: int = 100) -> pd.DataFrame:
    """Corpus length distribution: (bucket = ⌊chars/bucket⌋, n docs).
    Zero-copy Arrow per batch (utf8_length + value_counts) emitting one
    partial row per occupied bucket, then the combiner tree — the shuffle
    moves at most a few hundred histogram rows per block, never documents.
    The shape every corpus-profiling pass should take at 100 TB."""
    import pyarrow.compute as pc

    from ..stages.agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        b = pc.cast(pc.divide(pc.utf8_length(batch["text"]), bucket),
                    pa.int64())
        vc = pc.value_counts(b)
        return pa.table({"bucket": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    ds = _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pyarrow")
    df = combine_partials(ds, ["bucket"], {"n": "sum"}).to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("bucket").reset_index(drop=True)


# per-language sampling rates for stratified_sample: oversample the
# low-resource strata, downsample the dominant one (the standard
# training-data mixture move); expressed as 8-hex-digit md5-prefix
# cutoffs so the DuckDB oracle compares the same strings
STRATA_RATES = {"en": 0.2, "fr": 0.5, "es": 0.5, "de": 1.0, "zh": 1.0}


def sample_cutoff_hex(rate: float) -> str:
    # rate >= 1.0 means KEEP ALL: 'g' sorts above every lowercase hex
    # string, so the strict `prefix < cutoff` test passes for every doc
    # (clamping to 'ffffffff' would drop a doc hashing exactly to it,
    # 2^-32 per doc). Strata absent from the rates dict fall back to
    # '00000000' — i.e. unknown languages are dropped ENTIRELY; this is
    # deliberate (only listed strata participate in the mixture).
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16**8), "08x")


def stratified_sample(sf_dir: str,
                      rates: dict[str, float] | None = None) -> rd.Dataset:
    """Deterministic stratified corpus sampling: per document, stratum =
    lang_id(text) and the doc is kept iff the first 8 hex chars of
    md5(doc_id) fall under the stratum's rate cutoff (lexicographic hex
    compare == numeric compare). No RNG state, no coordination: any
    worker, any partitioning, any rerun draws the same sample — the only
    sampling design that is reproducible AND embarrassingly parallel at
    100 TB. Output: (doc_id, lang_pred) for kept docs."""
    rates = rates or STRATA_RATES
    cutoffs = {lang: sample_cutoff_hex(r) for lang, r in rates.items()}

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        langs = [lang_id(t) for t in batch["text"]]
        keep = [md5_hex(str(d))[:8] < cutoffs.get(lg, "00000000")
                for d, lg in zip(batch["doc_id"], langs)]
        out = pd.DataFrame({"doc_id": batch["doc_id"].values,
                            "lang_pred": langs})
        return out[keep].reset_index(drop=True)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas")


def source_profile(sf_dir: str) -> pd.DataFrame:
    """Per-source corpus profile: (source, n_docs, total_chars, n_langs).
    One partial row per (source, lang) per batch — distinct-lang counts
    cannot sum across batches, so the partial keeps the (source, lang)
    pair and the tiny final rollup collapses it. The shuffle moves a few
    hundred profile rows per block, never text — the per-domain reporting
    shape for a crawl at 100 TB."""
    import pyarrow.compute as pc

    from ..stages.agg import combine_partials

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"source": batch["source"].to_pandas(),
                           "lang": batch["lang"].to_pandas(),
                           "chars": pc.utf8_length(batch["text"]).to_pandas()})
        g = (df.groupby(["source", "lang"], sort=False)
             .agg(n_docs=("chars", "size"), total_chars=("chars", "sum")))
        return g.reset_index()

    ds = _docs(sf_dir, ["source", "lang", "text"]).map_batches(
        partial, batch_format="pyarrow")
    by_pair = combine_partials(ds, ["source", "lang"],
                               {"n_docs": "sum", "total_chars": "sum"}
                               ).to_pandas()
    out = (by_pair.groupby("source", sort=False)
           .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"),
                n_langs=("lang", "nunique")).reset_index())
    for c in ("n_docs", "total_chars", "n_langs"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def lang_confusion(sf_dir: str) -> pd.DataFrame:
    """Language-ID evaluation: (lang, lang_pred, n) confusion counts of
    the heuristic against the corpus's labeled ``lang`` column — the
    quality-measurement loop every classifier-driven filter needs.
    Per-batch partial counts through the combiner tree (≤ |langs|² rows
    per partial)."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"lang": batch["lang"],
                           "lang_pred": [lang_id(t) for t in batch["text"]]})
        g = df.groupby(["lang", "lang_pred"], sort=False).size()
        return g.rename("n").reset_index()

    ds = _docs(sf_dir, ["lang", "text"]).map_batches(
        partial, batch_format="pandas")
    out = combine_partials(ds, ["lang", "lang_pred"], {"n": "sum"}).to_pandas()
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["lang", "lang_pred"]).reset_index(drop=True))


def top_bigrams(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global bigram (word-pair) frequencies, top-k — the n-gram statistics
    pass of a training-data corpus profile. Bigram construction is
    vectorized (explode + per-doc shift + string concat, no Python loop
    over tokens); one partial row per bigram per batch rides the combiner
    tree, so the shuffle moves bigram partials, never documents.
    Tie-break (cnt desc, bigram asc) matches the oracle's ORDER BY, so the
    top-k boundary is deterministic."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.strip().str.split().explode()
        nxt = toks.groupby(level=0).shift(-1)
        counts = (toks + " " + nxt).dropna().value_counts()
        return pd.DataFrame({"bigram": counts.index, "cnt": counts.values})

    ds = _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pandas")
    df = combine_partials(ds, ["bigram"], {"cnt": "sum"}).to_pandas()
    df["cnt"] = df["cnt"].astype("int64")
    return (df.sort_values(["cnt", "bigram"], ascending=[False, True])
            .head(k).reset_index(drop=True))


def term_weights(sf_dir: str, k: int = 5, min_len: int = 2,
                 n_buckets: int = 64) -> rd.Dataset:
    """Per-document term weighting: corpus document frequency joined back
    onto per-doc term counts, top-k terms per doc — the distributed shape
    of the reference's chunk term-weight enrichment
    (rag/nlp/term_weight.py: per-term idf × dict weights over tokenized
    chunks; its NER/POS dictionaries are external assets, so the weight
    key here is the dictionary-free core).

    Ranking is integer-exact — (tf desc, df asc, term asc) — the same
    order tf·idf induces for a fixed tf, so the oracle hash is strict;
    the float idf scale is a client-side display concern.

    Shape (two bucket shuffles, nothing broadcast — at 100 TB both the
    vocabulary and the doc set are huge):
      1. tokenize per batch → exact (doc_id, term, tf) rows (a document
         never splits across rows, so tf is final at birth);
      2. co-partition by a coarse hash bucket of ``term``: every row of a
         term lands in one group, so df is just the group's per-term row
         count — the df aggregate and the df join collapse into ONE
         shuffle instead of an aggregate plus a second join;
      3. re-bucket by doc_id hash for the vectorized per-doc top-k.
    Output: (doc_id, term, tf, df, rank), rank 1..k."""
    from ..functions.hashing import hash64

    def tf_rows(batch: pa.Table) -> pa.Table:
        # [A-Za-z0-9]+ findall ≡ split on the complement + drop empties;
        # tokenize/count entirely in Arrow kernels, hash once per
        # DISTINCT term (vocabulary ≪ posting rows)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch["text"]), "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.greater_equal(pc.utf8_length(flat), min_len)
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        pairs = pa.table({"doc_id": ids.take(parent),
                          "term": flat}).filter(keep)
        g = pairs.group_by(["doc_id", "term"],
                           use_threads=False).aggregate([([], "count_all")])
        terms = g["term"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        ubkt = np.fromiter((hash64(t) & (n_buckets - 1) for t in uniq),
                           dtype=np.int64, count=len(uniq))
        return pa.table({
            "doc_id": g["doc_id"],
            "term": g["term"],
            "tf": pc.cast(g["count_all"], pa.int64()),
            "term_bucket": pa.array(ubkt[inv], pa.int64())})

    def annotate_df(g: pd.DataFrame) -> pd.DataFrame:
        # all (doc, term) rows of every term in this bucket are here and
        # each is unique, so df = rows per term — no separate aggregate
        out = g[["doc_id", "term", "tf"]].copy()
        out["df"] = (g.groupby("term", sort=False)["term"]
                     .transform("size").astype("int64").values)
        out["doc_bucket"] = pd.array(
            [hash64(str(d)) & (n_buckets - 1) for d in out["doc_id"]],
            dtype="int64")
        return out

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "tf", "df", "term"],
                          ascending=[True, False, True, True], kind="stable")
        out = g.groupby("doc_id", sort=False).head(k).copy()
        out["rank"] = (out.groupby("doc_id", sort=False).cumcount() + 1
                       ).astype("int64")
        return out[["doc_id", "term", "tf", "df", "rank"]]

    width = max(1, n_buckets // 4)
    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(tf_rows, batch_format="pyarrow")
            .repartition(width)
            .groupby("term_bucket").map_groups(annotate_df,
                                               batch_format="pandas")
            .repartition(width)
            .groupby("doc_bucket").map_groups(topk, batch_format="pandas"))


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """Gopher-style per-document repetition counters (the published
    repetition filters of Rae et al. 2021, "Scaling Language Models" —
    public knowledge): most-frequent-word count, most-frequent-bigram
    count, and the number of trigram occurrences belonging to a repeated
    trigram, each with its denominator. Integers only, so the DuckDB
    oracle value-hash is strict; the filter ratios (e.g.
    dup_trigram_cnt / n_trigrams > 0.3 ⇒ drop) are client-side floats.

    Fully vectorized: one explode + shifted-concat per batch builds all
    n-gram streams; per-doc maxima come from two-level pandas groupbys
    (C-speed), never a Python loop over tokens. Stays embarrassingly
    parallel — no shuffle at all; each document's counters are final at
    birth inside its batch."""

    def _per_row_gram_stats(grams: np.ndarray, rows: np.ndarray, n: int):
        """(per-row total, per-row max count, per-row duplicated-gram
        occurrence sum) for a flat gram array tagged with row ids —
        factorize + one combined (row, gram) key, all numpy."""
        total = np.bincount(rows, minlength=n).astype(np.int64)
        if not len(grams):
            z = np.zeros(n, dtype=np.int64)
            return total, z, z
        uniq, code = np.unique(grams, return_inverse=True)
        key = rows.astype(np.int64) * len(uniq) + code
        uk, cnt = np.unique(key, return_counts=True)
        krow = (uk // len(uniq)).astype(np.int64)
        mx = np.zeros(n, dtype=np.int64)
        np.maximum.at(mx, krow, cnt)
        dupm = cnt > 1
        dup = np.bincount(krow[dupm], weights=cnt[dupm],
                          minlength=n).astype(np.int64)
        return total, mx, dup

    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.textstats import ws_tok_arrays

        n = batch.num_rows
        flat, parent, _nw = ws_tok_arrays(batch["text"])
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        rows = parent[keep]
        # ONE string factorize (unigrams); every n-gram is then an
        # integer code — w0·V²+w1·V+w2 < 2^63 for any realistic batch
        # vocabulary, and integer unique is far cheaper than string
        # unique on the gram streams
        uw, wcode = (np.unique(
            flat.to_numpy(zero_copy_only=False)[keep],
            return_inverse=True) if keep.any()
            else (np.array([], dtype=object),
                  np.zeros(0, dtype=np.int64)))
        V = max(1, len(uw))
        wcode = wcode.astype(np.int64)
        n_words, max_word, _ = _per_row_gram_stats(wcode, rows, n)
        same = rows[1:] == rows[:-1] if len(rows) else \
            np.zeros(0, dtype=bool)
        bi_all = (wcode[:-1] * V + wcode[1:]) if len(wcode) > 1 \
            else np.zeros(0, dtype=np.int64)   # ≤ V² ≤ tokens² — safe
        bi = bi_all[same]
        n_bigrams, top_bigram, _ = _per_row_gram_stats(
            bi, rows[:-1][same] if len(rows) else rows, n)
        m3 = same[:-1] & same[1:] if len(same) > 1 else \
            np.zeros(0, dtype=bool)
        # trigram key = factorized-pair-code · V + third word: bounded
        # by tokens·V, never V³ (which could overflow int64 on a
        # multi-million-token block)
        if len(wcode) > 2:
            _ub, bc = np.unique(bi_all, return_inverse=True)
            tri = (bc[:-1].astype(np.int64) * V + wcode[2:])[m3]
        else:
            tri = np.zeros(0, dtype=np.int64)
        n_trigrams, _mx3, dup_tri = _per_row_gram_stats(
            tri, rows[:-2][m3] if len(rows) > 2 else rows[:0], n)
        # empty-text rows were filtered before output in the old shape;
        # they have zero grams everywhere, so keep only rows with words
        nz = n_words > 0
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[nz]
        i64 = pa.int64()
        return pa.table({
            "doc_id": pa.array(ids),
            "n_words": pa.array(n_words[nz], i64),
            "max_word_cnt": pa.array(max_word[nz], i64),
            "n_bigrams": pa.array(n_bigrams[nz], i64),
            "top_bigram_cnt": pa.array(top_bigram[nz], i64),
            "n_trigrams": pa.array(n_trigrams[nz], i64),
            "dup_trigram_cnt": pa.array(dup_tri[nz], i64)})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


def decontam_ngrams(sf_dir: str, n: int = 5,
                    eval_mod: int = 29) -> rd.Dataset:
    """Benchmark decontamination: count, for every training document, its
    distinct word n-grams that also appear in a held-out evaluation split
    (the standard n-gram-overlap decontamination step of every LLM
    training-data pipeline — e.g. the 13-gram check published with GPT-3).
    The eval split here is the deterministic ``doc_id % eval_mod == 0``
    slice of the same corpus; in production it is the benchmark suites.

    Scale shape: the eval side is SMALL by construction (benchmarks, not
    corpora), so its distinct-gram set is collected once and broadcast via
    ``ray.put``; the training corpus then streams through one
    ``map_batches`` doing C-speed set intersections — no shuffle at all.
    If the eval set ever outgrew worker memory, the fallback is the
    co-partitioned anti-join shape of `dedup.incremental_dedup`.

    Output: (doc_id, n_grams, n_hits) for every non-eval doc with ≥ n
    words; contaminated ⇔ n_hits > 0 (thresholding is client policy)."""
    import ray

    def gram_set(text: str) -> set[str]:
        ws = text.strip().split()
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    def eval_partial(batch: pd.DataFrame) -> pd.DataFrame:
        grams: set[str] = set()
        for t in batch.loc[batch["doc_id"] % eval_mod == 0, "text"]:
            grams |= gram_set(t)
        return pd.DataFrame({"g": sorted(grams)})

    eval_df = (_docs(sf_dir, ["doc_id", "text"])
               .map_batches(eval_partial, batch_format="pandas").to_pandas())
    eval_ref = ray.put(frozenset(eval_df["g"]))

    def hits(batch: pd.DataFrame) -> pd.DataFrame:
        ev = ray.get(eval_ref)
        batch = batch[batch["doc_id"] % eval_mod != 0]
        out_id, out_n, out_h = [], [], []
        for did, t in zip(batch["doc_id"], batch["text"]):
            gs = gram_set(t)
            if not gs:
                continue
            out_id.append(did)
            out_n.append(len(gs))
            out_h.append(len(gs & ev))
        return pd.DataFrame({
            "doc_id": pd.array(out_id, dtype="int64"),
            "n_grams": pd.array(out_n, dtype="int64"),
            "n_hits": pd.array(out_h, dtype="int64")})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        hits, batch_format="pandas")


def quality_filter(sf_dir: str, min_chars: int = 200, max_chars: int = 5000,
                   min_tokens: int = 30) -> rd.Dataset:
    """Training-data quality gate: keep documents in a length band with a
    minimum whitespace-token count. Pure zero-copy Arrow — both predicates
    are pyarrow.compute kernels, no Python per row, no pandas conversion —
    the shape every cheap corpus filter should take at 100 TB."""
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_chars = pc.utf8_length(text)
        n_tokens = pc.count_substring_regex(text, r"\S+")
        mask = pc.and_(
            pc.and_(pc.greater_equal(n_chars, min_chars),
                    pc.less_equal(n_chars, max_chars)),
            pc.greater_equal(n_tokens, min_tokens))
        return batch.filter(mask).select(["doc_id"])

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow")


def lm_quality_rank(sf_dir: str, bucket_shift: int = 12) -> rd.Dataset:
    """CCNet-style corpus quality ordering (Wenzek et al. 2020, public):
    score every document by its average per-word log-probability under a
    unigram LM with add-one smoothing trained on the corpus itself, then
    assign a GLOBAL curriculum rank (1 = most in-distribution). The score
    is quantized (``round(lp/n · 1e6)``) so the DuckDB oracle — a plain
    ROW_NUMBER window — hash-matches despite float accumulation order.

    Scale shape, two broadcasts and one bounded shuffle:
    (1) global word counts via the combiner tree (partials per batch, one
    row per word per batch); the {word: count} map is broadcast via
    ``ray.put`` — at 100 TB the vocab table would instead stay
    distributed and the score pass would join on a term-bucketed shuffle
    (the `term_weights` shape). (2) vectorized per-batch scoring. (3) the
    distributed RANK: scores histogram into coarse buckets
    (``avg_q >> bucket_shift`` — order-preserving); the per-bucket doc
    counts are tiny (≤ #buckets rows) and broadcast as cumulative
    offsets; one groupby(bucket) sorts each bucket locally and adds its
    offset. No global sort, no driver-side ordering; bucket width bounds
    the largest in-memory sort."""
    import numpy as np
    import ray

    from ..stages.agg import combine_partials

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = (batch["text"].str.strip().str.split().explode()
                  .value_counts())
        return pd.DataFrame({"word": counts.index, "cnt": counts.values})

    vocab = combine_partials(
        _docs(sf_dir, ["text"]).map_batches(count_partial,
                                            batch_format="pandas"),
        ["word"], {"cnt": "sum"}).to_pandas()
    total = int(vocab["cnt"].sum())
    v_size = len(vocab)
    # log p(w) = ln((cnt+1)/(T+V)), computed identically in the oracle
    logp_ref = ray.put((dict(zip(vocab["word"],
                                 vocab["cnt"].astype("int64"))),
                        float(total + v_size)))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        cnts, denom = ray.get(logp_ref)
        batch = batch[batch["text"].str.strip() != ""].reset_index(drop=True)
        if batch.empty:
            return pd.DataFrame({
                "bucket": pd.array([], dtype="int64"),
                "doc_id": pd.array([], dtype="int64"),
                "avg_logprob_q": pd.array([], dtype="int64")})
        toks = batch["text"].str.strip().str.split().explode()
        lp = np.log((toks.map(cnts).fillna(0).values + 1.0) / denom)
        g = pd.Series(lp, index=toks.index).groupby(level=0)
        # floor(x*1e6+0.5), NOT np.round: half-even would diverge from the
        # oracle's floor convention on exact half-boundaries (same contract
        # as source_mix_weights)
        avg_q = np.floor(g.sum() / g.size() * 1e6 + 0.5).astype("int64")
        avg_q = avg_q.reindex(batch.index).values
        return pd.DataFrame({
            "bucket": pd.array(avg_q >> bucket_shift, dtype="int64"),
            "doc_id": batch["doc_id"].values,
            "avg_logprob_q": pd.array(avg_q, dtype="int64")})

    scored = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas").materialize()

    # per-bucket doc counts: ≤ #buckets tiny rows through the combiner
    def bcount(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("bucket", sort=False).size()
        return pd.DataFrame({"bucket": g.index.astype("int64"),
                             "n": g.values})

    hist = combine_partials(scored.map_batches(bcount,
                                               batch_format="pandas"),
                            ["bucket"], {"n": "sum"}).to_pandas()
    hist = hist.sort_values("bucket", ascending=False)
    # offset = docs in strictly HIGHER buckets (rank is avg_q desc)
    hist["offset"] = hist["n"].cumsum().shift(1, fill_value=0)
    offsets_ref = ray.put(dict(zip(hist["bucket"].astype(int),
                                   hist["offset"].astype(int))))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values(["avg_logprob_q", "doc_id"],
                          ascending=[False, True])
        g = g.reset_index(drop=True)
        g["rank"] = pd.array(range(off + 1, off + 1 + len(g)),
                             dtype="int64")
        return g[["doc_id", "avg_logprob_q", "rank"]]

    n_buckets = max(1, len(hist))
    return (scored.repartition(min(16, n_buckets))
            .groupby("bucket").map_groups(rank_bucket,
                                          batch_format="pandas"))


def pack_sequences(sf_dir: str, budget: int = 256,
                   n_shards: int = 16) -> rd.Dataset:
    """GPT-style sequence packing layout: concatenate documents (in
    deterministic doc_id order within a shard) into a token stream and
    cut it into fixed ``budget``-token training bins, documents spanning
    bin boundaries split mid-document — the standard pretraining packing
    step (every LLM data pipeline has one; the reference's naive_merge,
    rag/nlp/__init__.py:510-541, is the per-document analogue of the
    same token-budget fill).

    Emits the PLACEMENT (doc_id, shard, start_offset, n_tokens,
    first_bin, last_bin), not the packed text — at 100 TB the placement
    table is what the actual tensor-writer stage consumes, and it is
    integers only, so the oracle (a window cumsum) is hash-strict.

    Shape: one groupby(shard) shuffle (shard = doc_id % n_shards); each
    group sorts locally by doc_id and runs a vectorized cumsum. Bins are
    shard-local, so shards pack independently — embarrassingly parallel
    across the cluster, no global coordination."""
    import numpy as np

    def toklen(batch: pd.DataFrame) -> pd.DataFrame:
        n = (batch["text"].str.strip().str.split().str.len()
             .fillna(0).astype("int64"))
        keep = n > 0
        return pd.DataFrame({
            "shard": (batch.loc[keep, "doc_id"] % n_shards).astype("int64"),
            "doc_id": batch.loc[keep, "doc_id"].values,
            "n_tokens": n[keep].values})

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").reset_index(drop=True)
        end = g["n_tokens"].cumsum().values
        start = end - g["n_tokens"].values
        return pd.DataFrame({
            "doc_id": g["doc_id"].values,
            "shard": g["shard"].values,
            "start_offset": pd.array(start, dtype="int64"),
            "n_tokens": g["n_tokens"].values,
            "first_bin": pd.array(start // budget, dtype="int64"),
            "last_bin": pd.array((end - 1) // budget, dtype="int64")})

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(toklen, batch_format="pandas")
            .repartition(min(16, n_shards))
            .groupby("shard").map_groups(pack, batch_format="pandas"))


def corpus_shuffle(sf_dir: str, n_shards: int = 16,
                   salt: str = "epoch0") -> rd.Dataset:
    """Deterministic, reproducible global shuffle for training-epoch
    ordering: every doc gets a shuffle key md5(salt || ':' || doc_id);
    the key's first byte picks the output shard and the key order gives
    the position within the shard. Changing ``salt`` re-shuffles (one
    salt per epoch) while any run with the same salt — including a
    resumed one — produces byte-identical placement, unlike
    ``random_shuffle``. Emits (doc_id, shard, pos) placement rows.

    Shape: one groupby(shard) shuffle (16 bounded groups); each group
    sorts its own keys locally. Positions are shard-local so no global
    coordination, and the md5 key is uniform so shards are balanced —
    the exact layout a multi-epoch trainer reads back shard by shard."""

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        ks = [md5_hex(f"{salt}:{d}") for d in batch["doc_id"]]
        return pd.DataFrame({
            "shard": pd.array([int(k[:2], 16) % n_shards for k in ks],
                              dtype="int64"),
            "k": ks,
            "doc_id": batch["doc_id"].values})

    def order(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["k", "doc_id"]).reset_index(drop=True)
        return pd.DataFrame({
            "doc_id": g["doc_id"].values,
            "shard": g["shard"].values,
            "pos": pd.array(range(len(g)), dtype="int64")})

    return (_docs(sf_dir, ["doc_id"])
            .map_batches(key, batch_format="pandas")
            .repartition(min(16, n_shards))
            .groupby("shard").map_groups(order, batch_format="pandas"))


def source_vocab(sf_dir: str) -> pd.DataFrame:
    """Per-source vocabulary profile: distinct word count (types), total
    word count (tokens) and the most frequent word — the type/token-ratio
    inputs of corpus lexical-diversity monitoring (Heaps'-law tracking
    per crawl source).

    Two-level aggregation, both through the combiner tree: per-batch
    (source, word, cnt) partials collapse duplicate words early, the
    (source, word) combine finishes exact per-source-word counts, and
    the per-source rollup is a second tiny combine — the corpus text
    itself never shuffles, only word partials do."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.strip().str.split().explode().dropna()
        src = batch["source"].reindex(toks.index)
        g = pd.DataFrame({"source": src.values, "word": toks.values}) \
            .groupby(["source", "word"], sort=False).size()
        out = g.rename("cnt").reset_index()
        out["cnt"] = out["cnt"].astype("int64")
        return out

    sw = combine_partials(
        _docs(sf_dir, ["source", "text"]).map_batches(
            partial, batch_format="pandas"),
        ["source", "word"], {"cnt": "sum"})

    def rollup(batch: pd.DataFrame) -> pd.DataFrame:
        # per-batch partial rollup; (word, cnt) pairs within one source
        # are already unique after the combine
        best = batch.sort_values(["cnt", "word"],
                                 ascending=[False, True]) \
            .drop_duplicates("source")
        agg = batch.groupby("source", sort=False).agg(
            n_types=("word", "size"), n_tokens=("cnt", "sum"))
        out = agg.reset_index().merge(
            best[["source", "word", "cnt"]], on="source")
        return out.rename(columns={"word": "top_word",
                                   "cnt": "top_word_cnt"})

    df = sw.map_batches(rollup, batch_format="pandas").to_pandas()
    # a source's words may span combine output blocks: final driver-side
    # fold over ≤ (#sources × #blocks) partial rows
    best = (df.sort_values(["top_word_cnt", "top_word"],
                           ascending=[False, True])
            .drop_duplicates("source"))
    agg = df.groupby("source", sort=False).agg(
        n_types=("n_types", "sum"), n_tokens=("n_tokens", "sum"))
    out = agg.reset_index().merge(
        best[["source", "top_word", "top_word_cnt"]], on="source")
    for c in ("n_types", "n_tokens", "top_word_cnt"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


# --- PII scrubbing ----------------------------------------------------------
# Compiled once at module import (worker processes import the module once, so
# per-batch work is pure matching). re.ASCII pins \b and the digit classes to
# RE2's ASCII word-char semantics, which is what makes the DuckDB oracle
# hash-exact: Python's default unicode \b disagrees with RE2 next to CJK.
# Patterns deliberately use only the regex subset RE2 and `re` share (no
# lookaround, no backrefs), with explicit ASCII classes.
import re as _re

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
_PII_PHONE = r"\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\b"
_PII_EMAIL_RE = _re.compile(_PII_EMAIL, _re.ASCII)
_PII_IPV4_RE = _re.compile(_PII_IPV4, _re.ASCII)
_PII_PHONE_RE = _re.compile(_PII_PHONE, _re.ASCII)


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """PII redaction pass (emails, IPv4s, phone-like numbers), the scrub
    every web-scale training corpus runs before release (role of C4 /
    RefinedWeb PII filters). Redaction is SEQUENTIAL — emails first, then
    IPs over the email-redacted text, then phones — so a dotted-quad
    inside an email local-part is never double-counted; the DuckDB oracle
    nests regexp_replace in the same order, making counts and the
    redacted-text fingerprint hash-exact.

    Embarrassingly parallel: one map_batches, no shuffle, module-level
    compiled patterns. Output: (doc_id, n_emails, n_ips, n_phones,
    clean_len, clean_fp = md5(redacted text))."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n_em, n_ip, n_ph, lens, fps = [], [], [], [], []
        for t in batch["text"]:
            n_em.append(len(_PII_EMAIL_RE.findall(t)))
            t = _PII_EMAIL_RE.sub("<EMAIL>", t)
            n_ip.append(len(_PII_IPV4_RE.findall(t)))
            t = _PII_IPV4_RE.sub("<IP>", t)
            n_ph.append(len(_PII_PHONE_RE.findall(t)))
            t = _PII_PHONE_RE.sub("<PHONE>", t)
            lens.append(len(t))
            fps.append(md5_hex(t))
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_emails": pd.array(n_em, dtype="int64"),
            "n_ips": pd.array(n_ip, dtype="int64"),
            "n_phones": pd.array(n_ph, dtype="int64"),
            "clean_len": pd.array(lens, dtype="int64"),
            "clean_fp": fps,
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas")


def source_mix_weights(sf_dir: str, alpha: float = 0.3,
                       scale: int = 1_000_000) -> pd.DataFrame:
    """Temperature-scaled source sampling weights: w_s ∝ n_s**alpha
    (the multinomial up/down-sampling rule of multilingual corpus mixing,
    alpha=0.3 as in XLM-R/mC4-style pipelines). Per-batch source-count
    partials through the combiner tree; the normalization runs on the
    tiny per-source table. Weights are quantized with floor(x*scale+0.5)
    (identical in numpy and DuckDB — avoids the round() half-even vs
    half-away divergence) so the oracle hash is strict."""
    import numpy as np

    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["source"].value_counts()
        return pd.DataFrame({"source": vc.index,
                             "n_docs": vc.values.astype("int64")})

    df = combine_partials(
        _docs(sf_dir, ["source"]).map_batches(partial, batch_format="pandas"),
        ["source"], {"n_docs": "sum"}).to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    w = np.power(df["n_docs"].to_numpy(np.float64), alpha)
    w = w / w.sum()
    df["weight_q"] = np.floor(w * scale + 0.5).astype("int64")
    return df.sort_values("source").reset_index(drop=True)


# canonical rule set lives in functions/textstats.py (shared kernel)
from ..functions.textstats import GOPHER_STOPWORDS as _GOPHER_STOPWORDS  # noqa: E402


def gopher_filter(sf_dir: str) -> rd.Dataset:
    """The lexical half of the published Gopher document-quality rules
    (Rae et al. 2021 App. A1.1): word-count bounds, mean-word-length
    bounds, alphabetic-word fraction and stop-word presence. (The
    repetition half of the rule set is ``repetition_stats``; a caller
    composes the two — same doc_id key, both shuffle-free.)

    All thresholds are evaluated in INTEGER math (3·n ≤ chars ≤ 10·n
    instead of a float mean, 5·alpha ≥ 4·n instead of 0.8) so the DuckDB
    oracle hashes bit-exactly; pass flags are int64 0/1 for the same
    reason. Embarrassingly parallel — one vectorized map_batches, per-doc
    counters final at birth."""

    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.textstats import gopher_flag_arrays

        flags, nw, nc, na, ns = gopher_flag_arrays(batch["text"])
        pass_len = flags[:, 0].astype(np.int64)
        pass_word_len = flags[:, 1].astype(np.int64)
        pass_alpha = flags[:, 2].astype(np.int64)
        pass_stop = flags[:, 3].astype(np.int64)
        i64 = pa.int64()
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": pa.array(nw, i64),
            "n_word_chars": pa.array(nc, i64),
            "n_alpha_words": pa.array(na, i64),
            "n_stopwords": pa.array(ns, i64),
            "pass_len": pa.array(pass_len, i64),
            "pass_word_len": pa.array(pass_word_len, i64),
            "pass_alpha": pa.array(pass_alpha, i64),
            "pass_stop": pa.array(pass_stop, i64),
            "pass_gopher": pa.array(pass_len & pass_word_len
                                    & pass_alpha & pass_stop, i64)})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow")


# script classes counted by script_stats; Python uses \uXXXX ranges, the
# DuckDB oracle writes the same code points as RE2 \x{XXXX} — identical
# semantics, engine-specific spelling
_SCRIPT_RES = {
    "n_latin": _re.compile(r"[A-Za-z]"),
    "n_digit": _re.compile(r"[0-9]"),
    "n_cjk": _re.compile("[\u4e00-\u9fff\u3040-\u30ff\uac00-\ud7af]"),
    "n_cyrillic": _re.compile("[\u0400-\u04ff]"),
    "n_space": _re.compile(r"[ \t\n\r]"),
}


def script_stats(sf_dir: str) -> rd.Dataset:
    """Per-document writing-script character profile (Latin / digit /
    CJK incl. kana+hangul / Cyrillic / whitespace / other) — the
    script-ratio inputs of language filtering and mixed-script spam
    detection in web-corpus cleaning. One shuffle-free vectorized
    map_batches; counts are code-point exact on both engines (Python
    str ops and DuckDB are both code-point based)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": batch["doc_id"].values}
        text = batch["text"]
        total = text.str.len().fillna(0).astype("int64")
        acc = None
        for name, rx in _SCRIPT_RES.items():
            cnt = text.str.count(rx).fillna(0).astype("int64")
            out[name] = cnt.values
            acc = cnt if acc is None else acc + cnt
        out["n_total"] = total.values
        out["n_other"] = (total - acc).values
        return pd.DataFrame(out)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas")


def length_quantiles(sf_dir: str,
                     qs: tuple = (25, 50, 75, 90, 99)) -> pd.DataFrame:
    """Exact corpus length quantiles (lower-quantile rule: the smallest
    value whose cumulative count reaches ⌈q·N/100⌉) computed from a
    DISTRIBUTED histogram — n_chars is integer-valued, so the per-batch
    (value, count) partials through the combiner tree are an EXACT
    sufficient statistic; the quantile scan runs on the tiny histogram,
    never the corpus. The all-to-all a naive global sort would need
    (`Dataset.sort` + rank pick) is exactly what this avoids at 100 TB.
    The oracle states the same rule with a windowed cumulative sum, so
    the result is hash-strict (int64 in, int64 out)."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch["n_chars"].value_counts()
        return pd.DataFrame({"v": vc.index.astype("int64"),
                             "n": vc.values.astype("int64")})

    hist = combine_partials(
        _docs(sf_dir, ["n_chars"]).map_batches(partial,
                                               batch_format="pandas"),
        ["v"], {"n": "sum"}).to_pandas().sort_values("v")
    cum = hist["n"].astype("int64").cumsum()
    total = int(cum.iloc[-1]) if len(cum) else 0
    rows = []
    for q in qs:
        if total == 0:
            continue
        need = -(-q * total // 100)  # ceil(q*N/100) in int math
        v = int(hist["v"].to_numpy()[(cum >= need).to_numpy().argmax()])
        rows.append({"q": q, "value": v})
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def _bpe_merge_loop(types: "list[tuple[tuple[str, ...], int]]",
                    n_merges: int) -> "list[tuple[str, str, int]]":
    """Sennrich-style merge loop over a (symbol-tuple, freq) type table.
    Deterministic: best pair = max count, ties to the lexicographically
    smallest (left, right). Pure function shared by the distributed
    trainer and the test replica."""
    merges: list[tuple[str, str, int]] = []
    words = [list(w) for w, _ in types]
    freqs = [f for _, f in types]
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in zip(words, freqs):
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        top = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top)
        merges.append((best_pair[0], best_pair[1], top))
        joined = best_pair[0] + best_pair[1]
        for w in words:
            i = 0
            while i < len(w) - 1:
                if w[i] == best_pair[0] and w[i + 1] == best_pair[1]:
                    w[i:i + 2] = [joined]
                else:
                    i += 1
    return merges


def train_bpe(sf_dir: str, n_merges: int = 40,
              max_types: int = 20_000) -> pd.DataFrame:
    """BPE vocabulary induction (Sennrich et al. 2016, ACL — public
    algorithm) over the corpus: the tokenizer-training pass of every LLM
    data pipeline. Words carry an end-of-word marker '</w>'.

    Distributed shape = the published algorithm's own split: pair merges
    operate on the word-frequency TYPE table, not the token stream, so
    the corpus-sized work is exactly one combiner-tree word count; the
    type table is then bounded to the ``max_types`` most frequent types
    (count desc, word asc — the frequency cutoff every production BPE
    trainer applies) and the merge loop runs on that bounded table.
    Driver state is O(max_types), independent of corpus size.

    Output: (rank, left, right, pair_count) — deterministic, equality-
    tested against a single-process replica in pytest."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = (batch["text"].str.strip().str.split().explode()
                  .value_counts())
        return pd.DataFrame({"word": counts.index, "cnt": counts.values})

    vocab = combine_partials(
        _docs(sf_dir, ["text"]).map_batches(partial, batch_format="pandas"),
        ["word"], {"cnt": "sum"}).to_pandas()
    vocab["cnt"] = vocab["cnt"].astype("int64")
    vocab = (vocab.sort_values(["cnt", "word"], ascending=[False, True])
             .head(max_types))

    types = [(tuple(w) + ("</w>",), int(c))
             for w, c in zip(vocab["word"], vocab["cnt"])]
    merges = _bpe_merge_loop(types, n_merges)
    return pd.DataFrame({
        "rank": pd.array(range(len(merges)), dtype="int64"),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "pair_count": pd.array([m[2] for m in merges], dtype="int64")})


_BPE_WORD_CACHE: dict = {}  # ranks-digest -> {word: n_tokens}, per worker

# canonical encode loop lives with the frozen-vocab counter; re-imported
# here because bpe_token_counts and the pytest replicas run it directly
from ..functions.bpe_counter import bpe_encode_word  # noqa: E402


def bpe_token_counts(sf_dir: str, n_merges: int = 40) -> rd.Dataset:
    """Two-stage distributed BPE pipeline: train merges (one corpus pass
    + bounded driver loop), broadcast the rank table via ``ray.put``,
    then an embarrassingly parallel encode pass emits per-doc BPE token
    counts — the budget numbers sequence packing and pricing run on.
    Worker-process memoization: distinct words encode ONCE per worker
    process (Zipf makes the distinct-word set tiny vs the token stream),
    keyed by a digest of the merge table so different rank tables never
    share entries; bounded like functions.bpe_counter's cache."""
    merges = train_bpe(sf_dir, n_merges=n_merges)
    ranks = {(l, r): i for i, (l, r) in
             enumerate(zip(merges["left"], merges["right"]))}
    ranks_ref = ray.put(ranks)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rk = ray.get(ranks_ref)
        key = hash(tuple(sorted(rk.items())))  # n_merges items — cheap
        cache = _BPE_WORD_CACHE.setdefault(key, {})

        def n_toks(text: str) -> int:
            total = 0
            for w in text.split():
                n = cache.get(w)
                if n is None:
                    n = len(bpe_encode_word(w, rk))
                    if len(cache) < 262_144:
                        cache[w] = n
                total += n
            return total

        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pd.array([n_toks(t) for t in batch["text"]],
                                     dtype="int64")})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas")


def top_words_cms(sf_dir: str, k: int = 20, width: int = 2048,
                  depth: int = 4) -> pd.DataFrame:
    """Approximate heavy hitters via a COUNT-MIN SKETCH (Cormode &
    Muthukrishnan 2005 — public) — the bounded-memory alternative to the
    exact `top_words` combine when even one row per distinct word per
    batch is too much shuffle (10^12-doc vocabularies): each batch emits
    at most depth×width sketch-cell partials plus its local top-2k
    candidate words, BOTH mergeable (cells by SUM — like the HLL
    registers — candidates by MAX of local counts). The merged sketch
    answers est(word) = min over rows of cell[row][h_row(word)], an
    OVERESTIMATE-only bound (asserted vs exact counts in tests); final
    top-k = candidates ranked by (estimate desc, word asc).

    Shuffle volume is O(depth·width + k) per batch regardless of corpus
    or vocabulary size — the defining sketch property."""
    from ..functions.hashing import hash64
    from ..stages.agg import combine_partials

    def cell(row: int, word: str) -> int:
        return hash64(f"{row}:{word}") % width

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = (batch["text"].str.strip().str.split().explode()
                  .value_counts())
        rows_r, rows_c, rows_n, rows_w = [], [], [], []
        cms: dict = {}
        for w, c in counts.items():
            for r in range(depth):
                key = (r, cell(r, w))
                cms[key] = cms.get(key, 0) + int(c)
        for (r, col), n in cms.items():
            rows_r.append(r)
            rows_c.append(col)
            rows_n.append(n)
            rows_w.append("")
        cand = counts.head(2 * k)
        for w, c in cand.items():
            rows_r.append(-1)
            rows_c.append(0)
            rows_n.append(int(c))
            rows_w.append(w)
        return pd.DataFrame({
            "row": pd.array(rows_r, dtype="int64"),
            "col": pd.array(rows_c, dtype="int64"),
            "n": pd.array(rows_n, dtype="int64"),
            "word": rows_w})

    partials = _docs(sf_dir, ["text"]).map_batches(
        partial, batch_format="pandas").materialize()
    # sketch cells merge by SUM; candidate words by MAX (both associative,
    # so the same combiner tree serves both, keyed to keep kinds apart)
    cells = combine_partials(
        partials.filter(expr="row >= 0"), ["row", "col"],
        {"n": "sum"}).to_pandas()
    cand = combine_partials(
        partials.filter(expr="row < 0"), ["word"],
        {"n": "max"}).to_pandas()

    grid = {}
    for r, c, n in zip(cells["row"], cells["col"], cells["n"]):
        grid[(int(r), int(c))] = int(n)

    def est(w: str) -> int:
        return min(grid.get((r, cell(r, w)), 0) for r in range(depth))

    cand = cand[cand["word"] != ""].copy()
    cand["est_cnt"] = pd.array([est(w) for w in cand["word"]],
                               dtype="int64")
    out = (cand.sort_values(["est_cnt", "word"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return out[["word", "est_cnt"]]


def source_mix_sample(sf_dir: str, alpha: float = 0.3,
                      scale: int = 1_000_000,
                      budget_num: int = 1,
                      budget_den: int = 2) -> rd.Dataset:
    """OPERATIONALIZE the temperature mix: draw the epoch sample whose
    source composition follows source_mix_weights (w_s ∝ n_s**alpha),
    sized to an epoch budget B = n_tot·budget_num//budget_den docs.
    Per-source keep probability p_s = w_s·B / n_s (expected picks per
    source ∝ w_s; a source whose p_s ≥ 1 is kept whole — the up-sampling
    repetition factor is a caller concern). The draw is the repo's
    deterministic-hash design: keep iff the first 8 md5 hex chars of
    doc_id, as an integer, fall under an INTEGER cutoff
    floor(weight_q·B·16⁸ / (scale·n_s)) — no RNG state, any partitioning
    and any rerun draws the same sample, and the pure integer cutoff
    makes the DuckDB oracle hash-strict.

    Shape: the per-source weight table is tiny (one row per source) and
    rides into the filter as a broadcast dict; the corpus streams through
    one map_batches — no shuffle. Output: (doc_id, source) kept docs."""
    from ..functions.hashing import md5_hex

    w = source_mix_weights(sf_dir, alpha, scale)
    n_tot = int(w["n_docs"].sum())
    budget = n_tot * budget_num // budget_den
    cutoff = {s: (int(wq) * budget * 16**8) // (scale * int(n))
              for s, n, wq in zip(w["source"], w["n_docs"], w["weight_q"])}
    cut_ref = ray.put(cutoff)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        cut = ray.get(cut_ref)
        mask = [int(md5_hex(str(d))[:8], 16) < cut[s]
                for d, s in zip(batch["doc_id"], batch["source"])]
        return batch[mask].reset_index(drop=True)

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        keep, batch_format="pandas")


def source_mix_epochs(sf_dir: str, alpha: float = 0.3,
                      scale: int = 1_000_000,
                      budget_num: int = 2,
                      budget_den: int = 1) -> rd.Dataset:
    """The UP-SAMPLING half of temperature mixing: per-doc repetition
    plan (doc_id, source, n_repeats) for an epoch of B =
    n_tot·budget_num//budget_den slots, expected repeats per doc
    p_s = w_s·B/n_s. Fractional parts draw by the same deterministic
    md5-prefix rule as source_mix_sample: with q = weight_q·B·16⁸ /
    (scale·n_s), n_repeats = ⌊q/16⁸⌋ plus one iff the doc's 8-hex md5
    integer falls under q mod 16⁸ — so a low-resource source repeats
    ~p_s times while a dominant one keeps a p_s<1 subset, and E[total
    rows] = B exactly. Docs drawn zero times are omitted (they sit out
    this epoch). Pure integer math both sides ⇒ hash-strict oracle;
    same no-shuffle broadcast-table shape as source_mix_sample."""
    from ..functions.hashing import md5_hex

    w = source_mix_weights(sf_dir, alpha, scale)
    n_tot = int(w["n_docs"].sum())
    budget = n_tot * budget_num // budget_den
    q = {s: (int(wq) * budget * 16**8) // (scale * int(n))
         for s, n, wq in zip(w["source"], w["n_docs"], w["weight_q"])}
    q_ref = ray.put(q)

    def plan(batch: pd.DataFrame) -> pd.DataFrame:
        qq = ray.get(q_ref)
        reps = []
        for d, s in zip(batch["doc_id"], batch["source"]):
            base, frac = divmod(qq[s], 16**8)
            reps.append(base + (int(md5_hex(str(d))[:8], 16) < frac))
        out = pd.DataFrame({"doc_id": batch["doc_id"].values,
                            "source": batch["source"].values,
                            "n_repeats": pd.array(reps, dtype="int64")})
        return out[out["n_repeats"] > 0].reset_index(drop=True)

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(
        plan, batch_format="pandas")


def lang_length_quantiles(sf_dir: str,
                          qs: tuple = (25, 50, 75, 90, 99)) -> pd.DataFrame:
    """length_quantiles PER LANGUAGE — the grouped form of the
    histogram-as-sufficient-statistic trick: per-batch (lang, n_chars,
    count) partials through the combiner tree, then the lower-rule
    quantile scan (smallest value whose cumulative count reaches
    ⌈q·N_lang/100⌉) per language on the tiny merged histogram. The
    shuffle moves histogram rows (≤ languages × distinct lengths per
    block), never documents — what a per-stratum length audit costs at
    100 TB. Hash-strict: int64 in, int64 out, same ceil rule as the
    windowed-cumsum oracle."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (batch.groupby(["lang", "n_chars"], sort=False)
             .size().reset_index(name="n"))
        return pd.DataFrame({"lang": g["lang"],
                             "v": g["n_chars"].astype("int64"),
                             "n": g["n"].astype("int64")})

    hist = combine_partials(
        _docs(sf_dir, ["lang", "n_chars"]).map_batches(
            partial, batch_format="pandas"),
        ["lang", "v"], {"n": "sum"}).to_pandas()
    rows = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("v")
        cum = g["n"].astype("int64").cumsum().to_numpy()
        total = int(cum[-1])
        vs = g["v"].to_numpy()
        for q in qs:
            need = -(-q * total // 100)  # ceil in int math
            rows.append({"lang": lang, "q": q,
                         "value": int(vs[(cum >= need).argmax()])})
    out = pd.DataFrame(rows).sort_values(["lang", "q"]).reset_index(drop=True)
    out["q"] = out["q"].astype("int64")
    out["value"] = out["value"].astype("int64")
    return out


def sliding_chunks(sf_dir: str, size: int = 256,
                   stride: int = 192) -> rd.Dataset:
    """Pretraining-style sliding-window chunk PLAN: fixed ``size``-token
    windows every ``stride`` tokens over each doc's whitespace token
    stream (25% overlap at the defaults — the stride trick that keeps
    context across window boundaries). Emits (doc_id, chunk_idx,
    start_tok, n_toks) — the plan a tokenize-and-pack stage consumes;
    the final short window is kept (n_toks < size), empty docs emit
    nothing. Pure per-doc integer arithmetic fanned out with numpy in
    the batch UDF: embarrassingly parallel, no shuffle at all, and the
    unnest(range(ceil(n/stride))) oracle hashes strictly."""

    def plan(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = (batch["text"].str.strip().str.split().str.len()
             .fillna(0).astype("int64").to_numpy())
        ids = batch["doc_id"].to_numpy()
        k = -(-n // stride)  # ceil(n/stride); 0 for empty docs
        doc = np.repeat(ids, k)
        idx = np.concatenate([np.arange(c) for c in k]) if len(k) else \
            np.array([], dtype="int64")
        start = idx * stride
        ntok = np.minimum(size, np.repeat(n, k) - start)
        return pd.DataFrame({
            "doc_id": pd.array(doc, dtype="int64"),
            "chunk_idx": pd.array(idx, dtype="int64"),
            "start_tok": pd.array(start, dtype="int64"),
            "n_toks": pd.array(ntok, dtype="int64")})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        plan, batch_format="pandas")


def collocations(sf_dir: str, k: int = 20, min_pair: int = 5,
                 n_candidates: int = 1000) -> pd.DataFrame:
    """PMI-ranked collocations with a PURE-INTEGER score: among the
    ``n_candidates`` most frequent bigrams (count ≥ ``min_pair``), rank
    by score_q = ⌊pair_n·W·10⁶ / (a_n·b_n)⌋ (W = total corpus tokens) —
    an order-preserving integer transform of the PMI argument
    pair_n·W/(a_n·b_n), so no float log ever enters the hash. The
    bounded candidate set is the scale lever: the full bigram table
    rides the combiner tree once, only candidate WORDS get a unigram
    count pass (wanted set broadcast via ray.put), and scoring runs on
    ≤ n_candidates rows. Ties break (score desc, bigram asc)."""
    from ..stages.agg import combine_partials

    def bigram_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.strip().str.split().explode()
        nxt = toks.groupby(level=0).shift(-1)
        counts = (toks + " " + nxt).dropna().value_counts()
        return pd.DataFrame({"bigram": counts.index, "cnt": counts.values})

    bi = combine_partials(
        _docs(sf_dir, ["text"]).map_batches(bigram_partial,
                                            batch_format="pandas"),
        ["bigram"], {"cnt": "sum"}).to_pandas()
    bi["cnt"] = bi["cnt"].astype("int64")
    cand = (bi[bi["cnt"] >= min_pair]
            .sort_values(["cnt", "bigram"], ascending=[False, True])
            .head(n_candidates))
    if cand.empty:
        return pd.DataFrame({"bigram": [], "pair_n": pd.array(
            [], dtype="int64"), "score_q": pd.array([], dtype="int64")})
    wanted = frozenset(w for b in cand["bigram"] for w in b.split(" "))
    wanted_ref = ray.put(wanted)

    def unigram_partial(batch: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(wanted_ref)
        toks = batch["text"].str.strip().str.split().explode().dropna()
        total = int(len(toks))
        counts = toks[toks.isin(want)].value_counts()
        out = pd.DataFrame({"word": counts.index,
                            "n": counts.values.astype("int64")})
        out.loc[len(out)] = ["\x00total", total]  # in-band scalar partial
        out["n"] = out["n"].astype("int64")
        return out

    uni = combine_partials(
        _docs(sf_dir, ["text"]).map_batches(unigram_partial,
                                            batch_format="pandas"),
        ["word"], {"n": "sum"}).to_pandas()
    uni["n"] = uni["n"].astype("int64")
    total_w = int(uni.loc[uni["word"] == "\x00total", "n"].iloc[0])
    wc = dict(zip(uni["word"], uni["n"]))

    rows = []
    for b, pn in zip(cand["bigram"], cand["cnt"]):
        w1, w2 = b.split(" ")
        score = (int(pn) * total_w * 1_000_000) // (wc[w1] * wc[w2])
        rows.append({"bigram": b, "pair_n": int(pn), "score_q": score})
    out = (pd.DataFrame(rows)
           .sort_values(["score_q", "bigram"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    out["pair_n"] = out["pair_n"].astype("int64")
    out["score_q"] = out["score_q"].astype("int64")
    return out


def dataset_split(sf_dir: str, train_pct: int = 80,
                  val_pct: int = 10) -> rd.Dataset:
    """Deterministic train/val/test assignment — the canonical ML
    data-prep step, in the repo's hash-draw design: the first 8 md5 hex
    chars of doc_id, as an integer u, place the doc in train
    (u < train_pct% of 16⁸), val (next val_pct%), else test. No RNG
    state, reproducible under any partitioning or rerun, proportional
    within every source/language stratum by the uniformity of the hash;
    integer thresholds make the DuckDB CASE oracle hash-strict.
    Embarrassingly parallel: one streaming map_batches, no shuffle."""
    from ..functions.hashing import md5_hex

    t_train = train_pct * 16**8 // 100
    t_val = (train_pct + val_pct) * 16**8 // 100

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        us = [int(md5_hex(str(d))[:8], 16) for d in batch["doc_id"]]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].values,
            "split": ["train" if u < t_train
                      else ("val" if u < t_val else "test")
                      for u in us]})

    return _docs(sf_dir, ["doc_id"]).map_batches(
        assign, batch_format="pandas")


def dsir_select(sf_dir: str, target_lang: str = "en",
                frac_num: int = 1, frac_den: int = 4) -> pd.DataFrame:
    """DSIR-style importance selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public): score
    every doc by its average per-word log importance ratio
    ln(p_target(w)/p_raw(w)) between a unigram LM of the TARGET domain
    (here the ``target_lang`` stratum) and one of the whole corpus, both
    add-one smoothed over the shared vocabulary; keep the top
    ``frac_num/frac_den`` fraction. The quantization (round(·1e6))
    follows lm_quality_rank's proven numpy↔DuckDB ln parity, so the
    selected set hashes strictly.

    Scale shape: ONE combiner pass produces both LMs ((word, raw count,
    target count) partials); the ratio table broadcasts via ``ray.put``
    (hash-bucketed in a 100 TB deployment, as in lm_quality_rank); the
    score pass emits per-batch TOP-N partials so the driver merges
    ≤ N·batches rows, never the corpus. Output (doc_id, score_q) of the
    selected docs, score desc / doc_id asc."""
    import numpy as np

    from ..stages.agg import combine_partials

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["text"].str.strip() != ""]
        toks = b["text"].str.strip().str.split().explode()
        tgt = toks[b["lang"].reindex(toks.index) == target_lang]
        cr = toks.value_counts()
        ct = tgt.value_counts()
        out = pd.DataFrame({"word": cr.index,
                            "cr": cr.values.astype("int64")})
        out["ct"] = out["word"].map(ct).fillna(0).astype("int64")
        out.loc[len(out)] = ["\x00docs", int((batch["text"].str.strip()
                                              != "").sum()), 0]
        return out

    cnt = combine_partials(
        _docs(sf_dir, ["text", "lang"]).map_batches(
            count_partial, batch_format="pandas"),
        ["word"], {"cr": "sum", "ct": "sum"}).to_pandas()
    n_docs = int(cnt.loc[cnt["word"] == "\x00docs", "cr"].iloc[0])
    cnt = cnt[cnt["word"] != "\x00docs"]
    v = len(cnt)
    tr = int(cnt["cr"].sum())
    tt = int(cnt["ct"].sum())
    n_keep = n_docs * frac_num // frac_den
    ratio = {w: (np.log((c_t + 1.0) / (tt + v))
                 - np.log((c_r + 1.0) / (tr + v)))
             for w, c_r, c_t in zip(cnt["word"], cnt["cr"], cnt["ct"])}
    ratio_ref = ray.put(ratio)

    def score_topn(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        r = ray.get(ratio_ref)
        b = batch[batch["text"].str.strip() != ""].reset_index(drop=True)
        if b.empty:
            return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                 "score_q": pd.array([], dtype="int64")})
        toks = b["text"].str.strip().str.split().explode()
        lr = toks.map(r).values
        g = pd.Series(lr, index=toks.index).groupby(level=0)
        # same floor(x*1e6+0.5) quantization contract as lm_quality_rank
        score_q = np.floor(g.sum() / g.size() * 1e6 + 0.5).astype("int64")
        out = pd.DataFrame({"doc_id": b["doc_id"].values,
                            "score_q": score_q.reindex(b.index).values})
        return (out.sort_values(["score_q", "doc_id"],
                                ascending=[False, True]).head(n_keep))

    parts = (_docs(sf_dir, ["doc_id", "text"])
             .map_batches(score_topn, batch_format="pandas").to_pandas())
    out = (parts.sort_values(["score_q", "doc_id"],
                             ascending=[False, True])
           .head(n_keep).reset_index(drop=True))
    out["doc_id"] = out["doc_id"].astype("int64")
    out["score_q"] = out["score_q"].astype("int64")
    return out


def textrank_keywords(sf_dir: str, k: int = 20,
                      n_iter: int = 3) -> pd.DataFrame:
    """TextRank keyword ranking (Mihalcea & Tarau 2004) over the corpus
    word co-occurrence graph — the graph-centrality keyword extractor a
    training-data profile pass uses, and the engine's first iterative
    distributed graph algorithm with a hash-strict SQL oracle.

    Graph: whitespace tokens (top_bigrams' parity-proven tokenization);
    one undirected edge per adjacent pair with a != b, weight = adjacency
    count, symmetrized at birth (each pair emits both directions).
    Rank update at fixed point scale 2**20 with damping 17/20:

        r_0(v)     = 2**20
        r_{i+1}(v) = 157286 + (17 * sum_{u->v} (r_i(u)*w_uv) // W_u) // 20

    with floor division throughout — all operands positive, so Python
    ``//``, numpy ``//`` and DuckDB ``//`` agree bit-for-bit and the
    unrolled three-iteration CTE oracle hashes strictly. In a symmetric
    graph every node has both in- and out-edges, so the node set is
    stable across iterations (isolated single-token documents contribute
    no node, matching the oracle's edge-derived domain).

    Scale shape: edge partials ride the combiner tree (the shuffle moves
    (src, dst, cnt) rows, never documents); the combined edge table is
    repartitioned and materialized ONCE (bigram-vocab-sized — the same
    driver bound top_bigrams already accepts) and each iteration is one
    map_batches over those edge blocks plus a vocab-sized combiner; the
    rank and out-weight vectors broadcast via ``ray.put`` (vocab-sized,
    the accepted DSIR ratio-table pattern — hash-bucket co-partition of
    edges-by-src with rank replaces the broadcast when the vocabulary
    outgrows the driver). int64 bound: r <= N*2**20 total mass, so
    r*w stays under 2**63 for any corpus whose bigram multiplicity times
    vocabulary fits 2**22 bits — documented, not checked per row.
    Output: top-k (word, rank_q), rank desc / word asc."""
    import numpy as np

    from ..stages.agg import combine_partials

    def edge_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["text"].str.strip() != ""]
        toks = b["text"].str.strip().str.split().explode()
        nxt = toks.groupby(level=0).shift(-1)
        m = nxt.notna() & (toks != nxt)
        a, c = toks[m].values, nxt[m].values
        cnt = (pd.DataFrame({"src": np.concatenate([a, c]),
                             "dst": np.concatenate([c, a])})
               .value_counts(sort=False))
        idx = cnt.index.to_frame(index=False)
        return pd.DataFrame({"src": idx["src"], "dst": idx["dst"],
                             "w": cnt.values.astype("int64")})

    edges = combine_partials(
        _docs(sf_dir, ["text"]).map_batches(edge_partial,
                                            batch_format="pandas"),
        ["src", "dst"], {"w": "sum"}).repartition(8).materialize()

    outw = combine_partials(
        edges.map_batches(
            lambda b: b.groupby("src", sort=False)["w"].sum()
            .rename("wtot").reset_index(),
            batch_format="pandas"),
        ["src"], {"wtot": "sum"}).to_pandas()
    wtot_ref = ray.put(dict(zip(outw["src"], outw["wtot"].astype("int64"))))
    rank = {s: 1 << 20 for s in outw["src"]}

    for _ in range(n_iter):
        rank_ref = ray.put(rank)

        def contrib(batch: pd.DataFrame, _r=rank_ref) -> pd.DataFrame:
            r = batch["src"].map(ray.get(_r)).values.astype("int64")
            wt = batch["src"].map(ray.get(wtot_ref)).values.astype("int64")
            c = (r * batch["w"].values.astype("int64")) // wt
            out = pd.DataFrame({"dst": batch["dst"], "c": c})
            return out.groupby("dst", sort=False)["c"].sum().reset_index()

        s = combine_partials(
            edges.map_batches(contrib, batch_format="pandas"),
            ["dst"], {"c": "sum"}).to_pandas()
        rank = {d: 157286 + (17 * int(c)) // 20
                for d, c in zip(s["dst"], s["c"])}

    out = pd.DataFrame({"word": list(rank.keys()),
                        "rank_q": pd.array(list(rank.values()),
                                           dtype="int64")})
    return (out.sort_values(["rank_q", "word"], ascending=[False, True])
            .head(k).reset_index(drop=True))


def bigram_lm_nll(sf_dir: str) -> pd.DataFrame:
    """Bigram-LM quality scoring — the second-order refinement of
    lm_quality_rank's unigram CCNet filter (Wenzek et al. 2020; Heafield
    KenLM, public): score every document by the average negative
    log-probability of its adjacent word pairs under an add-one-smoothed
    bigram LM trained on the corpus itself:

        P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V)

    with c(w1,·) the left-context total and V the distinct-unigram
    vocabulary size. Repetitive/boilerplate text scores low-NLL, word
    soup scores high — the standard in-domain fluency signal a unigram
    model cannot see (it ignores order entirely).

    Exactness: the quantization is floor(avg_nll·1e6 + 0.5) and the LN
    argument is formed identically on both sides ((c+1.0)/(ctot+V),
    exact-int operands), reusing lm_quality_rank's proven numpy↔DuckDB
    ln parity. Docs with <2 tokens have no bigram and are excluded,
    matching the oracle's pair-derived domain.

    Scale shape: bigram and unigram counts ride the combiner tree (one
    (w1,w2,cnt) / (word,cnt) row per batch — partials, never text); the
    bigram-count map broadcasts via ``ray.put`` (bigram-vocab-sized, the
    top_bigrams bound; a term-bucketed join replaces it past driver
    scale); the score pass is one streaming vectorized map_batches.
    Output (doc_id, n_bigrams, nll_q), doc_id asc."""
    import numpy as np

    from ..stages.agg import combine_partials

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.strip().str.split().explode()
        nxt = toks.groupby(level=0).shift(-1)
        m = nxt.notna()
        counts = (pd.DataFrame({"w1": toks[m].values, "w2": nxt[m].values})
                  .value_counts(sort=False))
        idx = counts.index.to_frame(index=False)
        return pd.DataFrame({"w1": idx["w1"], "w2": idx["w2"],
                             "c": counts.values.astype("int64")})

    def uni_partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = (batch["text"].str.strip().str.split().explode()
                  .dropna().value_counts())
        return pd.DataFrame({"word": counts.index,
                             "cnt": counts.values.astype("int64")})

    c2 = combine_partials(
        _docs(sf_dir, ["text"]).map_batches(pair_partial,
                                            batch_format="pandas"),
        ["w1", "w2"], {"c": "sum"}).to_pandas()
    v_size = len(combine_partials(
        _docs(sf_dir, ["text"]).map_batches(uni_partial,
                                            batch_format="pandas"),
        ["word"], {"cnt": "sum"}).to_pandas())
    ctot = c2.groupby("w1", sort=False)["c"].sum()
    model_ref = ray.put((
        dict(zip(c2["w1"] + " " + c2["w2"], c2["c"].astype("int64"))),
        dict(zip(ctot.index, ctot.astype("int64"))),
        int(v_size)))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        pair_c, left_c, v = ray.get(model_ref)
        b = batch.reset_index(drop=True)
        toks = b["text"].str.strip().str.split().explode()
        nxt = toks.groupby(level=0).shift(-1)
        m = nxt.notna()
        w1, pair = toks[m], toks[m] + " " + nxt[m]
        c = pair.map(pair_c).values.astype("int64")
        tot = w1.map(left_c).values.astype("int64")
        nll = -np.log((c + 1.0) / (tot + np.int64(v)))
        g = pd.Series(nll, index=w1.index).groupby(level=0)
        avg_q = np.floor(g.sum() / g.size() * 1e6 + 0.5).astype("int64")
        out = pd.DataFrame({"doc_id": b["doc_id"],
                            "n_bigrams": g.size().reindex(b.index),
                            "nll_q": avg_q.reindex(b.index)})
        out = out.dropna(subset=["n_bigrams"])
        out["n_bigrams"] = out["n_bigrams"].astype("int64")
        out["nll_q"] = out["nll_q"].astype("int64")
        return out

    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(score, batch_format="pandas").to_pandas())
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def nb_quality_scores(sf_dir: str, pos_source: str = "src0") -> pd.DataFrame:
    """Supervised quality-classifier scoring — the multinomial
    Naive-Bayes stand-in for the fastText quality filter every
    LLaMA/CCNet-style pipeline runs (Touvron et al. 2023 train a
    classifier on "reference" pages and keep web docs the model scores
    high; fastText itself is out of sandbox, NB is its exactly-computable
    cousin over the same bag-of-words). One source (``pos_source``) is
    the reference class, everything else is background; every doc gets
    the add-one-smoothed log-odds

        score(d) = ln(d_pos/d_neg)
                 + Σ_w∈d  ln( ((c_pos(w)+1)·(N_neg+V))
                            / ((c_neg(w)+1)·(N_pos+V)) )

    with c_cls(w) the class token counts, N_cls their totals and V the
    distinct-vocabulary size. Output (doc_id, n_tokens, logodds_q),
    doc_id asc; empty-trim docs are excluded (no tokens, no score).

    Exactness: every ln argument is a ratio of exact-integer products
    (each factor < 2^26 at oracle scales, products < 2^53 ⇒ exact
    doubles formed identically on both sides), per-doc sums run in token
    order, the prior adds AFTER the sum, and the quantization is the
    repo-wide floor(x·1e6+0.5) — the same ln-parity contract
    bigram_lm_nll proved hash-strict.

    Scale shape: per-class word counts ride the combiner tree (one
    (word, c_pos, c_neg) row per word per batch — partials, never text);
    the model broadcasts once via ``ray.put`` (vocab-sized, the
    source_vocab bound; a word-bucketed join replaces it past driver
    scale); scoring is one streaming vectorized map_batches over the
    corpus. Nothing doc-sized ever reaches the driver."""
    import numpy as np

    from ..stages.agg import combine_partials

    # doc-count sentinel key: split() tokens can never contain
    # whitespace, so a space-bearing key cannot collide with a word —
    # the per-class doc counts ride the SAME combiner pass as the word
    # counts (one corpus scan, not two)
    _DOCS_KEY = " docs "

    def cls_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.reset_index(drop=True)
        toks = b["text"].str.strip().str.split().explode().dropna()
        is_pos = b["source"].eq(pos_source).reindex(toks.index)
        df = pd.DataFrame({"word": toks.values,
                           "p": is_pos.values.astype("int64")})
        g = df.groupby("word", sort=False)["p"].agg(["sum", "size"])
        ne = b["text"].str.strip().ne("")
        pos_docs = int((b["source"].eq(pos_source) & ne).sum())
        neg_docs = int((~b["source"].eq(pos_source) & ne).sum())
        return pd.DataFrame({
            "word": list(g.index) + [_DOCS_KEY],
            "c_pos": list(g["sum"].astype("int64").values) + [pos_docs],
            "c_neg": list((g["size"] - g["sum"]).astype("int64").values)
            + [neg_docs]})

    w = combine_partials(
        _docs(sf_dir, ["text", "source"]).map_batches(
            cls_partial, batch_format="pandas"),
        ["word"], {"c_pos": "sum", "c_neg": "sum"}).to_pandas()
    dmask = w["word"] == _DOCS_KEY
    d_pos = int(w.loc[dmask, "c_pos"].sum())
    d_neg = int(w.loc[dmask, "c_neg"].sum())
    w = w[~dmask].reset_index(drop=True)
    if not d_pos or not d_neg:
        raise ValueError(f"class {pos_source!r} or its complement is "
                         "empty — the log-odds prior is undefined")
    n_pos = int(w["c_pos"].astype("int64").sum())
    n_neg = int(w["c_neg"].astype("int64").sum())
    v = len(w)
    prior = float(np.log(np.float64(d_pos) / np.float64(d_neg)))
    model_ref = ray.put((dict(zip(w["word"], w["c_pos"].astype("int64"))),
                         dict(zip(w["word"], w["c_neg"].astype("int64")))))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        cp_map, cn_map = ray.get(model_ref)
        b = batch.reset_index(drop=True)
        toks = b["text"].str.strip().str.split().explode().dropna()
        cp = toks.map(cp_map).values.astype("int64")
        cn = toks.map(cn_map).values.astype("int64")
        contrib = np.log(((cp + 1.0) * np.float64(n_neg + v))
                         / ((cn + 1.0) * np.float64(n_pos + v)))
        g = pd.Series(contrib, index=toks.index).groupby(level=0)
        q = np.floor((g.sum() + prior) * 1e6 + 0.5).astype("int64")
        out = pd.DataFrame({"doc_id": b["doc_id"],
                            "n_tokens": g.size().reindex(b.index),
                            "logodds_q": q.reindex(b.index)})
        out = out.dropna(subset=["n_tokens"])
        out["n_tokens"] = out["n_tokens"].astype("int64")
        out["logodds_q"] = out["logodds_q"].astype("int64")
        return out

    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(score, batch_format="pandas").to_pandas())
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def bpe_fertility(sf_dir: str) -> pd.DataFrame:
    """Per-language TOKENIZER FERTILITY: BPE tokens per whitespace word
    and bytes per BPE token — the standard multilingual tokenizer
    health check (a language with fertility ≫ corpus mean is
    under-served by the merge table and will train poorly; Rust et al.
    2021). Uses the FROZEN merge table (functions/bpe_counter.py, the
    reproducible tiktoken substitute behind ExtractConfig
    token_counter="bpe"). No SQL oracle (BPE is iterative merging);
    pytest pins a replica on a hand corpus. Ratios quantized
    floor(x·1e6+0.5). Scale: one streaming map_batches emits per-lang
    (words, bpe_tokens, bytes) partials through the combiner tree;
    output is lang-count-sized."""
    import numpy as np

    from ..functions.bpe_counter import bpe_num_tokens
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {}
        for lang, text in zip(batch["lang"], batch["text"]):
            t = text.strip()
            words = len(t.split()) if t else 0
            toks = bpe_num_tokens(text)
            r = rows.setdefault(lang, [0, 0, 0])
            r[0] += words
            r[1] += toks
            r[2] += len(text.encode("utf-8"))
        return pd.DataFrame({
            "lang": list(rows),
            "n_words": pd.array([v[0] for v in rows.values()],
                                dtype="int64"),
            "n_bpe_tokens": pd.array([v[1] for v in rows.values()],
                                     dtype="int64"),
            "n_bytes": pd.array([v[2] for v in rows.values()],
                                dtype="int64")})

    out = combine_partials(
        _docs(sf_dir, ["lang", "text"]).map_batches(partial,
                                                    batch_format="pandas"),
        ["lang"], {"n_words": "sum", "n_bpe_tokens": "sum",
                   "n_bytes": "sum"}).to_pandas()
    for c in ("n_words", "n_bpe_tokens", "n_bytes"):
        out[c] = out[c].astype("int64")
    w = np.maximum(out["n_words"].to_numpy(np.float64), 1.0)
    t = np.maximum(out["n_bpe_tokens"].to_numpy(np.float64), 1.0)
    out["fertility_q"] = pd.array(
        np.floor(out["n_bpe_tokens"].to_numpy() / w * 1e6 + 0.5),
        dtype="int64")
    out["bytes_per_token_q"] = pd.array(
        np.floor(out["n_bytes"].to_numpy() / t * 1e6 + 0.5),
        dtype="int64")
    return out.sort_values("lang").reset_index(drop=True)


def hll_accuracy(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """SKETCH-CALIBRATION probe for the HyperLogLog distinct-word
    estimator: estimate, EXACT distinct count (one distinct-word
    combiner pass — the thing the sketch exists to avoid at scale, run
    here on the bounded vocabulary to grade the sketch) and the
    quantized relative error. Completes the calibration family
    (minhash_estimator_accuracy, emb_text_dup_agreement,
    jaccard_threshold_sweep): run this once on a labeled slice before
    trusting the p you picked corpus-wide (theory: σ ≈ 1.04/√2^p).
    No SQL oracle (the register hash isn't SQL); pytest pins the exact
    side against COUNT(DISTINCT) and bounds |rel_err| at 5σ. Output one
    row (n_distinct_est, n_distinct_exact, rel_err_q, n_registers)."""
    import numpy as np

    from ..stages.agg import combine_partials

    est = int(approx_distinct_words(sf_dir, p)["n_distinct_est"][0])

    def vocab_partial(batch: pd.DataFrame) -> pd.DataFrame:
        words = (batch["text"].str.split().explode().dropna()
                 .drop_duplicates())
        return pd.DataFrame({"word": words.values,
                             "one": np.ones(len(words), dtype="int64")})

    exact = len(combine_partials(
        _docs(sf_dir, ["text"]).map_batches(vocab_partial,
                                            batch_format="pandas"),
        ["word"], {"one": "max"}).to_pandas())
    rel = (est - exact) / exact if exact else 0.0
    return pd.DataFrame({
        "n_distinct_est": pd.array([est], dtype="int64"),
        "n_distinct_exact": pd.array([exact], dtype="int64"),
        "rel_err_q": pd.array([int(np.floor(rel * 1e6 + 0.5))],
                              dtype="int64"),
        "n_registers": pd.array([1 << p], dtype="int64")})


def source_lang_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-source LANGUAGE ENTROPY — the mixing diagnostic that flags a
    "multilingual" subset that is actually 99% one language before you
    weight it into a training mix: H(src) = −Σ_l (c_l/T)·ln(c_l/T) in
    nats over the source's lang counts. Hash-strict via the ln-parity
    contract: every ln argument is a ratio of exact ints formed
    identically on both sides, terms sum in lang order, quantize
    floor(x·1e6+0.5). Scale: (source, lang, n) partials ride the
    combiner tree; the entropy scan runs on the sources×langs frame.
    Output (source, n_docs, n_langs, entropy_q), source asc."""
    import numpy as np

    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (batch.groupby(["source", "lang"], sort=False)
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype("int64")
        return g

    hist = combine_partials(
        _docs(sf_dir, ["source", "lang"]).map_batches(
            partial, batch_format="pandas"),
        ["source", "lang"], {"n": "sum"}).to_pandas()
    empty = pd.DataFrame({"source": pd.array([], dtype="string"),
                          "n_docs": pd.array([], dtype="int64"),
                          "n_langs": pd.array([], dtype="int64"),
                          "entropy_q": pd.array([], dtype="int64")})
    if hist.empty or "source" not in hist.columns:
        return empty
    rows = []
    for src, g in hist.groupby("source"):
        g = g.sort_values("lang")
        n = g["n"].to_numpy(np.int64)
        t = int(n.sum())
        h = float(-(n / t * np.log(n / t)).sum())
        rows.append({"source": src, "n_docs": t, "n_langs": len(g),
                     "entropy_q": int(np.floor(h * 1e6 + 0.5))})
    out = pd.DataFrame(rows)
    if out.empty:
        return empty
    for c in ("n_docs", "n_langs", "entropy_q"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def dup_share_by_source(sf_dir: str) -> pd.DataFrame:
    """WHERE does the duplication come from: per source, how many docs
    carry a text (md5) that occurs ≥2 times CORPUS-WIDE — the
    per-subset view that tells you which crawl to de-weight before
    mixing (complements source_leakage_matrix's pair view). Hash-strict;
    share in exact integer floor division (n_dup·10^6 // n_docs).
    Scale: (md5, source) rows shuffle once through the combiner tree
    keyed by hash; text never moves."""
    import numpy as np

    from ..functions.hashing import md5_hex
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "h": [md5_hex(t) for t in batch["text"]],
            "source": batch["source"].values})
        g = (out.groupby(["h", "source"], sort=False)
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype("int64")
        return g

    hist = combine_partials(
        _docs(sf_dir, ["text", "source"]).map_batches(
            partial, batch_format="pandas"),
        ["h", "source"], {"n": "sum"}).to_pandas()
    if hist.empty or "h" not in hist.columns:
        return pd.DataFrame({"source": pd.array([], dtype="string"),
                             "n_docs": pd.array([], dtype="int64"),
                             "n_dup_docs": pd.array([], dtype="int64"),
                             "dup_share_q": pd.array([], dtype="int64")})
    tot = hist.groupby("h")["n"].transform("sum")
    hist["n_dup"] = np.where(tot >= 2, hist["n"], 0)
    out = (hist.groupby("source")
           .agg(n_docs=("n", "sum"), n_dup_docs=("n_dup", "sum"))
           .reset_index())
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_dup_docs"] = out["n_dup_docs"].astype("int64")
    out["dup_share_q"] = (out["n_dup_docs"] * 1_000_000
                          // out["n_docs"]).astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def compression_ratio(sf_dir: str, level: int = 6) -> pd.DataFrame:
    """Per-doc zlib COMPRESSION-RATIO quality signal — the published
    cheap filter (used alongside Gopher rules in RefinedWeb/FineWeb
    lineage): highly repetitive or templated text compresses far below
    natural prose, word salad compresses worse; both tails get cut.
    ratio_q = floor(compressed_bytes·10^6 / max(raw_bytes, 1)) — exact
    integer floor division, deterministic for a fixed zlib level (the
    stdlib's zlib is the same everywhere this engine runs). No SQL
    oracle (DuckDB has no zlib); pytest pins a replica plus the
    repetitive < prose < random ordering. Scale: one streaming
    map_batches; eight bytes per doc leave the workers."""
    import zlib

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        raw = [t.encode("utf-8") for t in batch["text"]]
        comp = [len(zlib.compress(b, level)) for b in raw]
        nraw = [len(b) for b in raw]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64").values,
            "raw_bytes": pd.array(nraw, dtype="int64"),
            "compressed_bytes": pd.array(comp, dtype="int64"),
            "ratio_q": pd.array(
                [c * 1_000_000 // max(n, 1)
                 for c, n in zip(comp, nraw)], dtype="int64")})

    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(fn, batch_format="pandas").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def weighted_sample(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Deterministic WEIGHTED sampling without replacement
    (Efraimidis & Spirakis 2006): doc i gets key ln(u_i)/w_i with
    u_i = (md5_int32(doc_id)+1)/2^32 and weight w_i = n_chars; the k
    LARGEST keys are the sample — each doc's inclusion probability is
    proportional to its weight, with NO RNG state (md5 of the id is the
    uniform, the stratified_sample convention), so any partitioning and
    any rerun draw the same sample. The standard move for
    quality/length-weighted corpus subsampling. Hash-strict: u is an
    exact-int ratio, ln-parity, one division by the int weight —
    identical expressions both sides; keys quantize floor(x·1e6+0.5)
    (ties broken by doc_id). Scale: per-batch local top-k partials
    (stages/agg.local_topk — ≤k rows per block reach the driver)."""
    import hashlib

    import numpy as np

    from ..stages.agg import local_topk

    def keys(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["n_chars"] > 0]
        h = np.fromiter(
            (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
             for d in b["doc_id"]), dtype=np.int64, count=len(b))
        u = (h + 1.0) / 4294967296.0
        key = np.log(u) / b["n_chars"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").values,
            "w": b["n_chars"].astype("int64").values,
            "key": key})

    top = local_topk(
        _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
            keys, batch_format="pandas"),
        by=["key", "doc_id"], ascending=[False, True], k=k)
    out = pd.DataFrame({
        "doc_id": top["doc_id"].astype("int64"),
        "w": top["w"].astype("int64"),
        "key_q": pd.array(np.floor(top["key"].to_numpy() * 1e6 + 0.5),
                          dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


def metric_correlation(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation between doc LENGTH (n_chars) and whitespace
    TOKEN COUNT — the filter-design sanity check ("does my quality
    signal just measure length?"; run it for any metric pair before
    adding a correlated filter that double-cuts). Exactness: the five
    sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are exact int64
    combiner-tree partials; r = (nΣxy − ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²))
    has exact-int numerator/radicands, ONE sqrt and ONE division in
    doubles formed identically on both sides (HUGEINT products in the
    oracle), quantized floor(x·1e6+0.5). Output one row
    (n, r_q). Scale: one streaming pass, five ints per batch."""
    import numpy as np

    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch["n_chars"].to_numpy(np.int64)
        t = batch["text"].str.strip()
        y = np.where(t.eq("").to_numpy(), 0,
                     t.str.split().str.len().fillna(0)
                     .to_numpy(np.int64))
        return pd.DataFrame({
            "k": pd.array([0], dtype="int64"),
            "n": pd.array([len(x)], dtype="int64"),
            "sx": pd.array([int(x.sum())], dtype="int64"),
            "sy": pd.array([int(y.sum())], dtype="int64"),
            "sxy": pd.array([int((x * y).sum())], dtype="int64"),
            "sxx": pd.array([int((x * x).sum())], dtype="int64"),
            "syy": pd.array([int((y * y).sum())], dtype="int64")})

    s = combine_partials(
        _docs(sf_dir, ["text", "n_chars"]).map_batches(
            partial, batch_format="pandas"),
        ["k"], {c: "sum" for c in ("n", "sx", "sy", "sxy",
                                   "sxx", "syy")}).to_pandas()
    n, sx, sy = int(s["n"][0]), int(s["sx"][0]), int(s["sy"][0])
    sxy, sxx, syy = int(s["sxy"][0]), int(s["sxx"][0]), int(s["syy"][0])
    num = n * sxy - sx * sy
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    r = (float(num) / np.sqrt(float(vx) * float(vy))
         if vx > 0 and vy > 0 else 0.0)
    return pd.DataFrame({
        "n": pd.array([n], dtype="int64"),
        "r_q": pd.array([int(np.floor(r * 1e6 + 0.5))], dtype="int64")})


def vocab_growth_curve(sf_dir: str, step: int = 50) -> pd.DataFrame:
    """Heaps-law VOCABULARY GROWTH curve: distinct words seen within the
    first k docs (doc_id order), at k = step, 2·step, … — the
    diminishing-returns view that says when more of the SAME source
    stops buying new vocabulary (Heaps 1978). One pass, no sequential
    scan: each word's FIRST doc_id is a min-combiner partial; the tiny
    (first_doc → count) histogram cumsums into the curve. Hash-strict.
    Output (n_docs_prefix, n_distinct_words)."""
    import numpy as np

    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.reset_index(drop=True)
        toks = b["text"].str.strip().str.split().explode().dropna()
        first = (pd.DataFrame({
            "word": toks.values,
            "d": b["doc_id"].astype("int64")
            .reindex(toks.index).values})
            .groupby("word", sort=False)["d"].min().reset_index())
        first["d"] = first["d"].astype("int64")
        return first

    first = combine_partials(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            partial, batch_format="pandas"),
        ["word"], {"d": "min"}).to_pandas()
    if first.empty or "d" not in first.columns:
        return pd.DataFrame({
            "n_docs_prefix": pd.array([], dtype="int64"),
            "n_distinct_words": pd.array([], dtype="int64")})
    n_docs = int(_docs(sf_dir, ["doc_id"]).max("doc_id")) + 1
    hist = first.groupby("d").size().sort_index()
    cum = hist.cumsum()
    grid = list(range(step, n_docs + 1, step))
    if not grid or grid[-1] != n_docs:
        grid.append(n_docs)
    vals = [int(cum[cum.index <= g - 1].iloc[-1])
            if (cum.index <= g - 1).any() else 0 for g in grid]
    return pd.DataFrame({
        "n_docs_prefix": pd.array(grid, dtype="int64"),
        "n_distinct_words": pd.array(vals, dtype="int64")})


def zipf_exponent(sf_dir: str, top_n: int = 100) -> pd.DataFrame:
    """Zipf-fit CORPUS-HEALTH probe: OLS slope of ln(freq) on ln(rank)
    over the top-``top_n`` words — natural language sits near −1;
    templated/synthetic text bends the rank-frequency line and the
    slope flags it (Piantadosi 2014 review). Word counts ride the
    combiner tree (the top_words shape); the regression runs on the
    top_n frame. Exactness: ranks and counts are exact ints, ln args
    are those ints (ln-parity), the OLS sums accumulate in rank order
    on both sides, slope/intercept quantize floor(x·1e6+0.5). Output
    one row (n_terms, slope_q, intercept_q)."""
    import numpy as np

    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = (batch["text"].str.strip().str.split().explode()
                  .dropna().value_counts())
        return pd.DataFrame({"word": counts.index,
                             "cnt": counts.values.astype("int64")})

    w = combine_partials(
        _docs(sf_dir, ["text"]).map_batches(partial,
                                            batch_format="pandas"),
        ["word"], {"cnt": "sum"}).to_pandas()
    w = (w.sort_values(["cnt", "word"], ascending=[False, True])
         .head(top_n).reset_index(drop=True))
    n = len(w)
    if n < 2:
        return pd.DataFrame({"n_terms": pd.array([n], dtype="int64"),
                             "slope_q": pd.array([0], dtype="int64"),
                             "intercept_q": pd.array([0], dtype="int64")})
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(w["cnt"].to_numpy(np.int64).astype(np.float64))
    # sequential python sums, NOT np.sum: numpy's pairwise accumulation
    # could differ from DuckDB's sequential SUM in the last ulp and flip
    # the 1e-6 quantization
    sx, sy = sum(x.tolist()), sum(y.tolist())
    sxy = sum((x * y).tolist())
    sxx = sum((x * x).tolist())
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame({
        "n_terms": pd.array([n], dtype="int64"),
        "slope_q": pd.array([int(np.floor(slope * 1e6 + 0.5))],
                            dtype="int64"),
        "intercept_q": pd.array([int(np.floor(intercept * 1e6 + 0.5))],
                                dtype="int64")})


def stopword_coverage(sf_dir: str) -> pd.DataFrame:
    """LANG-LABEL QA: per doc, how many of its [a-zà-ÿ]+ words are
    function words of ITS OWN labeled language (textstats._LANG_MARKERS
    — the same per-lang lists lang_id votes with). A doc labeled 'fr'
    with near-zero fr-stopword coverage is mislabeled or non-linguistic
    — the cheap screen run before trusting provider language tags (zh
    measures CJK char density instead; the marker lists are
    Latin-script). Exact ints + integer floor share ⇒ hash-strict.
    Scale: one streaming vectorized pass. Output (doc_id, lang,
    n_words, n_stop, cover_q), doc_id asc."""
    import numpy as np

    from ..functions.textstats import _CJK_RE, _LANG_MARKERS, _WORD_RE

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": batch["doc_id"].astype("int64").values,
                "lang": batch["lang"].values, "n_words": [],
                "n_stop": []}
        for lang, text in zip(batch["lang"], batch["text"]):
            if lang == "zh":
                words = _CJK_RE.findall(text)
                n_stop = 0  # marker lists are Latin-script; zh coverage
                # is CJK char density by definition, not function words
            else:
                words = _WORD_RE.findall(text.lower())
                stop = _LANG_MARKERS.get(lang, frozenset())
                n_stop = sum(1 for w in words if w in stop)
            rows["n_words"].append(len(words))
            rows["n_stop"].append(n_stop)
        out = pd.DataFrame({
            "doc_id": rows["doc_id"],
            "lang": rows["lang"],
            "n_words": pd.array(rows["n_words"], dtype="int64"),
            "n_stop": pd.array(rows["n_stop"], dtype="int64")})
        out["cover_q"] = (out["n_stop"] * 1_000_000
                          // np.maximum(out["n_words"], 1)).astype("int64")
        return out

    out = (_docs(sf_dir, ["doc_id", "lang", "text"])
           .map_batches(fn, batch_format="pandas").to_pandas())
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def doc_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-doc UNIGRAM ENTROPY in nats — the text-diversity signal that
    separates natural prose from repeated boilerplate even when lengths
    match (the information-theoretic twin of compression_ratio; CCNet
    lineage): H(d) = −Σ_w (c_w/T)·ln(c_w/T) over the doc's own word
    counts. Hash-strict via ln parity (int-ratio LN args, terms summed
    in word order, floor(x·1e6+0.5)); empty-trim docs excluded. Scale:
    one streaming pass, per-doc work only. Output (doc_id, n_tokens,
    entropy_q), doc_id asc."""
    import numpy as np

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.reset_index(drop=True)
        ids, toks, ents = [], [], []
        for did, text in zip(b["doc_id"], b["text"]):
            ws = text.strip().split()
            if not ws:
                continue
            vc = pd.Series(ws).value_counts().sort_index()
            c = vc.to_numpy(np.int64)
            t = int(c.sum())
            h = float(-((c / t) * np.log(c / t)).sum())
            ids.append(int(did))
            toks.append(t)
            ents.append(int(np.floor(h * 1e6 + 0.5)))
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "n_tokens": pd.array(toks, dtype="int64"),
            "entropy_q": pd.array(ents, dtype="int64")})

    out = (_docs(sf_dir, ["doc_id", "text"])
           .map_batches(fn, batch_format="pandas").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def quality_filter_agreement(sf_dir: str,
                             pos_source: str = "src0") -> pd.DataFrame:
    """FILTER-STACK CALIBRATION: confusion counts between the two
    quality signals the engine ships — the rule-based Gopher lexical
    gate (pass_gopher) and the learned NB classifier (logodds > 0
    against ``pos_source``). High agreement means the second filter is
    redundant; low agreement means the stack cuts twice (run this
    before composing filters — the same question
    emb_text_dup_agreement answers for dedup signals). Output one row
    (n_docs, n_gopher, n_nb, n_both, jaccard_q) with the overlap in
    exact integer floor division — hash-strict by composing the two
    existing oracles.

    Scale shape: NB scoring streams with the broadcast model
    (nb_quality_scores' shape) and its per-doc frame is that query's
    existing driver contract; the gopher side reduces to confusion
    PARTIALS inside map_batches against the broadcast NB-positive id
    set (positives-bounded; an id-bucket co-partition replaces the
    broadcast past driver scale)."""
    import numpy as np

    from ..stages.agg import combine_partials

    nb = nb_quality_scores(sf_dir, pos_source)
    pos_ids = frozenset(nb.loc[nb["logodds_q"] > 0, "doc_id"]
                        .astype(int))
    pos_ref = ray.put(pos_ids)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        pos = ray.get(pos_ref)
        g = batch["pass_gopher"].astype("int64").to_numpy()
        isnb = batch["doc_id"].astype("int64").isin(pos).to_numpy()
        return pd.DataFrame({
            "k": pd.array([0], dtype="int64"),
            "n_docs": pd.array([len(batch)], dtype="int64"),
            "n_gopher": pd.array([int(g.sum())], dtype="int64"),
            "n_nb": pd.array([int(isnb.sum())], dtype="int64"),
            "n_both": pd.array([int((g.astype(bool) & isnb).sum())],
                               dtype="int64")})

    s = combine_partials(
        gopher_filter(sf_dir).map_batches(partial,
                                          batch_format="pandas"),
        ["k"], {c: "sum" for c in ("n_docs", "n_gopher", "n_nb",
                                   "n_both")}).to_pandas()
    n_docs, n_g = int(s["n_docs"][0]), int(s["n_gopher"][0])
    n_nb, n_b = int(s["n_nb"][0]), int(s["n_both"][0])
    union = n_g + n_nb - n_b
    return pd.DataFrame({
        "n_docs": pd.array([n_docs], dtype="int64"),
        "n_gopher": pd.array([n_g], dtype="int64"),
        "n_nb": pd.array([n_nb], dtype="int64"),
        "n_both": pd.array([n_b], dtype="int64"),
        "jaccard_q": pd.array([n_b * 1_000_000 // max(union, 1)],
                              dtype="int64")})


BADWORDS = ("slow", "legacy", "stale")


def badwords_filter(sf_dir: str,
                    words: tuple = BADWORDS) -> rd.Dataset:
    """C4-style blocklist filter: a document is dropped when ANY
    whitespace token matches the blocklist (exact token membership, the
    C4 'bad words' rule — not substring, so 'slower' survives 'slow').
    Output per doc: (doc_id, n_bad, kept) with kept as int64 0/1.

    Scale: the blocklist is a tiny broadcast constant closed over by the
    batch fn; one streaming map_batches, no shuffle. The per-row split
    walk is the same per-document text loop every quality op pays (the
    work is inherently per-doc); the oracle replays the identical token
    semantics with list_filter over string_split_regex."""
    bad = frozenset(words)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        n_bad = [sum(t in bad for t in txt.split())
                 for txt in batch["text"]]
        arr = np.asarray(n_bad, dtype="int64")
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_bad": arr,
            "kept": (arr == 0).astype("int64"),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas")


def domain_quota_sample(sf_dir: str, quota: int = 12) -> pd.DataFrame:
    """Per-domain document quota — the crawl-balancing move (cap any one
    domain's contribution so a few giant hosts don't dominate the
    corpus). Within each ``source`` keep the ``quota`` docs with the
    smallest md5(doc_id) hex digest: a deterministic uniform draw both
    engines compute identically (ties impossible — the digest keys on
    the unique doc_id).

    Scale: classic distributed top-N — each batch prunes to its local
    quota winners per source (a batch can never contribute more), so the
    shuffle carries at most sources x quota x n_blocks tiny rows; the
    final per-source selection runs on quota-bounded groups. Text never
    moves."""
    import hashlib

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(str(d).encode()).hexdigest()
             for d in batch["doc_id"]]
        g = pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                          "source": batch["source"], "h": h})
        return (g.sort_values(["source", "h"])
                .groupby("source", sort=False).head(quota))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values("h").head(quota)[["doc_id", "source"]]
                .reset_index(drop=True))

    out = (_docs(sf_dir, ["doc_id", "source"])
           .map_batches(partial, batch_format="pandas")
           .groupby("source").map_groups(pick, batch_format="pandas")
           .to_pandas())
    return (out.sort_values(["source", "doc_id"])
            .reset_index(drop=True))


def source_jaccard_matrix(sf_dir: str) -> pd.DataFrame:
    """EXACT vocabulary Jaccard between every source pair — the
    corpus-mixing redundancy map (two sources sharing most of their
    vocabulary are near-duplicates at the distribution level; the
    embedding twin is source_centroid_distances). Per batch, documents
    reduce to DISTINCT (word, source) pairs (the combiner move — a word
    repeated a million times in one source costs one row); the dedup
    combine tree then holds one row per (word, source), and the final
    task folds words into per-word source BITMASKS, so the pairwise
    intersection/union counts come from one histogram pass over masks —
    no per-pair joins. Jaccard quantizes with pure integer arithmetic
    (2e6*inter + uni) // (2*uni). Scale bound: the deduped pair table is
    vocab x n_sources on one task — fine while sources stay a dimension
    (tens); a web-scale vocab flips the dedup to mode="bucket" with the
    same mask fold per shard."""
    import numpy as np

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        pairs = {(w, s) for s, txt in
                 zip(batch["source"], batch["text"])
                 for w in txt.split()}
        if not pairs:
            return pd.DataFrame({"word": pd.array([], dtype="object"),
                                 "source": pd.array([], dtype="object"),
                                 "n": pd.array([], dtype="int64")})
        g = pd.DataFrame(sorted(pairs), columns=["word", "source"])
        g["n"] = pd.array([1] * len(g), dtype="int64")
        return g

    from ..stages.agg import combine_partials

    dedup = combine_partials(
        _docs(sf_dir, ["text", "source"])
        .map_batches(partial, batch_format="pandas"),
        ["word", "source"], {"n": "max"}).to_pandas()

    srcs = sorted(dedup["source"].unique())
    idx = {s: i for i, s in enumerate(srcs)}
    bits = dedup["source"].map(idx).to_numpy(np.int64)
    masks = (pd.DataFrame({"word": dedup["word"],
                           "bit": np.int64(1) << bits})
             .groupby("word")["bit"].sum().to_numpy(np.int64))
    sizes = [int(((masks >> i) & 1).sum()) for i in range(len(srcs))]
    rows = []
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            inter = int((((masks >> i) & (masks >> j)) & 1).sum())
            uni = sizes[i] + sizes[j] - inter
            rows.append({
                "source_a": srcs[i], "source_b": srcs[j],
                "inter": inter, "uni": uni,
                "jaccard_q": (2_000_000 * inter + uni) // (2 * uni)
                if uni else 0})
    out = pd.DataFrame(rows)
    for c in ("inter", "uni", "jaccard_q"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


_MOJIBAKE = ("Ã", "Â", "â€")
_CTL_RE = None


def encoding_quality(sf_dir: str) -> rd.Dataset:
    """Per-doc encoding-damage counters — the ingest screen for the
    three classic failure signatures: U+FFFD replacement chars (a
    decoder already gave up), C0 control chars other than tab/newline/
    CR (binary bleed-through), and UTF-8-as-Latin-1 double-decode
    markers ('Ã', 'Â', 'â€' — the ftfy mojibake tells). Pure counters,
    one streaming map_batches, no shuffle; the oracle replays them with
    replace()-length diffs and a regexp_replace, proven char-exact both
    engines."""
    import re

    global _CTL_RE
    if _CTL_RE is None:
        _CTL_RE = re.compile("[\x00-\x08\x0B\x0C\x0E-\x1F]")
    ctl = _CTL_RE

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        texts = batch["text"]
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_fffd": np.asarray(
                [t.count("�") for t in texts], dtype="int64"),
            "n_control": np.asarray(
                [len(ctl.findall(t)) for t in texts], dtype="int64"),
            "n_mojibake": np.asarray(
                [sum(t.count(m) for m in _MOJIBAKE) for t in texts],
                dtype="int64"),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pandas")


def length_ks_by_source(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift monitor: per source, the exact
    Kolmogorov–Smirnov distance between its doc-length distribution and
    the corpus-wide one — the screen that catches a source whose
    scraping/truncation behavior silently changed. EXACT integers: with
    cs/cg the cumulative counts at a support point and ns/ng the totals,
    D = max |cs/ns − cg/ng| = max |cs·ng − cg·ns| / (ns·ng); the output
    carries the numerator ks_num plus ns and ng, so no division exists
    on either side of the oracle.

    Scale: per-batch (source, len, n) histogram partials ride the
    combiner tree; the driver scans the merged histogram (distinct
    lengths × sources — statistics-sized, not corpus-sized)."""
    import numpy as np

    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"source": batch["source"].values,
                           "len": batch["text"].str.len()
                           .astype("int64").values})
             .groupby(["source", "len"], sort=False)
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype("int64")
        return g

    hist = combine_partials(
        _docs(sf_dir, ["source", "text"])
        .map_batches(partial, batch_format="pandas"),
        ["source", "len"], {"n": "sum"}).to_pandas()
    support = np.sort(hist["len"].unique())
    glob = (hist.groupby("len")["n"].sum()
            .reindex(support, fill_value=0).cumsum().to_numpy())
    ng = int(glob[-1])
    rows = []
    for src, g in hist.groupby("source"):
        cs = (g.set_index("len")["n"].reindex(support, fill_value=0)
              .cumsum().to_numpy())
        ns = int(cs[-1])
        ks_num = int(np.max(np.abs(cs.astype(object) * ng
                                   - glob.astype(object) * ns)))
        rows.append({"source": src, "ns": ns, "ng": ng,
                     "ks_num": ks_num})
    out = pd.DataFrame(rows).sort_values("source").reset_index(drop=True)
    for c in ("ns", "ng", "ks_num"):
        out[c] = out[c].astype("int64")
    return out
