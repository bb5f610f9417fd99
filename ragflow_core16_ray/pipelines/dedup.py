"""Deduplication operators over the `documents` table.

Five dedup families, each the distributed-idiomatic shape:

- exact: per-batch partial (text → min doc_id, count) combiner, then a
  groupby over the partials — the shuffle moves one row per distinct text
  per batch, not the corpus.
- exact n-gram Jaccard pairs: shingle-explode → groupby(shingle) pair
  emission → groupby(pair) intersection counts → Jaccard vs broadcast
  doc-size map. Exact (SQL-oracle-able), the verification stage for LSH.
- MinHash + LSH: per-doc 64 minhashes (fixed universal-hash family),
  banded into 16×4; band-explode → groupby(band) → candidate pairs with
  minhash-estimated Jaccard (the sub-quadratic scale path).
- SimHash: 64-bit simhash per doc; hamming ≤ ``max_hamming`` near-dups
  found via the pigeonhole band trick (split into max_hamming+1 pieces;
  any near-pair must collide on ≥1 piece) → groupby(piece) → verify.
- embedding cosine near-dup: groupby(label) co-locates each label's
  vectors, one numpy self-matmul per group (nothing driver-side).

The reference has no near-dedup (SURVEY.md §2.7); these are the
training-data-scale additions the north rule calls for.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.hashing import hash64

_MERSENNE = (1 << 61) - 1


def _np(col) -> np.ndarray:
    """Numeric column of an Arrow batch → numpy array (zero-copy when the
    chunk layout allows). The Arrow-native replacement for the per-batch
    pandas Series materialization the full-corpus streaming passes used
    to pay (r4 verdict: remaining-pandas-partials cost)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _docs(sf_dir: str, columns):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def _shingles(text: str, k: int = 3) -> set[str]:
    """k-word shingles over the whitespace token stream (lowercased).
    Whitespace-split (not \\w+) so the DuckDB oracle can reproduce it
    exactly with string_split_regex."""
    words = text.lower().split()
    if not words:
        return set()
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


# ---------------------------------------------------------------- exact ---

def exact_dedup(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """One row per distinct text: keep_id = min doc_id, n_dups = count.

    Shuffle plan: per-batch partial (text → min doc_id, count) first, so
    the shuffle moves one row per distinct-text-per-batch; the groupby KEY
    is a bounded BUCKET of a 128-bit content hash (md5 hex), so block
    assignment and sorting touch an int32, never the multi-KB text (the
    text rides once as payload — the output must contain each kept text
    anyway, so that traffic is the output, not overhead). Inside a bucket
    one vectorized pandas groupby over the hash merges the partials;
    same-hash rows have identical text, so 'first' is an exact
    representative pick. ``n_buckets`` bounds per-task width — size it to
    a few × cluster cores (the corpus/n_buckets distinct-text payload per
    bucket is the per-task memory bound)."""
    from ..functions.hashing import md5_hex

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        dids = _np(batch["doc_id"])
        slot: dict[str, int] = {}
        uniq: list[str] = []
        mins: list[int] = []
        cnts: list[int] = []
        for t, d in zip(texts, dids.tolist()):
            i = slot.get(t)
            if i is None:
                slot[t] = len(uniq)
                uniq.append(t)
                mins.append(d)
                cnts.append(1)
            else:
                cnts[i] += 1
                if d < mins[i]:
                    mins[i] = d
        h = [md5_hex(t) for t in uniq]
        bucket = np.fromiter((int(x[:8], 16) % n_buckets for x in h),
                             dtype=np.int32, count=len(h))
        return pa.table({
            "bucket": pa.array(bucket),
            "h": pa.array(h, type=pa.string()),
            "text": pa.array(uniq, type=pa.string()),
            "keep_id": pa.array(np.asarray(mins, dtype=np.int64)),
            "n_dups": pa.array(np.asarray(cnts, dtype=np.int64))})

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("h", sort=False)
                .agg(text=("text", "first"), keep_id=("keep_id", "min"),
                     n_dups=("n_dups", "sum"))
                .reset_index(drop=True))

    return (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_merge, batch_format="pandas"))


# ------------------------------------------------- exact jaccard pairs ---

def _char_grams(text: str, n: int = 4) -> set[str]:
    """Character n-grams over the raw lowercased text (no whitespace
    normalization, so the DuckDB oracle reproduces it with substr over
    generate_series). Shorter-than-n text is its own single gram."""
    t = text.lower()
    if not t:
        return set()
    if len(t) <= n:
        return {t}
    return {t[i:i + n] for i in range(len(t) - n + 1)}


def jaccard_dup_pairs(sf_dir: str, k: int = 3, threshold: float = 0.5,
                      n_buckets: int = 64, wanted_ref=None,
                      grams: str = "word",
                      max_doc_freq: int | None = None,
                      return_jaccard: bool = False) -> pd.DataFrame:
    """All doc pairs with exact k-shingle Jaccard ≥ threshold.
    ``grams``: "word" = k-word shingles (the dedup default), "char" =
    character k-grams (classic n-gram Jaccard — robust to tokenization,
    the right measure for CJK or whitespace-poor text).

    ``wanted_ref`` (optional): ray.put() ObjectRef of a frozenset of doc
    ids — restricts the computation to those docs (the distributed
    LSH-verify path: the id set is broadcast once; the docs themselves
    never leave the workers).

    Shuffle plan: explode (shingle-bucket, doc_id) rows (bucket = stable
    hash of the shingle, so each shingle lives in exactly ONE bucket) →
    groupby(bucket) — a bounded-width shuffle of n_buckets groups, not one
    pandas call per distinct shingle — → vectorized self-merge per bucket
    emits complete per-bucket pair-intersection counts → combiner tree sums
    them → Jaccard against per-doc shingle sizes. Sizes arrive candidate-
    bounded in the standalone full-corpus path: the summed pair table
    (output-sized — this function returns it to the driver anyway) gives
    the distinct candidate id set, which is broadcast back to stream-
    filter the distributed size table; an O(n_docs) {doc_id: size}
    broadcast would not survive 100 TB, but an O(candidate-pairs) one is
    the same footprint as the return value itself. The LSH-verify path
    (``wanted_ref``) keeps the full-map broadcast since there explode
    already candidate-filters the corpus. Skew note: a pathological hot
    shingle (present in
    g docs) costs g² merge rows inside one bucket; ``max_doc_freq`` is the
    production mitigation — shingles seen in more than that many docs are
    dropped BEFORE the self-merge (exact per shingle: a shingle lives in
    exactly one bucket, so its document frequency is bucket-local). This is
    the standard stop-shingle approximation: intersections under-count on
    dropped shingles while sizes stay full, so it only ever LOSES pairs,
    never invents them. Default None keeps the exact measure (the oracle
    contract)."""
    from ..stages.agg import combine_partials

    shingle_fn = _shingles if grams == "word" else _char_grams

    def explode(batch: pa.Table) -> pa.Table:
        dids = _np(batch["doc_id"]).tolist()
        texts = batch["text"].to_pylist()
        if wanted_ref is not None:
            w = ray.get(wanted_ref)
            kept = [(d, t) for d, t in zip(dids, texts) if d in w]
            dids = [d for d, _ in kept]
            texts = [t for _, t in kept]
        rows_doc, rows_sh = [], []
        for did, text in zip(dids, texts):
            for sh in shingle_fn(text, k):
                rows_doc.append(did)
                rows_sh.append(sh)
        rows_b = np.fromiter(
            (zlib.crc32(s.encode()) % n_buckets for s in rows_sh),
            dtype=np.int32, count=len(rows_sh))
        return pa.table({
            "bucket": pa.array(rows_b),
            "shingle": pa.array(rows_sh, type=pa.string()),
            "doc_id": pa.array(rows_doc, type=pa.int64())})

    # materialize: BOTH the size pass and the pair pass consume the
    # shingle table — without this the lazy explode runs twice. The
    # shingle blocks live in the (spillable) object store, never on the
    # driver; at extreme scale trade this for a recompute by dropping it.
    sh = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow").materialize()

    # per-doc shingle counts (one int per doc) — one C-level value_counts
    def size_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(batch["doc_id"])
        return pa.table({"doc_id": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    sizes_ds = combine_partials(
        sh.map_batches(size_partial, batch_format="pyarrow"),
        ["doc_id"], {"n": "sum"})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized: self-merge on shingle → co-occurring (a<b) doc pairs,
        # counted in C. Complete per bucket since a shingle is bucket-local.
        df = g[["shingle", "doc_id"]]
        if max_doc_freq is not None:
            # exact per-shingle document frequency (bucket-local): drop
            # stop-shingles before the quadratic self-merge
            df = df[df.groupby("shingle")["doc_id"]
                    .transform("size") <= max_doc_freq]
        m = df.merge(df, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if m.empty:
            return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                                 "id_b": pd.array([], dtype="int64"),
                                 "inter": pd.array([], dtype="int64")})
        cnt = m.groupby(["doc_id_x", "doc_id_y"], sort=False).size()
        out = cnt.rename("inter").reset_index()
        return out.rename(columns={"doc_id_x": "id_a", "doc_id_y": "id_b"})

    # partitions ≤ bucket count so every sort partition holds ≥1 group
    # (a group-less partition yields no batches → Ray emits a schemaless
    # empty block and warns); same bytes shuffle as the sort itself
    inter_partials = sh.repartition(min(16, n_buckets)).groupby(
        "bucket").map_groups(bucket_pairs, batch_format="pandas")
    inter = combine_partials(inter_partials, ["id_a", "id_b"],
                             {"inter": "sum"})

    if wanted_ref is not None:
        # LSH-verify path: the size map is candidate-filtered by
        # construction (explode drops non-wanted docs), so a single
        # ray.put broadcast is bounded by the candidate set — fine.
        sizes_df = sizes_ds.to_pandas()
        sizes_ref = ray.put(dict(zip(sizes_df["doc_id"], sizes_df["n"])))

        def jacc(batch: pd.DataFrame) -> pd.DataFrame:
            sz = ray.get(sizes_ref)
            a = batch["id_a"].map(sz).values
            b = batch["id_b"].map(sz).values
            inter_v = batch["inter"].values
            j = inter_v / (a + b - inter_v)
            keep = j >= threshold
            out = batch.loc[keep, ["id_a", "id_b"]]
            out["jaccard"] = j[keep]
            return out.reset_index(drop=True)

        out = inter.map_batches(jacc, batch_format="pandas").to_pandas()
    else:
        # standalone full-corpus path: a full {doc_id: size} broadcast
        # would be an O(n_docs) object-store blob — a scale-killer at
        # 100 TB. But this function's own contract already returns the
        # candidate-pair list to the driver, so any artifact bounded by
        # that list is free: pull the summed intersections (output-
        # sized), broadcast the DISTINCT CANDIDATE ID SET back, stream-
        # filter the distributed size table down to those ids (one
        # narrow map over doc-count rows, nothing corpus-sized moves),
        # and finish the Jaccard in one vectorized driver pass.
        ipd = inter.to_pandas()
        if not ipd.empty:
            cand = np.unique(np.concatenate(
                [ipd["id_a"].to_numpy(np.int64),
                 ipd["id_b"].to_numpy(np.int64)]))
            cand_ref = ray.put(frozenset(cand.tolist()))

            def keep_cand(b: pa.Table) -> pa.Table:
                w = ray.get(cand_ref)
                mask = pa.array([d in w for d in b["doc_id"].to_pylist()],
                                type=pa.bool_())  # 0-row batch safe
                return b.filter(mask)

            szd = sizes_ds.map_batches(
                keep_cand, batch_format="pyarrow").to_pandas()
            sz = pd.Series(szd["n"].values, index=szd["doc_id"].values)
            a = sz.reindex(ipd["id_a"]).to_numpy(np.int64)
            b = sz.reindex(ipd["id_b"]).to_numpy(np.int64)
            inter_v = ipd["inter"].to_numpy(np.int64)
            j = inter_v / (a + b - inter_v)
            keep = j >= threshold
            out = ipd.loc[keep, ["id_a", "id_b"]]
            out["jaccard"] = j[keep]
            out = out.reset_index(drop=True)
        else:
            out = ipd
    cols = (["id_a", "id_b", "jaccard"] if return_jaccard
            else ["id_a", "id_b"])
    if out.empty:
        # an all-empty result can come back schema-less from Ray; keep the
        # typed contract (a df-capped run may legitimately drop every pair)
        empty = {"id_a": pd.array([], dtype="int64"),
                 "id_b": pd.array([], dtype="int64"),
                 "jaccard": pd.array([], dtype="float64")}
        return pd.DataFrame({c: empty[c] for c in cols})
    return (out[cols].sort_values(["id_a", "id_b"])
            .reset_index(drop=True))


# ---------------------------------------------------------- winnowing ---

def winnow_fps(text: str, k: int = 16, w: int = 8,
               _cache: dict | None = None) -> np.ndarray:
    """Distinct winnowed fingerprints of a document (Schleimer/Wilkerson/
    Aiken 2003 "Winnowing: Local Algorithms for Document Fingerprinting" —
    the MOSS scheme, public knowledge): hash every character k-gram, then
    in each window of w consecutive hashes select the minimum, rightmost
    on ties. Guarantees every shared substring of length ≥ k + w - 1
    yields at least one shared fingerprint.

    The gram hash is DuckDB's ``md5_number_lower``, so the driver oracle
    recomputes identical selections in pure SQL (list window argmin).
    Docs shorter than k + w - 1 chars have no full window and emit
    nothing (documented; the oracle mirrors). ``_cache`` lets a batch
    reuse gram hashes across documents."""
    from numpy.lib.stride_tricks import sliding_window_view

    from ..functions.hashing import md5_hash64

    m = len(text) - k + 1
    if m < w:
        return np.empty(0, dtype=np.uint64)
    cache = _cache if _cache is not None else {}

    def gh(g: str) -> int:
        v = cache.get(g)
        if v is None:
            v = cache[g] = md5_hash64(g)
        return v

    h = np.fromiter((gh(text[i:i + k]) for i in range(m)),
                    dtype=np.uint64, count=m)
    wins = sliding_window_view(h, w)
    # rightmost min: argmin of the reversed window finds the LAST minimum
    j = (w - 1) - np.argmin(wins[:, ::-1], axis=1)
    return np.unique(h[np.arange(len(wins)) + j])


def winnow_matches(sf_dir: str, k: int = 16, w: int = 8,
                   min_shared: int = 5, n_buckets: int = 64,
                   max_doc_freq: int | None = None) -> pd.DataFrame:
    """MOSS-style containment detection: doc pairs sharing ≥ min_shared
    winnowed fingerprints — catches copied PASSAGES (quotes, boilerplate,
    partial plagiarism) that whole-document Jaccard dilutes away, because
    winnowing guarantees a fingerprint for every shared run of
    k + w - 1 = 23 chars.

    Shuffle plan (the `jaccard_dup_pairs` shape): explode
    (fp-bucket, fp, doc_id) rows — bucket = fp % n_buckets, so each
    fingerprint lives in exactly ONE bucket and per-bucket pair counts
    are complete — → bounded groupby(bucket) → vectorized self-merge →
    combiner-tree sum → threshold. Nothing driver-side until the final
    ≥-threshold pair list (proportional to matches found, not corpus
    size). ``max_doc_freq`` is the hot-fingerprint mitigation: a
    boilerplate fingerprint present in g docs costs g² merge rows; at
    production scale drop fingerprints with bucket-local df above the
    cap (loses only pairs whose evidence is pure boilerplate)."""
    from ..stages.agg import combine_partials

    def explode(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        ids, fps = [], []
        for did, text in zip(_np(batch["doc_id"]).tolist(),
                             batch["text"].to_pylist()):
            f = winnow_fps(text, k, w, cache)
            ids.append(np.full(len(f), did, dtype=np.int64))
            fps.append(f)
        fp = (np.concatenate(fps) if fps
              else np.empty(0, dtype=np.uint64))
        return pa.table({
            "bucket": pa.array((fp % np.uint64(n_buckets))
                               .astype(np.int32)),
            # reinterpret to signed: the group key stays 64-bit stable
            "fp": pa.array(fp.astype(np.int64)),
            "doc_id": pa.array(np.concatenate(ids) if ids
                               else np.empty(0, dtype=np.int64))})

    rows = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g[["fp", "doc_id"]]
        if max_doc_freq is not None:
            df = df[df.groupby("fp")["doc_id"]
                    .transform("size") <= max_doc_freq]
        m = df.merge(df, on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        if m.empty:
            return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                                 "id_b": pd.array([], dtype="int64"),
                                 "n_shared": pd.array([], dtype="int64")})
        cnt = m.groupby(["doc_id_x", "doc_id_y"], sort=False).size()
        out = cnt.rename("n_shared").reset_index()
        return out.rename(columns={"doc_id_x": "id_a", "doc_id_y": "id_b"})

    partials = rows.repartition(min(16, n_buckets)).groupby(
        "bucket").map_groups(bucket_pairs, batch_format="pandas")
    shared = combine_partials(partials, ["id_a", "id_b"],
                              {"n_shared": "sum"})
    out = shared.map_batches(
        lambda b: b[b["n_shared"] >= min_shared],
        batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64"),
                             "n_shared": pd.array([], dtype="int64")})
    out["n_shared"] = out["n_shared"].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------------------------------- minhash ---

N_HASHES = 64
N_BANDS = 16  # × 4 rows/band
_P31 = (1 << 31) - 1  # Mersenne prime; 31-bit hashes keep a*x in uint64

_rng = np.random.RandomState(0xC0FFEE)
_A = _rng.randint(1, _P31, size=N_HASHES).astype(np.uint64)
_B = _rng.randint(0, _P31, size=N_HASHES).astype(np.uint64)


def minhash_signature(shingle_hashes: np.ndarray) -> np.ndarray:
    """64 min-wise universal hashes ((a*x+b) mod 2^31-1), fully vectorized
    in uint64 (a,x < 2^31 so a*x+b never overflows)."""
    if len(shingle_hashes) == 0:
        return np.zeros(N_HASHES, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)[:, None]
    vals = (x * _A[None, :] + _B[None, :]) % np.uint64(_P31)
    return vals.min(axis=0)


def _shingle_hashes31(text: str, k: int) -> np.ndarray:
    """31-bit stable shingle hashes via crc32 (C-speed)."""
    return np.fromiter(
        (zlib.crc32(s.encode()) & 0x7FFFFFFF for s in _shingles(text, k)),
        dtype=np.uint64)


def minhash_lsh_pairs(sf_dir: str, k: int = 3, est_threshold: float = 0.5,
                      n_buckets: int = 256, n_bands: int = N_BANDS
                      ) -> pd.DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH, with the
    minhash-estimated Jaccard; exact verification is `jaccard_dup_pairs`
    (or a filtered re-read at scale). Band keys are grouped through a
    bounded bucket column (groupby over n_buckets groups, duplicate band
    keys found vectorized inside each bucket). ``n_bands`` must divide
    N_HASHES; narrower bands (more of them) raise candidate recall at the
    cost of more false candidates."""
    if n_bands <= 0 or N_HASHES % n_bands:
        raise ValueError(
            f"n_bands must divide N_HASHES={N_HASHES}; got {n_bands} "
            "(a non-divisor silently drops hashes; >64 would make every "
            "band piece empty and collide all docs)")
    rows_per_band = N_HASHES // n_bands

    def sig_batch(batch: pa.Table) -> pa.Table:
        dids, keys, sigs = [], [], []
        for did, text in zip(_np(batch["doc_id"]).tolist(),
                             batch["text"].to_pylist()):
            sig = minhash_signature(_shingle_hashes31(text, k))
            sb = sig.tobytes()
            for band in range(n_bands):
                piece = sig[band * rows_per_band:
                            (band + 1) * rows_per_band].tobytes()
                dids.append(did)
                keys.append(hash64(f"{band}:") ^ hash64(piece.hex()))
                sigs.append(sb)
        # NB: both moduli must be np.uint64 scalars — a bare Python int
        # promotes uint64 % int to float64 and corrupts the key
        kk = np.asarray(keys, dtype=np.uint64)
        return pa.table({
            "bucket": pa.array((kk % np.uint64(n_buckets))
                               .astype(np.int32)),
            "band_key": pa.array((kk % np.uint64(1 << 62))
                                 .astype(np.int64)),
            "doc_id": pa.array(dids, type=pa.int64()),
            "sig": pa.array(sigs, type=pa.binary())})

    bands = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sig_batch, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated("band_key", keep=False)]
        out = []
        for _, grp in g.groupby("band_key", sort=False):
            grp = grp.sort_values("doc_id").drop_duplicates("doc_id")
            ids = grp["doc_id"].tolist()
            sigs = [np.frombuffer(s, dtype=np.uint64) for s in grp["sig"]]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    est = float((sigs[i] == sigs[j]).mean())
                    if est >= est_threshold:
                        out.append({"id_a": ids[i], "id_b": ids[j],
                                    "est_jaccard": est})
        return pd.DataFrame(
            {"id_a": pd.array([r["id_a"] for r in out], dtype="int64"),
             "id_b": pd.array([r["id_b"] for r in out], dtype="int64"),
             "est_jaccard": pd.array([r["est_jaccard"] for r in out],
                                     dtype="float64")})

    cand = bands.repartition(min(16, n_buckets)).groupby(
        "bucket").map_groups(bucket_pairs, batch_format="pandas")
    df = cand.to_pandas()
    if df.empty:
        return df
    return (df.drop_duplicates(["id_a", "id_b"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


# ------------------------------------------------------------- simhash ---

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (public Charikar scheme).
    The word hash is DuckDB-reproducible (``md5_number_lower``), so the
    driver oracle recomputes identical signatures in pure SQL — and since
    the pigeonhole piece-collision search is EXACT for hamming ≤
    max_hamming, the whole pipeline is hash-checkable, not approximate."""
    from ..functions.hashing import md5_hash64

    words = text.lower().split()
    if not words:
        return 0
    v = np.zeros(64, dtype=np.int64)
    idx = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for w in words:
        bits = (np.uint64(md5_hash64(w)) >> idx) & one
        v += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out


def simhash_pairs(sf_dir: str, max_hamming: int = 3,
                  n_buckets: int = 256) -> pd.DataFrame:
    """Near-dup pairs with simhash hamming distance ≤ max_hamming, found by
    the pigeonhole band trick (max_hamming+1 pieces; a qualifying pair must
    agree on at least one piece). Piece keys are grouped through a bounded
    bucket column, duplicates verified vectorized per bucket."""
    n_pieces = max_hamming + 1
    piece_bits = 64 // n_pieces

    def _batch_simhashes(texts) -> list[int]:
        """Vectorized batch simhash: each distinct word is md5-hashed ONCE
        per batch (vocabulary is Zipfian, so this collapses most of the
        hashing), its ±1 bit row built once, then each doc is one
        counts-by-word × bitrow matmul."""
        from ..functions.hashing import md5_hash64

        docs_words = [t.lower().split() for t in texts]
        vocab: dict[str, int] = {}
        for ws in docs_words:
            for w in ws:
                if w not in vocab:
                    vocab[w] = len(vocab)
        if not vocab:
            return [0] * len(texts)
        hs = np.fromiter((md5_hash64(w) for w in vocab), dtype=np.uint64,
                         count=len(vocab))
        idx = np.arange(64, dtype=np.uint64)
        bitrows = np.where((hs[:, None] >> idx) & np.uint64(1) == 1,
                           np.int64(1), np.int64(-1))  # (U, 64)
        out = []
        weights = np.arange(64, dtype=np.uint64)
        for ws in docs_words:
            if not ws:
                out.append(0)
                continue
            ids = np.fromiter((vocab[w] for w in ws), dtype=np.int64,
                              count=len(ws))
            uniq, cnt = np.unique(ids, return_counts=True)
            v = cnt @ bitrows[uniq]
            bits = (v > 0).astype(np.uint64)
            out.append(int((bits << weights).sum()))
        return out

    def sig_batch(batch: pa.Table) -> pa.Table:
        dids, keys, sims = [], [], []
        hashes = _batch_simhashes(batch["text"].to_pylist())
        for did, h in zip(_np(batch["doc_id"]).tolist(), hashes):
            for p in range(n_pieces):
                piece = (h >> (p * piece_bits)) & ((1 << piece_bits) - 1)
                dids.append(did)
                keys.append((p << piece_bits) | piece)
                sims.append(h)
        kk = np.asarray(keys, dtype=np.int64)
        return pa.table({
            "bucket": pa.array((kk % n_buckets).astype(np.int32)),
            "piece_key": pa.array(kk),
            "doc_id": pa.array(dids, type=pa.int64()),
            "sim": pa.array(sims, type=pa.uint64())})

    bands = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        sig_batch, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated("piece_key", keep=False)]
        out = []
        for _, grp in g.groupby("piece_key", sort=False):
            grp = grp.sort_values("doc_id").drop_duplicates("doc_id")
            ids = grp["doc_id"].tolist()
            sims = grp["sim"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = bin(int(sims[i]) ^ int(sims[j])).count("1")
                    if d <= max_hamming:
                        out.append({"id_a": ids[i], "id_b": ids[j],
                                    "hamming": d})
        return pd.DataFrame(
            {"id_a": pd.array([r["id_a"] for r in out], dtype="int64"),
             "id_b": pd.array([r["id_b"] for r in out], dtype="int64"),
             "hamming": pd.array([r["hamming"] for r in out],
                                 dtype="int64")})

    df = bands.repartition(min(16, n_buckets)).groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas").to_pandas()
    if df.empty:
        return df
    return (df.drop_duplicates(["id_a", "id_b"])
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


# ------------------------------------------------- embedding near-dup ---

def embedding_near_dup(sf_dir: str, threshold: float = 0.4) -> pd.DataFrame:
    """Within-label cosine-similarity near-dup pairs.

    Shuffle plan: ONE groupby(label) shuffle co-locates each label's
    vectors; each group then does a single numpy self-matmul and reads the
    upper triangle — nothing is ever materialized on the driver, so memory
    per worker is bounded by the largest label, not the dataset. When no
    natural partition exists, an IVF/LSH bucket id plays the role of
    'label' (see similarity.lsh_topk); a pathologically hot label would be
    sub-bucketed the same way."""
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "label", "embedding"])

    _EMPTY = pd.DataFrame({"vec_id_a": pd.array([], dtype="int64"),
                           "vec_id_b": pd.array([], dtype="int64")})

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _EMPTY
        g = g.sort_values("vec_id")
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = sims[ia, ib] >= threshold
        ids = g["vec_id"].to_numpy()
        return pd.DataFrame({
            "vec_id_a": ids[ia[keep]].astype("int64"),
            "vec_id_b": ids[ib[keep]].astype("int64")})

    df = (emb.groupby("label")
          .map_groups(group_pairs, batch_format="pandas").to_pandas())
    if df.empty:
        return _EMPTY
    return df.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


def jaccard_clusters(sf_dir: str, k: int = 3, threshold: float = 0.5,
                     n_buckets: int = 64) -> pd.DataFrame:
    """Near-dup clustering: connected components over the exact-Jaccard
    pair graph; each clustered doc gets cluster_id = min doc_id in its
    component (the keep-one-per-cluster dedup step).

    Scale shape: the expensive part — candidate pair generation — is the
    distributed `jaccard_dup_pairs` pipeline; the surviving pair graph is
    tiny relative to the corpus (near-dup pairs, not all pairs), so the
    union-find over it is a driver-side reduction, the standard shape for
    distributed CC over a sparse dup graph."""
    pairs = jaccard_dup_pairs(sf_dir, k, threshold, n_buckets)
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the root IS the cluster label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    rows = sorted((doc, find(doc)) for doc in parent)
    return pd.DataFrame({"doc_id": [d for d, _ in rows],
                         "cluster_id": [c for _, c in rows]})


def near_dup_removal(sf_dir: str, k: int = 3, threshold: float = 0.5,
                     n_buckets: int = 64) -> rd.Dataset:
    """The full near-dedup TRAINING-DATA step: cluster near-duplicates
    (jaccard_clusters) and emit the corpus with every non-representative
    cluster member REMOVED (representative = min doc_id in the component).

    Scale shape: the drop-set is proportional to duplicates found, not
    corpus size — it is broadcast once via ``ray.put`` and each filter
    batch reads it zero-copy from the object store; the corpus itself
    streams through a pyarrow filter, never materializing. Output:
    (doc_id,) of surviving documents."""
    import pyarrow as pa
    import ray

    clusters = jaccard_clusters(sf_dir, k, threshold, n_buckets)
    drop = frozenset(d for d, c in zip(clusters["doc_id"],
                                       clusters["cluster_id"]) if d != c)
    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        dropset = ray.get(drop_ref)
        mask = pa.array([d not in dropset
                         for d in batch["doc_id"].to_pylist()],
                        type=pa.bool_())  # 0-row batch safe
        return batch.filter(mask).select(["doc_id"])

    return _docs(sf_dir, ["doc_id"]).map_batches(keep,
                                                 batch_format="pyarrow")


def incremental_dedup(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """Incremental-ingest dedup via a DISTRIBUTED ANTI-JOIN: treat
    even-numbered sources as the PRIOR corpus snapshot and odd ones as the
    NEW batch; emit the new docs whose exact text does not already exist
    in the prior corpus — the admit-only-novel step of every rolling
    training-data ingest.

    Shape: neither side broadcasts (at 100 TB the prior fingerprint set is
    itself huge). Both sides reduce to (bucket, content-md5) rows —
    one hash per doc, never the text — co-partitioned by a coarse bucket
    of the hash; one shuffle; each bucket task builds the prior-hash set
    locally and filters its new rows. Output: (doc_id,) admitted docs."""
    from ..functions.hashing import md5_hex

    def tag(batch: pa.Table) -> pa.Table:
        is_prior = [int(s[3:]) % 2 == 0
                    for s in batch["source"].to_pylist()]
        h = [md5_hex(t) for t in batch["text"].to_pylist()]
        bucket = np.fromiter((hash64(x) & (n_buckets - 1) for x in h),
                             dtype=np.int64, count=len(h))
        return pa.table({
            "bucket": pa.array(bucket),
            "h": pa.array(h, type=pa.string()),
            "prior": pa.array(is_prior, type=pa.bool_()),
            "doc_id": batch["doc_id"]})

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        prior_set = set(g.loc[g["prior"], "h"])
        new = g[~g["prior"]]
        keep = new[~new["h"].isin(prior_set)]
        return keep[["doc_id"]].sort_values("doc_id").reset_index(drop=True)

    return (_docs(sf_dir, ["doc_id", "text", "source"])
            .map_batches(tag, batch_format="pyarrow")
            .repartition(max(1, n_buckets // 4))
            .groupby("bucket").map_groups(anti, batch_format="pandas"))


def dup_passage_stats(sf_dir: str, passage_words: int = 10,
                      n_buckets: int = 64) -> rd.Dataset:
    """Passage-level duplication profile (the sub-document granularity of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — public): split every doc into non-overlapping
    ``passage_words``-word passages (tail shorter than a full passage
    dropped) and report, per doc, how many of its passages occur MORE THAN
    ONCE corpus-wide (including within-doc repeats). Whole-doc dedup
    misses these — boilerplate paragraphs pasted into otherwise-unique
    pages are exactly what this catches.

    Shape: docs reduce to (bucket, passage-md5, doc_id) rows — one hash
    per passage, never the text; bucket = stable hash of the md5, so a
    passage's global count is bucket-local and complete. One bounded
    groupby(bucket) computes counts and per-doc partials; a combiner tree
    sums partials per doc (two ints per doc per bucket). Nothing
    driver-side, nothing broadcast — scales with corpus size, unlike a
    broadcast dup-set."""
    from ..functions.hashing import md5_hex
    from ..stages.agg import combine_partials

    P = passage_words

    def explode(batch: pa.Table) -> pa.Table:
        rows_b, rows_h, rows_d = [], [], []
        for did, text in zip(_np(batch["doc_id"]).tolist(),
                             batch["text"].to_pylist()):
            ws = text.split()
            for j in range(len(ws) // P):
                h = md5_hex(" ".join(ws[j * P:(j + 1) * P]))
                rows_b.append(hash64(h) % n_buckets)
                rows_h.append(h)
                rows_d.append(did)
        return pa.table({
            "bucket": pa.array(np.asarray(rows_b, dtype=np.int32)),
            "h": pa.array(rows_h, type=pa.string()),
            "doc_id": pa.array(rows_d, type=pa.int64())})

    def counts(g: pd.DataFrame) -> pd.DataFrame:
        dup = g.groupby("h")["doc_id"].transform("size") > 1
        agg = (g.assign(dup=dup).groupby("doc_id", sort=False)
               .agg(n_passages=("h", "size"), n_dup_passages=("dup", "sum")))
        agg = agg.reset_index()
        agg["n_passages"] = agg["n_passages"].astype("int64")
        agg["n_dup_passages"] = agg["n_dup_passages"].astype("int64")
        return agg

    partials = (_docs(sf_dir, ["doc_id", "text"])
                .map_batches(explode, batch_format="pyarrow")
                .repartition(max(1, n_buckets // 4))
                .groupby("bucket").map_groups(counts, batch_format="pandas"))
    return combine_partials(partials, ["doc_id"],
                            {"n_passages": "sum", "n_dup_passages": "sum"})


def minhash_verified_pairs(sf_dir: str, k: int = 3, threshold: float = 0.5,
                           est_threshold: float = 0.25) -> pd.DataFrame:
    """The production near-dup shape: sub-quadratic LSH candidate
    generation, then EXACT k-shingle Jaccard — computed DISTRIBUTED, only
    over candidate docs. The driver touches ids and final pairs, never
    documents or shingle sets.

    Stage 1 uses narrow bands (32 bands × 2 rows) and a permissive
    estimate filter, so a pair at the exact threshold J=0.5 is missed with
    probability ≈ (1-0.5²)³² ≈ 1e-4 — candidate recall is a non-issue for
    the exact gate rather than a banding-curve gamble. Stage 2 broadcasts
    the candidate-id frozenset (ids only) into the `jaccard_dup_pairs`
    pipeline: shingle explode → bucketed groupby → vectorized pair counts,
    restricted to candidate docs. Any exact pair among candidate docs is
    emitted, even if that specific pair never collided in a band."""
    cand = minhash_lsh_pairs(sf_dir, k, est_threshold, n_bands=32)
    if cand.empty:
        return pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                             "id_b": pd.array([], dtype="int64")})
    wanted_ref = ray.put(frozenset(cand["id_a"]) | frozenset(cand["id_b"]))
    exact = jaccard_dup_pairs(sf_dir, k, threshold, wanted_ref=wanted_ref)
    return (exact[["id_a", "id_b"]]
            .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def boilerplate_removal(sf_dir: str, max_df: int = 3,
                        min_len: int = 5) -> rd.Dataset:
    """Corpus-level repeated-LINE removal — the CCNet/RefinedWeb
    boilerplate pass: a line occurring (trimmed, length ≥ ``min_len``) in
    ``max_df``-or-more DISTINCT documents is navigation/footer chrome and
    is dropped from every document that carries it.

    Scale shape (two passes, text never shuffles):
      1. line-df: each batch emits one (line-md5, distinct-doc partial
         count) row per candidate line — lines are de-duplicated WITHIN a
         doc first, so partial counts sum to exact distinct-doc df — then
         the hash-keyed combine finishes the counts. The shuffle moves a
         32-byte key + int per line, not line text.
      2. the surviving boilerplate keys (heavy hitters — tiny relative to
         the corpus by construction) broadcast once via ``ray.put``; a
         streaming map_batches drops member lines and fingerprints the
         cleaned text.
    Output: (doc_id, n_lines, n_removed, clean_fp = md5 of the kept lines
    re-joined with newlines) — hash-strict vs the DuckDB oracle, which
    expresses the same df rule with unnest + count(DISTINCT doc_id)."""
    from ..functions.hashing import md5_hex
    from ..stages.agg import combine_partials

    _trim = " \t\r"

    def line_partials(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch["text"].to_pylist():
            seen = {ln for ln in t.split("\n")
                    if len(ln.strip(_trim)) >= min_len}
            for ln in seen:
                k = md5_hex(ln)
                counts[k] = counts.get(k, 0) + 1
        return pa.table({
            "lkey": pa.array(list(counts.keys()), type=pa.string()),
            "df": pa.array(list(counts.values()), type=pa.int64())})

    # mode="bucket": line-key cardinality is corpus-sized (does not fit
    # one combine task at 10^12 docs); the groupby moves only (key, int)
    # rows. The df >= max_df survivors are the broadcastable heavy hitters.
    dfs = combine_partials(
        _docs(sf_dir, ["text"]).map_batches(line_partials,
                                            batch_format="pyarrow"),
        ["lkey"], {"df": "sum"}, mode="bucket")
    hot = dfs.filter(expr=f"df >= {max_df}").to_pandas()
    # an empty filter result comes back schemaless from to_pandas
    hot_ref = ray.put(frozenset(hot["lkey"]) if "lkey" in hot.columns
                      else frozenset())

    def scrub(batch: pa.Table) -> pa.Table:
        hotset = ray.get(hot_ref)
        n_lines, n_removed, fps = [], [], []
        for t in batch["text"].to_pylist():
            lines = t.split("\n")
            # no hot lines → skip the per-line md5 entirely (the common
            # clean-corpus fast path)
            kept = lines if not hotset else [
                ln for ln in lines
                if len(ln.strip(_trim)) < min_len
                or md5_hex(ln) not in hotset]
            n_lines.append(len(lines))
            n_removed.append(len(lines) - len(kept))
            fps.append(md5_hex("\n".join(kept)))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_lines": pa.array(n_lines, type=pa.int64()),
            "n_removed": pa.array(n_removed, type=pa.int64()),
            "clean_fp": pa.array(fps, type=pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        scrub, batch_format="pyarrow")


def semantic_dedup(sf_dir: str, k: int = 8, iters: int = 5,
                   threshold: float = 0.4) -> pd.DataFrame:
    """SemDeDup-style semantic near-dup pairs: k-means over the embedding
    space (similarity.kmeans_clusters), then exact cosine pairs WITHIN
    each cluster — the Abbas-et-al. trade that makes embedding dedup
    sub-quadratic: candidate pairs only form inside a cluster, so the
    per-group self-matmul is bounded by the largest cluster, never n².

    The assignment pass carries the embedding column with it
    (return_embeddings=True), so no corpus-sized join is needed between
    clustering and pair generation; one groupby(cluster) shuffle
    co-locates each cluster. Output: (vec_id_a, vec_id_b) pairs with
    cosine ≥ threshold, sorted. Recall vs the brute-force all-pairs scan
    is asserted in tests (pairs split across clusters are the documented
    approximation, exactly as in SemDeDup)."""
    from .similarity import kmeans_clusters

    assigned = kmeans_clusters(sf_dir, k=k, iters=iters,
                               return_embeddings=True)

    _EMPTY = pd.DataFrame({"vec_id_a": pd.array([], dtype="int64"),
                           "vec_id_b": pd.array([], dtype="int64")})

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return _EMPTY
        g = g.sort_values("vec_id")
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = sims[ia, ib] >= threshold
        ids = g["vec_id"].to_numpy()
        return pd.DataFrame({
            "vec_id_a": ids[ia[keep]].astype("int64"),
            "vec_id_b": ids[ib[keep]].astype("int64")})

    df = (assigned.groupby("cluster")
          .map_groups(group_pairs, batch_format="pandas").to_pandas())
    if df.empty:
        return _EMPTY
    return df.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


def dedup_passages(sf_dir: str, passage_words: int = 10,
                   n_buckets: int = 64,
                   n_doc_buckets: int = 32) -> rd.Dataset:
    """Exact duplicated-PASSAGE removal — the rewrite step of Lee et al.
    2022 sub-document dedup (dup_passage_stats is the profile; this emits
    the cleaned corpus): every corpus-wide duplicate occurrence of a
    non-overlapping ``passage_words``-word passage is removed EXCEPT the
    canonical one (global minimum by (doc_id, passage index)); the
    sub-passage tail is always kept. Cleaned text = surviving words
    joined by single spaces.

    Two co-partitioned shuffles, nothing broadcast, nothing driver-side
    (the drop set at 100 TB is proportional to duplication found — can
    exceed driver memory, so unlike ``boilerplate_removal``'s bounded
    hot-line set it must NOT be a ray.put broadcast):
      1. passage occurrences reduce to (passage-md5-bucket, md5, doc_id,
         idx) rows; one bounded groupby(bucket) makes the per-passage
         keep/drop decision bucket-locally (a passage's occurrences all
         land in its one bucket).
      2. drop rows and the docs themselves co-partition by a doc_id
         bucket (union → one groupby); each group rebuilds its docs
         vectorized. Output: (doc_id, n_passages, n_removed, clean_fp).
    """
    from ..functions.hashing import md5_hex

    P = passage_words

    def explode(batch: pa.Table) -> pa.Table:
        rows_b, rows_h, rows_d, rows_j = [], [], [], []
        for did, text in zip(_np(batch["doc_id"]).tolist(),
                             batch["text"].to_pylist()):
            ws = text.split()
            for j in range(len(ws) // P):
                h = md5_hex(" ".join(ws[j * P:(j + 1) * P]))
                rows_b.append(hash64(h) % n_buckets)
                rows_h.append(h)
                rows_d.append(did)
                rows_j.append(j)
        return pa.table({
            "bucket": pa.array(np.asarray(rows_b, dtype=np.int32)),
            "h": pa.array(rows_h, type=pa.string()),
            "doc_id": pa.array(rows_d, type=pa.int64()),
            "idx": pa.array(rows_j, type=pa.int64())})

    def decide(g: pd.DataFrame) -> pa.Table:
        # Arrow out: the union partner (tag_docs) emits Arrow blocks, and
        # Ray's sort refuses mixed pandas/Arrow block streams
        g = g.sort_values(["h", "doc_id", "idx"])
        canonical = ~g.duplicated("h", keep="first")
        out = g[~canonical]
        dids = out["doc_id"].to_numpy(np.int64)
        return pa.table({
            "dbucket": pa.array((dids % n_doc_buckets).astype(np.int32)),
            "doc_id": pa.array(dids),
            "idx": pa.array(out["idx"].to_numpy(np.int64)),
            "text": pa.array([""] * len(dids), type=pa.string()),
            "is_doc": pa.array(np.zeros(len(dids), dtype=bool))})

    drops = (_docs(sf_dir, ["doc_id", "text"])
             .map_batches(explode, batch_format="pyarrow")
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(decide, batch_format="pandas"))

    def tag_docs(batch: pa.Table) -> pa.Table:
        dids = _np(batch["doc_id"]).astype(np.int64, copy=False)
        return pa.table({
            "dbucket": pa.array((dids % n_doc_buckets).astype(np.int32)),
            "doc_id": pa.array(dids),
            "idx": pa.array(np.full(len(dids), -1, dtype=np.int64)),
            "text": batch["text"],
            "is_doc": pa.array(np.ones(len(dids), dtype=bool))})

    tagged = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tag_docs, batch_format="pyarrow")

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        drop_by_doc: dict[int, set] = {}
        for did, j in zip(g.loc[~g["is_doc"], "doc_id"],
                          g.loc[~g["is_doc"], "idx"]):
            drop_by_doc.setdefault(did, set()).add(j)
        docs = g[g["is_doc"]]
        doc_ids, n_p, n_rm, fps = [], [], [], []
        for did, text in zip(docs["doc_id"], docs["text"]):
            ws = text.split()
            n = len(ws) // P
            dropped = drop_by_doc.get(did, set())
            words: list[str] = []
            for j in range(n):
                if j not in dropped:
                    words.extend(ws[j * P:(j + 1) * P])
            words.extend(ws[n * P:])
            doc_ids.append(did)
            n_p.append(n)
            n_rm.append(len(dropped))
            fps.append(md5_hex(" ".join(words)))
        return pd.DataFrame({
            "doc_id": pd.array(doc_ids, dtype="int64"),
            "n_passages": pd.array(n_p, dtype="int64"),
            "n_removed": pd.array(n_rm, dtype="int64"),
            "clean_fp": fps})

    return (tagged.union(drops)
            .repartition(max(1, n_doc_buckets // 4))
            .groupby("dbucket").map_groups(rebuild, batch_format="pandas"))


def _cc_relax_bucket(block, labels: np.ndarray):
    """One edge-bucket relax step of min-label propagation: for every
    edge (u, v) in this bucket, propose label[u] to v; return only the
    targets this bucket actually improves (compacted per-target mins via
    sorted ``np.minimum.reduceat``). Pure numpy — the O(E) work of CC,
    which is what must distribute at 10^12-doc scale."""
    bui, bvi = block
    cand = labels[bui]
    order = np.argsort(bvi, kind="stable")
    tv = bvi[order]
    cv = cand[order]
    starts = np.flatnonzero(np.r_[True, tv[1:] != tv[:-1]])
    mins = np.minimum.reduceat(cv, starts)
    tgts = tv[starts]
    keep = mins < labels[tgts]
    return tgts[keep], mins[keep]


def _cc_label_propagation(pairs: pd.DataFrame, n_buckets: int = 16,
                          max_iters: int = 64) -> pd.DataFrame:
    """DISTRIBUTED connected components by min-label propagation — the
    alternative to jaccard_clusters' driver union-find when even the
    O(E) dup-pair edge set exceeds a single worker (10^12-doc corpora).

    Shape (the Pregel/GraphX layout, see also Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): the symmetric edge
    list is densified to node indices and hash-partitioned by source
    node into object-store blocks ONCE — the static edge set never moves
    again. Each round ships only the O(V) label array to one relax task
    per bucket (`ray.put` once, zero-copy numpy reads in every task);
    tasks return compacted per-target improvements; the driver merges
    them (``np.minimum.at``) and pointer-jumps the label table
    (``label = label[label]`` to a fixpoint — path compression, turning
    O(diameter) rounds into O(log diameter)). Driver state is O(V) —
    the same footprint as the label table any CC must output; at scale
    the per-round return is only the IMPROVED labels, not all V.
    Deterministic: min over int64 node ids. Raises if not converged
    within ``max_iters`` rounds rather than returning wrong labels."""
    empty = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                          "cluster_id": pd.array([], dtype="int64")})
    if pairs.empty:
        return empty

    ua = pairs["id_a"].to_numpy(np.int64)
    vb = pairs["id_b"].to_numpy(np.int64)
    # sorted dense ids: min over dense indices == min over doc ids
    nodes = np.unique(np.concatenate([ua, vb]))
    ui = np.searchsorted(nodes, ua)
    vi = np.searchsorted(nodes, vb)
    su = np.concatenate([ui, vi])  # symmetric edge list
    sv = np.concatenate([vi, ui])

    # one-time edge partitioning by source-node bucket
    bkt = su % n_buckets
    relax = ray.remote(num_returns=1)(_cc_relax_bucket)
    blocks = [ray.put((su[m], sv[m]))
              for b in range(n_buckets)
              if (m := bkt == b).any()]

    labels = np.arange(len(nodes), dtype=np.int64)
    n_changed = -1
    for _ in range(max_iters):
        lref = ray.put(labels)
        outs = ray.get([relax.remote(blk, lref) for blk in blocks])
        new = labels.copy()
        for tgts, mins in outs:
            np.minimum.at(new, tgts, mins)
        while True:  # pointer jumping to the round's fixpoint
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        n_changed = int((new != labels).sum())
        labels = new
        if n_changed == 0:
            break
    if n_changed != 0:
        # components with many interleaved local minima need multiple
        # relax rounds; wrong labels must never be returned silently
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} rounds "
            f"({n_changed} labels still changing); raise max_iters")

    return pd.DataFrame({"doc_id": nodes,
                         "cluster_id": nodes[labels]}).astype(
        {"doc_id": "int64", "cluster_id": "int64"})


def jaccard_clusters_dist(sf_dir: str, k: int = 3, threshold: float = 0.5,
                          n_buckets: int = 64) -> pd.DataFrame:
    """jaccard_clusters with the union-find replaced by the fully
    distributed label-propagation CC (_cc_label_propagation) — identical
    output contract (doc_id, cluster_id = min doc_id in component), so it
    shares the same DuckDB oracle; equality with the union-find variant
    is additionally asserted in pytest."""
    pairs = jaccard_dup_pairs(sf_dir, k, threshold, n_buckets)
    return _cc_label_propagation(pairs)


def _bloom_positions(texts, m: int, k_hashes: int) -> np.ndarray:
    """Kirsch–Mitzenmacher double hashing: k bit positions per text from
    one md5 (pos_i = h1 + i·h2 mod m, arithmetic mod 2^64). Returns an
    (n, k) uint64 array; build and probe use this same function, which is
    all the no-false-negative guarantee needs."""
    from ..functions.hashing import md5_hex

    mask = (1 << 64) - 1
    xs = [int(md5_hex(t), 16) for t in texts]
    h1 = np.array([x & mask for x in xs], dtype=np.uint64)
    h2 = np.array([((x >> 64) | 1) & mask for x in xs], dtype=np.uint64)
    i = np.arange(k_hashes, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)


def incremental_dedup_bloom(sf_dir: str, n_buckets: int = 64,
                            bits_per_key: int = 16,
                            k_hashes: int = 8) -> rd.Dataset:
    """incremental_dedup's SCALE PATH: a Bloom filter over the prior
    snapshot's content hashes is broadcast once (``ray.put``), and the
    new batch streams against it — a doc missing any of its k bits is
    PROVABLY novel and is admitted with ZERO shuffle. Only the
    Bloom-positive sliver (true dups + ~0.01% false positives at 16
    bits/key) enters the exact co-partitioned anti-join, with the prior
    side pruned to the buckets that actually contain a positive. Bloom
    filters have no false negatives and every positive is exactly
    verified, so the output is IDENTICAL to incremental_dedup — it shares
    that oracle; equality is additionally asserted in pytest, including
    under a deliberately undersized filter that forces false positives.

    Scale notes: in production the prior-side filter is a persisted index
    built once per snapshot and OR-merged per partition (partials here
    are OR-reduced on the driver — m/8 bytes per input block, bounded);
    at 100 TB the filter shards by the same hash bucket so each task
    reads only its slice. The prior side is scanned once to build and
    once (bucket-pruned) to verify — the amortized-index trade."""
    def _is_prior(sources) -> list[bool]:
        return [int(s[3:]) % 2 == 0 for s in sources]

    docs = _docs(sf_dir, ["doc_id", "text", "source"])
    n_total = docs.count()  # parquet metadata, no scan
    m = 1 << max(10, int(np.ceil(np.log2(max(bits_per_key * n_total, 2)))))

    def partial_bloom(batch: pa.Table) -> pa.Table:
        bm = np.zeros(m >> 3, dtype=np.uint8)
        prior = _is_prior(batch["source"].to_pylist())
        texts = [t for t, p in zip(batch["text"].to_pylist(), prior) if p]
        if texts:
            pos = _bloom_positions(texts, m, k_hashes).ravel()
            np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (pos & np.uint64(7))
                              .astype(np.uint8)))
        return pa.table({"bloom": pa.array([bm.tobytes()],
                                           type=pa.binary())})

    parts = docs.map_batches(partial_bloom, batch_format="pyarrow",
                             batch_size=1024).to_pandas()
    bloom = np.zeros(m >> 3, dtype=np.uint8)
    for b in parts["bloom"]:
        np.bitwise_or(bloom, np.frombuffer(b, dtype=np.uint8), out=bloom)
    bloom_ref = ray.put(bloom)

    from ..functions.hashing import md5_hex

    def probe(batch: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)  # zero-copy from the object store
        new_mask = ~np.asarray(_is_prior(batch["source"].to_pylist()),
                               dtype=bool)
        texts = [t for t, nm in zip(batch["text"].to_pylist(), new_mask)
                 if nm]
        if not texts:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "h": pa.array([], type=pa.string()),
                             "positive": pa.array([], type=pa.bool_())})
        pos = _bloom_positions(texts, m, k_hashes)
        bits = (bm[(pos >> np.uint64(3)).astype(np.int64)]
                >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return pa.table({
            "doc_id": pa.array(_np(batch["doc_id"])[new_mask]),
            "h": pa.array([md5_hex(t) for t in texts], type=pa.string()),
            "positive": pa.array(bits.all(axis=1))})

    probed = docs.map_batches(probe, batch_format="pyarrow").materialize()
    admitted_fast = probed.filter(
        expr="positive == False").select_columns(["doc_id"])

    # the positive sliver: exact anti-join, prior side bucket-pruned
    positives = probed.filter(expr="positive == True").to_pandas()
    if positives.empty:
        return admitted_fast
    positives["bucket"] = pd.array(
        [hash64(x) & (n_buckets - 1) for x in positives["h"]], dtype="int64")
    hot_buckets = frozenset(positives["bucket"])

    def tag_prior(batch: pa.Table) -> pa.Table:
        pm = np.asarray(_is_prior(batch["source"].to_pylist()),
                        dtype=bool)
        texts = [t for t, p in zip(batch["text"].to_pylist(), pm) if p]
        h = [md5_hex(t) for t in texts]
        bucket = np.fromiter((hash64(x) & (n_buckets - 1) for x in h),
                             dtype=np.int64, count=len(h))
        hot = np.asarray([b in hot_buckets for b in bucket.tolist()],
                         dtype=bool)
        return pa.table({
            "bucket": pa.array(bucket[hot]),
            "h": pa.array([x for x, k in zip(h, hot) if k],
                          type=pa.string()),
            "prior": pa.array(np.ones(int(hot.sum()), dtype=bool)),
            "doc_id": pa.array(_np(batch["doc_id"])[pm][hot])})

    # Arrow block to match tag_prior's (Ray's sort refuses mixed types)
    pos_ds = rd.from_arrow(pa.Table.from_pandas(positives.assign(
        prior=pd.array([False] * len(positives), dtype="bool"))[
        ["bucket", "h", "prior", "doc_id"]], preserve_index=False))

    def anti(g: pd.DataFrame) -> pa.Table:
        # Arrow out: the fast path it unions with is an Arrow stream
        prior_set = set(g.loc[g["prior"], "h"])
        new = g[~g["prior"]]
        keep = new[~new["h"].isin(prior_set)]
        return pa.table({"doc_id": pa.array(
            np.sort(keep["doc_id"].to_numpy(np.int64)))})

    verified = (docs.map_batches(tag_prior, batch_format="pyarrow")
                .union(pos_ds)
                .repartition(max(1, n_buckets // 4))
                .groupby("bucket").map_groups(anti, batch_format="pandas"))
    return admitted_fast.union(verified)


def near_dup_removal_scalable(sf_dir: str, k: int = 3,
                              threshold: float = 0.5,
                              n_buckets: int = 64) -> rd.Dataset:
    """The end-to-end 100-TB near-dedup recipe with EVERY stage in its
    scale shape — the composition a production run would use:

      1. sub-quadratic MinHash-LSH candidates + distributed exact
         Jaccard verification (minhash_verified_pairs: narrow 32×2
         bands, miss probability ≈1e-4 at the threshold);
      2. fully distributed connected components over the verified pair
         graph (min-label propagation — no driver union-find);
      3. drop-set broadcast via ``ray.put`` (proportional to duplicates
         found, not corpus size) and one streaming pyarrow filter.

    Versus near_dup_removal this swaps the exact all-shingle pair scan
    for LSH+verify and the driver union-find for distributed CC. Pairs
    are exactly verified, so with the banding recall above the output
    matches the exact variant — it shares that oracle (hash-strict at
    both driver scales); pytest additionally asserts equality with
    near_dup_removal."""
    import pyarrow as pa

    pairs = minhash_verified_pairs(sf_dir, k, threshold)
    clusters = _cc_label_propagation(pairs)
    drop = frozenset(d for d, c in zip(clusters["doc_id"],
                                       clusters["cluster_id"]) if d != c)
    drop_ref = ray.put(drop)

    def keep(batch: pa.Table) -> pa.Table:
        dropset = ray.get(drop_ref)
        mask = pa.array([d not in dropset
                         for d in batch["doc_id"].to_pylist()],
                        type=pa.bool_())  # 0-row batch safe
        return batch.filter(mask).select(["doc_id"])

    return _docs(sf_dir, ["doc_id"]).map_batches(keep,
                                                 batch_format="pyarrow")


def ngram_novelty(sf_dir: str, k: int = 3,
                  n_buckets: int = 64) -> pd.DataFrame:
    """Per-doc n-gram NOVELTY profile — the redundancy-curriculum
    signal behind novelty-ordered data pruning: for each doc, how many
    of its distinct k-word shingles it OWNS (owner = min doc_id
    corpus-wide, the deterministic first occurrence) vs carries. A doc
    with n_novel ≪ n_grams is restating the corpus; sort by the ratio
    and you have a dedup-aware curriculum.

    Shape: each doc's distinct shingles explode to (bucket(g), g,
    doc_id) rows; a gram's bucket is a stable hash of the gram, so
    ownership and per-doc counts are bucket-local and exact — one
    bounded groupby, then per-doc partial sums through the combiner
    tree. Same shingle definition as the Jaccard family, so the
    windowed-SQL oracle reuses its proven gram expression."""
    from ..stages.agg import combine_partials

    def explode(batch: pa.Table) -> pa.Table:
        rows_b, rows_g, rows_d = [], [], []
        for did, text in zip(_np(batch["doc_id"]).tolist(),
                             batch["text"].to_pylist()):
            if not text.strip():
                continue
            for g in _shingles(text, k):
                rows_b.append(hash64(g) % n_buckets)
                rows_g.append(g)
                rows_d.append(did)
        return pa.table({
            "bucket": pa.array(np.asarray(rows_b, dtype=np.int32)),
            "g": pa.array(rows_g, type=pa.string()),
            "doc_id": pa.array(rows_d, type=pa.int64())})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        owner = g.groupby("g", sort=False)["doc_id"].transform("min")
        out = (pd.DataFrame({"doc_id": g["doc_id"].values,
                             "n_grams": 1,
                             "n_novel": (g["doc_id"].values
                                         == owner.values).astype("int64")})
               .groupby("doc_id", sort=False).sum().reset_index())
        return out

    df = combine_partials(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .repartition(max(1, n_buckets // 4))
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas"),
        ["doc_id"], {"n_grams": "sum", "n_novel": "sum"}).to_pandas()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df.sort_values("doc_id").reset_index(drop=True)


def corpus_diff(sf_dir: str, n_buckets: int = 64) -> pd.DataFrame:
    """Snapshot audit: treating even-numbered sources as snapshot A and
    odd ones as snapshot B (the incremental_dedup convention), report
    how many distinct document TEXTS were added (B only), removed
    (A only) and kept (both) — the corpus-level change summary every
    rolling ingest logs. Both sides reduce to (bucket, content-md5,
    side-bit) rows co-partitioned by a hash bucket; each bucket
    classifies its hashes locally and emits three counters that sum
    through the combiner tree — the bidirectional generalization of the
    incremental anti-join, nothing broadcast, nothing driver-side but
    the 3-row summary."""
    from ..functions.hashing import md5_hex
    from ..stages.agg import combine_partials

    def tag(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        texts = batch["text"].to_pylist()
        seen = set()
        buckets, hs, in_a = [], [], []
        for s, t in zip(srcs, texts):
            a = int(s[3:]) % 2 == 0
            h = md5_hex(t)
            if (h, a) in seen:     # batch-local drop_duplicates
                continue
            seen.add((h, a))
            buckets.append(hash64(h) & (n_buckets - 1))
            hs.append(h)
            in_a.append(a)
        return pa.table({
            "bucket": pa.array(buckets, type=pa.int64()),
            "h": pa.array(hs, type=pa.string()),
            "in_a": pa.array(in_a, type=pa.bool_())})

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        # a hash is in A iff any A row; in B iff any non-A row
        has_a = g[g["in_a"]]["h"].unique()
        has_b = g[~g["in_a"]]["h"].unique()
        sa, sb = set(has_a), set(has_b)
        return pd.DataFrame({
            "k": pd.array([0], dtype="int64"),
            "n_added": pd.array([len(sb - sa)], dtype="int64"),
            "n_removed": pd.array([len(sa - sb)], dtype="int64"),
            "n_kept": pd.array([len(sa & sb)], dtype="int64")})

    df = combine_partials(
        _docs(sf_dir, ["text", "source"])
        .map_batches(tag, batch_format="pyarrow")
        .repartition(max(1, n_buckets // 4))
        .groupby("bucket").map_groups(classify, batch_format="pandas"),
        ["k"], {"n_added": "sum", "n_removed": "sum", "n_kept": "sum"}
    ).to_pandas()
    return (df[["n_added", "n_removed", "n_kept"]]
            .astype("int64").reset_index(drop=True))


def substring_dup_spans(sf_dir: str, k: int = 8,
                        n_buckets: int = 64) -> pd.DataFrame:
    """Exact substring-duplication coverage — the OVERLAPPING-gram
    semantic of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better", public): every k-token window that occurs
    MORE THAN ONCE corpus-wide (any position, including within-doc
    repeats) marks its token interval as duplicated; per doc the hit
    intervals are UNION-merged and the report is (doc_id, n_tokens,
    n_dup_tokens, n_spans). ``dup_passage_stats`` tiles the doc into
    disjoint passages and misses dup regions that straddle a tile
    boundary; this operator is position-exact.

    Scale shape (two bounded shuffles, text never moves):
      1. gram pass: each batch emits (gram-md5-bucket, gram-md5, doc_id,
         pos) — 32-byte key + ints per token position, the intrinsic
         cost of substring-level dedup;
      2. groupby(gram bucket): a gram's global count is bucket-local and
         complete, so duplicated occurrences (doc_id, pos) are decided
         in-group with no broadcast dup-set;
      3. the surviving hit positions re-bucket by doc_id hash and each
         doc's interval union is computed VECTORIZED across the whole
         group (sort + per-doc cummax of interval ends — the
         gaps-and-islands scan, not a Python loop per doc);
      4. the per-doc hit stats join the per-doc token counts on the
         driver — both frames are the query's own output size.

    Exactness contract: interval arithmetic is pure int64 and the SQL
    oracle is the same gaps-and-islands window scan (MAX(e) OVER
    (... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)), so the driver hash
    is strict."""
    from ..functions.hashing import md5_hex

    K = k

    def gram_rows(batch: pa.Table) -> pa.Table:
        rows_b, rows_h, rows_d, rows_p = [], [], [], []
        for did, text in zip(_np(batch["doc_id"]).tolist(),
                             batch["text"].to_pylist()):
            ws = text.split()
            for i in range(len(ws) - K + 1):
                h = md5_hex(" ".join(ws[i:i + K]))
                rows_b.append(hash64(h) % n_buckets)
                rows_h.append(h)
                rows_d.append(did)
                rows_p.append(i + 1)        # 1-based, matching the oracle
        return pa.table({
            "bucket": pa.array(np.asarray(rows_b, dtype=np.int32)),
            "h": pa.array(rows_h, type=pa.string()),
            "doc_id": pa.array(rows_d, type=pa.int64()),
            "pos": pa.array(rows_p, type=pa.int64())})

    def dup_hits(g: pd.DataFrame) -> pd.DataFrame:
        dup = g.groupby("h")["doc_id"].transform("size") >= 2
        out = g.loc[dup, ["doc_id", "pos"]].copy()
        out["doc_bucket"] = (out["doc_id"] % n_buckets).astype("int32")
        return out

    def merge_intervals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "pos"]).reset_index(drop=True)
        e = g["pos"] + (K - 1)
        pm = (e.groupby(g["doc_id"].values).cummax()
              .groupby(g["doc_id"].values).shift(1))
        new_span = pm.isna() | (g["pos"] > pm)
        covered = np.where(new_span, K,
                           np.maximum(e - pm.fillna(0), 0)).astype("int64")
        agg = (pd.DataFrame({"doc_id": g["doc_id"], "cov": covered,
                             "ns": new_span.astype("int64")})
               .groupby("doc_id", sort=False).sum().reset_index())
        return agg.rename(columns={"cov": "n_dup_tokens", "ns": "n_spans"})

    hits = (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(gram_rows, batch_format="pyarrow")
            .repartition(max(1, n_buckets // 4))
            .groupby("bucket").map_groups(dup_hits, batch_format="pandas")
            .groupby("doc_bucket")
            .map_groups(merge_intervals, batch_format="pandas")
            .to_pandas())

    def tok_counts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array([len(t.split())
                                  for t in batch["text"].to_pylist()],
                                 type=pa.int64())})

    toks = (_docs(sf_dir, ["doc_id", "text"])
            .map_batches(tok_counts, batch_format="pyarrow").to_pandas())
    out = toks.merge(hits[["doc_id", "n_dup_tokens", "n_spans"]]
                     if not hits.empty else
                     pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                   "n_dup_tokens": pd.array([], dtype="int64"),
                                   "n_spans": pd.array([], dtype="int64")}),
                     on="doc_id", how="left")
    for c in ("n_dup_tokens", "n_spans"):
        out[c] = out[c].fillna(0).astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def source_leakage_matrix(sf_dir: str, passage_words: int = 10,
                          n_buckets: int = 64) -> pd.DataFrame:
    """Cross-SOURCE contamination matrix: for every unordered pair of
    sources, how many DISTINCT passage fingerprints they share. The
    between-subset view of dup_passage_stats — before mixing training
    subsets you need to know which ones are secretly the same feed
    (mirrors, scrapes of scrapes), and per-doc dup counts can't show
    that.

    Passages are the same disjoint ``passage_words``-word tiles as
    dup_passage_stats (tail dropped). Output (src_a, src_b, n_shared),
    src_a < src_b, both columns sorted — only pairs sharing ≥1 passage
    appear.

    Scale shape: batches emit batch-DISTINCT (passage-md5-bucket, md5,
    source) rows — text never leaves the scan; a passage's full source
    set is bucket-local, so each bucket group dedups to (h, source),
    self-merges on h (vectorized pandas merge, NOT a per-hash Python
    loop) and emits per-pair partial counts; the combiner tree reduces
    to the final matrix, which is |sources|²-bounded — the only
    driver-side object."""
    from ..functions.hashing import md5_hex
    from ..stages.agg import combine_partials

    P = passage_words

    def explode(batch: pa.Table) -> pa.Table:
        rows_b, rows_h, rows_s = [], [], []
        seen = set()
        for src, text in zip(batch["source"].to_pylist(),
                             batch["text"].to_pylist()):
            ws = text.split()
            for j in range(len(ws) // P):
                h = md5_hex(" ".join(ws[j * P:(j + 1) * P]))
                if (h, src) in seen:
                    continue
                seen.add((h, src))
                rows_b.append(hash64(h) % n_buckets)
                rows_h.append(h)
                rows_s.append(src)
        return pa.table({
            "bucket": pa.array(np.asarray(rows_b, dtype=np.int32)),
            "h": pa.array(rows_h, type=pa.string()),
            "source": pa.array(rows_s, type=pa.string())})

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        sh = g[["h", "source"]].drop_duplicates()
        m = sh.merge(sh, on="h", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        out = (m.groupby(["source_a", "source_b"], sort=False)
               .size().rename("n_shared").reset_index())
        out["n_shared"] = out["n_shared"].astype("int64")
        return out.rename(columns={"source_a": "src_a",
                                   "source_b": "src_b"})

    parts = (_docs(sf_dir, ["source", "text"])
             .map_batches(explode, batch_format="pyarrow")
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(pair_partials,
                                           batch_format="pandas"))
    out = combine_partials(parts, ["src_a", "src_b"],
                           {"n_shared": "sum"}).to_pandas()
    out["n_shared"] = out["n_shared"].astype("int64")
    return (out.sort_values(["src_a", "src_b"])
            .reset_index(drop=True))


def emb_text_dup_agreement(sf_dir: str, cos_threshold: float = 0.4,
                           jac_threshold: float = 0.5) -> pd.DataFrame:
    """DEDUP-THRESHOLD CALIBRATION: how well does the cheap embedding
    signal (within-label cosine ≥ ``cos_threshold``, the
    embedding_near_dup semantics) agree with exact text overlap
    (word-shingle Jaccard ≥ ``jac_threshold``, the jaccard_dup_pairs
    semantics)? Production pipelines run this confusion count on a
    labeled slice before trusting SemDeDup-style embedding dedup at
    full scale (Abbas et al. 2023 calibrate ε exactly this way).
    vec_id ↔ doc_id identity is the corpus contract.

    Output is ONE row: (n_emb_pairs, n_text_pairs, n_both,
    precision_q, recall_q) with the ratios in exact integer floor
    division ((n_both·10^6) // max(n,1)) so the oracle comparison
    needs no float contract. Scale shape: both pair generators keep
    their own documented shuffles; the agreement join runs on the two
    OUTPUT-sized pair lists (dup pairs, not the corpus) — the merge is
    driver-side because dedup-pair lists are bounded by design."""
    ep = embedding_near_dup(sf_dir, threshold=cos_threshold)
    tp = jaccard_dup_pairs(sf_dir, threshold=jac_threshold)
    n_emb, n_text = len(ep), len(tp)
    if n_emb and n_text:
        both = ep.merge(tp, left_on=["vec_id_a", "vec_id_b"],
                        right_on=["id_a", "id_b"])
        n_both = len(both)
    else:
        n_both = 0
    return pd.DataFrame({
        "n_emb_pairs": pd.array([n_emb], dtype="int64"),
        "n_text_pairs": pd.array([n_text], dtype="int64"),
        "n_both": pd.array([n_both], dtype="int64"),
        "precision_q": pd.array([n_both * 1_000_000 // max(n_emb, 1)],
                                dtype="int64"),
        "recall_q": pd.array([n_both * 1_000_000 // max(n_text, 1)],
                             dtype="int64")})


def minhash_estimator_accuracy(sf_dir: str, k: int = 3,
                               est_threshold: float = 0.25
                               ) -> pd.DataFrame:
    """MinHash SIGNATURE-SIZE CALIBRATION: per LSH candidate pair, the
    64-hash MinHash Jaccard estimate next to the EXACT shingle Jaccard
    and their quantized error — the probe that tells you whether 64
    permutations suffice before you commit a 100-TB dedup run to them
    (Broder 1997: each permutation is a Bernoulli(J) trial, so
    |est − J| concentrates as ~√(J(1−J)/64)). Completes the
    calibration trio: emb_text_dup_agreement (embedding vs text),
    image_dhash_dups' hamming (pixels vs encoding), and this
    (sketch vs exact).

    Scale shape: candidates from the banded-LSH shuffle; the exact
    side re-runs the shingle-bucket co-partition RESTRICTED to the
    broadcast candidate-id set (the minhash_verified_pairs move) with
    threshold 0 so every candidate pair gets its true J. Driver touches
    candidate-pair lists only. No SQL oracle (the signature's crc32 ∘
    (a·x+b) mod 2³¹−1 permutations aren't DuckDB-expressible);
    pytest pins the replica equality and the concentration bound.
    Output (id_a, id_b, est_q, exact_q, abs_err_q), pairs sorted."""
    cand = minhash_lsh_pairs(sf_dir, k, est_threshold, n_bands=32)
    empty = pd.DataFrame({
        "id_a": pd.array([], dtype="int64"),
        "id_b": pd.array([], dtype="int64"),
        "est_q": pd.array([], dtype="int64"),
        "exact_q": pd.array([], dtype="int64"),
        "abs_err_q": pd.array([], dtype="int64")})
    if cand.empty:
        return empty
    wanted_ref = ray.put(frozenset(cand["id_a"]) | frozenset(cand["id_b"]))
    exact = jaccard_dup_pairs(sf_dir, k, 0.0, wanted_ref=wanted_ref,
                              return_jaccard=True)
    # left merge: an LSH candidate with NO shared shingle (pure
    # permutation collision) is a real estimator error — exact J = 0.
    # cand is non-empty here, so the merge result is too.
    out = cand.merge(exact, on=["id_a", "id_b"], how="left")
    out["jaccard"] = out["jaccard"].fillna(0.0)
    est_q = np.floor(out["est_jaccard"].to_numpy() * 1e6 + 0.5)
    ex_q = np.floor(out["jaccard"].to_numpy() * 1e6 + 0.5)
    return (pd.DataFrame({
        "id_a": out["id_a"].astype("int64"),
        "id_b": out["id_b"].astype("int64"),
        "est_q": pd.array(est_q, dtype="int64"),
        "exact_q": pd.array(ex_q, dtype="int64"),
        "abs_err_q": pd.array(np.abs(est_q - ex_q), dtype="int64")})
        .sort_values(["id_a", "id_b"]).reset_index(drop=True))


def jaccard_threshold_sweep(sf_dir: str, k: int = 3,
                            min_threshold: float = 0.1) -> pd.DataFrame:
    """DEDUP-THRESHOLD TUNING CURVE: how many near-dup pairs would each
    Jaccard cutoff keep? One distributed pass computes every pair with
    J ≥ ``min_threshold`` (the same shingle-bucket co-partition as
    jaccard_dup_pairs — text never shuffles), then the driver buckets
    the OUTPUT-sized pair list into the 10%-grid cumulative curve.
    This is the sweep you run before committing a 100-TB dedup pass to
    a single threshold (pair volume vs cutoff ⇒ retention estimate).
    Output (threshold_pct, n_pairs) with n_pairs = pairs at J ≥
    threshold_pct/100, thresholds 10..90 step 10, zeros included."""
    pairs = jaccard_dup_pairs(sf_dir, k, min_threshold,
                              return_jaccard=True)
    grid = np.arange(10, 100, 10)
    j = pairs["jaccard"].to_numpy() if len(pairs) else np.array([])
    n = [(j >= t / 100.0).sum() for t in grid]
    return pd.DataFrame({
        "threshold_pct": pd.array(grid, dtype="int64"),
        "n_pairs": pd.array(n, dtype="int64")})


def contrastive_pairs(sf_dir: str, k: int = 3,
                      threshold: float = 0.5) -> pd.DataFrame:
    """CONTRASTIVE TRAINING-PAIR MINING from the dup graph: every exact
    near-dup pair (word-shingle Jaccard ≥ ``threshold``) becomes an
    (anchor, positive); the negative is the deterministic md5-argmin
    non-partner — negative(a) = argmin_d md5(f"{a}:{d}") over docs d
    that are neither a nor any positive partner of a. This is the
    standard weak-supervision recipe for training/calibrating embedding
    models on one's own corpus (SimCSE-style positives from near-dups,
    uniform negatives), made RERUN- and PARTITION-DETERMINISTIC by
    hashing instead of sampling. Purely string/int — hash-strict with
    no float contract.

    Scale shape: positives ride jaccard_dup_pairs' documented shuffles;
    the negative argmin streams the corpus ONCE with the (pair-bounded)
    anchor list broadcast — per batch one (anchor, min-hash, doc) row
    per anchor through the min-combiner. Output (anchor, positive,
    negative), pair-sorted."""
    from ..functions.hashing import md5_hex
    from ..stages.agg import combine_partials

    pairs = jaccard_dup_pairs(sf_dir, k, threshold)
    empty = pd.DataFrame({"anchor": pd.array([], dtype="int64"),
                          "positive": pd.array([], dtype="int64"),
                          "negative": pd.array([], dtype="int64")})
    if pairs.empty:
        return empty
    partners: dict[int, set] = {}
    for a, b in zip(pairs["id_a"].astype(int), pairs["id_b"].astype(int)):
        partners.setdefault(a, {a}).add(b)
        partners.setdefault(b, {b}).add(a)
    # only id_a-side anchors need negatives
    anchors_ref = ray.put({int(a): frozenset(partners[int(a)])
                           for a in pairs["id_a"].unique()})

    def neg_partial(batch: pa.Table) -> pa.Table:
        excl = ray.get(anchors_ref)
        ids = _np(batch["doc_id"]).tolist()
        anchors, hks = [], []
        for a, banned in excl.items():
            best_h, best_d = None, None
            for d in ids:
                if d in banned:
                    continue
                h = md5_hex(f"{a}:{d}")
                if best_h is None or h < best_h or (h == best_h
                                                    and d < best_d):
                    best_h, best_d = h, d
            if best_h is not None:
                anchors.append(a)
                # min-combiner key: the (h, negative) pair must move
                # together, so encode negative into the key; ties on h
                # break by the smaller doc id via the lexicographic
                # zero-padded suffix
                hks.append(f"{best_h}:{best_d:020d}")
        return pa.table({
            "anchor": pa.array(anchors, type=pa.int64()),
            "hk": pa.array(hks, type=pa.string())})

    mins = combine_partials(
        _docs(sf_dir, ["doc_id"]).map_batches(neg_partial,
                                              batch_format="pyarrow"),
        ["anchor"], {"hk": "min"}).to_pandas()
    if mins.empty or "anchor" not in mins.columns:
        return empty
    neg = {int(a): int(hk.rsplit(":", 1)[1])
           for a, hk in zip(mins["anchor"], mins["hk"])}
    # -1 sentinel: every corpus doc is a partner of this anchor (only
    # possible on degenerate all-dup corpora)
    out = pd.DataFrame({
        "anchor": pairs["id_a"].astype("int64"),
        "positive": pairs["id_b"].astype("int64"),
        "negative": pd.array([neg.get(int(a), -1)
                              for a in pairs["id_a"]], dtype="int64")})
    return (out.sort_values(["anchor", "positive"])
            .reset_index(drop=True))


def dedup_retention_by_source(sf_dir: str, k: int = 3,
                              threshold: float = 0.5,
                              n_buckets: int = 64) -> pd.DataFrame:
    """DEDUP-RETENTION accounting per source: docs and whitespace tokens
    kept after near-dup removal (jaccard_clusters' min-id
    representative rule) — the report that decides which crawl pays for
    its storage after dedup (the near-dup companion to
    dup_share_by_source's exact-md5 view). Hash-strict against the
    recursive-CTE connected-components oracle, shares in exact integer
    floor division. Scale: the drop-set is duplicate-proportional and
    broadcasts once (the near_dup_removal move); one streaming pass
    emits per-source (docs, kept, tokens, tokens_kept) partials."""
    from ..stages.agg import combine_partials

    clusters = jaccard_clusters(sf_dir, k, threshold, n_buckets)
    drop = frozenset(d for d, c in zip(clusters["doc_id"],
                                       clusters["cluster_id"]) if d != c)
    drop_ref = ray.put(drop)

    def partial(batch: pa.Table) -> pa.Table:
        dropset = ray.get(drop_ref)
        toks = np.fromiter((len(t.split())
                            for t in batch["text"].to_pylist()),
                           dtype=np.int64, count=len(batch))
        kept = np.asarray([d not in dropset
                           for d in _np(batch["doc_id"]).tolist()],
                          dtype=bool)
        srcs = batch["source"].to_pylist()
        agg: dict[str, list] = {}
        for i, s in enumerate(srcs):
            a = agg.get(s)
            if a is None:
                a = agg[s] = [0, 0, 0, 0]
            a[0] += 1
            a[1] += int(kept[i])
            a[2] += int(toks[i])
            a[3] += int(toks[i]) if kept[i] else 0
        keys = list(agg)
        cols = np.asarray([agg[s] for s in keys], dtype=np.int64) \
            if keys else np.zeros((0, 4), dtype=np.int64)
        return pa.table({
            "source": pa.array(keys, type=pa.string()),
            "n_docs": pa.array(cols[:, 0]),
            "n_kept": pa.array(cols[:, 1]),
            "n_tokens": pa.array(cols[:, 2]),
            "n_tokens_kept": pa.array(cols[:, 3])})

    out = combine_partials(
        _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
            partial, batch_format="pyarrow"),
        ["source"], {c: "sum" for c in ("n_docs", "n_kept", "n_tokens",
                                        "n_tokens_kept")}).to_pandas()
    if out.empty or "source" not in out.columns:
        return pd.DataFrame({
            "source": pd.array([], dtype="string"),
            **{c: pd.array([], dtype="int64")
               for c in ("n_docs", "n_kept", "n_tokens", "n_tokens_kept",
                         "kept_share_q")}})
    for c in ("n_docs", "n_kept", "n_tokens", "n_tokens_kept"):
        out[c] = out[c].astype("int64")
    out["kept_share_q"] = (out["n_kept"] * 1_000_000
                           // out["n_docs"]).astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def bloom_fpr_calibration(sf_dir: str, bits_per_key: int = 16,
                          k_hashes: int = 8,
                          n_probes: int = 10_000) -> pd.DataFrame:
    """BLOOM-FILTER FPR calibration: build the prior-snapshot filter
    exactly as incremental_dedup_bloom does, then probe it with
    ``n_probes`` deterministic NON-MEMBER keys (md5-derived synthetic
    strings, no RNG state) and report the measured false-positive rate
    next to the theoretical (1 − e^{−k·n/m})^k — the sizing check run
    before trusting bits_per_key at snapshot scale (completes the
    sketch-calibration family: minhash, HLL, CMS). Counts are exact
    ints; rates quantize as integer floor division. No SQL oracle (bit
    arrays aren't SQL); pytest pins the probe replica and a
    concentration bound around theory. Scale: the filter build is the
    documented OR-reduce; probing is one vectorized pass over the
    broadcast filter. Output one row (m_bits, k_hashes, n_keys,
    n_probes, n_false_pos, fpr_q, theory_fpr_q)."""
    import math

    docs = _docs(sf_dir, ["doc_id", "text", "source"])
    n_total = docs.count()
    m = 1 << max(10, int(np.ceil(np.log2(max(bits_per_key * n_total,
                                             2)))))

    def _is_prior(sources) -> list:
        return [int(s[3:]) % 2 == 0 for s in sources]

    def partial_bloom(batch: pa.Table) -> pa.Table:
        bm = np.zeros(m >> 3, dtype=np.uint8)
        prior = _is_prior(batch["source"].to_pylist())
        texts = [t for t, p in zip(batch["text"].to_pylist(), prior) if p]
        n_keys = len(texts)
        if n_keys:
            pos = _bloom_positions(texts, m, k_hashes).ravel()
            np.bitwise_or.at(bm, (pos >> np.uint64(3)).astype(np.int64),
                             (np.uint8(1) << (pos & np.uint64(7))
                              .astype(np.uint8)))
        return pa.table({
            "bloom": pa.array([bm.tobytes()], type=pa.binary()),
            "n_keys": pa.array([n_keys], type=pa.int64())})

    parts = docs.map_batches(partial_bloom, batch_format="pyarrow",
                             batch_size=1024).to_pandas()
    bloom = np.zeros(m >> 3, dtype=np.uint8)
    for b in parts["bloom"]:
        np.bitwise_or(bloom, np.frombuffer(b, dtype=np.uint8), out=bloom)
    n_keys = int(parts["n_keys"].sum())

    # deterministic non-member probes: a namespaced synthetic key equals
    # an inserted document text only by deliberate construction — the
    # FPR estimate needs probes ∉ keys, which the namespace tag gives
    probes = [f"__bloom_probe__:{i}" for i in range(n_probes)]
    pos = _bloom_positions(probes, m, k_hashes)
    byte_idx = (pos >> np.uint64(3)).astype(np.int64)
    bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    hit = ((bloom[byte_idx] & bit) != 0).all(axis=1)
    n_fp = int(hit.sum())
    theory = (1.0 - math.exp(-k_hashes * n_keys / m)) ** k_hashes
    return pd.DataFrame({
        "m_bits": pd.array([m], dtype="int64"),
        "k_hashes": pd.array([k_hashes], dtype="int64"),
        "n_keys": pd.array([n_keys], dtype="int64"),
        "n_probes": pd.array([n_probes], dtype="int64"),
        "n_false_pos": pd.array([n_fp], dtype="int64"),
        "fpr_q": pd.array([n_fp * 1_000_000 // max(n_probes, 1)],
                          dtype="int64"),
        "theory_fpr_q": pd.array([int(np.floor(theory * 1e6 + 0.5))],
                                 dtype="int64")})
