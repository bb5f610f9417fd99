"""Embedding production stage — the encode step of the reference's
worker (rag/svr/task_executor.py:384-426): chunks → ``q_vec``.

The reference encodes batches of 16 chunks on a GPU embedding model and
mixes title/content as ``0.1·title_vec + 0.9·content_vec``
(task_executor.py:417-421, ``filename_embd_weight`` default 0.1). The
sandbox has no model weights, so the encoder here is a DETERMINISTIC
FEATURE-HASH embedder (the classic hashing trick): each token hashes to
one of ``dim`` signed buckets via ``md5_hash64`` — the same hash DuckDB
exposes as ``md5_number_lower``, so the bucket sums have an exact SQL
oracle — and the bucket-sum vector is L2-normalized. Every pipeline
property the reference's encode stage has is preserved: stateful
actor-pool stage (model "load" once per actor), batch-16 inference,
title/content mix, one ``q_vec: list<float32>`` per chunk feeding the
similarity table format. Swapping in a real model = replacing
``_encode`` with a batched forward pass; nothing upstream changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.hashing import md5_hash64

EMBED_DIM = 64
EMBED_BATCH = 16      # the reference's encode batch (task_executor.py:393)
TITLE_W = 0.1         # filename_embd_weight (task_executor.py:417-421)


def hash_embed_sums(tokens: list[str], dim: int = EMBED_DIM,
                    _cache: dict = {}) -> np.ndarray:
    """Signed bucket sums (int64): bucket = h % dim, sign = bit ``log2
    dim`` of h — both exactly re-computable in SQL from
    ``md5_number_lower``. The token→(bucket, sign) map caches across
    calls (vocabulary ≪ corpus)."""
    v = np.zeros(dim, dtype=np.int64)
    for t in tokens:
        hit = _cache.get((t, dim))
        if hit is None:
            h = md5_hash64(t)
            hit = (h % dim, 1 if ((h // dim) & 1) == 0 else -1)
            _cache[(t, dim)] = hit
        v[hit[0]] += hit[1]
    return v


def _norm(v: np.ndarray) -> np.ndarray:
    f = v.astype(np.float32)
    n = float(np.linalg.norm(f))
    return f / n if n > 0 else f


def _bucket_sign(uniq, dim: int, _cache: dict = {}):
    """(bucket, sign) arrays for an array of DISTINCT tokens — one md5
    per new token ever seen by this process, the vectorized twin of
    ``hash_embed_sums``'s cache."""
    bs = np.empty(len(uniq), dtype=np.int64)
    sg = np.empty(len(uniq), dtype=np.int64)
    for i, t in enumerate(uniq):
        hit = _cache.get((t, dim))
        if hit is None:
            h = md5_hash64(t)
            hit = (h % dim, 1 if ((h // dim) & 1) == 0 else -1)
            _cache[(t, dim)] = hit
        bs[i], sg[i] = hit
    return bs, sg


def sums_matrix(texts, dim: int = EMBED_DIM) -> np.ndarray:
    """Whitespace-tokenize a string column and scatter every token's
    signed bucket into an (n, dim) int64 matrix — the batched form of
    ``hash_embed_sums`` (row i == hash_embed_sums(texts[i].split())):
    Arrow split + one np.unique + one add.at, no per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) \
        else pa.array(["" if t is None else t for t in texts], pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.fill_null(arr, "")
    toks = pc.utf8_split_whitespace(arr)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    words = flat.to_numpy(zero_copy_only=False)[keep]
    rows = parent[keep]
    v = np.zeros((len(arr), dim), dtype=np.int64)
    if len(words):
        uniq, inv = np.unique(words, return_inverse=True)
        bs, sg = _bucket_sign(uniq, dim)
        np.add.at(v, (rows, bs[inv]), sg[inv])
    return v


def _norm_rows(m: np.ndarray) -> np.ndarray:
    f = m.astype(np.float32)
    n = np.linalg.norm(f, axis=1, keepdims=True)
    return np.divide(f, n, out=f, where=n > 0)


class HashEmbedder:
    """Actor-pool encode stage (chunk-doc batches in, + ``q_vec`` out)."""

    def __init__(self, dim: int = EMBED_DIM, title_w: float = TITLE_W):
        self.dim = dim
        self.title_w = title_w
        # real impl: self.model = load_embedding_model(...)  (once/actor)

    def _encode(self, title_tks: str, content_ltks: str) -> np.ndarray:
        tv = _norm(hash_embed_sums(title_tks.split(), self.dim))
        cv = _norm(hash_embed_sums(content_ltks.split(), self.dim))
        return _norm(self.title_w * tv + (1 - self.title_w) * cv)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        # batched encode (row-for-row equal to _encode, pinned by
        # pytest): tokenize/scatter both fields as whole-column Arrow +
        # numpy passes — no per-row Python in the hot stage
        titles = batch["title_tks"] if "title_tks" in batch.columns \
            else [""] * len(batch)
        tv = _norm_rows(sums_matrix(titles, self.dim))
        cv = _norm_rows(sums_matrix(batch["content_ltks"], self.dim))
        q = _norm_rows(self.title_w * tv + (1 - self.title_w) * cv)
        batch["q_vec"] = list(q)
        return batch


def embed_chunks(chunks: rd.Dataset, dim: int = EMBED_DIM,
                 batch_size: int | None = None,
                 concurrency=None) -> rd.Dataset:
    """chunk docs (stages/enrich.chunk_docs output) → + ``q_vec``.

    ``batch_size=None`` = one task per upstream block: Ray fuses this
    stage with the chunker, and a row-count batch size would count the
    chunker's INPUT rows (docs), collapsing the fused stage into one
    giant task (measured: 1 task / 9 s for a 92k-chunk corpus vs
    parallel sub-second per-block tasks). The reference's batch-16
    (task_executor.py:393, EMBED_BATCH) is the MODEL micro-batch: a
    real GPU encoder slices its forward passes to 16 inside
    ``__call__``, exactly like OnnxOcr slices recognition to
    REC_BATCH — it is not a Ray task granularity."""
    from ..pipelines.multimodal import _default_pool

    return chunks.map_batches(
        HashEmbedder, fn_constructor_args=(dim,),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency or _default_pool())


# ------------------------------------------------- oracled probe queries ---

def doc_embedding_sums(sf_dir: str, dim: int = EMBED_DIM) -> rd.Dataset:
    """Exact-integer probe of the hash embedder over the documents
    table: (doc_id, bucket, v) signed bucket sums, one streaming pass,
    NO shuffle (each doc's tokens live in its own row). Hash-strict SQL
    oracle via md5_number_lower."""
    import os

    def sums(batch: pd.DataFrame) -> pd.DataFrame:
        doc_ids, buckets, vals = [], [], []
        for did, text in zip(batch["doc_id"], batch["text"]):
            v = hash_embed_sums((text or "").lower().split(), dim)
            nz = np.flatnonzero(v)
            doc_ids.extend([did] * len(nz))
            buckets.extend(nz.tolist())
            vals.extend(v[nz].tolist())
        return pd.DataFrame({
            "doc_id": pd.array(doc_ids, dtype="int64"),
            "bucket": pd.array(buckets, dtype="int64"),
            "v": pd.array(vals, dtype="int64")})

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"]
    ).map_batches(sums, batch_format="pandas")


def produced_emb_knn(sf_dir: str, k: int = 10,
                     dim: int = EMBED_DIM) -> pd.DataFrame:
    """Similarity search over PRODUCED (not pre-synthesized) embeddings:
    rank every other document by the exact INTEGER dot product of its
    signed bucket-sum vector against the min-doc_id query vector —
    integer scoring so the ranking is hash-strict against SQL. Shape:
    the query vector broadcasts (tiny); each batch emits only its local
    top-k partial; the driver merges ≤ k·batches rows."""
    import os

    import ray

    path = os.path.join(sf_dir, "documents.parquet")
    docs = rd.read_parquet(path, columns=["doc_id", "text"])
    qrow = (rd.read_parquet(path, columns=["doc_id", "text"])
            .sort("doc_id").limit(1).take(1))[0]
    q_id = int(qrow["doc_id"])
    q = hash_embed_sums((qrow["text"] or "").lower().split(), dim)
    q_ref = ray.put(q)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        m = batch[batch["doc_id"] != q_id]
        empty = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                              "dot": pd.array([], dtype="int64")})
        if m.empty:
            return empty
        V = np.stack([hash_embed_sums((t or "").lower().split(), dim)
                      for t in m["text"]])
        # all-zero vectors (empty/cancelling docs) are unrankable — drop
        # them on BOTH sides (the SQL side has no bucket rows for them)
        keep = (V != 0).any(axis=1)
        m, V = m[keep], V[keep]
        if m.empty:
            return empty
        dots = V @ qv
        order = np.lexsort((m["doc_id"].to_numpy(), -dots))[:k]
        return pd.DataFrame({
            "doc_id": pd.array(m["doc_id"].to_numpy()[order],
                               dtype="int64"),
            "dot": pd.array(dots[order], dtype="int64")})

    df = docs.map_batches(partial, batch_format="pandas").to_pandas()
    df = df.sort_values(["dot", "doc_id"],
                        ascending=[False, True]).head(k)
    return df.reset_index(drop=True)
