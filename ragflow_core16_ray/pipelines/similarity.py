"""Similarity search over the `embeddings` table.

- brute-force cosine top-k: broadcast query matrix (`ray.put` once), numpy
  matmul per batch, per-batch top-k partials, tiny global merge — the exact
  baseline, linear scan but fully distributed.
- LSH-bucketed top-k: random-hyperplane signatures (fixed seed); only
  buckets within a signature hamming radius of the query are scanned, then
  exact rerank — the sub-linear scale path (IVF-style with hyperplane cells
  instead of k-means centroids; no external libs in sandbox).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])


def _norm(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def load_query(sf_dir: str, query_vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    idx = pc.index(t["vec_id"], query_vec_id).as_py()
    return np.array(t["embedding"][idx].as_py(), dtype=np.float64)


def brute_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k vs the embedding of ``query_vec_id`` (the query
    row itself is included — deterministic on both engine and oracle).
    Output: vec_id only (ints hash stably)."""
    q = load_query(sf_dir, query_vec_id)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qv = ray.get(q_ref)
        m = _norm(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = m @ qv
        order = np.lexsort((batch["vec_id"].to_numpy(), -sims))[:k]
        return pd.DataFrame({"vec_id": batch["vec_id"].to_numpy()[order],
                             "sim": sims[order]})

    partials = _emb(sf_dir).map_batches(partial_topk, batch_format="pandas")
    df = partials.to_pandas()  # ≤ k rows per batch — tiny
    df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
    return df[["vec_id"]].reset_index(drop=True)


N_PLANES = 8
_rng = np.random.RandomState(0x5EED5)
# hyperplanes drawn once at import with a fixed seed (same on every worker)
_PLANES64 = _rng.normal(size=(N_PLANES, 64))


def _signature(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    return (bits.astype(np.uint32) << np.arange(planes.shape[0],
                                                dtype=np.uint32)).sum(axis=1)


def lsh_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10,
             probe_hamming: int = 1) -> pd.DataFrame:
    """Approximate top-k: scan only vectors whose hyperplane signature is
    within ``probe_hamming`` bits of the query's, exact-rerank those.
    Returns (vec_id, scanned) where scanned = candidate count — the
    sub-linear evidence."""
    q = load_query(sf_dir, query_vec_id)
    dim = len(q)
    planes = _PLANES64[:, :dim] if dim <= 64 else _rng.normal(size=(N_PLANES, dim))
    qsig = int(_signature((q / np.linalg.norm(q))[None, :], planes)[0])
    ok_sigs = {qsig}
    for h in range(N_PLANES):
        ok_sigs.add(qsig ^ (1 << h))
    if probe_hamming >= 2:
        for a in range(N_PLANES):
            for b in range(a + 1, N_PLANES):
                ok_sigs.add(qsig ^ (1 << a) ^ (1 << b))
    state = ray.put((q / np.linalg.norm(q), planes, ok_sigs))

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        qv, pl, sigs = ray.get(state)
        m = _norm(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sig = _signature(m, pl)
        mask = np.isin(sig, np.fromiter(sigs, dtype=np.uint32))
        if not mask.any():
            return pd.DataFrame({"vec_id": [], "sim": [], "scanned": []})
        sims = m[mask] @ qv
        ids = batch["vec_id"].to_numpy()[mask]
        order = np.lexsort((ids, -sims))[:k]
        return pd.DataFrame({"vec_id": ids[order], "sim": sims[order],
                             "scanned": int(mask.sum())})

    df = _emb(sf_dir).map_batches(probe, batch_format="pandas").to_pandas()
    if df.empty:
        return pd.DataFrame({"vec_id": [], "scanned": []})
    scanned = int(df["scanned"].sum())
    df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
    out = df[["vec_id"]].reset_index(drop=True)
    out["scanned"] = scanned
    return out
