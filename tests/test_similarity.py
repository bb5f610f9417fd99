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


def test_ivf_centroids_deterministic():
    from ragflow_core16_ray.pipelines.similarity import train_centroids

    rng = np.random.RandomState(1)
    x = rng.normal(size=(200, 16))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    c1 = train_centroids(x, 4)
    c2 = train_centroids(x, 4)
    assert np.array_equal(c1, c2)
