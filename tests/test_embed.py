"""Embedding production stage (stages/embed.py — the reference encode
step, task_executor.py:384-426): deterministic hash embedding, the
0.1/0.9 title/content mix, and q_vec production through the actor-pool
Dataset stage."""

import numpy as np
import pytest

from ragflow_core16_ray.functions.hashing import md5_hash64
from ragflow_core16_ray.stages.embed import (EMBED_DIM, HashEmbedder,
                                             embed_chunks, hash_embed_sums)


def test_hash_embed_sums_matches_md5_derivation():
    toks = "stream batch stream merge".split()
    v = hash_embed_sums(toks, 64)
    want = np.zeros(64, np.int64)
    for t in toks:
        h = md5_hash64(t)
        want[h % 64] += 1 if ((h // 64) & 1) == 0 else -1
    assert (v == want).all()
    assert (hash_embed_sums(toks, 64) == v).all()  # deterministic
    assert hash_embed_sums([], 64).sum() == 0


def test_title_content_mix():
    e = HashEmbedder()
    title, content = "alpha beta", "gamma delta epsilon"
    q = e._encode(title, content)
    assert np.linalg.norm(q) == pytest.approx(1.0, abs=1e-6)
    tv = hash_embed_sums(title.split(), EMBED_DIM).astype(np.float32)
    cv = hash_embed_sums(content.split(), EMBED_DIM).astype(np.float32)
    tv /= np.linalg.norm(tv)
    cv /= np.linalg.norm(cv)
    want = 0.1 * tv + 0.9 * cv
    want /= np.linalg.norm(want)
    assert np.abs(q - want).max() < 1e-6
    # empty title: content-only, still unit norm
    q2 = e._encode("", content)
    assert np.linalg.norm(q2) == pytest.approx(1.0, abs=1e-6)


def test_embed_chunks_dataset_stage(ray_session):
    import pandas as pd
    import ray.data as rd

    rows = [{"id": f"c{i}", "doc_id": f"d{i % 3}",
             "title_tks": f"doc {i % 3}",
             "content_ltks": f"token {i} stream batch table"}
            for i in range(40)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = embed_chunks(ds).to_pandas()
    assert len(out) == 40
    assert set(out.columns) >= {"id", "doc_id", "q_vec"}
    V = np.stack(out["q_vec"].to_numpy())
    assert V.shape == (40, EMBED_DIM)
    assert np.allclose(np.linalg.norm(V, axis=1), 1.0, atol=1e-5)
    # same text → same vector regardless of batch placement
    a = out.set_index("id").loc["c7", "q_vec"]
    b = HashEmbedder()._encode("doc 1", "token 7 stream batch table")
    assert np.abs(np.asarray(a) - b).max() < 1e-6


def test_batched_call_equals_per_row_encode():
    """The vectorized __call__ is row-for-row bit-equal to the scalar
    _encode path (same float32 op order), including empty/missing
    fields."""
    import numpy as np
    import pandas as pd

    from ragflow_core16_ray.stages.embed import HashEmbedder

    enc = HashEmbedder()
    batch = pd.DataFrame({
        "title_tks": ["alpha beta", "", "  ", "gamma", "x y z"],
        "content_ltks": ["the quick brown fox", "lone", "", "gamma gamma",
                         "x x  y"]})
    out = enc(batch.copy())
    for i in range(len(batch)):
        want = enc._encode(batch["title_tks"][i], batch["content_ltks"][i])
        assert np.array_equal(out["q_vec"][i], want), i
    # no title column at all → title side contributes zeros
    out2 = enc(pd.DataFrame({"content_ltks": ["a b c"]}))
    assert np.array_equal(out2["q_vec"][0], enc._encode("", "a b c"))
