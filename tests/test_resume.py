"""Resume-from-checkpoint: killing a partitioned run midway and resuming
must produce the identical output, with completed partitions skipped
(the BASELINE.md resumability criterion)."""

import glob
import json
import os

import pytest

from ragflow_core16_ray.config import ExtractConfig
from ragflow_core16_ray.sources.synth import write_corpus
from ragflow_core16_ray.state.lineage import plan_partitions, run_partitioned

CFG = ExtractConfig(shard_span_threshold=256)


def _read_sorted(out_dir):
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    df = rd.read_parquet(files).to_pandas()
    df["spans"] = df["spans"].map(
        lambda ss: tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in ss))
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    path = str(root / "corpus")
    write_corpus(path, n_docs=80, seed=11, mega_every=40, parallelism=4)
    return path


def test_resume_idempotent(corpus, tmp_path):
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")

    parts = plan_partitions(corpus, 4)
    assert len(parts) >= 2

    # full run
    m1 = run_partitioned(corpus, out1, cfg=CFG, n_partitions=4)
    assert m1["n_ran"] == m1["n_partitions"]
    assert m1["n_docs"] == 80

    # "crashed" run: simulate by running, then deleting some partitions'
    # outputs+manifests (as if the process died before writing them)
    m2a = run_partitioned(corpus, out2, cfg=CFG, n_partitions=4)
    for i in (1, 3):
        os.remove(os.path.join(out2, "_lineage", f"part-{i}.json"))
        import shutil

        shutil.rmtree(os.path.join(out2, f"part={i}"))
    # resume: only the two missing partitions rerun
    m2b = run_partitioned(corpus, out2, cfg=CFG, n_partitions=4)
    assert m2b["n_resumed_skips"] == 2
    assert m2b["n_ran"] == 2

    a, b = _read_sorted(out1), _read_sorted(out2)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert (a["spans"] == b["spans"]).all()
    assert (a["template"] == b["template"]).all()


def test_digest_invalidation(corpus, tmp_path):
    """A config change invalidates manifests → full rerun, no stale reuse."""
    out = str(tmp_path / "out")
    run_partitioned(corpus, out, cfg=CFG, n_partitions=2)
    m = run_partitioned(corpus, out,
                        cfg=ExtractConfig(shard_span_threshold=300),
                        n_partitions=2)
    assert m["n_resumed_skips"] == 0
    assert m["n_ran"] == 2


def test_manifest_metrics(corpus, tmp_path):
    out = str(tmp_path / "out")
    run_partitioned(corpus, out, cfg=CFG, n_partitions=2)
    manifests = sorted(glob.glob(os.path.join(out, "_lineage", "part-*.json")))
    assert len(manifests) == 2
    for p in manifests:
        m = json.load(open(p))
        assert m["n_docs"] > 0 and m["wall_sec"] > 0 and m["digest"]
