"""The stateful-stage slot: running the parse as an autoscaling actor pool
(where ONNX OCR/layout models would live, SURVEY.md §2.3) must produce
byte-identical output to the default stateless task pool."""

import pandas as pd

from ragflow_core16_ray.config import RuntimeConfig
from ragflow_core16_ray.sources.synth import write_corpus


def _run(corpus: str, out: str, runtime: RuntimeConfig) -> pd.DataFrame:
    import ray.data as rd

    from ragflow_core16_ray.pipelines.extract import run_extract

    run_extract(corpus, out, runtime=runtime)
    df = rd.read_parquet(out + "/docs").to_pandas()
    df["spans"] = df["spans"].map(
        lambda sp: tuple((s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in sp))
    return df.sort_values("doc_id").reset_index(drop=True)


def test_actor_pool_equals_task_pool(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, n_docs=60, seed=11, mega_every=30)
    tasks = _run(corpus, str(tmp_path / "out_tasks"),
                 RuntimeConfig(use_actor_pool=False))
    actors = _run(corpus, str(tmp_path / "out_actors"),
                  RuntimeConfig(use_actor_pool=True,
                                parse_concurrency=(1, 2)))
    pd.testing.assert_frame_equal(tasks, actors)
