"""`ray job submit`-able corpus-cleaning job driver.

Runs the composed four-stage cleaning pipeline (PII redaction →
boilerplate line removal → duplicated-passage removal → Gopher filter +
exact dedup) over a documents.parquet corpus, resumable at stage
granularity (each stage publishes parquet + a manifest; a re-run skips
completed stages). Same launch contract as tools/extract_job.py:

    python tools/clean_job.py --input /root/testdata/sf0.01 --output /tmp/clean
    ray job submit --working-dir . -- python tools/clean_job.py \
        --input s3://corpus --output s3://clean
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="dir containing documents.parquet")
    p.add_argument("--output", required=True, help="output dir")
    p.add_argument("--boiler-max-df", type=int, default=3)
    p.add_argument("--passage-words", type=int, default=10)
    p.add_argument("--num-cpus", type=int, default=0,
                   help="local-mode CPU cap (0 = attach/auto)")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():  # the job entry point owns the session
        if args.num_cpus:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)
        else:
            ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                     include_dashboard=False)

    from ragflow_core16_ray.pipelines.clean import run_clean

    t0 = time.perf_counter()
    metrics = run_clean(args.input, args.output,
                        boiler_max_df=args.boiler_max_df,
                        passage_words=args.passage_words)
    metrics["job_wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
