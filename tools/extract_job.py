"""`ray job submit`-able extraction job driver.

The north-rule launch path: the same driver runs unchanged on a laptop
(`python tools/extract_job.py ...`) and on a fixed-size multi-node cluster
(`ray job submit --working-dir . -- python tools/extract_job.py ...`) —
`ray.init(address="auto")` attaches to whatever cluster the job runs on.
Resumable: partitioned output + per-partition lineage manifests mean a
re-submitted job skips completed partitions (state/lineage.py).

Examples:
    # synthesize a corpus, then extract it with resume enabled
    python tools/extract_job.py --synth 10000 --input /tmp/corpus \
        --output /tmp/out --partitions 16
    ray job submit -- python tools/extract_job.py --input s3://corpus \
        --output s3://out --partitions 4096
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
    p.add_argument("--input", required=True, help="corpus dir (parquet)")
    p.add_argument("--output", required=True, help="output dir")
    p.add_argument("--partitions", type=int, default=0,
                   help="lineage partitions (0 = one per input fragment)")
    p.add_argument("--synth", type=int, default=0, metavar="N_DOCS",
                   help="first synthesize an N_DOCS corpus at --input")
    p.add_argument("--template", default=None,
                   help="force a chunk template (parser_id override)")
    p.add_argument("--chunk-tokens", type=int, default=128)
    p.add_argument("--html4excel", action="store_true")
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

    from ragflow_core16_ray.config import ExtractConfig
    from ragflow_core16_ray.state.lineage import run_partitioned

    if args.synth:
        from ragflow_core16_ray.sources.synth import write_corpus

        if not os.path.exists(os.path.join(args.input, "_DONE")):
            write_corpus(args.input, n_docs=args.synth, seed=42,
                         parallelism=max(args.partitions, 1))
            open(os.path.join(args.input, "_DONE"), "w").close()

    cfg = ExtractConfig(chunk_token_num=args.chunk_tokens,
                        template_override=args.template,
                        html4excel=args.html4excel)
    t0 = time.perf_counter()
    metrics = run_partitioned(args.input, args.output, cfg,
                              n_partitions=args.partitions)
    metrics["job_wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
