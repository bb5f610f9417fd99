"""Deliberately (re-)freeze the packaged BPE merge table.

Trains the Sennrich merge loop (pipelines/text_analysis.train_bpe) over
the sf0.01 documents table and writes the ranked merges to
ragflow_core16_ray/data/bpe_merges.tsv — the frozen vocabulary behind
``ExtractConfig(token_counter="bpe")`` (functions/bpe_counter.py), the
reproducible-token-budget substitute for the reference's tiktoken
encoder (rag/utils/__init__.py:81-90; tiktoken ships frozen merge
tables the same way).

Usage:  python tools/freeze_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "ragflow_core16_ray", "data", "bpe_merges.tsv")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ragflow_core16_ray.pipelines.text_analysis import train_bpe

    merges = train_bpe(sf_dir, n_merges=n_merges)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("# rank\tleft\tright — frozen by tools/freeze_bpe.py "
                f"(sf={sf_dir}, n_merges={n_merges})\n")
        for left, right in zip(merges["left"], merges["right"]):
            f.write(f"{left}\t{right}\n")
    print(f"froze {len(merges)} merges → {OUT}")
    ray.shutdown()


if __name__ == "__main__":
    main()
