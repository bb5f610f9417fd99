"""Benchmark driver.

Plain run: one JSON line with the headline metric (extraction pipeline
wall-time over the synthetic interleaved corpus sized for $GRAFT_SF_DIR)
plus per-query timings for the operator suite.

  GRAFT_SF_DIR=/root/testdata/sf0.1 RAY_GRAFT_CPUS=32 python bench.py

--scaling: run the headline pipeline in fresh processes at num_cpus=8 and
num_cpus=32 on the same (pre-generated, cache-warm) input and report both
throughputs + scaling efficiency — the sandbox evidence for the north
rule's N vs 4N cluster criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _init_ray(num_cpus: int):
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # Every map_groups branch returns typed frames and bucketed groupbys
    # repartition below the key count, but Ray's sort boundary SAMPLING can
    # still intermittently produce a group-less partition whose task yields
    # nothing — Ray then emits a schemaless empty block and this logger
    # warns. That residue is Ray-internal (ray#41693-style), benign, and
    # not reachable from UDF code, so silence just this logger here.
    import logging

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)


def _corpus(sf_dir: str) -> str:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as e

    return e._corpus_for(sf_dir)


def _consume(res) -> int:
    """Materialize a query result minimally; return row count."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.count()
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return 0


# queries timed in the per-query breakdown (a representative, bounded set;
# extract_spans is the headline and timed separately)
BENCH_QUERIES = [
    "token_counts", "quality_stats", "fingerprints", "top_words",
    "length_histogram", "stratified_sample", "top_bigrams", "term_weights",
    "exact_dedup", "jaccard_clusters", "minhash_lsh_pairs", "simhash_pairs",
    "emb_near_dup", "emb_topk", "emb_lsh_topk", "bm25_topk",
    "winnow_matches", "dup_passage_stats", "repetition_stats",
    "pii_scrub", "boilerplate_removal", "semantic_dedup",
    "dedup_passages", "gopher_filter", "bpe_token_counts",
    "incremental_dedup_bloom", "hybrid_topk",
    "funnel_stages", "rolling_active_users",
    "pricing_summary", "nation_revenue", "top_customers",
    "events_hourly", "events_sessions", "events_asof_orders",
    "nation_trade_volume", "returned_revenue", "big_orders",
    "market_share", "waiting_suppliers",
    "media_features", "media_collage", "chunk_docs",
    # round-4 session-2 additions: representative new shapes
    "nb_quality_scores", "embedding_gram", "image_dhash_dups",
    "substring_dup_spans", "source_leakage_matrix", "weighted_sample",
    "session_gap_sweep", "source_centroid_distances",
    # round-4 session-3 additions
    "warc_token_counts", "source_jaccard_matrix", "copurchase_pairs",
    "domain_quota_sample", "encoding_quality",
    # round-4 session-5 additions
    "copurchase_pagerank", "video_scene_cuts", "audio_vad_segments",
    "events_watermark_hourly",
    # round-5 additions: retrieval rewrite/rerank + graph enrichment
    "weighted_query_bm25_topk", "rerank_hybrid_topk", "entity_graph",
    "graph_communities", "raptor_tree", "chunk_vectors",
]


def run_bench(sf_dir: str, num_cpus: int, include_queries: bool = True) -> dict:
    _init_ray(num_cpus)
    import __ray_entry__ as e
    import ray.data as rd

    from ragflow_core16_ray.pipelines.extract import run_extract

    corpus = os.environ.get("GRAFT_BENCH_CORPUS") or _corpus(sf_dir)
    # warm the page cache so we measure compute+shuffle, not first disk read
    rd.read_parquet(corpus).count()
    # warm the worker pool on a small throwaway corpus so the timed run
    # measures steady-state compute, not each worker's one-time package
    # import (~1s/worker — amortized to nothing on a real long run). Sized
    # to spawn the full worker pool (batches >> cores) and to include a
    # few mega-docs so the pass-2 groupby codepath is also warm.
    from ragflow_core16_ray.sources.synth import write_corpus

    warm = "/tmp/graft_bench_warm_v2"
    if not os.path.exists(os.path.join(warm, "_DONE")):
        write_corpus(warm, n_docs=1024, seed=1, mega_every=300)
        open(os.path.join(warm, "_DONE"), "w").close()
    run_extract(warm, warm + "_out")

    # best-of-2: this VM's noisy-neighbor variance swings identical runs
    # ±35% (BASELINE.md); two timed reps in the same session cut the odds
    # of recording a contended-minute artifact while staying honest (both
    # reps are reported). The --scaling harness (GRAFT_BENCH_CORPUS set)
    # does its own best-of-reps over a 300× larger corpus — single rep
    # there.
    out_dir = corpus + "_bench_out"
    n_reps = 1 if os.environ.get("GRAFT_BENCH_CORPUS") else 2
    all_headline = []
    for rep in range(n_reps):
        t0 = time.perf_counter()
        run_metrics = run_extract(corpus, out_dir)
        all_headline.append(round(time.perf_counter() - t0, 3))
    headline = min(all_headline)
    n_docs = rd.read_parquet(os.path.join(out_dir, "docs")).count()

    per_query = {}
    if include_queries:
        from ragflow_core16_ray.stages.enrich import chunk_docs as _chunks

        qs = e.queries()
        # time chunk_docs over THIS run's extraction output (the query's
        # own helper would re-extract into its marker dir)
        qs = dict(qs, chunk_docs=lambda _sf: _chunks(
            os.path.join(out_dir, "docs")))
        for name in BENCH_QUERIES:
            t0 = time.perf_counter()
            n = _consume(qs[name](sf_dir))
            per_query[name] = round(time.perf_counter() - t0, 3)
            del n

    import ray

    ray.shutdown()
    return {
        "metric": "extract_pipeline_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "all_headline_sec": all_headline,
        "pass1_udf_cpu_sec": run_metrics.get("pass1_udf_cpu_sec"),
        "docs_per_sec": round(n_docs / headline, 2),
        "n_docs": n_docs,
        "queries": per_query,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """The N-vs-4N evidence run. Uses a dedicated LARGER corpus
    (GRAFT_SCALING_DOCS, default 200k docs; BASELINE.md numbers use 600k) so
    parse compute dominates the session-fixed costs (Ray startup, worker
    spawn, pass-2 setup ≈ 3s) — at the default bench size those fixed
    costs flatten the ratio and say nothing about the pipeline."""
    n_docs = int(os.environ.get("GRAFT_SCALING_DOCS", "200000"))
    from ragflow_core16_ray.sources.synth import CORPUS_VERSION

    # 256 output files: at 100 TB file count >> cores everywhere; a
    # 64-file layout artificially coarsens read blocks (→ ~4.6s map tasks,
    # only 8 waves at 32 cpus) and understates the high-parallelism level
    n_files = int(os.environ.get("GRAFT_SCALING_FILES", "256"))
    corpus = f"/tmp/graft_scaling_corpus_v{CORPUS_VERSION}f{n_files}_{n_docs}"
    marker = os.path.join(corpus, "_DONE")
    _init_ray(hi)
    if not os.path.exists(marker):
        from ragflow_core16_ray.sources.synth import write_corpus

        write_corpus(corpus, n_docs=n_docs, seed=42, mega_every=2500,
                     parallelism=n_files)
        open(marker, "w").close()
    import ray.data as rd

    rd.read_parquet(corpus).count()  # warm page cache (untimed)
    import ray

    ray.shutdown()

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_CORPUS=corpus, GRAFT_SF_DIR=sf_dir,
                   GRAFT_BENCH_HEADLINE_ONLY="1")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             capture_output=True, text=True, check=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)),
                             env=env)
        return json.loads(out.stdout.strip().splitlines()[-1])

    # this sandbox VM has noisy-neighbor CPU variance (±30% run-to-run on
    # identical work, drifting minute to minute); each timed run is PAIRED
    # with a pure-CPU spin probe at the same concurrency in the same time
    # window (tools/cpu_ceiling.py), giving a machine-relative work unit
    # t_pipeline / t_spin that divides out both the transient neighbor
    # load and the host's own lo→hi concurrency ceiling — the number a
    # real N→4N NODE cluster (ceiling ≈ 1.0) would show. Raw best-of-N
    # times and per-rep probes are all reported.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    from cpu_ceiling import per_proc_sec

    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        for ncpu, runs in ((lo, runs_lo), (hi, runs_hi)):
            spin = per_proc_sec(ncpu)
            r = one(ncpu)
            r["spin_sec"] = round(spin, 3)
            r["rel_work"] = round(r["value"] / spin, 2)
            runs.append(r)
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    w_lo = min(r["rel_work"] for r in runs_lo)
    w_hi = min(r["rel_work"] for r in runs_hi)
    ceiling_eff = min(r["spin_sec"] for r in runs_lo) / min(
        r["spin_sec"] for r in runs_hi)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "host_ceiling_efficiency": round(ceiling_eff, 3),
        "normalized_efficiency": round((w_lo / w_hi) / (hi / lo), 3),
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"all_sec_{lo}": [r["value"] for r in runs_lo],
        f"all_sec_{hi}": [r["value"] for r in runs_hi],
        f"all_spin_{lo}": [r["spin_sec"] for r in runs_lo],
        f"all_spin_{hi}": [r["spin_sec"] for r in runs_hi],
        f"all_rel_work_{lo}": [r["rel_work"] for r in runs_lo],
        f"all_rel_work_{hi}": [r["rel_work"] for r in runs_hi],
        # packing = UDF-busy core-seconds / (wall x cores): ~1.0 means the
        # streaming executor kept every core busy; the raw-efficiency gap
        # is then per-core UDF slowdown (shared memory bus), not idling
        f"udf_cpu_sec_{lo}": r_lo.get("pass1_udf_cpu_sec"),
        f"udf_cpu_sec_{hi}": r_hi.get("pass1_udf_cpu_sec"),
        f"packing_{lo}": round(r_lo["pass1_udf_cpu_sec"] / (t_lo * lo), 3)
        if r_lo.get("pass1_udf_cpu_sec") else None,
        f"packing_{hi}": round(r_hi["pass1_udf_cpu_sec"] / (t_hi * hi), 3)
        if r_hi.get("pass1_udf_cpu_sec") else None,
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        "n_docs": r_lo.get("n_docs"),
        "sf": sf_dir,
        "cpus": [lo, hi],
    }


if __name__ == "__main__":
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        headline_only = os.environ.get("GRAFT_BENCH_HEADLINE_ONLY") == "1"
        print(json.dumps(run_bench(sf_dir, num_cpus,
                                   include_queries=not headline_only)))
