"""Aggregation helpers: the combiner-tree pattern.

A bare ``groupby().aggregate()`` is a sort-based all-to-all shuffle with
multi-second fixed overhead per run (measured: 15-60s for a 95k-row
aggregate on this box, vs 1s for a tree combine). The scale-correct shape
for pre-aggregated partials is a combine TREE:

    map_batches(partial per batch)          # one row per key per batch
      → repartition(⌈blocks/fanout⌉) → combine within block
      → repartition(1) → final combine      # output must fit one task

The tree is exact for associative aggregates (sum/min/max/count). When
the final key cardinality does NOT fit a single task's memory (e.g.
per-document keys over 10^12 docs), use ``mode="bucket"``: a key-hash
bucket co-partition where each bucket combines its own keys — exact,
one small groupby shuffle (n_buckets keys), and each bucket group only
needs keyspace/n_buckets rows in memory (size ``n_buckets`` to
corpus/worker at scale). ``mode="shuffle"`` (Ray's native sort-based
groupby().aggregate()) computes the same thing but measured 40-90s on
~100k-distinct-key inputs on this box vs <1s for the bucket shape —
keep it only as the engine-native reference path.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

_AGGS = {"sum", "min", "max"}


def combine_partials(partials: rd.Dataset, keys: list[str],
                     spec: dict[str, str], mode: str = "tree",
                     fanout: int = 16, n_buckets: int = 32) -> rd.Dataset:
    """Combine pre-aggregated partial rows. ``spec``: value column →
    sum|min|max. Exact for associative aggregates."""
    bad = set(spec.values()) - _AGGS
    if bad:
        raise ValueError(f"unsupported aggs: {bad}")

    if mode == "bucket":
        import numpy as np

        def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
            h = np.zeros(len(batch), dtype="uint64")
            for c in keys:
                h = (h * np.uint64(1000003)
                     + pd.util.hash_pandas_object(
                         batch[c], index=False).to_numpy())
            batch = batch.copy()
            batch["__bucket"] = (h % np.uint64(n_buckets)).astype("int64")
            return batch

        def combine_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return (g.drop(columns="__bucket")
                    .groupby(keys, sort=False).agg(spec).reset_index())

        return (partials
                .map_batches(add_bucket, batch_format="pandas")
                .groupby("__bucket")
                .map_groups(combine_bucket, batch_format="pandas"))

    if mode == "shuffle":
        from ray.data.aggregate import Max, Min, Sum

        ctors = {"sum": Sum, "min": Min, "max": Max}
        aggs = [ctors[a](c, alias_name=c) for c, a in spec.items()]
        return partials.groupby(keys).aggregate(*aggs)

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        if batch.empty:
            return batch
        g = batch.groupby(keys, sort=False).agg(spec)
        return g.reset_index()

    # two-level tree: a parallel mid-level combine bounds what the final
    # single-task combine ingests (block count is dynamic during streaming
    # execution, so the mid width is a constant, not derived from it)
    ds = partials
    if fanout > 1:
        ds = ds.repartition(min(fanout, 8)).map_batches(
            combine, batch_format="pandas", batch_size=None)
    return ds.repartition(1).map_batches(
        combine, batch_format="pandas", batch_size=None)


def local_topk(ds: rd.Dataset, by: list[str], ascending: list[bool],
               k: int) -> pd.DataFrame:
    """Global top-k without a distributed sort: per-block top-k partials,
    final merge on the (tiny) collected result."""

    def part(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(by, ascending=ascending).head(k)

    df = ds.map_batches(part, batch_format="pandas",
                        batch_size=None).to_pandas()
    return df.sort_values(by, ascending=ascending).head(k).reset_index(drop=True)
