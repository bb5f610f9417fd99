"""Relational primitives over the TPC-H-ish testdata tables.

The reference has no relational operators (SURVEY.md §2.4), but the engine
needs them (dedup groupbys, broadcast lookups, windowed event aggregation),
so these pipelines demonstrate each primitive in its scale-correct shape:

- pricing_summary: filter → per-batch partial aggregation (combiner) →
  small groupby — the shuffle moves one row per (flag,status) per batch.
- nation_revenue: two broadcast hash joins (customer, nation dims via
  ray.put) — no shuffle join anywhere.
- top_customers: partial groupby + global top-k by sort/limit.
- events_hourly: tumbling-window aggregate via integer epoch-hour keys.
- events_sessions: 30-min-gap sessionization per user inside
  groupby(user_id).map_groups over ts-sorted groups (the streaming-shaped
  pattern from the Ray guide).

Money sums are rounded to 2 decimals at the end so oracle hashes are
stable.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ..stages.agg import combine_partials


def _t(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns)


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped: per (l_returnflag, l_linestatus) sums/counts over
    lineitem shipped before 1998-09-03.

    Money/quantity inputs are 2-decimal-structured doubles; a distributed
    double sum is order-dependent and lands exactly on half-cent rounding
    boundaries, so sums are done in exact integer cents (quantity ×100,
    price ×100, discounted price in 10^-4 dollar units). Integer sums are
    associative — bit-equal to the oracle regardless of partitioning."""
    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native partial: zero-copy from the object store, pyarrow
        # compute kernels end-to-end (pc.round is half-to-even, same as
        # the np.rint the oracle contract was written against)
        b = batch.filter(
            pc.less(batch["l_shipdate"],
                    pa.scalar(pd.Timestamp("1998-09-03"))))
        i64 = pa.int64()
        qty_c = pc.cast(pc.round(pc.multiply(b["l_quantity"], 100.0)), i64)
        price_c = pc.cast(
            pc.round(pc.multiply(b["l_extendedprice"], 100.0)), i64)
        disc_c = pc.cast(pc.round(pc.multiply(b["l_discount"], 100.0)), i64)
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty_c": qty_c,
            "sum_base_price_c": price_c,
            "sum_disc_price_u": pc.multiply(
                price_c, pc.subtract(pa.scalar(100, type=i64), disc_c)),
        })
        g = t.group_by(["l_returnflag", "l_linestatus"],
                       use_threads=False).aggregate(
            [("sum_qty_c", "sum"), ("sum_base_price_c", "sum"),
             ("sum_disc_price_u", "sum"), ([], "count_all")])
        return g.rename_columns(["l_returnflag", "l_linestatus",
                                 "sum_qty_c", "sum_base_price_c",
                                 "sum_disc_price_u", "n_rows"])

    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount", "l_shipdate"]).map_batches(
        partial, batch_format="pyarrow")
    df = combine_partials(ds, ["l_returnflag", "l_linestatus"],
                          {"sum_qty_c": "sum", "sum_base_price_c": "sum",
                           "sum_disc_price_u": "sum", "n_rows": "sum"}
                          ).to_pandas()
    for c in ("sum_qty_c", "sum_base_price_c", "sum_disc_price_u", "n_rows"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def nation_revenue(sf_dir: str) -> pd.DataFrame:
    """Total order revenue per nation name: orders ⋈ customer ⋈ nation with
    both dims broadcast (ray.put once, dict lookup per batch)."""
    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    # broadcast as SORTED numpy arrays: the per-batch lookup is one
    # vectorized searchsorted + two fancy-index gathers, no Python dict
    order = np.argsort(cust["c_custkey"].values)
    ck_sorted = cust["c_custkey"].values[order]
    cust_nk = cust["c_nationkey"].values[order]
    nat_names = np.empty(int(nat["n_nationkey"].max()) + 1, dtype=object)
    nat_names[nat["n_nationkey"].values] = nat["n_name"].values
    ref = ray.put((ck_sorted, cust_nk, nat_names))

    def partial(batch: pa.Table) -> pa.Table:
        cks, cnk, names = ray.get(ref)
        custkey = batch["o_custkey"].to_numpy(zero_copy_only=False)
        name = names[cnk[np.searchsorted(cks, custkey)]]
        cents = pc.cast(pc.round(
            pc.multiply(batch["o_totalprice"], 100.0)), pa.int64())
        t = pa.table({"n_name": pa.array(name, type=pa.string()),
                      "revenue_c": cents})
        g = t.group_by(["n_name"], use_threads=False).aggregate(
            [("revenue_c", "sum"), ([], "count_all")])
        return g.rename_columns(["n_name", "revenue_c", "n_orders"])

    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow")
    df = combine_partials(ds, ["n_name"], {"revenue_c": "sum",
                                           "n_orders": "sum"}).to_pandas()
    df["revenue_c"] = df["revenue_c"].astype("int64")
    df["n_orders"] = df["n_orders"].astype("int64")
    return df.sort_values("n_name").reset_index(drop=True)


def top_customers(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k customers by total order value (partial combiner → groupby →
    sort/limit; ties broken by custkey)."""

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(
            pc.multiply(batch["o_totalprice"], 100.0)), pa.int64())
        t = pa.table({"o_custkey": batch["o_custkey"], "total_c": cents})
        g = t.group_by(["o_custkey"], use_threads=False).aggregate(
            [("total_c", "sum")])
        return g.rename_columns(["o_custkey", "total_c"])

    ds = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow")
    df = combine_partials(ds, ["o_custkey"], {"total_c": "sum"}).to_pandas()
    top = (df.sort_values(["total_c", "o_custkey"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    top["total_c"] = top["total_c"].astype("int64")
    return top


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour windows per user: event count + rounded value sum.
    Window key = integer epoch hour (timezone-free, hash-stable)."""

    def partial(batch: pa.Table) -> pa.Table:
        # µs-resolution timestamps → epoch seconds → hour index (must match
        # the oracle's floor(epoch(ts)/3600) exactly; epochs are positive
        # so Arrow's truncating int division == floor)
        micros = pc.cast(batch["ts"], pa.int64())  # timestamp[us] → µs
        hour = pc.divide(micros, pa.scalar(3_600_000_000, type=pa.int64()))
        # value summed in cent-rounded integer units: associative, so the
        # distributed sum hashes identically to the oracle's
        val_c = pc.cast(pc.round(
            pc.multiply(batch["value"], 100.0)), pa.int64())
        t = pa.table({"user_id": batch["user_id"], "hour_epoch": hour,
                      "sum_value_c": val_c})
        g = t.group_by(["user_id", "hour_epoch"],
                       use_threads=False).aggregate(
            [("sum_value_c", "sum"), ([], "count_all")])
        return g.rename_columns(["user_id", "hour_epoch",
                                 "sum_value_c", "n_events"])

    ds = _t(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow")
    return combine_partials(ds, ["user_id", "hour_epoch"],
                            {"sum_value_c": "sum", "n_events": "sum"})


def event_props_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured extraction at scale: parse each event's JSON
    ``props`` payload inside the batch UDF and aggregate the extracted
    field per event_type — (event_type, n, sum_k). The JSON never leaves
    the worker that read it (extract-then-aggregate, the only shape that
    works when the raw payload is the bulk of the bytes); integer sums
    through the combiner tree hash bit-equal to DuckDB's json_extract
    oracle. Malformed/missing payloads count as k=0 (same rule as the
    oracle's COALESCE)."""
    import json

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ks = []
        for p in batch["props"]:
            try:
                v = json.loads(p).get("k", 0)
                ks.append(int(v) if isinstance(v, (int, float)) else 0)
            except (TypeError, ValueError):
                ks.append(0)
        g = pd.DataFrame({"event_type": batch["event_type"].values,
                          "sum_k": pd.array(ks, dtype="int64"),
                          "n": 1}).groupby("event_type", sort=False).sum()
        return g.reset_index()

    ds = _t(sf_dir, "events", ["event_type", "props"]).map_batches(
        partial, batch_format="pandas")
    return combine_partials(ds, ["event_type"], {"n": "sum", "sum_k": "sum"})


def events_asof_orders(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """As-of join (an operator Ray Data lacks): each event is matched to
    the same customer's most recent order at event time
    (max o_orderdate <= ts; date ties broken by max o_orderkey, making the
    result deterministic).

    Scale shape: both sides are large at 100 TB, so neither is broadcast.
    Each side is projected to a common narrow schema, tagged with a COARSE
    bucket (hash(key) % n_buckets), unioned, and co-partitioned with ONE
    hash shuffle — ``groupby(bucket)`` — then each bucket group is merged
    in one vectorized ``pd.merge_asof(by=key)`` call. Bucketing (instead
    of grouping by raw key) keeps the group count at n_buckets, not
    n_keys: per-group overhead is what kills fine-grained map_groups.
    Size n_buckets ≈ a few × cluster cores; hot keys are leveled because a
    bucket holds many keys, and a single pathological key would be salted
    on the event side with its orders replicated per salt."""

    def _prep_events(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch["user_id"].values
        return pd.DataFrame({
            "bucket": key % np.int64(n_buckets),
            "key": key,
            "t_us": batch["ts"].astype("datetime64[us]").astype("int64"),
            "event_id": batch["event_id"].values,
            "o_orderkey": np.int64(-1),
            "side": np.int8(0),
        })

    def _prep_orders(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch["o_custkey"].values
        return pd.DataFrame({
            "bucket": key % np.int64(n_buckets),
            "key": key,
            "t_us": batch["o_orderdate"].astype("datetime64[us]").astype("int64"),
            "event_id": np.int64(-1),
            "o_orderkey": batch["o_orderkey"].values,
            "side": np.int8(1),
        })

    ev = _t(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        _prep_events, batch_format="pandas")
    od = _t(sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        _prep_orders, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0].sort_values("t_us", kind="stable")
        # (t_us, orderkey)-sorted: merge_asof takes the LAST right row at
        # an equal timestamp, so date ties resolve to the max orderkey
        o = (g[g["side"] == 1]
             .sort_values(["t_us", "o_orderkey"], kind="stable")
             [["key", "t_us", "o_orderkey"]]
             .rename(columns={"o_orderkey": "match_key"}))
        if e.empty or o.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "o_orderkey": pd.Series([], dtype="int64")})
        m = pd.merge_asof(e[["key", "t_us", "event_id"]], o,
                          on="t_us", by="key", direction="backward")
        m = m.dropna(subset=["match_key"])
        return pd.DataFrame({
            "event_id": m["event_id"].values,
            "o_orderkey": m["match_key"].values.astype("int64"),
        })

    # repartition below the bucket count so every sort partition holds ≥1
    # group — a partition with none yields no batches and Ray then emits a
    # schemaless empty block (the PandasBlockSchema(names=[]) warning)
    return (ev.union(od).repartition(max(1, n_buckets // 4)).groupby("bucket")
            .map_groups(merge, batch_format="pandas"))


def events_window_orders(sf_dir: str, days: int = 7,
                         n_buckets: int = 64) -> rd.Dataset:
    """Range join (Ray Data lacks one): per event, how many of the same
    customer's orders fall in the window (ts - days, ts].

    Same co-partitioning shape as the as-of join: one hash shuffle on a
    coarse bucket, then vectorized merging per bucket. The interval count
    is two as-of lookups against a per-key running order count —
    count(<= ts) - count(<= ts - days) — so the whole bucket resolves in
    two pd.merge_asof calls, no per-key loop."""
    win_us = np.int64(days) * 86_400_000_000

    def _prep_events(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch["user_id"].values
        return pd.DataFrame({
            "bucket": key % np.int64(n_buckets),
            "key": key,
            "t_us": batch["ts"].astype("datetime64[us]").astype("int64"),
            "event_id": batch["event_id"].values,
            "side": np.int8(0),
        })

    def _prep_orders(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch["o_custkey"].values
        return pd.DataFrame({
            "bucket": key % np.int64(n_buckets),
            "key": key,
            "t_us": batch["o_orderdate"].astype("datetime64[us]").astype("int64"),
            "event_id": np.int64(-1),
            "side": np.int8(1),
        })

    ev = _t(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        _prep_events, batch_format="pandas")
    od = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        _prep_orders, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0].sort_values("t_us", kind="stable")
        o = g[g["side"] == 1].sort_values("t_us", kind="stable")[["key", "t_us"]]
        if e.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_orders": pd.Series([], dtype="int64")})
        if o.empty:
            return pd.DataFrame({"event_id": e["event_id"].values,
                                 "n_orders": np.zeros(len(e), dtype="int64")})
        o = o.assign(cum=o.groupby("key").cumcount() + 1)
        left = e[["key", "t_us", "event_id"]]

        def count_upto(ts_vals: np.ndarray) -> np.ndarray:
            probe = left.assign(t_us=ts_vals).sort_values("t_us", kind="stable")
            m = pd.merge_asof(probe, o, on="t_us", by="key",
                              direction="backward")
            return (m.set_index("event_id")["cum"]
                    .reindex(left["event_id"]).fillna(0).values)

        hi = count_upto(left["t_us"].values)
        lo = count_upto(left["t_us"].values - win_us)
        return pd.DataFrame({"event_id": left["event_id"].values,
                             "n_orders": (hi - lo).astype("int64")})

    # see events_asof_orders: keep sort partitions ≤ bucket count / 4 so
    # none comes up group-less (→ schemaless empty block warning)
    return (ev.union(od).repartition(max(1, n_buckets // 4)).groupby("bucket")
            .map_groups(merge, batch_format="pandas"))


def events_sessions(sf_dir: str, gap_minutes: int = 30,
                    n_buckets: int = 64) -> rd.Dataset:
    """Per-user sessionization: a new session starts after a >gap silence.

    Grouped by a coarse user-hash bucket (not raw user_id): one
    map_groups call per bucket, with ALL users in the bucket sessionized
    in a single vectorized pass (sort by (user, ts); a session boundary is
    a user change or a >gap delta) — per-group Python overhead is what
    kills fine-grained map_groups when the key domain is the user base."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["bucket"] = batch["user_id"] % np.int64(n_buckets)
        return batch

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        new_s = (new_user | (g["ts"].diff() > gap)).astype("int64")
        out = (pd.DataFrame({"user_id": g["user_id"].values,
                             "n_events": 1, "n_sessions": new_s.values})
               .groupby("user_id", sort=False).sum().reset_index())
        return out

    return (_t(sf_dir, "events", ["user_id", "ts"])
            .map_batches(add_bucket, batch_format="pandas")
            .repartition(max(1, n_buckets // 4))
            .groupby("bucket").map_groups(sessions, batch_format="pandas"))


def funnel_stages(sf_dir: str,
                  stages: tuple = ("view", "click", "purchase"),
                  n_buckets: int = 64) -> rd.Dataset:
    """Behavioral funnel over the event stream: per user, the FIRST time
    each stage is reached in order (stage k+1 counts only at/after the
    user's stage-k first-reach time) plus the depth reached. The product
    -analytics query every event pipeline grows; all users appear, with
    -1 sentinel times for unreached stages so the output is pure int64
    and the DuckDB oracle (chained min-after joins) hashes strictly.

    Shape: same coarse user-bucket co-partition as events_sessions — one
    shuffle, then each bucket resolves ALL its users with vectorized
    pandas passes (per-stage filter → clip to the previous stage's reach
    time → groupby-min); nothing per-user in Python, nothing
    driver-side."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "bucket": (batch["user_id"] % np.int64(n_buckets)),
            "user_id": batch["user_id"].values,
            "event_type": batch["event_type"].values,
            "t": batch["ts"].astype("int64").values})  # epoch micros
        return out

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.Index(g["user_id"].unique()).sort_values()
        reach = []  # per-stage Series of first-reach times (index: user)
        prev = None
        for st in stages:
            ev = g[g["event_type"] == st]
            if prev is not None:
                lim = prev.reindex(ev["user_id"])
                ev = ev[(lim.notna().values
                         & (ev["t"].values >= lim.fillna(0).values))]
            cur = ev.groupby("user_id")["t"].min()
            reach.append(cur)
            prev = cur
        out = pd.DataFrame({"user_id": users.astype("int64")})
        n_reached = np.zeros(len(users), dtype="int64")
        for st, cur in zip(stages, reach):
            col = cur.reindex(users)
            n_reached += col.notna().to_numpy()
            out[f"t_{st}"] = col.fillna(-1).astype("int64").to_numpy()
        out.insert(1, "n_reached", n_reached)
        return out

    return (_t(sf_dir, "events", ["user_id", "ts", "event_type"])
            .map_batches(add_bucket, batch_format="pandas")
            .repartition(max(1, n_buckets // 4))
            .groupby("bucket").map_groups(funnel, batch_format="pandas"))


def event_transitions(sf_dir: str, n_buckets: int = 64) -> pd.DataFrame:
    """Global event-type transition counts (the Markov bigram table of
    the event stream): for each user's events ordered by (ts, event_id),
    count every consecutive (prev_type, next_type) pair. Feeds
    next-event models and anomaly baselines; the deterministic
    (ts, event_id) order makes the count exact and rerun-stable even
    under equal timestamps.

    Shape: user-bucket co-partition (one shuffle); each bucket sorts
    once and counts ALL its users' transitions vectorized (shift +
    user-change mask + value_counts); tiny (prev, next, n) partials then
    sum through the combiner tree. Output sorted by (prev_type,
    next_type)."""
    from ..stages.agg import combine_partials

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["user_id"] % np.int64(n_buckets)),
            "user_id": batch["user_id"].values,
            "event_id": batch["event_id"].values,
            "event_type": batch["event_type"].values,
            "ts": batch["ts"].values})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        same_user = g["user_id"].eq(g["user_id"].shift())
        prev = g["event_type"].shift()
        vc = (pd.DataFrame({"prev_type": prev[same_user],
                            "next_type": g["event_type"][same_user]})
              .value_counts())
        out = vc.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    df = combine_partials(
        _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
        .map_batches(add_bucket, batch_format="pandas")
        .repartition(max(1, n_buckets // 4))
        .groupby("bucket").map_groups(pairs, batch_format="pandas"),
        ["prev_type", "next_type"], {"n": "sum"}).to_pandas()
    df["n"] = df["n"].astype("int64")
    return (df.sort_values(["prev_type", "next_type"])
            .reset_index(drop=True))


def cohort_retention(sf_dir: str, n_buckets: int = 64) -> pd.DataFrame:
    """Cohort retention table: users cohort by the UTC day of their
    first event; for every (cohort_day, day_offset) cell, the number of
    distinct users active that many days after joining — the
    product-analytics retention matrix.

    Shape: the user-bucket co-partition makes distinct-user counting
    EXACT with no second shuffle — each user's events land in one
    bucket, so per-bucket (cohort, offset, n) partials are disjoint in
    users and sum through the combiner tree. Days are int64 epoch days
    (epoch micros // 86400e6), matching DuckDB's integer division for a
    hash-strict oracle."""
    from ..stages.agg import combine_partials

    US_PER_DAY = 86_400_000_000

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["user_id"] % np.int64(n_buckets)),
            "user_id": batch["user_id"].values,
            "day": batch["ts"].astype("int64").values // US_PER_DAY})

    def cells(g: pd.DataFrame) -> pd.DataFrame:
        ud = g[["user_id", "day"]].drop_duplicates()
        first = ud.groupby("user_id")["day"].transform("min")
        cell = (pd.DataFrame({"cohort_day": first.values,
                              "day_offset": ud["day"].values - first.values})
                .value_counts().reset_index(name="n"))
        cell["n"] = cell["n"].astype("int64")
        return cell

    df = combine_partials(
        _t(sf_dir, "events", ["user_id", "ts"])
        .map_batches(add_bucket, batch_format="pandas")
        .repartition(max(1, n_buckets // 4))
        .groupby("bucket").map_groups(cells, batch_format="pandas"),
        ["cohort_day", "day_offset"], {"n": "sum"}).to_pandas()
    df = df.rename(columns={"n": "n_users"})
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return (df.sort_values(["cohort_day", "day_offset"])
            .reset_index(drop=True))


def events_hopping(sf_dir: str, window_min: int = 60,
                   hop_min: int = 15) -> pd.DataFrame:
    """HOPPING-window event counts (window size W, hop H, W = k·H):
    every event lands in exactly W/H overlapping windows, so this is the
    fan-out shape tumbling windows (events_hourly) never exercise —
    explode each event to its window starts IN the batch UDF (numpy
    broadcast, no shuffle growth beyond the k× partial rows), then sum
    (window_start, event_type) partials through the combiner tree.
    Window starts are integer epoch seconds; with W = k·H the window
    set per event is exactly {H·(t//H − j) | j < k} with no edge
    conditions, which the SQL oracle reproduces with unnest(range(k))."""
    from ..stages.agg import combine_partials

    if window_min % hop_min:
        raise ValueError("window must be a multiple of the hop")
    W = window_min * 60 * 1_000_000
    H = hop_min * 60 * 1_000_000
    k = W // H

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["ts"].astype("int64").to_numpy()
        starts = (t[:, None] // H - np.arange(k)[None, :]) * H
        cells = (pd.DataFrame({
            "window_start": (starts // 1_000_000).ravel(),
            "event_type": np.repeat(batch["event_type"].to_numpy(), k)})
            .value_counts().reset_index(name="n"))
        cells["n"] = cells["n"].astype("int64")
        return cells

    df = combine_partials(
        _t(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pandas"),
        ["window_start", "event_type"], {"n": "sum"}).to_pandas()
    df["n"] = df["n"].astype("int64")
    df["window_start"] = df["window_start"].astype("int64")
    return (df.sort_values(["window_start", "event_type"])
            .reset_index(drop=True))


def top_users_by_type(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Grouped top-k: for every event_type, the k most active users by
    event count (ties to the smaller user_id). The scale shape is
    partial-count pushdown: per-batch (event_type, user_id, n) partials
    — the shuffle moves count rows bounded by distinct (type, user)
    pairs per batch, never events — then one combiner-tree sum and a
    per-type head on the tiny merged table. The driver-side head is
    k×types rows; the full ranked table never materializes anywhere."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = (batch[["event_type", "user_id"]]
              .value_counts().reset_index(name="n"))
        vc["n"] = vc["n"].astype("int64")
        return vc

    df = combine_partials(
        _t(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(partial, batch_format="pandas"),
        ["event_type", "user_id"], {"n": "sum"}).to_pandas()
    df["n"] = df["n"].astype("int64")
    df["user_id"] = df["user_id"].astype("int64")
    out = (df.sort_values(["event_type", "n", "user_id"],
                          ascending=[True, False, True], kind="stable")
           .groupby("event_type", sort=True).head(k)
           .reset_index(drop=True))
    return out


def hourly_active_users(sf_dir: str) -> pd.DataFrame:
    """Exact distinct users per hour — the canonical TWO-STAGE
    COUNT(DISTINCT) shape: stage 1 dedups (hour, user) pairs with a
    combiner-tree groupby (the shuffle carries distinct pairs, already
    batch-deduped, never events); stage 2 re-partials the deduped pairs
    to (hour, 1) counts and runs a second combiner pass — so neither
    the raw events nor the full distinct-pair table ever lands on one
    node or the driver. (Contrast cohort_retention and
    rolling_active_users, which sidestep the second stage via
    user-bucket disjointness — measured ~7× cheaper at toy scale
    because the fine-grained hash aggregate pays per-group overhead;
    this form is kept as the GENERAL one for when no component of the
    distinct key co-partitions the data.)"""
    from ..stages.agg import combine_partials

    US_PER_HOUR = 3_600_000_000

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "hour": batch["ts"].astype("int64").values // US_PER_HOUR,
            "user_id": batch["user_id"].values}).drop_duplicates()
        out["one"] = pd.array([1] * len(out), dtype="int64")
        return out

    deduped = combine_partials(
        _t(sf_dir, "events", ["ts", "user_id"])
        .map_batches(pairs, batch_format="pandas"),
        ["hour", "user_id"], {"one": "min"}, mode="bucket")

    def recount(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("hour", sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g[["hour", "n"]]

    df = combine_partials(
        deduped.map_batches(recount, batch_format="pandas"),
        ["hour"], {"n": "sum"}).to_pandas()
    df["hour"] = df["hour"].astype("int64")
    df["n"] = df["n"].astype("int64")
    return df.sort_values("hour").reset_index(drop=True)


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-06-01", k: int = 10,
                      n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q3-shaped shipping priority: top-k unshipped orders of one
    market segment by outstanding discounted revenue. Three joins,
    each in its scale shape: the SEGMENT customer set broadcasts
    (dimension, ray.put once); LINEITEM pre-aggregates revenue per
    orderkey inside each batch (the combiner move — the shuffle carries
    (orderkey, revenue) partials, never line items); ORDERS filter rows
    and revenue partials then co-partition by an orderkey bucket for
    the fact-fact join, with each bucket emitting only its local top-k
    — the driver merges ≤ k·buckets rows. Money is the repo's exact
    integer convention (cents × (100 − discount_c), 10⁻⁴ dollars)."""
    from ..stages.agg import combine_partials  # noqa: F401 (doc pointer)

    cut_us = int(pd.Timestamp(cutoff).value // 1000)
    US_PER_DAY = 86_400_000_000

    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    seg_ref = ray.put(frozenset(
        cust.loc[cust["c_mktsegment"] == segment, "c_custkey"]))

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        seg = ray.get(seg_ref)
        t = batch["o_orderdate"].astype("int64")
        m = (t < cut_us) & batch["o_custkey"].isin(seg)
        b = batch[m]
        return pd.DataFrame({
            "bucket": (b["o_orderkey"] % np.int64(n_buckets)),
            "okey": b["o_orderkey"].astype("int64").values,
            "o_day": (t[m] // US_PER_DAY).values,
            "revenue_u": pd.array([0] * len(b), dtype="int64"),
            "is_order": pd.array([True] * len(b), dtype="bool")})

    def rev_partials(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["l_shipdate"].astype("int64") > cut_us
        b = batch[m]
        price_c = np.rint(b["l_extendedprice"].values * 100).astype("int64")
        disc_c = np.rint(b["l_discount"].values * 100).astype("int64")
        g = (pd.DataFrame({"okey": b["l_orderkey"].values,
                           "revenue_u": price_c * (100 - disc_c)})
             .groupby("okey", sort=False).sum().reset_index())
        return pd.DataFrame({
            "bucket": (g["okey"] % n_buckets).astype("int64"),
            "okey": g["okey"].astype("int64"),
            "o_day": pd.array([0] * len(g), dtype="int64"),
            "revenue_u": g["revenue_u"].astype("int64"),
            "is_order": pd.array([False] * len(g), dtype="bool")})

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        rev = (g[~g["is_order"]].groupby("okey", sort=False)["revenue_u"]
               .sum())
        o = g[g["is_order"]]
        out = pd.DataFrame({
            "o_orderkey": o["okey"].values,
            "o_day": o["o_day"].values,
            "revenue_u": rev.reindex(o["okey"]).fillna(-1).values})
        out = out[out["revenue_u"] >= 0]
        out["revenue_u"] = out["revenue_u"].astype("int64")
        return (out.sort_values(["revenue_u", "o_orderkey"],
                                ascending=[False, True]).head(k))

    orders = (_t(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"])
              .map_batches(order_rows, batch_format="pandas"))
    revs = (_t(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_shipdate"])
            .map_batches(rev_partials, batch_format="pandas"))
    merged = (orders.union(revs)
              .repartition(max(1, n_buckets // 4))
              .groupby("bucket").map_groups(local_topk,
                                            batch_format="pandas")
              ).to_pandas()
    for c in merged.columns:
        merged[c] = merged[c].astype("int64")
    return (merged.sort_values(["revenue_u", "o_orderkey"],
                               ascending=[False, True])
            .head(k).reset_index(drop=True))


def region_supplier_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue and active-supplier count per REGION (Q5-flavored over
    the supplier arm): lineitem pre-aggregates discounted revenue per
    suppkey inside each batch; the combiner tree merges the
    supplier-sized partial table; the supplier→nation→region dimension
    chain resolves on that dimension-sized rollup DRIVER-side (no
    broadcast needed — the workers only ever see suppkeys).
    Distinct-supplier counts are exact because the final rollup runs on
    the per-supplier table (one row per supplier), which is
    dimension-sized by construction."""
    from ..stages.agg import combine_partials

    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    reg = _t(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    s2n = dict(zip(sup["s_suppkey"], sup["s_nationkey"]))
    n2r = dict(zip(nat["n_nationkey"], nat["n_regionkey"]))
    r2n = dict(zip(reg["r_regionkey"], reg["r_name"]))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        price_c = np.rint(batch["l_extendedprice"].values
                          * 100).astype("int64")
        disc_c = np.rint(batch["l_discount"].values * 100).astype("int64")
        g = (pd.DataFrame({"s_suppkey": batch["l_suppkey"].values,
                           "revenue_u": price_c * (100 - disc_c)})
             .groupby("s_suppkey", sort=False).sum().reset_index())
        return g

    per_sup = combine_partials(
        _t(sf_dir, "lineitem",
           ["l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pandas"),
        ["s_suppkey"], {"revenue_u": "sum"}).to_pandas()

    per_sup["r_name"] = (per_sup["s_suppkey"].map(s2n).map(n2r).map(r2n))
    out = (per_sup.groupby("r_name")
           .agg(revenue_u=("revenue_u", "sum"),
                n_suppliers=("s_suppkey", "size")).reset_index())
    out["revenue_u"] = out["revenue_u"].astype("int64")
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return out.sort_values("r_name").reset_index(drop=True)


def promo_revenue(sf_dir: str) -> pd.DataFrame:
    """Q14-flavored promo share: discounted revenue of PROMO-type parts
    vs all parts, as two exact int64 sums (the float percentage is a
    caller division — exact integers are what hash-compares). The part
    type map broadcasts once; lineitem streams through a single partial
    pass and the two-cell combiner."""
    from ..stages.agg import combine_partials

    part = _t(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo_ref = ray.put(frozenset(
        part.loc[part["p_type"] == "PROMO", "p_partkey"]))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        promo = ray.get(promo_ref)
        price_c = np.rint(batch["l_extendedprice"].values
                          * 100).astype("int64")
        disc_c = np.rint(batch["l_discount"].values * 100).astype("int64")
        rev = price_c * (100 - disc_c)
        is_promo = batch["l_partkey"].isin(promo).to_numpy()
        return pd.DataFrame({
            "k": pd.array([0], dtype="int64"),
            "promo_revenue_u": pd.array([int(rev[is_promo].sum())],
                                        dtype="int64"),
            "total_revenue_u": pd.array([int(rev.sum())], dtype="int64")})

    df = combine_partials(
        _t(sf_dir, "lineitem",
           ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pandas"),
        ["k"], {"promo_revenue_u": "sum",
                "total_revenue_u": "sum"}).to_pandas()
    return (df[["promo_revenue_u", "total_revenue_u"]]
            .astype("int64").reset_index(drop=True))


def rolling_active_users(sf_dir: str, window_hours: int = 24,
                         hop_hours: int = 1) -> pd.DataFrame:
    """Exact SLIDING-window distinct users (24 h window hopping hourly —
    the rolling-DAU series): each event fans out in-batch to its W/H
    window starts (the events_hopping move), then the batch-deduped
    (window, user) pairs co-partition by a USER bucket — all copies of
    a pair share a user, so per-bucket dedup is globally exact (the
    cohort_retention disjointness move: one bounded coarse shuffle
    instead of a fine-grained hash aggregate over windows×users
    groups, which measured 9× slower here) — and the per-bucket
    (window, count) partials sum through the combiner tree. Nothing
    driver-side but the final series; window starts are int64 epoch
    hours."""
    from ..stages.agg import combine_partials

    if window_hours % hop_hours:
        raise ValueError("window must be a multiple of the hop")
    US_PER_HOP = hop_hours * 3_600_000_000
    k = window_hours // hop_hours
    n_buckets = 32

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["ts"].astype("int64").to_numpy()
        starts = (t[:, None] // US_PER_HOP - np.arange(k)[None, :])
        out = pd.DataFrame({
            "window_hour": (starts * hop_hours).ravel(),
            "user_id": np.repeat(batch["user_id"].to_numpy(), k),
        }).drop_duplicates()
        out["bucket"] = (out["user_id"] % n_buckets).astype("int64")
        return out

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["window_hour", "user_id"]].drop_duplicates()
        out = (d.groupby("window_hour", sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out[["window_hour", "n"]]

    df = combine_partials(
        _t(sf_dir, "events", ["ts", "user_id"])
        .map_batches(pairs, batch_format="pandas")
        .repartition(max(1, n_buckets // 4))
        .groupby("bucket").map_groups(bucket_counts,
                                      batch_format="pandas"),
        ["window_hour"], {"n": "sum"}).to_pandas()
    df["window_hour"] = df["window_hour"].astype("int64")
    df["n"] = df["n"].astype("int64")
    return df.sort_values("window_hour").reset_index(drop=True)


def value_quantiles(sf_dir: str,
                    qs: tuple = (25, 50, 75, 90, 99)) -> pd.DataFrame:
    """Exact per-event-type VALUE quantiles in integer cents — the
    per-type distribution audit (pricing anomalies, fee drift). Same
    lower-rule histogram trick as lang_length_quantiles: cent-rounded
    values are integers, so per-batch (type, cents, count) partials
    through the combiner tree are an exact sufficient statistic and the
    per-type quantile scan runs on the tiny merged histogram — no sort,
    nothing driver-side but histograms."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(batch["value"].values * 100).astype("int64")
        g = (pd.DataFrame({"event_type": batch["event_type"].values,
                           "v": cents})
             .groupby(["event_type", "v"], sort=False)
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype("int64")
        return g

    hist = combine_partials(
        _t(sf_dir, "events", ["event_type", "value"])
        .map_batches(partial, batch_format="pandas"),
        ["event_type", "v"], {"n": "sum"}).to_pandas()
    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("v")
        cum = g["n"].astype("int64").cumsum().to_numpy()
        total = int(cum[-1])
        vs = g["v"].to_numpy()
        for q in qs:
            need = -(-q * total // 100)
            rows.append({"event_type": et, "q": q,
                         "value_c": int(vs[(cum >= need).argmax()])})
    out = (pd.DataFrame(rows).sort_values(["event_type", "q"])
           .reset_index(drop=True))
    out["q"] = out["q"].astype("int64")
    out["value_c"] = out["value_c"].astype("int64")
    return out


def benford_digits(sf_dir: str) -> pd.DataFrame:
    """Benford's-law first-digit screen over order totals — the classic
    synthetic-/fraudulent-data audit (real transactional amounts follow
    log-uniform leading digits; generated or tampered ones usually
    don't). First digit comes from the INTEGER part (floor is IEEE-exact
    both engines; integer→string is exact), shares quantize with pure
    integer arithmetic floor(n·1e6/total + 0.5) = (2e6·n + total) //
    (2·total) — no float division anywhere, so the driver hash is
    strict. Scale: per-batch digit histograms (≤10 rows each) ride the
    combiner tree; the driver sees one ≤10-row frame."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(batch["o_totalprice"].values).astype("int64")
        # strip to the leading digit in ≤19 vectorized passes
        while (v >= 10).any():
            big = v >= 10
            v[big] //= 10
        g = (pd.DataFrame({"first_digit": v}).groupby("first_digit")
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype("int64")
        return g

    hist = combine_partials(
        _t(sf_dir, "orders", ["o_totalprice"])
        .map_batches(partial, batch_format="pandas"),
        ["first_digit"], {"n": "sum"}).to_pandas()
    total = int(hist["n"].sum())
    hist = hist.sort_values("first_digit").reset_index(drop=True)
    hist["first_digit"] = hist["first_digit"].astype("int64")
    hist["n"] = hist["n"].astype("int64")
    hist["share_q"] = ((2_000_000 * hist["n"] + total)
                       // (2 * total)).astype("int64")
    return hist


def order_priority_check(sf_dir: str, late_days: int = 30,
                         n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q4-shaped SEMIJOIN: per order priority, how many orders
    have at least one LATE line item (l_shipdate ≥ o_orderdate +
    ``late_days``; this corpus carries no commit/receipt dates, so
    lateness is measured against the order date — same EXISTS shape as
    rag-era Q4). The semijoin never materializes matches: the EXISTS
    predicate is monotone in l_shipdate, so lineitem pre-reduces to a
    per-orderkey MAX-shipdate partial inside each batch (the combiner
    move — the shuffle carries one int64 per orderkey, never line
    items), orders and partials co-partition by an orderkey bucket, and
    each bucket emits per-priority partial counts; the driver sums a
    ≤ priorities×buckets frame."""
    US_PER_DAY = 86_400_000_000
    late_us = np.int64(late_days * US_PER_DAY)

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["o_orderkey"] % np.int64(n_buckets)),
            "okey": batch["o_orderkey"].astype("int64").values,
            "t": batch["o_orderdate"].astype("int64").values,
            "priority": batch["o_orderpriority"].values,
            "is_order": pd.array([True] * len(batch), dtype="bool")})

    def ship_partials(batch: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"okey": batch["l_orderkey"].values,
                           "t": batch["l_shipdate"].astype("int64").values})
             .groupby("okey", sort=False)["t"].max().reset_index())
        return pd.DataFrame({
            "bucket": (g["okey"] % n_buckets).astype("int64"),
            "okey": g["okey"].astype("int64"),
            "t": g["t"].astype("int64"),
            "priority": pd.array([""] * len(g), dtype="object"),
            "is_order": pd.array([False] * len(g), dtype="bool")})

    def count_late(g: pd.DataFrame) -> pd.DataFrame:
        maxship = (g.loc[~g["is_order"]].groupby("okey", sort=False)["t"]
                   .max())
        o = g[g["is_order"]]
        thresh = o["t"].values + late_us
        late = maxship.reindex(o["okey"]).fillna(np.iinfo(np.int64).min)
        m = late.values >= thresh
        out = (pd.DataFrame({"o_orderpriority": o.loc[m, "priority"]})
               .groupby("o_orderpriority", sort=False)
               .size().reset_index(name="n_late_orders"))
        return out

    orders = (_t(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderpriority"])
              .map_batches(order_rows, batch_format="pandas"))
    ships = (_t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
             .map_batches(ship_partials, batch_format="pandas"))
    parts = (orders.union(ships)
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(count_late,
                                           batch_format="pandas")
             ).to_pandas()
    out = (parts.groupby("o_orderpriority")["n_late_orders"].sum()
           .reset_index())
    out["n_late_orders"] = out["n_late_orders"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def idle_customers(sf_dir: str, cutoff: str = "2001-05-01",
                   n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q22-shaped ANTI-JOIN: positive-balance customers with NO
    order on/after ``cutoff`` (every customer in this corpus has some
    order, so recency is the non-degenerate anti predicate), rolled up
    per market segment (count + exact integer-cent balance sum).
    Neither side broadcasts: orders filter to the window and pre-reduce
    to DISTINCT custkeys inside each batch (the combiner move),
    customers and those key partials co-partition by a custkey bucket,
    and each bucket anti-joins locally (isin on its bucket-local key
    set) emitting per-segment partials; the driver sums a
    ≤ segments×buckets frame. The Q22 balance floor is fixed at 0.00
    (not the corpus average) so the predicate is exactly reproducible
    against the SQL oracle — no float summation-order hazard."""
    cut_us = int(pd.Timestamp(cutoff).value // 1000)

    def cust_rows(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["c_acctbal"].values > 0.0]
        return pd.DataFrame({
            "bucket": (b["c_custkey"] % np.int64(n_buckets)),
            "key": b["c_custkey"].astype("int64").values,
            "segment": b["c_mktsegment"].values,
            "bal_c": np.rint(b["c_acctbal"].values * 100).astype("int64"),
            "is_cust": pd.array([True] * len(b), dtype="bool")})

    def order_keys(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["o_orderdate"].astype("int64").values >= cut_us]
        keys = np.unique(b["o_custkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "bucket": keys % np.int64(n_buckets),
            "key": keys,
            "segment": pd.array([""] * len(keys), dtype="object"),
            "bal_c": pd.array([0] * len(keys), dtype="int64"),
            "is_cust": pd.array([False] * len(keys), dtype="bool")})

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[~g["is_cust"], "key"]
        c = g[g["is_cust"]]
        idle = c[~c["key"].isin(have)]
        out = (idle.groupby("segment", sort=False)
               .agg(n_idle=("key", "size"), acctbal_c=("bal_c", "sum"))
               .reset_index().rename(columns={"segment": "c_mktsegment"}))
        if out.empty:  # typed empty: an all-active bucket must not
            return pd.DataFrame({   # poison the union's schema
                "c_mktsegment": pd.array([], dtype="object"),
                "n_idle": pd.array([], dtype="int64"),
                "acctbal_c": pd.array([], dtype="int64")})
        return out

    cust = (_t(sf_dir, "customer",
               ["c_custkey", "c_mktsegment", "c_acctbal"])
            .map_batches(cust_rows, batch_format="pandas"))
    okeys = (_t(sf_dir, "orders", ["o_custkey", "o_orderdate"])
             .map_batches(order_keys, batch_format="pandas"))
    parts = (cust.union(okeys)
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(anti, batch_format="pandas")
             ).to_pandas()
    out = (parts.groupby("c_mktsegment")
           .agg(n_idle=("n_idle", "sum"), acctbal_c=("acctbal_c", "sum"))
           .reset_index())
    out["n_idle"] = out["n_idle"].astype("int64")
    out["acctbal_c"] = out["acctbal_c"].astype("int64")
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def ref_integrity_audit(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """Bi-directional foreign-key audit between orders and lineitem —
    the referential-integrity screen a 100-TB ingest runs before
    trusting joins: how many lineitem rows reference a missing order
    (orphans), and how many orders have no line at all (childless).
    Both anti-joins in ONE co-partition pass: lineitem pre-reduces to
    per-orderkey line counts inside each batch, orders to distinct keys,
    both sides bucket by orderkey, and each bucket counts its local
    orphans/childless; the driver sums one ≤buckets-row frame. Neither
    side broadcasts, no text/payload moves."""

    def line_rows(batch: pd.DataFrame) -> pd.DataFrame:
        g = (batch.groupby("l_orderkey", sort=False).size()
             .reset_index(name="n_lines"))
        k = g["l_orderkey"].astype("int64")
        return pd.DataFrame({
            "bucket": (k % np.int64(n_buckets)),
            "key": k,
            "n_lines": g["n_lines"].astype("int64"),
            "is_order": pd.array([False] * len(g), dtype="bool")})

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["o_orderkey"].astype("int64")
        return pd.DataFrame({
            "bucket": (k % np.int64(n_buckets)),
            "key": k,
            "n_lines": pd.array([0] * len(k), dtype="int64"),
            "is_order": pd.array([True] * len(k), dtype="bool")})

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        orders = g.loc[g["is_order"], "key"]
        lines = g[~g["is_order"]]
        # partials for one key may arrive from several batches — line
        # counts sum per key before the membership test
        lk = lines.groupby("key")["n_lines"].sum()
        orphan = int(lk[~lk.index.isin(orders)].sum())
        childless = int((~orders.isin(lk.index)).sum())
        return pd.DataFrame({
            "n_orphan_lines": pd.array([orphan], dtype="int64"),
            "n_childless_orders": pd.array([childless], dtype="int64")})

    parts = (_t(sf_dir, "lineitem", ["l_orderkey"])
             .map_batches(line_rows, batch_format="pandas")
             .union(_t(sf_dir, "orders", ["o_orderkey"])
                    .map_batches(order_rows, batch_format="pandas"))
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(audit, batch_format="pandas")
             ).to_pandas()
    return pd.DataFrame({
        "n_orphan_lines":
            pd.array([int(parts["n_orphan_lines"].sum())], dtype="int64"),
        "n_childless_orders":
            pd.array([int(parts["n_childless_orders"].sum())],
                     dtype="int64")})


def copurchase_pairs(sf_dir: str, k: int = 20,
                     n_buckets: int = 32) -> pd.DataFrame:
    """Market-basket pair mining: the ``k`` most co-purchased part pairs
    (two parts on the same order), the a-priori first step. The pair
    expansion is quadratic per ORDER, not per table — orders have few
    lines, so C(lines,2) is bounded — and it runs bucket-locally:
    lineitem pre-reduces to DISTINCT (orderkey, partkey) inside each
    batch, co-partitions by an orderkey bucket, and each bucket expands
    its own orders into (pa<pb) pairs and pre-counts them. The global
    pair sum then co-partitions by a PAIR-hash bucket — each pair lives
    in exactly one bucket, so every bucket can sum its own pairs and
    emit an exact per-bucket top-k partial; the driver merges only
    buckets×k rows. (A generic groupby().aggregate() over the distinct
    pair space measured ~60× slower than this two-bucket shape at
    sf0.01 — the pair keyspace scales with the catalog squared, so
    neither a tree-combine final task nor a full sort shuffle fits.)
    Total order (n DESC, pa, pb) makes the top-k deterministic under
    ties."""

    def dedup_keys(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[["l_orderkey", "l_partkey"]].drop_duplicates()
        k_ = g["l_orderkey"].astype("int64")
        return pd.DataFrame({
            "bucket": (k_ % np.int64(n_buckets)),
            "okey": k_,
            "part": g["l_partkey"].astype("int64")})

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, parts in g.groupby("okey", sort=False)["part"]:
            ps = sorted(set(parts.tolist()))
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    rows.append((ps[i], ps[j]))
        if not rows:
            return pd.DataFrame({"pa": pd.array([], dtype="int64"),
                                 "pb": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64"),
                                 "pbucket": pd.array([], dtype="int64")})
        out = (pd.DataFrame(rows, columns=["pa", "pb"])
               .groupby(["pa", "pb"], sort=False).size()
               .reset_index(name="n"))
        for c in ("pa", "pb", "n"):
            out[c] = out[c].astype("int64")
        # the pair's home bucket: every (pa, pb) occurrence — from any
        # order bucket — hashes to the same pbucket, so bucket-local
        # sums and top-ks are globally exact
        out["pbucket"] = ((out["pa"] * np.int64(2654435761) + out["pb"])
                          % np.int64(n_buckets)).astype("int64")
        return out

    def sum_and_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["pa", "pb"], sort=False)["n"].sum()
               .reset_index()
               .sort_values(["n", "pa", "pb"],
                            ascending=[False, True, True]).head(k))
        for c in ("pa", "pb", "n"):
            out[c] = out[c].astype("int64")
        return out[["pa", "pb", "n"]]

    parts = (_t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
             .map_batches(dedup_keys, batch_format="pandas")
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(expand, batch_format="pandas")
             .groupby("pbucket").map_groups(sum_and_topk,
                                            batch_format="pandas"))
    out = (parts.to_pandas()        # ≤ n_buckets·k rows
           .sort_values(["n", "pa", "pb"], ascending=[False, True, True])
           .head(k).reset_index(drop=True))
    for c in ("pa", "pb", "n"):
        out[c] = out[c].astype("int64")
    return out[["pa", "pb", "n"]]


def events_watermark_hourly(sf_dir: str, lateness_min: int = 10,
                            n_buckets: int = 64) -> pd.DataFrame:
    """STREAMING-WINDOW semantics over the event table: tumbling 1-hour
    event-time windows processed in ARRIVAL order with a per-partition
    low watermark and bounded lateness — the Beam/Flink window
    discipline a batch engine must reproduce to backfill a streaming
    job's output. Arrival time is the event time plus a deterministic
    ±15-minute jitter (a multiplicative hash of the event id), the
    realistic transport-disorder model — most events arrive near their
    event time, a tail arrives out of order; the watermark at an
    event's arrival is the max event-time seen EARLIER in its
    partition; an event is LATE (dropped from its window, counted in
    ``n_late``) when its event time lags the watermark by more than
    ``lateness_min``. Output per window: on-time count + late-drop
    count — exact integer microsecond math.

    Scale shape: one pass annotates arrival keys (streaming
    map_batches), one hash co-partition on the user-bucket brings each
    partition's stream together, the running max is a vectorized
    cumulative max after an in-bucket sort, and per-window partials ride
    the combiner tree. Watermarks are per-partition exactly as a real
    streaming shard's would be."""
    lateness_us = lateness_min * 60_000_000

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        t = (batch["ts"].astype("datetime64[us]").astype("int64")
             .to_numpy(np.int64))
        uid = batch["user_id"].to_numpy(np.int64)
        eid = batch["event_id"].astype("int64").to_numpy(np.int64)
        # overflow-safe modular hash: (eid * 2654435761) mod 1.8e9
        # computed as ((eid mod m) * (2654435761 mod m)) mod m so the
        # intermediate stays < 1.8e9 * 8.6e8 < 2^63 for ANY int64 id
        # (a direct multiply wraps past id ~3.47e9 — and DuckDB's
        # BIGINT multiply would error rather than wrap)
        jitter = ((eid % np.int64(1_800_000_000))
                  * np.int64(854_435_761)) % np.int64(1_800_000_000) \
            - np.int64(900_000_000)
        return pd.DataFrame({
            "bucket": uid % np.int64(n_buckets),
            "arr": t + jitter,
            "event_id": eid,
            "t": t})

    def stream(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["arr", "event_id"])
        t = g["t"].to_numpy(np.int64)
        wm_prev = np.concatenate((
            np.array([-(2**62)], dtype=np.int64),
            np.maximum.accumulate(t)[:-1]))
        late = t < wm_prev - lateness_us
        d = pd.DataFrame({
            "hour_epoch": t // 3_600_000_000,
            "n_on_time": (~late).astype("int64"),
            "n_late": late.astype("int64")})
        return (d.groupby("hour_epoch", sort=False)[
            ["n_on_time", "n_late"]].sum().reset_index())

    parts = (_t(sf_dir, "events", ["event_id", "ts", "user_id"])
             .map_batches(prep, batch_format="pandas")
             .groupby("bucket").map_groups(stream, batch_format="pandas"))
    out = combine_partials(parts, ["hour_epoch"],
                           {"n_on_time": "sum", "n_late": "sum"}
                           ).to_pandas()
    out = out.sort_values("hour_epoch").reset_index(drop=True)
    for c in ("hour_epoch", "n_on_time", "n_late"):
        out[c] = out[c].astype("int64")
    return out[["hour_epoch", "n_on_time", "n_late"]]


def copurchase_pagerank(sf_dir: str, iters: int = 5,
                        damping: float = 0.85, k: int = 100,
                        n_buckets: int = 32,
                        spill_dir: str | None = None) -> pd.DataFrame:
    """Weighted PageRank over the co-purchase graph (nodes = parts,
    edge weight = number of orders carrying both parts) — the iterative
    item-centrality step of a recommendation pipeline, and the repo's
    iterative-graph-algorithm exemplar alongside the label-propagation
    CC in dedup.py.

    Scale shape (Pregel supersteps as Dataset ops, no driver graph
    state): edges build bucket-locally like copurchase_pairs (per-order
    distinct-pair expansion inside an orderkey bucket, pair sums inside
    a pair-hash bucket), normalize to per-edge weight fractions
    f = w / out_strength(src) inside a SRC-hash bucket, and SPILL one
    parquet per src bucket (the ivf_topk_indexed pattern) — so the
    EDGE table never re-shuffles: each superstep, only the NODE-sized
    rank table moves. Iteration = (1) ranks co-partition on the src
    bucket, each group joins its own spilled edge partition and emits
    (dst, f·r) contributions PRE-AGGREGATED by destination (the
    combiner move — shuffle rows bounded by distinct dsts per bucket,
    not edges) plus a zero row per node (the dangling/unlinked guard);
    (2) contributions co-partition on the dst bucket, each group folds
    r' = (1-d) + d·Σ. ``spill_dir`` is where the edge partitions live:
    on a multi-node cluster pass a SHARED-storage pyarrow.fs URI (the
    same contract as the extract staging dir — ivf_topk_indexed's
    index_dir pattern); the default is a node-local tempdir, correct
    only single-node. Result: top-``k`` parts by rank, quantized
    floor(r·1e6+0.5) for the hash-strict oracle, ties broken by
    partkey."""
    import tempfile

    from ..state import fsio

    def dedup_keys(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[["l_orderkey", "l_partkey"]].drop_duplicates()
        okey = g["l_orderkey"].astype("int64")
        return pd.DataFrame({
            "bucket": okey % np.int64(n_buckets),
            "okey": okey,
            "part": g["l_partkey"].astype("int64")})

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-order pair expansion: self-merge on the order
        # key (both directions fall out of the product), drop the
        # diagonal, pre-count bucket-locally (~6x the Python pair loop)
        d = g[["okey", "part"]].drop_duplicates()
        m = d.merge(d, on="okey")
        m = m[m["part_x"] != m["part_y"]]
        out = (m.groupby(["part_x", "part_y"], sort=False).size()
               .reset_index(name="w")
               .rename(columns={"part_x": "src", "part_y": "dst"}))
        if out.empty:
            return pd.DataFrame({"src": pd.array([], dtype="int64"),
                                 "dst": pd.array([], dtype="int64"),
                                 "w": pd.array([], dtype="int64"),
                                 "sbucket": pd.array([], dtype="int64")})
        for c in ("src", "dst", "w"):
            out[c] = out[c].astype("int64")
        out["sbucket"] = (out["src"] % np.int64(n_buckets)).astype("int64")
        return out

    owns_spill = spill_dir is None
    if owns_spill:
        spill_dir = tempfile.mkdtemp(prefix="graft_pagerank_edges_")
    # resolve on the driver; the (fs, path) pair pickles into the
    # superstep closures below
    edge_fs, edge_path = fsio.resolve(spill_dir)
    fsio.makedirs((edge_fs, edge_path))

    def normalize_and_spill(g: pd.DataFrame) -> pd.DataFrame:
        # all edges of these srcs are here (src-hash co-partition):
        # exact out-strength and weight fractions, bucket-locally;
        # the partition spills to ITS OWN parquet (re-read every
        # superstep instead of re-shuffled) and emits the bucket's
        # initial rank rows
        ew = (g.groupby(["src", "dst"], sort=False)["w"].sum()
              .reset_index())
        wd = ew.groupby("src", sort=False)["w"].transform("sum")
        b = int(g["sbucket"].iloc[0])
        pd.DataFrame({"pk": ew["src"].astype("int64"),
                      "dst": ew["dst"].astype("int64"),
                      "f": (ew["w"] / wd).astype("float64")}
                     ).pipe(lambda df: fsio.write_table(
                         (edge_fs, f"{edge_path}/{b}.parquet"),
                         pa.Table.from_pandas(df, preserve_index=False)))
        pk = np.unique(ew["src"].to_numpy(np.int64))
        return pd.DataFrame({
            "bucket": pd.array([b] * len(pk), dtype="int64"),
            "pk": pd.array(pk, dtype="int64"),
            "r": pd.array([1.0] * len(pk), dtype="float64")})

    ranks = (_t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
             .map_batches(dedup_keys, batch_format="pandas")
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(expand, batch_format="pandas")
             .groupby("sbucket").map_groups(normalize_and_spill,
                                            batch_format="pandas")
             ).materialize()
    if ranks.count() == 0:
        if owns_spill:
            fsio.rmtree((edge_fs, edge_path))
        return pd.DataFrame({"l_partkey": pd.array([], dtype="int64"),
                             "rank_q": pd.array([], dtype="int64")})

    def contribs(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        e = fsio.read_table(
            (edge_fs, f"{edge_path}/{b}.parquet")).to_pandas()
        m = e.merge(g[["pk", "r"]], on="pk", how="inner")
        m["c"] = m["f"] * m["r"]
        # combiner: pre-sum per destination BEFORE the dst shuffle —
        # rows out ≤ distinct dsts in this bucket, not edges
        out_d = (m.groupby("dst", sort=False)["c"].sum().reset_index()
                 .rename(columns={"dst": "pk"}))
        out_d["bucket"] = (out_d["pk"].to_numpy(np.int64)
                           % np.int64(n_buckets))
        # zero row per node: keeps inbound-less nodes in the rank table
        out_n = pd.DataFrame({
            "pk": g["pk"].astype("int64"),
            "c": pd.array([0.0] * len(g), dtype="float64"),
            "bucket": g["bucket"].astype("int64")})
        return pd.concat([out_d[["bucket", "pk", "c"]],
                          out_n[["bucket", "pk", "c"]]],
                         ignore_index=True)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pk", sort=False)["c"].sum().reset_index()
        return pd.DataFrame({
            "bucket": s["pk"].to_numpy(np.int64) % np.int64(n_buckets),
            "pk": s["pk"].astype("int64"),
            "r": ((1.0 - damping)
                  + damping * s["c"]).astype("float64")})

    def fold_then_contribs(g: pd.DataFrame) -> pd.DataFrame:
        # contribution rows arrive already grouped by their HOME bucket
        # (contribs emits bucket = dst % n_buckets), so the rank update
        # and the NEXT superstep's contributions are bucket-local to the
        # same group — fusing them halves the per-iteration shuffles
        # (2 → 1): the only exchange left is the dst-directed one.
        return contribs(fold(g))

    # supersteps chain LAZILY — one streaming execution runs all
    # iterations back to back; only the node-sized rank table shuffles,
    # edges stream from their spilled partitions
    if iters > 0:
        flow = ranks.groupby("bucket").map_groups(contribs,
                                                  batch_format="pandas")
        for _ in range(iters - 1):
            flow = flow.groupby("bucket").map_groups(
                fold_then_contribs, batch_format="pandas")
        ranks = flow.groupby("bucket").map_groups(fold,
                                                  batch_format="pandas")

    def topk_partial(g: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "l_partkey": g["pk"].astype("int64"),
            "rank_q": np.floor(g["r"].to_numpy(np.float64) * 1e6
                               + 0.5).astype("int64")})
        return (out.sort_values(["rank_q", "l_partkey"],
                                ascending=[False, True]).head(k))

    try:
        out = (ranks.groupby("bucket")
               .map_groups(topk_partial, batch_format="pandas")
               .to_pandas()            # ≤ n_buckets·k rows
               .sort_values(["rank_q", "l_partkey"],
                            ascending=[False, True])
               .head(k).reset_index(drop=True))
    finally:
        if owns_spill:
            fsio.rmtree((edge_fs, edge_path))
    for c in ("l_partkey", "rank_q"):
        out[c] = out[c].astype("int64")
    return out[["l_partkey", "rank_q"]]


def customer_order_dist(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q13-shaped OUTER-JOIN DISTRIBUTION: histogram of
    per-customer order counts, zero-order customers included (the LEFT
    JOIN semantics — this corpus happens to give every customer an
    order, but the fill-0 path is the operator's contract and is
    exercised in tests). Orders pre-reduce to per-custkey count
    partials inside each batch (the combiner move — the shuffle carries
    one int64 count per custkey per batch, never order rows), customer
    keys and partials co-partition by a custkey bucket, each bucket
    sums partials, reindexes over ITS customers with fill 0 (the outer
    side), and histograms locally; the driver sums a
    ≤ distinct-counts×buckets frame."""
    def cust_keys(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["c_custkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": k % np.int64(n_buckets), "key": k,
            "n": pd.array([0] * len(k), dtype="int64"),
            "is_cust": pd.array([True] * len(k), dtype="bool")})

    def order_counts(batch: pd.DataFrame) -> pd.DataFrame:
        g = (pd.Series(1, index=batch["o_custkey"].to_numpy(np.int64))
             .groupby(level=0).size())
        k = g.index.to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": k % np.int64(n_buckets), "key": k,
            "n": g.to_numpy(np.int64),
            "is_cust": pd.array([False] * len(k), dtype="bool")})

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        per_key = (g.loc[~g["is_cust"]].groupby("key", sort=False)["n"]
                   .sum())
        counts = (per_key.reindex(g.loc[g["is_cust"], "key"])
                  .fillna(0).astype("int64"))
        out = counts.value_counts().rename_axis("c_count").reset_index(
            name="custdist")
        out["c_count"] = out["c_count"].astype("int64")
        out["custdist"] = out["custdist"].astype("int64")
        return out

    cust = (_t(sf_dir, "customer", ["c_custkey"])
            .map_batches(cust_keys, batch_format="pandas"))
    orders = (_t(sf_dir, "orders", ["o_custkey"])
              .map_batches(order_counts, batch_format="pandas"))
    parts = (cust.union(orders)
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(hist, batch_format="pandas")
             ).to_pandas()
    out = parts.groupby("c_count")["custdist"].sum().reset_index()
    out["c_count"] = out["c_count"].astype("int64")
    out["custdist"] = out["custdist"].astype("int64")
    return out.sort_values("c_count").reset_index(drop=True)


def small_qty_revenue(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q17-shaped JOIN-AGAINST-GROUP-AGGREGATE: per brand, the
    revenue and row count of line items whose quantity is below 20% of
    that part's average quantity. The threshold test is exact-integer
    cross-multiplication (qty*5*cnt < sum_qty ⇔ qty < 0.2·avg — no
    float average anywhere), so the result is bit-reproducible against
    the SQL oracle. The scale trick: quantity lives in a tiny integer
    domain, so lineitem pre-reduces to per-(partkey, qty) partials
    (n rows, exact-cent price sum) inside each batch — ONE bounded
    shuffle carries both the per-part aggregate (Σn, Σqty·n) and the
    candidate rows; part rows co-partition by partkey bucket to map
    partkey→brand. Neither lineitem rows nor the part table broadcast;
    the driver sums a ≤ brands×buckets frame."""
    def li_partials(batch: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(batch["l_quantity"].to_numpy(np.float64)).astype(
            np.int64)
        price_c = np.rint(
            batch["l_extendedprice"].to_numpy(np.float64) * 100
        ).astype(np.int64)
        g = (pd.DataFrame({"pkey": batch["l_partkey"].to_numpy(np.int64),
                           "qty": q, "price_c": price_c})
             .groupby(["pkey", "qty"], sort=False)
             .agg(n=("price_c", "size"), price_c=("price_c", "sum"))
             .reset_index())
        return pd.DataFrame({
            "bucket": (g["pkey"] % n_buckets).astype("int64"),
            "pkey": g["pkey"], "qty": g["qty"],
            "n": g["n"].astype("int64"), "price_c": g["price_c"],
            "brand": pd.array([""] * len(g), dtype="object")})

    def part_rows(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch["p_partkey"].to_numpy(np.int64)
        return pd.DataFrame({
            "bucket": k % np.int64(n_buckets), "pkey": k,
            "qty": pd.array([-1] * len(k), dtype="int64"),
            "n": pd.array([0] * len(k), dtype="int64"),
            "price_c": pd.array([0] * len(k), dtype="int64"),
            "brand": batch["p_brand"].values})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["qty"] >= 0]
        cnt_map = li.groupby("pkey", sort=False)["n"].sum()
        sq_map = (li["qty"] * li["n"]).groupby(li["pkey"]).sum()
        cnt = cnt_map.reindex(li["pkey"]).to_numpy(np.int64)
        sq = sq_map.reindex(li["pkey"]).to_numpy(np.int64)
        m = li["qty"].to_numpy(np.int64) * 5 * cnt < sq
        sel = li[m]
        brand = (g.loc[g["qty"] < 0].set_index("pkey")["brand"])
        out = (pd.DataFrame({
            "p_brand": brand.reindex(sel["pkey"]).to_numpy(object),
            "revenue_c": sel["price_c"].to_numpy(np.int64),
            "n_small": sel["n"].to_numpy(np.int64)})
            .groupby("p_brand", sort=False).sum().reset_index())
        if out.empty:  # typed empty keeps the union schema stable
            return pd.DataFrame({
                "p_brand": pd.array([], dtype="object"),
                "revenue_c": pd.array([], dtype="int64"),
                "n_small": pd.array([], dtype="int64")})
        return out

    li = (_t(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice"])
          .map_batches(li_partials, batch_format="pandas"))
    parts = (_t(sf_dir, "part", ["p_partkey", "p_brand"])
             .map_batches(part_rows, batch_format="pandas"))
    res = (li.union(parts)
           .repartition(max(1, n_buckets // 4))
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas")
           ).to_pandas()
    out = (res.groupby("p_brand")
           .agg(revenue_c=("revenue_c", "sum"), n_small=("n_small", "sum"))
           .reset_index())
    out["revenue_c"] = out["revenue_c"].astype("int64")
    out["n_small"] = out["n_small"].astype("int64")
    return out.sort_values("p_brand").reset_index(drop=True)


def nation_trade_volume(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q7-shaped TWO-DIMENSION TRADE MATRIX: discounted lineitem
    revenue per (supplier nation, customer nation) pair. Two fact-fact
    joins, neither broadcasting a fact table: ORDERS co-partitions with
    CUSTOMER by a custkey bucket to resolve the customer nation (stage
    1 — the shuffle carries (custkey|okey, int) rows, never names until
    the dimension lookup inside the bucket); LINEITEM pre-reduces to
    per-(orderkey, supplier-nation) revenue partials inside each batch
    (supplier→nation is a true dimension: 100× smaller than customer,
    broadcast via ray.put like nation_revenue); stage 2 co-partitions
    those partials with stage 1's (orderkey, cust_nation) rows by an
    orderkey bucket and emits ≤ 25×25 matrix partials per bucket, which
    the driver sums. Scale: both shuffles carry key-sized rows; the
    625-cell matrix is the only driver materialization."""
    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nat_names = np.empty(int(nat["n_nationkey"].max()) + 1, dtype=object)
    nat_names[nat["n_nationkey"].values] = nat["n_name"].values
    order_s = np.argsort(sup["s_suppkey"].values)
    sup_ref = ray.put((sup["s_suppkey"].values[order_s],
                       sup["s_nationkey"].values[order_s], nat_names))
    nat_ref = ray.put(nat_names)

    # ---- stage 1: orders ⋈ customer by custkey bucket → (okey, cnat)
    def cust_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["c_custkey"] % np.int64(n_buckets)),
            "key": batch["c_custkey"].astype("int64").values,
            "okey": pd.array([0] * len(batch), dtype="int64"),
            "nkey": batch["c_nationkey"].astype("int64").values,
            "is_dim": pd.array([True] * len(batch), dtype="bool")})

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["o_custkey"] % np.int64(n_buckets)),
            "key": batch["o_custkey"].astype("int64").values,
            "okey": batch["o_orderkey"].astype("int64").values,
            "nkey": pd.array([0] * len(batch), dtype="int64"),
            "is_dim": pd.array([False] * len(batch), dtype="bool")})

    def resolve_cnat(g: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(nat_ref)
        dim = g[g["is_dim"]]
        k2n = pd.Series(dim["nkey"].values, index=dim["key"].values)
        o = g[~g["is_dim"]]
        cnat = names[k2n.reindex(o["key"]).fillna(0).astype(np.intp)]
        return pd.DataFrame({
            "bucket": (o["okey"] % np.int64(n_buckets)).values,
            "okey": o["okey"].values,
            "cust_nation": pd.array(cnat, dtype="object"),
            "supp_nation": pd.array([""] * len(o), dtype="object"),
            "revenue_u": pd.array([0] * len(o), dtype="int64"),
            "is_ord": pd.array([True] * len(o), dtype="bool")})

    orders_cnat = (
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .map_batches(cust_rows, batch_format="pandas")
        .union(_t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
               .map_batches(order_rows, batch_format="pandas"))
        .repartition(max(1, n_buckets // 4))
        .groupby("bucket").map_groups(resolve_cnat, batch_format="pandas"))

    # ---- lineitem: per-(okey, supp_nation) revenue partials (combiner)
    def li_partials(batch: pd.DataFrame) -> pd.DataFrame:
        sks, snk, names = ray.get(sup_ref)
        snat = names[snk[np.searchsorted(
            sks, batch["l_suppkey"].to_numpy(np.int64))]]
        price_c = np.rint(batch["l_extendedprice"].values
                          * 100).astype("int64")
        disc_c = np.rint(batch["l_discount"].values * 100).astype("int64")
        g = (pd.DataFrame({"okey": batch["l_orderkey"].values,
                           "supp_nation": snat,
                           "revenue_u": price_c * (100 - disc_c)})
             .groupby(["okey", "supp_nation"], sort=False)["revenue_u"]
             .sum().reset_index())
        return pd.DataFrame({
            "bucket": (g["okey"] % n_buckets).astype("int64"),
            "okey": g["okey"].astype("int64"),
            "cust_nation": pd.array([""] * len(g), dtype="object"),
            "supp_nation": g["supp_nation"].values,
            "revenue_u": g["revenue_u"].astype("int64"),
            "is_ord": pd.array([False] * len(g), dtype="bool")})

    # ---- stage 2: co-partition by okey bucket → matrix partials
    def matrix_partial(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["is_ord"]]
        o2c = pd.Series(o["cust_nation"].values, index=o["okey"].values)
        li = g[~g["is_ord"]]
        out = pd.DataFrame({
            "supp_nation": li["supp_nation"].values,
            "cust_nation": o2c.reindex(li["okey"]).values,
            "revenue_u": li["revenue_u"].values})
        return (out.groupby(["supp_nation", "cust_nation"], sort=False)
                ["revenue_u"].sum().reset_index())

    li = (_t(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
          .map_batches(li_partials, batch_format="pandas"))
    parts = (orders_cnat.union(li)
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(matrix_partial,
                                           batch_format="pandas")
             ).to_pandas()
    out = (parts.groupby(["supp_nation", "cust_nation"])["revenue_u"]
           .sum().reset_index())
    out["revenue_u"] = out["revenue_u"].astype("int64")
    return (out.sort_values(["supp_nation", "cust_nation"])
            .reset_index(drop=True))


def returned_revenue(sf_dir: str, k: int = 20,
                     n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q10-shaped RETURNED-ITEM top-k: customers ranked by revenue
    of lineitems flagged 'R'. Lineitem pre-reduces to per-orderkey
    revenue partials inside each batch; orders co-partition with those
    partials by an orderkey bucket and re-emit (custkey, revenue) rows;
    a second custkey-bucket groupby aggregates per customer and keeps
    its bucket-local top-k, so the driver merges ≤ k·buckets rows. The
    k winners' names/nations resolve driver-side by a filtered read of
    the customer table (k keys — never a full-table materialization)."""
    def rev_partials(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["l_returnflag"].values == "R"]
        price_c = np.rint(b["l_extendedprice"].values * 100).astype("int64")
        disc_c = np.rint(b["l_discount"].values * 100).astype("int64")
        g = (pd.DataFrame({"okey": b["l_orderkey"].values,
                           "revenue_u": price_c * (100 - disc_c)})
             .groupby("okey", sort=False).sum().reset_index())
        return pd.DataFrame({
            "bucket": (g["okey"] % n_buckets).astype("int64"),
            "okey": g["okey"].astype("int64"),
            "ckey": pd.array([0] * len(g), dtype="int64"),
            "revenue_u": g["revenue_u"].astype("int64"),
            "is_ord": pd.array([False] * len(g), dtype="bool")})

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["o_orderkey"] % np.int64(n_buckets)),
            "okey": batch["o_orderkey"].astype("int64").values,
            "ckey": batch["o_custkey"].astype("int64").values,
            "revenue_u": pd.array([0] * len(batch), dtype="int64"),
            "is_ord": pd.array([True] * len(batch), dtype="bool")})

    def to_cust(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["is_ord"]]
        o2c = pd.Series(o["ckey"].values, index=o["okey"].values)
        li = g[~g["is_ord"]]
        ck = o2c.reindex(li["okey"])
        out = pd.DataFrame({"c_custkey": ck.values.astype("int64"),
                            "revenue_u": li["revenue_u"].values})
        out["bucket"] = out["c_custkey"] % np.int64(n_buckets)
        return (out.groupby(["bucket", "c_custkey"], sort=False)
                ["revenue_u"].sum().reset_index())

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("c_custkey", sort=False)["revenue_u"].sum()
               .reset_index())
        return (agg.sort_values(["revenue_u", "c_custkey"],
                                ascending=[False, True]).head(k))

    li = (_t(sf_dir, "lineitem",
             ["l_orderkey", "l_returnflag", "l_extendedprice",
              "l_discount"])
          .map_batches(rev_partials, batch_format="pandas"))
    orders = (_t(sf_dir, "orders", ["o_orderkey", "o_custkey"])
              .map_batches(order_rows, batch_format="pandas"))
    per_cust = (li.union(orders)
                .repartition(max(1, n_buckets // 4))
                .groupby("bucket").map_groups(to_cust,
                                              batch_format="pandas")
                .groupby("bucket").map_groups(local_topk,
                                              batch_format="pandas")
                ).to_pandas()
    empty = pd.DataFrame({"c_custkey": pd.array([], dtype="int64"),
                          "c_name": pd.array([], dtype="object"),
                          "n_name": pd.array([], dtype="object"),
                          "revenue_u": pd.array([], dtype="int64")})
    if per_cust.empty:  # no 'R' lineitem anywhere: an all-empty
        # map_groups result loses its schema on to_pandas()
        return empty
    top = (per_cust.sort_values(["revenue_u", "c_custkey"],
                                ascending=[False, True])
           .head(k).reset_index(drop=True))
    # k-row dimension resolve: the winners' keys broadcast into a
    # DISTRIBUTED filter — the driver receives ≤k customer rows, never
    # the table
    keys_ref = ray.put(frozenset(int(x) for x in top["c_custkey"]))

    def keep_winners(batch: pd.DataFrame) -> pd.DataFrame:
        keys = ray.get(keys_ref)
        return batch[batch["c_custkey"].isin(keys)]

    cust = (_t(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
            .map_batches(keep_winners, batch_format="pandas")).to_pandas()
    if cust.empty:
        return empty
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    merged = (top.merge(cust, on="c_custkey")
              .merge(nat, left_on="c_nationkey", right_on="n_nationkey"))
    out = merged[["c_custkey", "c_name", "n_name", "revenue_u"]].copy()
    out["c_custkey"] = out["c_custkey"].astype("int64")
    out["revenue_u"] = out["revenue_u"].astype("int64")
    return (out.sort_values(["revenue_u", "c_custkey"],
                            ascending=[False, True]).reset_index(drop=True))


def late_shipment_priority(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q12-shaped CONDITIONAL-COUNT JOIN: lineitems bucketed by
    shipping delay (l_shipdate − o_orderdate; this corpus carries no
    ship modes or commit/receipt dates), counting high-priority
    (1-URGENT/2-HIGH) vs lower-priority order lines per delay bucket.
    Every line must meet its order's priority, so the orderkey-bucket
    shuffle carries one (okey, shipdate) int pair per line — no
    pre-reduction is possible before the join, which is exactly Q12's
    cost shape — and each bucket emits ≤ 4 partial rows. Delay buckets
    compare raw int64 timestamps against fixed interval edges (no
    day-division, so floor-vs-truncate never diverges from the SQL)."""
    US_PER_DAY = 86_400_000_000
    HIGH = ("1-URGENT", "2-HIGH")
    EDGES = np.array([0, 30 * US_PER_DAY, 90 * US_PER_DAY], dtype="int64")
    LABELS = np.array(["0-early", "1-within-30d", "2-within-90d",
                       "3-over-90d"], dtype=object)

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["o_orderkey"] % np.int64(n_buckets)),
            "okey": batch["o_orderkey"].astype("int64").values,
            "t": batch["o_orderdate"].astype("int64").values,
            "high": pd.array(
                np.isin(batch["o_orderpriority"].values, HIGH),
                dtype="bool"),
            "is_ord": pd.array([True] * len(batch), dtype="bool")})

    def line_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["l_orderkey"] % np.int64(n_buckets)),
            "okey": batch["l_orderkey"].astype("int64").values,
            "t": batch["l_shipdate"].astype("int64").values,
            "high": pd.array([False] * len(batch), dtype="bool"),
            "is_ord": pd.array([False] * len(batch), dtype="bool")})

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["is_ord"]]
        odate = pd.Series(o["t"].values, index=o["okey"].values)
        ohigh = pd.Series(o["high"].values, index=o["okey"].values)
        li = g[~g["is_ord"]]
        delay = li["t"].values - odate.reindex(li["okey"]).values
        label = LABELS[np.searchsorted(EDGES, delay, side="right")]
        high = ohigh.reindex(li["okey"]).values
        out = pd.DataFrame({"delay_bucket": label, "high": high})
        agg = (out.groupby("delay_bucket", sort=False)["high"]
               .agg(n_high="sum", n_low=lambda s: int((~s).sum()))
               .reset_index())
        agg["n_high"] = agg["n_high"].astype("int64")
        agg["n_low"] = agg["n_low"].astype("int64")
        return agg

    orders = (_t(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderpriority"])
              .map_batches(order_rows, batch_format="pandas"))
    lines = (_t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
             .map_batches(line_rows, batch_format="pandas"))
    parts = (orders.union(lines)
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(count_bucket,
                                           batch_format="pandas")
             ).to_pandas()
    out = (parts.groupby("delay_bucket")
           .agg(n_high=("n_high", "sum"), n_low=("n_low", "sum"))
           .reset_index())
    out["n_high"] = out["n_high"].astype("int64")
    out["n_low"] = out["n_low"].astype("int64")
    return out.sort_values("delay_bucket").reset_index(drop=True)


def big_orders(sf_dir: str, min_qty: int = 300, k: int = 100,
               n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q18-shaped HAVING-SEMIJOIN top-k: orders whose total line
    quantity exceeds ``min_qty``, with their total price. Lineitem
    pre-reduces to per-orderkey integer quantity partials inside each
    batch (the combiner move); orders co-partition with the partials by
    an orderkey bucket; each bucket finishes the per-order sum, applies
    the HAVING filter and keeps a bucket-local top-k by quantity — the
    driver merges ≤ k·buckets qualifying rows, never the join."""
    def qty_partials(batch: pd.DataFrame) -> pd.DataFrame:
        qty = np.rint(batch["l_quantity"].values).astype("int64")
        g = (pd.DataFrame({"okey": batch["l_orderkey"].values,
                           "sum_qty": qty})
             .groupby("okey", sort=False).sum().reset_index())
        return pd.DataFrame({
            "bucket": (g["okey"] % n_buckets).astype("int64"),
            "okey": g["okey"].astype("int64"),
            "sum_qty": g["sum_qty"].astype("int64"),
            "price_c": pd.array([0] * len(g), dtype="int64"),
            "is_ord": pd.array([False] * len(g), dtype="bool")})

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["o_orderkey"] % np.int64(n_buckets)),
            "okey": batch["o_orderkey"].astype("int64").values,
            "sum_qty": pd.array([0] * len(batch), dtype="int64"),
            "price_c": np.rint(batch["o_totalprice"].values
                               * 100).astype("int64"),
            "is_ord": pd.array([True] * len(batch), dtype="bool")})

    def having_topk(g: pd.DataFrame) -> pd.DataFrame:
        qty = (g[~g["is_ord"]].groupby("okey", sort=False)["sum_qty"]
               .sum())
        o = g[g["is_ord"]]
        total = qty.reindex(o["okey"]).fillna(0).astype("int64")
        m = total.values > min_qty
        out = pd.DataFrame({
            "o_orderkey": o.loc[m, "okey"].values,
            "o_totalprice_c": o.loc[m, "price_c"].values,
            "sum_qty": total.values[m]})
        return (out.sort_values(["sum_qty", "o_orderkey"],
                                ascending=[False, True]).head(k))

    li = (_t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
          .map_batches(qty_partials, batch_format="pandas"))
    orders = (_t(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
              .map_batches(order_rows, batch_format="pandas"))
    merged = (li.union(orders)
              .repartition(max(1, n_buckets // 4))
              .groupby("bucket").map_groups(having_topk,
                                            batch_format="pandas")
              ).to_pandas()
    if merged.empty:  # nothing over the HAVING bar: an all-empty
        # map_groups result loses its schema on to_pandas()
        return pd.DataFrame({
            "o_orderkey": pd.array([], dtype="int64"),
            "o_totalprice_c": pd.array([], dtype="int64"),
            "sum_qty": pd.array([], dtype="int64")})
    for c in merged.columns:
        merged[c] = merged[c].astype("int64")
    return (merged.sort_values(["sum_qty", "o_orderkey"],
                               ascending=[False, True])
            .head(k).reset_index(drop=True))


def bracket_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19-shaped DISJUNCTIVE BRACKET JOIN: revenue from lineitems
    matching any of three (brand, size-range, quantity-range) branches.
    The part rows satisfying ANY branch's (brand, size) arm are a tiny
    dimension subset, broadcast once as a partkey→quantity-bracket map
    (ray.put); lineitem then evaluates the whole disjunction in one
    vectorized pass per batch — no shuffle at all, partials are a
    single (revenue, count) pair per batch."""
    BRANCHES = (("Brand#12", 1, 15, 1, 20),
                ("Brand#23", 1, 20, 10, 30),
                ("Brand#3", 1, 25, 20, 40))
    part = _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).to_pandas()
    lo = {}
    hi = {}
    for brand, slo, shi, qlo, qhi in BRANCHES:
        m = ((part["p_brand"].values == brand)
             & (part["p_size"].values >= slo)
             & (part["p_size"].values <= shi))
        for pk in part.loc[m, "p_partkey"]:
            lo[int(pk)] = qlo
            hi[int(pk)] = qhi
    keys = np.array(sorted(lo), dtype="int64")
    ref = ray.put((keys,
                   np.array([lo[k] for k in keys], dtype="int64"),
                   np.array([hi[k] for k in keys], dtype="int64")))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keys, qlo, qhi = ray.get(ref)
        zero = pd.DataFrame({"revenue_u": pd.array([0], dtype="int64"),
                             "n_lines": pd.array([0], dtype="int64")})
        if not len(keys):  # no part matches any branch's (brand, size)
            return zero
        pk = batch["l_partkey"].to_numpy(np.int64)
        pos = np.minimum(np.searchsorted(keys, pk), len(keys) - 1)
        inset = keys[pos] == pk
        qty = np.rint(batch["l_quantity"].values).astype("int64")
        m = inset & (qty >= qlo[pos]) & (qty <= qhi[pos])
        if not m.any():
            return zero
        price_c = np.rint(batch["l_extendedprice"].values[m]
                          * 100).astype("int64")
        disc_c = np.rint(batch["l_discount"].values[m]
                         * 100).astype("int64")
        rev = price_c * (100 - disc_c)
        return pd.DataFrame({
            "revenue_u": pd.array([int(rev.sum())], dtype="int64"),
            "n_lines": pd.array([int(m.sum())], dtype="int64")})

    parts = (_t(sf_dir, "lineitem",
                ["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])
             .map_batches(partial, batch_format="pandas")).to_pandas()
    return pd.DataFrame({
        "revenue_u": pd.array([int(parts["revenue_u"].sum())],
                              dtype="int64"),
        "n_lines": pd.array([int(parts["n_lines"].sum())], dtype="int64")})


def forecast_revenue(sf_dir: str, year: int = 1999, disc_lo: int = 5,
                     disc_hi: int = 7, max_qty: int = 24) -> pd.DataFrame:
    """TPC-H Q6-shaped GLOBAL FILTER-AGGREGATE: potential revenue
    increase from dropping small discounts — sum(extendedprice ×
    discount) over one ship-year, a discount band and a quantity cap.
    The cheapest possible distributed shape: a column-pruned scan where
    every batch reduces to ONE (revenue, count) pair, the driver sums a
    frame the size of the batch count — no shuffle, no keys, nothing
    but the three filter columns ever leaves storage."""
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        disc_c = np.rint(batch["l_discount"].values * 100).astype("int64")
        qty = np.rint(batch["l_quantity"].values).astype("int64")
        m = ((batch["l_shipdate"].dt.year.values == year)
             & (disc_c >= disc_lo) & (disc_c <= disc_hi)
             & (qty < max_qty))
        price_c = np.rint(batch["l_extendedprice"].values[m]
                          * 100).astype("int64")
        rev = price_c * disc_c[m]
        return pd.DataFrame({
            "revenue_u": pd.array([int(rev.sum())], dtype="int64"),
            "n_lines": pd.array([int(m.sum())], dtype="int64")})

    parts = (_t(sf_dir, "lineitem",
                ["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])
             .map_batches(partial, batch_format="pandas")).to_pandas()
    return pd.DataFrame({
        "revenue_u": pd.array([int(parts["revenue_u"].sum())],
                              dtype="int64"),
        "n_lines": pd.array([int(parts["n_lines"].sum())], dtype="int64")})


def market_share(sf_dir: str, nation: str = "NATION_3",
                 region: str = "ASIA", ptype: str = "ECONOMY",
                 n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q8-shaped MARKET-SHARE query: of the `ptype` parts sold to
    customers in `region`, what fraction of yearly volume came from
    suppliers in `nation`. Three joins against the lineitem fact, none
    broadcasting a fact table: (1) ORDERS co-partition with CUSTOMER by
    custkey bucket, keeping only in-region orders (the selective side
    shrinks first); (2) LINEITEM pre-reduces per batch to per-orderkey
    (total, nation) volume pairs after a broadcast partkey-subset
    filter (the type-filtered part slice — Q8's own selectivity makes
    it dimension-sized) and a broadcast supplier→nation lookup
    (supplier is 100× smaller than customer, same move as
    nation_trade_volume); (3) the partials co-partition with the
    in-region (okey, year) rows by orderkey bucket. The driver sums a
    ≤ years×buckets frame. Share quantizes as floor(x·1e6 + 0.5) — the
    repo's oracle-stable rounding."""
    part = _t(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    pkeys = np.sort(part.loc[part["p_type"].values == ptype,
                             "p_partkey"].to_numpy(np.int64))
    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation",
             ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _t(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    region_nkeys = nat.loc[np.isin(
        nat["n_regionkey"].values,
        reg.loc[reg["r_name"].values == region, "r_regionkey"].values),
        "n_nationkey"].to_numpy(np.int64)
    nation_key = int(nat.loc[nat["n_name"].values == nation,
                             "n_nationkey"].iloc[0])
    order_s = np.argsort(sup["s_suppkey"].values)
    dims_ref = ray.put((pkeys,
                        sup["s_suppkey"].to_numpy(np.int64)[order_s],
                        sup["s_nationkey"].to_numpy(np.int64)[order_s],
                        np.sort(region_nkeys), nation_key))

    # ---- stage 1: orders ⋈ customer by custkey bucket → in-region
    # (okey, year) rows only
    def cust_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["c_custkey"] % np.int64(n_buckets)),
            "key": batch["c_custkey"].astype("int64").values,
            "okey": pd.array([0] * len(batch), dtype="int64"),
            "year": batch["c_nationkey"].astype("int64").values,
            "is_dim": pd.array([True] * len(batch), dtype="bool")})

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["o_custkey"] % np.int64(n_buckets)),
            "key": batch["o_custkey"].astype("int64").values,
            "okey": batch["o_orderkey"].astype("int64").values,
            "year": batch["o_orderdate"].dt.year.astype("int64").values,
            "is_dim": pd.array([False] * len(batch), dtype="bool")})

    def keep_region(g: pd.DataFrame) -> pd.DataFrame:
        _pk, _sk, _sn, rkeys, _nk = ray.get(dims_ref)
        dim = g[g["is_dim"]]
        k2n = pd.Series(dim["year"].values, index=dim["key"].values)
        o = g[~g["is_dim"]]
        cnat = k2n.reindex(o["key"]).fillna(-1).astype("int64").values
        pos = np.minimum(np.searchsorted(rkeys, cnat),
                         max(len(rkeys) - 1, 0))
        m = len(rkeys) > 0
        m = (rkeys[pos] == cnat) if m else np.zeros(len(o), dtype=bool)
        o = o[m]
        return pd.DataFrame({
            "bucket": (o["okey"] % np.int64(n_buckets)).values,
            "okey": o["okey"].values,
            "year": o["year"].values,
            "total_u": pd.array([0] * len(o), dtype="int64"),
            "nation_u": pd.array([0] * len(o), dtype="int64"),
            "is_ord": pd.array([True] * len(o), dtype="bool")})

    in_region = (
        _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .map_batches(cust_rows, batch_format="pandas")
        .union(_t(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"])
               .map_batches(order_rows, batch_format="pandas"))
        .repartition(max(1, n_buckets // 4))
        .groupby("bucket").map_groups(keep_region, batch_format="pandas"))

    # ---- lineitem: per-orderkey (total, nation) volume partials
    def li_partials(batch: pd.DataFrame) -> pd.DataFrame:
        pkeys, sks, snk, _rk, nation_key = ray.get(dims_ref)
        empty = pd.DataFrame({
            "bucket": pd.array([], dtype="int64"),
            "okey": pd.array([], dtype="int64"),
            "year": pd.array([], dtype="int64"),
            "total_u": pd.array([], dtype="int64"),
            "nation_u": pd.array([], dtype="int64"),
            "is_ord": pd.array([], dtype="bool")})
        if not len(pkeys):
            return empty
        pk = batch["l_partkey"].to_numpy(np.int64)
        pos = np.minimum(np.searchsorted(pkeys, pk), len(pkeys) - 1)
        m = pkeys[pos] == pk
        if not m.any():
            return empty
        b = batch[m]
        price_c = np.rint(b["l_extendedprice"].values * 100).astype(
            "int64")
        disc_c = np.rint(b["l_discount"].values * 100).astype("int64")
        vol = price_c * (100 - disc_c)
        snat = snk[np.searchsorted(sks, b["l_suppkey"].to_numpy(np.int64))]
        is_nat = (snat == nation_key).astype("int64")
        g = (pd.DataFrame({"okey": b["l_orderkey"].to_numpy(np.int64),
                           "total_u": vol, "nation_u": vol * is_nat})
             .groupby("okey", sort=False).sum().reset_index())
        return pd.DataFrame({
            "bucket": (g["okey"] % n_buckets).astype("int64"),
            "okey": g["okey"], "year": pd.array([0] * len(g),
                                                dtype="int64"),
            "total_u": g["total_u"].astype("int64"),
            "nation_u": g["nation_u"].astype("int64"),
            "is_ord": pd.array([False] * len(g), dtype="bool")})

    def per_year(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["is_ord"]]
        o2y = pd.Series(o["year"].values, index=o["okey"].values)
        li = g[~g["is_ord"]]
        yr = o2y.reindex(li["okey"])
        keep = yr.notna().values  # only in-region orders join through
        out = pd.DataFrame({"o_year": yr.values[keep].astype("int64"),
                            "total_u": li["total_u"].values[keep],
                            "nation_u": li["nation_u"].values[keep]})
        return (out.groupby("o_year", sort=False).sum().reset_index())

    li = (_t(sf_dir, "lineitem",
             ["l_orderkey", "l_partkey", "l_suppkey",
              "l_extendedprice", "l_discount"])
          .map_batches(li_partials, batch_format="pandas"))
    parts = (in_region.union(li)
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(per_year,
                                           batch_format="pandas")
             ).to_pandas()
    out = (parts.groupby("o_year")
           .agg(total_u=("total_u", "sum"), nation_u=("nation_u", "sum"))
           .reset_index())
    out = out[out["total_u"] > 0]
    out["total_u"] = out["total_u"].astype("int64")
    out["nation_u"] = out["nation_u"].astype("int64")
    out["mkt_share_micros"] = np.floor(
        out["nation_u"].values / out["total_u"].values * 1e6 + 0.5
    ).astype("int64")
    return out.sort_values("o_year").reset_index(drop=True)


def product_profit(sf_dir: str, ptype: str = "STANDARD",
                   n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q9-shaped PROFIT MATRIX (this corpus carries no partsupp /
    supplycost, so profit is discounted revenue): per (supplier nation,
    order year) revenue over one part type. Lineitem pre-reduces per
    batch to per-(orderkey, nation) partials behind the broadcast
    part-subset filter and supplier→nation lookup; one orderkey-bucket
    co-partition with orders resolves the year; the driver sums a
    ≤ nations×years frame."""
    part = _t(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    pkeys = np.sort(part.loc[part["p_type"].values == ptype,
                             "p_partkey"].to_numpy(np.int64))
    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _t(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nat_names = np.empty(int(nat["n_nationkey"].max()) + 1, dtype=object)
    nat_names[nat["n_nationkey"].values] = nat["n_name"].values
    order_s = np.argsort(sup["s_suppkey"].values)
    dims_ref = ray.put((pkeys,
                        sup["s_suppkey"].to_numpy(np.int64)[order_s],
                        sup["s_nationkey"].to_numpy(np.int64)[order_s],
                        nat_names))

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["o_orderkey"] % np.int64(n_buckets)),
            "okey": batch["o_orderkey"].astype("int64").values,
            "year": batch["o_orderdate"].dt.year.astype("int64").values,
            "supp_nation": pd.array([""] * len(batch), dtype="object"),
            "profit_u": pd.array([0] * len(batch), dtype="int64"),
            "is_ord": pd.array([True] * len(batch), dtype="bool")})

    def li_partials(batch: pd.DataFrame) -> pd.DataFrame:
        pkeys, sks, snk, names = ray.get(dims_ref)
        empty = pd.DataFrame({
            "bucket": pd.array([], dtype="int64"),
            "okey": pd.array([], dtype="int64"),
            "year": pd.array([], dtype="int64"),
            "supp_nation": pd.array([], dtype="object"),
            "profit_u": pd.array([], dtype="int64"),
            "is_ord": pd.array([], dtype="bool")})
        if not len(pkeys):
            return empty
        pk = batch["l_partkey"].to_numpy(np.int64)
        pos = np.minimum(np.searchsorted(pkeys, pk), len(pkeys) - 1)
        m = pkeys[pos] == pk
        if not m.any():
            return empty
        b = batch[m]
        price_c = np.rint(b["l_extendedprice"].values * 100).astype(
            "int64")
        disc_c = np.rint(b["l_discount"].values * 100).astype("int64")
        snat = names[snk[np.searchsorted(
            sks, b["l_suppkey"].to_numpy(np.int64))]]
        g = (pd.DataFrame({"okey": b["l_orderkey"].to_numpy(np.int64),
                           "supp_nation": snat,
                           "profit_u": price_c * (100 - disc_c)})
             .groupby(["okey", "supp_nation"], sort=False)["profit_u"]
             .sum().reset_index())
        return pd.DataFrame({
            "bucket": (g["okey"] % n_buckets).astype("int64"),
            "okey": g["okey"].astype("int64"),
            "year": pd.array([0] * len(g), dtype="int64"),
            "supp_nation": g["supp_nation"].values,
            "profit_u": g["profit_u"].astype("int64"),
            "is_ord": pd.array([False] * len(g), dtype="bool")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["is_ord"]]
        o2y = pd.Series(o["year"].values, index=o["okey"].values)
        li = g[~g["is_ord"]]
        yr = o2y.reindex(li["okey"])
        keep = yr.notna().values  # keeps the int64 block schema stable
        out = pd.DataFrame({
            "supp_nation": li["supp_nation"].values[keep],
            "o_year": yr.values[keep].astype("int64"),
            "profit_u": li["profit_u"].values[keep]})
        return (out.groupby(["supp_nation", "o_year"], sort=False)
                ["profit_u"].sum().reset_index())

    orders = (_t(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
              .map_batches(order_rows, batch_format="pandas"))
    li = (_t(sf_dir, "lineitem",
             ["l_orderkey", "l_partkey", "l_suppkey",
              "l_extendedprice", "l_discount"])
          .map_batches(li_partials, batch_format="pandas"))
    parts = (orders.union(li)
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas")
             ).to_pandas()
    out = (parts.groupby(["supp_nation", "o_year"])["profit_u"]
           .sum().reset_index())
    out["o_year"] = out["o_year"].astype("int64")
    out["profit_u"] = out["profit_u"].astype("int64")
    return (out.sort_values(["supp_nation", "o_year"])
            .reset_index(drop=True))


def top_supplier(sf_dir: str, start: str = "1999-07-01",
                 end: str = "1999-10-01",
                 n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q15-shaped ARGMAX-WITH-TIES: the supplier(s) with maximum
    revenue over one quarter. Lineitem pre-reduces per batch to
    per-suppkey revenue partials; a suppkey-bucket groupby completes
    each supplier's sum LOCALLY and emits only that bucket's max-revenue
    rows (ties kept), so the driver reduces bucket-count candidates to
    the global max — never the full supplier revenue vector. Winner
    names resolve driver-side against the supplier dim (winners ≈ 1)."""
    lo = pd.Timestamp(start)
    hi = pd.Timestamp(end)

    def li_partials(batch: pd.DataFrame) -> pd.DataFrame:
        m = ((batch["l_shipdate"] >= lo)
             & (batch["l_shipdate"] < hi)).values
        b = batch[m]
        price_c = np.rint(b["l_extendedprice"].values * 100).astype(
            "int64")
        disc_c = np.rint(b["l_discount"].values * 100).astype("int64")
        g = (pd.DataFrame({"skey": b["l_suppkey"].to_numpy(np.int64),
                           "total_revenue_u": price_c * (100 - disc_c)})
             .groupby("skey", sort=False).sum().reset_index())
        g["bucket"] = (g["skey"] % n_buckets).astype("int64")
        return g[["bucket", "skey", "total_revenue_u"]]

    def bucket_max(g: pd.DataFrame) -> pd.DataFrame:
        sums = (g.groupby("skey", sort=False)["total_revenue_u"]
                .sum())
        mx = sums.max()
        win = sums[sums == mx].reset_index()
        win["total_revenue_u"] = win["total_revenue_u"].astype("int64")
        return win[["skey", "total_revenue_u"]]

    cand = (_t(sf_dir, "lineitem",
               ["l_suppkey", "l_shipdate", "l_extendedprice",
                "l_discount"])
            .map_batches(li_partials, batch_format="pandas")
            .repartition(max(1, n_buckets // 4))
            .groupby("bucket").map_groups(bucket_max,
                                          batch_format="pandas")
            ).to_pandas()
    if cand.empty:
        return pd.DataFrame({"s_suppkey": pd.array([], dtype="int64"),
                             "s_name": pd.array([], dtype="object"),
                             "total_revenue_u": pd.array([],
                                                         dtype="int64")})
    mx = int(cand["total_revenue_u"].max())
    win = cand[cand["total_revenue_u"] == mx]
    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    names = pd.Series(sup["s_name"].values, index=sup["s_suppkey"].values)
    out = pd.DataFrame({
        "s_suppkey": win["skey"].astype("int64").values,
        "s_name": names.reindex(win["skey"]).values,
        "total_revenue_u": win["total_revenue_u"].astype("int64").values})
    return out.sort_values("s_suppkey").reset_index(drop=True)


def waiting_suppliers(sf_dir: str, late_days: int = 90, k: int = 25,
                      n_buckets: int = 32) -> pd.DataFrame:
    """TPC-H Q21-shaped SOLE-LATE-SHIPPER count (this corpus carries no
    commit/receipt dates, so 'late' is shipping > `late_days` after the
    order date): suppliers who, on finalized multi-supplier orders, were
    the ONLY supplier to ship late — Q21's exists / not-exists pair
    expressed over per-(order, supplier) max-shipdate rows. Lineitem
    pre-reduces per batch to (okey, skey, max_ship) — the fact shuffle
    carries 3 ints per order-supplier pair; orders join in by orderkey
    bucket (inner: non-'F' orders drop); each bucket evaluates the
    existential logic per order and emits per-suppkey count partials;
    the driver top-k's the supplier counts (ties broken by suppkey)."""
    US_PER_DAY = 86_400_000_000

    def order_rows(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[(batch["o_orderstatus"] == "F").values]
        return pd.DataFrame({
            "bucket": (b["o_orderkey"] % np.int64(n_buckets)),
            "okey": b["o_orderkey"].astype("int64").values,
            "skey": pd.array([-1] * len(b), dtype="int64"),
            "t": b["o_orderdate"].astype("int64").values,
            "is_ord": pd.array([True] * len(b), dtype="bool")})

    def li_rows(batch: pd.DataFrame) -> pd.DataFrame:
        g = (pd.DataFrame({"okey": batch["l_orderkey"].to_numpy(np.int64),
                           "skey": batch["l_suppkey"].to_numpy(np.int64),
                           "t": batch["l_shipdate"].astype("int64").values})
             .groupby(["okey", "skey"], sort=False)["t"].max()
             .reset_index())
        return pd.DataFrame({
            "bucket": (g["okey"] % n_buckets).astype("int64"),
            "okey": g["okey"], "skey": g["skey"], "t": g["t"],
            "is_ord": pd.array([False] * len(g), dtype="bool")})

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["is_ord"]]
        odate = pd.Series(o["t"].values, index=o["okey"].values)
        li = (g[~g["is_ord"]]
              .groupby(["okey", "skey"], sort=False)["t"].max()
              .reset_index())  # merge cross-batch partials of one pair
        cutoff = odate.reindex(li["okey"]).values \
            + np.int64(late_days) * US_PER_DAY
        keep = ~np.isnan(cutoff)  # inner join: only 'F' orders
        li = li[keep]
        late = li["t"].values > cutoff[keep].astype("int64")
        per_order = (pd.DataFrame({"okey": li["okey"].values,
                                   "late": late})
                     .groupby("okey", sort=False)["late"]
                     .agg(n_supp="size", n_late="sum"))
        n_supp = per_order["n_supp"].reindex(li["okey"]).values
        n_late = per_order["n_late"].reindex(li["okey"]).values
        m = late & (n_supp >= 2) & (n_late == 1)
        out = (pd.DataFrame({"skey": li["skey"].values[m]})
               .groupby("skey", sort=False).size()
               .rename("numwait").reset_index())
        out["numwait"] = out["numwait"].astype("int64")
        return out

    orders = (_t(sf_dir, "orders",
                 ["o_orderkey", "o_orderstatus", "o_orderdate"])
              .map_batches(order_rows, batch_format="pandas"))
    li = (_t(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_shipdate"])
          .map_batches(li_rows, batch_format="pandas"))
    parts = (orders.union(li)
             .repartition(max(1, n_buckets // 4))
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas")
             ).to_pandas()
    agg = (parts.groupby("skey")["numwait"].sum().reset_index()
           .sort_values(["numwait", "skey"], ascending=[False, True])
           .head(k))
    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    names = pd.Series(sup["s_name"].values, index=sup["s_suppkey"].values)
    return pd.DataFrame({
        "s_suppkey": agg["skey"].astype("int64").values,
        "s_name": names.reindex(agg["skey"]).values,
        "numwait": agg["numwait"].astype("int64").values}
    ).reset_index(drop=True)


def event_volume_anomaly(sf_dir: str, sigmas: int = 3) -> pd.DataFrame:
    """Per-type hourly VOLUME anomalies in exact integer arithmetic —
    the traffic-spike / dead-feed monitor every event pipeline runs.
    For each event_type, hourly counts over the GLOBAL hour range
    (zero-filled: silent hours are anomalies too) are tested against
    the type's own population mean/variance with the z-test cleared of
    division:  flag ⟺ (H·cnt − T)² > sigmas²·(H·S − T²), where H is
    the number of hours in range, T = Σcnt and S = Σcnt² — every term
    an exact int64, so engine and SQL agree bit-for-bit with no float
    contract at all (H ≤ ~10^4 hours, cnt ≤ ~10^6/hr keeps H·S well
    under 2^63; past that, widen to Python ints driver-side).

    Scale shape: one (type, hour, n) partial row per batch rides the
    combiner tree; the flag scan runs on the tiny merged histogram
    (types × active hours — the value_quantiles pattern); zero-filled
    hours are materialized only for the output's flagged rows. Output
    (event_type, hour_epoch, n, is_low) for flagged hours, sorted."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hrs = batch["ts"].astype("int64").to_numpy() // 3_600_000_000
        g = (pd.DataFrame({"event_type": batch["event_type"].values,
                           "hour_epoch": hrs})
             .groupby(["event_type", "hour_epoch"], sort=False)
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype("int64")
        return g

    hist = combine_partials(
        _t(sf_dir, "events", ["ts", "event_type"])
        .map_batches(partial, batch_format="pandas"),
        ["event_type", "hour_epoch"], {"n": "sum"}).to_pandas()
    if hist.empty:
        return pd.DataFrame({
            "event_type": pd.array([], dtype="string"),
            "hour_epoch": pd.array([], dtype="int64"),
            "n": pd.array([], dtype="int64"),
            "is_low": pd.array([], dtype="int64")})
    h_lo = int(hist["hour_epoch"].min())
    h_hi = int(hist["hour_epoch"].max())
    H = h_hi - h_lo + 1
    rows = []
    for et, g in hist.groupby("event_type"):
        full = (g.set_index("hour_epoch")["n"]
                .reindex(range(h_lo, h_hi + 1), fill_value=0)
                .astype("int64"))
        cnt = full.to_numpy()
        T = int(cnt.sum())
        S = int((cnt.astype(object) ** 2).sum())  # exact python ints
        rhs = sigmas * sigmas * (H * S - T * T)
        dev = H * cnt.astype(object) - T
        flag = (dev * dev) > rhs
        for hr, n, f, d in zip(full.index, cnt, flag, dev):
            if f:
                rows.append({"event_type": et, "hour_epoch": int(hr),
                             "n": int(n), "is_low": int(d < 0)})
    out = pd.DataFrame(rows, columns=["event_type", "hour_epoch",
                                      "n", "is_low"])
    if out.empty:
        return pd.DataFrame({
            "event_type": pd.array([], dtype="string"),
            "hour_epoch": pd.array([], dtype="int64"),
            "n": pd.array([], dtype="int64"),
            "is_low": pd.array([], dtype="int64")})
    for c in ("hour_epoch", "n", "is_low"):
        out[c] = out[c].astype("int64")
    return (out.sort_values(["event_type", "hour_epoch"])
            .reset_index(drop=True))


def session_gap_sweep(sf_dir: str,
                      gaps_minutes: tuple = (5, 10, 30, 60, 120),
                      n_buckets: int = 64) -> pd.DataFrame:
    """SESSION-GAP CALIBRATION curve: total session count at each
    candidate inactivity threshold — the sweep you run before fixing
    the gap every sessionization downstream depends on (the elbow of
    this curve IS the natural gap; Halfaker et al. 2015). ONE
    user-bucket co-partition pass sorts each user's events once and
    counts, per gap g, the inter-event deltas > g (sessions = user
    count + long-gap count — every threshold reuses the same sorted
    deltas, so G thresholds cost one shuffle, not G). Exact integer
    microsecond comparisons; output (gap_minutes, n_sessions)."""
    from ..stages.agg import combine_partials

    gaps_us = {int(g): np.int64(g) * 60_000_000 for g in gaps_minutes}

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[["user_id", "ts"]].copy()
        batch["bucket"] = batch["user_id"] % np.int64(n_buckets)
        return batch

    def counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        t = g["ts"].astype("int64").to_numpy()
        same_user = g["user_id"].eq(g["user_id"].shift()).to_numpy()
        delta = np.diff(t, prepend=t[0] if len(t) else 0)
        n_users = int(g["user_id"].nunique())
        rows = [{"gap_minutes": gm,
                 "n_sessions": n_users
                 + int(((delta > int(gu)) & same_user).sum())}
                for gm, gu in gaps_us.items()]
        out = pd.DataFrame(rows)
        out["gap_minutes"] = out["gap_minutes"].astype("int64")
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    df = combine_partials(
        _t(sf_dir, "events", ["user_id", "ts"])
        .map_batches(add_bucket, batch_format="pandas")
        .repartition(max(1, n_buckets // 4))
        .groupby("bucket").map_groups(counts, batch_format="pandas"),
        ["gap_minutes"], {"n_sessions": "sum"}).to_pandas()
    if df.empty or "gap_minutes" not in df.columns:
        # empty events table: zero sessions at every gap (typed, not
        # schema-less) — matches the oracle's gaps × (nu=0) frame
        return pd.DataFrame({
            "gap_minutes": pd.array(sorted(int(g) for g in gaps_minutes),
                                    dtype="int64"),
            "n_sessions": pd.array([0] * len(gaps_minutes),
                                   dtype="int64")})
    df["gap_minutes"] = df["gap_minutes"].astype("int64")
    df["n_sessions"] = df["n_sessions"].astype("int64")
    return df.sort_values("gap_minutes").reset_index(drop=True)


def event_user_gini(sf_dir: str) -> pd.DataFrame:
    """TRAFFIC-CONCENTRATION probe: the Gini coefficient of events per
    user — the one-number answer to "is this event stream a few bots or
    a real population?" (heavy-user concentration is the first thing a
    sampling plan must know). Exact arithmetic: per-user counts are
    ints; with users sorted by (count, user_id) the numerator
    Σ(2i−n−1)·x_i is an exact int64, and the single division
    quantizes floor(x·1e6+0.5) — hash-strict against a window-function
    oracle. Scale: per-user counts ride the combiner tree (one int per
    user per batch); the concentration scan runs on the user-count
    frame (user-dimension sized; at 10^12 events this is the
    rolled-up USER table, not the event stream)."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("user_id", sort=False).size()
        return pd.DataFrame({"user_id": g.index.astype("int64"),
                             "n": g.values.astype("int64")})

    cnt = combine_partials(
        _t(sf_dir, "events", ["user_id"]).map_batches(
            partial, batch_format="pandas"),
        ["user_id"], {"n": "sum"}).to_pandas()
    if cnt.empty or "user_id" not in cnt.columns:
        return pd.DataFrame({"n_users": pd.array([0], dtype="int64"),
                             "n_events": pd.array([0], dtype="int64"),
                             "gini_q": pd.array([0], dtype="int64")})
    cnt = cnt.sort_values(["n", "user_id"]).reset_index(drop=True)
    x = cnt["n"].to_numpy(np.int64)
    n = len(x)
    tot = int(x.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    num = int(((2 * i - n - 1) * x).sum())
    gini = num / (n * tot) if n and tot else 0.0
    return pd.DataFrame({
        "n_users": pd.array([n], dtype="int64"),
        "n_events": pd.array([tot], dtype="int64"),
        "gini_q": pd.array([int(np.floor(gini * 1e6 + 0.5))],
                           dtype="int64")})


def funnel_time_quantiles(sf_dir: str,
                          qs: tuple = (25, 50, 75, 90)) -> pd.DataFrame:
    """TIME-TO-CONVERT quantiles per funnel transition (view→click,
    click→purchase) — the latency view the first-reach funnel can't
    show (a funnel that converts in seconds and one that converts in
    days have the same depth histogram). Deltas are exact integer
    SECONDS (µs diff // 10^6, floor); per-transition quantiles use the
    repo's lower-rule histogram trick (need = ⌈q·n/100⌉, first value
    whose cumulative count reaches it) so everything is integer-exact
    against the SQL oracle. Scale: rides funnel_stages' one
    co-partition shuffle; per-batch (transition, delta_s, n) histogram
    partials sum through the combiner tree; the quantile scan runs on
    the tiny merged histogram. Output (transition, q, delta_s)."""
    from ..stages.agg import combine_partials

    funnel = funnel_stages(sf_dir)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for a, b, name in (("t_view", "t_click", "view_to_click"),
                           ("t_click", "t_purchase", "click_to_purchase")):
            m = (batch[a] >= 0) & (batch[b] >= 0)
            d = ((batch.loc[m, b].to_numpy(np.int64)
                  - batch.loc[m, a].to_numpy(np.int64)) // 1_000_000)
            g = pd.Series(d).value_counts()
            frames.append(pd.DataFrame({
                "transition": name,
                "delta_s": g.index.astype("int64"),
                "n": g.values.astype("int64")}))
        return pd.concat(frames, ignore_index=True)

    hist = combine_partials(
        funnel.map_batches(partial, batch_format="pandas"),
        ["transition", "delta_s"], {"n": "sum"}).to_pandas()
    if hist.empty or "transition" not in hist.columns:
        # no user completed any transition — Ray can return the all-empty
        # combine schema-less; keep the typed contract
        return pd.DataFrame({
            "transition": pd.array([], dtype="string"),
            "q": pd.array([], dtype="int64"),
            "delta_s": pd.array([], dtype="int64")})
    rows = []
    for tr, g in hist.groupby("transition"):
        g = g.sort_values("delta_s")
        cum = g["n"].astype("int64").cumsum().to_numpy()
        total = int(cum[-1])
        vals = g["delta_s"].to_numpy(np.int64)
        for q in qs:
            need = -(-q * total // 100)
            rows.append({"transition": tr, "q": q,
                         "delta_s": int(vals[(cum >= need).argmax()])})
    out = pd.DataFrame(rows, columns=["transition", "q", "delta_s"])
    out["q"] = out["q"].astype("int64")
    out["delta_s"] = out["delta_s"].astype("int64")
    return (out.sort_values(["transition", "q"])
            .reset_index(drop=True))


def event_trigrams(sf_dir: str, k: int = 25,
                   n_buckets: int = 64) -> pd.DataFrame:
    """Top-k event PATH trigrams ((t1, t2, t3) of consecutive same-user
    events in (ts, event_id) order) — the path-mining extension of
    event_transitions' Markov bigram table: a second-order pattern
    (view→click→purchase vs view→click→view) that a bigram table cannot
    distinguish. Same one-shuffle user-bucket co-partition, vectorized
    double-shift per bucket, (t1,t2,t3,n) partials through the combiner
    tree; global top-k by (n desc, t1, t2, t3) on the type³-bounded
    frame. Hash-strict."""
    from ..stages.agg import combine_partials

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bucket": (batch["user_id"] % np.int64(n_buckets)),
            "user_id": batch["user_id"].values,
            "event_id": batch["event_id"].values,
            "event_type": batch["event_type"].values,
            "ts": batch["ts"].values})

    def tris(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        same1 = g["user_id"].eq(g["user_id"].shift())
        same2 = g["user_id"].eq(g["user_id"].shift(2))
        m = same1 & same2
        vc = (pd.DataFrame({"t1": g["event_type"].shift(2)[m],
                            "t2": g["event_type"].shift(1)[m],
                            "t3": g["event_type"][m]})
              .value_counts())
        out = vc.reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    df = combine_partials(
        _t(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
        .map_batches(add_bucket, batch_format="pandas")
        .repartition(max(1, n_buckets // 4))
        .groupby("bucket").map_groups(tris, batch_format="pandas"),
        ["t1", "t2", "t3"], {"n": "sum"}).to_pandas()
    if df.empty or "t1" not in df.columns:
        return pd.DataFrame({
            "t1": pd.array([], dtype="string"),
            "t2": pd.array([], dtype="string"),
            "t3": pd.array([], dtype="string"),
            "n": pd.array([], dtype="int64")})
    df["n"] = df["n"].astype("int64")
    return (df.sort_values(["n", "t1", "t2", "t3"],
                           ascending=[False, True, True, True])
            .head(k).reset_index(drop=True))


def rfm_segments(sf_dir: str, n_buckets: int = 32) -> pd.DataFrame:
    """RFM SEGMENTATION of the customer base (recency / frequency /
    monetary — the classic marketing-analytics rollup): per customer,
    days since last order relative to the corpus's max order date,
    order count, and lifetime spend in integer cents; each dimension
    buckets on FIXED integer edges (recency: 30-day months capped at 4;
    frequency: counts capped at 5; monetary: 100k-cent bands capped at
    4) so the whole computation is exact integer arithmetic —
    hash-strict with no quantile estimation and no float contract.
    Scale: per-customer (max date, count, cents) partials ride the
    combiner tree keyed by custkey (customer-dimension sized — the
    rolled-up entity table, never the order stream); the bucket rollup
    runs on that entity frame (the event_user_gini pattern). Output
    (r_bucket, f_bucket, m_bucket, n_customers) sorted."""
    from ..stages.agg import combine_partials

    def cust_partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["o_orderdate"].astype("int64").to_numpy() \
            // 86_400_000_000
        cents = np.rint(batch["o_totalprice"].to_numpy() * 100) \
            .astype("int64")
        g = (pd.DataFrame({"custkey": batch["o_custkey"].values,
                           "last_day": d, "n": 1, "cents": cents})
             .groupby("custkey", sort=False)
             .agg(last_day=("last_day", "max"), n=("n", "sum"),
                  cents=("cents", "sum")).reset_index())
        for c in ("last_day", "n", "cents"):
            g[c] = g[c].astype("int64")
        return g

    cust = combine_partials(
        _t(sf_dir, "orders", ["o_custkey", "o_orderdate",
                              "o_totalprice"])
        .map_batches(cust_partial, batch_format="pandas"),
        ["custkey"], {"last_day": "max", "n": "sum", "cents": "sum"})

    # corpus max day rides the same partials: take max over the frame
    cdf = cust.to_pandas()
    if cdf.empty or "custkey" not in cdf.columns:
        return pd.DataFrame({
            "r_bucket": pd.array([], dtype="int64"),
            "f_bucket": pd.array([], dtype="int64"),
            "m_bucket": pd.array([], dtype="int64"),
            "n_customers": pd.array([], dtype="int64")})
    max_day = int(cdf["last_day"].max())
    r = np.minimum((max_day - cdf["last_day"].to_numpy(np.int64)) // 30,
                   4)
    f = np.minimum(cdf["n"].to_numpy(np.int64), 5)
    m = np.minimum(cdf["cents"].to_numpy(np.int64) // 10_000_000, 4)
    out = (pd.DataFrame({"r_bucket": r, "f_bucket": f, "m_bucket": m})
           .groupby(["r_bucket", "f_bucket", "m_bucket"], sort=True)
           .size().reset_index(name="n_customers"))
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def user_activity_span(sf_dir: str) -> pd.DataFrame:
    """Per-user lifetime summary: first/last event timestamp (int64 µs),
    event count, and span — the user-table rollup every event warehouse
    materializes. Per-batch (user, min, max, n) partials collapse the
    event stream to user-sized rows before the shuffle; the combine uses
    mode='bucket' because the user key-space is corpus-scale (the
    documented combiner escape hatch), so no single task ever holds the
    full user table."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts"].astype("int64")
        g = (pd.DataFrame({"user_id": batch["user_id"].values, "ts": ts})
             .groupby("user_id", sort=False)["ts"]
             .agg(first_us="min", last_us="max", n_events="size")
             .reset_index())
        for c in ("user_id", "first_us", "last_us", "n_events"):
            g[c] = g[c].astype("int64")
        return g

    out = combine_partials(
        _t(sf_dir, "events", ["user_id", "ts"])
        .map_batches(partial, batch_format="pandas"),
        ["user_id"], {"first_us": "min", "last_us": "max",
                      "n_events": "sum"}, mode="bucket").to_pandas()
    out["span_us"] = (out["last_us"] - out["first_us"]).astype("int64")
    for c in ("user_id", "first_us", "last_us", "n_events"):
        out[c] = out[c].astype("int64")
    return (out[["user_id", "first_us", "last_us", "n_events", "span_us"]]
            .sort_values("user_id").reset_index(drop=True))


def monthly_revenue_growth(sf_dir: str) -> pd.DataFrame:
    """Month-over-month revenue delta in exact integer cents (the
    growth-curve audit): per-batch (yyyymm, cents) partials ride the
    combiner tree (months are a tiny key space), the driver diffs the
    ordered month series. First month's delta is 0 by convention —
    COALESCE(lag, cents) both sides."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = pd.DatetimeIndex(batch["o_orderdate"])
        ym = (d.year * 100 + d.month).astype("int64")
        cents = np.rint(batch["o_totalprice"].values * 100).astype("int64")
        g = (pd.DataFrame({"ym": ym, "revenue_c": cents})
             .groupby("ym", sort=False)["revenue_c"].sum().reset_index())
        g["revenue_c"] = g["revenue_c"].astype("int64")
        return g

    hist = combine_partials(
        _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pandas"),
        ["ym"], {"revenue_c": "sum"}).to_pandas()
    hist = hist.sort_values("ym").reset_index(drop=True)
    hist["ym"] = hist["ym"].astype("int64")
    hist["revenue_c"] = hist["revenue_c"].astype("int64")
    prev = hist["revenue_c"].shift(1).fillna(0).astype("int64")
    growth = hist["revenue_c"] - prev
    growth.iloc[:1] = 0
    hist["growth_c"] = growth.astype("int64")
    return hist


def supplier_balance_deciles(sf_dir: str) -> pd.DataFrame:
    """Exact supplier account-balance deciles in integer cents — the
    lower-rule histogram trick (value_quantiles over a dimension table):
    per-batch (cents, n) partials, the decile scan runs on the merged
    histogram. Negative balances keep exact cent values via rint."""
    from ..stages.agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(batch["s_acctbal"].values * 100).astype("int64")
        g = (pd.DataFrame({"v": cents}).groupby("v")
             .size().reset_index(name="n"))
        g["n"] = g["n"].astype("int64")
        return g

    hist = combine_partials(
        _t(sf_dir, "supplier", ["s_acctbal"])
        .map_batches(partial, batch_format="pandas"),
        ["v"], {"n": "sum"}).to_pandas().sort_values("v")
    cum = hist["n"].astype("int64").cumsum().to_numpy()
    total = int(cum[-1])
    vs = hist["v"].to_numpy()
    rows = []
    for q in range(10, 101, 10):
        need = -(-q * total // 100)
        rows.append({"q": q, "bal_c": int(vs[(cum >= need).argmax()])})
    out = pd.DataFrame(rows)
    out["q"] = out["q"].astype("int64")
    out["bal_c"] = out["bal_c"].astype("int64")
    return out
