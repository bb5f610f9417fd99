"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() side-by-side, compare row count, schema (by
sorted column names) and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def to_pandas(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"ERROR  {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS   {name}: {len(mine)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"ERROR  {name}: oracle raised {ex}")
            n_fail += 1
            continue
        a, b = canon(mine), canon(want)
        if list(a.columns) != list(b.columns):
            print(f"FAIL   {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL   {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        # HASH-STRICT compare, mirroring the driver: sorted columns, sorted
        # rows, byte-level serialization — an int64 vs float64 mismatch
        # FAILS here even when values are numerically equal (that is the
        # exact bug class that slipped through round 1's tolerant gate).
        ha = pd.util.hash_pandas_object(a, index=False).values.tobytes()
        hb = pd.util.hash_pandas_object(b, index=False).values.tobytes()
        dtypes_eq = list(map(str, a.dtypes)) == list(map(str, b.dtypes))
        if ha == hb and dtypes_eq:
            print(f"PASS   {name}: {len(a)} rows (hash-strict)")
            n_pass += 1
            continue
        n_fail += 1
        if not dtypes_eq:
            print(f"FAIL   {name}: dtype mismatch "
                  f"{dict(zip(a.columns, map(str, a.dtypes)))} vs "
                  f"{dict(zip(b.columns, map(str, b.dtypes)))}")
        # tolerant diagnosis: are the values at least numerically equal?
        import numpy as np

        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                close = np.allclose(av.astype(float), bv.astype(float),
                                    rtol=0, atol=1e-9, equal_nan=True)
            except (ValueError, TypeError):
                close = (av.astype(str) == bv.astype(str)).all()
            if not close:
                print(f"FAIL   {name}: column {c} VALUES differ")
                print(pd.concat({"mine": av, "oracle": bv}, axis=1)
                      [(av.astype(str) != bv.astype(str))].head())
                break
        else:
            if dtypes_eq:
                print(f"FAIL   {name}: values numerically equal but hashes "
                      f"differ (representation/ordering)")
    print(f"== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
