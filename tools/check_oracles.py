"""Local stand-in for the driver's correctness gate: run every
queries() entry AND its oracle SQL at a given sf, compare row count,
column names, and order-insensitive values.  Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd


def to_df(out) -> pd.DataFrame:
    if isinstance(out, pd.DataFrame):
        return out
    if hasattr(out, "to_pandas"):
        return out.to_pandas()
    return pd.DataFrame(out)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    sys.path.insert(0, "/root/repo")
    from go_osm_search_ray.pipelines import queries as q

    failures = []
    for name, (fn, sql) in q.registry(sf).items():
        if only and name not in only:
            continue
        import time

        t0 = time.perf_counter()
        try:
            got = canon(to_df(fn(sf)))
        except Exception as e:
            print(f"FAIL {name}: ray error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.perf_counter() - t0
        if sql is None:
            print(f"ok   {name}: rows={len(got)} (rows-only) [{dt:.1f}s]")
            continue
        try:
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: sql error: {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            failures.append(name)
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            failures.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"ok   {name}: rows={len(got)} values-match [{dt:.1f}s]")
        except AssertionError:
            # retry with tolerance to show whether it's an ulp-level diff
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              atol=1e-9, rtol=0)
                print(f"WARN {name}: rows={len(got)} values within 1e-9 but not exact")
                failures.append(name + " (tolerance)")
            except AssertionError as e:
                print(f"FAIL {name}: value mismatch: {str(e)[:300]}")
                failures.append(name)

    ray.shutdown()
    if failures:
        print("\nFAILURES:", failures)
        sys.exit(1)
    print("\nALL MATCH")


if __name__ == "__main__":
    main()
