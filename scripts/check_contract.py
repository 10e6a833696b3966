"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry at the given sf_dir and compare row-count/schema/values
against ``oracle_sql()`` via DuckDB (order-insensitive, columns sorted by
name). Rows-only entries are just executed and counted.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(obj, ray.data.Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ours = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(f"[rows-only] {name}: {len(ours)} rows in {dt:.1f}s")
            continue
        theirs = canon(con.sql(sqls[name]).df())
        ok_rows = len(ours) == len(theirs)
        ok_cols = list(ours.columns) == list(theirs.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    ours.reset_index(drop=True),
                    theirs.reset_index(drop=True),
                    check_dtype=False,
                    check_exact=True,
                )
                ok_vals = True
            except AssertionError as e:
                print(f"  detail: {str(e)[:300]}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"[{status}] {name}: ours={len(ours)}x{len(ours.columns)} "
            f"oracle={len(theirs)}x{len(theirs.columns)} in {dt:.1f}s"
        )
        if not ok_cols:
            print(f"  cols ours={list(ours.columns)} oracle={list(theirs.columns)}")
    print("FAILURES:", failures or "none")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
