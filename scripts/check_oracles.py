"""Local replica of the driver's correctness harness: run every queries()
entry and, where an oracle exists, compare against DuckDB on the same
parquet views (row count + order-insensitive, column-name-sorted values).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return pd.DataFrame(result)


def normalize(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(9)
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) \
        else "/root/testdata/sf0.001"
    only = [a for a in sys.argv[1:] if not os.path.isdir(a)]

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from cqi_ray.runtime import tune_data_context
    tune_data_context()

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        elapsed = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name:18s} rows={len(mine):7d} ({elapsed:.1f}s, rows-only)")
            continue
        try:
            oracle = normalize(con.execute(oracles[name]).df())
        except Exception as exc:
            print(f"FAIL {name}: oracle raised {exc}")
            failures += 1
            continue
        if list(mine.columns) != list(oracle.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(oracle.columns)}")
            failures += 1
            continue
        if len(mine) != len(oracle):
            print(f"FAIL {name}: rows {len(mine)} vs {len(oracle)}")
            failures += 1
            continue
        if not mine.equals(oracle):
            neq = (mine != oracle) & ~(mine.isna() & oracle.isna())
            bad_rows = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad_rows.sum())} mismatched rows; first:")
            print(mine[bad_rows].head(3))
            print(oracle[bad_rows].head(3))
            failures += 1
            continue
        print(f"PASS {name:18s} rows={len(mine):7d} ({elapsed:.1f}s)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
