"""Event/temporal-family scale spot-check: the window / sessionization /
streaming ops at 5-10M events, oracle-checked EXACTLY at that scale.

The sf0.1 events table caps at 100k rows, so the temporal family's suite
timings are executor-floor-bound and its oracle checks only ever see
small inputs.  This experiment synthesizes an events table 50-100x
larger in the driver's exact schema (event_id, ts[us], user_id,
event_type, value, props — same value domains, same 30-day span, users
scaled with N), reuses every other table from the base sf dir, and runs
the PRODUCTION queries() entries against their REGISTERED DuckDB
oracles on the same parquet — the identical exact-compare harness the
driver uses, just 100x bigger.  No new truth derivations: DuckDB is the
independent referee at every scale it can hold.

Default query list = the event-family ops whose outputs stay
comparable at this size (aggregates, per-user reductions, runs) plus
three full-row-level window ops (the expensive compares).

Usage: python scripts/event_scale_experiment.py [n_events] [num_cpus] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

BASE_SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _arg(i: int, default: int) -> int:
    try:
        return int(sys.argv[i])
    except (IndexError, ValueError):
        return default


N = _arg(1, 5_000_000)
NUM_CPUS = _arg(2, 32)
ONLY = [a for a in sys.argv[3:]]

DEFAULT_QUERIES = [
    "events_agg", "window_tumbling", "window_hopping", "sessionize",
    "window_running", "rolling_time", "anomalies", "group_mad",
    "transitions", "retention", "resample", "debounce", "funnel",
    "islands", "interval_sweep", "cadence", "ewma", "cusum",
    "feature_snapshot", "window_lead", "zscore", "wow_change",
    "json_extract", "scd2_merge",
]

EVENT_TYPES = np.array(["click", "view", "purchase", "signup", "error"])
SPAN_US = 30 * 24 * 3600 * 1_000_000  # 30 days, like the base table
T0_US = 1_704_067_200_000_000        # 2024-01-01 UTC in epoch µs


def _mix(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def synth_events(path: str, n: int) -> None:
    """Deterministic events parquet in the driver's exact schema; ts is
    increasing with event_id (uniform-jittered over the 30-day span) —
    the same shape as the base table, 100x denser."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_users = max(1500, (n // 100_000) * 1500)  # scale users with N
    writer = None
    step = 2_000_000
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        i = np.arange(lo, hi, dtype=np.uint64)
        # increasing timestamps: slot grid + sub-slot jitter
        slot = SPAN_US // n
        ts = (T0_US + i.astype(np.int64) * slot
              + (_mix(i) % np.uint64(max(slot, 1))).astype(np.int64))
        tbl = pa.table({
            "event_id": pa.array(i.astype(np.int64)),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(
                (_mix(i * np.uint64(3) + np.uint64(1))
                 % np.uint64(n_users)).astype(np.int64)),
            "event_type": pa.array(
                EVENT_TYPES[(_mix(i * np.uint64(5) + np.uint64(2))
                             % np.uint64(5)).astype(np.int64)]),
            "value": pa.array(
                (_mix(i * np.uint64(7) + np.uint64(3))
                 % np.uint64(56021)).astype(np.float64) / 100.0),
            "props": pa.array(np.char.add(np.char.add(
                '{"k": ',
                (_mix(i * np.uint64(11) + np.uint64(4))
                 % np.uint64(100)).astype(np.int64).astype(str)), "}")),
        })
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
    if writer is not None:
        writer.close()


def main() -> None:
    import duckdb
    import ray

    from check_oracles import TABLES, normalize, to_pandas

    sf_dir = f"/tmp/cqi_event_scale_{N}"
    os.makedirs(sf_dir, exist_ok=True)
    t0 = time.monotonic()
    events_path = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(events_path):
        synth_events(events_path, N)
    for t in TABLES:
        if t == "events":
            continue
        dst = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(BASE_SF, f"{t}.parquet"), dst)
    print(json.dumps({"experiment": "event_family_scale", "n_events": N,
                      "num_cpus": NUM_CPUS, "sf_dir": sf_dir,
                      "synth_sec": round(time.monotonic() - t0, 2)}),
          flush=True)

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from cqi_ray.runtime import tune_data_context

    tune_data_context()
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    names = ONLY or DEFAULT_QUERIES
    fails = 0
    total_engine = 0.0
    for name in names:
        t0 = time.monotonic()
        mine = normalize(to_pandas(qs[name](sf_dir)))
        engine_sec = time.monotonic() - t0
        total_engine += engine_sec
        t0 = time.monotonic()
        oracle = normalize(con.execute(oracles[name]).df())
        oracle_sec = time.monotonic() - t0
        ok = (list(mine.columns) == list(oracle.columns)
              and len(mine) == len(oracle) and mine.equals(oracle))
        fails += 0 if ok else 1
        print(json.dumps({
            "query": name, "rows": int(len(mine)), "exact": bool(ok),
            "engine_sec": round(engine_sec, 2),
            "oracle_sec": round(oracle_sec, 2),
            "events_per_sec": round(N / max(engine_sec, 1e-9), 1)}),
            flush=True)
    print(json.dumps({"experiment": "event_family_scale", "n_events": N,
                      "num_cpus": NUM_CPUS, "queries": len(names),
                      "all_exact": bool(fails == 0),
                      "engine_total_sec": round(total_engine, 2)}),
          flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
