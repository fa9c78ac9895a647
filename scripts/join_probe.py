"""Isolate the bucketed-join 40M anomaly from relational_scale_experiment:
run bucketed_hash_join on the same synthesized fact⨝dim input REPEATS
times in one fresh session, print per-run wall + the final run's stage
stats tail.  Usage: python scripts/join_probe.py [scale] [cpus] [repeats]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 2
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
REPEATS = int(sys.argv[3]) if len(sys.argv) > 3 else 2

G = 100_000
N = max(G, int(20_000_000 * SCALE) // G * G)
CNT = N // G


def main() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from cqi_ray.relational import bucketed_hash_join
    from cqi_ray.runtime import tune_data_context
    tune_data_context()

    def synth(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"id": i, "k": i % G, "v": i,
                             "p": (i * np.int64(7)) % N})

    def dim_synth(batch: pd.DataFrame) -> pd.DataFrame:
        j = batch["id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"k": j, "w": 3 * j + 1})

    blocks = max(NUM_CPUS * 4, 64)
    fact = rd.range(N, override_num_blocks=blocks) \
        .map_batches(synth, batch_format="pandas").materialize()
    dim = rd.range(G).map_batches(dim_synth, batch_format="pandas") \
        .materialize()
    truth_w = CNT * int(3 * (G - 1) * G // 2 + G)

    best: dict = {}
    for r in range(REPEATS):
        for plan in ("dataset", "tasks"):
            t0 = time.perf_counter()
            joined = bucketed_hash_join(fact, dim, on="k",
                                        right_cols=["k", "w"],
                                        num_buckets=max(32, NUM_CPUS),
                                        restore_dtypes={"w": "int64"},
                                        plan=plan)
            parts = joined.map_batches(
                lambda b: pd.DataFrame({"s": [np.int64(b["w"].to_numpy()
                                                       .sum())],
                                        "n": [np.int64(len(b))]}),
                batch_format="pandas")
            pdf = parts.to_pandas()
            dt = time.perf_counter() - t0
            ok = int(pdf["n"].sum()) == N and int(pdf["s"].sum()) == truth_w
            best[plan] = min(best.get(plan, 1e9), dt)
            print(json.dumps({"plan": plan, "run": r, "sec": round(dt, 2),
                              "exact": ok}))
    print(json.dumps({"n": N, "best": {k: round(v, 2)
                                       for k, v in best.items()}}))
    ray.shutdown()


if __name__ == "__main__":
    main()
