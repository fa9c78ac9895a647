"""Relational-family scale spot-check: joins / group-by / dedup / sort
at tens of millions of rows with EXACT closed-form truth.

The sf0.1 tables cap at ~600k lineitem rows, so the relational core's
suite timings never exercise the shuffle plans (bucketed hash join,
salted skew join, bucketed distinct/anti-join, range-partitioned global
row numbers, histogram-refinement quantiles) beyond per-task-floor
scale.  This experiment synthesizes a fact⨝dim workload DISTRIBUTED
(rows unranked per block inside map_batches from a closed-form index
layout — no driver loop, no parquet staging) and runs the production
relational ops unchanged.

FACT (n rows, from global index i in [0, n)):
    id = i
    k  = i % G                 group / join key, G groups, cnt = n/G each
    v  = i                     group-sum payload (int64-exact totals)
    p  = (i * PERM) % n        exact permutation of [0, n): sort /
                               quantile / row-number truth is closed-form
SKEWED FACT: k = HOT for i < n*hot_frac else i % G — the classic hot-key
    straggler shape for the salted-vs-bucketed join comparison.
DIM (G rows): k = j, w = 3j + 1.

Closed-form truths asserted (all integer-exact, verified via
DISTRIBUTED partial reductions — the driver only sees O(G) aggregates):

* partial_then_global_sum : per-group sum_v = cnt*g + G*cnt*(cnt-1)/2,
                            per-group cnt = n/G, all G groups present.
* bucketed_hash_join      : |join| = n; sum over joined rows of w
                            = cnt * sum_g(3g+1).
* salted_hash_join        : same truth on the skewed fact; timed against
                            bucketed_hash_join on the SAME skewed input.
* distinct_rows           : exactly G rows; sum k = G(G-1)/2.
* bucketed_anti_join      : keys >= G/2 survive -> n/2 rows, closed-form
                            sum of v.
* bucketed_set_op         : |fact_keys ∩ [0,G/2)| = G/2,
                            |fact_keys \\ [0,G/2)| = G/2.
* exact_dedup             : min-v row per key is i = k -> G rows, v == k
                            for every survivor.
* global_row_number       : rn(p) == p + 1 for ALL n rows (p is a
                            permutation), total == n.
* global_exact_quantiles  : quantile_disc(q) over a permutation of
                            [0, n) == ceil(q*n) - 1 exactly.

Reported per op: wall sec, rows/s, exact flag.  ``scale_mult``
multiplies the fact row count (G fixed, so per-group truth scales in
cnt only) for the linearity check.

Usage: python scripts/relational_scale_experiment.py [scale_mult] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = int(sys.argv[1]) if len(sys.argv) > 1 else 1
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32

N_FACT = 20_000_000 * SCALE
G = 100_000                      # groups; cnt = N_FACT / G rows each
PERM = 982_451_653               # prime, coprime with N_FACT (n = 2^a*5^b*SCALE')
# skewed fact: this fraction lands on ONE key (argv[3] probes the
# salted-vs-bucketed crossover; at 0.10 the plain bucketed join WINS)
HOT_FRAC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.10
HOT_KEY = 7

assert N_FACT % G == 0
CNT = N_FACT // G
assert np.gcd(PERM, N_FACT) == 1, "PERM must be coprime with N_FACT"
# hot-row count rounded to a group multiple so the skew-join truth stays
# closed-form (rest rows split evenly over the G groups)
N_HOT = (int(N_FACT * HOT_FRAC) // G) * G


def make_fact(n: int, skewed: bool):
    """Closed-form global-index -> fact-row unranker (runs per block)."""

    def synth(batch: pd.DataFrame) -> pd.DataFrame:
        i = batch["id"].to_numpy(dtype=np.int64)
        k = i % G
        if skewed:
            k = np.where(i < N_HOT, HOT_KEY, k)
        # (i * PERM) % n without int64 overflow: object math is slow, so
        # split i = hi*2^20 + lo; both partial products stay < 2^63.
        lo = i & 0xFFFFF
        hi = i >> 20
        p = ((hi * (PERM % n) % n) * ((1 << 20) % n) + lo * (PERM % n)) % n
        return pd.DataFrame({"id": i, "k": k.astype(np.int64),
                             "v": i, "p": p.astype(np.int64)})

    return synth


def dim_synth(batch: pd.DataFrame) -> pd.DataFrame:
    j = batch["id"].to_numpy(dtype=np.int64)
    return pd.DataFrame({"k": j, "w": 3 * j + 1})


def dist_sum(ds, col: str) -> int:
    """Distributed int64 sum — per-block partials, tiny driver fold."""
    parts = ds.map_batches(
        lambda b: pd.DataFrame({"s": [np.int64(b[col].to_numpy().sum())],
                                "n": [np.int64(len(b))]}),
        batch_format="pandas").to_pandas()
    return int(parts["s"].sum()), int(parts["n"].sum())


def main() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from cqi_ray.relational import (bucketed_anti_join, bucketed_hash_join,
                                    bucketed_set_op, distinct_rows,
                                    exact_dedup, global_exact_quantiles,
                                    global_row_number, partial_then_global_sum,
                                    salted_hash_join)
    from cqi_ray.runtime import tune_data_context

    tune_data_context()
    blocks = max(NUM_CPUS * 4, 64)
    buckets = max(32, NUM_CPUS)

    fact = rd.range(N_FACT, override_num_blocks=blocks) \
        .map_batches(make_fact(N_FACT, skewed=False),
                     batch_format="pandas").materialize()
    skew = rd.range(N_FACT, override_num_blocks=blocks) \
        .map_batches(make_fact(N_FACT, skewed=True),
                     batch_format="pandas").materialize()
    dim = rd.range(G).map_batches(dim_synth, batch_format="pandas") \
        .materialize()
    half = rd.range(G // 2).map_batches(dim_synth, batch_format="pandas") \
        .materialize()
    print(json.dumps({"experiment": "relational_scale", "fact_rows": N_FACT,
                      "groups": G, "scale_mult": SCALE,
                      "num_cpus": NUM_CPUS}))

    results: dict[str, dict] = {}

    def record(name: str, dt: float, ok: bool, **extra) -> None:
        results[name] = {"sec": round(dt, 2),
                         "rows_per_sec": round(N_FACT / dt), "exact": ok,
                         **extra}
        print(json.dumps({"op": name, **results[name]}))

    # --- group-by aggregation (combiner + bucketed reduce) ---------------
    t0 = time.perf_counter()
    agg = partial_then_global_sum(fact, ["k"], {"v": "sum_v"}, counts="cnt",
                                  num_buckets=buckets).to_pandas()
    dt = time.perf_counter() - t0
    agg = agg.sort_values("k").reset_index(drop=True)
    g = np.arange(G, dtype=np.int64)
    want = CNT * g + G * (CNT * (CNT - 1) // 2)
    ok = (len(agg) == G and (agg["k"].to_numpy() == g).all()
          and (agg["cnt"].to_numpy() == CNT).all()
          and (agg["sum_v"].to_numpy() == want).all())
    record("groupby_sum", dt, bool(ok), groups=int(len(agg)))

    # --- fact ⨝ dim bucketed hash join ------------------------------------
    truth_w = CNT * int(3 * (G - 1) * G // 2 + G)   # cnt * sum(3g+1)
    t0 = time.perf_counter()
    joined = bucketed_hash_join(fact, dim, on="k", right_cols=["k", "w"],
                                num_buckets=buckets,
                                restore_dtypes={"w": "int64"})
    s, n = dist_sum(joined, "w")
    dt = time.perf_counter() - t0
    record("join_bucketed", dt, bool(n == N_FACT and s == truth_w),
           join_rows=n)

    # --- skewed fact: bucketed (straggler) vs salted ----------------------
    hot_w = 3 * HOT_KEY + 1
    # rows i >= N_HOT keep k = i % G: per group g, count of i in
    # [N_HOT, N) with i%G==g; N_HOT and N are both multiples of G.
    rest_cnt = (N_FACT - N_HOT) // G
    truth_skew = N_HOT * hot_w + rest_cnt * int(3 * (G - 1) * G // 2 + G)
    for name, fn, kw in (
            ("join_skew_bucketed", bucketed_hash_join,
             {"restore_dtypes": {"w": "int64"}}),
            ("join_skew_salted", salted_hash_join, {"salts": NUM_CPUS})):
        t0 = time.perf_counter()
        j = fn(skew, dim, on="k", right_cols=["k", "w"],
               num_buckets=buckets, **kw)
        s, n = dist_sum(j, "w")
        dt = time.perf_counter() - t0
        record(name, dt, bool(n == N_FACT and s == truth_skew))

    # --- DISTINCT over the key -------------------------------------------
    t0 = time.perf_counter()
    d = distinct_rows(fact, ["k"], num_buckets=buckets)
    s, n = dist_sum(d, "k")
    dt = time.perf_counter() - t0
    record("distinct", dt, bool(n == G and s == G * (G - 1) // 2))

    # --- anti join: keys >= G/2 survive ------------------------------------
    # survivors are i with i%G >= G/2: per group g in [G/2, G) sum_v is the
    # groupby truth; total = cnt*sum(g) + (G/2)*G*cnt*(cnt-1)/2.
    hi_g = np.arange(G // 2, G, dtype=np.int64)
    truth_anti = int(CNT * hi_g.sum() + (G // 2) * G * (CNT * (CNT - 1) // 2))
    t0 = time.perf_counter()
    aj = bucketed_anti_join(fact, half, on="k", num_buckets=buckets)
    s, n = dist_sum(aj, "v")
    dt = time.perf_counter() - t0
    record("anti_join", dt, bool(n == N_FACT // 2 and s == truth_anti))

    # --- set ops over the key domain ---------------------------------------
    t0 = time.perf_counter()
    inter = bucketed_set_op(fact, half, on="k", op="intersect",
                            num_buckets=buckets)
    si, ni = dist_sum(inter, "k")
    exc = bucketed_set_op(fact, half, on="k", op="except",
                          num_buckets=buckets)
    se, ne = dist_sum(exc, "k")
    dt = time.perf_counter() - t0
    h = G // 2
    record("set_ops", dt,
           bool(ni == h and si == h * (h - 1) // 2
                and ne == h and se == G * (G - 1) // 2 - h * (h - 1) // 2))

    # --- exact dedup: keep min-v row per key -> row i = k ------------------
    t0 = time.perf_counter()
    dd = exact_dedup(fact, key="k", order_col="v")
    bad = dd.map_batches(
        lambda b: pd.DataFrame({"bad": [int((b["v"].to_numpy()
                                             != b["k"].to_numpy()).sum())],
                                "n": [len(b)]}),
        batch_format="pandas").to_pandas()
    dt = time.perf_counter() - t0
    record("exact_dedup", dt,
           bool(int(bad["n"].sum()) == G and int(bad["bad"].sum()) == 0))

    # --- global row numbers over the permutation column --------------------
    t0 = time.perf_counter()
    ranked, total = global_row_number(fact, value_col="p", id_col="id",
                                      parts=buckets)
    bad = ranked.map_batches(
        lambda b: pd.DataFrame({"bad": [int((b["rn"].to_numpy()
                                             != b["p"].to_numpy() + 1).sum())],
                                "n": [len(b)]}),
        batch_format="pandas").to_pandas()
    dt = time.perf_counter() - t0
    record("global_row_number", dt,
           bool(total == N_FACT and int(bad["n"].sum()) == N_FACT
                and int(bad["bad"].sum()) == 0))

    # --- exact global quantiles over the permutation -----------------------
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    t0 = time.perf_counter()
    qdf = global_exact_quantiles(fact, "p", qs)
    dt = time.perf_counter() - t0
    got = {float(r["q"]): int(r["val"]) for _, r in qdf.iterrows()}
    want_q = {q: int(np.ceil(q * N_FACT)) - 1 for q in qs}
    record("quantiles", dt, bool(got == want_q), values=got)

    all_ok = all(r["exact"] for r in results.values())
    print(json.dumps({"experiment": "relational_scale", "fact_rows": N_FACT,
                      "scale_mult": SCALE, "num_cpus": NUM_CPUS,
                      "all_exact": all_ok,
                      "total_sec": round(sum(r["sec"]
                                             for r in results.values()), 2)}))
    ray.shutdown()
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
