"""Graph-family scale spot-check: the adaptive plans at millions of edges.

The sf0.1 copurchase graph caps at ~100k edges, so the graph ops' suite
timings never exercise the plan switches (broadcast vs bucketed wedge
closure, pointer-doubling depth) beyond toy scale.  This experiment
synthesizes a graph DISTRIBUTED (edges unranked per block inside
map_batches from a closed-form index layout — no driver loop, no
parquet staging) with EXACT analytic ground truth, and runs the
production graph ops unchanged:

* ``connected_components``   — pointer doubling; chains of length L
  force the full O(log L) doubling depth (~14 rounds at L=10k).
* ``triangle_count``         — BOTH plans: the default broadcast
  closure and the forced bucketed wedge⋈edge semi-join
  (``broadcast_below=0``), asserted equal to each other and to the
  analytic count.
* ``clustering_coefficients``— per-node exactness by structure class.
* ``kcore_decompose``        — k = s-1 keeps exactly the clique nodes.

Graph = disjoint union with closed-form truth:
  CLIQUES  n_clq cliques of size s   -> n_clq*C(s,2) edges,
           n_clq*C(s,3) triangles, coeff 1.0, one component each;
  CHAINS   n_chn paths of length L   -> pointer-doubling depth stress;
  STARS    n_str hubs with f leaves  -> hub-skew guard (degree f), no
           triangles, all wedges orient INTO the hub (out-deg <= 1).

Structure sizes (s, L, f+1) are pairwise distinct so the component-size
histogram identifies every structure class.

Reported per op: wall sec, edges/s, exact_match.  Scale A ~2.0M edges;
``scale_mult`` multiplies structure COUNTS (sizes fixed, so CC depth
and per-structure truth are scale-invariant) for the linearity check.

Usage: python scripts/graph_scale_experiment.py [scale_mult] [num_cpus]
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

S_CLQ, N_CLQ = 150, 48 * SCALE        # clique size / count
L_CHN, N_CHN = 10_000, 64 * SCALE     # chain length / count
F_STR, N_STR = 100_000, 8 * SCALE     # star leaf count / count


def make_synth(s_clq, n_clq, l_chn, n_chn, f_str, n_str):
    """Closed-form global-edge-index -> (a, b) unranker (a < b always).

    Layout: [0, E_clq) clique edges, then chain edges, then star edges.
    Within a clique, pair rank r -> (i, j) is the lexicographic unrank
    i = largest row with C_i <= r, C_i = i*(2s-i-1)/2 — solved by the
    float quadratic then corrected by +-1 integer fixups (exact for
    s <= ~1e6).  Returns (synth_fn, total_edges, bases) where bases =
    (clique_base=0, chain_base, star_base) in VERTEX id space.
    """
    pc = s_clq * (s_clq - 1) // 2
    e_clq = n_clq * pc
    e_chn = n_chn * (l_chn - 1)
    e_str = n_str * f_str
    chain_base = n_clq * s_clq
    star_base = chain_base + n_chn * l_chn

    def synth(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["id"].to_numpy(dtype=np.int64)
        a = np.empty(len(t), dtype=np.int64)
        b = np.empty(len(t), dtype=np.int64)

        m = t < e_clq
        if m.any():
            tc = t[m]
            k, r = tc // pc, tc % pc
            s = np.int64(s_clq)
            i = ((2 * s - 1
                  - np.sqrt((2.0 * s - 1) ** 2 - 8.0 * r)) // 2).astype(np.int64)
            i = np.clip(i, 0, s - 2)
            for _ in range(2):  # +-1 fixups for float edge cases
                ci = i * (2 * s - i - 1) // 2
                i = np.where(r < ci, i - 1, i)
                ci = i * (2 * s - i - 1) // 2
                cn = (i + 1) * (2 * s - i - 2) // 2
                i = np.where(r >= cn, i + 1, i)
            ci = i * (2 * s - i - 1) // 2
            j = r - ci + i + 1
            a[m] = k * s_clq + i
            b[m] = k * s_clq + j

        m = (t >= e_clq) & (t < e_clq + e_chn)
        if m.any():
            tc = t[m] - e_clq
            k, p = tc // (l_chn - 1), tc % (l_chn - 1)
            a[m] = chain_base + k * l_chn + p
            b[m] = a[m] + 1

        m = t >= e_clq + e_chn
        if m.any():
            tc = t[m] - e_clq - e_chn
            k, j = tc // f_str, tc % f_str
            hub = star_base + k * (f_str + 1)
            a[m] = hub
            b[m] = hub + 1 + j

        return pd.DataFrame({"a": a, "b": b})

    return synth, e_clq + e_chn + e_str, (0, chain_base, star_base)


def main() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from cqi_ray.ops.graph import (clustering_coefficients,
                                   connected_components, kcore_decompose,
                                   triangle_count)
    from cqi_ray.runtime import tune_data_context

    tune_data_context()

    synth, n_edges, (clq0, chn0, str0) = make_synth(
        S_CLQ, N_CLQ, L_CHN, N_CHN, F_STR, N_STR)
    edges = rd.range(n_edges, override_num_blocks=max(NUM_CPUS * 4, 64)) \
        .map_batches(synth, batch_format="pandas").materialize()
    n_vertices = str0 + N_STR * (F_STR + 1)
    print(json.dumps({"edges": n_edges, "vertices": n_vertices,
                      "scale_mult": SCALE, "num_cpus": NUM_CPUS}))

    comb3 = S_CLQ * (S_CLQ - 1) * (S_CLQ - 2) // 6
    truth_tri = N_CLQ * comb3
    results = {}

    # --- connected_components (full pointer-doubling depth) -------------
    # runs FIRST: the bucketed triangle plan's wedge shuffle (~27M rows
    # per scale unit) leaves the object store pressured and was measured
    # to inflate a following CC from ~7 s to ~20 s at scale 2.
    t0 = time.perf_counter()
    labels = connected_components(edges, src="a", dst="b")
    # fold (component -> size) partials per block; #components is tiny
    parts = labels.map_batches(
        lambda bl: bl.groupby("component", sort=False).size()
        .rename("n").reset_index(),
        batch_format="pandas").to_pandas()
    sizes = parts.groupby("component", sort=False)["n"].sum()
    dt = time.perf_counter() - t0
    hist = sizes.value_counts().to_dict()
    expect_hist = {S_CLQ: N_CLQ, L_CHN: N_CHN, F_STR + 1: N_STR}
    ok = (len(sizes) == N_CLQ + N_CHN + N_STR
          and {int(k): int(v) for k, v in hist.items()} == expect_hist
          # component label = min vertex id of its structure
          and bool((np.sort(sizes.index.to_numpy())
                    == np.sort(np.concatenate([
                        clq0 + np.arange(N_CLQ) * S_CLQ,
                        chn0 + np.arange(N_CHN) * L_CHN,
                        str0 + np.arange(N_STR) * (F_STR + 1)]))).all()))
    results["cc"] = {"sec": round(dt, 2),
                     "edges_per_sec": round(n_edges / dt),
                     "components": int(len(sizes)), "exact": ok}
    print(json.dumps({"op": "connected_components", **results["cc"]}))

    # --- triangle_count, both plans -------------------------------------
    for plan, below in (("broadcast", 20_000_000), ("bucketed", 0)):
        t0 = time.perf_counter()
        n = triangle_count(edges, broadcast_below=below)
        dt = time.perf_counter() - t0
        ok = (n == truth_tri)
        results[f"triangles_{plan}"] = {
            "sec": round(dt, 2), "edges_per_sec": round(n_edges / dt),
            "count": n, "expected": truth_tri, "exact": ok}
        print(json.dumps({"op": f"triangle_count[{plan}]",
                          **results[f"triangles_{plan}"]}))

    # --- clustering_coefficients ----------------------------------------
    t0 = time.perf_counter()
    cdf = clustering_coefficients(edges)
    dt = time.perf_counter() - t0
    node = cdf["node"].to_numpy()
    is_clq = node < chn0
    per_node_tri = (S_CLQ - 1) * (S_CLQ - 2) // 2
    ok = (bool((cdf.loc[is_clq, "coeff"] == 1.0).all())
          and bool((cdf.loc[is_clq, "triangles"] == per_node_tri).all())
          and bool((cdf.loc[~is_clq, "triangles"] == 0).all())
          and int(cdf["triangles"].sum()) == 3 * truth_tri)
    results["coeff"] = {"sec": round(dt, 2),
                        "edges_per_sec": round(n_edges / dt),
                        "nodes": int(len(cdf)), "exact": ok}
    print(json.dumps({"op": "clustering_coefficients", **results["coeff"]}))

    # --- kcore at k = s-1: exactly the clique nodes survive -------------
    t0 = time.perf_counter()
    core = kcore_decompose(edges, k=S_CLQ - 1)
    dt = time.perf_counter() - t0
    ok = (len(core) == N_CLQ * S_CLQ
          and bool((core["deg_in_core"] == S_CLQ - 1).all())
          and bool((core["node"].to_numpy() < chn0).all()))
    results["kcore"] = {"sec": round(dt, 2),
                        "edges_per_sec": round(n_edges / dt),
                        "nodes_in_core": int(len(core)), "exact": ok}
    print(json.dumps({"op": "kcore_decompose", **results["kcore"]}))

    all_ok = all(r["exact"] for r in results.values())
    print(json.dumps({"experiment": "graph_scale", "edges": n_edges,
                      "scale_mult": SCALE, "num_cpus": NUM_CPUS,
                      "all_exact": all_ok,
                      "total_sec": round(sum(r["sec"] for r in results.values()), 2)}))
    ray.shutdown()
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
