"""Image-hash dedup scale spot-check: pHash banding + clustering at 1-2M
images with EXACT closed-form truth.

The sf0.1 image/phash queries run over 500-5000 rows, so their suite
timings are executor-floor-bound (BASELINE.md / ROADMAP limit 2).  This
experiment synthesizes an image-hash corpus 200-400x larger DISTRIBUTED
(one 64-bit hash per image, generated per block inside map_batches) and
pushes it through the PRODUCTION ops unchanged:

* ``phash_pairs_ds``       — band LSH -> hamming verify -> distinct pairs
                             (the q_dedup_phash core)
* ``phash_cluster_labels`` — exact collapse -> rep banding -> adaptive CC
                             -> broadcast assign (q_dedup_phash_clusters)

Corpus design (what makes the truth exact at any N):

* N images in K = N/M piles of M=16 EXACT duplicates (re-uploads /
  mirrored files — the dominant duplicate class at web scale).  Row
  doc_id d belongs to pile g = d // M and carries hash base(g).
* base(g) = splitmix64(g + seed), except g % 8 == 1 gets base(g-1) with
  1-7 deterministic bits flipped — a planted NEAR-dup pile pair at
  hamming <= 7 <= H (12.5% of piles).  A few extra cross-pile edges
  occur by birthday chance (~18 at K=62.5k); both kinds are recovered
  exactly by the truth scan below, so nothing is left to tolerance.
* Truth = the K x K base hamming matrix, computed DISTRIBUTED in
  O(K²/tasks) chunked popcount tasks (an algorithm-independent brute
  force — no banding, no pigeonhole).  From its edge list E:
    - exact pair count  = K*C(M,2) + |E|*M²   (piles are identical
      hashes, so every cross pair of an edge's two piles qualifies)
    - exact labels: python union-find over E (independent of the
      engine's CC); expected cluster_rep of row d = min(pile ids in
      comp(g)) * M  (rep of a pile = its min doc_id = g*M).

Checks (all exact, no tolerances):
  pair path    : distinct-pair count == closed form; planted cross-pile
                 pair recall == 1 (every planted edge's M² pairs found).
  cluster path : per-row cluster_rep == union-find truth for ALL N rows,
                 verified distributed (mismatch count reduced per batch).

Usage: python scripts/image_scale_experiment.py [n_images] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _arg(i: int, default: int) -> int:
    """argv parse that survives import from pytest (non-numeric argv)."""
    try:
        return int(sys.argv[i])
    except (IndexError, ValueError):
        return default


N = _arg(1, 1_000_000)
NUM_CPUS = _arg(2, 32)

M = 16                 # pile size (exact duplicates per image group)
H = 10                 # verify threshold (production default)
SEED = np.uint64(0x51_1E5C_A1E)
PLANT_MOD = 8          # g % 8 == 1 -> near-dup of pile g-1

assert N % M == 0
K = N // M


def _mix(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def base_hashes(g: np.ndarray) -> np.ndarray:
    """Pure function pile id -> 64-bit hash (computable in any task).
    Planted near-dup piles flip 1-7 deterministic bits of the previous
    pile's hash (bit positions may repeat, so the flip mask's popcount —
    the actual hamming distance — lands anywhere in [1, 7])."""
    g = np.asarray(g, dtype=np.uint64)
    planted = (g % np.uint64(PLANT_MOD)) == np.uint64(1)
    src = np.where(planted, g - np.uint64(1), g)
    h = _mix(src + SEED)
    if planted.any():
        gp = g[planted]
        mask = np.zeros(len(gp), dtype=np.uint64)
        for r in range(7):
            pos = _mix(gp * np.uint64(31) + np.uint64(r)) % np.uint64(64)
            mask |= np.uint64(1) << pos
        h = h.copy()
        h[planted] ^= mask
    return h


def synth_block(batch):
    import pandas as pd

    ids = batch["id"].to_numpy(dtype=np.int64)
    g = (ids // M).astype(np.uint64)
    return pd.DataFrame({"doc_id": ids,
                         "phash": base_hashes(g).astype(np.int64)})


def popcount64(x: np.ndarray) -> np.ndarray:
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + \
        ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)) \
        .astype(np.int64)


def truth_edges(ray) -> np.ndarray:
    """All pile pairs (i < j) with hamming(base_i, base_j) <= H — the
    algorithm-independent O(K²) brute force, chunked over raw tasks
    (128-row strips keep per-task temporaries ~128*K*8 bytes)."""
    bases = base_hashes(np.arange(K, dtype=np.uint64))
    ref = ray.put(bases)

    @ray.remote
    def strip(lo: int, hi: int):
        b = ray.get(ref)
        d = popcount64(b[lo:hi, None] ^ b[None, :])
        ii, jj = np.nonzero(d <= H)
        ii = ii + lo
        keep = ii < jj
        return np.stack([ii[keep], jj[keep]], axis=1)

    step = 128
    outs = ray.get([strip.remote(lo, min(lo + step, K))
                    for lo in range(0, K, step)])
    return np.concatenate(outs) if outs else np.empty((0, 2), dtype=np.int64)


def truth_labels(edges: np.ndarray) -> np.ndarray:
    """Min-pile-id per component via plain python union-find (independent
    of the engine's CC).  Returns comp_min[g] for every pile."""
    parent = np.arange(K, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges.tolist():
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return np.array([find(g) for g in range(K)], dtype=np.int64)


def main() -> None:
    import pandas as pd
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from cqi_ray.queries import phash_cluster_labels, phash_pairs_ds
    from cqi_ray.runtime import tune_data_context

    tune_data_context()

    records = []

    def record(**kv) -> None:
        records.append(kv)
        print(json.dumps(kv), flush=True)

    record(experiment="image_hash_dedup_scale", n_images=N, pile_size=M,
           distinct_hashes=K, max_hamming=H, num_cpus=NUM_CPUS)

    # ---- truth scan (distributed brute force over the K x K matrix) ----
    t0 = time.monotonic()
    edges = truth_edges(ray)
    comp_min = truth_labels(edges)
    planted_truth = int(((np.arange(K) % PLANT_MOD) == 1).sum())
    record(op="truth_scan", sec=round(time.monotonic() - t0, 2),
           base_edges=int(len(edges)), planted_edges=planted_truth,
           chance_edges=int(len(edges)) - planted_truth)
    planted_set = {(int(g - 1), int(g))
                   for g in range(1, K) if g % PLANT_MOD == 1}
    edge_set = set(map(tuple, edges.tolist()))
    assert planted_set <= edge_set, "truth scan must recover every plant"

    def make_hashed():
        return ray.data.range(N, override_num_blocks=max(NUM_CPUS * 4, 64)) \
            .map_batches(synth_block, batch_format="pandas")

    # warm-up spawns + imports the worker pool
    phash_pairs_ds(make_hashed().limit(N // 20)).count()

    # ---- pair path (q_dedup_phash core) --------------------------------
    t0 = time.monotonic()
    pairs = phash_pairs_ds(make_hashed(), max_hamming=H,
                           num_buckets=max(64, NUM_CPUS * 4),
                           distinct_buckets=64)

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["a"].to_numpy(dtype=np.int64)
        b = batch["b"].to_numpy(dtype=np.int64)
        cross = (a // M) != (b // M)
        # canonical cross-pile edge ids so planted recall is checkable
        # without shipping the pairs to the driver
        ge = (a[cross] // M) * np.int64(K) + (b[cross] // M)
        return pd.DataFrame({"n": [len(a)], "n_cross": [int(cross.sum())],
                             "edge_ids": [np.unique(ge).tobytes()]})

    parts = pairs.map_batches(pair_partial, batch_format="pandas") \
        .to_pandas()
    n_pairs = int(parts["n"].sum())
    n_cross = int(parts["n_cross"].sum())
    got_edges = np.unique(np.concatenate(
        [np.frombuffer(x, dtype=np.int64) for x in parts["edge_ids"]]
        or [np.empty(0, dtype=np.int64)]))
    pair_sec = time.monotonic() - t0

    want_pairs = K * (M * (M - 1) // 2) + len(edges) * M * M
    want_edges = np.unique(edges[:, 0] * np.int64(K) + edges[:, 1])
    pairs_exact = bool(n_pairs == want_pairs
                       and n_cross == len(edges) * M * M
                       and np.array_equal(got_edges, want_edges))
    record(op="phash_pairs_ds", sec=round(pair_sec, 2),
           images_per_sec=round(N / pair_sec, 1), pairs=n_pairs,
           want_pairs=want_pairs, cross_pairs=n_cross,
           exact=pairs_exact, planted_recall=1.0 if pairs_exact else None)

    # ---- cluster path (q_dedup_phash_clusters core) --------------------
    t0 = time.monotonic()
    labels = phash_cluster_labels(make_hashed(), max_hamming=H)
    exp_ref = ray.put(comp_min * np.int64(M))

    def check(batch: pd.DataFrame) -> pd.DataFrame:
        exp = ray.get(exp_ref)
        g = batch["doc_id"].to_numpy(dtype=np.int64) // M
        bad = int((batch["cluster_rep"].to_numpy(dtype=np.int64)
                   != exp[g]).sum())
        return pd.DataFrame({"n": [len(batch)], "bad": [bad]})

    chk = labels.map_batches(check, batch_format="pandas").to_pandas()
    cluster_sec = time.monotonic() - t0
    n_rows, n_bad = int(chk["n"].sum()), int(chk["bad"].sum())
    record(op="phash_cluster_labels", sec=round(cluster_sec, 2),
           images_per_sec=round(N / cluster_sec, 1), rows=n_rows,
           label_mismatches=n_bad,
           exact=bool(n_rows == N and n_bad == 0))

    all_exact = all(r.get("exact", True) for r in records)
    record(experiment="image_hash_dedup_scale", n_images=N,
           num_cpus=NUM_CPUS, all_exact=bool(all_exact),
           total_sec=round(sum(r.get("sec", 0.0) for r in records), 2))
    ray.shutdown()


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
