"""Boilerplate-pile stress: the dedup pipelines' quadratic hot bucket.

Web crawls contain piles of near-identical documents (template pages,
licence boilerplate).  Every member of a pile lands in the SAME LSH
band buckets, so a pile of g docs emits g(g-1)/2 candidate pairs —
quadratic output from linear input, the classic dedup scale killer
(a 100k-doc pile is 5e9 pairs).

This experiment builds a corpus of ``n_base`` random-token docs plus
ONE pile of ``n_pile`` mutually-near-identical docs (each pile member
substitutes one token of the shared template at a member-specific
position, so members are pairwise similar but pairwise DISTINCT — exact
dedup cannot collapse them) and measures `minhash_near_dup_pairs`:

  mode=pairs  — exact all-pairs semantics (default config).  Output and
                cost grow as n_pile^2: run at the small pile only.
  mode=star   — star_cap=1024.  Oversized runs emit the min-id star:
                output and cost grow LINEARLY with pile size.

For the small pile both modes are run and their CLUSTERS (union-find
over output pairs) are compared — the star mode must reproduce the
exact mode's components (pair-completeness is what the cap trades
away; component structure, which keep-one-per-cluster dedup consumes,
is preserved).

Usage: python scripts/hot_bucket_experiment.py [n_base] [n_pile_small]
       [n_pile_big] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
N_PILE_SMALL = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
N_PILE_BIG = int(sys.argv[3]) if len(sys.argv) > 3 else 8_000
NUM_CPUS = int(sys.argv[4]) if len(sys.argv) > 4 else 32

VOCAB = 50_000
TOKENS_PER_DOC = 60


def make_synth(n_base: int, n_pile: int):
    """doc_ids < n_base are random token soup; doc_ids >= n_base are pile
    members: the shared template with one token substituted at position
    (member_index % TOKENS_PER_DOC)."""
    import numpy as np
    import pandas as pd

    def mix(x: "np.ndarray") -> "np.ndarray":
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z ^= z >> np.uint64(30)
        z = (z * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z ^= z >> np.uint64(27)
        z = (z * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> np.uint64(31))

    def synth(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy(dtype=np.uint64)
        in_pile = ids >= n_base
        base = np.where(in_pile, np.uint64(n_base), ids)  # pile template
        pos = np.arange(TOKENS_PER_DOC, dtype=np.uint64)[None, :]
        grid = mix(base[:, None] * np.uint64(TOKENS_PER_DOC + 1) + pos) % VOCAB
        member = (ids - np.uint64(n_base)) % np.uint64(TOKENS_PER_DOC)
        rows = np.nonzero(in_pile)[0]
        # member-specific substitution keeps pile members pairwise distinct
        grid[rows, member[rows].astype(np.int64)] = \
            (mix(ids[rows]) % VOCAB).astype(grid.dtype)
        texts = ["t" + " t".join(map(str, row)) for row in grid]
        return pd.DataFrame({"doc_id": ids.astype(np.int64), "text": texts})

    return synth


def components(pairs) -> dict[int, int]:
    """Union-find over the output pairs (driver-side — test harness only,
    the production cluster step is ops.graph.connected_components)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from cqi_ray.queries import minhash_near_dup_pairs
    from cqi_ray.runtime import tune_data_context

    tune_data_context()

    def corpus(n_pile: int):
        n = N_BASE + n_pile
        return ray.data.range(n, override_num_blocks=max(NUM_CPUS * 4, 64)) \
            .map_batches(make_synth(N_BASE, n_pile), batch_format="pandas")

    out: dict = {"experiment": "boilerplate-pile stress (minhash dedup)",
                 "n_base": N_BASE, "num_cpus": NUM_CPUS}

    # warm-up
    minhash_near_dup_pairs(corpus(0).limit(N_BASE // 20)).count()

    # small pile: both modes, cluster equivalence.  The star leg's cap
    # sits BELOW the pile size so starring genuinely engages — the
    # equivalence check is the point of this leg.
    small_cap = max(64, N_PILE_SMALL // 2)
    runs = {}
    for mode, cap in (("pairs", None), ("star", small_cap)):
        t0 = time.monotonic()
        pairs = minhash_near_dup_pairs(corpus(N_PILE_SMALL), join_buckets=64,
                                       star_cap=cap).to_pandas()
        runs[mode] = {"sec": round(time.monotonic() - t0, 2),
                      "pairs": int(len(pairs)),
                      "clusters": components(pairs)}
    # same partition of doc ids: group members by root on both sides
    ca, cb = runs["pairs"]["clusters"], runs["star"]["clusters"]

    def groups(c):
        g: dict[int, set] = {}
        for x, r in c.items():
            g.setdefault(r, set()).add(x)
        return sorted(map(frozenset, g.values()), key=min)
    same = groups(ca) == groups(cb)
    out["small_pile"] = {
        "n_pile": N_PILE_SMALL,
        "star_cap": small_cap,
        "pairs_mode": {k: runs["pairs"][k] for k in ("sec", "pairs")},
        "star_mode": {k: runs["star"][k] for k in ("sec", "pairs")},
        "clusters_equal": bool(same),
        "n_clusters": len(groups(ca)),
    }

    # big pile: star mode only (pairs mode would emit n_pile^2/2 pairs)
    t0 = time.monotonic()
    pairs = minhash_near_dup_pairs(corpus(N_PILE_BIG), join_buckets=64,
                                   star_cap=1024).to_pandas()
    sec = round(time.monotonic() - t0, 2)
    out["big_pile"] = {
        "n_pile": N_PILE_BIG,
        "star_mode": {"sec": sec, "pairs": int(len(pairs))},
        "pairs_mode_extrapolated_pairs": N_PILE_BIG * (N_PILE_BIG - 1) // 2,
    }
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
