"""Text-corpus scale spot-check: MinHash+LSH dedup at 100k-400k docs.

The sf0.1 documents table caps at 5,000 rows, so the dedup pipeline's
suite timings are executor-floor-bound, not kernel-bound (BASELINE.md /
ROADMAP limit 2).  This experiment synthesizes a corpus 40-80x larger
DISTRIBUTED (token soup generated per block inside map_batches from a
splitmix64-seeded stream — no driver loop, no parquet staging), plants
near-duplicate pairs at a known rate, and runs the production
``minhash_near_dup_pairs`` pipeline unchanged.

Reported: wall time, docs/s, planted-pair recall (every planted pair
has J ~ 0.9, far above the 0.6 threshold: LSH miss probability ~2e-9),
and the count of non-planted survivors (expected 0 — the random token
soup's baseline Jaccard is ~0).

Usage: python scripts/text_scale_experiment.py [n_docs] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32

# every doc_id with id % 10 == 8 gets a near-copy at id+1 (same token
# stream, one token substituted) -> planted pair (i, i+1)
PLANT_MOD, PLANT_AT = 10, 8
VOCAB = 50_000
TOKENS_PER_DOC = 60


def synth_block(batch):
    """Deterministic token soup per doc_id (vectorized splitmix64 over a
    (rows x TOKENS_PER_DOC) counter grid; near-dup rows reuse the
    previous id's grid with token 7 substituted)."""
    import numpy as np
    import pandas as pd

    ids = batch["id"].to_numpy(dtype=np.uint64)
    is_dup = (ids % PLANT_MOD) == (PLANT_AT + 1)
    base = np.where(is_dup, ids - 1, ids)

    def mix(x: "np.ndarray") -> "np.ndarray":
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z ^= z >> np.uint64(30)
        z = (z * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z ^= z >> np.uint64(27)
        z = (z * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> np.uint64(31))

    pos = np.arange(TOKENS_PER_DOC, dtype=np.uint64)[None, :]
    grid = mix(base[:, None] * np.uint64(TOKENS_PER_DOC + 1) + pos) % VOCAB
    if is_dup.any():
        grid[is_dup, 7] = (grid[is_dup, 7] + 1) % VOCAB
    texts = ["t" + " t".join(map(str, row)) for row in grid]
    return pd.DataFrame({"doc_id": ids.astype(np.int64), "text": texts})


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from cqi_ray.queries import minhash_near_dup_pairs
    from cqi_ray.runtime import tune_data_context

    tune_data_context()

    # join_buckets sized to ~2-5k surviving pairs per bucket (n/10 planted
    # pairs here) — the scale knob the default-16 suite config doesn't need
    join_buckets = max(16, min(256, N_DOCS // 10 // 2500))
    docs = ray.data.range(N_DOCS, override_num_blocks=max(NUM_CPUS * 4, 64)) \
        .map_batches(synth_block, batch_format="pandas")
    # warm-up at 1/20 scale spawns+imports the worker pool (steady-state
    # throughput is the quantity of interest)
    minhash_near_dup_pairs(
        ray.data.range(N_DOCS // 20, override_num_blocks=NUM_CPUS)
        .map_batches(synth_block, batch_format="pandas")).count()

    t0 = time.monotonic()
    pairs = minhash_near_dup_pairs(docs, join_buckets=join_buckets) \
        .to_pandas()
    elapsed = time.monotonic() - t0

    planted = N_DOCS // PLANT_MOD
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    hit = ((a % PLANT_MOD) == PLANT_AT) & (b == a + 1)
    doc = {
        "experiment": "minhash LSH dedup over synthesized corpus",
        "n_docs": N_DOCS,
        "num_cpus": NUM_CPUS,
        "sec": round(elapsed, 2),
        "docs_per_sec": round(N_DOCS / elapsed, 1),
        "pairs_found": int(len(pairs)),
        "planted_pairs": planted,
        "planted_recall": round(float(hit.sum()) / planted, 6),
        "false_pairs": int((~hit).sum()),
    }
    ray.shutdown()
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
