"""Embedding-side scale spot-check: LSH near-dup + brute top-k at 500k+.

Companion to text_scale_experiment.py — the sf0.1 embeddings table caps
at 2,000 rows, so the ANN/embedding-dedup suite timings are
executor-floor-bound.  This synthesizes a unit-vector corpus 250x
larger DISTRIBUTED (splitmix64 uniform grid per block, L2-normalized;
near-dup vectors planted at 10% with a small deterministic
perturbation, cosine ~0.995) and runs two production paths unchanged:

1. ``embedding_lsh_pairs`` (the sub-quadratic dedup path): planted-pair
   recall + false-pair count + vecs/s.
2. brute-force cosine top-k (``batch_topk_partials`` + ``merge_topk``
   over a broadcast 64-query matrix): vecs/s for one full scan pass.

Usage: python scripts/embedding_scale_experiment.py [n_vecs] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
NUM_CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32

DIM = 64
PLANT_MOD, PLANT_AT = 10, 8
N_QUERIES, TOPK = 64, 10


def synth_block(batch):
    """Deterministic unit vectors per vec_id (vectorized splitmix64 ->
    uniform[-1,1) grid -> L2 normalize; near-dup rows reuse the previous
    id's vector with coordinate 0 nudged by +0.1 before normalization —
    cosine vs the base ~0.995)."""
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

    pos = np.arange(DIM, dtype=np.uint64)[None, :]
    grid = mix(base[:, None] * np.uint64(DIM + 1) + pos)
    vec = (grid.astype(np.float64) / 2.0**63) - 1.0
    vec[is_dup, 0] += 0.1
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    return pd.DataFrame({"vec_id": ids.astype(np.int64),
                         "embedding": list(vec.astype(np.float32))})


def main() -> None:
    import numpy as np
    import pandas as pd

    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from cqi_ray.ops.ann import batch_topk_partials, merge_topk
    from cqi_ray.ops.dedup import embedding_lsh_pairs
    from cqi_ray.runtime import tune_data_context

    tune_data_context()

    def corpus(n: int, blocks: int):
        return ray.data.range(n, override_num_blocks=blocks) \
            .map_batches(synth_block, batch_format="pandas")

    # 2^planes ~= n / 500 keeps in-bucket verify matrices ~500x500 (the
    # documented L*n^2/2^planes worst case is REAL for uniform vectors:
    # the default 6 planes at 500k rows means 8k-row buckets -> 0.5 GB
    # sims matrices).  10 planes keeps recall >= 0.999 at cosine 0.995
    # under 8-table OR-amplification.
    n_planes = max(6, int(np.ceil(np.log2(max(N_VECS / 500, 2)))))
    docs = corpus(N_VECS, max(NUM_CPUS * 4, 64))
    # warm-up pass spawns+imports the worker pool
    embedding_lsh_pairs(corpus(N_VECS // 20, NUM_CPUS)).count()

    t0 = time.monotonic()
    pairs = embedding_lsh_pairs(docs, threshold=0.99, n_planes=n_planes,
                                num_buckets=128).to_pandas()
    lsh_sec = time.monotonic() - t0

    planted = N_VECS // PLANT_MOD
    a = pairs["a"].to_numpy()
    b = pairs["b"].to_numpy()
    hit = ((a % PLANT_MOD) == PLANT_AT) & (b == a + 1)

    # brute top-k: 64 queries broadcast once, per-block partial heads,
    # tiny driver merge
    qids = np.arange(N_QUERIES, dtype=np.uint64) * np.uint64(997)
    qmat = synth_block(pd.DataFrame({"id": qids}))
    q = np.stack(qmat["embedding"].to_numpy()).astype(np.float64)
    ref = ray.put(q)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        return batch_topk_partials(batch["vec_id"].to_numpy(), mat,
                                   ray.get(ref), TOPK)

    t0 = time.monotonic()
    top = merge_topk(
        docs.map_batches(partial, batch_format="pandas").to_pandas(), TOPK)
    brute_sec = time.monotonic() - t0
    # sanity: each planted query id must rank itself first (cos = 1)
    self_hits = int((top.loc[top["rank"] == 1, "vec_id"].to_numpy()
                     == qids[top.loc[top["rank"] == 1, "query_id"]
                             .to_numpy()]).sum())

    doc = {
        "experiment": "embedding LSH dedup + brute topk over synthesized vectors",
        "n_vecs": N_VECS,
        "dim": DIM,
        "num_cpus": NUM_CPUS,
        "n_planes": n_planes,
        "lsh_sec": round(lsh_sec, 2),
        "lsh_vecs_per_sec": round(N_VECS / lsh_sec, 1),
        "pairs_found": int(len(pairs)),
        "planted_pairs": planted,
        "planted_recall": round(float(hit.sum()) / planted, 6),
        "false_pairs": int((~hit).sum()),
        "brute_topk_sec": round(brute_sec, 2),
        "brute_vecs_per_sec": round(N_VECS / brute_sec, 1),
        "n_queries": N_QUERIES,
        # a query whose id is inside the corpus must rank itself first
        # (cos = 1; planted perturbations keep every other vector < 1)
        "topk_self_hits": self_hits,
        "topk_self_expected": int((qids < N_VECS).sum()),
    }
    ray.shutdown()
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)
