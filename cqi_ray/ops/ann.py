"""Approximate-nearest-neighbor search over an embedding column.

Two paths (SURVEY-mandated additions for training-data pipelines):

* brute-force cosine top-k — the exactness baseline: the query matrix is
  broadcast once (``ray.put``), every batch computes a numpy matmul and
  emits its *partial* top-k per query, and a tiny final reduce merges
  partials.  No shuffle of the corpus; wall-time is one pass.
* LSH-bucketed variant — the scale path: random-hyperplane signs bucket
  both corpus and queries; only same-bucket (plus probe-neighbor) pairs
  are scored.  Bucketing is a groupby co-partition, so the 10^12-row case
  never materializes an n x q score matrix.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd


def normalize_rows(mat: np.ndarray) -> np.ndarray:
    x = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.where(norms > 0, norms, 1)


def batch_topk_partials(vec_ids, mat: np.ndarray, queries: np.ndarray,
                        k: int) -> pd.DataFrame:
    """Per-batch partial top-k: returns (query_id, vec_id, score) rows,
    at most k per query per batch."""
    x = normalize_rows(mat)
    q = normalize_rows(queries)
    sims = q @ x.T                      # (nq, nb)
    nq, nb = sims.shape
    k_eff = min(k, nb)
    # argpartition then exact sort of the head — O(nb + k log k) per query
    idx = np.argpartition(-sims, k_eff - 1, axis=1)[:, :k_eff]
    rows = {"query_id": [], "vec_id": [], "score": []}
    vec_ids = np.asarray(vec_ids)
    for qi in range(nq):
        cand = idx[qi]
        order = np.lexsort((vec_ids[cand], -sims[qi, cand]))
        for ci in cand[order]:
            rows["query_id"].append(qi)
            rows["vec_id"].append(vec_ids[ci])
            rows["score"].append(sims[qi, ci])
    return pd.DataFrame(rows)


def merge_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Merge partial top-k frames into the global top-k per query.
    Deterministic tie-break: (-score, vec_id)."""
    out = {"query_id": [], "vec_id": [], "score": [], "rank": []}
    for qid, group in partials.groupby("query_id", sort=True):
        top = heapq.nsmallest(
            k, group.itertuples(index=False), key=lambda r: (-r.score, r.vec_id)
        )
        for rank, row in enumerate(top, start=1):
            out["query_id"].append(int(qid))
            out["vec_id"].append(row.vec_id)
            out["score"].append(round(float(row.score), 6))
            out["rank"].append(rank)
    return pd.DataFrame(out)


class HyperplaneLSH:
    """Random-hyperplane signature for cosine LSH (stateful -> actor pool).
    ``dim=None`` defers plane creation until ``ensure_dim`` sees the data
    (same seed => same planes on every worker)."""

    def __init__(self, dim: int | None, n_planes: int = 12, seed: int = 42):
        self.n_planes = n_planes
        self.seed = seed
        self.planes = None
        if dim is not None:
            self.ensure_dim(dim)

    def ensure_dim(self, dim: int) -> None:
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal((dim, self.n_planes))

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        signs = (np.asarray(mat, dtype=np.float64) @ self.planes) >= 0
        out = np.zeros(len(signs), dtype=np.int64)
        for b in range(self.n_planes):
            out = (out << 1) | signs[:, b].astype(np.int64)
        return out

    def probe_buckets(self, bucket_ids: np.ndarray, n_probe_bits: int = 2) -> np.ndarray:
        """Multi-probe: each bucket plus its single-bit-flip neighbors on the
        lowest ``n_probe_bits`` planes -> (n, 1 + n_probe_bits) bucket ids."""
        cols = [bucket_ids]
        for b in range(n_probe_bits):
            cols.append(bucket_ids ^ (1 << b))
        return np.stack(cols, axis=1)


def kmeans_fit(mat: np.ndarray, k: int, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (fixed seed/iters, no early-exit
    randomness): the coarse quantizer for IVF.  Rows are L2-normalized;
    empty clusters keep their previous centroid."""
    x = normalize_rows(mat)
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ centroids.T
        assign = np.argmax(sims, axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    centroids[c] = m / n
    return centroids


class IVFIndex:
    """IVF-Flat coarse index: centroids broadcast once; corpus rows bucket
    to their nearest centroid (one groupby co-partition); queries probe the
    ``nprobe`` nearest lists and score exactly within them."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = normalize_rows(centroids)

    def assign(self, mat: np.ndarray) -> np.ndarray:
        sims = normalize_rows(mat) @ self.centroids.T
        return np.argmax(sims, axis=1).astype(np.int64)

    def probe(self, queries: np.ndarray, nprobe: int) -> np.ndarray:
        """(nq, nprobe) list ids, nearest first (deterministic ties by id)."""
        sims = normalize_rows(queries) @ self.centroids.T
        nprobe = min(nprobe, sims.shape[1])
        order = np.lexsort((np.broadcast_to(np.arange(sims.shape[1]),
                                            sims.shape), -sims), axis=1)
        return order[:, :nprobe].astype(np.int64)


def kmeans_distributed(ds, k: int = 8, iters: int = 5,
                       vec_col: str = "embedding", id_col: str = "vec_id"):
    """Distributed spherical Lloyd iterations over a Dataset of
    embeddings — the data NEVER moves; per iteration each block reduces
    to one (k x dim sums, k counts) partial inside ``map_batches``, the
    driver folds the bounded partials and re-broadcasts the k x dim
    centroid matrix via ``ray.put``.  Communication is
    O(iters x blocks x k x dim) floats, independent of row count.

    Deterministic: seeds are the k rows with the smallest ``id_col``
    (found with a bounded per-block partial head + tiny merge, no global
    sort); argmax assignment breaks ties by lowest centroid index.

    Returns (centroids ndarray, assignment Dataset[id_col, cluster]).
    """
    import pandas as pd

    import ray

    from ..runtime import materialized_block_refs

    # iterative algorithm: pin the decoded blocks in the (distributed,
    # spillable) object store once instead of re-running the read chain
    # every Lloyd iteration — the sanctioned use of materialize().
    ds = ds.materialize()

    def seed_head(b: pd.DataFrame) -> pd.DataFrame:
        return b.nsmallest(k, id_col)

    seeds = ds.map_batches(seed_head, batch_format="pandas",
                           batch_size=None).to_pandas() \
        .nsmallest(k, id_col).sort_values(id_col)
    centroids = normalize_rows(np.stack(seeds[vec_col].to_numpy()))

    # One prep task per block extracts the L2-normalized matrix ONCE
    # (the normalize+stack cost used to recur every iteration); each
    # Lloyd step is then a single wave of raw Ray tasks over the prepped
    # refs — no per-iteration Dataset execution (the streaming executor's
    # ~0.4 s floor per pass dominated small/medium inputs), no data
    # movement (only k x dim partials return to the driver).
    @ray.remote
    def _prep(block) -> np.ndarray:
        b = block.to_pandas() if not isinstance(block, pd.DataFrame) \
            else block
        if not len(b):            # empty blocks carry no columns
            return np.zeros((0, centroids.shape[1]))
        return normalize_rows(np.stack(b[vec_col].to_numpy()))

    @ray.remote
    def _partial(x: np.ndarray, cents: np.ndarray):
        assign = np.argmax(x @ cents.T, axis=1)
        sums = np.zeros_like(cents, dtype=np.float64)
        np.add.at(sums, assign, x)
        return sums, np.bincount(assign, minlength=len(cents))

    mat_refs = [_prep.remote(r) for r in materialized_block_refs(ds)]

    for _ in range(iters):
        cref = ray.put(centroids)
        parts = ray.get([_partial.remote(m, cref) for m in mat_refs])
        sums = np.zeros_like(centroids, dtype=np.float64)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for s, n in parts:
            sums += s
            counts += n
        for c in range(len(centroids)):
            if counts[c]:
                norm = np.linalg.norm(sums[c])
                if norm > 0:
                    centroids[c] = sums[c] / norm

    ref = ray.put(centroids)

    def assign_final(b: pd.DataFrame) -> pd.DataFrame:
        cents = ray.get(ref)
        x = normalize_rows(np.stack(b[vec_col].to_numpy()))
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(),
            "cluster": np.argmax(x @ cents.T, axis=1).astype(np.int64)})

    return centroids, ds.map_batches(assign_final, batch_format="pandas")


class PQCodebook:
    """Product quantizer for compressed in-list scoring (IVF-PQ): split
    the (normalized) embedding into M contiguous subspaces, k-means each
    subspace to ``ksub`` codes, store each vector as M uint8 codes
    (M bytes instead of dim x 8 — 64x smaller at dim=64/M=8).  Scoring
    is ADC: per query precompute the (M, ksub) table of subspace dot
    contributions once, then every candidate's approximate score is M
    table lookups + a sum (pure numpy ``take`` + ``sum``), no float
    vector ever touched.  Deterministic end-to-end (seeded kmeans_fit,
    argmin ties to the lowest code id)."""

    def __init__(self, codebooks: np.ndarray):
        self.codebooks = np.asarray(codebooks, dtype=np.float64)  # (M, ksub, dsub)
        self.M, self.ksub, self.dsub = self.codebooks.shape

    @classmethod
    def fit(cls, mat: np.ndarray, M: int = 8, ksub: int = 16,
            iters: int = 10, seed: int = 42) -> "PQCodebook":
        x = normalize_rows(mat)
        dim = x.shape[1]
        assert dim % M == 0, "dim must divide into M subspaces"
        dsub = dim // M
        books = np.empty((M, ksub, dsub))
        for m in range(M):
            sub = x[:, m * dsub:(m + 1) * dsub]
            # plain (non-spherical) subspace k-means: L2 assignment
            rng = np.random.default_rng(seed + m)
            cents = sub[rng.choice(len(sub), size=min(ksub, len(sub)),
                                   replace=False)].copy()
            for _ in range(iters):
                d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d, axis=1)
                for c in range(len(cents)):
                    members = sub[assign == c]
                    if len(members):
                        cents[c] = members.mean(axis=0)
            books[m, :len(cents)] = cents
            if len(cents) < ksub:  # tiny training sets: repeat last centroid
                books[m, len(cents):] = cents[-1]
        return cls(books)

    def encode(self, mat: np.ndarray) -> np.ndarray:
        """(n, dim) -> (n, M) uint8 codes (L2 assignment per subspace)."""
        x = normalize_rows(mat)
        n = len(x)
        codes = np.empty((n, self.M), dtype=np.uint8)
        for m in range(self.M):
            sub = x[:, m * self.dsub:(m + 1) * self.dsub]
            # ||s - c||^2 = ||s||^2 - 2 s.c + ||c||^2; ||s||^2 constant per row
            dots = sub @ self.codebooks[m].T
            cn = (self.codebooks[m] ** 2).sum(axis=1)
            codes[:, m] = np.argmin(cn[None, :] - 2 * dots, axis=1)
        return codes

    def adc_table(self, queries: np.ndarray) -> np.ndarray:
        """(nq, dim) -> (nq, M, ksub) subspace dot contributions: the
        approximate cosine of query q and a vector with codes c is
        sum_m table[q, m, c_m]."""
        q = normalize_rows(queries)
        nq = len(q)
        table = np.empty((nq, self.M, self.ksub))
        for m in range(self.M):
            table[:, m, :] = q[:, m * self.dsub:(m + 1) * self.dsub] \
                @ self.codebooks[m].T
        return table

    def adc_scores(self, codes: np.ndarray, table_q: np.ndarray) -> np.ndarray:
        """codes (n, M) x one query's table (M, ksub) -> (n,) scores."""
        acc = np.zeros(len(codes))
        for m in range(self.M):
            acc += table_q[m][codes[:, m]]
        return acc
