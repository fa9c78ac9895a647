"""Mergeable sketch operators for streaming aggregation at scale.

HyperLogLog approximate COUNT DISTINCT (Flajolet, Fusy, Gandouet,
Meunier 2007): each block reduces to one 2^p-byte register vector per
group key inside ``map_batches`` (the combiner), registers merge with a
pointwise max in one bucketed shuffle, and the estimate is read off the
merged registers.  Communication is O(groups x 2^p) bytes regardless of
input size — the sketch path for cardinalities where the exact
distinct shuffle (``relational.distinct_rows``) would move the whole
key set.

Deterministic end to end: the value hash is splitmix64 (no seed, no
wall clock), so two runs — and any partitioning — produce identical
registers.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..relational import _splitmix64, _splitmix64_any, grouped_map_buckets

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    if m in _ALPHA:
        return _ALPHA[m]
    return 0.7213 / (1.0 + 1.079 / m)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized exact bit_length for uint64 (no float log2 — log2 of
    ints above 2^53 rounds and would shift ranks off by one)."""
    bl = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        v = v.copy()
        v[big] >>= np.uint64(s)
    bl += (v > 0).astype(np.int64)
    return bl


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """One block's HLL register vector (uint8[2^p]) for ``values``."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if not len(values):
        return regs
    h = _splitmix64(_splitmix64_any(np.asarray(values)))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    rank = np.where(w > 0, (64 - p) - _bit_length_u64(w) + 1, 64 - p + 1) \
        .astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    return np.maximum.reduce(parts) if parts else np.zeros(0, np.uint8)


def hll_estimate(regs: np.ndarray) -> int:
    """Cardinality estimate with the original small-range correction
    (linear counting when E <= 2.5m and empty registers remain).

    The harmonic sum is computed EXACTLY in integers — sum(2^-reg)
    scaled by 2^64 is a sum of powers of two, a python int — so the
    estimate is a deterministic, float-order-independent function of
    the registers.  That makes it SQL-replayable: the DuckDB oracle
    (queries.Q_APPROX_COUNT_DISTINCT_SQL) recomputes the identical
    registers from the identical splitmix64 hashes and applies the
    identical closed-form expression, operation for operation."""
    m = len(regs)
    counts = np.bincount(regs)
    sum_scaled = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
    e = _alpha(m) * m * m * 18446744073709551616.0 / float(sum_scaled)
    zeros = int(counts[0]) if len(counts) else m
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)
    return int(round(e))


def approx_count_distinct(ds, keys: list[str], value_col: str,
                          p: int = 12, num_buckets: int = 16):
    """Distributed grouped approximate COUNT DISTINCT.

    map_batches: one (keys, packed registers) row per key per block
    -> bucketed shuffle on the group keys
    -> pointwise-max register merge + estimate per key.

    Standard error ~ 1.04 / sqrt(2^p) (~1.6% at the default p=12); the
    estimate is DETERMINISTIC for a given input (hash has no seed), just
    approximate.  Output column: ``n_approx`` (int64).
    """
    out_col = "n_approx"

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in keys}
        rows["__regs"] = []
        for kv, g in batch.groupby(keys, sort=False, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            for k, v in zip(keys, kv):
                rows[k].append(v)
            rows["__regs"].append(
                hll_partial(g[value_col].to_numpy(), p=p).tobytes())
        return pd.DataFrame(rows)

    def merge(bucket: pd.DataFrame) -> pd.DataFrame:
        if not len(bucket):
            out = {k: pd.Series(dtype=object) for k in keys}
            out[out_col] = pd.Series(dtype="int64")
            return pd.DataFrame(out)
        rows = {k: [] for k in keys}
        rows[out_col] = []
        for kv, g in bucket.groupby(keys, sort=True, dropna=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            for k, v in zip(keys, kv):
                rows[k].append(v)
            regs = hll_merge([np.frombuffer(b, dtype=np.uint8)
                              for b in g["__regs"]])
            rows[out_col].append(hll_estimate(regs))
        out = pd.DataFrame(rows)
        out[out_col] = out[out_col].astype("int64")
        return out

    partials = ds.map_batches(partial, batch_format="pandas")
    return grouped_map_buckets(partials, keys, merge,
                               num_buckets=num_buckets, whole_bucket=True)


class BloomFilter:
    """Vectorized Bloom filter over 64-bit key hashes (double hashing,
    Kirsch-Mitzenmacher: idx_i = h1 + i*h2 mod m).  Deterministic (no
    seed), mergeable by bitwise OR, and compact — the broadcast-side
    artifact for semi-join pruning: ~10 bits/key gives ~1% false
    positives with k=7 probes, and false positives are REMOVED by the
    exact join that follows, so the result stays exact."""

    def __init__(self, log2_bits: int, k: int = 7):
        self.log2_bits = log2_bits
        self.m = np.uint64(1 << log2_bits)
        self.k = k
        self.words = np.zeros((1 << log2_bits) >> 6, dtype=np.uint64)

    @staticmethod
    def size_for(n_keys: int, bits_per_key: int = 10) -> int:
        """log2 of the next power-of-two bit count >= n_keys * bits_per_key."""
        want = max(64, n_keys * bits_per_key)
        return int(want - 1).bit_length()

    def _hashes(self, values: np.ndarray):
        h1 = _splitmix64(_splitmix64_any(np.asarray(values)))
        h2 = _splitmix64(h1 ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
        return h1, h2

    def add(self, values: np.ndarray) -> None:
        if not len(values):
            return
        h1, h2 = self._hashes(values)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) & (self.m - np.uint64(1))
            np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))

    def contains(self, values: np.ndarray) -> np.ndarray:
        if not len(values):
            return np.zeros(0, dtype=bool)
        h1, h2 = self._hashes(values)
        ok = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) & (self.m - np.uint64(1))
            bit = (self.words[(idx >> np.uint64(6)).astype(np.int64)]
                   >> (idx & np.uint64(63))) & np.uint64(1)
            ok &= bit.astype(bool)
        return ok

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.log2_bits == other.log2_bits and self.k == other.k
        self.words |= other.words
        return self


class CountMinSketch:
    """Count-min sketch (Cormode & Muthukrishnan 2005): a ``depth x width``
    counter matrix; each value increments one counter per row (pairwise
    hashes h1 + i*h2), point queries take the row-wise MIN — an
    overestimate bounded by eps*N with eps = e/width at failure prob
    e^-depth.  Partials are elementwise-ADD mergeable, so each block
    reduces to one fixed-size matrix inside ``map_batches`` and only
    O(depth x width x blocks) ints ever cross the wire — the frequency
    sketch companion to the HLL cardinality sketch above.

    Deterministic: splitmix64 double hashing, no seed, no wall clock.
    """

    def __init__(self, depth: int = 4, width: int = 4096):
        self.depth, self.width = depth, width
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _hashes(self, values) -> np.ndarray:
        h1 = _splitmix64(_splitmix64_any(np.asarray(values)))
        h2 = _splitmix64(h1 ^ np.uint64(0xD6E8FEB86659FD93)) | np.uint64(1)
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :])
                % np.uint64(self.width)).astype(np.int64)

    def add(self, values, counts=None) -> "CountMinSketch":
        if not len(values):
            return self
        idx = self._hashes(values)
        w = np.ones(idx.shape[1], dtype=np.int64) if counts is None \
            else np.asarray(counts, dtype=np.int64)
        for d in range(self.depth):
            np.add.at(self.table[d], idx[d], w)
        return self

    def query(self, values) -> np.ndarray:
        if not len(values):
            return np.zeros(0, dtype=np.int64)
        idx = self._hashes(values)
        est = self.table[0][idx[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.table[d][idx[d]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.depth, self.width) == (other.depth, other.width)
        self.table += other.table
        return self


class TDigest:
    """Deterministic merging t-digest (Dunning & Ertl 2019, the
    buffer-and-merge variant): centroids are (mean, weight) pairs kept
    sorted by mean; compression merges adjacent centroids while the
    merged weight stays under the k1 scale-function bound, which caps
    the digest at O(delta) centroids with relative rank error ~1/delta
    at the tails.  One-pass and MERGEABLE: per-block digests union by
    concatenating centroid lists and re-compressing — the quantile
    companion to HLL/CMS when the two-pass exact
    ``relational.global_exact_quantiles`` would cost an extra scan.

    Deterministic: insertion sorts by (mean, weight), compression scans
    left-to-right — independent of input order after compression of the
    same value multiset, and reproducible across runs for a fixed
    partitioning.
    """

    def __init__(self, delta: int = 200):
        self.delta = delta
        self.means = np.zeros(0)
        self.weights = np.zeros(0, dtype=np.int64)

    def _k(self, q: np.ndarray) -> np.ndarray:
        # k1 scale function: asin-based, tail-accurate
        return self.delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        # k-cell assignment form of the merge (fully vectorized): each
        # sorted point is assigned to the integer cell of the scale
        # function evaluated at its LEFT cumulative-rank edge, and
        # consecutive points in the same cell collapse into one centroid
        # via reduceat.  Same O(delta) size and ~1/delta tail-accuracy
        # bounds as the sequential greedy merge (a cell spans <= 1
        # k-unit by construction), with no Python loop over centroids.
        order = np.lexsort((weights, means))
        m, w = means[order], weights[order].astype(np.int64)
        total = w.sum()
        if total == 0:
            self.means, self.weights = m[:0], w[:0]
            return
        q_left = (np.cumsum(w) - w) / total
        ki = np.floor(self._k(q_left)).astype(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], ki[1:] != ki[:-1]]))
        out_w = np.add.reduceat(w, starts)
        out_m = np.add.reduceat(m * w, starts) / out_w
        self.means = out_m
        self.weights = out_w.astype(np.int64)

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        if not len(v):
            return self
        # pre-collapse duplicates for determinism + speed
        uniq, counts = np.unique(v, return_counts=True)
        self._compress(np.concatenate([self.means, uniq]),
                       np.concatenate([self.weights,
                                       counts.astype(np.int64)]))
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        assert self.delta == other.delta
        self._compress(np.concatenate([self.means, other.means]),
                       np.concatenate([self.weights, other.weights]))
        return self

    def quantile(self, q: float) -> float:
        if not len(self.means):
            return float("nan")
        total = int(self.weights.sum())
        target = q * total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target)) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    def to_row(self) -> dict:
        return {"means": self.means.tobytes(),
                "weights": self.weights.tobytes()}

    @classmethod
    def from_row(cls, row: dict, delta: int = 200) -> "TDigest":
        d = cls(delta)
        d.means = np.frombuffer(row["means"], dtype=np.float64).copy()
        d.weights = np.frombuffer(row["weights"], dtype=np.int64).copy()
        return d
