"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shapes follow the guide's scale patterns: content hashing happens
vectorized inside ``map_batches``; the only shuffles are ``groupby`` on
the hash / band keys; candidate verification is per-group.  At 100 TB the
band groupby is the co-partitioning exchange and hot bands are split by
salting on ``hash(doc_id) % k`` before verification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _stable_u64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of strings (pandas' C siphash with a
    fixed key — platform- and process-stable, vectorized)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key="cqi.dedup.v1.key", categorize=False)


def char_shingles(text: str, k: int = 5) -> set[str]:
    t = " ".join(str(text or "").lower().split())
    if len(t) < k:
        return {t} if t else set()
    return {t[i:i + k] for i in range(len(t) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[str]:
    words = str(text or "").lower().split()
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + n]) for i in range(len(words) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


class MinHasher:
    """num_perm universal-hash MinHash signatures ((a*x + b) mod p).

    Stateful (permutation tables) -> actor-pool kernel; one instance per
    actor, reused across batches."""

    def __init__(self, num_perm: int = 128, seed: int = 42, shingle_k: int = 5):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        return self.signatures_batch([text])[0]

    def signatures_batch(self, texts) -> np.ndarray:
        """(n, num_perm) matrix.  All shingles of the batch are hashed in one
        vectorized call; the permutation min runs as one (num_perm x
        n_shingles) numpy reduction per doc."""
        shingle_sets = [char_shingles(t, self.shingle_k) for t in texts]
        flat = [s for ss in shingle_sets for s in ss]
        out = np.zeros((len(texts), self.num_perm), dtype=np.uint64)
        if not flat:
            return out
        hv_all = _stable_u64(flat)
        pos = 0
        for i, ss in enumerate(shingle_sets):
            n = len(ss)
            if not n:
                continue
            hv = hv_all[pos:pos + n]
            pos += n
            # (num_perm, n_shingles) via uint64 wrap-around mul/add, then mod
            prod = (self.a[:, None] * hv[None, :] + self.b[:, None]) \
                % np.uint64(_MERSENNE)
            out[i] = prod.min(axis=1)
        return out


def band_rows(signatures: np.ndarray, doc_ids, bands: int = 16):
    """Explode signatures into (band_id, band_hash, doc_id) rows — the LSH
    bucket keys for the groupby shuffle."""
    n, num_perm = signatures.shape
    rows_per_band = num_perm // bands
    band_id = np.repeat(np.arange(bands, dtype=np.int32), n)
    doc = np.tile(np.asarray(doc_ids), bands)
    hashes = np.empty(bands * n, dtype=np.int64)
    for b in range(bands):
        chunk = signatures[:, b * rows_per_band:(b + 1) * rows_per_band]
        h = np.zeros(n, dtype=np.uint64)
        for c in range(rows_per_band):
            h = h * np.uint64(1_000_003) + chunk[:, c]
        hashes[b * n:(b + 1) * n] = h.astype(np.int64)
    return pd.DataFrame({"band_id": band_id, "band_hash": hashes, "doc_id": doc})


def candidate_pairs_from_bucket(doc_ids) -> list[tuple]:
    ids = sorted(set(doc_ids))
    return [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]


def simhash64(texts, seed: int = 42) -> np.ndarray:
    """64-bit SimHash over word tokens (token-hash bit voting)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        words = str(t or "").lower().split()
        if not words:
            out[i] = 0
            continue
        hv = _stable_u64(words)
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        value = np.uint64(0)
        for b in range(63, -1, -1):
            value = (value << np.uint64(1)) | np.uint64(votes[b] > 0)
        out[i] = value.astype(np.int64)
    return out


def cosine_dup_pairs(mat: np.ndarray, ids, threshold: float = 0.95) -> list[tuple]:
    """Brute-force embedding near-dup pairs inside one partition/bucket.
    ``mat`` rows are L2-normalized before the matmul."""
    x = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms > 0, norms, 1)
    sims = x @ x.T
    iu = np.triu_indices(len(x), k=1)
    mask = sims[iu] >= threshold
    ids = np.asarray(ids)
    return list(zip(ids[iu[0][mask]].tolist(), ids[iu[1][mask]].tolist(),
                    np.round(sims[iu][mask], 6).tolist()))


def phash_band_rows(phashes, doc_ids, bands: int = 4) -> pd.DataFrame:
    """LSH banding for 64-bit perceptual hashes: split into ``bands``
    16-bit chunks; near-dups (hamming <= bands-1... typically <= 6 with 4
    bands) collide on at least one unchanged band (pigeonhole)."""
    h = np.asarray(phashes, dtype=np.int64).astype(np.uint64)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    band_id = np.repeat(np.arange(bands, dtype=np.int32), len(h))
    chunks = [((h >> np.uint64(b * width)) & mask).astype(np.int64)
              for b in range(bands)]
    return pd.DataFrame({
        "band_id": band_id,
        "band_hash": np.concatenate(chunks),
        "doc_id": np.tile(np.asarray(doc_ids), bands),
    })


def phash_dup_pairs_in_bucket(doc_ids, hashes, max_hamming: int = 6):
    """Verify hamming distance for candidate ids inside one band bucket."""
    from ..images.codec import hamming64

    ids = np.asarray(doc_ids)
    h = np.asarray(hashes, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids, h = ids[order], h[order]
    out = []
    for i in range(len(ids)):
        d = hamming64(np.full(len(ids) - i - 1, h[i]), h[i + 1:])
        for j in np.nonzero(d <= max_hamming)[0]:
            if ids[i] != ids[i + 1 + j]:
                out.append((ids[i], ids[i + 1 + j], int(d[j])))
    return out
