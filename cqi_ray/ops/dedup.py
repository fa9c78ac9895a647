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


def md5_lower64(values) -> np.ndarray:
    """64-bit hash of each string: little-endian uint64 of md5 bytes 8..16
    — bit-identical to DuckDB's ``md5_number_lower``, which makes every
    operator built on it SQL-oracle-checkable.  hashlib's md5 runs at C
    speed; callers hash *unique* tokens once per batch where possible."""
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[8:16], "little")
    return out


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


def simhash64(texts) -> np.ndarray:
    """64-bit SimHash over word tokens (token-hash bit voting, duplicates
    counted).  Token hash is ``md5_lower64`` so the whole operator is
    expressible in ANSI SQL (DuckDB ``md5_number_lower``) and driver-oracle
    checked; unique tokens are hashed once per batch (tiny vocab => tiny
    hash cost).  Bit b is set iff the +1/-1 vote sum over token
    occurrences is strictly positive."""
    # hash each distinct token once across the batch
    vocab: dict[str, int] = {}
    tokenized = []
    for t in texts:
        words = str(t or "").lower().split()
        tokenized.append(words)
        for w in words:
            if w not in vocab:
                vocab[w] = len(vocab)
    hv_vocab = md5_lower64(list(vocab.keys())) if vocab else np.empty(0, np.uint64)
    bit_vocab = ((hv_vocab[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                 & np.uint64(1)).astype(np.int64)  # (V, 64)
    vote_vocab = 2 * bit_vocab - 1
    out = np.empty(len(texts), dtype=np.int64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, words in enumerate(tokenized):
        if not words:
            out[i] = 0
            continue
        idx = np.fromiter((vocab[w] for w in words), dtype=np.int64,
                          count=len(words))
        votes = vote_vocab[idx].sum(axis=0)
        out[i] = ((votes > 0).astype(np.uint64) * weights).sum().astype(np.uint64) \
            .astype(np.int64)
    return out


def embedding_lsh_pairs(ds, threshold: float = 0.9, n_tables: int = 8,
                        n_planes: int = 6, seed: int = 42,
                        num_buckets: int = 64, join_buckets: int = 16,
                        star_cap: int | None = None):
    """LSH-blocked embedding near-dup pairs — the sub-quadratic scale path
    next to the exact triangle join (queries.q_dedup_embedding):

      L independent hyperplane tables (OR-amplification, like MinHash
      bands) bucket every vector L times -> groupby(table, bucket) ->
      in-bucket candidate pairs pruned by a 64-bit SIGN SKETCH hamming
      test -> distinct pairs -> two bucketed joins attach the vectors ->
      exact cosine verify per pair.

    Band rows carry (table, bucket, vec_id, sketch int64) — ~32 B/row.
    The previous design tiled the full embedding onto every band row
    (n_tables x dim x 4 B per vector, e.g. 2 KB/vector at dim 64 x 8
    tables), which made the banding shuffle the pipeline's dominant and
    most variance-prone cost at 500k vectors; the sketch form moves ~8x
    less and mirrors the minhash pipeline's low-byte-signature shape.

    The hamming prune: a pair at cosine >= threshold flips each sketch
    bit with p = acos(threshold)/pi, so its hamming distance over 64
    planes is Binomial(64, p); candidates within mean + 4 sigma bits are
    kept (boundary miss probability ~3e-5, smaller for closer pairs)
    while the random bulk (cosine ~ 0 -> ~29 of 64 bits) never reaches
    the vector joins.  The final exact verify keeps the no-false-
    positives property regardless of the prune.

    Communication is O(n*L) skinny rows; in-bucket work is
    sum(bucket^2) sketch XORs ~= L * n^2 / 2^planes worst-case — size
    ``n_planes`` so buckets hold ~500 rows (2^planes ~= n/500) and
    ``join_buckets`` to ~2-5k surviving pairs per bucket.  ``star_cap``
    bounds near-identical piles exactly as in
    queries.minhash_near_dup_pairs: runs above the cap emit the min-id
    star (O(g) pairs, cluster-equivalent for mutually-similar piles)
    instead of g(g-1)/2 candidates.  Recall for a
    pair at angle theta is 1 - (1 - (1-theta/pi)^planes)^tables (e.g.
    ~0.98 at cosine 0.9 with 8x6); tested against brute force on
    planted near-dups (tests/test_ops.py)."""
    import pandas as pd

    from ..relational import (bucketed_hash_join, distinct_rows,
                              grouped_map_buckets)
    from .ann import HyperplaneLSH

    lshs = [HyperplaneLSH(dim=None, n_planes=n_planes, seed=seed + t)
            for t in range(n_tables)]
    # sketch planes live far from the table seeds so no table reuses them
    sketcher = HyperplaneLSH(dim=None, n_planes=64, seed=seed + 104_729)
    p_t = float(np.arccos(min(max(threshold, -1.0), 1.0)) / np.pi)
    ham_cut = int(np.ceil(64.0 * p_t
                          + 4.0 * np.sqrt(64.0 * p_t * (1.0 - p_t)))) + 1

    def band(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        ids = batch["vec_id"].to_numpy(dtype=np.int64)
        sketcher.ensure_dim(mat.shape[1])
        sketch = sketcher.bucket(mat)
        frames = []
        for t, lsh in enumerate(lshs):
            lsh.ensure_dim(mat.shape[1])
            frames.append(pd.DataFrame({
                "table": np.int64(t),
                "bucket": lsh.bucket(mat),
                "vec_id": ids,
                "sketch": sketch,
            }))
        return pd.concat(frames, ignore_index=True)

    def bucket_pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64")})
        if len(bucket) < 2:
            return empty
        tb = bucket["table"].to_numpy()
        bk = bucket["bucket"].to_numpy()
        ids_all = bucket["vec_id"].to_numpy(dtype=np.int64)
        sk_all = bucket["sketch"].to_numpy().astype(np.int64) \
            .view(np.uint64)
        change = (np.diff(tb) != 0) | (np.diff(bk) != 0)
        bounds = np.concatenate([[0], np.nonzero(change)[0] + 1,
                                 [len(bucket)]])
        all_a, all_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            u, first = np.unique(ids_all[s:e], return_index=True)
            if len(u) < 2:
                continue
            sk = sk_all[s:e][first]
            if star_cap is not None and len(u) > star_cap:
                # boilerplate pile (see minhash_near_dup_pairs docstring):
                # star to the min id, O(g) instead of g(g-1)/2 pairs
                ia = np.zeros(len(u) - 1, dtype=np.int64)
                ib = np.arange(1, len(u), dtype=np.int64)
            else:
                ia, ib = np.triu_indices(len(u), 1)
            ham = _popcount64(sk[ia] ^ sk[ib])
            keep = ham <= ham_cut
            if keep.any():
                all_a.append(u[ia[keep]])
                all_b.append(u[ib[keep]])
        if not all_a:
            return empty
        pairs = np.unique(np.stack([np.concatenate(all_a),
                                    np.concatenate(all_b)], axis=1), axis=0)
        return pd.DataFrame({"a": pairs[:, 0].astype(np.int64),
                             "b": pairs[:, 1].astype(np.int64)})

    banded = ds.map_batches(band, batch_format="pandas")
    cands = grouped_map_buckets(banded, ["table", "bucket"], bucket_pairs,
                                num_buckets=num_buckets, whole_bucket=True)
    cands = distinct_rows(cands, ["a", "b"])

    # vectors travel the pair joins as raw float32 bytes: the join's
    # union shuffle NaN-fills the other side's columns, which Ray's
    # tensor-extension column cannot concat (object ndarray mixing
    # float64 NaN with ndarrays); a plain bytes column can
    def emb_bytes(col_id: str, col_emb: str):
        def _pack(b: pd.DataFrame) -> pd.DataFrame:
            vecs = [np.asarray(v, dtype=np.float32).tobytes()
                    for v in b["embedding"]]
            return pd.DataFrame({col_id: b["vec_id"].astype("int64"),
                                 col_emb: vecs})
        return _pack

    emb_a = ds.map_batches(emb_bytes("a", "emb_a"), batch_format="pandas")
    emb_b = ds.map_batches(emb_bytes("b", "emb_b"), batch_format="pandas")
    witha = bucketed_hash_join(cands, emb_a, on="a",
                               right_cols=["a", "emb_a"],
                               num_buckets=join_buckets,
                               restore_dtypes={"a": "int64", "b": "int64"})
    withb = bucketed_hash_join(witha, emb_b, on="b",
                               right_cols=["b", "emb_b"],
                               num_buckets=join_buckets,
                               restore_dtypes={"a": "int64", "b": "int64"})

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"),
                              "b": pd.Series(dtype="int64")})
        if not len(batch):
            return empty
        va = np.stack([np.frombuffer(x, dtype=np.float32)
                       for x in batch["emb_a"]]).astype(np.float64)
        vb = np.stack([np.frombuffer(x, dtype=np.float32)
                       for x in batch["emb_b"]]).astype(np.float64)
        va /= np.maximum(np.linalg.norm(va, axis=1, keepdims=True), 1e-12)
        vb /= np.maximum(np.linalg.norm(vb, axis=1, keepdims=True), 1e-12)
        sims = np.einsum("ij,ij->i", va, vb)
        out = batch.loc[sims >= threshold, ["a", "b"]]
        return out.astype({"a": "int64", "b": "int64"}).reset_index(drop=True)

    return withb.map_batches(verify, batch_format="pandas")


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
    equal chunks.  By pigeonhole, a pair with hamming distance <= bands-1
    collides on at least one unchanged band (4 bands => guaranteed recall
    only for hamming <= 3); verifying with a larger ``max_hamming`` gives
    APPROXIMATE recall — pairs whose differing bits touch every band are
    missed.  For a guarantee at hamming <= H, use ``hash_band_rows`` with
    bands = H + 1."""
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


def hash_band_rows(hashes: np.ndarray, doc_ids, bands: int) -> pd.DataFrame:
    """Generalized 64-bit-hash banding with uneven widths: the first
    ``64 % bands`` bands get one extra bit, so all 64 bits are covered by
    exactly one band.  Pigeonhole guarantee: pairs at hamming distance
    <= bands-1 share at least one band (use bands = max_hamming + 1 for
    exact recall at the verify threshold)."""
    h = np.asarray(hashes).astype(np.uint64)
    widths = [64 // bands + (1 if b < 64 % bands else 0) for b in range(bands)]
    band_id = np.repeat(np.arange(bands, dtype=np.int32), len(h))
    chunks, shift = [], 0
    for b, w in enumerate(widths):
        mask = np.uint64((1 << w) - 1)
        chunks.append(((h >> np.uint64(shift)) & mask).astype(np.int64))
        shift += w
    return pd.DataFrame({
        "band_id": band_id,
        "band_hash": np.concatenate(chunks),
        "doc_id": np.tile(np.asarray(doc_ids), bands),
    })


# Planted near-duplicate masks for the metadata-phash dedup operator:
# nested bit sets => within a group of 4 ids the pairwise hamming
# distances are 3/6/9/3/6/3, all <= 10; across groups the base hashes are
# independent md5s (P[hamming <= 10] ~ 1e-8).
PLANTED_MASKS = np.array([
    0,
    (1 << 1) | (1 << 22) | (1 << 43),
    (1 << 1) | (1 << 22) | (1 << 43) | (1 << 5) | (1 << 29) | (1 << 51),
    (1 << 1) | (1 << 22) | (1 << 43) | (1 << 5) | (1 << 29) | (1 << 51)
    | (1 << 9) | (1 << 33) | (1 << 60),
], dtype=np.uint64)


def planted_phash64(doc_ids, group: int = 4) -> np.ndarray:
    """Deterministic 64-bit perceptual-hash METADATA column with planted
    near-duplicates: ids in the same ``group`` share an md5 base hash and
    differ by nested bit-flip masks.  Matches the SQL expression
    ``xor(md5_number_lower(CAST(doc_id // 4 AS VARCHAR)), mask[doc_id % 4])``
    exactly, which is what makes the LSH pair/cluster pipelines
    DuckDB-oracle-checkable (the pixel-DCT pHash stays in the image
    pipelines, where bytes exist)."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    base = md5_lower64([str(i) for i in (ids // group)])
    return base ^ PLANTED_MASKS[ids % group]


def hamming64_u(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of xor over uint64 arrays."""
    return _popcount64(np.asarray(a).astype(np.uint64)
                       ^ np.asarray(b).astype(np.uint64))


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + \
        ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


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


def run_bounds(*keys) -> np.ndarray:
    """Run boundaries over parallel pre-sorted key arrays: returns the
    index vector b with runs [b[i], b[i+1])."""
    n = len(keys[0])
    if n == 0:
        return np.array([0], dtype=np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for k in keys:
        a = np.asarray(k)
        change |= a[1:] != a[:-1]
    return np.concatenate([[0], np.nonzero(change)[0] + 1, [n]])


def hamming_dup_pairs_grouped(ids, hashes, bounds: np.ndarray,
                              max_hamming: int):
    """All (a, b) id pairs with hamming(hash_a, hash_b) <= max_hamming
    within each run of ``bounds`` (rows pre-sorted by the grouping keys),
    with a < b.  Fully vectorized and exact-dup-pile safe: identical
    hashes are collapsed to one representative first, pairwise hamming
    runs on the (small) distinct-hash matrix in bounded row chunks, and
    expansion back to member ids is numpy repeat/tile proportional to the
    OUTPUT size — a corpus with a million copies of one image costs
    O(distinct^2 + |output pairs|), never O(members^2) hamming compute.
    Returns (a, b) numpy arrays (possibly object dtype for string ids)."""
    h = np.asarray(hashes).astype(np.uint64)
    ids = np.asarray(ids)
    out_a: list = []
    out_b: list = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        if e - s < 2:
            continue
        gi, gh = ids[s:e], h[s:e]
        u_h, inv = np.unique(gh, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        members = gi[order]
        counts = np.bincount(inv, minlength=len(u_h))
        offs = np.concatenate([[0], np.cumsum(counts)])
        nu = len(u_h)
        # near-dup pairs between DISTINCT hashes (chunked u x u matrix)
        for c0 in range(0, nu, 1024):
            c1 = min(c0 + 1024, nu)
            d = _popcount64(u_h[c0:c1, None] ^ u_h[None, :])
            pi, pj = np.nonzero(d <= max_hamming)
            pi = pi + c0
            keep = pi < pj
            for p, q in zip(pi[keep], pj[keep]):
                a = np.repeat(members[offs[p]:offs[p + 1]], counts[q])
                b = np.tile(members[offs[q]:offs[q + 1]], counts[p])
                ne = a != b
                out_a.append(np.minimum(a[ne], b[ne]))
                out_b.append(np.maximum(a[ne], b[ne]))
        # exact-duplicate piles: all intra-group pairs (d == 0)
        for g in np.nonzero(counts > 1)[0]:
            mem = members[offs[g]:offs[g + 1]]
            ia, ib = np.triu_indices(len(mem), 1)
            a, b = mem[ia], mem[ib]
            ne = a != b
            out_a.append(np.minimum(a[ne], b[ne]))
            out_b.append(np.maximum(a[ne], b[ne]))
    if not out_a:
        return ids[:0], ids[:0]
    return np.concatenate(out_a), np.concatenate(out_b)
