"""Vectorized image-analysis kernels for quality filtering and dedup.

Training-data image curation needs per-image scalar features computed in
bulk: sharpness (drop blurred frames), global statistics (drop
over/under-exposed or flat images), entropy (drop synthetic or
near-constant content), and a second fingerprint family (difference
hash) that is robust to the brightness shifts pHash's DCT step absorbs
differently.  All kernels take a 2-D uint8/float grayscale array and use
only numpy array ops — no Python loops over pixels — so a map_batches
stage stays compute-bound on the decode, not the analysis.
"""

from __future__ import annotations

import numpy as np

from .codec import resize_bilinear

_LUMA = np.array([0.299, 0.587, 0.114])


def to_gray(pixels: np.ndarray) -> np.ndarray:
    """(h, w, 3) RGB -> (h, w) float64 luma (same weights as phash64);
    2-D inputs pass through as float64."""
    p = np.asarray(pixels, dtype=np.float64)
    if p.ndim == 3:
        return p @ _LUMA
    return p


def laplacian_var(gray: np.ndarray) -> float:
    """Variance of the 4-neighbour Laplacian response — the classic
    blur/sharpness score (high = sharp edges present, near 0 = flat or
    blurred).  Computed with array shifts on the valid interior, no
    convolution library."""
    g = gray.astype(np.float64)
    if g.shape[0] < 3 or g.shape[1] < 3:
        return 0.0
    lap = (g[:-2, 1:-1] + g[2:, 1:-1] + g[1:-1, :-2] + g[1:-1, 2:]
           - 4.0 * g[1:-1, 1:-1])
    return float(lap.var())


def image_stats(gray: np.ndarray) -> tuple[float, float, float]:
    """(mean, std, entropy-of-16-bin-histogram).  Entropy in bits:
    0 for a constant image, up to 4 for a uniform 16-bin spread."""
    g = np.asarray(gray, dtype=np.float64)
    mean = float(g.mean())
    std = float(g.std())
    hist = np.bincount((np.clip(g, 0, 255).astype(np.int64) >> 4).ravel(),
                       minlength=16).astype(np.float64)
    p = hist / hist.sum()
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum())
    return mean, std, entropy


def dhash64(gray: np.ndarray) -> int:
    """64-bit difference hash: bilinear-resize to 9x8 and emit one bit
    per horizontal neighbour comparison.  Complements phash64 — dHash
    keys on local gradients, pHash on global low-frequency structure, so
    the pair catches near-dups either alone would miss."""
    t = resize_bilinear(np.asarray(gray, dtype=np.float64)[:, :, None],
                        9, 8)[:, :, 0]
    bits = (t[:, 1:] > t[:, :-1]).ravel()
    weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
    return int(np.uint64(np.sum(weights[bits], dtype=np.uint64)))


def quality_flags(sharpness: np.ndarray, mean: np.ndarray,
                  std: np.ndarray, entropy: np.ndarray,
                  min_sharpness: float = 1.0,
                  exposure_lo: float = 8.0, exposure_hi: float = 247.0,
                  min_std: float = 2.0,
                  min_entropy: float = 0.5) -> np.ndarray:
    """Vectorized keep/drop decision over per-image feature columns —
    the image analogue of the text quality filter: drop blurred
    (sharpness), clipped-exposure (mean near 0/255), flat (std), and
    near-constant (entropy) frames."""
    s = np.asarray(sharpness, dtype=np.float64)
    m = np.asarray(mean, dtype=np.float64)
    sd = np.asarray(std, dtype=np.float64)
    e = np.asarray(entropy, dtype=np.float64)
    return ((s >= min_sharpness) & (m > exposure_lo) & (m < exposure_hi)
            & (sd >= min_std) & (e >= min_entropy))
