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


def _box_sums(x: np.ndarray, win: int) -> np.ndarray:
    """Sliding ``win``×``win`` box sums over all valid positions via an
    integral image — O(hw) regardless of window size, no convolution
    library."""
    c = np.cumsum(np.cumsum(np.asarray(x, dtype=np.float64), axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    return c[win:, win:] - c[:-win, win:] - c[win:, :-win] + c[:-win, :-win]


def ssim(a: np.ndarray, b: np.ndarray, win: int = 8,
         L: float = 255.0) -> float:
    """Mean structural similarity (Wang et al. 2004, public spec) between
    two equal-shape grayscale images over uniform ``win``×``win`` sliding
    windows.  Local means/variances/covariance come from integral images
    (one pass, fully vectorized); constants are the standard
    C1=(0.01·L)², C2=(0.03·L)².  Identical inputs give exactly 1.0;
    degrades monotonically with added noise — the perceptual complement
    to the pixel-wise ``codec.psnr`` gate."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    win = min(win, a.shape[0], a.shape[1])
    n = float(win * win)
    c1 = (0.01 * L) ** 2
    c2 = (0.03 * L) ** 2
    mu_a = _box_sums(a, win) / n
    mu_b = _box_sums(b, win) / n
    va = np.maximum(_box_sums(a * a, win) / n - mu_a * mu_a, 0.0)
    vb = np.maximum(_box_sums(b * b, win) / n - mu_b * mu_b, 0.0)
    cov = _box_sums(a * b, win) / n - mu_a * mu_b
    num = (2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (va + vb + c2)
    return float(np.mean(num / den))


def dihedral_phashes(pixels: np.ndarray) -> np.ndarray:
    """pHash of all 8 dihedral transforms (4 rotations × optional
    horizontal flip) of an image, as int64[8] in the fixed order
    (rot0, rot0+hflip, rot90, rot90+hflip, rot180, rot180+hflip,
    rot270, rot270+hflip).  A flipped/rotated re-upload of an image
    hashes EXACTLY equal to one of its source's 8 entries — the
    orientation-robust fingerprint family plain pHash lacks (pHash's
    DCT is not flip/rotation invariant)."""
    from .codec import phash64

    out = np.empty(8, dtype=np.int64)
    cur = np.asarray(pixels)
    for r in range(4):
        out[2 * r] = np.uint64(phash64(cur)).astype(np.int64)
        out[2 * r + 1] = np.uint64(phash64(cur[:, ::-1])).astype(np.int64)
        cur = np.rot90(cur, axes=(0, 1))
    return out


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
