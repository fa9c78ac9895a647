"""Bounding-box kernels for detection-style curation stages: synthetic
deterministic box proposals per image and greedy non-maximum
suppression (NMS, the standard Felzenszwalb/Girshick post-filter).

No reference analogue (the reference scores ways, not detections) —
these back the image-axis catalog ops; semantics follow the public
torchvision.ops.nms contract: sort by score desc, keep a box iff its
IoU with every already-kept box is <= iou_thr, ties broken by box id
for cross-run determinism.
"""

from __future__ import annotations

import numpy as np


def synth_boxes(image_id: int, n: int, w: int, h: int) -> np.ndarray:
    """Deterministic box proposals for one image: columns
    (x0, y0, x1, y1, score), float64, all inside [0,w)x[0,h).
    Keyed ONLY by (image_id, draw index, field), so any worker
    regenerates the identical proposal set (no wall clock, no global
    RNG).  Uniforms come from the unseeded splitmix64 chain — the same
    SQL-replayable stream as the HLL/CMS sketches (ops/sqlhash.py) — so
    the NMS oracle can regenerate the proposals in DuckDB bit-for-bit."""
    from ..relational import _splitmix64

    j = np.arange(n, dtype=np.int64)

    def u(field: int) -> np.ndarray:
        key = ((np.int64(image_id) << np.int64(32))
               | (np.int64(field) << np.int64(16)) | j)
        return _splitmix64(_splitmix64(key)).astype(np.float64) \
            / 18446744073709551616.0

    cx = u(0) * w
    cy = u(1) * h
    bw = w * 0.1 + (w * 0.6 - w * 0.1) * u(2)
    bh = h * 0.1 + (h * 0.6 - h * 0.1) * u(3)
    x0 = np.clip(cx - bw / 2, 0, w - 1)
    y0 = np.clip(cy - bh / 2, 0, h - 1)
    x1 = np.clip(cx + bw / 2, x0 + 1, w)
    y1 = np.clip(cy + bh / 2, y0 + 1, h)
    score = np.round(0.05 + (1.0 - 0.05) * u(4), 6)
    return np.stack([x0, y0, x1, y1, score], axis=1)


def iou_matrix(boxes: np.ndarray) -> np.ndarray:
    """Pairwise IoU for an (n,4) float box array (x0,y0,x1,y1)."""
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x1 - x0) * (y1 - y0)
    ix0 = np.maximum(x0[:, None], x0[None, :])
    iy0 = np.maximum(y0[:, None], y0[None, :])
    ix1 = np.minimum(x1[:, None], x1[None, :])
    iy1 = np.minimum(y1[:, None], y1[None, :])
    iw = np.clip(ix1 - ix0, 0, None)
    ih = np.clip(iy1 - iy0, 0, None)
    inter = iw * ih
    union = area[:, None] + area[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def nms(boxes: np.ndarray, scores: np.ndarray,
        iou_thr: float = 0.5) -> np.ndarray:
    """Greedy NMS; returns indices of kept boxes in keep order.
    O(n^2) on the precomputed IoU matrix — boxes-per-image is small
    (tens), so the matrix beats the index-juggling loop."""
    order = np.lexsort((np.arange(len(scores)), -scores))
    m = iou_matrix(boxes)
    suppressed = np.zeros(len(scores), dtype=bool)
    kept: list[int] = []
    for i in order:
        if suppressed[i]:
            continue
        kept.append(int(i))
        suppressed |= m[i] > iou_thr
    return np.asarray(kept, dtype=np.int64)


def patchify(px: np.ndarray, patch: int = 8) -> np.ndarray:
    """ViT-style non-overlapping patch grid for a stack of images:
    (N, H, W, C) -> (N, H//p, W//p, p, p, C) view-reshape, zero copy
    when the input is contiguous.  H and W must be multiples of p."""
    if px.ndim == 3:
        px = px[..., None]
    n, h, w, c = px.shape
    if h % patch or w % patch:
        raise ValueError(f"image {h}x{w} not divisible by patch {patch}")
    v = px.reshape(n, h // patch, patch, w // patch, patch, c)
    return v.transpose(0, 1, 3, 2, 4, 5)
