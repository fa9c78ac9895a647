"""Polyline geometry kernels (numpy, vectorized where it pays off).

Covers the geometry operators of the reference pipeline (SURVEY.md §2.5):
points-along-line sampling (G1), last-vertex extraction (G2), parallel
offset (G6), plus the distance predicates that replace the reference's
buffer + select-by-location spatial scan (G4/G5).
"""

from __future__ import annotations

import numpy as np


def line_length(coords: np.ndarray) -> float:
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        return 0.0
    return float(np.hypot(*(c[1:] - c[:-1]).T).sum())


def points_along_line(coords: np.ndarray, spacing: float) -> np.ndarray:
    """Sample points at distances 0, spacing, 2*spacing, ... <= length
    (mirrors QGIS native:pointsalonglines with zero start offset;
    reference: cycling_quality_index.py:1491-1495)."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) == 0:
        return np.empty((0, 2))
    if len(c) == 1:
        return c[:1].copy()
    seg = c[1:] - c[:-1]
    seg_len = np.hypot(seg[:, 0], seg[:, 1])
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    total = cum[-1]
    n = int(total // spacing) + 1
    distances = np.arange(n, dtype=np.float64) * spacing
    idx = np.clip(np.searchsorted(cum, distances, side="right") - 1, 0, len(seg) - 1)
    frac = np.where(
        seg_len[idx] > 0, (distances - cum[idx]) / np.where(seg_len[idx] > 0, seg_len[idx], 1.0), 0.0
    )
    return c[idx] + seg[idx] * frac[:, None]


def last_vertex(coords: np.ndarray) -> np.ndarray:
    return np.asarray(coords, dtype=np.float64)[-1]


def point_to_polyline_distance(point: np.ndarray, coords: np.ndarray) -> float:
    """Min distance from one point to a polyline (exact, vectorized over segments)."""
    c = np.asarray(coords, dtype=np.float64)
    pt = np.asarray(point, dtype=np.float64)
    if len(c) == 1:
        return float(np.hypot(*(c[0] - pt)))
    a = c[:-1]
    b = c[1:]
    ab = b - a
    ab2 = (ab * ab).sum(axis=1)
    ap = pt - a
    t = np.clip(np.divide((ap * ab).sum(axis=1), ab2, where=ab2 > 0,
                          out=np.zeros_like(ab2)), 0.0, 1.0)
    closest = a + ab * t[:, None]
    return float(np.hypot(*(closest - pt).T).min())


def points_to_segments_distance(points: np.ndarray, seg_a: np.ndarray,
                                seg_b: np.ndarray) -> np.ndarray:
    """Pairwise distance matrix (n_points x n_segments), fully vectorized.

    Used by the cell-partitioned spatial join: inside one cell group, all
    point-vs-road-segment distances are computed in a single numpy kernel
    instead of the reference's per-buffer select-by-location rescan
    (cycling_quality_index.py:1519-1542)."""
    p = np.asarray(points, dtype=np.float64)[:, None, :]      # (n,1,2)
    a = np.asarray(seg_a, dtype=np.float64)[None, :, :]       # (1,m,2)
    b = np.asarray(seg_b, dtype=np.float64)[None, :, :]
    ab = b - a
    ab2 = (ab * ab).sum(axis=2)                               # (1,m)
    t = ((p - a) * ab).sum(axis=2) / np.where(ab2 > 0, ab2, 1.0)
    t = np.clip(t, 0.0, 1.0)
    closest = a + ab * t[:, :, None]
    d = p - closest
    return np.sqrt((d * d).sum(axis=2))                       # (n,m)


def offset_polyline(coords: np.ndarray, distance: float) -> np.ndarray:
    """Signed parallel offset of a polyline (positive = left of direction of
    travel, matching QGIS native:offsetline; reference:
    cycling_quality_index.py:305-312).  Uses miter joins via averaged unit
    normals — adequate for gentle road geometry; degenerate duplicate points
    are collapsed first."""
    c = np.asarray(coords, dtype=np.float64)
    if distance == 0 or len(c) < 2:
        return c.copy()
    keep = np.concatenate([[True], np.hypot(*(c[1:] - c[:-1]).T) > 1e-12])
    c = c[keep]
    if len(c) < 2:
        return c.copy()
    seg = c[1:] - c[:-1]
    seg /= np.hypot(seg[:, 0], seg[:, 1])[:, None]
    normals = np.stack([-seg[:, 1], seg[:, 0]], axis=1)  # left normals
    vertex_n = np.empty_like(c)
    vertex_n[0] = normals[0]
    vertex_n[-1] = normals[-1]
    if len(c) > 2:
        avg = normals[:-1] + normals[1:]
        norm = np.hypot(avg[:, 0], avg[:, 1])
        avg = np.where(norm[:, None] > 1e-12, avg / np.where(norm[:, None] > 0, norm[:, None], 1), normals[:-1])
        # miter scale so the offset distance is preserved at the joint
        cos_half = (avg * normals[:-1]).sum(axis=1)
        scale = np.where(np.abs(cos_half) > 1e-6, 1.0 / np.where(np.abs(cos_half) > 0, cos_half, 1), 1.0)
        vertex_n[1:-1] = avg * scale[:, None]
    return c + vertex_n * distance


def polyline_bbox(coords: np.ndarray) -> tuple[float, float, float, float]:
    c = np.asarray(coords, dtype=np.float64)
    return float(c[:, 0].min()), float(c[:, 1].min()), float(c[:, 0].max()), float(c[:, 1].max())


def simplify_polyline(coords: np.ndarray, eps: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification (iterative stack form —
    no recursion depth limit; the span-max perpendicular-distance step
    is one vectorized cross/norm kernel per span).  Keeps endpoints;
    guarantees every dropped vertex lies within ``eps`` of the
    simplified chain.  Deterministic: the split vertex is the argmax
    (first index on ties).

    The tile/geometry-thinning primitive: run inside ``map_batches``
    per way before rendering or shipping geometry to coarse zooms."""
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return pts.copy()
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = pts[b] - pts[a]
        mid = pts[a + 1:b] - pts[a]
        seg_len = np.hypot(seg[0], seg[1])
        if seg_len == 0.0:
            d = np.hypot(mid[:, 0], mid[:, 1])
        else:
            d = np.abs(mid[:, 0] * seg[1] - mid[:, 1] * seg[0]) / seg_len
        i = int(np.argmax(d))
        if d[i] > eps:
            split = a + 1 + i
            keep[split] = True
            stack.append((a, split))
            stack.append((split, b))
    return pts[keep]


def dp_simplify(coords: np.ndarray, tol: float) -> np.ndarray:
    """Douglas–Peucker simplification keep-mask (classic infinite-line
    distance variant).  Iterative stack instead of recursion; within
    each (i, j) span the point-to-line distances are computed
    vectorized, so the Python loop runs once per KEPT point, not per
    point.  Deterministic: the first farthest point wins ties
    (np.argmax), endpoints always kept."""
    c = np.asarray(coords, dtype=np.float64)
    n = len(c)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = c[i + 1:j]
        a, b = c[i], c[j]
        ab = b - a
        l2 = float(ab @ ab)
        if l2 == 0.0:
            d = np.hypot(*(seg - a).T)
        else:
            t = ((seg - a) @ ab) / l2
            proj = a + t[:, None] * ab
            d = np.hypot(*(seg - proj).T)
        k = int(np.argmax(d))
        if d[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep
