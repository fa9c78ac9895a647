"""Point-in-polygon tests, vectorized (ray casting / even-odd rule).

Used to assign image-capture points to way-buffer polygons (north rule:
PIP of geotagged image rows against way-buffer polygons).
"""

from __future__ import annotations

import numpy as np


def points_in_polygon(points: np.ndarray, polygon: np.ndarray) -> np.ndarray:
    """Boolean mask: which points fall inside the (closed or open) ring.

    Vectorized over points x edges; even-odd rule; points exactly on an
    edge count per the half-open crossing convention (deterministic)."""
    pts = np.asarray(points, dtype=np.float64)
    poly = np.asarray(polygon, dtype=np.float64)
    if len(poly) >= 2 and np.allclose(poly[0], poly[-1]):
        poly = poly[:-1]
    x = pts[:, 0][:, None]        # (n,1)
    y = pts[:, 1][:, None]
    x0 = poly[:, 0][None, :]      # (1,m)
    y0 = poly[:, 1][None, :]
    x1 = np.roll(poly[:, 0], -1)[None, :]
    y1 = np.roll(poly[:, 1], -1)[None, :]
    crosses = ((y0 <= y) & (y < y1)) | ((y1 <= y) & (y < y0))
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(crosses, (y - y0) / np.where(y1 != y0, y1 - y0, 1.0), 0.0)
    xi = x0 + t * (x1 - x0)
    hits = crosses & (xi > x)
    return (hits.sum(axis=1) % 2).astype(bool)


def buffer_polygon_of_polyline(coords: np.ndarray, radius: float,
                               arc_segments: int = 8) -> np.ndarray:
    """Approximate buffer ring around a polyline: the convex-ish union of
    per-segment rectangles with rounded caps, produced as a single ring by
    offsetting both sides and closing with end-cap arcs.  Adequate for
    mostly-straight way geometry; exactness is delegated to the distance
    predicate where it matters."""
    from .lines import offset_polyline

    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        theta = np.linspace(0, 2 * np.pi, 4 * arc_segments, endpoint=False)
        return c[0] + radius * np.stack([np.cos(theta), np.sin(theta)], axis=1)
    left = offset_polyline(c, radius)
    right = offset_polyline(c, -radius)

    def _cap(center, v_from, v_to):
        # sweep clockwise (decreasing angle) so the cap bulges outward,
        # away from the line body
        a0 = np.arctan2(*(v_from - center)[::-1])
        a1 = np.arctan2(*(v_to - center)[::-1])
        while a1 > a0:
            a1 -= 2 * np.pi
        theta = np.linspace(a0, a1, arc_segments)
        return center + radius * np.stack([np.cos(theta), np.sin(theta)], axis=1)

    end_cap = _cap(c[-1], left[-1], right[-1])
    start_cap = _cap(c[0], right[0], left[0])
    return np.concatenate([left, end_cap, right[::-1], start_cap])


def points_near_polyline(points: np.ndarray, coords: np.ndarray,
                         radius: float) -> np.ndarray:
    """Exact membership in the true buffer: distance(point, line) <= radius.
    This is the predicate of record; the polygon form exists for the PIP
    operator surface and for rendering."""
    from .lines import points_to_segments_distance

    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        d = np.hypot(*(np.asarray(points) - c[0]).T)
        return d <= radius
    d = points_to_segments_distance(points, c[:-1], c[1:])
    return d.min(axis=1) <= radius
