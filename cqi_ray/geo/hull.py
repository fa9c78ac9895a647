"""Convex hull (Andrew's monotone chain) + polygon area kernels.

Per-group hulls are the trajectory-footprint / coverage-area shape:
each group's points stay co-partitioned, the hull is O(n log n) locally
and only the (tiny) hull itself would ever need to move for a global
merge (hull-of-hulls is exact — the property tests encode that law).
"""

from __future__ import annotations

import numpy as np


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Hull vertices in counter-clockwise order (collinear boundary
    points dropped).  Input (n, 2); duplicates allowed.  Returns the
    hull's points (m, 2); degenerate inputs (n <= 2, or all collinear)
    return their unique extreme points."""
    p = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    n = len(p)
    if n <= 2:
        return p
    lower: list = []
    for i in range(n):
        while len(lower) >= 2 and _cross(p[lower[-2]], p[lower[-1]],
                                         p[i]) <= 0:
            lower.pop()
        lower.append(i)
    upper: list = []
    for i in range(n - 1, -1, -1):
        while len(upper) >= 2 and _cross(p[upper[-2]], p[upper[-1]],
                                         p[i]) <= 0:
            upper.pop()
        upper.append(i)
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:  # all points collinear
        return p[[lower[0], lower[-1]]]
    return p[hull]


def shoelace_area(hull: np.ndarray) -> float:
    """Polygon area of a CCW vertex ring (0.0 for degenerate hulls)."""
    h = np.asarray(hull, dtype=np.float64)
    if len(h) < 3:
        return 0.0
    x, y = h[:, 0], h[:, 1]
    return float(np.abs(x @ np.roll(y, -1) - y @ np.roll(x, -1)) / 2.0)


def point_in_hull(pt, hull: np.ndarray, eps: float = 1e-9) -> bool:
    """True if pt lies inside or on the CCW hull."""
    h = np.asarray(hull, dtype=np.float64)
    if len(h) == 1:
        return bool(np.allclose(pt, h[0], atol=eps))
    if len(h) == 2:
        d = _cross(h[0], h[1], pt)
        if abs(d) > eps * (1 + np.abs(h).max()):
            return False
        t = np.dot(np.asarray(pt) - h[0], h[1] - h[0])
        return -eps <= t <= np.dot(h[1] - h[0], h[1] - h[0]) + eps
    for i in range(len(h)):
        if _cross(h[i], h[(i + 1) % len(h)], pt) < -eps * (1 + np.abs(h).max()):
            return False
    return True
