"""Packed STR R-tree, from scratch on numpy.

The north rule asks for "actor pools holding S2 cell covers and R-tree
fragments as stateful per-partition state".  This module is that state:
a static, bulk-loaded (Sort-Tile-Recursive) R-tree over way bounding
boxes, built once per actor in ``__init__`` (broadcast small side) or
once per bucket (partitioned big side), then queried per batch with
fully vectorized level-descent.

Design notes for 100 TB scale
-----------------------------
* The tree is *packed*: every node except the last per level is full, so
  the whole structure is four float64 arrays per level plus one child
  offset - no Python node objects, ~36 bytes/item, safe to ``ray.put``
  and share zero-copy across actors on a node.
* ``query_boxes`` descends all levels breadth-first with a single numpy
  join per level (frontier x children), returning (query_idx, item_idx)
  pair arrays - ragged results without Python loops over queries.
* Bulk-load only - matches the engine's execution model, where a stage's
  lookup side is immutable for the lifetime of the stage.  Mutability
  would need R*-style splits; a rebuild per stage is cheaper here.

Reference parity: this replaces the reference's per-buffer
``native:selectbylocation`` rescans (cycling_quality_index.py:1519-1542)
with an index the distributed join can hold as actor state.
"""

from __future__ import annotations

import numpy as np

_LEAF_CAP = 16


class STRtree:
    """Static packed R-tree over axis-aligned boxes.

    Parameters
    ----------
    boxes : (n, 4) float64 ``[xmin, ymin, xmax, ymax]`` per item.
    leaf_capacity : fan-out at every level (STR tile size).
    """

    def __init__(self, boxes: np.ndarray, leaf_capacity: int = _LEAF_CAP):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n_items = len(boxes)
        self.cap = int(leaf_capacity)
        if self.n_items == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels: list[np.ndarray] = []
            return
        self.order = _str_order(boxes, self.cap)
        # level 0 = leaves: boxes of the items in packed order
        packed = boxes[self.order]
        levels = [packed]
        while len(levels[-1]) > 1:
            levels.append(_pack_parents(levels[-1], self.cap))
        # levels[0] = items ... levels[-1] = root (length 1)
        self.levels = levels

    # -- queries ---------------------------------------------------------

    def query_boxes(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch box-intersection query.

        Returns ``(query_idx, item_idx)`` pair arrays: every (q, i) where
        ``qboxes[q]`` intersects item box ``i`` (original item order).
        """
        q = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        if self.n_items == 0 or len(q) == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        # frontier: (query_idx, node_idx) at the current level, starting at
        # the root and descending.  Each descent expands node_idx into its
        # children (contiguous slots thanks to packing) and filters by
        # bbox intersection in one vectorized step.
        qi = np.arange(len(q), dtype=np.int64)
        ni = np.zeros(len(q), dtype=np.int64)
        if len(self.levels) == 1:
            # single-item tree: the root IS the item level, so the loop
            # below never tests it - test directly
            b = self.levels[0][0]
            hit = ((q[:, 0] <= b[2]) & (b[0] <= q[:, 2]) &
                   (q[:, 1] <= b[3]) & (b[1] <= q[:, 3]))
            return qi[hit], self.order[ni[hit]]
        for depth in range(len(self.levels) - 1, 0, -1):
            child_level = self.levels[depth - 1]
            # children of node k live at [k*cap, min((k+1)*cap, len))
            starts = ni * self.cap
            counts = np.minimum(self.cap, len(child_level) - starts)
            # expand: repeat each (q, node) by its child count
            qi = np.repeat(qi, counts)
            offs = _ragged_arange(counts)
            ci = np.repeat(starts, counts) + offs
            cb = child_level[ci]
            qb = q[qi]
            hit = ((qb[:, 0] <= cb[:, 2]) & (cb[:, 0] <= qb[:, 2]) &
                   (qb[:, 1] <= cb[:, 3]) & (cb[:, 1] <= qb[:, 3]))
            qi, ni = qi[hit], ci[hit]
        return qi, self.order[ni]

    def query_points(self, points: np.ndarray, radius: float
                     ) -> tuple[np.ndarray, np.ndarray]:
        """Items whose box intersects a square of half-width ``radius``
        around each point: the candidate set for an exact distance check."""
        p = np.asarray(points, dtype=np.float64).reshape(-1, 2)
        qb = np.concatenate([p - radius, p + radius], axis=1)
        return self.query_boxes(qb)


def _ragged_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0), [0..c1), ... concatenated, without a Python loop."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    idx = np.arange(total, dtype=np.int64)
    return idx - np.repeat(ends - counts, counts)


def _str_order(boxes: np.ndarray, cap: int) -> np.ndarray:
    """Sort-Tile-Recursive ordering: slice by center-x into vertical slabs
    of ~sqrt(n/cap) tiles, then order each slab by center-y.  Returns the
    permutation of item indices in packed leaf order."""
    n = len(boxes)
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    n_leaves = -(-n // cap)
    n_slabs = max(1, int(np.ceil(np.sqrt(n_leaves))))
    slab_size = -(-n // n_slabs)
    by_x = np.argsort(cx, kind="stable")
    order = np.empty(n, dtype=np.int64)
    for s in range(0, n, slab_size):
        slab = by_x[s:s + slab_size]
        order[s:s + len(slab)] = slab[np.argsort(cy[slab], kind="stable")]
    return order


def _pack_parents(child_boxes: np.ndarray, cap: int) -> np.ndarray:
    """Union each run of ``cap`` child boxes into one parent box."""
    n = len(child_boxes)
    n_parents = -(-n // cap)
    pad = n_parents * cap - n
    if pad:
        filler = np.repeat(child_boxes[-1:], pad, axis=0)
        child_boxes = np.concatenate([child_boxes, filler])
    g = child_boxes.reshape(n_parents, cap, 4)
    return np.concatenate([g[:, :, :2].min(axis=1), g[:, :, 2:].max(axis=1)],
                          axis=1)


def polyline_bboxes(geoms: list[np.ndarray]) -> np.ndarray:
    """(n, 4) bbox per polyline - the R-tree build input for way geometry."""
    out = np.empty((len(geoms), 4), dtype=np.float64)
    for i, g in enumerate(geoms):
        g = np.asarray(g, dtype=np.float64).reshape(-1, 2)
        out[i, 0] = g[:, 0].min()
        out[i, 1] = g[:, 1].min()
        out[i, 2] = g[:, 0].max()
        out[i, 3] = g[:, 1].max()
    return out
