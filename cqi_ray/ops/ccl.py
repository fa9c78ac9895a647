"""Distributed raster connected-component labeling (4-adjacency).

The classic multi-node CCL plan (used for land-cover rasters, image
masks, occupancy grids):

1. tile the grid; label every tile INDEPENDENTLY (local union-find,
   roots = the component's minimum global linear cell index),
2. emit only per-root partial stats and boundary (cell, root) rows,
3. pair boundary rows across adjacent tiles (an anchor/probe groupby on
   the neighbor cell — no geometry ever re-reads),
4. fold the resulting root-equivalence pairs with a union-find whose
   input is O(boundary cells + components), never O(cells) — the
   standard CCL scale argument: shuffled/driver bytes are proportional
   to component count and tile perimeter, while the O(cells) work stays
   data-parallel inside the tiles.

Reference analogue: the raster stage of the QGIS pipeline works on
styled rasters only (`/root/reference/README.md`); CCL is net-new
engine surface for mask/segmentation workloads.
"""

from __future__ import annotations

import numpy as np


def _find(parent: dict, x: int) -> int:
    root = x
    while parent[root] != root:
        root = parent[root]
    while parent[x] != root:  # path compression
        parent[x], x = root, parent[x]
    return root


def _union_min(parent: dict, a: int, b: int) -> None:
    ra, rb = _find(parent, a), _find(parent, b)
    if ra == rb:
        return
    if ra < rb:
        parent[rb] = ra
    else:
        parent[ra] = rb


def label_cells(ix: np.ndarray, iy: np.ndarray, width: int):
    """Union-find CCL over occupied cells given by (ix, iy) coordinate
    arrays (duplicates allowed).  Returns (cells, roots): unique linear
    cell ids and, for each, the component root = the component's
    MINIMUM linear cell id — a canonical label that survives merging
    across tiles by taking further minima.

    Adjacency edges are found vectorized on a local bitmap; only the
    union-find itself loops (O(edges) alpha(n), edges <= 2 * occupied).
    """
    lin = np.unique(ix.astype(np.int64) * width + iy.astype(np.int64))
    if not len(lin):
        return lin, lin
    gx, gy = lin // width, lin % width
    x0, y0 = int(gx.min()), int(gy.min())
    lx, ly = gx - x0, gy - y0
    occ = np.zeros((int(lx.max()) + 1, int(ly.max()) + 1), dtype=bool)
    occ[lx, ly] = True
    cell_of = np.full(occ.shape, -1, dtype=np.int64)
    cell_of[lx, ly] = lin

    parent = {int(c): int(c) for c in lin}
    right = occ[:-1, :] & occ[1:, :]
    for a, b in zip(cell_of[:-1, :][right], cell_of[1:, :][right]):
        _union_min(parent, int(a), int(b))
    down = occ[:, :-1] & occ[:, 1:]
    for a, b in zip(cell_of[:, :-1][down], cell_of[:, 1:][down]):
        _union_min(parent, int(a), int(b))

    roots = np.fromiter((_find(parent, int(c)) for c in lin),
                        dtype=np.int64, count=len(lin))
    return lin, roots


def merge_equivalences(pairs) -> dict:
    """Fold cross-tile root-equivalence pairs into a canonical-root map
    {root -> global_min_root}.  Input size is O(boundary cells); output
    covers only roots that appear in a pair."""
    parent: dict = {}
    for a, b in pairs:
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        _union_min(parent, a, b)
    return {r: _find(parent, r) for r in parent}
