"""Hierarchical spatial cell index (S2/H3-style), built from scratch.

Cells are a Morton/Z-order quadtree over lon/lat: at resolution ``r`` the
world is a 2^r x 2^r grid; a cell id packs the bit-interleaved (x, y) with
the resolution into one int64 — ``(morton << 5) | r``.  This gives the two
properties the engine's spatial joins need:

* equal-key co-partitioning: encode both sides of a join at the same
  resolution and ``groupby(cell)`` puts nearby geometry in the same group;
* hierarchy: ``parent(id)`` is a bit-shift, so multi-resolution covers and
  skew splitting (drop hot cells one level down) are O(1).

All kernels are vectorized numpy int64 ops — no Python loops per point —
so they run zero-copy over Arrow columns inside ``map_batches``.

Resolution guide (cell edge at the equator): r=12 ~ 9.8 km, r=15 ~ 1.2 km,
r=17 ~ 300 m, r=20 ~ 38 m.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29  # 2*29 bits morton + 5 bits resolution = 63 bits

_EARTH_CIRCUMFERENCE_M = 40_075_016.686


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the bits of v (v < 2^29), int64 in/out."""
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def _compact_bits(v: np.ndarray) -> np.ndarray:
    v = v & 0x5555555555555555
    v = (v | (v >> 1)) & 0x3333333333333333
    v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
    v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
    v = (v | (v >> 16)) & 0x00000000FFFFFFFF
    return v


def xy_at_res(lon, lat, res: int):
    """Grid coordinates of (lon, lat) at resolution ``res``."""
    n = np.int64(1) << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return x, y


def encode(lon, lat, res: int) -> np.ndarray:
    """Vectorized (lon, lat) -> int64 cell id at resolution ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution must be in [0, {MAX_RES}]")
    x, y = xy_at_res(lon, lat, res)
    morton = _spread_bits(x) | (_spread_bits(y) << 1)
    return (morton << 5) | np.int64(res)


def from_xy(x, y, res: int) -> np.ndarray:
    morton = _spread_bits(np.asarray(x, dtype=np.int64)) | (
        _spread_bits(np.asarray(y, dtype=np.int64)) << 1
    )
    return (morton << 5) | np.int64(res)


def decode(cell_ids) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (x, y, res)."""
    c = np.asarray(cell_ids, dtype=np.int64)
    res = c & 0x1F
    morton = c >> 5
    return _compact_bits(morton), _compact_bits(morton >> 1), res


def resolution(cell_ids) -> np.ndarray:
    return np.asarray(cell_ids, dtype=np.int64) & 0x1F


def parent(cell_ids, levels: int = 1) -> np.ndarray:
    c = np.asarray(cell_ids, dtype=np.int64)
    res = c & 0x1F
    morton = c >> 5
    return ((morton >> (2 * levels)) << 5) | (res - levels)


def children(cell_id: int) -> np.ndarray:
    res = cell_id & 0x1F
    morton = cell_id >> 5
    base = morton << 2
    return ((base + np.arange(4, dtype=np.int64)) << 5) | (res + 1)


def cell_bounds(cell_ids) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(lon_min, lat_min, lon_max, lat_max) per cell."""
    x, y, res = decode(cell_ids)
    n = (np.int64(1) << res).astype(np.float64)
    lon_min = x / n * 360.0 - 180.0
    lat_min = y / n * 180.0 - 90.0
    return lon_min, lat_min, lon_min + 360.0 / n, lat_min + 180.0 / n


def cell_size_m(res: int, lat: float = 0.0) -> float:
    """Approximate cell edge length in metres at a latitude."""
    east_west = _EARTH_CIRCUMFERENCE_M / (1 << res) * np.cos(np.radians(lat))
    north_south = _EARTH_CIRCUMFERENCE_M / 2 / (1 << res)
    return float(min(east_west, north_south))


def res_for_meters(target_m: float, lat: float = 0.0) -> int:
    """Finest resolution whose cell edge is still >= target_m."""
    for res in range(MAX_RES, -1, -1):
        if cell_size_m(res, lat) >= target_m:
            return res
    return 0


def neighbors(cell_ids, include_self: bool = True) -> np.ndarray:
    """3x3 neighborhood per cell -> shape (n, 9) (or (n, 8)).  Edge cells
    clamp (duplicates possible at the antimeridian/poles — callers dedup)."""
    x, y, res = decode(cell_ids)
    n = (np.int64(1) << res) - 1
    offsets = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    if include_self:
        offsets = [(0, 0)] + offsets
    cols = []
    for dx, dy in offsets:
        nx = np.clip(x + dx, 0, n)
        ny = np.clip(y + dy, 0, n)
        cols.append(from_xy(nx, ny, 0) | 0)  # res patched below
    out = np.stack(cols, axis=1)
    # restore per-cell resolution bits
    return (out & ~np.int64(0x1F)) | res[:, None]


def cover_disc(lon: float, lat: float, radius_m: float, res: int) -> np.ndarray:
    """Cells at ``res`` overlapping a metric disc around (lon, lat)."""
    dlat = radius_m / (_EARTH_CIRCUMFERENCE_M / 360.0)
    dlon = dlat / max(np.cos(np.radians(lat)), 1e-9)
    return cover_bbox(lon - dlon, lat - dlat, lon + dlon, lat + dlat, res)


def cover_bbox(lon_min: float, lat_min: float, lon_max: float, lat_max: float,
               res: int) -> np.ndarray:
    x0, y0 = xy_at_res(lon_min, lat_min, res)
    x1, y1 = xy_at_res(lon_max, lat_max, res)
    xs = np.arange(int(x0), int(x1) + 1, dtype=np.int64)
    ys = np.arange(int(y0), int(y1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return from_xy(gx.ravel(), gy.ravel(), res)


def cover_polyline(coords: np.ndarray, res: int, pad_m: float = 0.0) -> np.ndarray:
    """Cells at ``res`` covering a lon/lat polyline's bbox (+pad metres).
    For long lines, callers should split first; for road segments at r>=15
    the bbox cover is tight."""
    c = np.asarray(coords, dtype=np.float64)
    lat_mid = float(c[:, 1].mean())
    dlat = pad_m / (_EARTH_CIRCUMFERENCE_M / 360.0)
    dlon = dlat / max(np.cos(np.radians(lat_mid)), 1e-9)
    return cover_bbox(
        float(c[:, 0].min()) - dlon, float(c[:, 1].min()) - dlat,
        float(c[:, 0].max()) + dlon, float(c[:, 1].max()) + dlat, res,
    )


# ---------------------------------------------------------------------------
# Web-mercator tile math (z/x/y pyramid, standard "slippy map" scheme)
# ---------------------------------------------------------------------------

def lonlat_to_tile(lon, lat, zoom: int):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    n = 1 << zoom
    xt = ((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_rad = np.radians(lat)
    yt = ((1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n).astype(np.int64)
    return np.clip(xt, 0, n - 1), np.clip(yt, 0, n - 1)


def tile_bounds(z: int, x: int, y: int):
    """(lon_min, lat_min, lon_max, lat_max) of one web-mercator tile."""
    n = 1 << z
    lon_min = x / n * 360.0 - 180.0
    lon_max = (x + 1) / n * 360.0 - 180.0
    lat_max = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * y / n))))
    lat_min = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (y + 1) / n))))
    return lon_min, lat_min, lon_max, lat_max


def lonlat_to_tile_pixel(lon, lat, z: int, x: int, y: int, tile_size: int = 256):
    """Pixel coordinates inside one tile (float; callers clip/round)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    n = 1 << z
    fx = (lon + 180.0) / 360.0 * n - x
    lat_rad = np.radians(lat)
    fy = (1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n - y
    return fx * tile_size, fy * tile_size


def tile_pixel_to_lonlat(px, py, z: int, x: int, y: int,
                         tile_size: int = 256):
    """Inverse of ``lonlat_to_tile_pixel``: pixel coordinates inside tile
    (z, x, y) -> (lon, lat) degrees (Web Mercator)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = 1 << z
    lon = (x + px / tile_size) / n * 360.0 - 180.0
    merc = np.pi * (1.0 - 2.0 * (y + py / tile_size) / n)
    lat = np.degrees(np.arctan(np.sinh(merc)))
    return lon, lat


def hilbert_xy2d(order: int, x, y) -> np.ndarray:
    """Vectorized Hilbert-curve index for a 2^order x 2^order grid
    (classic bit recursion, reflections against the FULL grid n-1-x as
    in the textbook formulation — only low bits are re-examined, so the
    variant choice is observable and pinned by the exhaustive property
    tests: bijection + unit-step adjacency).  The Hilbert key is the
    spatial partitioner of choice at scale: consecutive key ranges are
    spatially compact (unit steps), unlike Morton's quadrant jumps."""
    n = np.int64(1) << order
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        ref = (ry == 0) & (rx == 1)
        x[ref] = n - 1 - x[ref]
        y[ref] = n - 1 - y[ref]
        swap = ry == 0
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        s >>= 1
    return d


# ---------------------------------------------------------------------------
# Hexagonal cells (H3-style, from scratch)
# ---------------------------------------------------------------------------
# Axial-coordinate pointy-top hex grid over planar (x, y): the H3-class
# complement to the Morton quadtree above.  Hexagons give the property
# squares lack — all 6 neighbors are EQUIDISTANT — so k-ring expansion
# (radius queries, hot-cell spill, spatial smoothing) has no diagonal
# bias.  Every kernel is vectorized numpy over float64/int64; the
# float->cell quantization uses floor(v + 0.5) (not banker's rounding)
# so the DuckDB oracle replays it bit-for-bit.

_SQRT3 = float(np.sqrt(3.0))
_HEX_OFF = np.int64(1) << 25  # axial offset to non-negative; 26-bit fields


def hex_axial(x, y, size: float):
    """Planar (x, y) -> fractional axial (q, r) for pointy-top hexes of
    circumradius ``size``."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    q = (_SQRT3 / 3.0 * x - 1.0 / 3.0 * y) / size
    r = (2.0 / 3.0 * y) / size
    return q, r


def _round_half_up(v: np.ndarray) -> np.ndarray:
    return np.floor(v + 0.5)


def hex_encode(x, y, size: float) -> np.ndarray:
    """Planar points -> int64 hex cell ids (axial (q, r) cube-rounded and
    packed as (q + 2^25) << 26 | (r + 2^25) — 52 bits, |q|,|r| < 2^25)."""
    qf, rf = hex_axial(x, y, size)
    sf = -qf - rf
    rq, rr, rs = _round_half_up(qf), _round_half_up(rf), _round_half_up(sf)
    dq, dr, ds = np.abs(rq - qf), np.abs(rr - rf), np.abs(rs - sf)
    # cube-rounding constraint repair: recompute the axis with the
    # largest rounding error from the other two so q + r + s == 0
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    rq = np.where(fix_q, -rr - rs, rq)
    rr = np.where(fix_r, -rq - rs, rr)
    # (the s axis needs no repair — it is not part of the packed id)
    qi = rq.astype(np.int64) + _HEX_OFF
    ri = rr.astype(np.int64) + _HEX_OFF
    return (qi << np.int64(26)) | ri


def hex_decode(cell) -> tuple:
    """int64 cell ids -> integer axial (q, r)."""
    cell = np.asarray(cell, dtype=np.int64)
    return ((cell >> np.int64(26)) - _HEX_OFF,
            (cell & np.int64(0x3FFFFFF)) - _HEX_OFF)


def hex_center(cell, size: float):
    """Cell ids -> planar (x, y) hex centers."""
    q, r = hex_decode(cell)
    q = q.astype(np.float64)
    r = r.astype(np.float64)
    x = size * (_SQRT3 * q + _SQRT3 / 2.0 * r)
    y = size * (1.5 * r)
    return x, y


_HEX_DIRS = np.array([[1, 0], [1, -1], [0, -1], [-1, 0], [-1, 1], [0, 1]],
                     dtype=np.int64)


def hex_kring(cell, k: int = 1) -> np.ndarray:
    """All cells within hex distance k of each input cell (the H3 kRing):
    (n, 3k(k+1)+1) int64 — ring cells enumerated by axial offsets."""
    q, r = hex_decode(cell)
    offs = [(dq, dr) for dq in range(-k, k + 1)
            for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1)]
    offs = np.array(offs, dtype=np.int64)
    qq = q[:, None] + offs[None, :, 0] + _HEX_OFF
    rr = r[:, None] + offs[None, :, 1] + _HEX_OFF
    return (qq << np.int64(26)) | rr


def hex_distance(a, b) -> np.ndarray:
    """Hex grid distance between cell ids (axial Manhattan / 2)."""
    qa, ra = hex_decode(a)
    qb, rb = hex_decode(b)
    dq, dr = qa - qb, ra - rb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
