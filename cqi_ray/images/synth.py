"""Deterministic synthetic image+caption table generator.

Produces the exact `input_hint` schema from BASELINE.json —
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)`` plus capture coordinates (lon, lat) for the
spatial join — entirely from a seed + row index (no wall clock, no
external data; FIXTURES.md §3/§5).

The lon/lat distribution is heavy-tailed around a handful of "urban
centers" so the cell-partitioned joins see realistic skew (the salting
path is exercised at small scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import codec

_FMTS = ("png", "raw", "jpeg")

_CAPTION_NOUNS = (
    "cycle lane", "bike path", "crossing", "kerb", "asphalt surface",
    "cobblestones", "parked cars", "bus lane", "street sign", "junction",
)
_CAPTION_ADJS = (
    "busy", "quiet", "narrow", "wide", "wet", "sunlit", "shaded", "damaged",
    "freshly painted", "tree-lined",
)


def _pixels_for(index: int, w: int, h: int) -> np.ndarray:
    """Deterministic pixel pattern keyed by row index (gradient + stripes)."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = ((xx * (index % 7 + 1)) % 256).astype(np.uint8)
    g = ((yy * (index % 5 + 2)) % 256).astype(np.uint8)
    b = (((xx + yy) * (index % 3 + 1) + index) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


def caption_for(index: int) -> str:
    adj = _CAPTION_ADJS[index % len(_CAPTION_ADJS)]
    noun = _CAPTION_NOUNS[(index // 3) % len(_CAPTION_NOUNS)]
    return f"street-level photo {index:012d}: {adj} {noun}"


def synth_positions(n: int, seed: int = 42,
                    centers: np.ndarray | None = None,
                    extent=(13.40, 51.00, 13.60, 51.10)) -> tuple[np.ndarray, np.ndarray]:
    """Heavy-tailed capture points: 80% cluster tightly around urban centers
    (zipf-weighted), 20% uniform over the extent."""
    rng = np.random.default_rng(seed)
    lon0, lat0, lon1, lat1 = extent
    if centers is None:
        k = 8
        centers = np.stack(
            [rng.uniform(lon0, lon1, k), rng.uniform(lat0, lat1, k)], axis=1
        )
    k = len(centers)
    weights = 1.0 / np.arange(1, k + 1)
    weights /= weights.sum()
    choice = rng.choice(k, size=n, p=weights)
    jitter = rng.normal(0.0, 0.004, size=(n, 2))
    pts = centers[choice] + jitter
    uniform_mask = rng.random(n) < 0.2
    n_uni = int(uniform_mask.sum())
    pts[uniform_mask, 0] = rng.uniform(lon0, lon1, n_uni)
    pts[uniform_mask, 1] = rng.uniform(lat0, lat1, n_uni)
    return pts[:, 0], pts[:, 1]


def synth_images_table(n: int, seed: int = 42, start_index: int = 0,
                       size_px: int = 48,
                       extent=(13.40, 51.00, 13.60, 51.10)) -> pa.Table:
    """Build one Arrow table shard of n synthetic image rows.

    Shard-addressable: ``start_index`` lets a distributed generator build
    row ranges independently (same ids regardless of sharding)."""
    lon, lat = synth_positions(n, seed=seed + start_index, extent=extent)
    ids, blobs, ws, hs, fmts, captions, hashes = [], [], [], [], [], [], []
    for i in range(n):
        index = start_index + i
        w = h = size_px
        px = _pixels_for(index, w, h)
        fmt = _FMTS[index % len(_FMTS)]
        if fmt == "png":
            blob = codec.png_encode(px)
        elif fmt == "raw":
            blob = codec.raw_encode(px)
        else:  # lossy DCT-quantization codec (codec.lossy_encode); the
            # stored phash describes the stored lossy image
            blob = codec.lossy_encode(px)
            px = codec.lossy_decode(blob)
        ids.append(f"img_{index:012d}")
        blobs.append(blob)
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        captions.append(caption_for(index))
        hashes.append(codec.phash64(px))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
            "lon": pa.array(lon, pa.float64()),
            "lat": pa.array(lat, pa.float64()),
        }
    )


def synth_way_rows_range(start: int, end: int, n_ways: int,
                         extent=(13.40, 51.00, 13.60, 51.10)) -> list[dict]:
    """Rows [start, end) of the deterministic synthetic way grid —
    shard-addressable so a distributed generator builds row ranges
    independently with identical content at any block layout."""
    lon0, lat0, lon1, lat1 = extent
    highways = ["residential", "secondary", "tertiary", "cycleway", "footway",
                "path", "track", "living_street", "service", "primary"]
    surfaces = [None, "asphalt", "paving_stones", "gravel", "sett", "concrete"]
    rows = []
    per_row = max(1, int(np.sqrt(n_ways)))
    for i in range(start, end):
        gx, gy = i % per_row, i // per_row
        lon = lon0 + (gx + 0.5) * (lon1 - lon0) / per_row
        lat = lat0 + (gy + 0.5) * (lat1 - lat0) / max(1, (n_ways + per_row - 1) // per_row)
        horizontal = i % 2 == 0
        dlon = (lon1 - lon0) / per_row * 0.4 if horizontal else 0.0
        dlat = 0.0 if horizontal else (lat1 - lat0) / per_row * 0.4
        row = {
            "id": f"way_{i:06d}",
            "highway": highways[i % len(highways)],
            "name": f"Synth Street {i // 4}",
            "maxspeed": str([30, 50, 30, None, 50][i % 5] or ""),
            "surface": surfaces[i % len(surfaces)],
            "lit": ["yes", "no", None][i % 3],
            "geometry": [[lon - dlon, lat - dlat], [lon + dlon, lat + dlat]],
        }
        if i % 7 == 0:
            row["cycleway:right"] = "lane"
        if i % 11 == 0:
            row["bicycle"] = "designated"
        if not row["maxspeed"]:
            row["maxspeed"] = None
        rows.append(row)
    return rows


def synth_ways_grid(n_ways: int = 64, seed: int = 42,
                    extent=(13.40, 51.00, 13.60, 51.10)) -> list[dict]:
    """Deterministic synthetic OSM-style way rows on a jittered grid, with
    tag mixes spanning the classifier's families.  Used when no real ways
    table is provided (tests / bench)."""
    return synth_way_rows_range(0, n_ways, n_ways, extent=extent)


def pixels_for_batch(indices: np.ndarray, w: int, h: int) -> np.ndarray:
    """(n,) int ids -> (n, h, w, 3) uint8 == np.stack([_pixels_for(i, w, h)
    for i in ids]) — one broadcasted pass instead of a per-image loop
    (the flagship synthesizer's hot path)."""
    idx = np.asarray(indices, dtype=np.int64)
    if len(idx) > 64:  # cache-chunked, same reasoning as codec._BATCH_CHUNK
        return np.concatenate([pixels_for_batch(idx[s:s + 64], w, h)
                               for s in range(0, len(idx), 64)])
    idx = idx[:, None, None]
    yy, xx = np.mgrid[0:h, 0:w]
    r = ((xx[None] * (idx % 7 + 1)) % 256).astype(np.uint8)
    g = ((yy[None] * (idx % 5 + 2)) % 256).astype(np.uint8)
    b = (((xx[None] + yy[None]) * (idx % 3 + 1) + idx) % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=3)
