"""Multi-file input merge + duplicate-geometry dedup.

Reference: the optional multi-input path (cycling_quality_index.py:
1817-1833): read way_import1..N, retain fields, merge, drop duplicate
geometries.  Dedup key = the exact coordinate sequence (matching QGIS
native:deleteduplicategeometries, which compares geometries, not ids);
first occurrence in file order wins.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from .geojson import read_ways_geojson


def geometry_key(coords) -> bytes:
    return np.ascontiguousarray(np.asarray(coords, dtype="<f8")).tobytes()


def dedup_geometries(rows: list[dict]) -> list[dict]:
    seen: set[bytes] = set()
    out = []
    for row in rows:
        key = geometry_key(row["geometry"])
        if key in seen:
            continue
        seen.add(key)
        out.append(row)
    return out


def merge_way_sources(paths: Iterable[str]) -> list[dict]:
    """Read + concatenate multiple GeoJSON way files, drop exact duplicate
    geometries (file order wins).  The distributed equivalent for parquet
    shards is relational.exact_dedup keyed on the geometry bytes."""
    rows: list[dict] = []
    for path in paths:
        rows.extend(read_ways_geojson(path))
    return dedup_geometries(rows)
