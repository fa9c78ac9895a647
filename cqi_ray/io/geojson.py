"""GeoJSON LineString reader/writer for dev-scale inputs.

The at-scale sources are Parquet/Lance tables (see cqi_ray.pipelines);
GeoJSON is the conformance-corpus format (reference reader:
cycling_quality_index.py:1452, writer :1806).
"""

from __future__ import annotations

import json
from typing import Iterable, Optional

from ..params import INPUT_TAG_COLUMNS


def read_ways_geojson(path: str, retain: Optional[Iterable[str]] = None) -> list[dict]:
    """FeatureCollection -> list of row dicts.

    Only LineString features are kept (the reference opens the layer with
    ``|geometrytype=LineString``) and tag columns are pruned to the engine's
    input schema (the reference's retain-fields step,
    cycling_quality_index.py:1455)."""
    keep = set(retain if retain is not None else INPUT_TAG_COLUMNS)
    with open(path) as fh:
        collection = json.load(fh)
    rows = []
    for feature in collection.get("features", []):
        geom = feature.get("geometry") or {}
        if geom.get("type") != "LineString":
            continue
        props = feature.get("properties") or {}
        row = {k: v for k, v in props.items() if k in keep}
        row["geometry"] = geom.get("coordinates")
        rows.append(row)
    return rows


def detect_ways_kind(source) -> str:
    """'raw' | 'processed' schema auto-detection for a ways GeoJSON —
    library form of the reference's collection parser
    (/root/reference/src/models/features.py:232-249): a collection whose
    first feature carries ``way_type`` is processed output, anything else
    is raw OSM input.  ``source`` is a path, a parsed FeatureCollection
    dict, or a list of row dicts."""
    if isinstance(source, str):
        with open(source) as fh:
            source = json.load(fh)
    if isinstance(source, dict):
        features = source.get("features") or []
        first = (features[0].get("properties") or {}) if features else {}
    elif isinstance(source, list):
        first = source[0] if source else {}
    else:
        raise TypeError(f"cannot detect ways kind of {type(source)!r}")
    return "processed" if "way_type" in first else "raw"


def read_ways_auto(path: str):
    """Load a ways GeoJSON of either kind: returns ``(kind, rows)`` where
    raw rows are pruned to the input schema and processed rows keep their
    proc_*/index columns untouched (for match/diff harnesses)."""
    with open(path) as fh:
        collection = json.load(fh)
    kind = detect_ways_kind(collection)
    if kind == "raw":
        return kind, read_ways_geojson(path)
    rows = []
    for feature in collection.get("features", []):
        geom = feature.get("geometry") or {}
        if geom.get("type") != "LineString":
            continue
        row = dict(feature.get("properties") or {})
        row["geometry"] = geom.get("coordinates")
        rows.append(row)
    return kind, rows


def scores_dataset_to_geojson(scores, path: str) -> int:
    """Scores Dataset (OUTPUT_COLUMNS + geometry_m binary) -> one GeoJSON
    file in EPSG:4326 (the reference's output step,
    cycling_quality_index.py:1802-1806).  Streams batches; only the final
    feature list is held (GeoJSON is a dev/QA sink — the scale sink is
    partitioned parquet/lance)."""
    import numpy as np

    from ..geo import proj
    from ..params import OUTPUT_COLUMNS

    rows = []
    for batch in scores.iter_batches(batch_size=4096, batch_format="pandas"):
        for rec in batch.to_dict("records"):
            geom_m = np.frombuffer(rec.pop("geometry_m"), dtype="<f8").reshape(-1, 2)
            rec["geometry"] = proj.unproject_coords(geom_m).tolist()
            rows.append(rec)
    clean = []
    for rec in rows:
        props = {}
        for c in OUTPUT_COLUMNS:
            v = rec.get(c)
            if isinstance(v, float) and v != v:
                v = None
            if hasattr(v, "item"):
                v = v.item()
            props[c] = v
        clean.append({**props, "geometry": rec["geometry"]})
    write_ways_geojson(path, clean, OUTPUT_COLUMNS)
    return len(clean)


def write_ways_geojson(path: str, rows: list[dict], columns: Iterable[str],
                       crs: str = "EPSG:4326") -> None:
    features = []
    for row in rows:
        features.append(
            {
                "type": "Feature",
                "properties": {c: row.get(c) for c in columns},
                "geometry": {"type": "LineString",
                             "coordinates": [list(map(float, pt)) for pt in row["geometry"]]},
            }
        )
    epsg = crs.split(":")[1]
    doc = {
        "type": "FeatureCollection",
        "crs": {"type": "name", "properties": {"name": f"urn:ogc:def:crs:EPSG::{epsg}"}},
        "features": features,
    }
    with open(path, "w") as fh:
        json.dump(doc, fh)
