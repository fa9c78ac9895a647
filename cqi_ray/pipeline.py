"""End-to-end CQI scoring over plain row lists (single-process reference
path, used by the conformance tests and by the distributed kernels in
cqi_ray.pipelines which run the same stages inside Ray Data operators).

Stage order mirrors the reference main() (cycling_quality_index.py:
1444-1803): read -> reproject -> retain/widen schema -> sidepath check ->
offset fan-out -> way-type classification (with drops) -> attribute
derivation + index + LTS -> column projection.
"""

from __future__ import annotations

import numpy as np

from .params import CQIParams, DEFAULT_PARAMS, INPUT_TAG_COLUMNS, OUTPUT_COLUMNS
from . import offsets, scoring, sidepath
from .geo import proj


def normalize_rows(rows: list[dict]) -> list[dict]:
    """Ensure the full input schema (missing tags -> None) and project
    geometry to the metric CRS."""
    for row in rows:
        for col in INPUT_TAG_COLUMNS:
            row.setdefault(col, None)
        row.setdefault("side", None)
        row.setdefault("type", None)
        row.setdefault("proc_sidepath", None)
        row.setdefault("proc_highway", None)
        row.setdefault("proc_maxspeed", None)
        if row.get("geometry") is not None and "geometry_m" not in row:
            row["geometry_m"] = proj.project_coords(row["geometry"])
    return rows


def score_ways(rows: list[dict], p: CQIParams = DEFAULT_PARAMS) -> list[dict]:
    rows = normalize_rows(rows)
    sidepath.run_sidepath_stage(rows, p)

    fanned: list[dict] = []
    for row in rows:
        fanned.extend(offsets.fan_out(row, p))

    kept: list[dict] = []
    for row in fanned:
        way_type = scoring.classify_way_type(row, p)
        if way_type == scoring.DROP:
            continue
        row["way_type"] = way_type
        kept.append(row)

    for row in kept:
        scoring.score_row(row, p)
    return kept


def select_output(rows: list[dict]) -> list[dict]:
    out = []
    for row in rows:
        rec = {c: row.get(c) for c in OUTPUT_COLUMNS}
        if row.get("proc_maxspeed") is not None:
            rec["proc_maxspeed"] = int(row["proc_maxspeed"])
        rec["geometry_m"] = row.get("geometry_m")
        rec["geometry"] = row.get("geometry")
        out.append(rec)
    return out
