"""Distributed CQI scoring pipeline on Ray Data.

Stage map (SURVEY.md §3.1 -> Ray Data):

    ways(ds) -> normalize/project (map_batches)
             -> sidepath spatial join:
                  paths  --flat_map--> check points   (1 row / sample point)
                  roads  --flat_map--> segment x cell (1 row / covered cell)
                  union  --groupby(cell)--> distance match  [SHUFFLE 1]
                  pairs  --groupby(way_id)--> counter fold  [SHUFFLE 2]
                  ways ⟕ fold  (bucketed hash join on id)   [SHUFFLE 3]
             -> offset fan-out (flat_map, 1:1..5)
             -> classify + derive + score (map_batches, stateless)
             -> select output columns

The co-partitioning key of the spatial match is a metric grid cell of edge
``2 x sidepath_buffer_size`` (44 m): a point only needs its own cell while
segments are replicated into every cell their 22 m-padded bbox covers, so
each (point, road) pair meets in exactly one group — the reference's
O(points x roads) select-by-location rescan (cycling_quality_index.py:
1519-1542) becomes O(points + segments) per cell.  Skewed cells can be
split by salting the segment replication; at corpus scale it is unneeded.

The per-way counter fold sorts by (point_order, road_order) so the
reference's sequential, insertion-ordered counting semantics are exactly
reproduced no matter how blocks were scheduled.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..params import CQIParams, DEFAULT_PARAMS, INPUT_TAG_COLUMNS, OUTPUT_COLUMNS
from .. import offsets, scoring, sidepath
from .. import tags as T
from ..geo import lines, proj
from ..relational import bucketed_hash_join

_CELL_EDGE_FACTOR = 2.0  # cell edge = factor * buffer radius


# ---------------------------------------------------------------------------
# ingestion
# ---------------------------------------------------------------------------

def geom_to_bytes(coords) -> bytes:
    """Polyline -> packed little-endian float64 pairs.  Nested list columns
    do not survive pandas<->Arrow round trips inside map_batches, so
    geometry travels as a binary column (zero-copy in Arrow, opaque to
    pandas)."""
    return np.ascontiguousarray(np.asarray(coords, dtype="<f8")).tobytes()


def geom_from_bytes(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, dtype="<f8").reshape(-1, 2)


def ways_rows_to_arrow(rows: list[dict]) -> pa.Table:
    """Row dicts -> one Arrow table with the full fixed input schema
    (every tag column present as nullable string — the distributed
    equivalent of the reference's retain+ensure_attributes steps)."""
    cols: dict = {}
    for col in INPUT_TAG_COLUMNS:
        cols[col] = pa.array(
            [None if r.get(col) is None else str(r.get(col)) for r in rows],
            pa.string(),
        )
    cols["geometry"] = pa.array(
        [geom_to_bytes(r.get("geometry")) for r in rows], pa.binary()
    )
    cols["row_seq"] = pa.array(range(len(rows)), pa.int64())
    return pa.table(cols)


def dataset_from_rows(rows: list[dict]) -> rd.Dataset:
    return rd.from_arrow(ways_rows_to_arrow(rows))


def _project_batch(batch: pd.DataFrame) -> pd.DataFrame:
    geoms = []
    for g in batch["geometry"]:
        arr = geom_from_bytes(g)
        geoms.append(geom_to_bytes(proj.project_coords(arr)))
    batch = batch.copy()
    batch["geometry_m"] = geoms
    return batch


# ---------------------------------------------------------------------------
# sidepath spatial join
# ---------------------------------------------------------------------------

_PT_COLS = ["cell", "kind", "way_id", "layer", "px", "py", "point_order",
            "is_sidepath", "footway", "is_sidepath_of"]
_SEG_COLS = ["cell", "kind", "road_seq", "road_id", "road_highway",
             "road_name", "road_maxspeed", "layer", "ax", "ay", "bx", "by"]
_UNION_COLS = list(dict.fromkeys(_PT_COLS + _SEG_COLS))

_PAIR_COLS = ["way_id", "point_order", "road_seq", "road_id", "road_highway",
              "road_name", "road_maxspeed", "is_sidepath", "footway",
              "is_sidepath_of"]

_FOLD_COLS = ("id", "sp_sidepath", "sp_highway", "sp_maxspeed", "sp_name")


def _cell_of(x: np.ndarray, y: np.ndarray, edge: float) -> np.ndarray:
    ix = np.floor(np.asarray(x) / edge).astype(np.int64)
    iy = np.floor(np.asarray(y) / edge).astype(np.int64)
    return (ix << np.int64(24)) ^ (iy & np.int64((1 << 24) - 1))


def _empty(cols: Iterable[str]) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})


def _make_point_rows(batch: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    edge = _CELL_EDGE_FACTOR * p.sidepath_buffer_size
    out = {c: [] for c in _PT_COLS}
    for _, row in batch.iterrows():
        geom = geom_from_bytes(row["geometry_m"])
        pts = list(lines.points_along_line(geom, p.sidepath_buffer_distance))
        pts.append(lines.last_vertex(geom))
        phases = [0] * (len(pts) - 1) + [1]
        for seq, (pt, phase) in enumerate(zip(pts, phases)):
            out["cell"].append(int(_cell_of(pt[0], pt[1], edge)))
            out["kind"].append(0)
            out["way_id"].append(row["id"])
            out["layer"].append(row["layer"])
            out["px"].append(float(pt[0]))
            out["py"].append(float(pt[1]))
            # global ordering: endpoint pass comes after all along-line
            # passes (reference merges the two point layers in that order)
            out["point_order"].append(
                (phase << 48) | (int(row["row_seq"]) << 24) | seq
            )
            out["is_sidepath"].append(row["is_sidepath"])
            out["footway"].append(row["footway"])
            out["is_sidepath_of"].append(row["is_sidepath:of"])
    df = pd.DataFrame(out) if out["cell"] else _empty(_PT_COLS)
    for c in _SEG_COLS:
        if c not in df.columns:
            df[c] = None
    return df[_UNION_COLS]


def _make_segment_rows(batch: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    edge = _CELL_EDGE_FACTOR * p.sidepath_buffer_size
    pad = p.sidepath_buffer_size
    out = {c: [] for c in _SEG_COLS}
    for _, row in batch.iterrows():
        geom = geom_from_bytes(row["geometry_m"])
        ms = T.to_number(row["maxspeed"])
        for si in range(len(geom) - 1):
            a, b = geom[si], geom[si + 1]
            x0, x1 = sorted((a[0], b[0]))
            y0, y1 = sorted((a[1], b[1]))
            ix0 = int(np.floor((x0 - pad) / edge))
            ix1 = int(np.floor((x1 + pad) / edge))
            iy0 = int(np.floor((y0 - pad) / edge))
            iy1 = int(np.floor((y1 + pad) / edge))
            for ix in range(ix0, ix1 + 1):
                for iy in range(iy0, iy1 + 1):
                    cell = (ix << 24) ^ (iy & ((1 << 24) - 1))
                    out["cell"].append(cell)
                    out["kind"].append(1)
                    out["road_seq"].append(int(row["row_seq"]))
                    out["road_id"].append(row["id"])
                    out["road_highway"].append(row["highway"])
                    out["road_name"].append(row["name"])
                    out["road_maxspeed"].append(ms)
                    out["layer"].append(row["layer"])
                    out["ax"].append(float(a[0]))
                    out["ay"].append(float(a[1]))
                    out["bx"].append(float(b[0]))
                    out["by"].append(float(b[1]))
    df = pd.DataFrame(out) if out["cell"] else _empty(_SEG_COLS)
    for c in _PT_COLS:
        if c not in df.columns:
            df[c] = None
    return df[_UNION_COLS]


def _match_cell(group: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    pts = group[group["kind"] == 0]
    segs = group[group["kind"] == 1]
    rows = {c: [] for c in _PAIR_COLS}

    def emit(pt, road_seq, rid, rhw, rname, rms):
        rows["way_id"].append(pt["way_id"])
        rows["point_order"].append(int(pt["point_order"]))
        rows["road_seq"].append(road_seq)
        rows["road_id"].append(rid)
        rows["road_highway"].append(rhw)
        rows["road_name"].append(rname)
        rows["road_maxspeed"].append(rms)
        rows["is_sidepath"].append(pt["is_sidepath"])
        rows["footway"].append(pt["footway"])
        rows["is_sidepath_of"].append(pt["is_sidepath_of"])

    if len(pts):
        if len(segs):
            P = pts[["px", "py"]].to_numpy(dtype=np.float64)
            A = segs[["ax", "ay"]].to_numpy(dtype=np.float64)
            B = segs[["bx", "by"]].to_numpy(dtype=np.float64)
            D = lines.points_to_segments_distance(P, A, B)
            near = D <= p.sidepath_buffer_size
        for pi, (_, pt) in enumerate(pts.iterrows()):
            emit(pt, -1, None, None, None, None)  # presence row: counts a check
            if not len(segs):
                continue
            hit = segs[near[pi]]
            # same-layer filter + per-buffer road de-dup in road order
            seen = set()
            for _, sg in hit.sort_values("road_seq").iterrows():
                if pt["layer"] != sg["layer"] and not (
                    pd.isna(pt["layer"]) and pd.isna(sg["layer"])
                ):
                    continue
                if sg["road_seq"] in seen:
                    continue
                seen.add(sg["road_seq"])
                emit(pt, int(sg["road_seq"]), sg["road_id"], sg["road_highway"],
                     sg["road_name"], sg["road_maxspeed"])
    return pd.DataFrame(rows) if rows["way_id"] else _empty(_PAIR_COLS)


def _fold_way(group: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    g = group.sort_values(["point_order", "road_seq"], kind="mergesort")
    first = g.iloc[0]
    way_tags = {
        "is_sidepath": None if pd.isna(first["is_sidepath"]) else first["is_sidepath"],
        "footway": None if pd.isna(first["footway"]) else first["footway"],
        "is_sidepath:of": None if pd.isna(first["is_sidepath_of"]) else first["is_sidepath_of"],
    }
    entry = {"checks": 0, "id": {}, "highway": {}, "name": {}, "maxspeed": {}}
    for _, sub in g.groupby("point_order", sort=True):
        near = []
        for _, r in sub.iterrows():
            if r["road_seq"] < 0:
                continue
            near.append((
                None if pd.isna(r["road_id"]) else r["road_id"],
                None if pd.isna(r["road_highway"]) else r["road_highway"],
                None if pd.isna(r["road_name"]) else r["road_name"],
                None if pd.isna(r["road_maxspeed"]) else float(r["road_maxspeed"]),
            ))
        sidepath.accumulate_point(entry, near)
    decided = sidepath.fold_entry(way_tags, entry, p)
    return pd.DataFrame(
        {
            "id": [first["way_id"]],
            "sp_sidepath": [decided.get("proc_sidepath")],
            "sp_highway": [decided.get("proc_highway")],
            "sp_maxspeed": [decided.get("proc_maxspeed")],
            "sp_name": [decided.get("name")],
        }
    )


def _apply_sidepath(batch: pd.DataFrame) -> pd.DataFrame:
    records = batch.to_dict("records")
    for r in records:
        for k in ("sp_sidepath", "sp_highway", "sp_maxspeed", "sp_name"):
            if k in r and (r[k] is None or (isinstance(r[k], float) and pd.isna(r[k]))):
                r[k] = None
        hw = r.get("highway")
        if hw not in sidepath.NON_ROAD_HIGHWAYS or hw == "track":
            r.update(sidepath.road_proc_attrs(r))
        elif "sp_sidepath" in r and r["sp_sidepath"] is not None:
            r["proc_sidepath"] = r["sp_sidepath"]
            if r["sp_highway"] is not None or r["sp_sidepath"] == "yes":
                # fold_entry only sets proc_highway for 'yes' rows
                if r["sp_sidepath"] == "yes":
                    r["proc_highway"] = r["sp_highway"]
            if r["sp_maxspeed"] is not None:
                r["proc_maxspeed"] = float(r["sp_maxspeed"])
            if r["sp_name"] is not None:
                r["name"] = r["sp_name"]
        for k in ("sp_sidepath", "sp_highway", "sp_maxspeed", "sp_name"):
            r.pop(k, None)
        r.setdefault("proc_sidepath", None)
        r.setdefault("proc_highway", None)
        r.setdefault("proc_maxspeed", None)
    return pd.DataFrame(records)


# ---------------------------------------------------------------------------
# fan-out + score
# ---------------------------------------------------------------------------

def _fanout_batch(batch: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    out = []
    for r in batch.to_dict("records"):
        r = {k: (None if isinstance(v, float) and pd.isna(v) else v)
             for k, v in r.items()}
        r.setdefault("side", None)
        r.setdefault("type", None)
        r["geometry_m"] = geom_from_bytes(r["geometry_m"])
        for row in offsets.fan_out(r, p):
            row = dict(row)
            row["geometry_m"] = geom_to_bytes(row["geometry_m"])
            out.append(row)
    return pd.DataFrame(out) if out else batch.head(0)


def _score_batch(batch: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    out = []
    for r in batch.to_dict("records"):
        r = {k: (None if isinstance(v, float) and pd.isna(v) else v)
             for k, v in r.items()}
        way_type = scoring.classify_way_type(r, p)
        if way_type == scoring.DROP:
            continue
        r["way_type"] = way_type
        scoring.score_row(r, p)
        rec = {c: r.get(c) for c in OUTPUT_COLUMNS}
        if rec.get("proc_maxspeed") is not None:
            rec["proc_maxspeed"] = int(rec["proc_maxspeed"])
        rec["geometry_m"] = r.get("geometry_m")
        out.append(rec)
    cols = list(OUTPUT_COLUMNS) + ["geometry_m"]
    if not out:
        return _empty(cols)
    return pd.DataFrame(out)[cols]


# ---------------------------------------------------------------------------
# assembled pipeline
# ---------------------------------------------------------------------------

def score_ways_dataset(ds: rd.Dataset, p: CQIParams = DEFAULT_PARAMS,
                       num_buckets: int = 8) -> rd.Dataset:
    """ways Dataset (full input schema + geometry + row_seq) -> scores
    Dataset (OUTPUT_COLUMNS + geometry_m)."""
    ds = ds.map_batches(_project_batch, batch_format="pandas")

    path_set = set(sidepath.PATH_HIGHWAYS)
    paths = ds.filter(lambda r: r["highway"] in path_set)
    roads = ds.filter(
        lambda r: r["highway"] not in set(sidepath.NON_ROAD_HIGHWAYS))

    points = paths.map_batches(lambda b: _make_point_rows(b, p),
                               batch_format="pandas")
    segments = roads.map_batches(lambda b: _make_segment_rows(b, p),
                                 batch_format="pandas")
    pairs = points.union(segments).groupby("cell").map_groups(
        lambda g: _match_cell(g, p), batch_format="pandas")
    folded = pairs.groupby("way_id").map_groups(
        lambda g: _fold_way(g, p), batch_format="pandas")

    joined = bucketed_hash_join(ds, folded, on="id", right_cols=_FOLD_COLS,
                                num_buckets=num_buckets, how="left")
    withproc = joined.map_batches(_apply_sidepath, batch_format="pandas")
    fanned = withproc.map_batches(lambda b: _fanout_batch(b, p),
                                  batch_format="pandas")
    return fanned.map_batches(lambda b: _score_batch(b, p),
                              batch_format="pandas")
