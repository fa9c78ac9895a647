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

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..params import CQIParams, DEFAULT_PARAMS, INPUT_TAG_COLUMNS, OUTPUT_COLUMNS
from .. import offsets, scoring, sidepath
from .. import tags as T
from ..geo import lines, proj
from ..relational import bucketed_hash_join, grouped_map_buckets

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
    equivalent of the reference's retain+ensure_attributes steps).
    Columns no row carries become all-null arrays without scanning every
    row again (typical OSM rows set ~10 of ~190 tags)."""
    present: set = set()
    for r in rows:
        present.update(r.keys())
    n = len(rows)
    cols: dict = {}
    for col in INPUT_TAG_COLUMNS:
        if col in present:
            cols[col] = pa.array(
                [None if r.get(col) is None else str(r.get(col))
                 for r in rows], pa.string())
        else:
            cols[col] = pa.nulls(n, pa.string())
    cols["geometry"] = pa.array(
        [geom_to_bytes(r.get("geometry")) for r in rows], pa.binary()
    )
    cols["row_seq"] = pa.array(range(n), pa.int64())
    return pa.table(cols)


def dataset_from_rows(rows: list[dict], rows_per_block: int | None = None,
                      max_blocks: int = 64) -> rd.Dataset:
    """Split into multiple Arrow blocks up front so every downstream stage
    parallelizes (a single from_arrow block would serialize the pipeline).
    Block count is capped: ``rd.from_arrow`` costs ~30 ms per block on the
    driver (object-store put + metadata), so hundreds of tiny blocks cost
    more than the parallelism they buy."""
    table = ways_rows_to_arrow(rows)
    if rows_per_block is None:
        rows_per_block = max(256, -(-table.num_rows // max_blocks))
    if table.num_rows <= rows_per_block:
        return rd.from_arrow(table)
    chunks = [table.slice(i, rows_per_block)
              for i in range(0, table.num_rows, rows_per_block)]
    return rd.from_arrow(chunks)


def synth_ways_dataset(n_ways: int, num_blocks: int = 64,
                       extent=(13.40, 51.00, 13.60, 51.10)) -> rd.Dataset:
    """Distributed synthetic-ways source: each block generates its own row
    range of the deterministic grid (identical rows to
    ``synth.synth_ways_grid`` in the same order), so input construction
    parallelizes instead of serializing on the driver — the shape a real
    deployment gets for free from ``read_parquet``."""
    from ..images.synth import synth_way_rows_range

    num_blocks = max(1, min(num_blocks, -(-n_ways // 64)))
    per = -(-n_ways // num_blocks)

    def make(batch: pd.DataFrame) -> pa.Table:
        tables = []
        for b in batch["id"].to_numpy():
            start = int(b) * per
            end = min(start + per, n_ways)
            if end <= start:
                continue
            t = ways_rows_to_arrow(
                synth_way_rows_range(start, end, n_ways, extent=extent))
            t = t.set_column(t.schema.get_field_index("row_seq"), "row_seq",
                             pa.array(range(start, end), pa.int64()))
            tables.append(t)
        return pa.concat_tables(tables) if tables else \
            ways_rows_to_arrow([]).slice(0, 0)

    return rd.range(num_blocks, override_num_blocks=num_blocks) \
        .map_batches(make, batch_format="pandas", batch_size=None)


def _project_batch(batch: pa.Table) -> pa.Table:
    """Vectorized reprojection: one UTM transform over the concatenation of
    every geometry in the batch, then re-split.  Arrow in/out — appending a
    column to a 190-column Arrow table is zero-copy, where the pandas
    equivalent copies every column."""
    blobs = batch["geometry"].to_pylist()
    counts = np.fromiter((len(b) // 16 for b in blobs), dtype=np.int64,
                         count=len(blobs))
    if len(blobs):
        flat = np.frombuffer(b"".join(blobs), dtype="<f8").reshape(-1, 2)
        projected = proj.project_coords(flat)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        geoms = [np.ascontiguousarray(projected[offsets[i]:offsets[i + 1]]).tobytes()
                 for i in range(len(blobs))]
    else:
        geoms = []
    return batch.append_column("geometry_m", pa.array(geoms, pa.binary()))


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

_UNION_DTYPES = {
    "cell": "int64", "kind": "int64", "way_id": object, "layer": object,
    "px": "float64", "py": "float64", "point_order": "int64",
    "is_sidepath": object, "footway": object, "is_sidepath_of": object,
    "road_seq": "int64", "road_id": object, "road_highway": object,
    "road_name": object, "road_maxspeed": "float64",
    "ax": "float64", "ay": "float64", "bx": "float64", "by": "float64",
}


def _finalize_union(df: pd.DataFrame) -> pd.DataFrame:
    """Pin dtypes so point and segment blocks share one schema (numeric
    columns absent on one side become NaN / -1 sentinels, not object)."""
    for col, dt in _UNION_DTYPES.items():
        if col not in df.columns or df[col].isna().all():
            if dt == "int64":
                df[col] = np.int64(-1)
            elif dt == "float64":
                df[col] = np.nan
            else:
                df[col] = None
        if dt != object:
            df[col] = pd.to_numeric(df[col], errors="coerce").fillna(-1 if dt == "int64" else np.nan).astype(dt)
    return df[list(_UNION_DTYPES)]


def _cell_of(x: np.ndarray, y: np.ndarray, edge: float) -> np.ndarray:
    ix = np.floor(np.asarray(x) / edge).astype(np.int64)
    iy = np.floor(np.asarray(y) / edge).astype(np.int64)
    return (ix << np.int64(24)) ^ (iy & np.int64((1 << 24) - 1))


def _empty(cols: Iterable[str]) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})


_PT_INPUT = ["geometry_m", "id", "layer", "row_seq", "is_sidepath",
             "footway", "is_sidepath:of"]


def _make_point_rows(batch: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    """Explode ways into along-line sample points + the last vertex.  Only
    the geometry decode runs per way; the fan-out itself is one
    np.repeat / np.concatenate pass over the whole batch (the per-point
    append loop was the residual Python in this stage's profile)."""
    edge = _CELL_EDGE_FACTOR * p.sidepath_buffer_size
    cols = [batch[c].to_numpy() for c in _PT_INPUT]
    pts_per_way: list[np.ndarray] = []
    for blob in cols[0]:
        geom = geom_from_bytes(blob)
        pts = lines.points_along_line(geom, p.sidepath_buffer_distance)
        pts_per_way.append(np.concatenate([pts, geom[-1:][:]]))
    if not pts_per_way:
        return _finalize_union(_empty(_PT_COLS))
    counts = np.fromiter((len(q) for q in pts_per_way), dtype=np.int64,
                         count=len(pts_per_way))
    pts_all = np.concatenate(pts_per_way)
    rep = np.repeat(np.arange(len(counts)), counts)
    # per-way running sequence number 0..n_i-1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    seq = np.arange(len(pts_all), dtype=np.int64) - np.repeat(starts, counts)
    # global ordering: endpoint pass (the appended last vertex) comes after
    # all along-line passes (the reference merges the two point layers in
    # that order)
    phase = (seq == np.repeat(counts - 1, counts)).astype(np.int64)
    seq_no = cols[3].astype(np.int64)[rep]
    df = pd.DataFrame({
        "cell": _cell_of(pts_all[:, 0], pts_all[:, 1], edge),
        "way_id": cols[1][rep],
        "layer": cols[2][rep],
        "px": pts_all[:, 0].astype(np.float64),
        "py": pts_all[:, 1].astype(np.float64),
        "point_order": (phase << np.int64(48)) | (seq_no << np.int64(24)) | seq,
        "is_sidepath": cols[4][rep],
        "footway": cols[5][rep],
        "is_sidepath_of": cols[6][rep],
        "kind": np.zeros(len(pts_all), dtype=np.int64),
    })
    return _finalize_union(df)


_SEG_INPUT = ["geometry_m", "id", "highway", "name", "maxspeed", "layer",
              "row_seq"]


def _make_segment_rows(batch: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    """Explode road segments into every spatial cell their padded bbox
    touches.  Per way only the geometry decode runs in Python; the
    segment split and the (ix, iy) grid fan-out are batch-level numpy
    (divmod over a flat within-segment counter)."""
    edge = _CELL_EDGE_FACTOR * p.sidepath_buffer_size
    pad = p.sidepath_buffer_size
    cols = [batch[c].to_numpy() for c in _SEG_INPUT]
    seg_a, seg_b, seg_way = [], [], []
    for i, blob in enumerate(cols[0]):
        geom = geom_from_bytes(blob)
        if len(geom) < 2:
            continue
        seg_a.append(geom[:-1])
        seg_b.append(geom[1:])
        seg_way.append(np.full(len(geom) - 1, i, dtype=np.int64))
    if not seg_a:
        return _finalize_union(_empty(_SEG_COLS))
    A = np.concatenate(seg_a)          # (S, 2)
    B = np.concatenate(seg_b)
    way = np.concatenate(seg_way)      # way index per segment
    x0 = np.minimum(A[:, 0], B[:, 0])
    x1 = np.maximum(A[:, 0], B[:, 0])
    y0 = np.minimum(A[:, 1], B[:, 1])
    y1 = np.maximum(A[:, 1], B[:, 1])
    ix0 = np.floor((x0 - pad) / edge).astype(np.int64)
    ix1 = np.floor((x1 + pad) / edge).astype(np.int64)
    iy0 = np.floor((y0 - pad) / edge).astype(np.int64)
    iy1 = np.floor((y1 + pad) / edge).astype(np.int64)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny                   # cells per segment
    rep = np.repeat(np.arange(len(counts)), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(int(counts.sum()), dtype=np.int64) \
        - np.repeat(starts, counts)
    ix = ix0[rep] + within // ny[rep]
    iy = iy0[rep] + within % ny[rep]
    wrep = way[rep]
    ms = np.asarray([T.to_number(v) for v in cols[4]], dtype=np.float64)
    df = pd.DataFrame({
        "cell": (ix << np.int64(24)) ^ (iy & np.int64((1 << 24) - 1)),
        "road_seq": cols[6].astype(np.int64)[wrep],
        "road_id": cols[1][wrep],
        "road_highway": cols[2][wrep],
        "road_name": cols[3][wrep],
        "road_maxspeed": ms[wrep],
        "layer": cols[5][wrep],
        "ax": A[rep, 0].astype(np.float64),
        "ay": A[rep, 1].astype(np.float64),
        "bx": B[rep, 0].astype(np.float64),
        "by": B[rep, 1].astype(np.float64),
        "kind": np.ones(len(rep), dtype=np.int64),
    })
    return _finalize_union(df)


def _nn_arr(a: np.ndarray) -> np.ndarray:
    """Vectorized _nn: NaN -> None over an object array."""
    a = np.asarray(a, dtype=object)
    mask = pd.isna(a)
    if mask.any():
        a = a.copy()
        a[mask] = None
    return a


def _match_bucket(bucket: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    """Whole-bucket spatial match: the frame arrives sorted by cell; cells
    are processed as numpy slices, and pair rows are emitted as numpy
    index selections (no per-row Python appends — the round-1 emission
    loop dominated this stage's profile)."""
    if not len(bucket):
        return _empty(_PAIR_COLS)
    cols = {c: bucket[c].to_numpy() for c in _UNION_DTYPES}
    for c in ("way_id", "layer", "is_sidepath", "footway", "is_sidepath_of",
              "road_id", "road_highway", "road_name"):
        cols[c] = _nn_arr(cols[c])
    road_ms = cols["road_maxspeed"].astype(np.float64)
    cellv = cols["cell"].astype(np.int64)
    road_seq = cols["road_seq"].astype(np.int64)
    point_order = cols["point_order"].astype(np.int64)
    bounds = np.concatenate([[0], np.nonzero(np.diff(cellv))[0] + 1, [len(cellv)]])

    # collected as (point_global_idx, seg_global_idx_or_-1) pairs
    pt_sel: list[np.ndarray] = []
    sg_sel: list[np.ndarray] = []

    for s, e in zip(bounds[:-1], bounds[1:]):
        kind = cols["kind"][s:e]
        pt_idx = np.nonzero(kind == 0)[0] + s
        if not len(pt_idx):
            continue
        # every point emits its base row (road_seq = -1)
        pt_sel.append(pt_idx)
        sg_sel.append(np.full(len(pt_idx), -1, dtype=np.int64))
        sg_idx = np.nonzero(kind == 1)[0] + s
        if not len(sg_idx):
            continue
        sg_idx = sg_idx[np.argsort(road_seq[sg_idx], kind="stable")]
        P = np.stack([cols["px"][pt_idx], cols["py"][pt_idx]], 1).astype(np.float64)
        A = np.stack([cols["ax"][sg_idx], cols["ay"][sg_idx]], 1).astype(np.float64)
        B = np.stack([cols["bx"][sg_idx], cols["by"][sg_idx]], 1).astype(np.float64)
        near = lines.points_to_segments_distance(P, A, B) <= p.sidepath_buffer_size
        layer_eq = (cols["layer"][pt_idx][:, None]
                    == cols["layer"][sg_idx][None, :])
        pi, sj = np.nonzero(near & layer_eq)
        if not len(pi):
            continue
        # dedup to the first segment per (point, road_seq): nonzero order is
        # (pi asc, sj asc) and segments are road_seq-sorted
        key = (pi.astype(np.int64) << 32) | (road_seq[sg_idx[sj]]
                                             & np.int64(0xFFFFFFFF))
        _, first = np.unique(key, return_index=True)
        pt_sel.append(pt_idx[pi[first]])
        sg_sel.append(sg_idx[sj[first]])

    if not pt_sel:
        return _empty(_PAIR_COLS)
    pts = np.concatenate(pt_sel)
    sgs = np.concatenate(sg_sel)
    has_sg = sgs >= 0
    sg_safe = np.where(has_sg, sgs, 0)

    def seg_col(name, none_val=None):
        vals = cols[name][sg_safe].copy()
        vals[~has_sg] = none_val
        return vals

    ms = road_ms[sg_safe]
    ms_obj = np.empty(len(sgs), dtype=object)
    ok = has_sg & ~np.isnan(ms)
    ms_obj[ok] = ms[ok]
    ms_obj[~ok] = None
    return pd.DataFrame({
        "way_id": cols["way_id"][pts],
        "point_order": point_order[pts],
        "road_seq": np.where(has_sg, road_seq[sg_safe], -1),
        "road_id": seg_col("road_id"),
        "road_highway": seg_col("road_highway"),
        "road_name": seg_col("road_name"),
        "road_maxspeed": ms_obj,
        "is_sidepath": cols["is_sidepath"][pts],
        "footway": cols["footway"][pts],
        "is_sidepath_of": cols["is_sidepath_of"][pts],
    })


def _nn(v):
    """None-normalize: pandas object blocks may carry NaN for missing."""
    if v is None or (isinstance(v, float) and v != v):
        return None
    return v


def _fold_bucket(bucket: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    """Whole-bucket counter fold: frame sorted by way_id; within each way,
    replay the reference's sequential counting in (point_order, road_seq)
    order."""
    if not len(bucket):
        return _empty(_FOLD_COLS)
    wid = bucket["way_id"].to_numpy()
    po = bucket["point_order"].to_numpy().astype(np.int64)
    rs = bucket["road_seq"].to_numpy().astype(np.int64)
    cols = {c: bucket[c].to_numpy()
            for c in ("road_id", "road_highway", "road_name", "road_maxspeed",
                      "is_sidepath", "footway", "is_sidepath_of")}
    # ways are contiguous (bucket pre-sorted by way_id)
    way_bounds = np.concatenate(
        [[0], np.nonzero(wid[1:] != wid[:-1])[0] + 1, [len(wid)]])
    out = {c: [] for c in _FOLD_COLS}
    for s, e in zip(way_bounds[:-1], way_bounds[1:]):
        order = s + np.lexsort((rs[s:e], po[s:e]))
        way_tags = {
            "is_sidepath": _nn(cols["is_sidepath"][order[0]]),
            "footway": _nn(cols["footway"][order[0]]),
            "is_sidepath:of": _nn(cols["is_sidepath_of"][order[0]]),
        }
        entry = {"checks": 0, "id": {}, "highway": {}, "name": {}, "maxspeed": {}}
        po_sorted = po[order]
        starts = np.concatenate(
            [[0], np.nonzero(np.diff(po_sorted))[0] + 1, [len(order)]])
        for ps, pe in zip(starts[:-1], starts[1:]):
            near = []
            for k in order[ps:pe]:
                if rs[k] < 0:
                    continue
                ms = _nn(cols["road_maxspeed"][k])
                near.append((_nn(cols["road_id"][k]),
                             _nn(cols["road_highway"][k]),
                             _nn(cols["road_name"][k]),
                             None if ms is None else float(ms)))
            sidepath.accumulate_point(entry, near)
        decided = sidepath.fold_entry(way_tags, entry, p)
        out["id"].append(wid[s])
        out["sp_sidepath"].append(decided.get("proc_sidepath"))
        out["sp_highway"].append(decided.get("proc_highway"))
        out["sp_maxspeed"].append(decided.get("proc_maxspeed"))
        out["sp_name"].append(decided.get("name"))
    return pd.DataFrame(out)


def _sparse_records(batch: pd.DataFrame) -> list[dict]:
    """Batch -> row dicts holding ONLY non-null cells.  The rule kernels
    read tags with ``row.get(key)`` (missing == None), and a typical OSM row
    has ~10 of ~190 tag columns set, so sparse dicts cut per-row dict
    construction ~20x versus to_dict('records')."""
    n = len(batch)
    records = [dict() for _ in range(n)]
    for col in batch.columns:
        arr = batch[col].to_numpy()
        if arr.dtype.kind == "f":
            idx = np.nonzero(~np.isnan(arr))[0]
            for i in idx:
                records[i][col] = float(arr[i])
            continue
        if arr.dtype.kind in ("i", "u", "b"):
            for i in range(n):
                records[i][col] = arr[i].item()
            continue
        for i in range(n):
            v = arr[i]
            if v is None or v is pd.NA or (isinstance(v, float) and v != v):
                continue
            records[i][col] = v
    return records


def _apply_sidepath(batch: pd.DataFrame) -> pd.DataFrame:
    """Vectorized sidepath fold-back: roads take their own
    highway/effective-maxspeed (sidepath.road_proc_attrs semantics); path
    rows take the folded sp_* attributes (fold_entry only sets
    proc_highway for 'yes' rows)."""
    from ..vector import _col, _isin, _truthy

    n = len(batch)
    c = lambda name: _col(batch, name, n)
    hw = c("highway")
    is_road = ~_isin(hw, tuple(sidepath.NON_ROAD_HIGHWAYS)) | (hw == "track")

    ms_raw = c("maxspeed")
    lut = {v: T.to_number(v) for v in set(ms_raw.tolist())}
    eff = np.array([np.nan if lut[v] is None else lut[v] for v in ms_raw],
                   dtype=np.float64)
    m = (ms_raw == "walk") | (~_truthy(ms_raw) & (hw == "living_street"))
    eff[m] = 10
    eff[ms_raw == "none"] = 299

    proc_highway = np.full(n, None, dtype=object)
    proc_highway[is_road] = hw[is_road]
    proc_maxspeed = np.full(n, np.nan)
    proc_maxspeed[is_road] = eff[is_road]
    proc_sidepath = np.full(n, None, dtype=object)

    sp = c("sp_sidepath")
    has_sp = ~is_road & (sp != None)  # noqa: E711
    proc_sidepath[has_sp] = sp[has_sp]
    m = has_sp & (sp == "yes")
    proc_highway[m] = c("sp_highway")[m]
    spms = pd.to_numeric(pd.Series(c("sp_maxspeed")), errors="coerce") \
        .to_numpy(dtype=np.float64)
    m = has_sp & ~np.isnan(spms)
    proc_maxspeed[m] = spms[m]
    spname = c("sp_name")
    name = c("name").copy()
    m = has_sp & (spname != None)  # noqa: E711
    name[m] = spname[m]

    out = batch.drop(columns=[col for col in
                              ("sp_sidepath", "sp_highway", "sp_maxspeed",
                               "sp_name") if col in batch.columns]).copy()
    out["name"] = name
    out["proc_highway"] = proc_highway
    out["proc_maxspeed"] = proc_maxspeed
    out["proc_sidepath"] = proc_sidepath
    return out


# ---------------------------------------------------------------------------
# fan-out + score
# ---------------------------------------------------------------------------

def _fanout_batch(batch: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    out = []
    for r in _sparse_records(batch):
        r["geometry_m"] = geom_from_bytes(r["geometry_m"])
        for row in offsets.fan_out(r, p):
            row = dict(row)
            row["geometry_m"] = geom_to_bytes(row["geometry_m"])
            out.append(row)
    if not out:
        return batch.head(0)
    df = pd.DataFrame(out)
    return df


def _score_batch(batch: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    """Fully vectorized scoring: every derivation stage runs as mask rules
    over the whole batch (cqi_ray.vector + cqi_ray.vector_score), each
    differentially tested equal to the row-wise conformance kernels in
    cqi_ray.scoring (tests/test_vector.py, tests/test_vector_score.py) and
    proven by the 164-row golden match."""
    from ..vector import (classify_way_type_batch, derive_oneway_batch,
                          derive_separation_buffer_batch,
                          derive_surface_smoothness_batch,
                          derive_traffic_modes_batch, _col)
    from ..vector_score import derive_width_batch, finalize_batch

    cols = list(OUTPUT_COLUMNS) + ["geometry_m"]
    way_types = classify_way_type_batch(batch, p)
    keep = way_types != scoring.DROP
    if not keep.all():
        batch = batch.loc[keep].reset_index(drop=True)
        way_types = way_types[keep]
    n = len(batch)
    if not n:
        return _empty(cols)

    oneways = derive_oneway_batch(batch, way_types, p)
    surf, surf_miss, smooth, smooth_miss = \
        derive_surface_smoothness_batch(batch, way_types, p)
    ml, mr = derive_traffic_modes_batch(batch, way_types, p)
    sl, sr, bl, br = derive_separation_buffer_batch(batch, ml, mr, p)
    width, m_wl, m_w1, m_w2, m_pk = derive_width_batch(
        batch, way_types, oneways, p)
    out = finalize_batch(batch, p, way_types, oneways, width,
                         (m_wl, m_w1, m_w2, m_pk), surf, surf_miss,
                         smooth, smooth_miss, ml, mr, bl, br)

    out["proc_separation_left"] = sl
    out["proc_separation_right"] = sr
    out["proc_buffer_left"] = bl
    out["proc_buffer_right"] = br
    for name in ("id", "name", "side", "proc_sidepath", "proc_highway",
                 "geometry_m"):
        out[name] = _col(batch, name, n)
    from ..vector import _num_col

    out["offset"] = _num_col(batch, "offset", n)
    out["proc_maxspeed"] = _num_col(batch, "proc_maxspeed", n)

    df = pd.DataFrame(out)[cols]
    for c in ("index", "index_10", "stress_level", "base_index",
              "filter_usable", "proc_maxspeed"):
        df[c] = pd.array(pd.to_numeric(df[c], errors="coerce").round(),
                         dtype="Int64")
    for c in ("offset", "proc_width", "proc_buffer_left", "proc_buffer_right",
              "fac_width", "fac_surface", "fac_highway", "fac_maxspeed",
              "fac_1", "fac_2", "fac_3", "fac_4", "data_incompleteness"):
        df[c] = pd.to_numeric(df[c], errors="coerce").astype("float64")
    return df


# ---------------------------------------------------------------------------
# assembled pipeline
# ---------------------------------------------------------------------------

def score_ways_dataset(ds: rd.Dataset, p: CQIParams = DEFAULT_PARAMS,
                       num_buckets: int = 8,
                       sidepath_join: str = "broadcast") -> rd.Dataset:
    """ways Dataset (full input schema + geometry + row_seq) -> scores
    Dataset (OUTPUT_COLUMNS + geometry_m)."""
    # project ONCE and pin: three consumers (join left side, paths branch,
    # roads branch) would otherwise re-execute the projection lineage each
    ds = ds.map_batches(_project_batch, batch_format="pyarrow",
                        batch_size=None).materialize()

    path_vals = pa.array(list(sidepath.PATH_HIGHWAYS), pa.string())
    nonroad_vals = pa.array(list(sidepath.NON_ROAD_HIGHWAYS), pa.string())

    def _is_path(t: pa.Table) -> pa.Table:
        return t.filter(pc.fill_null(pc.is_in(t["highway"], value_set=path_vals), False))

    def _is_road(t: pa.Table) -> pa.Table:
        # NULL highway counts as a road (reference expression semantics)
        return t.filter(pc.invert(pc.fill_null(
            pc.is_in(t["highway"], value_set=nonroad_vals), False)))

    paths = ds.map_batches(_is_path, batch_format="pyarrow", batch_size=None) \
              .select_columns(list(_PT_INPUT))
    roads = ds.map_batches(_is_road, batch_format="pyarrow", batch_size=None) \
              .select_columns(list(_SEG_INPUT))

    points = paths.map_batches(lambda b: _make_point_rows(b, p),
                               batch_format="pandas", batch_size=None)
    segments = roads.map_batches(lambda b: _make_segment_rows(b, p),
                                 batch_format="pandas", batch_size=None)
    pairs = grouped_map_buckets(points.union(segments), ["cell"],
                                lambda g: _match_bucket(g, p),
                                num_buckets=64, whole_bucket=True)
    folded = grouped_map_buckets(pairs, ["way_id"],
                                 lambda g: _fold_bucket(g, p),
                                 num_buckets=64, whole_bucket=True)

    if sidepath_join == "broadcast":
        # the fold side is one tiny row per *path* way (5 narrow fields) —
        # broadcast it and look up per batch instead of shuffling the
        # ~190-column ways table through a hash join.  Use
        # sidepath_join="bucketed" when the path count itself is huge.
        import ray as _ray

        fold_ref = _ray.put(folded.to_pandas().set_index("id"))

        def _attach_fold(batch: pd.DataFrame) -> pd.DataFrame:
            fold = _ray.get(fold_ref)
            sub = fold.reindex(batch["id"].to_numpy())
            for col in _FOLD_COLS[1:]:
                batch[col] = sub[col].to_numpy()
            return batch

        joined = ds.map_batches(_attach_fold, batch_format="pandas",
                                batch_size=None)
    else:
        joined = bucketed_hash_join(ds, folded, on="id", right_cols=_FOLD_COLS,
                                    num_buckets=num_buckets, how="left")
    withproc = joined.map_batches(_apply_sidepath, batch_format="pandas", batch_size=None)
    fanned = withproc.map_batches(lambda b: _fanout_batch(b, p),
                                  batch_format="pandas", batch_size=None)
    return fanned.map_batches(lambda b: _score_batch(b, p),
                              batch_format="pandas", batch_size=None)
