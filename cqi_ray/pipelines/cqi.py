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


def dataset_from_rows(rows: list[dict], rows_per_block: int = 256) -> rd.Dataset:
    """Split into multiple Arrow blocks up front so every downstream stage
    parallelizes (a single from_arrow block would serialize the pipeline)."""
    table = ways_rows_to_arrow(rows)
    if table.num_rows <= rows_per_block:
        return rd.from_arrow(table)
    chunks = [table.slice(i, rows_per_block)
              for i in range(0, table.num_rows, rows_per_block)]
    return rd.from_arrow(chunks)


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
    edge = _CELL_EDGE_FACTOR * p.sidepath_buffer_size
    out = {c: [] for c in _PT_COLS}
    cols = [batch[c].to_numpy() for c in _PT_INPUT]
    for blob, wid, layer, seq_no, isp, fw, ispo in zip(*cols):
        geom = geom_from_bytes(blob)
        pts = lines.points_along_line(geom, p.sidepath_buffer_distance)
        pts = np.concatenate([pts, geom[-1:][:]])
        n = len(pts)
        cell_ids = _cell_of(pts[:, 0], pts[:, 1], edge)
        for seq in range(n):
            phase = 1 if seq == n - 1 else 0
            out["cell"].append(int(cell_ids[seq]))
            out["way_id"].append(wid)
            out["layer"].append(layer)
            out["px"].append(float(pts[seq, 0]))
            out["py"].append(float(pts[seq, 1]))
            # global ordering: endpoint pass comes after all along-line
            # passes (reference merges the two point layers in that order)
            out["point_order"].append((phase << 48) | (int(seq_no) << 24) | seq)
            out["is_sidepath"].append(isp)
            out["footway"].append(fw)
            out["is_sidepath_of"].append(ispo)
    out["kind"] = np.zeros(len(out["cell"]), dtype=np.int64)
    df = pd.DataFrame(out) if out["cell"] else _empty(_PT_COLS)
    return _finalize_union(df)


_SEG_INPUT = ["geometry_m", "id", "highway", "name", "maxspeed", "layer",
              "row_seq"]


def _make_segment_rows(batch: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    edge = _CELL_EDGE_FACTOR * p.sidepath_buffer_size
    pad = p.sidepath_buffer_size
    out = {c: [] for c in _SEG_COLS}
    cols = [batch[c].to_numpy() for c in _SEG_INPUT]
    for blob, rid, rhw, rname, rms_raw, layer, seq_no in zip(*cols):
        geom = geom_from_bytes(blob)
        ms = T.to_number(rms_raw)
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
                    out["road_seq"].append(int(seq_no))
                    out["road_id"].append(rid)
                    out["road_highway"].append(rhw)
                    out["road_name"].append(rname)
                    out["road_maxspeed"].append(ms)
                    out["layer"].append(layer)
                    out["ax"].append(float(a[0]))
                    out["ay"].append(float(a[1]))
                    out["bx"].append(float(b[0]))
                    out["by"].append(float(b[1]))
    out["kind"] = np.ones(len(out["cell"]), dtype=np.int64)
    df = pd.DataFrame(out) if out["cell"] else _empty(_SEG_COLS)
    return _finalize_union(df)


def _nn(v):
    """None-normalize: pandas object blocks may carry NaN for missing."""
    if v is None or (isinstance(v, float) and v != v):
        return None
    return v


def _match_bucket(bucket: pd.DataFrame, p: CQIParams) -> pd.DataFrame:
    """Whole-bucket spatial match: the frame arrives sorted by cell; cells
    are processed as numpy slices (no per-group pandas frames)."""
    if not len(bucket):
        return _empty(_PAIR_COLS)
    cols = {c: bucket[c].to_numpy() for c in _UNION_DTYPES}
    cellv = cols["cell"].astype(np.int64)
    bounds = np.concatenate([[0], np.nonzero(np.diff(cellv))[0] + 1, [len(cellv)]])
    rows = {c: [] for c in _PAIR_COLS}

    for s, e in zip(bounds[:-1], bounds[1:]):
        kind = cols["kind"][s:e]
        pt_idx = np.nonzero(kind == 0)[0] + s
        if not len(pt_idx):
            continue
        sg_idx = np.nonzero(kind == 1)[0] + s
        if len(sg_idx):
            sg_idx = sg_idx[np.argsort(cols["road_seq"][sg_idx].astype(np.int64),
                                       kind="stable")]
            P = np.stack([cols["px"][pt_idx], cols["py"][pt_idx]], 1).astype(np.float64)
            A = np.stack([cols["ax"][sg_idx], cols["ay"][sg_idx]], 1).astype(np.float64)
            B = np.stack([cols["bx"][sg_idx], cols["by"][sg_idx]], 1).astype(np.float64)
            near = lines.points_to_segments_distance(P, A, B) <= p.sidepath_buffer_size
        for pi, gi in enumerate(pt_idx):
            rows["way_id"].append(cols["way_id"][gi])
            rows["point_order"].append(int(cols["point_order"][gi]))
            rows["road_seq"].append(-1)
            rows["road_id"].append(None)
            rows["road_highway"].append(None)
            rows["road_name"].append(None)
            rows["road_maxspeed"].append(None)
            rows["is_sidepath"].append(_nn(cols["is_sidepath"][gi]))
            rows["footway"].append(_nn(cols["footway"][gi]))
            rows["is_sidepath_of"].append(_nn(cols["is_sidepath_of"][gi]))
            if not len(sg_idx):
                continue
            pl = _nn(cols["layer"][gi])
            seen: set = set()
            for sj in np.nonzero(near[pi])[0]:
                gj = sg_idx[sj]
                rs = int(cols["road_seq"][gj])
                if rs in seen or _nn(cols["layer"][gj]) != pl:
                    continue
                seen.add(rs)
                rows["way_id"].append(cols["way_id"][gi])
                rows["point_order"].append(int(cols["point_order"][gi]))
                rows["road_seq"].append(rs)
                rows["road_id"].append(_nn(cols["road_id"][gj]))
                rows["road_highway"].append(_nn(cols["road_highway"][gj]))
                rows["road_name"].append(_nn(cols["road_name"][gj]))
                rows["road_maxspeed"].append(_nn(cols["road_maxspeed"][gj]))
                rows["is_sidepath"].append(_nn(cols["is_sidepath"][gi]))
                rows["footway"].append(_nn(cols["footway"][gi]))
                rows["is_sidepath_of"].append(_nn(cols["is_sidepath_of"][gi]))
    return pd.DataFrame(rows) if rows["way_id"] else _empty(_PAIR_COLS)


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
    records = _sparse_records(batch)
    for r in records:
        hw = r.get("highway")
        if hw not in sidepath.NON_ROAD_HIGHWAYS or hw == "track":
            r.update(sidepath.road_proc_attrs(r))
        elif r.get("sp_sidepath") is not None:
            r["proc_sidepath"] = r["sp_sidepath"]
            if r["sp_sidepath"] == "yes":
                # fold_entry only sets proc_highway for 'yes' rows
                r["proc_highway"] = r.get("sp_highway")
            if r.get("sp_maxspeed") is not None:
                r["proc_maxspeed"] = float(r["sp_maxspeed"])
            if r.get("sp_name") is not None:
                r["name"] = r["sp_name"]
        for k in ("sp_sidepath", "sp_highway", "sp_maxspeed", "sp_name"):
            r.pop(k, None)
    return pd.DataFrame(records)


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
    from ..vector import (classify_way_type_batch, derive_oneway_batch,
                          derive_separation_buffer_batch,
                          derive_surface_smoothness_batch,
                          derive_traffic_modes_batch)

    # classification, oneway, surface/smoothness, traffic modes and
    # separation/buffer are vectorized (mask rules over the whole batch,
    # differentially tested equal to the row-wise forms); the remaining
    # branchy derivation (width, mandatory, index math) is per-row
    way_types = classify_way_type_batch(batch, p)
    oneways = derive_oneway_batch(batch, way_types, p)
    surf, surf_miss, smooth, smooth_miss = \
        derive_surface_smoothness_batch(batch, way_types, p)
    ml, mr = derive_traffic_modes_batch(batch, way_types, p)
    sl, sr, bl, br = derive_separation_buffer_batch(batch, ml, mr, p)

    def _nanv(v):
        return None if isinstance(v, float) and v != v else v

    out = []
    for i, r in enumerate(_sparse_records(batch)):
        way_type = way_types[i]
        if way_type == scoring.DROP:
            continue
        r["way_type"] = way_type
        scoring.score_row(
            r, p, proc_oneway=oneways[i],
            surface=(surf[i], bool(surf_miss[i])),
            smoothness=(smooth[i], bool(smooth_miss[i])),
            modes=(ml[i], mr[i]),
            sep_buf=(sl[i], sr[i], _nanv(bl[i]), _nanv(br[i])))
        rec = {c: r.get(c) for c in OUTPUT_COLUMNS}
        if rec.get("proc_maxspeed") is not None:
            rec["proc_maxspeed"] = int(rec["proc_maxspeed"])
        rec["geometry_m"] = r.get("geometry_m")
        out.append(rec)
    cols = list(OUTPUT_COLUMNS) + ["geometry_m"]
    df = pd.DataFrame(out)[cols] if out else _empty(cols)
    for c in ("index", "index_10", "stress_level", "base_index",
              "filter_usable", "proc_maxspeed"):
        df[c] = pd.array(df[c], dtype="Int64")
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
