"""Sidepath detection: is a path/cycleway running alongside a road?

Semantics follow the reference's stage 1 (cycling_quality_index.py:
1471-1579 + 168-251, SURVEY.md §2.6) including its counting quirks:

* every sample point of a way counts one "check"; adjacency counters are
  seeded with ``get(x, 1) + 1`` so the first hit counts as 2 (:1568-1575);
* the live ``check_sidepath`` is the sum-based one (:168-172): a path is a
  sidepath when the summed counter for any of {id, highway, name} reaches
  2/3 of the check count;
* only roads on the same ``layer`` are considered; roads exclude the path
  family plus ``track``, paths are cycleway/footway/path/bridleway/steps;
* 'footway=sidewalk' forces sidepath=yes; an explicit ``is_sidepath`` tag
  wins;
* for sidepaths, the most frequent adjacent highway class (ties broken by
  class rank), its max maxspeed, and the most frequent adjacent name are
  transferred onto the path row.

This module holds the *logic* on plain rows; the distributed version in
:mod:`cqi_ray.pipelines.cqi` computes the same (way_id, road) adjacency
pairs with a cell-partitioned spatial join instead of the O(P·R) scan.
"""

from __future__ import annotations

import numpy as np

from .params import CQIParams, DEFAULT_PARAMS
from . import tags as T
from .geo import lines

PATH_HIGHWAYS = ("cycleway", "footway", "path", "bridleway", "steps")
# quirk preserved: the reference excludes 'track' from the *road* layer but
# its non-path branch list contains the typo'd entry 'bridleway, track', so
# highway=track rows still take the plain-road attribute branch (:232)
NON_ROAD_HIGHWAYS = PATH_HIGHWAYS + ("track",)


def sample_check_points(rows: list[dict], p: CQIParams) -> list[tuple[int, np.ndarray]]:
    """(row_index, point) check points in the reference's processing order:
    first the along-line samples of every path (way order), then the final
    vertices of every path (way order)."""
    out: list[tuple[int, np.ndarray]] = []
    path_idx = [i for i, r in enumerate(rows) if r.get("highway") in PATH_HIGHWAYS]
    for i in path_idx:
        pts = lines.points_along_line(rows[i]["geometry_m"], p.sidepath_buffer_distance)
        for pt in pts:
            out.append((i, pt))
    for i in path_idx:
        out.append((i, lines.last_vertex(rows[i]["geometry_m"])))
    return out


def _max_maxspeed(current, candidate) -> bool:
    """True when candidate should replace current (None ranks lowest)."""
    if candidate is None:
        return False
    return current is None or current < candidate


def build_sidepath_stats(rows: list[dict], p: CQIParams) -> dict:
    """way_id -> nested counters {checks, id, highway, name, maxspeed}."""
    road_idx = [i for i, r in enumerate(rows)
                if r.get("highway") not in NON_ROAD_HIGHWAYS]
    stats: dict = {}
    if road_idx:
        seg_a, seg_b, seg_row = [], [], []
        for i in road_idx:
            g = np.asarray(rows[i]["geometry_m"], dtype=np.float64)
            for j in range(len(g) - 1):
                seg_a.append(g[j])
                seg_b.append(g[j + 1])
                seg_row.append(i)
        seg_a = np.asarray(seg_a)
        seg_b = np.asarray(seg_b)
        seg_row = np.asarray(seg_row)
    for row_i, point in sample_check_points(rows, p):
        row = rows[row_i]
        way_id = row.get("id")
        entry = stats.setdefault(
            way_id, {"checks": 0, "id": {}, "highway": {}, "name": {}, "maxspeed": {}}
        )
        near = []
        if road_idx:
            d = lines.points_to_segments_distance(point[None, :], seg_a, seg_b)[0]
            near_rows = sorted(set(seg_row[d <= p.sidepath_buffer_size].tolist()))
            for ri in near_rows:
                road = rows[ri]
                if row.get("layer") != road.get("layer"):
                    continue
                near.append((road.get("id"), road.get("highway"),
                             road.get("name"), T.to_number(road.get("maxspeed"))))
        accumulate_point(entry, near)
    return stats


def accumulate_point(entry: dict, near_roads: list[tuple]) -> None:
    """Fold one check point's adjacent roads (ordered!) into a way's
    counters, preserving the reference's counting quirks: counters seed at
    ``get(x, 1) + 1`` (first hit counts 2), per-highway max maxspeed
    (cycling_quality_index.py:1544-1575)."""
    entry["checks"] += 1
    ids_seen, highways_seen, names_seen = [], [], []
    maxspeed_seen: dict = {}
    for rid, rhw, rname, rms in near_roads:
        if rid not in ids_seen:
            ids_seen.append(rid)
        if rhw not in highways_seen:
            highways_seen.append(rhw)
        if rhw not in maxspeed_seen or _max_maxspeed(maxspeed_seen[rhw], rms):
            maxspeed_seen[rhw] = rms
        if rname not in names_seen:
            names_seen.append(rname)
    for rid in ids_seen:
        entry["id"][rid] = entry["id"].get(rid, 1) + 1
    for rhw in highways_seen:
        entry["highway"][rhw] = entry["highway"].get(rhw, 1) + 1
    for rname in names_seen:
        entry["name"][rname] = entry["name"].get(rname, 1) + 1
    for rhw, rms in maxspeed_seen.items():
        if rhw not in entry["maxspeed"] or _max_maxspeed(entry["maxspeed"][rhw], rms):
            entry["maxspeed"][rhw] = rms


def _passes_threshold(entry: dict, key: str) -> str:
    counts = entry.get(key, {})
    return "yes" if sum(counts.values()) >= (2 / 3) * entry["checks"] else "no"


def fold_entry(way_tags: dict, entry: dict, p: CQIParams) -> dict:
    """Decide sidepath status / adjacent highway class / transferred
    maxspeed + name for one path way from its adjacency counters.
    Returns only the keys to set (reference: cycling_quality_index.py:
    175-224)."""
    out: dict = {}
    order = list(p.highway_class_order)
    is_sidepath = way_tags.get("is_sidepath")
    if way_tags.get("footway") == "sidewalk":
        is_sidepath = "yes"
    if not is_sidepath:
        is_sidepath = "no"
        for key in ("id", "highway", "name"):
            is_sidepath = _passes_threshold(entry, key)
            if is_sidepath == "yes":
                break
    out["proc_sidepath"] = is_sidepath
    if is_sidepath != "yes":
        return out

    adjacent_of = way_tags.get("is_sidepath:of")
    if not adjacent_of and entry["highway"]:
        best = max(entry["highway"].values())
        candidates = [k for k, v in entry["highway"].items() if v == best]
        rank = len(order) - 1
        for k in candidates:
            if k in order and order.index(k) < rank:
                rank = order.index(k)
        adjacent_of = order[rank]
    out["proc_highway"] = adjacent_of

    if adjacent_of in entry["maxspeed"]:
        ms = entry["maxspeed"][adjacent_of]
        if ms:
            out["proc_maxspeed"] = T.to_number(ms)

    if entry["name"]:
        name = max(entry["name"], key=lambda k: entry["name"][k])
        if name:
            out["name"] = name
    return out


def road_proc_attrs(row: dict) -> dict:
    """proc_highway/proc_maxspeed for non-path rows (reference :230-237)."""
    hw = row.get("highway")
    maxspeed = T.effective_maxspeed(row.get("maxspeed"), hw)
    return {"proc_highway": hw, "proc_maxspeed": T.to_number(maxspeed)}


def apply_sidepath_stats(rows: list[dict], stats: dict, p: CQIParams) -> None:
    """Fold the adjacency statistics back onto the way rows (reference:
    update_sidepath_attributes, cycling_quality_index.py:227-251)."""
    for row in rows:
        hw = row.get("highway")
        if hw not in NON_ROAD_HIGHWAYS or hw == "track":
            row.update(road_proc_attrs(row))
            continue
        entry = stats.get(row.get("id"))
        if entry is None:
            continue
        row.update(fold_entry(row, entry, p))


def run_sidepath_stage(rows: list[dict], p: CQIParams = DEFAULT_PARAMS) -> dict:
    """Convenience: build stats + apply, returning the stats for inspection."""
    stats = build_sidepath_stats(rows, p)
    apply_sidepath_stats(rows, stats, p)
    return stats
