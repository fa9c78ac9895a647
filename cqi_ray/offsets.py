"""Offset fan-out: explode centerline-mapped cycle lanes / tracks /
bikeable sidewalks into separate per-side rows.

Reference: stage 2 (cycling_quality_index.py:254-364).  In the reference
snapshot the fan-out is dead code (``process_offset_lines`` is never
invoked, SURVEY.md §7.5) but the golden corpus contains the 33 fanned-out
side rows, so the attribute-remap spec is implemented per
``update_offset_layer_attributes`` (:315-359) with the deviations the
golden file proves:

* surface/smoothness on *sidewalk* rows derive from the ``sidewalk:*``
  family (the snapshot hardcodes 'cycleway'; golden sidewalk rows carry
  sidewalk surfaces);
* ``traffic_sign`` is remapped as a string (the snapshot's float cast
  would null every sign).
"""

from __future__ import annotations

from typing import Optional

from .params import CQIParams, DEFAULT_PARAMS
from . import tags as T
from .geo import lines

CYCLEWAY_FANOUT_VALUES = ("lane", "track", "share_busway")
SIDEWALK_FANOUT_VALUES = ("yes", "designated", "permissive")

_CYCLEWAY_EXTRA_ATTRS = (
    "separation", "separation:both", "separation:left", "separation:right",
    "buffer", "buffer:both", "buffer:left", "buffer:right",
    "traffic_mode:both", "traffic_mode:left", "traffic_mode:right",
    "surface:colour",
)


def _offset_amount(kind: str, row: dict, p: CQIParams) -> Optional[float]:
    """Per-side offset distance (reference: calculate_offset_cycleway /
    _sidewalk, cycling_quality_index.py:254-266)."""
    if p.offset_distance == "realistic":
        width = T.to_number(row.get("width")) or p.default_highway_width.get(
            row.get("highway"), p.default_highway_width_fallback
        )
        return width / 2 + (2 if kind == "sidewalk" else 0)
    return T.to_number(p.offset_distance)


def _qualifies(row: dict, kind: str, side: str) -> bool:
    if kind == "cycleway":
        keys = ("cycleway", "cycleway:both", f"cycleway:{side}")
        return any(row.get(k) in CYCLEWAY_FANOUT_VALUES for k in keys)
    keys = ("sidewalk:bicycle", "sidewalk:both:bicycle", f"sidewalk:{side}:bicycle")
    return any(row.get(k) in SIDEWALK_FANOUT_VALUES for k in keys)


def _make_side_row(parent: dict, kind: str, side: str, p: CQIParams) -> dict:
    row = dict(parent)
    row["offset"] = _offset_amount(kind, parent, p)
    row["type"] = kind
    row["side"] = side
    row["proc_sidepath"] = "yes"
    row["proc_highway"] = parent.get("highway")
    row["proc_maxspeed"] = T.to_number(parent.get("maxspeed"))

    row["width"] = T.coalesce_tag(parent, "width", kind, side, "float")
    for attr in ("oneway", "oneway:bicycle", "traffic_sign"):
        row[attr] = T.coalesce_tag(parent, attr, kind, side, "str")

    # Side rows pick up the side-aware {kind}:*:surface/smoothness family.
    # For cycleway *track* rows the write happens even when the derived value
    # is NULL (clearing the parent's surface and flagging it as missing data
    # downstream — golden cl11); lane/sidewalk rows only overwrite when the
    # family actually carries a value (golden cl02 / cl22 / cl14).
    derived_surface = T.coalesce_tag(parent, "surface", kind, side, "str")
    derived_smoothness = T.coalesce_tag(parent, "smoothness", kind, side, "str")
    if kind == "cycleway":
        is_track = any(parent.get(k) == "track"
                       for k in (f"cycleway:{side}", "cycleway:both", "cycleway"))
        if is_track or derived_surface is not None or derived_smoothness is not None:
            row["surface"] = derived_surface
            row["smoothness"] = derived_smoothness
        if is_track and derived_surface is None:
            # parent surface was cleared; remember that for data_missing —
            # except derive_surface re-reads row['surface'] (now None) and
            # will append 'surface' through the default path anyway
            pass
    else:
        if derived_surface is not None:
            row["surface"] = derived_surface
        if derived_smoothness is not None:
            row["smoothness"] = derived_smoothness

    if kind == "cycleway":
        for attr in _CYCLEWAY_EXTRA_ATTRS:
            row[attr] = T.coalesce_tag(parent, attr, "cycleway", side, "str")

    # offset geometry: left of travel direction is positive in QGIS offsetline
    geom = parent.get("geometry_m")
    if geom is not None and row["offset"]:
        sign = 1.0 if side == "left" else -1.0
        row["geometry_m"] = lines.offset_polyline(geom, sign * row["offset"])
    return row


def fan_out(row: dict, p: CQIParams = DEFAULT_PARAMS) -> list[dict]:
    """Return the center row plus up to four per-side copies."""
    out = [row]
    for side in ("left", "right"):
        for kind in ("cycleway", "sidewalk"):
            if _qualifies(row, kind, side):
                out.append(_make_side_row(row, kind, side, p))
    return out
