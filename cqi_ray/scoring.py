"""Cycling-Quality-Index rule engine: way-type classification, attribute
derivation, index and traffic-stress computation.

This is a from-scratch reimplementation of the scoring semantics of the
reference monolith (/root/reference/cycling_quality_index.py; see SURVEY.md
§2.4/2.8/2.9 for the operator-by-operator map).  It operates on plain row
dicts (missing tag == ``None``; QGIS-NULL falsiness becomes Python
falsiness) so it can run row-wise inside Ray Data ``map_batches`` over Arrow
batches — the wrapper lives in :mod:`cqi_ray.kernels`.

Deliberate bug-for-bug compatibility notes (vs. the golden corpus
``data/test_ways/test_ways_alex.geojson``; see SURVEY.md §7.5):

* ``fac_width`` IS written to the output (the snapshot drops it;
  the golden file carries it).
* ``maxspeed`` is never appended to ``data_missing`` (the snapshot's
  ``is_max_speed_missing`` appends; golden's vocabulary has no 'maxspeed').
* For ``shared road`` rows whose width derivation reaches the
  parking/cycle-lane subtraction path, a missing parking mapping on both
  sides appends ``'parking'`` to ``data_missing`` (absent from the
  snapshot; present throughout the golden file).
* The traffic-sign-derived mandatory-use branch for sidepaths
  (cycling_quality_index.py:1117-1129) is disabled: no golden row carries
  ``proc_mandatory`` in {'yes','no'}.
* Dooring-buffer / permissive maluses are plain ``list.append`` (the
  snapshot's ``list.append(list, str)`` would raise; golden contains the
  malus strings).
* ``smoothness:bicycle`` is looked up as a dict *value* then validated as
  a dict *key* — i.e. a valid ``smoothness:bicycle`` yields NULL smoothness
  with no data_missing entry (cycling_quality_index.py:957-971).
"""

from __future__ import annotations

import math
from typing import Optional

from .params import CQIParams, DEFAULT_PARAMS
from . import tags as T

# sentinel: classification decided this row must be dropped
DROP = "__drop__"

# golden-corpus rule: 'use_sidepath' is NOT allowed (fw05 is dropped while
# fw02/'optional_sidepath' survives), unlike the snapshot's list (:36)
ALLOWED_BICYCLE_ACCESS = (
    "yes", "permissive", "designated", "optional_sidepath", "discouraged",
)
LINK_OR_CROSSING_KEYS = ("footway", "cycleway", "path", "bridleway")
FOOTWAY_FAMILY = ("footway", "pedestrian", "bridleway", "steps")
PATH_FAMILY = ("cycleway", "footway", "path", "bridleway", "steps")
MOTOR_WAY_TYPES = (
    "bicycle road", "shared road", "shared traffic lane", "track or service",
)
ONEWAY_VALUES = ("yes", "no", "-1", "alternating", "reversible")
CYCLE_ONEWAY_TYPES = (
    "cycle path", "cycle track", "shared path", "segregated path",
    "shared footway", "crossing", "link", "cycle lane (advisory)",
    "cycle lane (exclusive)", "cycle lane (protected)", "cycle lane (central)",
)


def _side_keys(side: Optional[str], base: str, sub: str = "") -> tuple:
    """Keys to scan for a cycleway/sidewalk family tag.

    Center rows consider both explicit sides; a fanned-out side row only
    considers its own side (the golden corpus proves the original pipeline
    classified side rows side-aware: cl01's left row is a cycle track while
    its right row is an exclusive lane)."""
    suffix = f":{sub}" if sub else ""
    if side in ("left", "right"):
        return (f"{base}{suffix}", f"{base}:both{suffix}", f"{base}:{side}{suffix}")
    return (
        f"{base}{suffix}", f"{base}:both{suffix}",
        f"{base}:left{suffix}", f"{base}:right{suffix}",
    )


def _any_value(row: dict, keys, values) -> bool:
    return any(row.get(k) in values for k in keys)


# ---------------------------------------------------------------------------
# Way-type classification  (reference: cycling_quality_index.py:367-476)
# ---------------------------------------------------------------------------

def classify_way_type(row: dict, p: CQIParams = DEFAULT_PARAMS):
    """Return the way type, ``DROP`` for rows the pipeline discards, or
    ``None`` when unclassifiable."""
    bike_access = T.access_value(row, "bicycle")
    if bike_access and bike_access not in ALLOWED_BICYCLE_ACCESS:
        return DROP
    highway = row.get("highway")
    if highway == "path" and row.get("informal") == "yes" and row.get("bicycle") is None:
        return DROP

    segregated = row.get("segregated")
    bicycle = row.get("bicycle")
    foot = row.get("foot")
    is_sidepath = row.get("is_sidepath")
    side = row.get("side")

    if row.get("bicycle_road") == "yes" and not side:
        return "bicycle road"
    if any(row.get(k) == "link" for k in LINK_OR_CROSSING_KEYS):
        return "link"
    if any(row.get(k) == "crossing" for k in LINK_OR_CROSSING_KEYS):
        return "crossing"

    if highway in FOOTWAY_FAMILY:
        # golden-corpus rule: footway-family rows that survive the access
        # filter are always shared footways (fw06_null / idx12 are kept);
        # the snapshot's delete branch (:400) does not match golden
        return "shared footway"

    if highway == "path":
        if foot == "designated" and bicycle != "designated":
            return "shared footway"
        return "segregated path" if segregated == "yes" else "shared path"

    if highway == "cycleway":
        if foot in ("yes", "designated", "permissive"):
            return "shared path"
        if T.separation_for_mode(row, "foot") == "no":
            return "segregated path"
        if is_sidepath not in ("yes", "no"):
            return "cycle track" if row.get("proc_sidepath") == "yes" else "cycle path"
        if is_sidepath == "yes":
            motor_sep = T.separation_for_mode(row, "motor_vehicle")
            if motor_sep not in (None, "no", "none"):
                if "kerb" in motor_sep or "tree_row" in motor_sep:
                    return "cycle track"
                return "cycle lane (protected)"
            return "cycle track"
        return "cycle path"

    if highway in ("service", "track"):
        return "track or service"

    if not side:
        lane_markings = row.get("lane_markings")
        if lane_markings == "yes" or (
            lane_markings != "yes"
            and highway in ("motorway", "trunk", "primary", "secondary")
        ):
            return "shared traffic lane"
        return "shared road"

    # --- fanned-out side rows only below this point ---
    if row.get("type") == "sidewalk":
        return "shared footway"

    cw_keys = _side_keys(side, "cycleway")
    if _any_value(row, cw_keys, ("lane",)):
        cw_lanes = row.get("cycleway:lanes")
        if cw_lanes and "no|lane|no" in cw_lanes:
            return "cycle lane (central)"
        if T.separation_for_mode(row, "motor_vehicle") not in (None, "no", "none"):
            return "cycle lane (protected)"
        if _any_value(row, _side_keys(side, "cycleway", "lane"), ("exclusive",)):
            return "cycle lane (exclusive)"
        return "cycle lane (advisory)"

    if _any_value(row, cw_keys, ("track",)):
        if _any_value(row, _side_keys(side, "cycleway", "foot"),
                      ("yes", "designated", "permissive")):
            return "shared path"
        seg_keys = _side_keys(side, "cycleway", "segregated")
        if _any_value(row, seg_keys, ("yes",)):
            return "segregated path"
        if _any_value(row, seg_keys, ("no",)):
            return "shared path"
        if T.separation_for_mode(row, "foot") == "no":
            return "segregated path"
        motor_sep = T.separation_for_mode(row, "motor_vehicle")
        if motor_sep not in (None, "no", "none"):
            if "kerb" in motor_sep or "tree_row" in motor_sep:
                return "cycle track"
            return "cycle lane (protected)"
        return "cycle track"

    if _any_value(row, cw_keys, ("share_busway",)):
        return "shared bus lane"
    if _any_value(row, _side_keys(side, "sidewalk", "bicycle"), ("yes",)):
        return "shared footway"

    lane_markings = row.get("lane_markings")
    if lane_markings == "yes" or (
        lane_markings != "yes" and highway in ("primary", "secondary")
    ):
        return "shared traffic lane"
    return "shared road"


# ---------------------------------------------------------------------------
# Oneway  (reference: cycling_quality_index.py:479-525)
# ---------------------------------------------------------------------------

def derive_oneway(row: dict, p: CQIParams) -> str:
    way_type = row.get("way_type")
    oneway = row.get("oneway")
    oneway_bicycle = row.get("oneway:bicycle")

    proc_oneway = None
    if way_type in CYCLE_ONEWAY_TYPES:
        cycleway_oneway = row.get("cycleway:oneway")
        if oneway in ONEWAY_VALUES:
            proc_oneway = oneway
        elif cycleway_oneway in ONEWAY_VALUES:
            proc_oneway = cycleway_oneway
        elif way_type in ("cycle track", "shared path", "shared footway") and row.get("side"):
            proc_oneway = p.default_oneway_cycle_track
        elif "cycle lane" in way_type:
            proc_oneway = p.default_oneway_cycle_lane
        elif oneway_bicycle in ONEWAY_VALUES:
            proc_oneway = oneway_bicycle
        else:
            proc_oneway = "no"
    elif way_type == "shared bus lane":
        proc_oneway = "yes"
    elif way_type in ("shared road", "shared traffic lane", "bicycle road", "track or service"):
        if not oneway_bicycle or oneway == oneway_bicycle:
            proc_oneway = oneway if oneway in ONEWAY_VALUES else "no"
        elif oneway_bicycle == "no":
            proc_oneway = (oneway + "_motor_vehicles") if oneway in ONEWAY_VALUES else "no"
        else:
            proc_oneway = "yes"
    return proc_oneway or "unknown"


# ---------------------------------------------------------------------------
# Width  (reference: cycling_quality_index.py:569-897)
# ---------------------------------------------------------------------------

def _num0(value) -> float:
    n = T.to_number(value)
    return n if n is not None else 0.0


def _default_width_for_type(way_type: str, p: CQIParams):
    if way_type in ("cycle path", "shared path", "cycle lane (protected)"):
        return p.default_highway_width.get("path")
    if way_type == "shared footway":
        return p.default_highway_width.get("footway")
    return p.default_highway_width.get("cycleway")


def _parking_status(row: dict):
    return T.fill_left_right(
        row.get("parking:both"), row.get("parking:left"), row.get("parking:right")
    )


def _one_side_parking_width(parking, width, orientation, p: CQIParams):
    if parking in ("lane", "half_on_kerb") and not width:
        width = {
            "diagonal": p.width_parking_diagonal,
            "perpendicular": p.width_parking_perpendicular,
        }.get(orientation, p.width_parking_parallel)
    if parking == "half_on_kerb":
        width = float(width) / 2
    return width or 0


def _parking_widths(row: dict, p: CQIParams):
    left, right = _parking_status(row)
    left_o, right_o = T.fill_left_right(
        row.get("parking:both:orientation"),
        row.get("parking:left:orientation"),
        row.get("parking:right:orientation"),
    )
    left_w, right_w = T.fill_left_right(
        T.to_number(row.get("parking:both:width")),
        T.to_number(row.get("parking:left:width")),
        T.to_number(row.get("parking:right:width")),
    )
    return (
        _one_side_parking_width(left, left_w, left_o, p),
        _one_side_parking_width(right, right_w, right_o, p),
    )


def _cycleway_lane_widths(row: dict, proc_oneway: str, p: CQIParams):
    """Per-side cycle-lane widths to subtract from the carriageway
    (reference: cycling_quality_index.py:787-897).  Unlike the snapshot's
    hardcoded ``oneway = False`` (make_cycleway_buffers :870), the general
    ``cycleway`` tag fills the *left* side only on two-way roads — golden
    cl22 (oneway road, cycleway=lane) subtracts one lane, not two."""
    cw = row.get("cycleway")
    cw_left = row.get("cycleway:left")
    cw_right = row.get("cycleway:right")
    cw_both = row.get("cycleway:both")
    w = row.get("cycleway:width")
    w_left = row.get("cycleway:left:width")
    w_right = row.get("cycleway:right:width")
    w_both = row.get("cycleway:both:width")
    twoway = not proc_oneway or proc_oneway == "no"

    if cw:
        cw_right = cw_right or cw
        if twoway:
            cw_left = cw_left or cw
    if cw_both:
        cw_right = cw_right or cw_both
        cw_left = cw_left or cw_both

    if cw_right == "lane" or cw_left == "lane":
        if w:
            w_right = w_right or w
            if twoway:
                w_left = w_left or w
        if w_both:
            w_right = w_right or w_both
            w_left = w_left or w_both

    if cw_right == "lane" and not w_right:
        w_right = p.width_cycle_lane
    if cw_left == "lane" and not w_left:
        w_left = p.width_cycle_lane
    return cw_left, cw_right, (w_left or 0), (w_right or 0)


def _buffer_lookup(row: dict, lane_side: str, buffer_side: str):
    """First non-falsy cycleway buffer value for ``(lane_side, buffer_side)``
    (reference: cycling_quality_index.py:842-863)."""
    candidates = (
        f"cycleway:{lane_side}:buffer:{buffer_side}",
        f"cycleway:{lane_side}:buffer:both",
        f"cycleway:{lane_side}:buffer",
        f"cycleway:both:buffer:{buffer_side}",
        f"cycleway:both:buffer:both",
        "cycleway:both:buffer",
        f"cycleway:buffer:{buffer_side}",
        "cycleway:buffer:both",
        "cycleway:buffer",
    )
    for key in candidates:
        value = row.get(key)
        if value:
            return value
    return None


def derive_width(row: dict, proc_oneway: str, p: CQIParams):
    """Return (proc_width, data_missing_entries)."""
    way_type = row.get("way_type")
    missing: list[str] = []

    if way_type in (
        "cycle path", "cycle track", "shared path", "shared footway",
        "crossing", "link", "cycle lane (advisory)", "cycle lane (exclusive)",
        "cycle lane (protected)", "cycle lane (central)",
    ):
        width = T.to_number(row.get("cycleway:width")) or T.to_number(row.get("width"))
        if not width:
            width = _default_width_for_type(way_type, p)
            if proc_oneway == "no":
                width *= 1.6
            missing.append("width")
        return width, missing

    if way_type == "segregated path":
        if row.get("highway") == "path":
            width = T.to_number(row.get("cycleway:width"))
            if width:
                return width, missing
            total = T.to_number(row.get("width"))
            footway_w = T.to_number(row.get("footway:width"))
            width = None
            if total:
                width = (total - footway_w) if footway_w else total / 2
            missing.append("width")
        else:
            width = T.to_number(row.get("width"))
        if not width:
            width = p.default_highway_width.get("path")
            if proc_oneway == "no":
                width *= 1.6
            missing.append("width")
        return width, missing

    if way_type in ("shared road", "shared traffic lane", "shared bus lane",
                    "bicycle road", "track or service"):
        proc_width = None
        if way_type in ("shared traffic lane", "shared bus lane"):
            width_lanes = row.get("width:lanes")
            width_lanes_f = row.get("width:lanes:forward")
            width_lanes_b = row.get("width:lanes:backward")
            side = row.get("side")
            if ("yes" in proc_oneway or way_type != "shared bus lane") and \
                    width_lanes and "|" in width_lanes:
                proc_width = T.to_number(width_lanes[width_lanes.rfind("|") + 1:])
            elif (way_type == "shared bus lane" and "yes" not in proc_oneway) and \
                    side == "right" and width_lanes_f and "|" in width_lanes_f:
                proc_width = T.to_number(width_lanes_f[width_lanes_f.rfind("|") + 1:])
            elif (way_type == "shared bus lane" and "yes" not in proc_oneway) and \
                    side == "left" and width_lanes_b and "|" in width_lanes_b:
                proc_width = T.to_number(width_lanes_b[width_lanes_b.rfind("|") + 1:])
            elif way_type == "shared bus lane":
                proc_width = p.width_bus_lane
            else:
                proc_width = p.width_traffic_lane
                missing.append("width:lanes")
        if proc_width:
            return proc_width, missing

        proc_width = T.to_number(row.get("width:effective"))
        if proc_width:
            return proc_width, missing

        width = T.to_number(row.get("width"))
        if not width:
            lanes = T.to_number(row.get("lanes"))
            if lanes:
                proc_width = lanes * p.width_traffic_lane
        if proc_width:
            return proc_width, missing

        parking_left, parking_right = _parking_status(row)
        parking_left_w, parking_right_w = _parking_widths(row, p)
        cw_left, cw_right, cw_left_w, cw_right_w = _cycleway_lane_widths(
            row, proc_oneway, p)

        if not width:
            width = p.default_highway_width.get(
                row.get("highway"), p.default_highway_width_fallback
            )
            if "yes" in proc_oneway:
                width = round(width / 1.6, 1)
            missing.append("width")

        # golden-corpus rule: unknown parking on a shared road is missing data
        if way_type == "shared road" and not parking_left and not parking_right:
            missing.append("parking")

        buffer_total = 0.0
        if cw_right == "lane":
            buffer_total += _num0(_buffer_lookup(row, "right", "left"))
            buffer_total += _num0(_buffer_lookup(row, "right", "right"))
        if cw_left == "lane":
            buffer_total += _num0(_buffer_lookup(row, "left", "left"))
            buffer_total += _num0(_buffer_lookup(row, "left", "right"))

        proc_width = width - _num0(cw_right_w) - _num0(cw_left_w) - buffer_total

        if parking_right or parking_left:
            proc_width = proc_width - _num0(parking_right_w) - _num0(parking_left_w)
        elif way_type == "shared road":
            proc_width = min(proc_width, 5.5 if "yes" not in proc_oneway else 4)

        if proc_width < p.width_traffic_lane and "width" in missing:
            proc_width = p.width_traffic_lane
        return (proc_width or None), missing

    return None, missing


# ---------------------------------------------------------------------------
# Surface & smoothness  (reference: cycling_quality_index.py:900-973)
# ---------------------------------------------------------------------------

def derive_surface(row: dict, p: CQIParams):
    way_type = row.get("way_type")
    missing: list[str] = []
    proc_surface = None

    surface_bicycle = row.get("surface:bicycle")
    if surface_bicycle:
        if surface_bicycle in p.surface_factor:
            proc_surface = surface_bicycle
        elif ";" in surface_bicycle:
            proc_surface = T.weakest_surface(
                T.split_values(surface_bicycle, ";"), p.surface_rank_order
            )
    if proc_surface:
        # golden-corpus rule: an explicit bicycle surface also suppresses the
        # smoothness-missing flag (surf04/surf09 carry no 'smoothness' entry)
        row["_surface_from_bicycle"] = True
        return proc_surface, missing

    # golden-corpus rule: the default surface is the highway default
    # (tracktype default for track-or-service) for EVERY way type — the
    # snapshot's per-way-type lane/track defaults do not reproduce golden
    # (cl04's defaulted cycle-track side row is asphalt = residential default)
    if way_type == "segregated path":
        proc_surface = row.get("cycleway:surface") or row.get("surface")
    else:
        proc_surface = row.get("surface")
    if not proc_surface:
        if way_type == "track or service":
            proc_surface = p.surface_tracktype_default.get(
                row.get("tracktype"), p.surface_tracktype_default["grade3"]
            )
        else:
            proc_surface = p.surface_highway_default.get(
                row.get("highway"), p.surface_highway_default["path"]
            )
        missing.append("surface")

    if ";" in proc_surface:
        proc_surface = T.weakest_surface(
            T.split_values(proc_surface, ";"), p.surface_rank_order
        )
    if proc_surface not in p.surface_factor:
        proc_surface = None
    return proc_surface, missing


def derive_smoothness(row: dict, p: CQIParams):
    missing: list[str] = []
    # golden-corpus rule: a valid smoothness:bicycle is used directly
    # (smoothness01 carries proc_smoothness='good'); the snapshot's
    # value-then-key double lookup (:957-971) would null it
    proc_smoothness = row.get("smoothness:bicycle")
    if proc_smoothness not in p.smoothness_factor:
        proc_smoothness = None
    if not proc_smoothness:
        if row.get("way_type") == "segregated path":
            proc_smoothness = row.get("cycleway:smoothness") or row.get("smoothness")
        else:
            proc_smoothness = row.get("smoothness")
        if not proc_smoothness and not row.get("_surface_from_bicycle"):
            missing.append("smoothness")
    if proc_smoothness not in p.smoothness_factor:
        proc_smoothness = None
    return proc_smoothness, missing


# ---------------------------------------------------------------------------
# Traffic modes / separation / buffer  (reference: cycling_quality_index.py:976-1090)
# ---------------------------------------------------------------------------

def _parking_present(value) -> bool:
    return bool(value) and value != "no"


def derive_traffic_modes(row: dict, p: CQIParams):
    way_type = row.get("way_type")
    if way_type == "cycle lane (central)":
        return "motor_vehicle", "motor_vehicle"

    mode_left, mode_right = T.fill_left_right(
        row.get("traffic_mode:both"),
        row.get("traffic_mode:left"),
        row.get("traffic_mode:right"),
    )
    parking_left, parking_right = _parking_status(row)
    side = row.get("side")
    is_sidepath = row.get("proc_sidepath")

    if not mode_left:
        if way_type == "cycle path":
            mode_left = "no"
        elif way_type in ("cycle track", "shared path", "segregated path",
                          "shared footway") and is_sidepath == "yes":
            if ((side == "right" and _parking_present(parking_right))
                    or (side == "left" and _parking_present(parking_left))) \
                    and mode_right != "parking":
                mode_left = "parking"
            else:
                mode_left = "motor_vehicle"
        elif "cycle lane" in (way_type or "") or way_type in (
                "shared road", "shared traffic lane", "shared bus lane", "crossing"):
            mode_left = "motor_vehicle"

    if not mode_right:
        if way_type == "cycle path":
            mode_right = "no"
        elif way_type == "crossing":
            mode_right = "motor_vehicle"
        elif "cycle lane" in (way_type or ""):
            if ((side == "right" and _parking_present(parking_right))
                    or (side == "left" and _parking_present(parking_left))) \
                    and mode_left != "parking":
                mode_right = "parking"
            else:
                mode_right = "foot"
        elif way_type in ("cycle track", "shared path", "segregated path",
                          "shared footway") and is_sidepath == "yes":
            mode_right = "foot"

    return mode_left, mode_right


def derive_separation(row: dict, mode_left, mode_right, p: CQIParams):
    sep = row.get("separation")
    sep_left, sep_right = T.fill_left_right(
        row.get("separation:both"), row.get("separation:left"), row.get("separation:right")
    )
    if sep:
        if p.right_hand_traffic:
            if mode_left in ("motor_vehicle", "psv", "parking"):
                sep_left = sep_left or sep
            elif mode_right == "motor_vehicle":
                sep_right = sep_right or sep
        else:
            if mode_right in ("motor_vehicle", "psv", "parking"):
                sep_right = sep_right or sep
            elif mode_left == "motor_vehicle":
                sep_left = sep_left or sep
    return sep_left or "no", sep_right or "no"


def derive_buffer(row: dict, mode_left, mode_right, p: CQIParams):
    buf = T.to_number(row.get("buffer"))
    buf_left, buf_right = T.fill_left_right(
        T.to_number(row.get("buffer:both")),
        T.to_number(row.get("buffer:left")),
        T.to_number(row.get("buffer:right")),
    )
    if buf:
        if p.right_hand_traffic:
            if mode_left in ("motor_vehicle", "psv", "parking"):
                buf_left = buf_left or buf
            elif mode_right == "motor_vehicle":
                buf_right = buf_right or buf
        else:
            if mode_right in ("motor_vehicle", "psv", "parking"):
                buf_right = buf_right or buf
            elif mode_left == "motor_vehicle":
                buf_left = buf_left or buf
    return buf_left, buf_right


# ---------------------------------------------------------------------------
# Mandatory use & filters  (reference: cycling_quality_index.py:1093-1136,1179-1203)
# ---------------------------------------------------------------------------

def derive_mandatory(row: dict, proc_oneway: str, p: CQIParams,
                     signs_enabled: bool = False):
    proc_mandatory = None
    bicycle = row.get("bicycle")
    way_type = row.get("way_type")

    if way_type in MOTOR_WAY_TYPES:
        cw = row.get("cycleway")
        cw_both = row.get("cycleway:both")
        cw_right = row.get("cycleway:right")
        if cw in ("lane", "share_busway") or cw_both in ("lane", "share_busway") \
                or ("yes" in proc_oneway and cw_right in ("lane", "share_busway")):
            proc_mandatory = "use_sidepath"
        elif cw == "track" or cw_both == "track" \
                or ("yes" in proc_oneway and cw_right == "track"):
            proc_mandatory = "optional_sidepath"
        if bicycle in ("use_sidepath", "optional_sidepath"):
            proc_mandatory = bicycle
    elif signs_enabled and row.get("proc_sidepath") == "yes":
        traffic_sign = row.get("traffic_sign")
        if traffic_sign:
            sign_set = set(T.split_values(traffic_sign.replace(",", ";"), ";"))
            proc_mandatory = "no"
            if sign_set & set(p.mandatory_traffic_signs):
                proc_mandatory = "yes"

    if row.get("highway") in p.cycling_highway_prohibition or bicycle == "no":
        proc_mandatory = "prohibited"
    return proc_mandatory, row.get("traffic_sign")


_FILTER_WAY_TYPE = {
    "cycle path": "separated", "cycle track": "separated",
    "shared path": "separated", "segregated path": "separated",
    "shared footway": "separated", "cycle lane (protected)": "separated",
    "cycle lane (advisory)": "cycle lanes", "cycle lane (exclusive)": "cycle lanes",
    "cycle lane (central)": "cycle lanes", "link": "cycle lanes",
    "crossing": "cycle lanes",
    "bicycle road": "bicycle road",
    "shared road": "shared traffic", "shared traffic lane": "shared traffic",
    "shared bus lane": "shared traffic", "track or service": "shared traffic",
}


# ---------------------------------------------------------------------------
# Index factors  (reference: cycling_quality_index.py:1210-1434,1609-1798)
# ---------------------------------------------------------------------------

def _width_factor(row: dict, way_type, proc_width, proc_oneway,
                  motor_access, p: CQIParams):
    dedicated = way_type not in (
        "bicycle road", "shared road", "shared traffic lane", "shared bus lane",
        "track or service",
    ) or motor_access == "no"
    calc_width = proc_width
    if dedicated:
        if calc_width and "yes" not in proc_oneway:
            calc_width /= 1.6
    else:
        if calc_width:
            if way_type == "shared traffic lane":
                calc_width = max(calc_width - 2 + ((4.5 - calc_width) / 3), 0)
            elif way_type == "shared bus lane":
                calc_width = max(calc_width - 3 + ((5.5 - calc_width) / 3), 0)
            else:
                if "yes" not in proc_oneway:
                    calc_width /= 1.6
                calc_width -= 2

    if not calc_width:
        return None
    calc_width = max(0.001, calc_width)
    if calc_width <= 3 or way_type in (
        "bicycle road", "shared road", "shared traffic lane", "shared bus lane",
        "track or service",
    ):
        fac = 1.1 / (1 + 20 * math.e ** (-2.1 * calc_width))
    else:
        fac = 2 / (1 + 1.8 * math.e ** (-0.24 * calc_width))
    if way_type in MOTOR_WAY_TYPES and motor_access in p.motor_access_base_index:
        fac = fac + ((1 - fac) / 2)
    if not dedicated:
        # shared motor-traffic ways never drop below 0.25 (golden idx11/
        # sr08/sr14; the snapshot computes this minimum but never applies it)
        fac = max(fac, 0.25)
    return round(fac, 3)


def _maxspeed_factor(proc_maxspeed, p: CQIParams) -> float:
    if proc_maxspeed:
        for threshold in sorted(p.maxspeed_factor, reverse=True):
            if proc_maxspeed >= threshold:
                return p.maxspeed_factor[threshold]
    return 1


def _lts(row: dict, way_type, proc_oneway, proc_width, proc_maxspeed,
         proc_highway, p: CQIParams):
    if way_type in ("cycle path", "cycle track", "segregated path",
                    "cycle lane (protected)"):
        return 1
    if way_type in ("shared path", "shared footway"):
        if proc_oneway not in ("yes", "-1") and proc_width and proc_width < 3 \
                and proc_maxspeed and proc_maxspeed > 30:
            return 3
        return 1
    if way_type in ("cycle lane (advisory)", "cycle lane (central)",
                    "shared bus lane", "link", "crossing"):
        if proc_maxspeed and proc_maxspeed <= 10:
            return 1
        if proc_maxspeed and proc_maxspeed <= 30:
            return 2
        if proc_width and proc_width >= 1.5:
            return 3
        return 4
    if way_type == "cycle lane (exclusive)":
        if proc_maxspeed and proc_maxspeed <= 10:
            return 1
        if proc_maxspeed and proc_maxspeed <= 50 and proc_width and proc_width >= 1.85:
            return 2
        return 3
    if way_type in ("bicycle road", "shared road", "shared traffic lane"):
        if way_type == "bicycle road" and \
                T.access_value(row, "motor_vehicle") in p.motor_access_base_index:
            return 1
        priority_road = row.get("priority_road")
        if proc_maxspeed and proc_maxspeed <= 10 \
                and proc_highway in ("residential", "living_street") \
                and (not priority_road or priority_road == "no"):
            return 1
        if proc_maxspeed and proc_maxspeed <= 30 and proc_highway in (
                "tertiary", "tertiary_link", "unclassified", "road",
                "residential", "living_street"):
            return 2
        return 4
    if way_type == "track or service":
        if proc_maxspeed and proc_maxspeed <= 10:
            return 1
        return 2
    return None


# ---------------------------------------------------------------------------
# Full per-row pipeline step (stages 4+5 of the reference main loop)
# ---------------------------------------------------------------------------

def score_row(row: dict, p: CQIParams = DEFAULT_PARAMS,
              proc_oneway: Optional[str] = None,
              surface: Optional[tuple] = None,
              smoothness: Optional[tuple] = None,
              modes: Optional[tuple] = None,
              sep_buf: Optional[tuple] = None) -> dict:
    """Derive all ``proc_*`` attributes, the index factors, the final index
    and the traffic-stress level for one classified row.  Mutates and
    returns ``row``.  ``proc_oneway`` / ``surface`` / ``smoothness`` may be
    precomputed by the vectorized batch kernels in :mod:`cqi_ray.vector`
    (``surface``/``smoothness`` as ``(value, missing_flag)`` pairs)."""
    way_type = row.get("way_type")
    data_missing: list[str] = []
    data_bonus: list[str] = []
    data_malus: list[str] = []

    if proc_oneway is None:
        proc_oneway = derive_oneway(row, p)
    row["proc_oneway"] = proc_oneway

    proc_width, m = derive_width(row, proc_oneway, p)
    data_missing.extend(m)
    row["proc_width"] = proc_width

    if surface is None:
        proc_surface, m = derive_surface(row, p)
        data_missing.extend(m)
    else:
        proc_surface, missing_flag = surface
        if missing_flag:
            data_missing.append("surface")
    row["proc_surface"] = proc_surface

    if smoothness is None:
        proc_smoothness, m = derive_smoothness(row, p)
        data_missing.extend(m)
    else:
        proc_smoothness, missing_flag = smoothness
        if missing_flag:
            data_missing.append("smoothness")
    row["proc_smoothness"] = proc_smoothness

    if modes is None:
        mode_left, mode_right = derive_traffic_modes(row, p)
    else:
        mode_left, mode_right = modes
    row["proc_traffic_mode_left"] = mode_left
    row["proc_traffic_mode_right"] = mode_right

    if sep_buf is None:
        sep_left, sep_right = derive_separation(row, mode_left, mode_right, p)
        buf_left, buf_right = derive_buffer(row, mode_left, mode_right, p)
    else:
        sep_left, sep_right, buf_left, buf_right = sep_buf
    row["proc_separation_left"] = sep_left
    row["proc_separation_right"] = sep_right
    row["proc_buffer_left"] = buf_left
    row["proc_buffer_right"] = buf_right

    proc_mandatory, proc_traffic_sign = derive_mandatory(row, proc_oneway, p)
    row["proc_mandatory"] = proc_mandatory
    row["proc_traffic_sign"] = proc_traffic_sign

    row["filter_usable"] = 0 if proc_mandatory in ("prohibited", "use_sidepath") else 1
    row["filter_way_type"] = _FILTER_WAY_TYPE.get(way_type)

    # ---- index factors ----
    motor_access = T.access_value(row, "motor_vehicle")
    base_index = p.base_index.get(way_type)
    if way_type in MOTOR_WAY_TYPES:
        base_index = p.motor_access_base_index.get(motor_access, base_index)
        if motor_access in p.motor_access_base_index:
            data_bonus.append("motor vehicle restricted")
    row["base_index"] = base_index

    fac_width = _width_factor(row, way_type, proc_width, proc_oneway, motor_access, p)
    row["fac_width"] = fac_width
    if fac_width is not None:
        if fac_width > 1:
            data_bonus.append("wide width")
        if fac_width <= 0.5:
            data_malus.append("narrow width")

    fac_surface = p.smoothness_factor.get(proc_smoothness)
    if fac_surface is None:
        fac_surface = p.surface_factor.get(proc_surface)
    row["fac_surface"] = fac_surface
    if fac_surface:
        if fac_surface > 1:
            data_bonus.append("excellent surface")
        if fac_surface <= 0.5:
            data_malus.append("bad surface")

    proc_highway = row.get("proc_highway")
    proc_maxspeed = row.get("proc_maxspeed")
    is_sidepath = row.get("proc_sidepath")

    fac_highway = p.highway_factor.get(proc_highway, 1)
    fac_maxspeed = _maxspeed_factor(proc_maxspeed, p)
    row["fac_highway"] = fac_highway
    row["fac_maxspeed"] = fac_maxspeed

    index = None
    index_10 = None
    if base_index is not None:
        if fac_width and fac_surface:
            ww = max(1 - fac_width, 0) + 0.5
            ws = max(1 - fac_surface, 0) + 0.5
            fac_1 = (ww * fac_width + ws * fac_surface) / (ww + ws)
        elif fac_width:
            fac_1 = fac_width
        elif fac_surface:
            fac_1 = fac_surface
        else:
            fac_1 = 1
        # the index is computed from the UNROUNDED factors (golden cl03/cl19/
        # br01 only reproduce that way); the stored columns are rounded
        row["fac_1"] = round(fac_1, 2)

        weight = p.fac2_weight.get(way_type, 1)
        if way_type in ("shared path", "segregated path", "shared footway") \
                and is_sidepath != "yes":
            weight = 0
        fac_2 = fac_highway * fac_maxspeed
        fac_2 = fac_2 + ((1 - fac_2) * (1 - weight))
        if not fac_2:
            fac_2 = 1
        row["fac_2"] = round(fac_2, 2)

        if weight >= 0.5:
            if fac_2 > 1:
                data_bonus.append("slow traffic")
            if fac_highway <= 0.7:
                data_malus.append("along a major road")
            if fac_maxspeed <= 0.7:
                data_malus.append("along a road with high speed limits")

        fac_3 = 1
        row["fac_3"] = fac_3

        fac_4 = 1.0
        if way_type in ("shared road", "shared traffic lane"):
            if any(row.get(k) == "shared_lane" for k in
                   ("cycleway", "cycleway:both", "cycleway:left", "cycleway:right")):
                fac_4 += 0.1
                data_bonus.append("shared lane markings")
        if "cycle lane" in (way_type or "") or way_type in (
                "crossing", "shared bus lane", "link", "bicycle road") \
                or (way_type in ("shared path", "segregated path")
                    and is_sidepath == "yes"):
            surface_colour = row.get("surface:colour")
            if surface_colour and surface_colour not in (
                    "no", "none", "grey", "gray", "black"):
                fac_4 += 0.15 if way_type == "crossing" else 0.05
                data_bonus.append("surface colour")
        if way_type == "crossing":
            crossing = row.get("crossing")
            if not crossing:
                data_missing.append("crossing")
            crossing_markings = row.get("crossing:markings")
            if not crossing_markings:
                data_missing.append("crossing_markings")
            if crossing == "traffic_signals":
                fac_4 += 0.2
                data_bonus.append("signalled crossing")
            elif crossing in ("marked", "zebra") or (
                    crossing_markings and crossing_markings != "no"):
                fac_4 += 0.1
                data_bonus.append("marked crossing")
        lit = row.get("lit")
        if not lit:
            data_missing.append("lit")
        if lit == "no":
            fac_4 -= 0.1
            data_malus.append("no street lighting")
        if ((mode_left == "parking" and buf_left and buf_left < 1)
                or (mode_right == "parking" and buf_right and buf_right < 1)) and (
                "cycle lane" in (way_type or "")
                or (way_type in ("cycle track", "shared path", "segregated path")
                    and is_sidepath == "yes")):
            diff = 0
            if mode_left == "parking":
                diff = abs(buf_left - 1) / 5
            if mode_right == "parking":
                diff = abs(buf_right - 1) / 5
            if mode_left == "parking" and mode_right == "parking":
                diff = abs(((buf_left + buf_right) / 2) - 1) / 5
            fac_4 -= diff
            data_malus.append("insufficient dooring buffer")
        if row.get("bicycle") == "permissive":
            fac_4 -= 0.2
            data_malus.append("cycling not intended")
        row["fac_4"] = round(fac_4, 2)

        index = base_index * fac_1 * fac_2 * fac_3 * fac_4
        index = int(round(max(min(100, index), 0)))
        index_10 = index // 10
    else:
        # still record lit-missing for unscored rows? reference only touches
        # these inside the base_index branch
        row["fac_1"] = row["fac_2"] = row["fac_3"] = row["fac_4"] = None

    row["index"] = index
    row["index_10"] = index_10
    row["data_missing"] = ";".join(data_missing)
    row["data_bonus"] = ";".join(data_bonus)
    row["data_malus"] = ";".join(data_malus)

    row["stress_level"] = _lts(row, way_type, proc_oneway, proc_width,
                               proc_maxspeed, proc_highway, p)

    incompleteness = 0.0
    for entry in data_missing:
        incompleteness += p.data_incompleteness_weight.get(entry, 0)
    row["data_incompleteness"] = incompleteness
    return row
