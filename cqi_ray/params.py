"""Rule tables and tunable constants for the Cycling Quality Index engine.

These are the engine's *data* (thresholds, lookup tables, default values) —
the semantic counterpart of the reference's parameter module
(/root/reference/parameter.py:1-519).  They are packaged as one frozen
dataclass instance so kernels can close over a single immutable object that
ships cheaply to Ray workers (it is broadcast once per actor/task, never
per batch).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from types import MappingProxyType
from typing import Mapping, Sequence


def _m(d: dict) -> Mapping:
    return MappingProxyType(d)


@dataclass(frozen=True)
class CQIParams:
    # CRS (reference: parameter.py:3-5)
    crs_output: str = "EPSG:4326"
    crs_metric: str = "EPSG:25833"

    right_hand_traffic: bool = True

    # offset fan-out (reference: parameter.py:15-19)
    offset_distance: object = 0  # 0 | number | 'realistic'
    sidepath_buffer_size: float = 22.0  # metres around each check point
    sidepath_buffer_distance: float = 100.0  # metres between check points

    default_oneway_cycle_lane: str = "yes"
    default_oneway_cycle_track: str = "yes"

    cycling_highway_prohibition: Sequence[str] = (
        "motorway",
        "motorway_link",
        "trunk",
        "trunk_link",
    )

    default_highway_width_fallback: float = 11.0
    default_highway_width: Mapping[str, float] = field(default_factory=lambda: _m(
        {
            "motorway": 15,
            "motorway_link": 6,
            "trunk": 15,
            "trunk_link": 6,
            "primary": 17,
            "primary_link": 4,
            "secondary": 15,
            "secondary_link": 4,
            "tertiary": 13,
            "tertiary_link": 4,
            "unclassified": 11,
            "residential": 11,
            "living_street": 6,
            "pedestrian": 6,
            "road": 11,
            "service": 4,
            "track": 2.5,
            "cycleway": 1.5,
            "footway": 2,
            "bridleway": 2,
            "steps": 2,
            "path": 2,
        }
    ))

    width_traffic_lane: float = 3.2
    width_bus_lane: float = 4.5
    width_cycle_lane: float = 1.4
    width_parking_parallel: float = 2.2
    width_parking_diagonal: float = 4.5
    width_parking_perpendicular: float = 5.0

    surface_cycle_track_default: str = "paving_stones"
    surface_cycle_lane_default: str = "asphalt"
    surface_highway_default: Mapping[str, str] = field(default_factory=lambda: _m(
        {
            "motorway": "asphalt",
            "motorway_link": "asphalt",
            "trunk": "asphalt",
            "trunk_link": "asphalt",
            "primary": "asphalt",
            "primary_link": "asphalt",
            "secondary": "asphalt",
            "secondary_link": "asphalt",
            "tertiary": "asphalt",
            "tertiary_link": "asphalt",
            "unclassified": "asphalt",
            "residential": "asphalt",
            "living_street": "paving_stones",
            "pedestrian": "paving_stones",
            "road": "asphalt",
            "service": "asphalt",
            "track": "concrete",
            # golden-corpus values (differ from the snapshot's parameter.py):
            # fw*/crossing* default asphalt, path/steps default ground
            "cycleway": "asphalt",
            "footway": "asphalt",
            "path": "ground",
            "steps": "ground",
        }
    ))
    surface_tracktype_default: Mapping[str, str] = field(default_factory=lambda: _m(
        {
            "grade1": "asphalt",
            "grade2": "compacted",
            "grade3": "unpaved",
            "grade4": "ground",
            "grade5": "grass",
        }
    ))

    surface_factor: Mapping[str, float] = field(default_factory=lambda: _m(
        {
            "asphalt": 1,
            "paved": 1,
            "concrete": 1,
            "chipseal": 1,
            "metal": 1,
            "paving_stones": 0.7,
            "compacted": 0.7,
            "fine_gravel": 0.7,
            "concrete:plates": 0.7,
            "bricks": 0.7,
            "sett": 0.3,
            "cobblestone": 0.3,
            "concrete:lanes": 0.3,
            "unpaved": 0.3,
            "wood": 0.3,
            "unhewn_cobblestone": 0.2,
            "ground": 0.2,
            "dirt": 0.2,
            "earth": 0.2,
            "mud": 0.2,
            "gravel": 0.2,
            "pebblestone": 0.2,
            "grass": 0.2,
            "grass_paver": 0.2,
            "stepping_stones": 0.2,
            "woodchips": 0.2,
            "sand": 0.15,
            "rock": 0.15,
        }
    ))

    smoothness_factor: Mapping[str, float] = field(default_factory=lambda: _m(
        {
            "excellent": 1.1,
            "good": 1,
            "intermediate": 0.7,
            "bad": 0.3,
            "very_bad": 0.2,
            "horrible": 0.15,
            "very_horrible": 0.1,
            "impassable": 0,
        }
    ))

    highway_factor: Mapping[str, float] = field(default_factory=lambda: _m(
        {
            "motorway": 0.1,
            "motorway_link": 0.1,
            "trunk": 0.15,
            "trunk_link": 0.15,
            "primary": 0.35,
            "primary_link": 0.35,
            "secondary": 0.65,
            "secondary_link": 0.65,
            "tertiary": 0.85,
            "tertiary_link": 0.85,
            "unclassified": 0.95,
            "road": 0.95,
            "residential": 1,
            "living_street": 1.1,
        }
    ))

    # descending-threshold lookup: first key <= proc_maxspeed wins
    maxspeed_factor: Mapping[int, float] = field(default_factory=lambda: _m(
        {20: 1.05, 30: 1, 50: 0.95, 60: 0.85, 70: 0.7, 100: 0.5}
    ))

    # weight of the highway*maxspeed factor per way type
    fac2_weight: Mapping[str, float] = field(default_factory=lambda: _m(
        {
            "bicycle road": 1,
            "shared road": 1,
            "shared traffic lane": 1,
            "cycle lane (advisory)": 0.7,
            "cycle lane (central)": 0.7,
            "shared bus lane": 0.7,
            "crossing": 0.7,
            "link": 0.7,
            "cycle lane (exclusive)": 0.5,
            "cycle lane (protected)": 0.2,
            "cycle track": 0.2,
            "shared path": 0.2,
            "segregated path": 0.2,
            "shared footway": 0.2,
            "track or service": 0,
            "cycle path": 0,
        }
    ))

    base_index: Mapping[str, int] = field(default_factory=lambda: _m(
        {
            "cycle path": 100,
            "cycle track": 90,
            "shared path": 70,
            "segregated path": 80,
            "shared footway": 50,
            "cycle lane (advisory)": 70,
            "cycle lane (exclusive)": 80,
            "cycle lane (protected)": 90,
            "cycle lane (central)": 60,
            "shared bus lane": 65,
            "bicycle road": 70,
            "shared road": 60,
            "shared traffic lane": 60,
            "track or service": 65,
            "link": 60,
            "crossing": 60,
        }
    ))

    motor_access_base_index: Mapping[str, int] = field(default_factory=lambda: _m(
        {
            "no": 100,
            "agricultural": 90,
            "forestry": 90,
            "agricultural;forestry": 90,
            "forestry;agricultural": 90,
            "private": 80,
            "customers": 80,
            "delivery": 80,
            "permit": 80,
            "destination": 70,
        }
    ))

    mandatory_traffic_signs: Sequence[str] = ("237", "240", "241")
    not_mandatory_traffic_signs: Sequence[str] = ("none", "1022")

    data_incompleteness_weight: Mapping[str, float] = field(default_factory=lambda: _m(
        {
            "width": 25,
            "surface": 30,
            "smoothness": 10,
            "width:lanes": 10,
            "parking": 25,
            "crossing": 10,
            "crossing_markings": 10,
            "maxspeed": 15,
            "lit": 15,
        }
    ))

    # surfaces ranked best -> worst (reference: definitions.py:119)
    surface_rank_order: Sequence[str] = (
        "asphalt",
        "paved",
        "concrete",
        "chipseal",
        "metal",
        "paving_stones",
        "compacted",
        "fine_gravel",
        "concrete:plates",
        "bricks",
        "sett",
        "cobblestone",
        "concrete:lanes",
        "unpaved",
        "wood",
        "unhewn_cobblestone",
        "ground",
        "dirt",
        "earth",
        "mud",
        "gravel",
        "pebblestone",
        "grass",
        "grass_paver",
        "stepping_stones",
        "woodchips",
        "sand",
        "rock",
    )

    # adjacent-road ranking for the sidepath highway-class argmax tie-break
    # (reference: cycling_quality_index.py:1577); None ranks last.
    highway_class_order: Sequence[object] = (
        "motorway",
        "motorway_link",
        "trunk",
        "trunk_link",
        "primary",
        "primary_link",
        "secondary",
        "secondary_link",
        "tertiary",
        "tertiary_link",
        "unclassified",
        "residential",
        "road",
        "living_street",
        "service",
        "pedestrian",
        None,
    )


DEFAULT_PARAMS = CQIParams()


# ---------------------------------------------------------------------------
# Input / output schemas
# ---------------------------------------------------------------------------

# OSM tag columns consumed by the pipeline (reference: parameter.py:270-464).
# All nullable strings.  Built programmatically instead of spelled out.
def _input_tag_columns() -> list[str]:
    cols = [
        "id", "layer", "highway", "name", "oneway", "oneway:bicycle",
        "segregated", "tracktype", "is_sidepath", "is_sidepath:of",
        "priority_road",
        "access", "vehicle", "motor_vehicle", "bicycle", "foot",
        "bicycle_road", "footway", "path", "bridleway", "informal",
        "maxspeed", "lit", "incline",
        "surface", "surface:bicycle", "smoothness", "smoothness:bicycle",
        "lanes", "width", "width:carriageway", "width:effective",
        "width:lanes", "width:lanes:forward", "width:lanes:backward",
        "lane_markings",
        "surface:colour", "traffic_sign",
        "footway:width",
        "cycleway:lanes", "cycleway:lanes:forward", "cycleway:lanes:backward",
        "vehicle:lanes", "bus:lanes", "psv:lanes",
        "crossing", "crossing:markings",
    ]
    for base in ("separation", "buffer"):
        cols += [base] + [f"{base}:{s}" for s in ("both", "left", "right")]
    cols += [f"traffic_mode:{s}" for s in ("both", "left", "right")]
    for s in ("both", "left", "right"):
        cols += [f"parking:{s}", f"parking:{s}:orientation", f"parking:{s}:width"]
    sw_subs = ("bicycle", "surface", "smoothness", "width", "oneway",
               "oneway:bicycle", "traffic_sign")
    for sub in sw_subs:
        cols.append(f"sidewalk:{sub}")
        cols += [f"sidewalk:{s}:{sub}" for s in ("both", "left", "right")]
    cw_subs = ("lane", "surface", "smoothness", "width", "oneway",
               "oneway:bicycle", "segregated", "foot", "traffic_sign")
    cols += ["cycleway"] + [f"cycleway:{s}" for s in ("both", "left", "right")]
    for sub in cw_subs:
        cols.append(f"cycleway:{sub}")
        cols += [f"cycleway:{s}:{sub}" for s in ("both", "left", "right")]
    for sub in ("separation", "buffer"):
        for prefix in ("cycleway", "cycleway:both", "cycleway:right", "cycleway:left"):
            cols.append(f"{prefix}:{sub}")
            cols += [f"{prefix}:{sub}:{s}" for s in ("left", "right", "both")]
    for prefix in ("cycleway", "cycleway:both", "cycleway:left", "cycleway:right"):
        cols += [f"{prefix}:traffic_mode:{s}" for s in ("left", "right", "both")]
    cols += ["cycleway:surface:colour", "cycleway:both:surface:colour",
             "cycleway:right:surface:colour", "cycleway:left:surface:colour"]
    # de-dup preserving order
    seen: set[str] = set()
    out = []
    for c in cols:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


INPUT_TAG_COLUMNS: tuple[str, ...] = tuple(_input_tag_columns())

# derived columns and their logical types (reference: cycling_quality_index.py:52-107)
DERIVED_COLUMNS: Mapping[str, str] = _m(
    {
        "way_type": "str",
        "index": "int",
        "index_10": "int",
        "stress_level": "int",
        "offset": "float",
        "type": "str",
        "side": "str",
        "proc_width": "float",
        "proc_surface": "str",
        "proc_smoothness": "str",
        "proc_oneway": "str",
        "proc_sidepath": "str",
        "proc_highway": "str",
        "proc_maxspeed": "int",
        "proc_traffic_mode_left": "str",
        "proc_traffic_mode_right": "str",
        "proc_separation_left": "str",
        "proc_separation_right": "str",
        "proc_buffer_left": "float",
        "proc_buffer_right": "float",
        "proc_mandatory": "str",
        "proc_traffic_sign": "str",
        "fac_width": "float",
        "fac_surface": "float",
        "fac_highway": "float",
        "fac_maxspeed": "float",
        "base_index": "int",
        "fac_1": "float",
        "fac_2": "float",
        "fac_3": "float",
        "fac_4": "float",
        "data_bonus": "str",
        "data_malus": "str",
        "data_incompleteness": "float",
        "data_missing": "str",
        "filter_usable": "int",
        "filter_way_type": "str",
    }
)

# columns kept in the final scores table (reference: parameter.py:467-519,
# minus the data_missing_* flags that the golden output does not carry)
OUTPUT_COLUMNS: tuple[str, ...] = (
    "id", "name", "way_type", "index", "index_10", "stress_level",
    "side", "offset",
    "proc_width", "proc_surface", "proc_smoothness", "proc_oneway",
    "proc_sidepath", "proc_highway", "proc_maxspeed",
    "proc_traffic_mode_left", "proc_traffic_mode_right",
    "proc_separation_left", "proc_separation_right",
    "proc_buffer_left", "proc_buffer_right",
    "proc_mandatory", "proc_traffic_sign",
    "fac_width", "fac_surface", "fac_highway", "fac_maxspeed",
    "base_index", "fac_1", "fac_2", "fac_3", "fac_4",
    "data_bonus", "data_malus", "data_incompleteness", "data_missing",
    "filter_usable", "filter_way_type",
)
