"""Scalar OSM tag-algebra helpers.

Semantics mirror the reference's tag helpers (/root/reference/definitions.py)
with the QGIS-NULL convention mapped onto Python ``None``: a missing value is
``None`` and *falsy* values ('' / 0 / None) all count as "not set" wherever
the reference used ``if not value``.

These run per value; the batch kernels in :mod:`cqi_ray.scoring` call them
row-wise inside ``map_batches``.  They are deliberately allocation-free and
branch-only so PyPy/C-level string ops dominate.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

# access fallback chains per traffic mode (reference: definitions.py:54-64)
_ACCESS_CHAIN: Mapping[str, tuple[str, ...]] = {
    "foot": ("access",),
    "vehicle": ("access",),
    "bicycle": ("vehicle", "access"),
    "motor_vehicle": ("vehicle", "access"),
    "motorcar": ("motor_vehicle", "vehicle", "access"),
    "hgv": ("motor_vehicle", "vehicle", "access"),
    "psv": ("motor_vehicle", "vehicle", "access"),
    "bus": ("psv", "motor_vehicle", "vehicle", "access"),
}


def to_number(value) -> Optional[float]:
    """str/number -> float, None when unparsable (reference: definitions.py:77-86)."""
    if value is None:
        return None
    try:
        return float(value)
    except (TypeError, ValueError):
        return None


def coalesce_tag(row: Mapping, attr: str, prefix: str, side: str, vartype: str):
    """``{prefix}:{side}:{attr}`` -> ``{prefix}:both:{attr}`` -> ``{prefix}:{attr}``
    with a safe cast; None on cast failure (reference: definitions.py:4-21)."""
    value = row.get(f"{prefix}:{side}:{attr}")
    if not value:
        value = row.get(f"{prefix}:both:{attr}")
    if not value:
        value = row.get(f"{prefix}:{attr}")
    if value is not None:
        try:
            if vartype == "int":
                value = int(value)
            elif vartype == "float":
                value = float(value)
            elif vartype == "str":
                value = str(value)
        except (TypeError, ValueError):
            value = None
    return value


def separation_for_mode(row: Mapping, traffic_mode: str):
    """Separation value on the side where ``traffic_mode`` runs
    (foot defaults to the right side, motor traffic to the left;
    reference: definitions.py:26-49)."""
    separation = None
    separation_left = row.get("separation:left")
    separation_right = row.get("separation:right")
    mode_left = row.get("traffic_mode:left")
    mode_right = row.get("traffic_mode:right")

    if traffic_mode == "foot":
        if mode_left == "foot":
            separation = separation_left
        if not mode_right or mode_right == "foot":
            separation = separation_right
    elif traffic_mode == "motor_vehicle":
        if mode_right in ("motor_vehicle", "parking", "psv"):
            separation = separation_right
        if not mode_left or mode_left in ("motor_vehicle", "parking", "psv"):
            separation = separation_left
    return separation


def access_value(row: Mapping, mode: str):
    """Access for a traffic mode with hierarchy fallback
    (reference: definitions.py:54-72)."""
    value = row.get(mode)
    if not value:
        for key in _ACCESS_CHAIN.get(mode, ()):
            value = row.get(key)
            if value:
                break
    return value


def split_values(value_string: str, delimiter: str, vartype: str = "str") -> list:
    """Split a delimited tag value; numeric modes map '' -> 0
    (reference: definitions.py:91-112)."""
    out = []
    for part in str(value_string).split(delimiter):
        if vartype in ("float", "int"):
            if part == "" or part is None:
                part = 0
            out.append(float(part) if vartype == "float" else int(part))
        else:
            out.append(part)
    return out


def weakest_surface(values: Sequence[str], rank_order: Sequence[str]) -> Optional[str]:
    """Worst-ranked surface out of a list (reference: definitions.py:117-129)."""
    worst = None
    worst_rank = -1
    for v in values:
        try:
            rank = rank_order.index(v)
        except ValueError:
            continue
        if worst is None or rank > worst_rank:
            worst, worst_rank = v, rank
    return worst


def effective_maxspeed(maxspeed, highway) -> Optional[float]:
    """'walk' -> 10, 'none' -> 299, living_street default 10, else numeric
    (reference: cycling_quality_index.py:157-165)."""
    if maxspeed == "walk" or (not maxspeed and highway == "living_street"):
        return 10
    if maxspeed == "none":
        return 299
    return to_number(maxspeed)


def fill_left_right(both, left, right):
    """'X:both' fills missing left/right (reference: cycling_quality_index.py:593-597)."""
    if both:
        left = left or both
        right = right or both
    return left, right
