"""Vectorized way-type classification: the batch form of
``scoring.classify_way_type``.

The 16-way decision tree (reference: cycling_quality_index.py:367-476)
is evaluated as a sequence of boolean-mask rules over numpy object
arrays — one O(n) comparison per condition instead of a Python function
call per row.  Exactness is enforced by a differential test against the
row-wise implementation over the golden corpus, large synthetic ways and
randomized tag soup (tests/test_vector.py); the distributed scorer uses
this form to pre-classify and drop rows before the (row-wise, branchy)
attribute derivation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import scoring
from .params import CQIParams, DEFAULT_PARAMS

DROP = scoring.DROP


def _col(df: pd.DataFrame, name: str, n: int) -> np.ndarray:
    if name in df.columns:
        arr = df[name].to_numpy(dtype=object, copy=False)
        # normalize pandas NaN to None so equality semantics match dicts
        mask = pd.isna(arr)
        if mask.any():
            arr = arr.copy()
            arr[mask] = None
        return arr
    return np.full(n, None, dtype=object)


def _truthy(a: np.ndarray) -> np.ndarray:
    return (a != None) & (a != "")  # noqa: E711  (elementwise object compare)


def _isin(a: np.ndarray, values) -> np.ndarray:
    out = np.zeros(len(a), dtype=bool)
    for v in values:
        out |= a == v
    return out


def _coalesce_truthy(*arrays: np.ndarray) -> np.ndarray:
    out = arrays[0].copy()
    for nxt in arrays[1:]:
        need = ~_truthy(out)
        out[need] = nxt[need]
    return out


def _contains(a: np.ndarray, needle: str) -> np.ndarray:
    return pd.Series(a).str.contains(needle, regex=False, na=False).to_numpy()


def _num_col(df: pd.DataFrame, name: str, n: int) -> np.ndarray:
    """Column -> float64 array (NaN = unparsable/missing), matching
    ``tags.to_number`` exactly (incl. '1_000', 'inf', float passthrough) by
    mapping the few DISTINCT values through the scalar parser."""
    from . import tags as T

    vals = _col(df, name, n)
    lut = {v: T.to_number(v) for v in set(vals.tolist())}
    return np.array([np.nan if lut[v] is None else lut[v] for v in vals],
                    dtype=np.float64)


def _truthyf(x: np.ndarray) -> np.ndarray:
    """Python truthiness of a float-or-None: not None and not 0."""
    return ~np.isnan(x) & (x != 0)


def _lut(keys: np.ndarray, mapping, default=None) -> np.ndarray:
    """Vectorized dict.get over an object array."""
    return np.array([mapping.get(k, default) for k in keys], dtype=object)


def _lutf(keys: np.ndarray, mapping, default=np.nan) -> np.ndarray:
    """Vectorized dict.get -> float64 (None -> NaN)."""
    out = np.empty(len(keys), dtype=np.float64)
    for i, k in enumerate(keys):
        v = mapping.get(k, default)
        out[i] = np.nan if v is None else v
    return out


def classify_way_type_batch(df: pd.DataFrame,
                            p: CQIParams = DEFAULT_PARAMS) -> np.ndarray:
    """Return an object array of way types / ``scoring.DROP`` / None,
    exactly matching ``scoring.classify_way_type`` row for row."""
    n = len(df)
    c = lambda name: _col(df, name, n)

    highway = c("highway")
    bicycle = c("bicycle")
    side = c("side")
    foot = c("foot")
    segregated = c("segregated")
    is_sidepath = c("is_sidepath")
    lane_markings = c("lane_markings")

    result = np.full(n, None, dtype=object)
    undecided = np.ones(n, dtype=bool)

    def decide(mask: np.ndarray, value) -> None:
        nonlocal undecided
        hit = undecided & mask
        result[hit] = value
        undecided &= ~hit

    # --- filters (delete_if_no_access / delete_informal_paths) ---
    bike_access = _coalesce_truthy(bicycle, c("vehicle"), c("access"))
    decide(_truthy(bike_access)
           & ~_isin(bike_access, scoring.ALLOWED_BICYCLE_ACCESS), DROP)
    decide((highway == "path") & (c("informal") == "yes") & (bicycle == None),  # noqa: E711
           DROP)

    has_side = _truthy(side)
    decide((c("bicycle_road") == "yes") & ~has_side, "bicycle road")

    link_any = np.zeros(n, dtype=bool)
    crossing_any = np.zeros(n, dtype=bool)
    for key in scoring.LINK_OR_CROSSING_KEYS:
        link_any |= c(key) == "link"
        crossing_any |= c(key) == "crossing"
    decide(link_any, "link")
    decide(crossing_any, "crossing")

    decide(_isin(highway, scoring.FOOTWAY_FAMILY), "shared footway")

    is_path = highway == "path"
    decide(is_path & (foot == "designated") & (bicycle != "designated"),
           "shared footway")
    decide(is_path & (segregated == "yes"), "segregated path")
    decide(is_path, "shared path")

    # --- separation-by-mode (tags.separation_for_mode, vectorized) ---
    sep_left = c("separation:left")
    sep_right = c("separation:right")
    mode_left = c("traffic_mode:left")
    mode_right = c("traffic_mode:right")

    sep_foot = np.full(n, None, dtype=object)
    m = mode_left == "foot"
    sep_foot[m] = sep_left[m]
    m = ~_truthy(mode_right) | (mode_right == "foot")
    sep_foot[m] = sep_right[m]

    sep_motor = np.full(n, None, dtype=object)
    m = _isin(mode_right, ("motor_vehicle", "parking", "psv"))
    sep_motor[m] = sep_right[m]
    m = ~_truthy(mode_left) | _isin(mode_left, ("motor_vehicle", "parking", "psv"))
    sep_motor[m] = sep_left[m]

    motor_sep_set = ~(sep_motor == None) & ~_isin(sep_motor, ("no", "none"))  # noqa: E711
    motor_sep_kerbish = motor_sep_set & (
        _contains(sep_motor, "kerb") | _contains(sep_motor, "tree_row"))

    # --- highway == cycleway ---
    is_cw = highway == "cycleway"
    decide(is_cw & _isin(foot, ("yes", "designated", "permissive")), "shared path")
    decide(is_cw & (sep_foot == "no"), "segregated path")
    sp_unknown = ~_isin(is_sidepath, ("yes", "no"))
    decide(is_cw & sp_unknown & (c("proc_sidepath") == "yes"), "cycle track")
    decide(is_cw & sp_unknown, "cycle path")
    sp_yes = is_sidepath == "yes"
    decide(is_cw & sp_yes & motor_sep_kerbish, "cycle track")
    decide(is_cw & sp_yes & motor_sep_set, "cycle lane (protected)")
    decide(is_cw & sp_yes, "cycle track")
    decide(is_cw, "cycle path")

    decide(_isin(highway, ("service", "track")), "track or service")

    # --- center rows end here ---
    big_road = _isin(highway, ("motorway", "trunk", "primary", "secondary"))
    decide(~has_side & ((lane_markings == "yes")
                        | ((lane_markings != "yes") & big_road)),
           "shared traffic lane")
    decide(~has_side, "shared road")

    # --- fanned-out side rows only below ---
    decide(c("type") == "sidewalk", "shared footway")

    is_left = side == "left"

    def side_aware(base: str, sub: str = "") -> np.ndarray:
        suffix = f":{sub}" if sub else ""
        a = c(f"{base}{suffix}")
        b = c(f"{base}:both{suffix}")
        left = c(f"{base}:left{suffix}")
        right = c(f"{base}:right{suffix}")
        sided = np.where(is_left, left, right)
        return np.stack([a, b, sided])

    def side_any(stacked: np.ndarray, values) -> np.ndarray:
        out = np.zeros(n, dtype=bool)
        for row in stacked:
            out |= _isin(row, values)
        return out

    cw_family = side_aware("cycleway")
    lane_mask = side_any(cw_family, ("lane",))
    central = _contains(c("cycleway:lanes"), "no|lane|no")
    decide(lane_mask & central, "cycle lane (central)")
    decide(lane_mask & motor_sep_set, "cycle lane (protected)")
    decide(lane_mask & side_any(side_aware("cycleway", "lane"), ("exclusive",)),
           "cycle lane (exclusive)")
    decide(lane_mask, "cycle lane (advisory)")

    track_mask = side_any(cw_family, ("track",))
    decide(track_mask & side_any(side_aware("cycleway", "foot"),
                                 ("yes", "designated", "permissive")),
           "shared path")
    seg_family = side_aware("cycleway", "segregated")
    decide(track_mask & side_any(seg_family, ("yes",)), "segregated path")
    decide(track_mask & side_any(seg_family, ("no",)), "shared path")
    decide(track_mask & (sep_foot == "no"), "segregated path")
    decide(track_mask & motor_sep_kerbish, "cycle track")
    decide(track_mask & motor_sep_set, "cycle lane (protected)")
    decide(track_mask, "cycle track")

    decide(side_any(cw_family, ("share_busway",)), "shared bus lane")
    decide(side_any(side_aware("sidewalk", "bicycle"), ("yes",)),
           "shared footway")

    decide((lane_markings == "yes")
           | ((lane_markings != "yes") & _isin(highway, ("primary", "secondary"))),
           "shared traffic lane")
    decide(np.ones(n, dtype=bool), "shared road")
    return result


def derive_oneway_batch(df: pd.DataFrame, way_types: np.ndarray,
                        p: CQIParams = DEFAULT_PARAMS) -> np.ndarray:
    """Vectorized ``scoring.derive_oneway`` (reference:
    cycling_quality_index.py:479-525): the oneway cascade as mask rules."""
    n = len(df)
    c = lambda name: _col(df, name, n)
    wt = np.asarray(way_types, dtype=object)
    oneway = c("oneway")
    ob = c("oneway:bicycle")
    cw = c("cycleway:oneway")
    side = c("side")

    res = np.full(n, None, dtype=object)
    und = np.ones(n, dtype=bool)

    def decide(mask, value):
        nonlocal und
        hit = und & mask
        if isinstance(value, np.ndarray):
            res[hit] = value[hit]
        else:
            res[hit] = value
        und &= ~hit

    ov_oneway = _isin(oneway, scoring.ONEWAY_VALUES)
    cyc = _isin(wt, scoring.CYCLE_ONEWAY_TYPES)
    decide(cyc & ov_oneway, oneway)
    decide(cyc & _isin(cw, scoring.ONEWAY_VALUES), cw)
    decide(cyc & _isin(wt, ("cycle track", "shared path", "shared footway"))
           & _truthy(side), p.default_oneway_cycle_track)
    decide(cyc & _isin(wt, ("cycle lane (advisory)", "cycle lane (exclusive)",
                            "cycle lane (protected)", "cycle lane (central)")),
           p.default_oneway_cycle_lane)
    decide(cyc & _isin(ob, scoring.ONEWAY_VALUES), ob)
    decide(cyc, "no")

    decide(wt == "shared bus lane", "yes")

    shared = _isin(wt, ("shared road", "shared traffic lane", "bicycle road",
                        "track or service"))
    same = ~_truthy(ob) | (oneway == ob)
    decide(shared & same & ov_oneway, oneway)
    decide(shared & same, "no")
    suffixed = np.full(n, None, dtype=object)
    m = ov_oneway
    suffixed[m] = np.array([f"{o}_motor_vehicles" for o in oneway[m]],
                           dtype=object)
    ob_no = ob == "no"
    decide(shared & ob_no & ov_oneway, suffixed)
    decide(shared & ob_no, "no")
    decide(shared, "yes")

    res[~_truthy(res)] = "unknown"
    return res


def derive_surface_smoothness_batch(df: pd.DataFrame, way_types: np.ndarray,
                                    p: CQIParams = DEFAULT_PARAMS):
    """Vectorized ``scoring.derive_surface`` + ``derive_smoothness``
    (reference: cycling_quality_index.py:900-973).  Returns
    (proc_surface, surface_missing, proc_smoothness, smoothness_missing)
    arrays.  Rows needing the weakest-of-';'-list reduction (rare) fall
    back to the scalar kernel."""
    n = len(df)
    c = lambda name: _col(df, name, n)
    wt = np.asarray(way_types, dtype=object)

    surface = c("surface")
    surface_bicycle = c("surface:bicycle")
    cw_surface = c("cycleway:surface")
    highway = c("highway")
    tracktype = c("tracktype")

    # --- surface ---
    proc = np.full(n, None, dtype=object)
    from_bicycle = np.zeros(n, dtype=bool)
    sb_valid = _isin(surface_bicycle, tuple(p.surface_factor))
    proc[sb_valid] = surface_bicycle[sb_valid]
    sb_list = ~sb_valid & _truthy(surface_bicycle) & _contains(surface_bicycle, ";")
    for i in np.nonzero(sb_list)[0]:
        from . import tags as T

        proc[i] = T.weakest_surface(T.split_values(surface_bicycle[i], ";"),
                                    p.surface_rank_order)
    from_bicycle = _truthy(proc)

    seg = wt == "segregated path"
    base = np.where(seg & _truthy(cw_surface), cw_surface, surface)
    need = ~from_bicycle
    missing_surface = need & ~_truthy(base)

    track_srv = wt == "track or service"
    default = np.full(n, None, dtype=object)
    tt_map = dict(p.surface_tracktype_default)
    hw_map = dict(p.surface_highway_default)
    default[track_srv] = [tt_map.get(t, tt_map["grade3"])
                          for t in tracktype[track_srv]]
    default[~track_srv] = [hw_map.get(h, hw_map["path"])
                           for h in highway[~track_srv]]

    out_surface = proc.copy()
    use_base = need & _truthy(base)
    out_surface[use_base] = base[use_base]
    out_surface[missing_surface] = default[missing_surface]

    # weakest-of-list + validity (only on non-bicycle-derived rows)
    listy = need & _contains(out_surface, ";")
    for i in np.nonzero(listy)[0]:
        from . import tags as T

        out_surface[i] = T.weakest_surface(
            T.split_values(out_surface[i], ";"), p.surface_rank_order)
    invalid = need & ~_isin(out_surface, tuple(p.surface_factor))
    out_surface[invalid] = None

    # --- smoothness ---
    smoothness = c("smoothness")
    sm_bicycle = c("smoothness:bicycle")
    cw_smoothness = c("cycleway:smoothness")
    out_smooth = np.full(n, None, dtype=object)
    smb_valid = _isin(sm_bicycle, tuple(p.smoothness_factor))
    out_smooth[smb_valid] = sm_bicycle[smb_valid]
    rest = ~smb_valid
    base_sm = np.where(seg & _truthy(cw_smoothness), cw_smoothness, smoothness)
    out_smooth[rest] = base_sm[rest]
    missing_smooth = rest & ~_truthy(base_sm) & ~from_bicycle
    bad_sm = ~_isin(out_smooth, tuple(p.smoothness_factor))
    out_smooth[bad_sm] = None
    return out_surface, missing_surface, out_smooth, missing_smooth


def _fill_lr(both: np.ndarray, left: np.ndarray, right: np.ndarray):
    """Vectorized tags.fill_left_right ('X:both' fills missing sides)."""
    has_both = _truthy(both)
    left = left.copy()
    right = right.copy()
    m = has_both & ~_truthy(left)
    left[m] = both[m]
    m = has_both & ~_truthy(right)
    right[m] = both[m]
    return left, right


def derive_traffic_modes_batch(df: pd.DataFrame, way_types: np.ndarray,
                               p: CQIParams = DEFAULT_PARAMS):
    """Vectorized ``scoring.derive_traffic_modes`` (reference:
    cycling_quality_index.py:976-1090).  Returns (mode_left, mode_right)."""
    n = len(df)
    c = lambda name: _col(df, name, n)
    wt = np.asarray(way_types, dtype=object)

    ml, mr = _fill_lr(c("traffic_mode:both"), c("traffic_mode:left"),
                      c("traffic_mode:right"))
    pl, pr = _fill_lr(c("parking:both"), c("parking:left"), c("parking:right"))
    side = c("side")
    sp_yes = c("proc_sidepath") == "yes"

    central = wt == "cycle lane (central)"

    lane_group = _isin(wt, ("cycle lane (advisory)", "cycle lane (exclusive)",
                            "cycle lane (protected)", "cycle lane (central)"))
    sidepath_types = _isin(wt, ("cycle track", "shared path",
                                "segregated path", "shared footway"))
    park_allowed = (((side == "right") & _truthy(pr) & (pr != "no"))
                    | ((side == "left") & _truthy(pl) & (pl != "no")))

    # left default (uses the ORIGINAL right mode, as the scalar does)
    left_need = ~_truthy(ml)
    left_def = np.full(n, None, dtype=object)
    und = np.ones(n, dtype=bool)

    def set_def(target, mask, value):
        nonlocal und
        hit = und & mask
        target[hit] = value
        und &= ~hit

    set_def(left_def, wt == "cycle path", "no")
    sp_side = sidepath_types & sp_yes
    set_def(left_def, sp_side & park_allowed & (mr != "parking"), "parking")
    set_def(left_def, sp_side, "motor_vehicle")
    set_def(left_def, lane_group | _isin(wt, ("shared road",
                                              "shared traffic lane",
                                              "shared bus lane", "crossing")),
            "motor_vehicle")
    out_left = ml.copy()
    # a default only replaces the tag when one exists: the scalar keeps a
    # falsy-but-present '' when no branch matches
    m = left_need & (left_def != None)  # noqa: E711
    out_left[m] = left_def[m]
    out_left[central] = "motor_vehicle"  # central overrides tags entirely

    # right default (uses the FINAL left mode)
    right_need = ~_truthy(mr)
    right_def = np.full(n, None, dtype=object)
    und = np.ones(n, dtype=bool)
    set_def(right_def, wt == "cycle path", "no")
    set_def(right_def, wt == "crossing", "motor_vehicle")
    lane_nc = lane_group & ~central
    set_def(right_def, lane_nc & park_allowed & (out_left != "parking"),
            "parking")
    set_def(right_def, lane_nc, "foot")
    set_def(right_def, sp_side, "foot")
    out_right = mr.copy()
    m = right_need & (right_def != None)  # noqa: E711
    out_right[m] = right_def[m]
    out_right[central] = "motor_vehicle"
    return out_left, out_right


def derive_separation_buffer_batch(df: pd.DataFrame, mode_left: np.ndarray,
                                   mode_right: np.ndarray,
                                   p: CQIParams = DEFAULT_PARAMS):
    """Vectorized ``derive_separation`` + ``derive_buffer`` (reference:
    cycling_quality_index.py:1010-1056).  Returns
    (sep_left, sep_right, buf_left, buf_right)."""
    n = len(df)
    c = lambda name: _col(df, name, n)
    motorish_l = _isin(mode_left, ("motor_vehicle", "psv", "parking"))
    motor_r = mode_right == "motor_vehicle"

    sep = c("separation")
    sl, sr = _fill_lr(c("separation:both"), c("separation:left"),
                      c("separation:right"))
    has = _truthy(sep)
    if p.right_hand_traffic:
        m = has & motorish_l & ~_truthy(sl)
        sl[m] = sep[m]
        m = has & ~motorish_l & motor_r & ~_truthy(sr)
        sr[m] = sep[m]
    else:  # pragma: no cover - parameterized variant
        motorish_r = _isin(mode_right, ("motor_vehicle", "psv", "parking"))
        motor_l = mode_left == "motor_vehicle"
        m = has & motorish_r & ~_truthy(sr)
        sr[m] = sep[m]
        m = has & ~motorish_r & motor_l & ~_truthy(sl)
        sl[m] = sep[m]
    sl[~_truthy(sl)] = "no"
    sr[~_truthy(sr)] = "no"

    buf = _num_col(df, "buffer", n)
    bl, br = _num_col(df, "buffer:left", n), _num_col(df, "buffer:right", n)
    bb = _num_col(df, "buffer:both", n)
    has_bb = ~np.isnan(bb) & (bb != 0)
    m = has_bb & (np.isnan(bl) | (bl == 0))
    bl[m] = bb[m]
    m = has_bb & (np.isnan(br) | (br == 0))
    br[m] = bb[m]
    has_buf = ~np.isnan(buf) & (buf != 0)
    if p.right_hand_traffic:
        m = has_buf & motorish_l & (np.isnan(bl) | (bl == 0))
        bl[m] = buf[m]
        m = has_buf & ~motorish_l & motor_r & (np.isnan(br) | (br == 0))
        br[m] = buf[m]
    else:  # mirror of derive_buffer's left-hand-traffic branch
        motorish_r = _isin(mode_right, ("motor_vehicle", "psv", "parking"))
        motor_l = mode_left == "motor_vehicle"
        m = has_buf & motorish_r & (np.isnan(br) | (br == 0))
        br[m] = buf[m]
        m = has_buf & ~motorish_r & motor_l & (np.isnan(bl) | (bl == 0))
        bl[m] = buf[m]
    return sl, sr, bl, br
