"""Vectorized width derivation, mandatory-use and index/LTS finalization —
the batch forms of ``scoring.derive_width`` / ``derive_mandatory`` and the
factor/index/bonus-malus section of ``scoring.score_row``.

Together with :mod:`cqi_ray.vector` (classification, oneway,
surface/smoothness, traffic modes, separation/buffer) this makes the
whole CQI scorer mask-rule vectorized: one O(n) numpy pass per condition
instead of a Python rule-engine call per row (reference semantics:
/root/reference/cycling_quality_index.py:569-897, 1093-1136, 1210-1434).
Exactness is enforced by a differential test against ``scoring.score_row``
over the golden corpus, synthetic grids and randomized tag soup
(tests/test_vector_score.py) plus the 164-row golden match itself.

Bug-for-bug notes preserved from the scalar form:
* 'segregated path' on highway=path without usable widths appends
  'width' TWICE to data_missing ("width;width").
* a computed shared-road width of exactly 0 becomes None (``or None``).
* ``data_incompleteness`` accumulates weights in append order (float sum
  order is part of the observable result).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from . import scoring
from .params import CQIParams, DEFAULT_PARAMS
from .vector import (_col, _contains, _isin, _lut, _lutf, _num_col, _truthy,
                     _truthyf)

_E = math.e


def _fill_lr_obj(both, left, right):
    has = _truthy(both)
    left = left.copy()
    right = right.copy()
    m = has & ~_truthy(left)
    left[m] = both[m]
    m = has & ~_truthy(right)
    right[m] = both[m]
    return left, right


def _fill_lr_num(both, left, right):
    has = _truthyf(both)
    left = left.copy()
    right = right.copy()
    m = has & ~_truthyf(left)
    left[m] = both[m]
    m = has & ~_truthyf(right)
    right[m] = both[m]
    return left, right


def _num0(x: np.ndarray) -> np.ndarray:
    """to_number(...) or 0  ->  NaN becomes 0."""
    return np.where(np.isnan(x), 0.0, x)


# the width-factor "shared with motor traffic" set is the 5-type tuple
# (scoring._width_factor's inline list) — one wider than MOTOR_WAY_TYPES,
# which drives the base-index override and the restricted bonus
_SHARED5 = scoring.MOTOR_WAY_TYPES + ("shared bus lane",)


def _pyround(x: np.ndarray, nd: int) -> np.ndarray:
    """Element-wise CPython round(x, nd) — np.round's scale/rint/unscale
    can differ by one ulp-of-decimal from Python's correctly-rounded
    decimal rounding (e.g. values ending in ...75), and the scalar engine's
    stored factors are Python-rounded."""
    return np.array([round(float(v), nd) for v in x], dtype=np.float64)


def _obj_num(vals: np.ndarray) -> np.ndarray:
    """Object array (strings/floats/None) -> float64 via tags.to_number."""
    from . import tags as T

    out = np.empty(len(vals), dtype=np.float64)
    lut: dict = {}
    for i, v in enumerate(vals):
        if v not in lut:
            n = T.to_number(v)
            lut[v] = np.nan if n is None else n
        out[i] = lut[v]
    return out


def _last_pipe_num(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(has_pipe mask, to_number of the substring after the LAST '|')."""
    s = pd.Series(vals, dtype=object)
    has = s.str.contains("|", regex=False, na=False).to_numpy(dtype=bool)
    nums = np.full(len(vals), np.nan)
    if has.any():
        tails = s[has].str.rsplit("|", n=1).str[-1].to_numpy(dtype=object)
        nums[has] = _obj_num(tails)
    return has, nums


def _parking_side_width(status, raw_w, orient, p: CQIParams) -> np.ndarray:
    """Vectorized scoring._one_side_parking_width."""
    w = raw_w.copy()
    need_def = _isin(status, ("lane", "half_on_kerb")) & ~_truthyf(w)
    dflt = np.full(len(w), p.width_parking_parallel)
    dflt[orient == "diagonal"] = p.width_parking_diagonal
    dflt[orient == "perpendicular"] = p.width_parking_perpendicular
    w[need_def] = dflt[need_def]
    half = status == "half_on_kerb"
    w[half] = w[half] / 2
    return _num0(w)  # `width or 0`


def _cycleway_lane_widths_batch(df: pd.DataFrame, oneways: np.ndarray,
                                n: int, p: CQIParams):
    """Vectorized scoring._cycleway_lane_widths.  Returns
    (cw_left, cw_right, w_left_num, w_right_num)."""
    c = lambda name: _col(df, name, n)
    cw = c("cycleway")
    cwl, cwr = c("cycleway:left").copy(), c("cycleway:right").copy()
    cwb = c("cycleway:both")
    twoway = oneways == "no"  # proc_oneway is always a non-empty string

    has_cw = _truthy(cw)
    m = has_cw & ~_truthy(cwr)
    cwr[m] = cw[m]
    m = has_cw & twoway & ~_truthy(cwl)
    cwl[m] = cw[m]
    has_cwb = _truthy(cwb)
    m = has_cwb & ~_truthy(cwr)
    cwr[m] = cwb[m]
    m = has_cwb & ~_truthy(cwl)
    cwl[m] = cwb[m]

    w = c("cycleway:width")
    wl, wr = c("cycleway:left:width").copy(), c("cycleway:right:width").copy()
    wb = c("cycleway:both:width")
    lane_any = (cwr == "lane") | (cwl == "lane")
    has_w = _truthy(w)
    m = lane_any & has_w & ~_truthy(wr)
    wr[m] = w[m]
    m = lane_any & has_w & twoway & ~_truthy(wl)
    wl[m] = w[m]
    has_wb = _truthy(wb)
    m = lane_any & has_wb & ~_truthy(wr)
    wr[m] = wb[m]
    m = lane_any & has_wb & ~_truthy(wl)
    wl[m] = wb[m]

    wr_num = _obj_num(wr)
    wl_num = _obj_num(wl)
    # default lane width where the tag chain stayed empty (string truthiness)
    m = (cwr == "lane") & ~_truthy(wr)
    wr_num[m] = p.width_cycle_lane
    m = (cwl == "lane") & ~_truthy(wl)
    wl_num[m] = p.width_cycle_lane
    return cwl, cwr, _num0(wl_num), _num0(wr_num)


def _buffer_lookup_batch(df: pd.DataFrame, n: int, lane_side: str,
                         buffer_side: str) -> np.ndarray:
    """Vectorized scoring._buffer_lookup -> to_number-or-0 floats."""
    c = lambda name: _col(df, name, n)
    out = np.full(n, None, dtype=object)
    for key in (
        f"cycleway:{lane_side}:buffer:{buffer_side}",
        f"cycleway:{lane_side}:buffer:both",
        f"cycleway:{lane_side}:buffer",
        f"cycleway:both:buffer:{buffer_side}",
        "cycleway:both:buffer:both",
        "cycleway:both:buffer",
        f"cycleway:buffer:{buffer_side}",
        "cycleway:buffer:both",
        "cycleway:buffer",
    ):
        need = ~_truthy(out)
        if not need.any():
            break
        vals = c(key)
        out[need] = vals[need]
    return _num0(_obj_num(out))


def derive_width_batch(df: pd.DataFrame, way_types: np.ndarray,
                       oneways: np.ndarray, p: CQIParams = DEFAULT_PARAMS):
    """Vectorized ``scoring.derive_width``.  Returns
    (width float array [NaN = None], and the data_missing flags in append
    order: miss_width_lanes, miss_width_1, miss_width_2, miss_parking)."""
    n = len(df)
    c = lambda name: _col(df, name, n)
    wt = np.asarray(way_types, dtype=object)
    ow = np.asarray(oneways, dtype=object)
    ow_yes = _contains(ow, "yes")
    ow_no = ow == "no"

    width_out = np.full(n, np.nan)
    m_wlanes = np.zeros(n, dtype=bool)
    m_w1 = np.zeros(n, dtype=bool)
    m_w2 = np.zeros(n, dtype=bool)
    m_park = np.zeros(n, dtype=bool)

    cw_w = _num_col(df, "cycleway:width", n)
    w_tag = _num_col(df, "width", n)
    highway = c("highway")

    # --- dedicated lane/path family ---
    A = _isin(wt, (
        "cycle path", "cycle track", "shared path", "shared footway",
        "crossing", "link", "cycle lane (advisory)", "cycle lane (exclusive)",
        "cycle lane (protected)", "cycle lane (central)"))
    a_w = np.where(_truthyf(cw_w), cw_w, w_tag)
    d_path = p.default_highway_width.get("path")
    d_foot = p.default_highway_width.get("footway")
    d_cw = p.default_highway_width.get("cycleway")
    dA = np.full(n, d_cw)
    dA[_isin(wt, ("cycle path", "shared path", "cycle lane (protected)"))] = d_path
    dA[wt == "shared footway"] = d_foot
    dA = np.where(ow_no, dA * 1.6, dA)
    width_out[A] = a_w[A]
    needA = A & ~_truthyf(a_w)
    width_out[needA] = dA[needA]
    m_w1 |= needA

    # --- segregated path ---
    B = wt == "segregated path"
    B1 = B & (highway == "path")
    b1_done = B1 & _truthyf(cw_w)
    width_out[b1_done] = cw_w[b1_done]
    B1r = B1 & ~_truthyf(cw_w)
    fw_w = _num_col(df, "footway:width", n)
    comp = np.where(_truthyf(fw_w), w_tag - fw_w, w_tag / 2)
    bw = np.where(B1r & _truthyf(w_tag), comp, np.nan)
    m_w1 |= B1r
    B2 = B & (highway != "path")
    bw = np.where(B2, w_tag, bw)
    width_out[B1r | B2] = bw[B1r | B2]
    needB = (B1r | B2) & ~_truthyf(bw)
    dB = np.where(ow_no, d_path * 1.6, d_path)
    width_out[needB] = dB[needB]
    m_w1 |= B2 & needB
    m_w2 |= B1r & needB

    # --- shared motor-traffic family ---
    C = _isin(wt, ("shared road", "shared traffic lane", "shared bus lane",
                   "bicycle road", "track or service"))
    if C.any():
        stl = wt == "shared traffic lane"
        sbl = wt == "shared bus lane"
        side = c("side")
        wl_has, wl_num = _last_pipe_num(c("width:lanes"))
        wlf_has, wlf_num = _last_pipe_num(c("width:lanes:forward"))
        wlb_has, wlb_num = _last_pipe_num(c("width:lanes:backward"))

        pw = np.full(n, np.nan)
        c1 = C & (stl | sbl)
        und = c1.copy()

        def take(mask, values):
            nonlocal und
            hit = und & mask
            pw[hit] = values[hit] if isinstance(values, np.ndarray) else values
            und &= ~hit

        take((ow_yes | ~sbl) & wl_has, wl_num)
        take(sbl & ~ow_yes & (side == "right") & wlf_has, wlf_num)
        take(sbl & ~ow_yes & (side == "left") & wlb_has, wlb_num)
        take(sbl, p.width_bus_lane)
        m_wlanes |= und  # remaining shared-traffic-lane rows: default + flag
        pw[und] = p.width_traffic_lane
        c1_done = c1 & _truthyf(pw)
        width_out[c1_done] = pw[c1_done]
        rem = C & ~c1_done

        we = _num_col(df, "width:effective", n)
        c2_done = rem & _truthyf(we)
        width_out[c2_done] = we[c2_done]
        rem &= ~c2_done

        lanes = _num_col(df, "lanes", n)
        pw3 = np.where(~_truthyf(w_tag) & _truthyf(lanes),
                       lanes * p.width_traffic_lane, np.nan)
        c3_done = rem & _truthyf(pw3)
        width_out[c3_done] = pw3[c3_done]
        rem &= ~c3_done

        # full carriageway arithmetic
        pl, pr = _fill_lr_obj(c("parking:both"), c("parking:left"),
                              c("parking:right"))
        ol, orr = _fill_lr_obj(c("parking:both:orientation"),
                               c("parking:left:orientation"),
                               c("parking:right:orientation"))
        pwl_raw, pwr_raw = _fill_lr_num(
            _num_col(df, "parking:both:width", n),
            _num_col(df, "parking:left:width", n),
            _num_col(df, "parking:right:width", n))
        park_l_w = _parking_side_width(pl, pwl_raw, ol, p)
        park_r_w = _parking_side_width(pr, pwr_raw, orr, p)
        cwl_s, cwr_s, cwl_w, cwr_w = _cycleway_lane_widths_batch(
            df, ow, n, p)

        wbase = w_tag.copy()
        needw = rem & ~_truthyf(w_tag)
        hw_def = _lutf(highway, p.default_highway_width,
                       p.default_highway_width_fallback)
        hw_def = np.where(ow_yes, _pyround(hw_def / 1.6, 1), hw_def)
        wbase[needw] = hw_def[needw]
        m_w1 |= needw
        m_park |= rem & (wt == "shared road") & ~_truthy(pl) & ~_truthy(pr)

        buffer_total = np.zeros(n)
        lane_r = cwr_s == "lane"
        lane_l = cwl_s == "lane"
        if lane_r.any():
            buffer_total += np.where(
                lane_r, _buffer_lookup_batch(df, n, "right", "left")
                + _buffer_lookup_batch(df, n, "right", "right"), 0.0)
        if lane_l.any():
            buffer_total += np.where(
                lane_l, _buffer_lookup_batch(df, n, "left", "left")
                + _buffer_lookup_batch(df, n, "left", "right"), 0.0)

        pw4 = wbase - cwr_w - cwl_w - buffer_total
        has_park = _truthy(pl) | _truthy(pr)
        pw4 = np.where(has_park, pw4 - park_r_w - park_l_w, pw4)
        cap = np.where(~ow_yes, 5.5, 4.0)
        pw4 = np.where(~has_park & (wt == "shared road"),
                       np.minimum(pw4, cap), pw4)
        pw4 = np.where((pw4 < p.width_traffic_lane) & needw,
                       p.width_traffic_lane, pw4)
        pw4 = np.where(pw4 == 0, np.nan, pw4)  # `proc_width or None`
        width_out[rem] = pw4[rem]

    return width_out, m_wlanes, m_w1, m_w2, m_park


def derive_mandatory_batch(df: pd.DataFrame, way_types: np.ndarray,
                           oneways: np.ndarray,
                           p: CQIParams = DEFAULT_PARAMS):
    """Vectorized ``scoring.derive_mandatory`` (signs path disabled, as in
    the scalar default).  Returns (proc_mandatory, proc_traffic_sign)."""
    n = len(df)
    c = lambda name: _col(df, name, n)
    wt = np.asarray(way_types, dtype=object)
    ow_yes = _contains(np.asarray(oneways, dtype=object), "yes")
    cw, cwb, cwr = c("cycleway"), c("cycleway:both"), c("cycleway:right")
    bicycle = c("bicycle")

    res = np.full(n, None, dtype=object)
    motor = _isin(wt, scoring.MOTOR_WAY_TYPES)
    lane_bus = ("lane", "share_busway")
    use = _isin(cw, lane_bus) | _isin(cwb, lane_bus) \
        | (ow_yes & _isin(cwr, lane_bus))
    opt = (cw == "track") | (cwb == "track") | (ow_yes & (cwr == "track"))
    res[motor & ~use & opt] = "optional_sidepath"
    res[motor & use] = "use_sidepath"
    bike_over = motor & _isin(bicycle, ("use_sidepath", "optional_sidepath"))
    res[bike_over] = bicycle[bike_over]
    proh = _isin(c("highway"), tuple(p.cycling_highway_prohibition)) \
        | (bicycle == "no")
    res[proh] = "prohibited"
    return res, c("traffic_sign")


def finalize_batch(df: pd.DataFrame, p: CQIParams, wt: np.ndarray,
                   ow: np.ndarray, width: np.ndarray,
                   miss_flags: tuple, surf: np.ndarray,
                   surf_miss: np.ndarray, smooth: np.ndarray,
                   smooth_miss: np.ndarray, ml: np.ndarray, mr: np.ndarray,
                   bl: np.ndarray, br: np.ndarray) -> dict:
    """Vectorized factor/index/LTS/bonus-malus section of
    ``scoring.score_row`` (everything after the proc_* derivation).
    Returns a dict of output arrays."""
    n = len(df)
    c = lambda name: _col(df, name, n)
    m_wlanes, m_w1, m_w2, m_park = miss_flags
    ow_yes = _contains(ow, "yes")

    motor_access = c("motor_vehicle").copy()
    for key in ("vehicle", "access"):
        need = ~_truthy(motor_access)
        motor_access[need] = c(key)[need]

    is_motor_wt = _isin(wt, scoring.MOTOR_WAY_TYPES)
    restricted = _isin(motor_access, tuple(p.motor_access_base_index))

    base = _lutf(wt, p.base_index)
    override = _lutf(motor_access, p.motor_access_base_index)
    m = is_motor_wt & ~np.isnan(override)
    base[m] = override[m]

    # --- fac_width ---
    shared5 = _isin(wt, _SHARED5)
    dedicated = ~shared5 | (motor_access == "no")
    cw_ = width.copy()
    m = dedicated & _truthyf(cw_) & ~ow_yes
    cw_[m] = cw_[m] / 1.6
    nd = ~dedicated & _truthyf(cw_)
    stl = wt == "shared traffic lane"
    sbl = wt == "shared bus lane"
    m = nd & stl
    cw_[m] = np.maximum(cw_[m] - 2 + ((4.5 - cw_[m]) / 3), 0)
    m = nd & sbl
    cw_[m] = np.maximum(cw_[m] - 3 + ((5.5 - cw_[m]) / 3), 0)
    m = nd & ~stl & ~sbl
    cw_[m] = np.where(~ow_yes[m], cw_[m] / 1.6, cw_[m]) - 2

    has_cw = _truthyf(cw_)
    cwx = np.maximum(0.001, np.where(has_cw, cw_, np.nan))
    low = (cwx <= 3) | shared5
    fw = np.where(low, 1.1 / (1 + 20 * _E ** (-2.1 * cwx)),
                  2 / (1 + 1.8 * _E ** (-0.24 * cwx)))
    m = is_motor_wt & restricted
    fw[m] = fw[m] + ((1 - fw[m]) / 2)
    fw = np.where(~dedicated, np.maximum(fw, 0.25), fw)
    fac_width = np.where(has_cw, _pyround(fw, 3), np.nan)

    # --- fac_surface ---
    fs_sm = _lutf(smooth, p.smoothness_factor)
    fs_su = _lutf(surf, p.surface_factor)
    fac_surface = np.where(np.isnan(fs_sm), fs_su, fs_sm)

    proc_highway = c("proc_highway")
    proc_maxspeed = _num_col(df, "proc_maxspeed", n)
    is_sidepath = c("proc_sidepath")

    fac_highway = _lutf(proc_highway, p.highway_factor, 1)
    fac_maxspeed = np.ones(n)
    for threshold in sorted(p.maxspeed_factor):
        m = ~np.isnan(proc_maxspeed) & (proc_maxspeed >= threshold)
        fac_maxspeed[m] = p.maxspeed_factor[threshold]

    # --- index ---
    valid = ~np.isnan(base)
    has_fw = _truthyf(fac_width)
    has_fs = _truthyf(fac_surface)
    ww = np.maximum(1 - fac_width, 0) + 0.5
    ws = np.maximum(1 - fac_surface, 0) + 0.5
    fac_1 = np.ones(n)
    both = has_fw & has_fs
    fac_1 = np.where(both, (ww * fac_width + ws * fac_surface) / (ww + ws),
                     fac_1)
    fac_1 = np.where(has_fw & ~has_fs, fac_width, fac_1)
    fac_1 = np.where(~has_fw & has_fs, fac_surface, fac_1)

    weight = _lutf(wt, p.fac2_weight, 1)
    m = _isin(wt, ("shared path", "segregated path", "shared footway")) \
        & (is_sidepath != "yes")
    weight[m] = 0
    fac_2 = fac_highway * fac_maxspeed
    fac_2 = fac_2 + ((1 - fac_2) * (1 - weight))
    fac_2 = np.where(fac_2 == 0, 1.0, fac_2)

    # --- fac_4 with bonus/malus/missing flags ---
    fac_4 = np.ones(n)
    lanes_mask = _contains(wt, "cycle lane")
    shared_rt = _isin(wt, ("shared road", "shared traffic lane"))
    shared_lane_tag = np.zeros(n, dtype=bool)
    for key in ("cycleway", "cycleway:both", "cycleway:left",
                "cycleway:right"):
        shared_lane_tag |= c(key) == "shared_lane"
    b_shared_lane = valid & shared_rt & shared_lane_tag
    fac_4 += np.where(b_shared_lane, 0.1, 0.0)

    colour = c("surface:colour")
    colour_ok = _truthy(colour) & ~_isin(colour, ("no", "none", "grey",
                                                  "gray", "black"))
    colour_wt = lanes_mask | _isin(wt, ("crossing", "shared bus lane",
                                        "link", "bicycle road")) \
        | (_isin(wt, ("shared path", "segregated path"))
           & (is_sidepath == "yes"))
    b_colour = valid & colour_wt & colour_ok
    fac_4 += np.where(b_colour & (wt == "crossing"), 0.15,
                      np.where(b_colour, 0.05, 0.0))

    crossing_v = c("crossing")
    crossing_mk = c("crossing:markings")
    is_crossing = wt == "crossing"
    miss_crossing = valid & is_crossing & ~_truthy(crossing_v)
    miss_crossing_mk = valid & is_crossing & ~_truthy(crossing_mk)
    b_signalled = valid & is_crossing & (crossing_v == "traffic_signals")
    b_marked = valid & is_crossing & ~b_signalled & (
        _isin(crossing_v, ("marked", "zebra"))
        | (_truthy(crossing_mk) & (crossing_mk != "no")))
    fac_4 += np.where(b_signalled, 0.2, np.where(b_marked, 0.1, 0.0))

    lit = c("lit")
    miss_lit = valid & ~_truthy(lit)
    m_no_light = valid & (lit == "no")
    fac_4 -= np.where(m_no_light, 0.1, 0.0)

    lp = ml == "parking"
    rp = mr == "parking"
    bl_ok = ~np.isnan(bl) & (bl != 0)
    br_ok = ~np.isnan(br) & (br != 0)
    door_wt = lanes_mask | (_isin(wt, ("cycle track", "shared path",
                                       "segregated path"))
                            & (is_sidepath == "yes"))
    door = valid & door_wt & ((lp & bl_ok & (bl < 1))
                              | (rp & br_ok & (br < 1)))
    diff = np.zeros(n)
    diff = np.where(lp, np.abs(bl - 1) / 5, diff)
    diff = np.where(rp, np.abs(br - 1) / 5, diff)
    diff = np.where(lp & rp, np.abs(((bl + br) / 2) - 1) / 5, diff)
    fac_4 -= np.where(door, diff, 0.0)

    m_permissive = valid & (c("bicycle") == "permissive")
    fac_4 -= np.where(m_permissive, 0.2, 0.0)

    index_f = base * fac_1 * fac_2 * 1 * fac_4
    index_f = np.minimum(100, np.maximum(index_f, 0))
    index = np.full(n, None, dtype=object)
    idx_round = np.rint(index_f)  # banker's, same as python round()
    # NaN index on a valid row only arises in scalar-crash states (see
    # test_vector_score: unparsable dooring buffer with parking mode)
    for i in np.nonzero(valid & ~np.isnan(index_f))[0]:
        index[i] = int(idx_round[i])
    index_10 = np.array([None if v is None else v // 10 for v in index],
                        dtype=object)

    # --- stress level (LTS) ---
    lts = np.full(n, None, dtype=object)
    und = np.ones(n, dtype=bool)
    ms = proc_maxspeed
    has_ms = ~np.isnan(ms) & (ms != 0)
    has_w = _truthyf(width)

    def set_lts(mask, value):
        nonlocal und
        hit = und & mask
        lts[hit] = value
        und &= ~hit

    set_lts(_isin(wt, ("cycle path", "cycle track", "segregated path",
                       "cycle lane (protected)")), 1)
    sf = _isin(wt, ("shared path", "shared footway"))
    set_lts(sf & ~_isin(ow, ("yes", "-1")) & has_w & (width < 3)
            & has_ms & (ms > 30), 3)
    set_lts(sf, 1)
    adv = _isin(wt, ("cycle lane (advisory)", "cycle lane (central)",
                     "shared bus lane", "link", "crossing"))
    set_lts(adv & has_ms & (ms <= 10), 1)
    set_lts(adv & has_ms & (ms <= 30), 2)
    set_lts(adv & has_w & (width >= 1.5), 3)
    set_lts(adv, 4)
    exc = wt == "cycle lane (exclusive)"
    set_lts(exc & has_ms & (ms <= 10), 1)
    set_lts(exc & has_ms & (ms <= 50) & has_w & (width >= 1.85), 2)
    set_lts(exc, 3)
    rd = _isin(wt, ("bicycle road", "shared road", "shared traffic lane"))
    set_lts(rd & (wt == "bicycle road") & restricted, 1)
    prio = c("priority_road")
    no_prio = ~_truthy(prio) | (prio == "no")
    set_lts(rd & has_ms & (ms <= 10)
            & _isin(proc_highway, ("residential", "living_street")) & no_prio,
            1)
    set_lts(rd & has_ms & (ms <= 30)
            & _isin(proc_highway, ("tertiary", "tertiary_link",
                                   "unclassified", "road", "residential",
                                   "living_street")), 2)
    set_lts(rd, 4)
    ts = wt == "track or service"
    set_lts(ts & has_ms & (ms <= 10), 1)
    set_lts(ts, 2)

    # --- data_missing / bonus / malus strings + incompleteness ---
    missing_entries = [
        ("width:lanes", m_wlanes), ("width", m_w1), ("width", m_w2),
        ("parking", m_park), ("surface", np.asarray(surf_miss, bool)),
        ("smoothness", np.asarray(smooth_miss, bool)),
        ("crossing", miss_crossing), ("crossing_markings", miss_crossing_mk),
        ("lit", miss_lit),
    ]
    bonus_entries = [
        ("motor vehicle restricted", is_motor_wt & restricted),
        ("wide width", has_cw & (fac_width > 1)),
        ("excellent surface", _truthyf(fac_surface) & (fac_surface > 1)),
        ("slow traffic", valid & (weight >= 0.5) & (fac_2 > 1)),
        ("shared lane markings", b_shared_lane),
        ("surface colour", b_colour),
        ("signalled crossing", b_signalled),
        ("marked crossing", b_marked),
    ]
    malus_entries = [
        ("narrow width", has_cw & (fac_width <= 0.5)),
        ("bad surface", _truthyf(fac_surface) & (fac_surface <= 0.5)),
        ("along a major road", valid & (weight >= 0.5)
         & (fac_highway <= 0.7)),
        ("along a road with high speed limits", valid & (weight >= 0.5)
         & (fac_maxspeed <= 0.7)),
        ("no street lighting", m_no_light),
        ("insufficient dooring buffer", door),
        ("cycling not intended", m_permissive),
    ]

    def join(entries):
        names = [e[0] for e in entries]
        flags = np.stack([e[1] for e in entries], axis=1)
        return np.array(
            [";".join(nm for nm, f in zip(names, row) if f)
             for row in flags], dtype=object)

    incompleteness = np.zeros(n)
    for name, flag in missing_entries:
        incompleteness = incompleteness + np.where(
            flag, p.data_incompleteness_weight.get(name, 0), 0.0)

    mandatory, traffic_sign = derive_mandatory_batch(df, wt, ow, p)
    filter_usable = np.where(
        _isin(mandatory, ("prohibited", "use_sidepath")), 0, 1)
    filter_way_type = _lut(wt, scoring._FILTER_WAY_TYPE)

    out = {
        "way_type": wt,
        "proc_oneway": ow,
        "proc_width": width,
        "proc_surface": surf,
        "proc_smoothness": smooth,
        "proc_traffic_mode_left": ml,
        "proc_traffic_mode_right": mr,
        "proc_mandatory": mandatory,
        "proc_traffic_sign": traffic_sign,
        "filter_usable": filter_usable,
        "filter_way_type": filter_way_type,
        "base_index": np.where(valid, base, np.nan),
        "fac_width": fac_width,
        "fac_surface": fac_surface,
        "fac_highway": fac_highway,
        "fac_maxspeed": fac_maxspeed,
        "fac_1": np.where(valid, _pyround(fac_1, 2), np.nan),
        "fac_2": np.where(valid, _pyround(fac_2, 2), np.nan),
        "fac_3": np.where(valid, 1.0, np.nan),
        "fac_4": np.where(valid, _pyround(fac_4, 2), np.nan),
        "index": index,
        "index_10": index_10,
        "data_missing": join(missing_entries),
        "data_bonus": join(bonus_entries),
        "data_malus": join(malus_entries),
        "stress_level": lts,
        "data_incompleteness": incompleteness,
    }
    return out
