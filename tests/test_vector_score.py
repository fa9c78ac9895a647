"""Differential tests: the fully vectorized scorer (width, mandatory,
factors, index, LTS, bonus/malus/missing strings) must match the row-wise
rule engine field-for-field — golden corpus (post-sidepath, post-fanout),
large synthetic ways, and randomized width/parking/buffer tag soup."""

import numpy as np
import pandas as pd

from cqi_ray import scoring
from cqi_ray.params import DEFAULT_PARAMS

CHECK_FIELDS = (
    "proc_oneway", "proc_width", "proc_surface", "proc_smoothness",
    "proc_traffic_mode_left", "proc_traffic_mode_right",
    "proc_separation_left", "proc_separation_right",
    "proc_buffer_left", "proc_buffer_right",
    "proc_mandatory", "proc_traffic_sign", "filter_usable",
    "filter_way_type", "base_index", "fac_width", "fac_surface",
    "fac_highway", "fac_maxspeed", "fac_1", "fac_2", "fac_3", "fac_4",
    "index", "index_10", "data_missing", "data_bonus", "data_malus",
    "stress_level", "data_incompleteness",
)


def _nn(v):
    if v is None:
        return None
    if isinstance(v, float) and v != v:
        return None
    return v


def _batch_outputs(df: pd.DataFrame):
    from cqi_ray.vector import (classify_way_type_batch, derive_oneway_batch,
                                derive_separation_buffer_batch,
                                derive_surface_smoothness_batch,
                                derive_traffic_modes_batch)
    from cqi_ray.vector_score import derive_width_batch, finalize_batch

    p = DEFAULT_PARAMS
    wts = classify_way_type_batch(df, p)
    ow = derive_oneway_batch(df, wts, p)
    surf, surf_miss, smooth, smooth_miss = \
        derive_surface_smoothness_batch(df, wts, p)
    ml, mr = derive_traffic_modes_batch(df, wts, p)
    sl, sr, bl, br = derive_separation_buffer_batch(df, ml, mr, p)
    width, m_wl, m_w1, m_w2, m_pk = derive_width_batch(df, wts, ow, p)
    out = finalize_batch(df, p, wts, ow, width, (m_wl, m_w1, m_w2, m_pk),
                         surf, surf_miss, smooth, smooth_miss, ml, mr,
                         bl, br)
    out["proc_separation_left"] = sl
    out["proc_separation_right"] = sr
    out["proc_buffer_left"] = bl
    out["proc_buffer_right"] = br
    return wts, out


def _diff_scored(df: pd.DataFrame):
    wts, out = _batch_outputs(df)
    bad = []
    skipped = 0
    for i, rec in enumerate(df.to_dict("records")):
        if wts[i] == scoring.DROP:
            continue
        rec = {k: (None if isinstance(v, float) and pd.isna(v) else v)
               for k, v in rec.items()}
        rec["way_type"] = wts[i]
        try:
            want = scoring.score_row(dict(rec), DEFAULT_PARAMS)
        except TypeError:
            # states unreachable through the real pipeline (e.g. a parking
            # traffic mode with an unparsable dooring buffer) crash the
            # scalar engine; the vector form yields NaN there instead
            skipped += 1
            continue
        for field in CHECK_FIELDS:
            g, w = _nn(out[field][i]), _nn(want.get(field))
            if isinstance(g, float) and isinstance(w, (int, float)):
                if g != w:
                    bad.append((i, field, w, g))
            elif isinstance(g, (int, np.integer)) and isinstance(w, (int, float)):
                if int(g) != w:
                    bad.append((i, field, w, g))
            elif g != w:
                bad.append((i, field, w, g))
    return bad, skipped


def _corpus_df(corpus_rows):
    from cqi_ray import offsets, sidepath
    from cqi_ray.pipeline import normalize_rows

    rows = normalize_rows([dict(r) for r in corpus_rows])
    sidepath.run_sidepath_stage(rows)
    fanned = []
    for r in rows:
        fanned.extend(offsets.fan_out(r))
    return pd.DataFrame([{k: v for k, v in r.items()
                          if k not in ("geometry", "geometry_m")}
                         for r in fanned])


class TestScoreDifferential:
    def test_corpus_post_fanout(self, corpus_rows):
        bad, skipped = _diff_scored(_corpus_df(corpus_rows))
        assert skipped == 0
        assert not bad, bad[:8]

    def test_synthetic_ways(self):
        from cqi_ray.images.synth import synth_ways_grid
        from cqi_ray.pipeline import normalize_rows

        rows = normalize_rows(synth_ways_grid(2000))
        df = pd.DataFrame([{k: v for k, v in r.items()
                            if k not in ("geometry", "geometry_m")}
                           for r in rows])
        bad, skipped = _diff_scored(df)
        assert skipped == 0
        assert not bad, bad[:8]

    def test_random_width_soup(self):
        rng = np.random.default_rng(31)
        n = 4000
        widths = [None, "2", "3.5", "0", "4 m", "junk", "5;2", "1_0", ""]
        lanes_v = [None, "1", "2", "3", "junk"]
        wl = [None, "2|3", "3.5", "2|2.5|3", "", "junk|"]
        cw_vals = [None, "lane", "track", "share_busway", "shared_lane", "no"]
        parks = [None, "lane", "no", "half_on_kerb", "street_side", ""]
        orients = [None, "parallel", "diagonal", "perpendicular"]
        bufs = [None, "0.5", "1.5", "no", "", "0.25"]
        df = pd.DataFrame({
            "highway": rng.choice(["residential", "primary", "secondary",
                                   "service", "track", "living_street",
                                   "path", "cycleway", "footway"], n),
            "side": rng.choice([None, "left", "right"], n, p=[0.6, 0.2, 0.2]),
            "type": rng.choice([None, "cycleway", "sidewalk"], n,
                               p=[0.6, 0.2, 0.2]),
            "oneway": rng.choice([None, "yes", "no", "-1"], n),
            "oneway:bicycle": rng.choice([None, "yes", "no"], n),
            "width": rng.choice(widths, n),
            "cycleway:width": rng.choice(widths, n),
            "footway:width": rng.choice(widths, n),
            "width:effective": rng.choice(widths, n),
            "width:lanes": rng.choice(wl, n),
            "width:lanes:forward": rng.choice(wl, n),
            "width:lanes:backward": rng.choice(wl, n),
            "lanes": rng.choice(lanes_v, n),
            "cycleway": rng.choice(cw_vals, n),
            "cycleway:left": rng.choice(cw_vals, n),
            "cycleway:right": rng.choice(cw_vals, n),
            "cycleway:both": rng.choice(cw_vals, n),
            "cycleway:left:width": rng.choice(widths, n),
            "cycleway:right:width": rng.choice(widths, n),
            "cycleway:both:width": rng.choice(widths, n),
            "cycleway:right:buffer": rng.choice(bufs, n),
            "cycleway:left:buffer:both": rng.choice(bufs, n),
            "cycleway:buffer": rng.choice(bufs, n),
            "parking:left": rng.choice(parks, n),
            "parking:right": rng.choice(parks, n),
            "parking:both": rng.choice(parks, n),
            "parking:left:orientation": rng.choice(orients, n),
            "parking:right:orientation": rng.choice(orients, n),
            "parking:both:width": rng.choice(widths, n),
            "parking:right:width": rng.choice(widths, n),
            "bicycle": rng.choice([None, "yes", "no", "designated",
                                   "permissive", "use_sidepath",
                                   "optional_sidepath"], n),
            "lit": rng.choice([None, "yes", "no"], n),
            "surface": rng.choice([None, "asphalt", "sett", "sand"], n),
            "smoothness": rng.choice([None, "good", "bad"], n),
            "surface:colour": rng.choice([None, "red", "grey", "no"], n),
            "crossing": rng.choice([None, "traffic_signals", "marked",
                                    "zebra", "unmarked"], n),
            "crossing:markings": rng.choice([None, "yes", "no", "dots"], n),
            "priority_road": rng.choice([None, "yes", "no",
                                         "yes_unposted"], n),
            "maxspeed": rng.choice([None, "30", "50", "walk", "none"], n),
            "proc_maxspeed": rng.choice([np.nan, 10.0, 30.0, 50.0, 100.0], n),
            "proc_highway": rng.choice([None, "residential", "primary",
                                        "tertiary", "living_street"], n),
            "proc_sidepath": rng.choice([None, "yes", "no"], n),
            "traffic_sign": rng.choice([None, "DE:237", "DE:240,1022-10"], n),
            "traffic_mode:left": rng.choice([None, "motor_vehicle", "foot",
                                             "parking"], n),
            "traffic_mode:right": rng.choice([None, "motor_vehicle", "foot",
                                              "parking"], n),
            "buffer:left": rng.choice(bufs, n),
            "buffer:right": rng.choice(bufs, n),
            "buffer": rng.choice(bufs, n),
            "lane_markings": rng.choice([None, "yes", "no"], n),
            "segregated": rng.choice([None, "yes", "no"], n),
            "foot": rng.choice([None, "yes", "designated"], n),
        })
        bad, skipped = _diff_scored(df)
        # the scalar engine can crash on unreachable states; tolerate a
        # handful of skips but require full agreement everywhere else
        assert not bad, f"{len(bad)} mismatches, first: {bad[:8]}"
