"""Differential tests: the vectorized classifier must match the row-wise
rule engine on every row — golden corpus (post-sidepath, post-fanout),
large synthetic ways, and randomized tag soup."""

import numpy as np
import pandas as pd
import pytest

from cqi_ray import scoring
from cqi_ray.params import INPUT_TAG_COLUMNS
from cqi_ray.vector import classify_way_type_batch


def _rowwise(df: pd.DataFrame):
    out = []
    for rec in df.to_dict("records"):
        rec = {k: (None if isinstance(v, float) and pd.isna(v) else v)
               for k, v in rec.items()}
        out.append(scoring.classify_way_type(rec))
    return out


def _diff(df: pd.DataFrame):
    got = classify_way_type_batch(df).tolist()
    want = _rowwise(df)
    bad = [(i, want[i], got[i]) for i in range(len(df)) if got[i] != want[i]]
    return bad


class TestDifferential:
    def test_corpus_post_fanout(self, corpus_rows):
        from cqi_ray import offsets, sidepath
        from cqi_ray.pipeline import normalize_rows

        rows = normalize_rows([dict(r) for r in corpus_rows])
        sidepath.run_sidepath_stage(rows)
        fanned = []
        for r in rows:
            fanned.extend(offsets.fan_out(r))
        df = pd.DataFrame([{k: v for k, v in r.items()
                            if k not in ("geometry", "geometry_m")}
                           for r in fanned])
        bad = _diff(df)
        assert not bad, bad[:5]

    def test_synthetic_ways(self):
        from cqi_ray.images.synth import synth_ways_grid
        from cqi_ray.pipeline import normalize_rows

        rows = normalize_rows(synth_ways_grid(2000))
        df = pd.DataFrame([{k: v for k, v in r.items()
                            if k not in ("geometry", "geometry_m")}
                           for r in rows])
        bad = _diff(df)
        assert not bad, bad[:5]

    def test_random_tag_soup(self):
        rng = np.random.default_rng(42)
        values = [None, "yes", "no", "designated", "permissive", "lane",
                  "track", "share_busway", "exclusive", "link", "crossing",
                  "sidewalk", "path", "cycleway", "footway", "residential",
                  "primary", "secondary", "service", "motorway", "steps",
                  "use_sidepath", "optional_sidepath", "private", "kerb",
                  "kerb;fence", "none", "", "no|lane|no", "foot",
                  "motor_vehicle", "parking", "informal"]
        hot_cols = [c for c in INPUT_TAG_COLUMNS
                    if any(s in c for s in ("cycleway", "sidewalk", "separation",
                                            "traffic_mode", "highway", "bicycle",
                                            "foot", "segregated", "informal",
                                            "lane_markings", "is_sidepath",
                                            "access", "vehicle"))]
        n = 4000
        data = {}
        for col in hot_cols:
            mask = rng.random(n) < 0.25
            vals = np.full(n, None, dtype=object)
            vals[mask] = rng.choice(values, size=int(mask.sum()))
            data[col] = vals
        data["side"] = rng.choice([None, "left", "right"], size=n,
                                  p=[0.6, 0.2, 0.2])
        data["type"] = rng.choice([None, "cycleway", "sidewalk"], size=n,
                                  p=[0.6, 0.2, 0.2])
        data["proc_sidepath"] = rng.choice([None, "yes", "no"], size=n)
        df = pd.DataFrame(data)
        bad = _diff(df)
        assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


class TestOnewayDifferential:
    def _diff_oneway(self, df):
        from cqi_ray.vector import classify_way_type_batch, derive_oneway_batch

        wts = classify_way_type_batch(df)
        got = derive_oneway_batch(df, wts).tolist()
        want = []
        for i, rec in enumerate(df.to_dict("records")):
            rec = {k: (None if isinstance(v, float) and pd.isna(v) else v)
                   for k, v in rec.items()}
            rec["way_type"] = None if wts[i] == scoring.DROP else wts[i]
            want.append(scoring.derive_oneway(rec, scoring.DEFAULT_PARAMS))
        return [(i, want[i], got[i]) for i in range(len(df))
                if got[i] != want[i]]

    def test_corpus(self, corpus_rows):
        from cqi_ray import offsets, sidepath
        from cqi_ray.pipeline import normalize_rows

        rows = normalize_rows([dict(r) for r in corpus_rows])
        sidepath.run_sidepath_stage(rows)
        fanned = []
        for r in rows:
            fanned.extend(offsets.fan_out(r))
        df = pd.DataFrame([{k: v for k, v in r.items()
                            if k not in ("geometry", "geometry_m")}
                           for r in fanned])
        assert not self._diff_oneway(df)

    def test_random(self):
        rng = np.random.default_rng(7)
        n = 3000
        vals = [None, "yes", "no", "-1", "alternating", "reversible",
                "maybe", ""]
        df = pd.DataFrame({
            "oneway": rng.choice(vals, n),
            "oneway:bicycle": rng.choice(vals, n),
            "cycleway:oneway": rng.choice(vals, n),
            "side": rng.choice([None, "left", "right"], n),
            "highway": rng.choice(["residential", "cycleway", "path",
                                   "footway", "service", "primary"], n),
            "cycleway:right": rng.choice([None, "lane", "track"], n),
            "type": rng.choice([None, "cycleway", "sidewalk"], n),
        })
        assert not self._diff_oneway(df)


class TestSurfaceSmoothnessDifferential:
    def _diff(self, df):
        from cqi_ray.vector import (classify_way_type_batch,
                                    derive_surface_smoothness_batch)

        wts = classify_way_type_batch(df)
        s, sm_miss, sm, smo_miss = derive_surface_smoothness_batch(df, wts)
        bad = []
        for i, rec in enumerate(df.to_dict("records")):
            rec = {k: (None if isinstance(v, float) and pd.isna(v) else v)
                   for k, v in rec.items()}
            rec["way_type"] = None if wts[i] == scoring.DROP else wts[i]
            ws, wm = scoring.derive_surface(rec, scoring.DEFAULT_PARAMS)
            wsm, wsmm = scoring.derive_smoothness(rec, scoring.DEFAULT_PARAMS)
            got = (s[i], bool(sm_miss[i]), sm[i], bool(smo_miss[i]))
            want = (ws, "surface" in wm, wsm, "smoothness" in wsmm)
            if got != want:
                bad.append((i, want, got))
        return bad

    def test_corpus(self, corpus_rows):
        from cqi_ray import offsets, sidepath
        from cqi_ray.pipeline import normalize_rows

        rows = normalize_rows([dict(r) for r in corpus_rows])
        sidepath.run_sidepath_stage(rows)
        fanned = []
        for r in rows:
            fanned.extend(offsets.fan_out(r))
        df = pd.DataFrame([{k: v for k, v in r.items()
                            if k not in ("geometry", "geometry_m")}
                           for r in fanned])
        bad = self._diff(df)
        assert not bad, bad[:5]

    def test_random(self):
        rng = np.random.default_rng(11)
        n = 3000
        surf_vals = [None, "asphalt", "sett", "asphalt;sand", "junk",
                     "paving_stones", "", "sand;junk", "concrete:plates"]
        smooth_vals = [None, "good", "excellent", "bad", "weird", "",
                       "impassable"]
        df = pd.DataFrame({
            "surface": rng.choice(surf_vals, n),
            "surface:bicycle": rng.choice(surf_vals, n),
            "cycleway:surface": rng.choice(surf_vals, n),
            "smoothness": rng.choice(smooth_vals, n),
            "smoothness:bicycle": rng.choice(smooth_vals, n),
            "cycleway:smoothness": rng.choice(smooth_vals, n),
            "highway": rng.choice(["residential", "path", "cycleway", "track",
                                   "footway", "service", None], n),
            "tracktype": rng.choice([None, "grade1", "grade3", "grade5"], n),
            "segregated": rng.choice([None, "yes", "no"], n),
            "side": rng.choice([None, "left", "right"], n),
            "type": rng.choice([None, "cycleway", "sidewalk"], n),
            "cycleway:right": rng.choice([None, "lane", "track"], n),
        })
        bad = self._diff(df)
        assert not bad, f"{len(bad)}: {bad[:5]}"


def _nanNone(v):
    if v is None:
        return None
    if isinstance(v, float) and v != v:
        return None
    return v


class TestModesSepBufferDifferential:
    def _diff(self, df):
        from cqi_ray.vector import (classify_way_type_batch,
                                    derive_separation_buffer_batch,
                                    derive_traffic_modes_batch)

        wts = classify_way_type_batch(df)
        ml, mr = derive_traffic_modes_batch(df, wts)
        sl, sr, bl, br = derive_separation_buffer_batch(df, ml, mr)
        bad = []
        for i, rec in enumerate(df.to_dict("records")):
            rec = {k: (None if isinstance(v, float) and pd.isna(v) else v)
                   for k, v in rec.items()}
            rec["way_type"] = None if wts[i] == scoring.DROP else wts[i]
            wml, wmr = scoring.derive_traffic_modes(rec, scoring.DEFAULT_PARAMS)
            wsl, wsr = scoring.derive_separation(rec, wml, wmr,
                                                 scoring.DEFAULT_PARAMS)
            wbl, wbr = scoring.derive_buffer(rec, wml, wmr,
                                             scoring.DEFAULT_PARAMS)
            got = tuple(_nanNone(x) for x in (ml[i], mr[i], sl[i], sr[i],
                                              bl[i], br[i]))
            want = (wml, wmr, wsl, wsr, wbl, wbr)
            want = tuple(_nanNone(x) for x in want)
            if got != want:
                bad.append((i, rec.get("side"), wts[i], want, got))
        return bad

    def test_corpus(self, corpus_rows):
        from cqi_ray import offsets, sidepath
        from cqi_ray.pipeline import normalize_rows

        rows = normalize_rows([dict(r) for r in corpus_rows])
        sidepath.run_sidepath_stage(rows)
        fanned = []
        for r in rows:
            fanned.extend(offsets.fan_out(r))
        df = pd.DataFrame([{k: v for k, v in r.items()
                            if k not in ("geometry", "geometry_m")}
                           for r in fanned])
        bad = self._diff(df)
        assert not bad, bad[:5]

    def test_random(self):
        rng = np.random.default_rng(23)
        n = 4000
        modes = [None, "motor_vehicle", "foot", "parking", "psv", "no", ""]
        seps = [None, "kerb", "no", "none", "fence", "bollard", ""]
        bufs = [None, "0", "0.5", "1.5", "no", "junk", "2", "1_000", ""]
        parks = [None, "lane", "no", "half_on_kerb", "street_side", ""]
        df = pd.DataFrame({
            "traffic_mode:left": rng.choice(modes, n),
            "traffic_mode:right": rng.choice(modes, n),
            "traffic_mode:both": rng.choice(modes, n),
            "separation": rng.choice(seps, n),
            "separation:left": rng.choice(seps, n),
            "separation:right": rng.choice(seps, n),
            "separation:both": rng.choice(seps, n),
            "buffer": rng.choice(bufs, n),
            "buffer:left": rng.choice(bufs, n),
            "buffer:right": rng.choice(bufs, n),
            "buffer:both": rng.choice(bufs, n),
            "parking:left": rng.choice(parks, n),
            "parking:right": rng.choice(parks, n),
            "parking:both": rng.choice(parks, n),
            "highway": rng.choice(["residential", "cycleway", "path",
                                   "footway", "primary", "service"], n),
            "side": rng.choice([None, "left", "right"], n),
            "type": rng.choice([None, "cycleway", "sidewalk"], n),
            "proc_sidepath": rng.choice([None, "yes", "no"], n),
            "cycleway:right": rng.choice([None, "lane", "track"], n),
            "cycleway:lanes": rng.choice([None, "no|lane|no"], n),
        })
        bad = self._diff(df)
        assert not bad, f"{len(bad)}: {bad[:5]}"
