"""Evaluator plugin API: registration, chaining inside one map_batches
stage, actor-pool form, and agreement with the scalar rule engine."""

import numpy as np
import pandas as pd
import pyarrow as pa

from cqi_ray import scoring
from cqi_ray.evaluators import (BatchEvaluator, EvaluatorChain, FnEvaluator,
                                SmoothnessEvaluator, SurfaceEvaluator,
                                WidthEvaluator)


def _ways_table(n=200):
    from cqi_ray.images.synth import synth_ways_grid
    from cqi_ray.pipeline import normalize_rows
    from cqi_ray.pipelines.cqi import ways_rows_to_arrow

    rows = normalize_rows(synth_ways_grid(n))
    for r in rows:
        r.pop("geometry", None)
    return ways_rows_to_arrow([dict(r, geometry=[[13.5, 51.0], [13.6, 51.0]])
                               for r in rows])


class TestChain:
    def test_add_and_apply(self):
        t = _ways_table(64)
        chain = (EvaluatorChain()
                 .add_evaluator(SurfaceEvaluator())
                 .add_evaluator(FnEvaluator("const", lambda b: np.ones(b.num_rows))))
        out = chain.apply(t)
        assert "proc_surface_factor" in out.schema.names
        assert "proc_const" in out.schema.names
        assert out.num_rows == t.num_rows
        assert np.allclose(out["proc_const"].to_numpy(), 1.0)

    def test_transform_on_dataset(self, ray_session):
        import ray.data as rd

        t = _ways_table(120)
        chain = EvaluatorChain([SurfaceEvaluator(), WidthEvaluator(),
                                SmoothnessEvaluator()])
        out = chain.transform(rd.from_arrow(t)).to_pandas()
        assert {"proc_surface_factor", "proc_width_m",
                "proc_smoothness_factor"} <= set(out.columns)
        assert len(out) == 120

    def test_transform_actor_pool(self, ray_session):
        import ray.data as rd

        t = _ways_table(60)
        chain = EvaluatorChain([SurfaceEvaluator()])
        out = chain.transform(rd.from_arrow(t), concurrency=2).to_pandas()
        assert "proc_surface_factor" in out.columns
        assert len(out) == 60

    def test_matches_scalar_engine(self):
        """Evaluator outputs equal the scalar rule engine's factors."""
        t = _ways_table(150)
        chain = EvaluatorChain([SurfaceEvaluator(), WidthEvaluator()])
        out = chain.apply(t)
        sf = out["proc_surface_factor"].to_numpy()
        wm = out["proc_width_m"].to_numpy()
        df = t.to_pandas()
        p = scoring.DEFAULT_PARAMS
        for i in range(len(df)):
            rec = {k: (None if pd.isna(v) else v)
                   for k, v in df.iloc[i].items() if k != "geometry"}
            wt = scoring.classify_way_type(rec)
            rec["way_type"] = None if wt == scoring.DROP else wt
            want_s, _ = scoring.derive_surface(dict(rec), p)
            want_f = p.surface_factor.get(want_s)
            got = sf[i]
            assert (want_f is None and np.isnan(got)) or got == want_f, i
            ow = scoring.derive_oneway(rec, p)
            want_w, _ = scoring.derive_width(dict(rec), ow, p)
            goww = wm[i]
            assert (want_w is None and np.isnan(goww)) or goww == want_w, i

    def test_override_existing_column(self):
        t = _ways_table(10)
        chain = EvaluatorChain([FnEvaluator("x", lambda b: np.zeros(b.num_rows)),
                                FnEvaluator("x", lambda b: np.ones(b.num_rows))])
        out = chain.apply(t)
        assert np.allclose(out["proc_x"].to_numpy(), 1.0)
        # no duplicate columns
        assert out.schema.names.count("proc_x") == 1
