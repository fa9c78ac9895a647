"""The distributed (Ray Data) CQI pipeline must equal the plain-path golden
scores exactly, and the relational/checkpoint building blocks must hold."""

import math
import os

import pandas as pd
import pytest

from cqi_ray.params import OUTPUT_COLUMNS


def _norm_side(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    return v


class TestDistributedGolden:
    @pytest.fixture(scope="class")
    def scored(self, ray_session, corpus_rows):
        from cqi_ray.pipelines.cqi import dataset_from_rows, score_ways_dataset

        pdf = score_ways_dataset(dataset_from_rows(corpus_rows)).to_pandas()
        return {(r["id"], _norm_side(r["side"])): r
                for r in pdf.to_dict("records")}

    def test_matches_golden_exactly(self, scored, golden_rows):
        assert set(scored) == set(golden_rows)
        bad = []
        for key, g in golden_rows.items():
            m = scored[key]
            for col in OUTPUT_COLUMNS:
                gv, mv = g.get(col), m.get(col)
                if mv is not None and isinstance(mv, float) and pd.isna(mv):
                    mv = None
                if gv is None and mv is None:
                    continue
                if isinstance(gv, (int, float)) and isinstance(mv, (int, float)):
                    if mv is not None and math.isclose(float(gv), float(mv),
                                                       abs_tol=1e-9):
                        continue
                if gv != mv:
                    bad.append((key, col, gv, mv))
        assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


class TestRelational:
    def test_bucketed_join_matches_pandas(self, ray_session):
        import numpy as np
        import ray.data as rd
        from cqi_ray.relational import bucketed_hash_join

        rng = np.random.default_rng(0)
        left = pd.DataFrame({"k": rng.integers(0, 50, 500),
                             "v": rng.integers(0, 100, 500)})
        right = pd.DataFrame({"k": np.arange(0, 60, 2),
                              "w": np.arange(0, 60, 2) * 10})
        got = bucketed_hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k",
            right_cols=["k", "w"], num_buckets=7, how="inner").to_pandas()
        exp = left.merge(right, on="k", how="inner")
        key = lambda df: sorted(map(tuple, df[["k", "v", "w"]].to_numpy()))
        assert key(got) == key(exp)

    def test_partial_then_global_sum(self, ray_session):
        import ray.data as rd
        from cqi_ray.relational import partial_then_global_sum

        df = pd.DataFrame({"g": ["a", "b", "a", "a"], "x": [1.0, 2.0, 3.0, 4.0]})
        out = partial_then_global_sum(rd.from_pandas(df), keys=["g"],
                                      sums={"x": "sx"}, counts="n").to_pandas()
        out = out.sort_values("g").reset_index(drop=True)
        assert out["sx"].tolist() == [8.0, 2.0]
        assert out["n"].tolist() == [3, 1]

    def test_partial_sum_many_groups(self, ray_session):
        """High-cardinality reduce (the bucketed path's reason to exist)
        matches pandas exactly, with multi-column keys across blocks."""
        import numpy as np
        import ray.data as rd
        from cqi_ray.relational import partial_then_global_sum

        rng = np.random.default_rng(5)
        df = pd.DataFrame({"u": rng.integers(0, 400, 5000),
                           "w": rng.integers(0, 7, 5000),
                           "x": rng.integers(0, 100, 5000).astype(float)})
        ds = rd.from_pandas([df.iloc[i:i + 500] for i in range(0, 5000, 500)])
        out = partial_then_global_sum(ds, keys=["u", "w"], sums={"x": "sx"},
                                      counts="n").to_pandas()
        exp = df.groupby(["u", "w"], as_index=False).agg(
            sx=("x", "sum"), n=("x", "size"))
        key = lambda d: sorted(map(tuple, d[["u", "w", "sx", "n"]].to_numpy()))
        assert key(out) == key(exp)

    def test_distinct_rows(self, ray_session):
        import numpy as np
        import ray.data as rd
        from cqi_ray.relational import distinct_rows

        rng = np.random.default_rng(1)
        df = pd.DataFrame({"a": rng.integers(0, 40, 3000),
                           "b": rng.integers(0, 40, 3000)})
        ds = rd.from_pandas([df.iloc[i:i + 300] for i in range(0, 3000, 300)])
        out = distinct_rows(ds, ["a", "b"], num_buckets=8).to_pandas()
        exp = df.drop_duplicates()
        key = lambda d: sorted(map(tuple, d[["a", "b"]].to_numpy()))
        assert key(out) == key(exp)

    def test_bucketed_anti_join(self, ray_session):
        import numpy as np
        import ray.data as rd
        from cqi_ray.relational import bucketed_anti_join

        rng = np.random.default_rng(2)
        left = pd.DataFrame({"k": np.arange(200),
                             "v": rng.integers(0, 9, 200)})
        drops = pd.DataFrame({"k": rng.choice(300, 80, replace=False)})
        out = bucketed_anti_join(rd.from_pandas(left), rd.from_pandas(drops),
                                 on="k", num_buckets=5).to_pandas()
        exp = left[~left["k"].isin(set(drops["k"]))]
        key = lambda d: sorted(map(tuple, d[["k", "v"]].to_numpy()))
        assert key(out) == key(exp)


class TestCheckpoint:
    def test_checkpoint_and_resume(self, ray_session, tmp_path):
        import ray.data as rd
        from cqi_ray.state.checkpoint import checkpoint_stage, load_manifest

        calls = {"n": 0}

        def builder():
            calls["n"] += 1
            return rd.from_pandas(pd.DataFrame({"part": [1, 1, 2, 2],
                                                "v": [1, 2, 3, 4]}))

        path = str(tmp_path / "stage1")
        out1 = checkpoint_stage(builder, path, stage="s1", fingerprint="f1",
                                partition_cols=["part"])
        assert out1.count() == 4
        assert calls["n"] == 1
        man = load_manifest(path)
        assert man["complete"] and man["row_count"] == 4
        assert {p["key"] for p in man["partitions"]} == {"part=1", "part=2"}

        # same fingerprint -> resume without recompute
        out2 = checkpoint_stage(builder, path, stage="s1", fingerprint="f1",
                                partition_cols=["part"])
        assert calls["n"] == 1
        assert out2.count() == 4

        # changed fingerprint -> rebuild
        checkpoint_stage(builder, path, stage="s1", fingerprint="f2",
                         partition_cols=["part"])
        assert calls["n"] == 2
