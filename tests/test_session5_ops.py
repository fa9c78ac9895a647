"""Structural invariants for the session-5 operators beyond the oracle
hash checks (tests/test_queries_oracle.py already pins exact values):

* DBSCAN — output must be invariant to the halo shuffle's bucket count
  (the partitioning knob must never change semantics), and the roles
  must satisfy the density definitions.
* assoc_rules — support counts must obey the basket algebra
  (pair <= min(item counts) <= n_orders).
* image oracle trio — lossless decode stages must agree with a direct
  in-process replay of the pixel formulas (guards the build_images /
  codec plumbing without DuckDB in the loop).
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dbscan_out(ray_session):
    from cqi_ray.queries import q_dbscan

    return q_dbscan(SF).to_pandas()


class TestDbscan:
    def test_bucket_count_invariance(self, ray_session, dbscan_out,
                                     monkeypatch):
        """Halo correctness: 64-bucket and 5-bucket shuffles must agree."""
        import cqi_ray.queries as q

        orig = q.grouped_map_buckets

        def few_buckets(ds, keys, fn, num_buckets=64, **kw):
            return orig(ds, keys, fn, num_buckets=5, **kw)

        monkeypatch.setattr(q, "grouped_map_buckets", few_buckets)
        alt = q.q_dbscan(SF).to_pandas()
        a = dbscan_out.sort_values("point_id").reset_index(drop=True)
        b = alt.sort_values("point_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_role_definitions(self, ray_session, dbscan_out):
        """Re-derive neighbor counts locally; roles must match defs."""
        from cqi_ray.queries import _dbscan_synth

        ids = dbscan_out["point_id"].to_numpy(np.int64)
        px, py = _dbscan_synth(ids)
        d2 = (px[:, None] - px) ** 2 + (py[:, None] - py) ** 2
        near = (d2 <= 1024) & (ids[:, None] != ids)
        core = near.sum(axis=1) >= 3
        by_role = dbscan_out.set_index("point_id")["role"]
        assert (by_role.loc[ids[core]] == "core").all()
        # border: non-core with >=1 core neighbor
        border = ~core & (near & core).any(axis=1)
        assert (by_role.loc[ids[border]] == "border").all()
        noise = ~core & ~border
        assert (by_role.loc[ids[noise]] == "noise").all()
        # noise points carry cluster -1, clustered points a core pid
        cl = dbscan_out.set_index("point_id")["cluster"]
        assert (cl.loc[ids[noise]] == -1).all()
        assert (cl.loc[ids[core]] >= 0).all()

    def test_clusters_are_core_connected(self, ray_session, dbscan_out):
        """Every cluster label is the MIN core pid of its component."""
        core = dbscan_out[dbscan_out["role"] == "core"]
        assert (core.groupby("cluster")["point_id"].min()
                .eq(core.groupby("cluster")["cluster"].first()).all())


class TestAssocRules:
    def test_count_algebra(self, ray_session):
        from cqi_ray.queries import q_assoc_rules

        df = q_assoc_rules(SF).to_pandas()
        assert len(df) > 0
        assert (df["pair_orders"] >= 3).all()
        assert (df["pair_orders"] <= df[["a_orders", "b_orders"]]
                .min(axis=1)).all()
        assert (df["a_orders"] <= df["n_orders"]).all()
        assert (df["part_a"] < df["part_b"]).all()
        assert df["n_orders"].nunique() == 1


class TestImageOracleTrio:
    def test_colorstats_matches_formula_replay(self, ray_session):
        from cqi_ray.images.synth import _pixels_for
        from cqi_ray.queries import q_images_colorstats

        got = q_images_colorstats(SF).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        assert len(got) == 334  # 2/3 of 500 (lossless formats only)
        for _, row in got.iloc[[0, 17, 333]].iterrows():
            i = int(row["image_id"][4:])
            px = _pixels_for(i, 32, 32).astype(np.int64)
            assert row["sum_r"] == px[:, :, 0].sum()
            b = ((px[:, :, 0] >= 128) * 4 + (px[:, :, 1] >= 128) * 2
                 + (px[:, :, 2] >= 128)).ravel()
            counts = np.bincount(b, minlength=8)
            assert row["dom_count"] == counts.max()
            assert row["dom_octant"] == counts.argmax()

    def test_pooled_sums_reassemble_totals(self, ray_session):
        """Sum of the 64 block sums must equal the image channel sum."""
        from cqi_ray.queries import q_images_colorstats, q_images_pooled

        pooled = q_images_pooled(SF).to_pandas()
        totals = pooled.groupby("image_id", as_index=False)[
            ["sum_r", "sum_g", "sum_b"]].sum()
        direct = q_images_colorstats(SF).to_pandas()[
            ["image_id", "sum_r", "sum_g", "sum_b"]]
        merged = totals.merge(direct, on="image_id", suffixes=("_p", ""))
        for ch in ("sum_r", "sum_g", "sum_b"):
            assert (merged[f"{ch}_p"] == merged[ch]).all()

    def test_edges_bounds(self, ray_session):
        from cqi_ray.queries import q_images_edges

        df = q_images_edges(SF).to_pandas()
        assert len(df) == 334
        assert (df["edge_px"] <= 31 * 32).all()
        assert (df["grad_l1"] >= df["edge_px"] * 64).all()
