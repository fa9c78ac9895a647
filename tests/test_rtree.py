"""STR R-tree: structural correctness vs brute force, and the broadcast
R-tree spatial join differentially against the shuffle (cell-bucketed)
join — both must produce identical assignments."""

import numpy as np
import pytest

from cqi_ray.geo.rtree import STRtree, _ragged_arange, polyline_bboxes


def _rand_boxes(rng, n, span=100.0, max_side=5.0):
    lo = rng.uniform(0, span, size=(n, 2))
    side = rng.uniform(0, max_side, size=(n, 2))
    return np.concatenate([lo, lo + side], axis=1)


def _brute_pairs(qboxes, boxes):
    out = set()
    for q, qb in enumerate(qboxes):
        for i, b in enumerate(boxes):
            if (qb[0] <= b[2] and b[0] <= qb[2] and
                    qb[1] <= b[3] and b[1] <= qb[3]):
                out.add((q, i))
    return out


class TestSTRtree:
    def test_ragged_arange(self):
        got = _ragged_arange(np.array([3, 0, 2, 1]))
        assert got.tolist() == [0, 1, 2, 0, 1, 0]
        assert _ragged_arange(np.array([], dtype=np.int64)).size == 0

    @pytest.mark.parametrize("n,nq", [(1, 5), (15, 10), (16, 10),
                                      (17, 10), (300, 40), (1000, 60)])
    def test_query_boxes_matches_brute_force(self, n, nq):
        rng = np.random.default_rng(n * 1000 + nq)
        boxes = _rand_boxes(rng, n)
        qboxes = _rand_boxes(rng, nq, max_side=20.0)
        tree = STRtree(boxes)
        qi, ii = tree.query_boxes(qboxes)
        assert set(zip(qi.tolist(), ii.tolist())) == _brute_pairs(qboxes, boxes)

    def test_empty_tree_and_empty_query(self):
        tree = STRtree(np.empty((0, 4)))
        qi, ii = tree.query_boxes(np.array([[0, 0, 1, 1.0]]))
        assert qi.size == 0 and ii.size == 0
        tree = STRtree(np.array([[0, 0, 1, 1.0]]))
        qi, ii = tree.query_boxes(np.empty((0, 4)))
        assert qi.size == 0 and ii.size == 0

    def test_query_points_radius_superset(self):
        """Every item whose true distance <= radius must be a candidate."""
        rng = np.random.default_rng(7)
        boxes = _rand_boxes(rng, 200)
        pts = rng.uniform(0, 100, size=(30, 2))
        tree = STRtree(boxes)
        qi, ii = tree.query_points(pts, radius=8.0)
        got = set(zip(qi.tolist(), ii.tolist()))
        for q, p in enumerate(pts):
            for i, b in enumerate(boxes):
                dx = max(b[0] - p[0], 0, p[0] - b[2])
                dy = max(b[1] - p[1], 0, p[1] - b[3])
                if np.hypot(dx, dy) <= 8.0:
                    assert (q, i) in got

    def test_polyline_bboxes(self):
        g = [np.array([[0.0, 1.0], [2.0, -1.0], [1.0, 3.0]]),
             np.array([[5.0, 5.0]])]
        bb = polyline_bboxes(g)
        assert bb[0].tolist() == [0.0, -1.0, 2.0, 3.0]
        assert bb[1].tolist() == [5.0, 5.0, 5.0, 5.0]


class TestBroadcastAssign:
    def test_matches_shuffle_join(self, ray_session):
        """The broadcast R-tree join and the cell-bucketed shuffle join
        are two physical plans of the same logical spatial join — every
        output field must agree."""
        import ray.data as rd
        from cqi_ray.images.synth import synth_images_table, synth_ways_grid
        from cqi_ray.pipelines.assign import (assign_images_broadcast,
                                              assign_images_to_ways)
        from cqi_ray.pipelines.cqi import (dataset_from_rows,
                                           score_ways_dataset)

        scored = score_ways_dataset(
            dataset_from_rows(synth_ways_grid(16))).materialize()
        images = rd.from_arrow(synth_images_table(150, seed=11))

        shuffle = assign_images_to_ways(
            images, scored, buffer_m=30, knn_radius_m=3000).to_pandas()
        bcast = assign_images_broadcast(
            images, scored, buffer_m=30, knn_radius_m=3000).to_pandas()

        assert len(shuffle) == len(bcast)
        cols = ["image_id", "way_id", "dist_m", "method", "way_index",
                "way_stress", "caption", "cell"]
        a = shuffle.sort_values("image_id")[cols].reset_index(drop=True)
        b = bcast.sort_values("image_id")[cols].reset_index(drop=True)
        for c in cols:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(float)
                bv = bv.astype(float)
                assert np.allclose(av, bv, equal_nan=True), c
            else:
                assert (av.fillna("-").astype(str)
                        == bv.fillna("-").astype(str)).all(), c


class TestPlanarAssign:
    """q_images_assign_planar: the SQL-oracle-able flagship join variant
    (equirect projection threaded through the same match machinery)."""

    def test_outcome_variety_and_utm_agreement(self, ray_session):
        from cqi_ray.queries import q_images_assign, q_images_assign_planar

        sf = "/root/testdata/sf0.001"
        planar = q_images_assign_planar(sf).to_pandas()
        assert len(planar) == 500
        methods = set(planar["method"].dropna())
        assert methods == {"pip", "knn"}
        assert planar["method"].isna().any()  # unassigned rows exist
        # within the flagship extent the equirect vs UTM distortion is
        # <1%, so assignments agree except at radius/tie boundaries
        utm = q_images_assign(sf).to_pandas().set_index("image_id")
        joined = planar.set_index("image_id").join(
            utm, rsuffix="_utm")
        both = joined.dropna(subset=["way_id", "way_id_utm"])
        agree = (both["way_id"] == both["way_id_utm"]).mean()
        assert agree > 0.95, agree
        # distances agree to the projection distortion (<1% + 1 m slack)
        d = (both["dist_m"] - both["dist_m_utm"]).abs()
        assert (d <= both["dist_m_utm"] * 0.02 + 1.0).all()
