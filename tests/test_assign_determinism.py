"""Regression: exact-distance tie-breaks must be a TOTAL order.

The CQI side-row fan-out can emit two scored rows with the SAME way id
and identical geometry (offset 0) but different (index, stress).  With a
way_id-only tie-break, which row's scores an image reports depended on
block arrival order inside the bucket concat — re-executing an upstream
task after a worker death changed the output (caught by
scripts/fault_tolerance_experiment.py: row counts matched, content
checksums didn't).  The rule is now: smaller distance, then smaller
way_id, then smaller index (NaN last), then smaller stress (NaN last) —
in both the shuffle kernel (match_bucket) and the broadcast R-tree
assigner (RtreeAssign's visit order + strict '<' update).
"""

import numpy as np
import pandas as pd
import pytest

from cqi_ray.geo import proj
from cqi_ray.pipelines.assign import (RtreeAssign, _geom_to_bytes,
                                      match_bucket)

IDENTITY = lambda xy: np.asarray(xy, dtype=np.float64)  # noqa: E731


def _bucket_frame(way_rows):
    """One image at the origin + the given way rows, all in one cell.
    Coordinates are already metric (match_bucket gets an identity
    projection)."""
    img = {"cell": 1, "salt": 0, "kind": 0, "image_id": "img_0",
           "lon": 0.0, "lat": 0.0, "caption": "c",
           "way_id": None, "way_index": None, "way_stress": None,
           "way_geom": None}
    rows = [img]
    for wid, widx, wstr in way_rows:
        rows.append({"cell": 1, "salt": 0, "kind": 1, "image_id": None,
                     "lon": np.nan, "lat": np.nan, "caption": None,
                     "way_id": wid, "way_index": widx, "way_stress": wstr,
                     "way_geom": _geom_to_bytes(
                         np.array([[-5.0, 3.0], [5.0, 3.0]]))})
    return pd.DataFrame(rows)


class TestMatchBucketTieTotalOrder:
    def test_same_id_tie_picks_smaller_index_both_orders(self):
        a = [("way_x", 19.0, 4.0), ("way_x", 14.0, 3.0)]
        for rows in (a, a[::-1]):
            out = match_bucket(_bucket_frame(rows), buffer_m=15.0,
                               knn_radius_m=150.0, project=IDENTITY)
            assert len(out) == 1
            assert out["way_id"].iloc[0] == "way_x"
            assert out["way_index"].iloc[0] == 14.0
            assert out["way_stress"].iloc[0] == 3.0

    def test_same_id_same_index_falls_to_stress(self):
        a = [("way_x", 14.0, 4.0), ("way_x", 14.0, 3.0)]
        for rows in (a, a[::-1]):
            out = match_bucket(_bucket_frame(rows), buffer_m=15.0,
                               knn_radius_m=150.0, project=IDENTITY)
            assert out["way_stress"].iloc[0] == 3.0

    def test_nan_index_ranks_last(self):
        a = [("way_x", np.nan, 1.0), ("way_x", 19.0, 4.0)]
        for rows in (a, a[::-1]):
            out = match_bucket(_bucket_frame(rows), buffer_m=15.0,
                               knn_radius_m=150.0, project=IDENTITY)
            assert out["way_index"].iloc[0] == 19.0

    def test_smaller_way_id_still_wins_across_ids(self):
        a = [("way_b", 1.0, 1.0), ("way_a", 99.0, 4.0)]
        for rows in (a, a[::-1]):
            out = match_bucket(_bucket_frame(rows), buffer_m=15.0,
                               knn_radius_m=150.0, project=IDENTITY)
            assert out["way_id"].iloc[0] == "way_a"
            assert out["way_index"].iloc[0] == 99.0


class TestRtreeAssignTieTotalOrder:
    @pytest.mark.parametrize("reverse", [False, True])
    def test_duplicate_id_payload_order_invariant(self, ray_session,
                                                  reverse):
        import ray

        lonlat_line = np.array([[13.5, 51.05], [13.501, 51.05]])
        geom = _geom_to_bytes(proj.project_coords(lonlat_line))
        ids = np.array(["way_x", "way_x"], dtype=object)
        idxs = np.array([19.0, 14.0])
        strs = np.array([4.0, 3.0])
        sl = slice(None, None, -1) if reverse else slice(None)
        payload = {"id": ids[sl], "index": idxs[sl], "stress": strs[sl],
                   "geom": np.array([geom, geom], dtype=object)}
        assigner = RtreeAssign(ray.put(payload), buffer_m=15.0,
                               knn_radius_m=150.0, res=20)
        batch = pd.DataFrame({"image_id": ["img_0"],
                              "lon": [13.5005], "lat": [51.0501],
                              "caption": ["c"]})
        out = assigner(batch)
        assert out["way_id"].iloc[0] == "way_x"
        assert out["way_index"].iloc[0] == 14.0
        assert out["way_stress"].iloc[0] == 3.0
