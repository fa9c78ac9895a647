"""Tests for the spatial core: cell index, PIP, buffer polygons, tiles."""

import numpy as np
import pytest

from cqi_ray.geo import cells, lines, pip, proj


class TestCells:
    def test_encode_decode_roundtrip(self):
        rng = np.random.default_rng(42)
        lon = rng.uniform(-179.9, 179.9, 500)
        lat = rng.uniform(-89.9, 89.9, 500)
        for res in (5, 12, 20, cells.MAX_RES):
            c = cells.encode(lon, lat, res)
            x, y, r = cells.decode(c)
            assert (r == res).all()
            assert np.array_equal(cells.from_xy(x, y, res), c)
            lon_min, lat_min, lon_max, lat_max = cells.cell_bounds(c)
            assert ((lon_min <= lon) & (lon <= lon_max)).all()
            assert ((lat_min <= lat) & (lat <= lat_max)).all()

    def test_parent_contains_child(self):
        c = cells.encode(np.array([13.5]), np.array([51.05]), 20)
        p = cells.parent(c)
        assert cells.resolution(p)[0] == 19
        kids = cells.children(int(p[0]))
        assert int(c[0]) in set(kids.tolist())

    def test_neighbors_are_adjacent(self):
        c = cells.encode(np.array([13.5]), np.array([51.05]), 15)
        nb = cells.neighbors(c)
        x0, y0, _ = cells.decode(c)
        for n in nb[0]:
            x, y, r = cells.decode(np.array([n]))
            assert r[0] == 15
            assert abs(int(x[0]) - int(x0[0])) <= 1
            assert abs(int(y[0]) - int(y0[0])) <= 1

    def test_cover_disc_contains_center_and_edge(self):
        res = cells.res_for_meters(500, 51.0)
        cover = set(cells.cover_disc(13.5, 51.05, 500, res).tolist())
        assert int(cells.encode(np.array([13.5]), np.array([51.05]), res)[0]) in cover
        # a point 400 m east is inside the disc -> its cell must be covered
        dlon = 400 / (111_320 * np.cos(np.radians(51.05)))
        assert int(cells.encode(np.array([13.5 + dlon]), np.array([51.05]), res)[0]) in cover

    def test_same_res_nearby_points_copartition(self):
        # two points 5 m apart at r chosen for 100 m cells land in the same
        # or adjacent cells — the join invariant
        res = cells.res_for_meters(100, 51.0)
        c = cells.encode(np.array([13.5, 13.50007]), np.array([51.05, 51.05]), res)
        x, y, _ = cells.decode(c)
        assert abs(int(x[1]) - int(x[0])) <= 1 and abs(int(y[1]) - int(y[0])) <= 1


class TestTileMath:
    def test_tile_roundtrip(self):
        for z in (5, 12, 16):
            xt, yt = cells.lonlat_to_tile(np.array([13.5]), np.array([51.05]), z)
            b = cells.tile_bounds(z, int(xt[0]), int(yt[0]))
            assert b[0] <= 13.5 <= b[2] and b[1] <= 51.05 <= b[3]

    def test_pixel_coords_inside(self):
        z = 15
        xt, yt = cells.lonlat_to_tile(np.array([13.5]), np.array([51.05]), z)
        fx, fy = cells.lonlat_to_tile_pixel(
            np.array([13.5]), np.array([51.05]), z, int(xt[0]), int(yt[0]))
        assert 0 <= fx[0] < 256 and 0 <= fy[0] < 256


class TestPIP:
    def test_square(self):
        square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        pts = np.array([[5, 5], [15, 5], [-1, -1], [9.999, 9.999]])
        assert pip.points_in_polygon(pts, square).tolist() == [True, False, False, True]

    def test_concave(self):
        poly = np.array([[0, 0], [10, 0], [10, 10], [5, 5], [0, 10]], float)
        pts = np.array([[5, 8], [2, 4], [5, 2]])
        assert pip.points_in_polygon(pts, poly).tolist() == [False, True, True]

    def test_buffer_ring_matches_distance_predicate(self):
        rng = np.random.default_rng(7)
        line = np.array([[0, 0], [80, 10], [120, 60]], float)
        ring = pip.buffer_polygon_of_polyline(line, 12, arc_segments=24)
        pts = rng.uniform(-30, 150, size=(400, 2))
        inside_ring = pip.points_in_polygon(pts, ring)
        inside_true = pip.points_near_polyline(pts, line, 12)
        # ring is an approximation: agreement away from the boundary
        d = lines.points_to_segments_distance(pts, line[:-1], line[1:]).min(axis=1)
        clear = np.abs(d - 12) > 1.0
        assert (inside_ring[clear] == inside_true[clear]).all()


class TestAssignPipeline:
    def test_assignment_end_to_end(self, ray_session):
        import ray.data as rd
        from cqi_ray.images.synth import synth_images_table
        from cqi_ray.pipelines.assign import assign_images_to_ways
        from cqi_ray.pipelines.cqi import dataset_from_rows, score_ways_dataset
        from cqi_ray.images.synth import synth_ways_grid

        ways = synth_ways_grid(16)
        scored = score_ways_dataset(dataset_from_rows(ways))
        images = rd.from_arrow(synth_images_table(60, seed=1))
        out = assign_images_to_ways(images, scored, buffer_m=30,
                                    knn_radius_m=3000).to_pandas()
        assert len(out) == 60
        assert set(out.columns) >= {"image_id", "way_id", "dist_m", "method",
                                    "caption"}
        assigned = out[out["method"].notna()]
        assert len(assigned) > 0
        # caption invariant: untouched through every stage
        src = synth_images_table(60, seed=1).to_pandas()
        merged = out.merge(src[["image_id", "caption"]], on="image_id",
                           suffixes=("", "_src"))
        assert (merged["caption"] == merged["caption_src"]).all()
        # every pip assignment is within the buffer distance
        pips = out[out["method"] == "pip"]
        assert (pips["dist_m"] <= 30 + 1e-6).all()
        knns = out[out["method"] == "knn"]
        assert (knns["dist_m"] <= 3000 + 1e-6).all()
        if len(knns):
            assert (knns["dist_m"] > 30).all()

    def test_assignment_matches_bruteforce(self, ray_session):
        """Cell-partitioned assignment == brute-force nearest way."""
        import ray.data as rd
        import pandas as pd
        from cqi_ray.images.synth import synth_images_table, synth_ways_grid
        from cqi_ray.pipelines.assign import assign_images_to_ways
        from cqi_ray.pipelines.cqi import (dataset_from_rows,
                                           score_ways_dataset, geom_from_bytes)

        ways = synth_ways_grid(25)
        scored_ds = score_ways_dataset(dataset_from_rows(ways))
        scored = scored_ds.to_pandas()
        images = synth_images_table(80, seed=3)
        out = assign_images_to_ways(rd.from_arrow(images), scored_ds,
                                    buffer_m=25, knn_radius_m=2000).to_pandas()

        from cqi_ray.geo import proj, lines as L
        import numpy as np
        img = images.to_pandas()
        pts = proj.project_coords(np.stack([img["lon"], img["lat"]], axis=1))
        expected = {}
        for i, iid in enumerate(img["image_id"]):
            best, bd = None, np.inf
            for _, w in scored.iterrows():
                geom = geom_from_bytes(w["geometry_m"])
                d = L.point_to_polyline_distance(pts[i], geom)
                if d < bd or (d == bd and best is not None and w["id"] < best):
                    best, bd = w["id"], d
            if bd <= 25:
                expected[iid] = (best, "pip")
            elif bd <= 2000:
                expected[iid] = (best, "knn")
            else:
                expected[iid] = (None, None)
        got = {r.image_id: (r.way_id if pd.notna(r.way_id) else None,
                            r.method if pd.notna(r.method) else None)
               for r in out.itertuples()}
        assert got == expected


class TestTiles:
    def test_render_pipeline(self, ray_session):
        from cqi_ray.images import codec
        from cqi_ray.pipelines.flagship import build_scored_ways
        from cqi_ray.pipelines.tiles import render_tiles

        tiles = render_tiles(build_scored_ways(16), zooms=(14,)).to_pandas()
        assert len(tiles) > 0
        assert (tiles["n_ways"] >= 1).all()
        # every tile decodes to a 256x256 RGB image with some colored pixels
        px = codec.png_decode(tiles["png"].iloc[0])
        assert px.shape == (256, 256, 3)
        assert px.sum() > 0

    def test_deterministic(self, ray_session):
        from cqi_ray.pipelines.flagship import build_scored_ways
        from cqi_ray.pipelines.tiles import render_tiles

        a = render_tiles(build_scored_ways(9), zooms=(14,)).to_pandas()
        b = render_tiles(build_scored_ways(9), zooms=(14,)).to_pandas()
        ka = {(r.z, r.x, r.y): r.png for r in a.itertuples()}
        kb = {(r.z, r.x, r.y): r.png for r in b.itertuples()}
        assert ka == kb


class TestSimplifyPolyline:
    def _reference(self, pts, eps):
        """Plain recursive Douglas-Peucker for differential checking."""
        import numpy as np

        pts = np.asarray(pts, dtype=np.float64)
        if len(pts) <= 2:
            return pts.copy()
        a, b = pts[0], pts[-1]
        seg = b - a
        ln = np.hypot(*seg)
        mid = pts[1:-1] - a
        d = (np.hypot(mid[:, 0], mid[:, 1]) if ln == 0 else
             np.abs(mid[:, 0] * seg[1] - mid[:, 1] * seg[0]) / ln)
        i = int(np.argmax(d))
        if d[i] <= eps:
            return np.array([a, b])
        left = self._reference(pts[:i + 2], eps)
        right = self._reference(pts[i + 1:], eps)
        return np.concatenate([left[:-1], right])

    def test_matches_recursive_reference(self):
        import numpy as np

        from cqi_ray.geo.lines import simplify_polyline

        rng = np.random.RandomState(13)
        for _ in range(20):
            n = rng.randint(3, 60)
            pts = np.cumsum(rng.randn(n, 2), axis=0)
            eps = float(rng.uniform(0.05, 2.0))
            got = simplify_polyline(pts, eps)
            want = self._reference(pts, eps)
            assert np.array_equal(got, want)

    def test_all_dropped_points_within_eps(self):
        import numpy as np

        from cqi_ray.geo.lines import (points_to_segments_distance,
                                       simplify_polyline)

        rng = np.random.RandomState(29)
        pts = np.cumsum(rng.randn(200, 2), axis=0)
        eps = 0.75
        simp = simplify_polyline(pts, eps)
        d = points_to_segments_distance(pts, simp[:-1], simp[1:])
        assert d.min(axis=1).max() <= eps + 1e-9

    def test_endpoints_and_degenerate(self):
        import numpy as np

        from cqi_ray.geo.lines import simplify_polyline

        pts = np.array([[1.0, 2.0], [1.0, 2.0], [1.0, 2.0]])
        s = simplify_polyline(pts, 0.1)   # zero-length chain
        assert np.array_equal(s[[0, -1]], pts[[0, -1]])
        two = np.array([[0.0, 0.0], [3.0, 4.0]])
        assert np.array_equal(simplify_polyline(two, 10.0), two)


class TestVectorizeTiles:
    def test_roundtrip_lossless_on_class_raster(self, ray_session):
        """raster->vector is exact: re-drawing every extracted run
        reproduces the decoded class matrix pixel-for-pixel."""
        import numpy as np
        from cqi_ray.images import codec
        from cqi_ray.pipelines.flagship import build_scored_ways
        from cqi_ray.pipelines.tiles import (classify_pixels, render_tiles,
                                             vectorize_tiles)

        tiles = render_tiles(build_scored_ways(16), zooms=(15,)).materialize()
        tdf = tiles.to_pandas()
        runs = vectorize_tiles(tiles).to_pandas()
        assert len(runs) > 0
        assert (runs["n_px"] > 0).all()
        for t in tdf.itertuples(index=False):
            cls = classify_pixels(codec.png_decode(t.png))
            rebuilt = np.full_like(cls, -1)
            r = runs[(runs.z == t.z) & (runs.x == t.x) & (runs.y == t.y)]
            for seg in r.itertuples(index=False):
                rebuilt[seg.row_px, seg.col0:seg.col1] = seg.cls
            assert (rebuilt == cls).all()

    def test_run_lonlat_inside_tile_bounds(self, ray_session):
        from cqi_ray.geo.cells import tile_bounds
        from cqi_ray.pipelines.flagship import build_scored_ways
        from cqi_ray.pipelines.tiles import render_tiles, vectorize_tiles

        tiles = render_tiles(build_scored_ways(16), zooms=(15,))
        runs = vectorize_tiles(tiles).to_pandas()
        for (z, x, y), g in runs.groupby(["z", "x", "y"]):
            lon_min, lat_min, lon_max, lat_max = tile_bounds(int(z), int(x), int(y))
            eps = 1e-9
            assert (g["lon0"] >= lon_min - eps).all()
            assert (g["lon1"] <= lon_max + eps).all()
            assert (g["lat"] >= lat_min - eps).all()
            assert (g["lat"] <= lat_max + eps).all()


class TestHexCells:
    """H3-style axial hex grid (geo/cells.py hex_*): quantization,
    round trips, k-ring geometry."""

    def test_encode_center_roundtrip_and_containment(self):
        import numpy as np

        from cqi_ray.geo.cells import hex_center, hex_encode

        rng = np.random.default_rng(0)
        x = rng.uniform(-1e4, 1e4, 20000)
        y = rng.uniform(-1e4, 1e4, 20000)
        c = hex_encode(x, y, 100.0)
        cx, cy = hex_center(c, 100.0)
        # every point lies within its cell's circumradius
        assert np.hypot(x - cx, y - cy).max() <= 100.0 + 1e-6
        # centers re-encode to their own cell (quantization fixpoint)
        assert (hex_encode(cx, cy, 100.0) == c).all()

    def test_kring_sizes_and_distances(self):
        import numpy as np

        from cqi_ray.geo.cells import hex_distance, hex_encode, hex_kring

        c = hex_encode(np.array([0.0, 500.0]), np.array([0.0, -250.0]),
                       50.0)
        for k, want in ((1, 7), (2, 19), (3, 37)):
            kr = hex_kring(c, k)
            assert kr.shape == (2, want)  # 3k(k+1)+1
            d = hex_distance(np.repeat(c, want), kr.ravel())
            assert (d <= k).all()
            # ring is exact: max distance in the k-ring is exactly k
            assert d.max() == k

    def test_neighbors_equidistant_centers(self):
        import numpy as np

        from cqi_ray.geo.cells import hex_center, hex_encode, hex_kring

        c = hex_encode(np.array([123.0]), np.array([456.0]), 100.0)
        ring = hex_kring(c, 1)[0]
        cx, cy = hex_center(ring, 100.0)
        x0, y0 = hex_center(c, 100.0)
        d = np.hypot(cx - x0[0], cy - y0[0])
        d = d[d > 0]  # drop self
        # all 6 neighbor centers equidistant (sqrt(3)*size)
        assert len(d) == 6
        assert np.allclose(d, np.sqrt(3.0) * 100.0)

    def test_hex_bin_query_counts(self, ray_session):
        from cqi_ray.queries import q_hex_bin

        out = q_hex_bin("/root/testdata/sf0.001").to_pandas()
        assert out["n_images"].sum() == 500  # every image binned once
        assert (out["n_images"] > 0).all()
        # skewed centers produce a non-trivial histogram
        assert len(out) > 10
        assert out["n_images"].max() > out["n_images"].median()
