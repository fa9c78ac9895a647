"""Property-based tests (hypothesis) for the foundational kernels."""

import numpy as np
from hypothesis import given, settings, strategies as st

from cqi_ray import tags as T
from cqi_ray.geo import cells, lines, proj
from cqi_ray.params import DEFAULT_PARAMS as P


lon_st = st.floats(min_value=-179.99, max_value=179.99, allow_nan=False)
lat_st = st.floats(min_value=-84.0, max_value=84.0, allow_nan=False)
# UTM zone 33 validity band (the engine's processing CRS)
z33_lon = st.floats(min_value=9.0, max_value=21.0, allow_nan=False)
z33_lat = st.floats(min_value=40.0, max_value=70.0, allow_nan=False)


class TestProjectionProperties:
    @given(z33_lon, z33_lat)
    @settings(max_examples=200, deadline=None)
    def test_utm_roundtrip(self, lon, lat):
        x, y = proj.lonlat_to_utm(np.array([lon]), np.array([lat]))
        lon2, lat2 = proj.utm_to_lonlat(x, y)
        assert abs(lon2[0] - lon) < 1e-9
        assert abs(lat2[0] - lat) < 1e-9

    @given(z33_lon, z33_lat, st.floats(min_value=1, max_value=500))
    @settings(max_examples=100, deadline=None)
    def test_metric_distance_locally_consistent(self, lon, lat, metres):
        # moving `metres` east in UTM then inverting lands ~metres away
        x, y = proj.lonlat_to_utm(np.array([lon]), np.array([lat]))
        lon2, lat2 = proj.utm_to_lonlat(x + metres, y)
        x2, y2 = proj.lonlat_to_utm(lon2, lat2)
        assert abs(float(np.hypot(x2 - x, y2 - y)) - metres) < 1e-6


class TestCellProperties:
    @given(lon_st, lat_st, st.integers(min_value=0, max_value=cells.MAX_RES))
    @settings(max_examples=300, deadline=None)
    def test_encode_decode_bounds(self, lon, lat, res):
        c = cells.encode(np.array([lon]), np.array([lat]), res)
        assert cells.resolution(c)[0] == res
        lon0, lat0, lon1, lat1 = cells.cell_bounds(c)
        # float reconstruction of bounds can be 1 ulp off the integer floor
        assert lon0[0] - 1e-9 <= lon <= lon1[0] + 1e-9
        assert lat0[0] - 1e-9 <= lat <= lat1[0] + 1e-9

    @given(lon_st, lat_st, st.integers(min_value=1, max_value=cells.MAX_RES))
    @settings(max_examples=200, deadline=None)
    def test_parent_is_prefix(self, lon, lat, res):
        c = cells.encode(np.array([lon]), np.array([lat]), res)
        p = cells.parent(c)
        assert p[0] == cells.encode(np.array([lon]), np.array([lat]), res - 1)[0]


class TestTagProperties:
    @given(st.floats(allow_nan=True, allow_infinity=True) | st.text(max_size=8)
           | st.none() | st.integers())
    @settings(max_examples=200, deadline=None)
    def test_to_number_never_raises(self, value):
        out = T.to_number(value)
        assert out is None or isinstance(out, float)

    @given(st.lists(st.sampled_from(list(P.surface_rank_order) + ["junk", ""]),
                    max_size=6))
    @settings(max_examples=200, deadline=None)
    def test_weakest_surface_member_or_none(self, values):
        out = T.weakest_surface(values, P.surface_rank_order)
        assert out is None or out in values

    @given(st.text(alphabet="ab;|,1.5 ", max_size=30), st.sampled_from([";", "|"]))
    @settings(max_examples=200, deadline=None)
    def test_split_values_rejoin(self, s, deli):
        parts = T.split_values(s, deli)
        assert deli.join(parts) == s


class TestLineProperties:
    @given(st.lists(st.tuples(st.floats(-1e5, 1e5), st.floats(-1e5, 1e5)),
                    min_size=2, max_size=6),
           st.floats(min_value=1, max_value=500))
    @settings(max_examples=200, deadline=None)
    def test_sampling_points_lie_near_line(self, pts, spacing):
        line = np.asarray(pts, dtype=np.float64)
        samples = lines.points_along_line(line, spacing)
        assert len(samples) >= 1
        for s in samples:
            assert lines.point_to_polyline_distance(s, line) < 1e-6

    @given(st.lists(st.tuples(st.floats(-1e4, 1e4), st.floats(-1e4, 1e4)),
                    min_size=2, max_size=5))
    @settings(max_examples=200, deadline=None)
    def test_distance_nonnegative_and_zero_on_vertex(self, pts):
        line = np.asarray(pts, dtype=np.float64)
        assert lines.point_to_polyline_distance(line[0], line) < 1e-9
        d = lines.points_to_segments_distance(line, line[:-1], line[1:])
        assert (d >= 0).all()


class TestScoringTotality:
    """The scorer must never raise, whatever tag soup arrives."""

    @given(st.dictionaries(
        st.sampled_from(["highway", "bicycle", "cycleway", "cycleway:right",
                         "width", "maxspeed", "surface", "smoothness", "lit",
                         "oneway", "lanes", "cycleway:width", "parking:left",
                         "traffic_sign", "segregated", "footway", "lane_markings"]),
        st.one_of(st.none(), st.text(max_size=10),
                  st.sampled_from(["yes", "no", "lane", "track", "3", "-1",
                                   "asphalt", "50", "walk", "none", "2.5 m"])),
        max_size=10))
    @settings(max_examples=300, deadline=None)
    def test_score_row_total(self, tag_soup):
        from cqi_ray import scoring
        from cqi_ray.params import INPUT_TAG_COLUMNS

        row = {c: None for c in INPUT_TAG_COLUMNS}
        row.update(tag_soup)
        row.update({"id": "x", "side": None, "type": None,
                    "proc_sidepath": None, "proc_highway": None,
                    "proc_maxspeed": None})
        wt = scoring.classify_way_type(row)
        if wt == scoring.DROP:
            return
        row["way_type"] = wt
        out = scoring.score_row(dict(row))
        assert out["filter_usable"] in (0, 1)
        if out["index"] is not None:
            assert 0 <= out["index"] <= 100
        if out["stress_level"] is not None:
            assert 1 <= out["stress_level"] <= 4


class TestSkylineProperties:
    @given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                    min_size=0, max_size=120))
    @settings(max_examples=200, deadline=None)
    def test_skyline_matches_bruteforce(self, pts):
        from cqi_ray.queries import _skyline_2d

        price = np.array([p for p, _ in pts], dtype=np.int64)
        size = np.array([s for _, s in pts], dtype=np.int64)
        got = _skyline_2d(price, size)
        for i in range(len(pts)):
            dominated = any(
                price[j] <= price[i] and size[j] >= size[i]
                and (price[j] < price[i] or size[j] > size[i])
                for j in range(len(pts)))
            assert got[i] == (not dominated), (i, pts)

    @given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                    min_size=1, max_size=120))
    @settings(max_examples=50, deadline=None)
    def test_local_skyline_is_lossless_combiner(self, pts):
        """Global skyline of (local skylines' union) == global skyline —
        the property q_skyline's distributed plan relies on."""
        from cqi_ray.queries import _skyline_2d

        price = np.array([p for p, _ in pts], dtype=np.int64)
        size = np.array([s for _, s in pts], dtype=np.int64)
        whole = set(map(tuple, np.c_[price, size][_skyline_2d(price, size)]))
        half = len(pts) // 2
        keep = np.zeros(len(pts), dtype=bool)
        for sl in (slice(0, half), slice(half, None)):
            m = _skyline_2d(price[sl], size[sl])
            keep[np.arange(len(pts))[sl][m]] = True
        p2, s2 = price[keep], size[keep]
        merged = set(map(tuple, np.c_[p2, s2][_skyline_2d(p2, s2)]))
        assert merged == whole


class TestSegmentJoinProperties:
    def test_matches_bruteforce_on_synthetic_tables(self, ray_session,
                                                    tmp_path):
        """q_segment_join (cell fan-out + responsible-cell dedup) must
        equal the O(n*m) orientation brute force for several key sets —
        including keys whose segments straddle cell borders."""
        import pandas as pd

        from cqi_ray.queries import q_segment_join

        for seed in (1, 2, 3):
            rng = np.random.default_rng(seed)
            ck = np.unique(rng.integers(1, 40_000, size=400).astype(np.int64))
            sk = np.unique(rng.integers(1, 40_000, size=80).astype(np.int64))
            d = tmp_path / f"s{seed}"
            d.mkdir()
            pd.DataFrame({"c_custkey": ck}).to_parquet(d / "customer.parquet")
            pd.DataFrame({"s_suppkey": sk}).to_parquet(d / "supplier.parquet")

            got = q_segment_join(str(d)).to_pandas()
            got = set(zip(got["c_custkey"], got["s_suppkey"]))

            def seg(kk, mx, my, mdx, mdy):
                x1 = (kk * mx) % 1000
                y1 = (kk * my) % 1000
                return x1, y1, x1 + (kk * mdx) % 41 - 20, \
                    y1 + (kk * mdy) % 41 - 20

            ax1, ay1, ax2, ay2 = seg(ck[:, None], 37, 91, 13, 7)
            bx1, by1, bx2, by2 = seg(sk[None, :], 211, 457, 19, 11)
            d1 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
            d2 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
            d3 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
            d4 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
            hit = (np.sign(d1) * np.sign(d2) < 0) \
                & (np.sign(d3) * np.sign(d4) < 0)
            want = {(int(ck[i]), int(sk[j]))
                    for i, j in zip(*np.nonzero(hit))}
            assert got == want


class TestCCLProperties:
    @staticmethod
    def _brute_components(ix, iy, width):
        """BFS ground truth: {min_cell_id: set(cells)} per 4-connected
        component."""
        occ = set(zip(ix.tolist(), iy.tolist()))
        seen, comps = set(), {}
        for p in sorted(occ):
            if p in seen:
                continue
            stack, comp = [p], set()
            seen.add(p)
            while stack:
                x, y = stack.pop()
                comp.add(x * width + y)
                for q in ((x - 1, y), (x + 1, y), (x, y - 1), (x, y + 1)):
                    if q in occ and q not in seen:
                        seen.add(q)
                        stack.append(q)
            comps[min(comp)] = comp
        return comps

    @given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                    min_size=0, max_size=120))
    @settings(max_examples=150, deadline=None)
    def test_label_cells_matches_bfs(self, pts):
        from cqi_ray.ops.ccl import label_cells

        width = 16
        ix = np.array([p[0] for p in pts], dtype=np.int64)
        iy = np.array([p[1] for p in pts], dtype=np.int64)
        lin, roots = label_cells(ix, iy, width)
        got = {}
        for c, r in zip(lin.tolist(), roots.tolist()):
            got.setdefault(r, set()).add(c)
        assert got == self._brute_components(ix, iy, width)

    @given(st.lists(st.tuples(st.integers(0, 31), st.integers(0, 31)),
                    min_size=0, max_size=400))
    @settings(max_examples=60, deadline=None)
    def test_tile_merge_matches_whole_grid(self, pts):
        """Tiled labeling + boundary-equivalence fold == one-shot
        labeling of the whole grid (the distributed-plan invariant)."""
        from cqi_ray.ops.ccl import label_cells, merge_equivalences

        width, tile = 32, 8
        ix = np.array([p[0] for p in pts], dtype=np.int64)
        iy = np.array([p[1] for p in pts], dtype=np.int64)
        lin_g, roots_g = label_cells(ix, iy, width)
        whole = dict(zip(lin_g.tolist(), roots_g.tolist()))

        # tiled pass
        cell_root, anchors, probes = {}, {}, []
        tid = (ix // tile) * (width // tile) + (iy // tile)
        for t in np.unique(tid):
            m = tid == t
            lin, roots = label_cells(ix[m], iy[m], width)
            gx, gy = lin // width, lin % width
            for c, r, x, y in zip(lin.tolist(), roots.tolist(),
                                  gx.tolist(), gy.tolist()):
                cell_root[c] = r
                if x % tile == 0 or y % tile == 0:
                    anchors[c] = r
                if x % tile == tile - 1 and x < width - 1:
                    probes.append((c + width, r))
                if y % tile == tile - 1 and y < width - 1:
                    probes.append((c + 1, r))
        pairs = [(r, anchors[k]) for k, r in probes if k in anchors]
        rootmap = merge_equivalences(pairs)
        merged = {c: rootmap.get(r, r) for c, r in cell_root.items()}
        assert merged == whole


class TestDPSimplifyProperties:
    @staticmethod
    def _brute(c, tol, i, j, keep):
        """Textbook recursive Douglas–Peucker (infinite-line distance)."""
        if j <= i + 1:
            return
        a, b = c[i], c[j]
        ab = b - a
        l2 = float(ab @ ab)
        best_d, best_k = -1.0, -1
        for k in range(i + 1, j):
            if l2 == 0.0:
                d = float(np.hypot(*(c[k] - a)))
            else:
                t = float((c[k] - a) @ ab) / l2
                d = float(np.hypot(*(c[k] - (a + t * ab))))
            if d > best_d:
                best_d, best_k = d, k
        if best_d > tol:
            keep[best_k] = True
            TestDPSimplifyProperties._brute(c, tol, i, best_k, keep)
            TestDPSimplifyProperties._brute(c, tol, best_k, j, keep)

    @given(st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)),
                    min_size=2, max_size=40),
           st.floats(min_value=0.01, max_value=50.0))
    @settings(max_examples=200, deadline=None)
    def test_matches_recursive_reference(self, pts, tol):
        from cqi_ray.geo.lines import dp_simplify

        c = np.array(pts, dtype=np.float64)
        keep = dp_simplify(c, tol)
        ref = np.zeros(len(c), dtype=bool)
        ref[0] = ref[-1] = True
        self._brute(c, tol, 0, len(c) - 1, ref)
        assert (keep == ref).all()

    @given(st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)),
                    min_size=2, max_size=40))
    @settings(max_examples=50, deadline=None)
    def test_idempotent(self, pts):
        from cqi_ray.geo.lines import dp_simplify

        c = np.array(pts, dtype=np.float64)
        keep = dp_simplify(c, 1.0)
        again = dp_simplify(c[keep], 1.0)
        assert again.all()  # simplifying a simplified line keeps all points


class TestHullProperties:
    @given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                    min_size=1, max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_contains_all_and_vertices_are_inputs(self, pts):
        from cqi_ray.geo.hull import convex_hull, point_in_hull

        p = np.array(pts, dtype=np.float64)
        h = convex_hull(p)
        pset = {tuple(q) for q in p.tolist()}
        assert all(tuple(v) in pset for v in h.tolist())
        assert all(point_in_hull(q, h) for q in p)

    @given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                    min_size=1, max_size=40),
           st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                    min_size=1, max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_lossless_combiner_law(self, a, b):
        """hull(hull(A) ∪ hull(B)) == hull(A ∪ B) — the law that makes
        per-block pre-hulling a valid combiner before the shuffle."""
        from cqi_ray.geo.hull import convex_hull

        pa = np.array(a, dtype=np.float64)
        pb = np.array(b, dtype=np.float64)
        ha, hb = convex_hull(pa), convex_hull(pb)
        merged = convex_hull(np.vstack([ha, hb]))
        direct = convex_hull(np.vstack([pa, pb]))
        assert {tuple(q) for q in merged.tolist()} \
            == {tuple(q) for q in direct.tolist()}

    @given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                    min_size=3, max_size=60))
    @settings(max_examples=100, deadline=None)
    def test_convexity(self, pts):
        from cqi_ray.geo.hull import convex_hull

        h = convex_hull(np.array(pts, dtype=np.float64))
        n = len(h)
        if n < 3:
            return
        for i in range(n):
            o, a, b = h[i], h[(i + 1) % n], h[(i + 2) % n]
            cr = (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])
            assert cr > 0  # strictly convex CCW (collinear dropped)


class TestHilbertProperties:
    def test_exhaustive_bijection_and_unit_steps(self):
        """Order-5 exhaustive: every cell visited once, consecutive keys
        are grid neighbors (THE Hilbert locality property Morton lacks)."""
        from cqi_ray.geo.cells import hilbert_xy2d

        o = 5
        n = 1 << o
        xx, yy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = hilbert_xy2d(o, xx.ravel(), yy.ravel())
        assert sorted(d.tolist()) == list(range(n * n))
        order = np.argsort(d)
        px, py = xx.ravel()[order], yy.ravel()[order]
        step = np.abs(np.diff(px)) + np.abs(np.diff(py))
        assert (step == 1).all()

    @given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                    min_size=1, max_size=100))
    @settings(max_examples=50, deadline=None)
    def test_vectorized_matches_scalar(self, pts):
        """Batch kernel == per-point textbook scalar loop (order 8)."""
        from cqi_ray.geo.cells import hilbert_xy2d

        def scalar(o, x, y):
            nn = 1 << o
            d, s = 0, 1 << (o - 1)
            while s > 0:
                rx = 1 if (x & s) > 0 else 0
                ry = 1 if (y & s) > 0 else 0
                d += s * s * ((3 * rx) ^ ry)
                if ry == 0:
                    if rx == 1:
                        x, y = nn - 1 - x, nn - 1 - y
                    x, y = y, x
                s //= 2
            return d

        xs = np.array([p[0] for p in pts], dtype=np.int64)
        ys = np.array([p[1] for p in pts], dtype=np.int64)
        got = hilbert_xy2d(8, xs, ys)
        want = [scalar(8, int(a), int(b)) for a, b in pts]
        assert got.tolist() == want
