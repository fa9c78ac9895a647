"""Unit tests for the scalar tag kernels and geometry/projection kernels."""

import numpy as np
import pytest

from cqi_ray import tags as T
from cqi_ray.params import DEFAULT_PARAMS as P
from cqi_ray.geo import proj, lines


class TestTags:
    def test_to_number(self):
        assert T.to_number("30") == 30.0
        assert T.to_number("6.5 m") is None
        assert T.to_number(None) is None
        assert T.to_number(7) == 7.0

    def test_coalesce_tag(self):
        row = {"cycleway:left:width": "1.5", "cycleway:width": "2.0"}
        assert T.coalesce_tag(row, "width", "cycleway", "left", "float") == 1.5
        assert T.coalesce_tag(row, "width", "cycleway", "right", "float") == 2.0
        assert T.coalesce_tag({}, "width", "cycleway", "left", "float") is None
        assert T.coalesce_tag({"cycleway:width": "x"}, "width", "cycleway", "left", "float") is None

    def test_access_chain(self):
        assert T.access_value({"bicycle": "no"}, "bicycle") == "no"
        assert T.access_value({"vehicle": "private"}, "bicycle") == "private"
        assert T.access_value({"access": "private"}, "bicycle") == "private"
        assert T.access_value({"access": "no", "bicycle": "yes"}, "bicycle") == "yes"

    def test_split_values(self):
        assert T.split_values("a;b;c", ";") == ["a", "b", "c"]
        assert T.split_values("1.5||2", "|", "float") == [1.5, 0, 2.0]

    def test_weakest_surface(self):
        order = P.surface_rank_order
        assert T.weakest_surface(["asphalt", "sand"], order) == "sand"
        assert T.weakest_surface(["nope"], order) is None
        assert T.weakest_surface(["sett", "asphalt"], order) == "sett"

    def test_effective_maxspeed(self):
        assert T.effective_maxspeed("walk", "residential") == 10
        assert T.effective_maxspeed("none", "primary") == 299
        assert T.effective_maxspeed(None, "living_street") == 10
        assert T.effective_maxspeed("50", "primary") == 50.0

    def test_fill_left_right(self):
        assert T.fill_left_right("x", None, "r") == ("x", "r")
        assert T.fill_left_right(None, None, None) == (None, None)


class TestProjection:
    def test_roundtrip(self):
        lon = np.array([13.5, 13.4, 12.0, 15.0])
        lat = np.array([51.05, 52.5, 50.0, 54.0])
        x, y = proj.lonlat_to_utm(lon, lat)
        lon2, lat2 = proj.utm_to_lonlat(x, y)
        assert np.allclose(lon, lon2, atol=1e-9)
        assert np.allclose(lat, lat2, atol=1e-9)

    def test_known_point(self):
        # central meridian, k0 scaling: easting must be 500km exactly
        x, y = proj.lonlat_to_utm(np.array([15.0]), np.array([51.0]))
        assert abs(x[0] - 500_000.0) < 1e-6
        # one degree of latitude ~ 111.2 km of northing near 51N
        x2, y2 = proj.lonlat_to_utm(np.array([15.0]), np.array([52.0]))
        assert 110_500 < (y2[0] - y[0]) < 112_000

    def test_metric_distances(self):
        # 0.0001 deg of longitude at 51.05N is ~7.0 m
        (x1, y1) = proj.lonlat_to_utm(np.array([13.5]), np.array([51.05]))
        (x2, y2) = proj.lonlat_to_utm(np.array([13.5001]), np.array([51.05]))
        d = float(np.hypot(x2 - x1, y2 - y1))
        assert 6.9 < d < 7.1


class TestLines:
    def test_length_and_sampling(self):
        line = np.array([[0.0, 0.0], [250.0, 0.0]])
        assert lines.line_length(line) == 250.0
        pts = lines.points_along_line(line, 100.0)
        assert np.allclose(pts, [[0, 0], [100, 0], [200, 0]])

    def test_sampling_exact_multiple(self):
        pts = lines.points_along_line(np.array([[0.0, 0.0], [200.0, 0.0]]), 100.0)
        assert np.allclose(pts, [[0, 0], [100, 0], [200, 0]])

    def test_point_distance(self):
        line = np.array([[0.0, 0.0], [10.0, 0.0]])
        assert lines.point_to_polyline_distance(np.array([5.0, 3.0]), line) == 3.0
        assert lines.point_to_polyline_distance(np.array([-4.0, 3.0]), line) == 5.0

    def test_pairwise_distance(self):
        pts = np.array([[0.0, 1.0], [20.0, 0.0]])
        a = np.array([[0.0, 0.0]])
        b = np.array([[10.0, 0.0]])
        d = lines.points_to_segments_distance(pts, a, b)
        assert d.shape == (2, 1)
        assert d[0, 0] == 1.0 and d[1, 0] == 10.0

    def test_offset(self):
        line = np.array([[0.0, 0.0], [10.0, 0.0]])
        left = lines.offset_polyline(line, 2.0)
        assert np.allclose(left, [[0, 2], [10, 2]])
        right = lines.offset_polyline(line, -2.0)
        assert np.allclose(right, [[0, -2], [10, -2]])

    def test_realistic_offset_fanout_geometry(self):
        """End-to-end realistic-offset fan-out (reference:
        calculate_offset_cycleway/_sidewalk, cycling_quality_index.py
        :254-266): side rows carry geometry displaced by width/2
        (cycleway) resp. width/2 + 2 (sidewalk), left positive /
        right negative, parent geometry untouched."""
        from dataclasses import replace

        from cqi_ray.offsets import fan_out
        from cqi_ray.params import DEFAULT_PARAMS

        p = replace(DEFAULT_PARAMS, offset_distance="realistic")
        geom = np.array([[0.0, 0.0], [50.0, 0.0], [100.0, 0.0]])
        row = {
            "id": "w1", "highway": "residential", "width": "8",
            "cycleway:both": "track", "sidewalk:both:bicycle": "yes",
            "geometry_m": geom,
        }
        out = fan_out(dict(row), p)
        kinds = sorted((r.get("type"), r.get("side")) for r in out[1:])
        assert kinds == [("cycleway", "left"), ("cycleway", "right"),
                         ("sidewalk", "left"), ("sidewalk", "right")]
        assert np.array_equal(out[0]["geometry_m"], geom)  # parent intact
        for r in out[1:]:
            expect = 4.0 if r["type"] == "cycleway" else 6.0  # 8/2 (+2)
            assert r["offset"] == expect
            sign = 1.0 if r["side"] == "left" else -1.0
            g = r["geometry_m"]
            assert g.shape == geom.shape
            # straight line: every vertex displaced exactly offset in y
            assert np.allclose(g[:, 1], sign * expect)
            assert np.allclose(g[:, 0], geom[:, 0])

    def test_realistic_offset_default_width_fallback(self):
        """Ways without a width tag offset by the per-class default
        width (or the global fallback when the class is unknown)."""
        from dataclasses import replace

        from cqi_ray.offsets import fan_out
        from cqi_ray.params import DEFAULT_PARAMS

        p = replace(DEFAULT_PARAMS, offset_distance="realistic")
        geom = np.array([[0.0, 0.0], [10.0, 0.0]])
        row = {"id": "w2", "highway": "residential",
               "cycleway:right": "lane", "geometry_m": geom}
        out = fan_out(dict(row), p)
        side = [r for r in out[1:] if r["side"] == "right"]
        assert len(side) == 1
        want = p.default_highway_width.get(
            "residential", p.default_highway_width_fallback) / 2
        assert side[0]["offset"] == want
        assert np.allclose(side[0]["geometry_m"][:, 1], -want)


class TestUTMZones:
    def test_zone_selection(self):
        assert proj.utm_zone_for(13.5) == 33
        assert proj.utm_zone_for(-0.1) == 30
        assert proj.utm_zone_for(179.9) == 60
        assert proj.utm_zone_for(-179.9) == 1

    def test_roundtrip_other_zones(self):
        for lon, lat in [(-74.0, 40.7), (139.7, 35.7), (2.35, 48.85)]:
            z = proj.utm_zone_for(lon)
            x, y = proj.lonlat_to_utm(np.array([lon]), np.array([lat]), zone=z)
            lon2, lat2 = proj.utm_to_lonlat(x, y, zone=z)
            assert abs(lon2[0] - lon) < 1e-9 and abs(lat2[0] - lat) < 1e-9
