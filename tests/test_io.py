"""IO layer: multi-file merge + geometry dedup, GeoJSON sink, CLI."""

import json
import os

import pytest


class TestKindDetection:
    def test_raw_vs_processed_autodetect(self):
        from cqi_ray.io.geojson import detect_ways_kind, read_ways_auto

        raw_path = os.path.join(os.path.dirname(__file__), "data",
                                "test_ways.geojson")
        proc_path = os.path.join(os.path.dirname(__file__), "data",
                                 "golden_scores.geojson")
        assert detect_ways_kind(raw_path) == "raw"
        assert detect_ways_kind(proc_path) == "processed"

        kind, rows = read_ways_auto(raw_path)
        assert kind == "raw" and len(rows) == 138
        assert "way_type" not in rows[0]

        kind, rows = read_ways_auto(proc_path)
        assert kind == "processed" and len(rows) == 164
        assert "way_type" in rows[0] and "index" in rows[0]

        # list / dict forms
        assert detect_ways_kind(rows) == "processed"
        assert detect_ways_kind({"features": []}) == "raw"


class TestMerge:
    def test_multi_file_merge_dedup(self, tmp_path, corpus_rows):
        from cqi_ray.io.geojson import write_ways_geojson
        from cqi_ray.io.merge import merge_way_sources

        half = len(corpus_rows) // 2
        # file2 overlaps file1 by 10 geometries
        f1 = str(tmp_path / "a.geojson")
        f2 = str(tmp_path / "b.geojson")
        cols = ["id", "highway"]
        write_ways_geojson(f1, corpus_rows[:half], cols)
        write_ways_geojson(f2, corpus_rows[half - 10:], cols)
        merged = merge_way_sources([f1, f2])
        assert len(merged) == len(corpus_rows)
        # first-file occurrence wins
        ids = [r["id"] for r in merged]
        assert ids[:half] == [r["id"] for r in corpus_rows[:half]]

    def test_dedup_exact_geometry(self):
        from cqi_ray.io.merge import dedup_geometries

        rows = [
            {"id": "a", "geometry": [[0.0, 0.0], [1.0, 1.0]]},
            {"id": "b", "geometry": [[0.0, 0.0], [1.0, 1.0]]},
            {"id": "c", "geometry": [[1.0, 1.0], [0.0, 0.0]]},  # reversed: distinct
        ]
        out = dedup_geometries(rows)
        assert [r["id"] for r in out] == ["a", "c"]


class TestGeoJSONSink:
    def test_scores_roundtrip(self, ray_session, tmp_path, corpus_rows, golden_rows):
        from cqi_ray.io.geojson import scores_dataset_to_geojson
        from cqi_ray.pipelines.cqi import dataset_from_rows, score_ways_dataset

        path = str(tmp_path / "scores.geojson")
        scores = score_ways_dataset(dataset_from_rows(corpus_rows))
        n = scores_dataset_to_geojson(scores, path)
        assert n == 164
        doc = json.load(open(path))
        assert doc["crs"]["properties"]["name"].endswith("4326")
        by_key = {(f["properties"]["id"], f["properties"].get("side")): f
                  for f in doc["features"]}
        assert set(by_key) == set(golden_rows)
        for key, g in list(golden_rows.items())[:20]:
            p = by_key[key]["properties"]
            assert p["index"] == g["index"]
            assert p["way_type"] == g["way_type"]
        # geometry back in lon/lat range
        lon, lat = doc["features"][0]["geometry"]["coordinates"][0]
        assert 13 < lon < 14 and 50 < lat < 52


class TestCLI:
    def test_score_command(self, ray_session, tmp_path, golden_rows):
        from cqi_ray.__main__ import cmd_score

        class Args:
            input = [os.path.join(os.path.dirname(__file__), "data",
                                  "test_ways.geojson")]
            output = str(tmp_path / "cli_scores.geojson")
            format = "geojson"
            cpus = 4

        assert cmd_score(Args()) == 0
        doc = json.load(open(Args.output))
        assert len(doc["features"]) == 164
