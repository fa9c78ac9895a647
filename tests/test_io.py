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

    def test_lineage_command(self, ray_session, tmp_path, capsys):
        """`python -m cqi_ray lineage <dir>` surfaces the per-bucket
        rows/bytes/sec sidecars of a shuffle checkpoint AND the stage
        manifest of a checkpoint_stage dir (round-5 verdict item 6)."""
        import numpy as np
        import pandas as pd
        import ray.data as rd
        from cqi_ray.__main__ import cmd_lineage
        from cqi_ray.relational import grouped_map_buckets
        from cqi_ray.state.checkpoint import checkpoint_stage

        ck = tmp_path / "shuffle_ck"
        df = pd.DataFrame({"k": np.arange(500) % 7, "v": np.arange(500)})
        out = grouped_map_buckets(
            rd.from_pandas(df), ["k"],
            lambda g: g.groupby("k", as_index=False)["v"].sum(),
            num_buckets=4, whole_bucket=True, presort=False,
            checkpoint_dir=str(ck), checkpoint_key="v1")
        assert out.count() == 7
        checkpoint_stage(lambda: rd.range(9), str(tmp_path / "stage1"),
                         stage="s1", fingerprint="f1")

        class Args:
            checkpoint_dir = str(tmp_path)

        assert cmd_lineage(Args()) == 0
        text = capsys.readouterr().out
        assert "shuffle checkpoint" in text and "num_buckets=4" in text
        assert "total rows=7" in text and "skew:" in text
        assert "stage checkpoint" in text and "row_count=9" in text
        # non-checkpoint dir: reports nothing, exit 1
        empty = tmp_path / "not_a_ckpt"
        empty.mkdir()

        class Args2:
            checkpoint_dir = str(empty)

        assert cmd_lineage(Args2()) == 1


class TestLanceGate:
    """The HAVE_LANCE import gate (no lance wheel in this env): the
    checkpoint writer must fall back to Parquet here, record the format
    in the manifest, and take the write_lance branch whenever the gate
    opens — pinned by monkeypatching the gate and the sink."""

    def test_gate_closed_writes_parquet(self, ray_session, tmp_path):
        import ray.data as rd
        from cqi_ray.state import checkpoint as ck

        assert ck.HAVE_LANCE is False  # env fact: no wheel
        out = ck.checkpoint_stage(
            lambda: rd.range(10), str(tmp_path / "s1"),
            stage="s1", fingerprint="f1")
        assert out.count() == 10
        man = ck.load_manifest(str(tmp_path / "s1"))
        assert man["format"] == "parquet"

    def test_gate_open_takes_lance_branch(self, ray_session, tmp_path,
                                          monkeypatch):
        import ray.data as rd
        from cqi_ray.state import checkpoint as ck

        calls = {}

        def fake_write_lance(self, path, *a, **kw):
            calls["write"] = path
            self.write_parquet(path)  # stand-in payload

        def fake_read(path, fmt):
            calls.setdefault("reads", []).append(fmt)
            return rd.read_parquet(path, file_extensions=["parquet"])

        monkeypatch.setattr(ck, "HAVE_LANCE", True)
        monkeypatch.setattr(rd.Dataset, "write_lance", fake_write_lance,
                            raising=False)
        monkeypatch.setattr(ck, "_read", fake_read)
        out = ck.checkpoint_stage(
            lambda: rd.range(7), str(tmp_path / "s2"),
            stage="s2", fingerprint="f1")
        assert out.count() == 7
        assert calls["write"].endswith("s2.tmp")
        man = ck.load_manifest(str(tmp_path / "s2"))
        assert man["format"] == "lance"
        assert calls["reads"][-1] == "lance"
        # the manifest must live NEXT TO the lance dataset dir, never
        # inside it (lance owns its root layout — round-5 ADVICE)
        assert os.path.exists(ck.sibling_manifest_path(str(tmp_path / "s2")))
        assert not os.path.exists(tmp_path / "s2" / ck.MANIFEST)
        # resume: same fingerprint short-circuits via the sibling manifest
        calls.clear()
        out_r = ck.checkpoint_stage(
            lambda: rd.range(7), str(tmp_path / "s2"),
            stage="s2", fingerprint="f1")
        assert out_r.count() == 7 and "write" not in calls
        # partitioned layouts stay parquet even with the gate open
        out2 = ck.checkpoint_stage(
            lambda: rd.range(8).map_batches(
                lambda b: b.assign(part=b["id"] % 2),
                batch_format="pandas"),
            str(tmp_path / "s3"), stage="s3", fingerprint="f1",
            partition_cols=["part"])
        assert out2.count() == 8
        assert ck.load_manifest(str(tmp_path / "s3"))["format"] == "parquet"
