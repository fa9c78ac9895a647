"""Round-4 shuffle-core hardening: byte-based auto bucket sizing, the
oversized-bucket secondary-split guard, and the checkpoint robustness
contract (lineage-keyed payload names, payload validation at scan,
typed-empty resume).

The guard's correctness claim — per-key semantics are granularity-
invariant, so re-splitting a bucket by a secondary key hash never
changes the result — is pinned here by forcing microscopic bucket
budgets and comparing bit-for-bit against the unguarded output.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from cqi_ray.relational import (bucketed_hash_join, grouped_map_buckets,
                                global_row_number, task_hash_join,
                                _ckpt_payload_name, _ckpt_scan)


def _fact(n=20_000, groups=500, payload=32, blocks=8):
    rng = np.arange(n, dtype=np.int64)
    df = pd.DataFrame({
        "k": rng % groups,
        "v": (rng * 7919) % 100_000,
        "s": pd.Series([("x" * payload) + str(i % groups) for i in rng],
                       dtype=object),
    })
    return rd.from_pandas(df).repartition(blocks), df


def _group_stats(df):
    return (df.groupby("k", as_index=False)
            .agg(n=("v", "size"), sv=("v", "sum"))
            .sort_values("k").reset_index(drop=True))


def _make_gb_fn():
    """Closure (pickled by value — test modules are not importable on
    workers): per-key aggregate used across the guard tests."""
    def gb(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False).agg(n=("v", "size"),
                                                  sv=("v", "sum"))
    return gb


_gb_fn = _make_gb_fn()


class TestBucketGuard:
    def test_tiny_budget_forces_splits_output_identical(self, ray_session):
        """A bucket budget far below the data size forces the secondary
        split on every bucket; output must equal the unguarded run."""
        ds, df = _fact()
        want = _group_stats(df)
        base = grouped_map_buckets(ds, ["k"], _gb_fn, num_buckets=4) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        forced = grouped_map_buckets(
            ds, ["k"], _gb_fn, num_buckets=4,
            target_bucket_bytes=4096).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(base, want)
        pd.testing.assert_frame_equal(forced, want)

    def test_tiny_budget_whole_bucket_identical(self, ray_session):
        ds, df = _fact()
        want = _group_stats(df)

        def wb(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("k", as_index=False).agg(n=("v", "size"),
                                                      sv=("v", "sum"))

        forced = grouped_map_buckets(
            ds, ["k"], wb, num_buckets=2, whole_bucket=True, presort=False,
            target_bucket_bytes=2048).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(forced, want)

    def test_splittable_false_disables_guard(self, ray_session):
        """splittable=False must keep whole hash buckets in one frame:
        a bucket-counting fn sees exactly num_buckets frames."""
        ds, _ = _fact(n=4000)

        def count_frame(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"rows": [len(g)]})

        out = grouped_map_buckets(
            ds, ["k"], count_frame, num_buckets=4, whole_bucket=True,
            presort=False, target_bucket_bytes=1024,
            splittable=False).to_pandas()
        assert len(out) == 4 and out["rows"].sum() == 4000

    def test_auto_bucket_sizing(self, ray_session):
        """num_buckets=None auto-sizes from measured bytes and still
        produces the exact groupby result."""
        ds, df = _fact()
        want = _group_stats(df)
        out = grouped_map_buckets(ds, ["k"], _gb_fn).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, want)

    def test_join_guard_output_identical(self, ray_session):
        left, ldf = _fact(n=10_000, groups=200)
        rdf = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                            "name": [f"g{i}" for i in range(200)]})
        right = rd.from_pandas(rdf).repartition(4)
        want = ldf.merge(rdf, on="k", how="inner")[["k", "v", "name"]] \
            .sort_values(["k", "v"]).reset_index(drop=True)
        out = task_hash_join(left.map_batches(
            lambda b: b[["k", "v"]], batch_format="pandas"),
            right, on="k", right_cols=["k", "name"], num_buckets=4,
            target_bucket_bytes=4096).to_pandas()[["k", "v", "name"]] \
            .sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(out, want)

    def test_join_auto_buckets(self, ray_session):
        left, ldf = _fact(n=5_000, groups=50)
        rdf = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                            "name": [f"g{i}" for i in range(50)]})
        right = rd.from_pandas(rdf)
        want = ldf.merge(rdf, on="k", how="left")[["k", "v", "name"]] \
            .sort_values(["k", "v"]).reset_index(drop=True)
        out = task_hash_join(left.map_batches(
            lambda b: b[["k", "v"]], batch_format="pandas"),
            right, on="k", right_cols=["k", "name"],
            num_buckets=None).to_pandas()[["k", "v", "name"]] \
            .sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(out, want)

    def test_hot_key_isolated(self, ray_session):
        """One key with 10x the bytes of every other key: the guard
        isolates it without changing the result."""
        n, groups = 30_000, 100
        k = np.arange(n, dtype=np.int64) % groups
        k[: n // 2] = 7  # half the rows on one hot key
        df = pd.DataFrame({"k": k, "v": np.arange(n, dtype=np.int64),
                           "s": pd.Series(["p" * 64] * n, dtype=object)})
        ds = rd.from_pandas(df).repartition(8)
        want = _group_stats(df)
        out = grouped_map_buckets(ds, ["k"], _gb_fn, num_buckets=2,
                                  target_bucket_bytes=64 << 10) \
            .to_pandas().sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, want)


class TestGlobalRowNumberAuto:
    def test_auto_parts(self, ray_session):
        n = 10_000
        df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                           "p": np.random.RandomState(7).permutation(n)
                           .astype(np.int64)})
        ds = rd.from_pandas(df).repartition(8)
        ranked, total = global_row_number(ds, "p", "id",
                                          target_rows=1000)
        rdf = ranked.to_pandas()
        assert total == n and len(rdf) == n
        assert (rdf.sort_values("p")["rn"].to_numpy()
                == np.arange(1, n + 1)).all()


class TestCheckpointRobustness:
    def _run(self, ds, ck, key, **kw):
        return grouped_map_buckets(
            ds, ["k"], _gb_fn, num_buckets=4, whole_bucket=True,
            presort=False, checkpoint_dir=str(ck), checkpoint_key=key,
            **kw).to_pandas().sort_values("k").reset_index(drop=True)

    def test_payload_names_lineage_keyed(self, ray_session, tmp_path):
        ds, df = _fact(n=2000)
        want = _group_stats(df)
        out = self._run(ds, tmp_path, "v1")
        pd.testing.assert_frame_equal(out, want)
        payloads = [f for f in os.listdir(tmp_path) if f.endswith(".parquet")]
        assert payloads and all(
            f == _ckpt_payload_name("v1", int(f.split("_")[1]))
            for f in payloads)

    def test_stale_key_payload_never_claimed(self, ray_session, tmp_path):
        """The ADVICE race: run v1 completes; run v2 overwrites a
        bucket's payload but crashes before its sidecar.  Under the OLD
        fixed-name scheme the v1 sidecar would now silently serve v2's
        bytes; with lineage-keyed names the v1 sidecar still points at
        v1's own intact payload and a v2 payload can never satisfy it."""
        ds, df = _fact(n=2000)
        want = _group_stats(df)
        self._run(ds, tmp_path, "v1")
        # simulate v2's payload write (crash before sidecar): a payload
        # file under v2's name appears alongside v1's artifacts
        poison = pd.DataFrame({"k": [999_999], "n": [1], "sv": [0]})
        poison.to_parquet(tmp_path / _ckpt_payload_name("v2", 0))
        out = self._run(ds, tmp_path, "v1")  # resume under v1
        pd.testing.assert_frame_equal(out, want)
        # and the v2 orphan was purged at scan time
        assert not (tmp_path / _ckpt_payload_name("v2", 0)).exists()

    def test_foreign_files_never_deleted(self, ray_session, tmp_path):
        """Regression (round-5 ADVICE): a checkpoint_dir that already
        holds unrelated parquet/json data must keep it — only files
        matching the bucket_* naming scheme are checkpoint-owned and
        purgeable.  Previously ANY *.parquet not keyed to the current
        checkpoint_key was deleted on first scan."""
        foreign_pq = tmp_path / "users_export.parquet"
        pd.DataFrame({"a": [1, 2, 3]}).to_parquet(foreign_pq)
        foreign_json = tmp_path / "run_config.json"
        foreign_json.write_text('{"note": "not a sidecar"}')
        foreign_tmp = tmp_path / "upload.tmp.part"  # '.tmp.' but foreign
        foreign_tmp.write_bytes(b"partial")
        ds, df = _fact(n=2000)
        want = _group_stats(df)
        out = self._run(ds, tmp_path, "v1")
        pd.testing.assert_frame_equal(out, want)
        assert foreign_pq.exists() and foreign_json.exists() \
            and foreign_tmp.exists()
        pd.testing.assert_frame_equal(pd.read_parquet(foreign_pq),
                                      pd.DataFrame({"a": [1, 2, 3]}))

    def test_truncated_payload_recomputed(self, ray_session, tmp_path):
        ds, df = _fact(n=2000)
        want = _group_stats(df)
        self._run(ds, tmp_path, "v1")
        # truncate one payload behind its sidecar's back
        victim = next(f for f in sorted(os.listdir(tmp_path))
                      if f.endswith(".parquet"))
        (tmp_path / victim).write_bytes(b"")
        done = _ckpt_scan(str(tmp_path), "v1", ["k"], 4)
        b = int(victim.split("_")[1])
        assert b not in done  # row-count validation rejects it
        out = self._run(ds, tmp_path, "v1")
        pd.testing.assert_frame_equal(out, want)

    def test_all_empty_output_resumes_typed_without_upstream(
            self, ray_session, tmp_path):
        """fn filters every row: the complete checkpoint must resume to
        a TYPED empty dataset without re-executing the upstream map
        (counted via a side-effect marker directory)."""
        marker = tmp_path / "exec_marks"
        marker.mkdir()
        ck = tmp_path / "ck"

        def touch(b: pd.DataFrame) -> pd.DataFrame:
            (marker / f"m_{os.getpid()}_{len(os.listdir(marker))}").touch()
            return b

        def drop_all(g: pd.DataFrame) -> pd.DataFrame:
            return g.head(0)

        ds, _ = _fact(n=500, blocks=2)
        tapped = ds.map_batches(touch, batch_format="pandas")
        out1 = grouped_map_buckets(
            tapped, ["k"], drop_all, num_buckets=4, whole_bucket=True,
            presort=False, checkpoint_dir=str(ck),
            checkpoint_key="v1").to_pandas()
        assert len(out1) == 0
        n_marks = len(os.listdir(marker))
        assert n_marks > 0
        out2 = grouped_map_buckets(
            tapped, ["k"], drop_all, num_buckets=4, whole_bucket=True,
            presort=False, checkpoint_dir=str(ck),
            checkpoint_key="v1").to_pandas()
        assert len(out2) == 0
        assert len(os.listdir(marker)) == n_marks  # upstream NOT re-run
        # the payload files themselves carry the typed (empty) schema
        payload = next(f for f in os.listdir(ck) if f.endswith(".parquet"))
        cols = pd.read_parquet(ck / payload).columns
        assert {"k", "v", "s"} <= set(cols)

    def test_auto_bucket_resume_reuses_recorded_count(self, ray_session,
                                                      tmp_path):
        """Auto-sized checkpointed shuffle: a resume must adopt the
        original run's num_buckets (recorded in the sidecars), not
        re-derive it."""
        ds, df = _fact(n=2000)
        want = _group_stats(df)
        out1 = grouped_map_buckets(
            ds, ["k"], _gb_fn, checkpoint_dir=str(tmp_path),
            checkpoint_key="v1").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(out1, want)
        sidecars = [f for f in os.listdir(tmp_path) if f.endswith(".json")]
        with open(tmp_path / sidecars[0]) as fh:
            b_recorded = json.load(fh)["num_buckets"]
        out2 = grouped_map_buckets(
            ds, ["k"], _gb_fn, checkpoint_dir=str(tmp_path),
            checkpoint_key="v1").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(out2, want)
        with open(tmp_path / sidecars[0]) as fh:
            assert json.load(fh)["num_buckets"] == b_recorded
