"""Unit tests for the as-of and interval-join whole-bucket kernels
(cqi_ray/ops/temporal.py) against brute-force reference loops."""

import numpy as np
import pandas as pd
import pytest

from cqi_ray.ops.temporal import asof_last_prior, range_count, ts_to_us


def _mk(keys, tss, kinds, rids):
    return pd.DataFrame({"key": np.asarray(keys, dtype=np.int64),
                         "ts_us": np.asarray(tss, dtype=np.int64),
                         "kind": np.asarray(kinds, dtype=np.int8),
                         "row_id": np.asarray(rids, dtype=np.int64)})


class TestAsof:
    def test_basic(self):
        # build (kind 0) at t=10,30 for key 1; probes at 5, 10, 35
        df = _mk([1, 1, 1, 1, 1], [10, 30, 5, 10, 35],
                 [0, 0, 1, 1, 1], [-1, -1, 100, 101, 102])
        out = asof_last_prior(df).set_index("row_id")["match_ts_us"]
        assert out[100] == -1          # nothing at or before 5
        assert out[101] == 10          # inclusive at equal ts
        assert out[102] == 30

    def test_key_isolation(self):
        # build rows of another key must never match
        df = _mk([1, 2], [10, 50], [0, 1], [-1, 200])
        out = asof_last_prior(df)
        assert out.set_index("row_id")["match_ts_us"][200] == -1

    def test_random_vs_brute_force(self):
        rng = np.random.default_rng(3)
        n_b, n_p = 200, 150
        bk = rng.integers(0, 10, n_b)
        bt = rng.integers(0, 1000, n_b)
        pk = rng.integers(0, 12, n_p)
        pt = rng.integers(0, 1000, n_p)
        df = pd.concat([_mk(bk, bt, np.zeros(n_b), -np.ones(n_b)),
                        _mk(pk, pt, np.ones(n_p), np.arange(n_p))],
                       ignore_index=True)
        got = asof_last_prior(df).set_index("row_id")["match_ts_us"]
        for i in range(n_p):
            cand = bt[(bk == pk[i]) & (bt <= pt[i])]
            assert got[i] == (cand.max() if len(cand) else -1)

    def test_empty(self):
        out = asof_last_prior(_mk([], [], [], []))
        assert len(out) == 0


class TestRangeCount:
    @pytest.mark.parametrize("window", [1, 7, 100])
    def test_random_vs_brute_force(self, window):
        rng = np.random.default_rng(window)
        n_b, n_p = 250, 120
        bk = rng.integers(0, 8, n_b)
        bt = rng.integers(0, 300, n_b)
        pk = rng.integers(0, 10, n_p)
        pt = rng.integers(0, 300, n_p)
        df = pd.concat([_mk(pk, pt, np.zeros(n_p), np.arange(n_p)),
                        _mk(bk, bt, np.ones(n_b), -np.ones(n_b))],
                       ignore_index=True)
        got = range_count(df, window).set_index("row_id")["n_in_window"]
        for i in range(n_p):
            lo, hi = pt[i], pt[i] + window
            assert got[i] == int(((bk == pk[i]) & (bt >= lo)
                                  & (bt < hi)).sum()), i

    def test_boundaries_half_open(self):
        # build at exactly ts counts; at exactly ts+window does not
        df = pd.concat([_mk([1], [10], [0], [0]),
                        _mk([1, 1], [10, 15], [1, 1], [-1, -1])],
                       ignore_index=True)
        assert range_count(df, 5)["n_in_window"].iloc[0] == 1

    def test_empty(self):
        out = range_count(_mk([], [], [], []), 10)
        assert len(out) == 0


class TestTsToUs:
    def test_unit_safe(self):
        s_us = pd.Series(pd.to_datetime([1_000_000], unit="us"))
        s_ns = s_us.astype("datetime64[ns]")
        assert ts_to_us(s_us).tolist() == [1_000_000]
        assert ts_to_us(s_ns).tolist() == [1_000_000]
