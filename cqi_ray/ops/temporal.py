"""Temporal join operators: as-of join and interval (range) join.

Ray Data has no native as-of or range join; both are expressed here as
ONE bucketed shuffle on the equi-key (user) followed by a fully
vectorized whole-bucket merge — the same co-partitioning contract as the
spatial join (each key meets in exactly one bucket; skewed keys are the
caller's salting concern).

Both kernels use the sorted-union trick instead of composite searchsorted
keys (which overflow int64 for wide key x timestamp domains):

* as-of:  sort (key, ts, kind) with the build side first at equal ts;
  "latest prior build row" is then a running cummax of build-row indices,
  validated against the key-segment start.
* range-count: emit two probe rows per left row at [ts, ts+window); sort
  probes BEFORE build rows at equal ts; the count inside the window is a
  cumsum difference between the two probes.

Everything is numpy on the bucket frame - no per-row or per-group Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def ts_to_us(ts: pd.Series) -> np.ndarray:
    """Storage-unit-safe timestamp -> int64 microseconds (a pandas build
    may back parquet timestamps with ns or us)."""
    return ts.to_numpy().astype("datetime64[us]").astype("int64")


def asof_last_prior(bucket: pd.DataFrame) -> pd.DataFrame:
    """Whole-bucket as-of merge.

    Input columns: key (int64), ts_us (int64), kind (0 = build/right,
    1 = probe/left), row_id (int64, probe rows only).  For every probe
    row, returns the greatest build ts_us of the same key with
    ts_us <= probe ts_us, or -1.  Inclusive at equal ts (build sorts
    first), matching SQL ``ASOF LEFT JOIN ... ON l.ts >= r.ts``.
    """
    if not len(bucket):
        return pd.DataFrame({"row_id": pd.Series(dtype="int64"),
                             "match_ts_us": pd.Series(dtype="int64")})
    df = bucket.sort_values(["key", "ts_us", "kind"], kind="mergesort")
    key = df["key"].to_numpy()
    ts = df["ts_us"].to_numpy()
    kind = df["kind"].to_numpy()
    n = len(df)
    idx = np.arange(n, dtype=np.int64)
    is_build = kind == 0
    last_build = np.maximum.accumulate(np.where(is_build, idx, -1))
    # first index of each key segment, broadcast to every row of the run
    new_seg = np.empty(n, dtype=bool)
    new_seg[0] = True
    new_seg[1:] = key[1:] != key[:-1]
    seg_start = np.maximum.accumulate(np.where(new_seg, idx, -1))
    valid = (last_build >= seg_start) & ~is_build
    probe = ~is_build
    match = np.where(valid[probe],
                     ts[np.clip(last_build[probe], 0, None)], -1)
    return pd.DataFrame({"row_id": df["row_id"].to_numpy()[probe],
                         "match_ts_us": match.astype("int64")})


def range_count(bucket: pd.DataFrame, window_us: int) -> pd.DataFrame:
    """Whole-bucket interval-join count.

    Input columns: key, ts_us, kind (0 = probe/left, 1 = build/right),
    row_id (probe rows only).  For every probe row, counts build rows of
    the same key with ts_us in [probe_ts, probe_ts + window_us).
    """
    if not len(bucket):
        return pd.DataFrame({"row_id": pd.Series(dtype="int64"),
                             "n_in_window": pd.Series(dtype="int64")})
    probe = bucket[bucket["kind"] == 0]
    build = bucket[bucket["kind"] == 1]
    np_key = probe["key"].to_numpy()
    np_ts = probe["ts_us"].to_numpy()
    rid = probe["row_id"].to_numpy()
    # two probe events per left row; probes sort before build at equal ts
    # (kind 0 < 1), giving [inclusive, exclusive) window bounds
    k = np.concatenate([np_key, np_key, build["key"].to_numpy()])
    t = np.concatenate([np_ts, np_ts + window_us, build["ts_us"].to_numpy()])
    kd = np.concatenate([np.zeros(2 * len(probe), dtype=np.int8),
                         np.ones(len(build), dtype=np.int8)])
    which = np.concatenate([np.zeros(len(probe), dtype=np.int8),
                            np.ones(len(probe), dtype=np.int8),
                            np.full(len(build), 2, dtype=np.int8)])
    pid = np.concatenate([np.arange(len(probe)), np.arange(len(probe)),
                          np.full(len(build), -1)])
    order = np.lexsort((kd, t, k))
    # inclusive cumsum of build flags; a probe row contributes 0, and no
    # build row at equal (key, ts) precedes it, so cum at a probe row is
    # exactly the number of build rows strictly before it in (key, ts)
    cum = np.cumsum(kd[order] == 1)
    w_sorted = which[order]
    pid_sorted = pid[order]
    at = np.empty((2, len(probe)), dtype=np.int64)
    for w in (0, 1):
        m = w_sorted == w
        at[w][pid_sorted[m]] = cum[m]
    # builds of other keys lie before both probes or after both -> cancel
    return pd.DataFrame({"row_id": rid.astype("int64"),
                         "n_in_window": (at[1] - at[0]).astype("int64")})
