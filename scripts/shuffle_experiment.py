"""Measure pandas vs Arrow block formats through the bucketed-groupby
shuffle (grouped_map_buckets) on the engine's two big shuffle workloads:

  * sessionize  — 100k narrow event rows, int keys
  * cqi match   — the sidepath point/segment union (object + float cols)

Prints one JSON line per (workload, format); BASELINE.md records the
outcome and the faster path stays the default.

Usage: python scripts/shuffle_experiment.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from cqi_ray.runtime import tune_data_context

    tune_data_context()

    import pandas as pd

    from cqi_ray.queries import _pq, q_sessionize
    from cqi_ray.relational import grouped_map_buckets

    results = []

    # --- workload 1: sessionize-style shuffle over events ---
    import numpy as np

    def sessions_noop(bucket: pd.DataFrame) -> pd.DataFrame:
        # isolate the shuffle: count rows per user inside the bucket
        if not len(bucket):
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        g = bucket.groupby("user_id", sort=False).size()
        return pd.DataFrame({"user_id": g.index.to_numpy(),
                             "n": g.to_numpy()})

    for fmt in ("pandas", "pyarrow"):
        t0 = time.monotonic()
        events = _pq(sf_dir, "events", columns=["user_id", "ts", "event_id"])
        out = grouped_map_buckets(events, ["user_id"], sessions_noop,
                                  num_buckets=32, whole_bucket=True,
                                  shuffle_format=fmt)
        n = out.count()
        results.append({"workload": "events_by_user", "format": fmt,
                        "rows": n, "sec": round(time.monotonic() - t0, 2)})

    # --- workload 2: the cqi sidepath match shuffle (mixed dtypes) ---
    from cqi_ray.params import DEFAULT_PARAMS as p
    from cqi_ray.pipelines.cqi import (_make_point_rows, _make_segment_rows,
                                       _match_bucket, _project_batch,
                                       synth_ways_dataset)
    import pyarrow as pa
    import pyarrow.compute as pc
    from cqi_ray import sidepath

    path_vals = pa.array(list(sidepath.PATH_HIGHWAYS), pa.string())
    nonroad_vals = pa.array(list(sidepath.NON_ROAD_HIGHWAYS), pa.string())

    for fmt in ("pandas", "pyarrow"):
        t0 = time.monotonic()
        ds = synth_ways_dataset(50000).map_batches(
            _project_batch, batch_format="pyarrow",
            batch_size=None).materialize()
        paths = ds.map_batches(
            lambda t: t.filter(pc.fill_null(
                pc.is_in(t["highway"], value_set=path_vals), False)),
            batch_format="pyarrow", batch_size=None).select_columns(
                ["geometry_m", "id", "layer", "row_seq", "is_sidepath",
                 "footway", "is_sidepath:of"])
        roads = ds.map_batches(
            lambda t: t.filter(pc.invert(pc.fill_null(
                pc.is_in(t["highway"], value_set=nonroad_vals), False))),
            batch_format="pyarrow", batch_size=None).select_columns(
                ["geometry_m", "id", "highway", "name", "maxspeed", "layer",
                 "row_seq"])
        points = paths.map_batches(lambda b: _make_point_rows(b, p),
                                   batch_format="pandas", batch_size=None)
        segments = roads.map_batches(lambda b: _make_segment_rows(b, p),
                                     batch_format="pandas", batch_size=None)
        pairs = grouped_map_buckets(points.union(segments), ["cell"],
                                    lambda g: _match_bucket(g, p),
                                    num_buckets=64, whole_bucket=True,
                                    shuffle_format=fmt)
        n = pairs.count()
        results.append({"workload": "cqi_match_50k", "format": fmt,
                        "rows": n, "sec": round(time.monotonic() - t0, 2)})

    ray.shutdown()
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
