"""Command-line entry points: the replacement for the reference's
run-in-QGIS workflow (cycling_quality_index.py:1444-1835).

    python -m cqi_ray score  --input ways.geojson [ways2.geojson ...]
                             --output scores.geojson|scores_dir/
                             [--format geojson|parquet] [--cpus N]
    python -m cqi_ray flagship --sf-dir /root/testdata/sf0.001 --out DIR
    python -m cqi_ray tiles  --input scores_dir/ --out tiles_dir/ --zooms 14,15

Owns its Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import os
import sys


class _RaySession:
    """Owns the Ray session only if this process didn't already have one
    (so the CLI composes with test fixtures / driver sessions)."""

    def __init__(self, cpus):
        import ray

        self.ray = ray
        self.owned = not ray.is_initialized()
        if self.owned:
            ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                     ignore_reinit_error=True, logging_level="ERROR")
        from .runtime import tune_data_context

        tune_data_context()

    def shutdown(self):
        if self.owned:
            self.ray.shutdown()


def _init_ray(cpus):
    return _RaySession(cpus)


def cmd_score(args) -> int:
    ray = _init_ray(args.cpus)
    from .io.merge import merge_way_sources
    from .pipelines.cqi import dataset_from_rows, score_ways_dataset

    rows = merge_way_sources(args.input)
    print(f"read {len(rows)} ways from {len(args.input)} file(s)")
    scores = score_ways_dataset(dataset_from_rows(rows))
    if args.format == "parquet" or (args.format == "auto"
                                    and not args.output.endswith(".geojson")):
        scores.write_parquet(args.output)
        print(f"wrote parquet scores to {args.output}")
    else:
        from .io.geojson import scores_dataset_to_geojson

        n = scores_dataset_to_geojson(scores, args.output)
        print(f"wrote {n} scored features to {args.output}")
    ray.shutdown()
    return 0


def cmd_flagship(args) -> int:
    ray = _init_ray(args.cpus)
    from .pipelines.flagship import run_flagship_checkpointed

    scores, assignments, tiles = run_flagship_checkpointed(
        args.sf_dir, args.out, n_ways=args.n_ways, zooms=tuple(args.zooms))
    print(f"scores={scores.count()} assignments={assignments.count()} "
          f"tiles={tiles.count()} -> {args.out}")
    ray.shutdown()
    return 0


def cmd_tiles(args) -> int:
    ray = _init_ray(args.cpus)
    import ray.data as rd
    from .pipelines.tiles import render_tiles

    scores = rd.read_parquet(args.input, file_extensions=["parquet"])
    tiles = render_tiles(scores, zooms=tuple(args.zooms))
    tiles.write_parquet(args.out)
    print(f"wrote tiles to {args.out}")
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="cqi_ray")
    parser.add_argument("--cpus", type=int,
                        default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("score", help="score OSM ways (CQI + LTS)")
    p.add_argument("--input", nargs="+", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--format", choices=["auto", "geojson", "parquet"],
                   default="auto")
    p.set_defaults(fn=cmd_score)

    p = sub.add_parser("flagship", help="checkpointed image->way pipeline")
    p.add_argument("--sf-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n-ways", type=int, default=64)
    p.add_argument("--zooms", type=lambda s: [int(z) for z in s.split(",")],
                   default=[15])
    p.set_defaults(fn=cmd_flagship)

    p = sub.add_parser("tiles", help="render tile pyramid from scores parquet")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--zooms", type=lambda s: [int(z) for z in s.split(",")],
                   default=[14, 15])
    p.set_defaults(fn=cmd_tiles)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
