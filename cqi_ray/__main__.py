"""Command-line entry points: the replacement for the reference's
run-in-QGIS workflow (cycling_quality_index.py:1444-1835).

    python -m cqi_ray score  --input ways.geojson [ways2.geojson ...]
                             --output scores.geojson|scores_dir/
                             [--format geojson|parquet] [--cpus N]
    python -m cqi_ray flagship --sf-dir /root/testdata/sf0.001 --out DIR
    python -m cqi_ray tiles  --input scores_dir/ --out tiles_dir/ --zooms 14,15
    python -m cqi_ray lineage CHECKPOINT_DIR   # per-partition rows/bytes/sec

Owns its Ray session (library code never calls ray.init; `lineage` needs
no session at all — it reads sidecars and manifests off disk).
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


def _lineage_shuffle_report(d: str, out) -> bool:
    """Per-bucket lineage of a grouped_map_buckets checkpoint dir:
    rows / bytes / wall-sec per reduce bucket plus skew ratios.  Reads
    only the sidecars + payload file sizes — no Ray session."""
    import json

    metas = []
    for name in sorted(os.listdir(d)):
        if not (name.startswith("bucket_") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(d, name)) as fh:
                metas.append(json.load(fh))
        except (OSError, ValueError):
            continue
    if not metas:
        return False
    key = metas[0].get("checkpoint_key", "")
    print(f"shuffle checkpoint: {d}", file=out)
    print(f"  key={key!r} key_cols={metas[0].get('key_cols')} "
          f"num_buckets={metas[0].get('num_buckets')} "
          f"complete={len(metas)}/{metas[0].get('num_buckets')}", file=out)
    print(f"  {'bucket':>6} {'rows':>10} {'bytes':>12} {'sec':>8} "
          f"{'rows/s':>10}", file=out)
    rows_v, bytes_v, sec_v = [], [], []
    for m in sorted(metas, key=lambda m: m.get("bucket", -1)):
        f = m.get("file") or ""
        nbytes = 0
        if f:
            try:
                nbytes = os.path.getsize(os.path.join(d, f))
            except OSError:
                pass
        r, s = int(m.get("rows", 0)), float(m.get("sec", 0.0))
        rows_v.append(r)
        bytes_v.append(nbytes)
        sec_v.append(s)
        rate = f"{r / s:10.0f}" if s > 0 else f"{'-':>10}"
        print(f"  {m.get('bucket', -1):>6} {r:>10} {nbytes:>12} "
              f"{s:>8.3f} {rate}", file=out)
    n = len(rows_v)
    tot_rows, tot_bytes, tot_sec = sum(rows_v), sum(bytes_v), sum(sec_v)
    mean_rows = tot_rows / n if n else 0.0
    mean_sec = tot_sec / n if n else 0.0
    row_skew = max(rows_v) / mean_rows if mean_rows else 0.0
    sec_skew = max(sec_v) / mean_sec if mean_sec else 0.0
    print(f"  total rows={tot_rows} bytes={tot_bytes} "
          f"wall_sec={tot_sec:.3f}", file=out)
    print(f"  skew: rows max/mean={row_skew:.2f} "
          f"sec max/mean={sec_skew:.2f}", file=out)
    return True


def _lineage_stage_report(d: str, out) -> bool:
    """Stage-manifest lineage (checkpoint_stage dirs): fingerprint,
    build id, row count, wall time, per-partition file counts, inputs."""
    from .state.checkpoint import load_manifest

    man = load_manifest(d)
    if not man:
        return False
    print(f"stage checkpoint: {d}", file=out)
    for k in ("stage", "fingerprint", "build_id", "complete", "row_count",
              "wall_time_sec", "format"):
        print(f"  {k}={man.get(k)}", file=out)
    for p in man.get("partitions", []):
        print(f"  partition {p.get('key')}: {p.get('files')} file(s)",
              file=out)
    for i in man.get("inputs", []):
        print(f"  input: {i}", file=out)
    return True


def cmd_lineage(args) -> int:
    """Surface the per-partition lineage/metrics the checkpoint sidecars
    already carry (north rule: per-partition lineage and metrics must be
    inspectable, not latent).  Walks the directory and prints a report
    for every shuffle checkpoint and stage manifest found."""
    found = 0
    root = args.checkpoint_dir.rstrip("/")
    dirs = []
    if os.path.isdir(root):
        dirs = [root] + sorted(
            os.path.join(root, e) for e in os.listdir(root)
            if os.path.isdir(os.path.join(root, e)))
    for d in dirs:
        if _lineage_stage_report(d, sys.stdout):
            found += 1
        if _lineage_shuffle_report(d, sys.stdout):
            found += 1
    if not found:
        print(f"no checkpoint sidecars or stage manifests under {root}")
        return 1
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

    p = sub.add_parser(
        "lineage",
        help="per-partition lineage/metrics report of a checkpoint dir")
    p.add_argument("checkpoint_dir")
    p.set_defaults(fn=cmd_lineage)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
