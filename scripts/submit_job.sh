#!/usr/bin/env bash
# Multi-node launch path (north rule: "run via ray job submit on a
# fixed-size multi-node Ray cluster at two cluster sizes, N and 4N").
#
# NOT runnable verbatim in the sandbox: the `ray job` CLI/SDK requires
# the ray[default] extra (HTTP job server), which this image does not
# ship and cannot install (verified: `ray job list` raises RuntimeError
# asking for ray[default]).  It is the exact command a real deployment
# uses.  The sandbox exercises the launch mode underneath it with
# scripts/cluster_scaling.py: a STANDING cluster via `ray start --head`
# plus a separate attached driver process (RAY_ADDRESS /
# ray.init(address='auto')) — which is precisely what a submitted job's
# entrypoint runs as once the HTTP wrapper has placed it on the head
# node — at 8 and 32 CPUs in fresh clusters, reporting both throughputs
# plus the scaling efficiency.  `python bench.py --scaling` is the
# in-process variant of the same protocol (recorded in BASELINE.md).
#
# Usage:
#   RAY_ADDRESS=http://<head>:8265 ./scripts/submit_job.sh flagship \
#       --sf-dir s3://bucket/tables --out s3://bucket/out
#
# The library never calls ray.init itself; `python -m cqi_ray` owns the
# session inside the job and connects to the cluster it was submitted to.
# Cluster size (N vs 4N nodes) is fixed by the cluster config, not here —
# submit the identical job to both clusters and compare rows/s.
set -euo pipefail

: "${RAY_ADDRESS:?set RAY_ADDRESS to the cluster's job-submission URL}"

exec ray job submit \
    --working-dir "$(cd "$(dirname "$0")/.." && pwd)" \
    --runtime-env-json '{"env_vars": {"RAY_DATA_PUSH_BASED_SHUFFLE": "1"}}' \
    -- python -m cqi_ray "$@"
