#!/usr/bin/env bash
# Multi-node launch path (north rule: "run via ray job submit on a
# fixed-size multi-node Ray cluster at two cluster sizes, N and 4N").
#
# NOT runnable in the single-node sandbox (no ray cluster / dashboard);
# it is the exact command a real deployment uses.  The sandbox evidence
# for the two-cluster-size criterion is `python bench.py --scaling`,
# which runs the same entrypoint at num_cpus=8 vs 32 in fresh processes
# and reports throughput at both plus the scaling efficiency
# (recorded in BASELINE.md).
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
