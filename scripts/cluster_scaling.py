"""Cluster-mode launch exercise (round-4 verdict item 7).

The north rule's literal launch mode is ``ray job submit`` against a
standing cluster.  The ``ray job`` CLI/SDK requires the ``ray[default]``
extra (HTTP job server) which this image does not ship and cannot
install, so this script exercises the part of that path that exists in
the sandbox and that actually matters for the engine:

  1. a STANDING Ray cluster is started out-of-process
     (``ray start --head --num-cpus=N`` — a real raylet/GCS, not an
     in-driver ``ray.init(address='local')`` session);
  2. the workload runs as a SEPARATE driver process that attaches to
     that cluster via ``RAY_ADDRESS`` / ``ray.init(address='auto')`` —
     which is exactly how a submitted job's entrypoint executes on a
     cluster (job submission is an HTTP wrapper that starts this same
     driver on the head node);
  3. the cluster is torn down and the protocol repeats at the second
     parallelism level (8 vs 32 CPUs, fresh cluster each), reporting
     throughput at both plus the scaling efficiency — the sandbox
     evidence shape for the N-vs-4N-nodes criterion.

scripts/submit_job.sh remains the verbatim multi-node command for a
real deployment.

Round 5 adds ``--two-node``: the head gets half the CPUs and a SECOND
``ray start --address=<head>`` raylet on the same host gets the other
half — two object stores, two raylets, object transfers crossing a real
node boundary (localhost TCP object manager, not same-store plasma).
The attached driver runs the flagship workload plus an instrumented
bucketed-shuffle probe whose map side tags rows with the producing
node and whose reduce side reports its own node — every reduce bucket
whose input rows carry the OTHER node's id is a piece that crossed the
boundary.  The same driver then re-runs on a single 1-node cluster at
the same total CPUs and the order-insensitive output hashes must match
— the refs-not-payloads task-plan shuffle is node-topology-invariant.

Usage: python scripts/cluster_scaling.py            # full protocol
       python scripts/cluster_scaling.py --driver   # one attached run
       python scripts/cluster_scaling.py --two-node # 2-node vs 1-node
Env:   GRAFT_IMAGES_PER_DOC (64), GRAFT_IMAGE_PX (96), GRAFT_N_WAYS
       (1024), GRAFT_SF_DIR (/root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
PORT = int(os.environ.get("GRAFT_CLUSTER_PORT", "6399"))


def driver() -> None:
    """The job entrypoint: attach to the standing cluster and run the
    headline flagship workload (mirrors bench.py --headline, but with
    address='auto' — the submitted-job execution mode)."""
    import ray

    ray.init(address="auto", include_dashboard=False,
             logging_level="ERROR")
    from cqi_ray.runtime import tune_data_context

    tune_data_context()
    from cqi_ray.pipelines import flagship
    from cqi_ray.pipelines.assign import assign_images_to_ways

    per_doc = int(os.environ.get("GRAFT_IMAGES_PER_DOC", "64"))
    size_px = int(os.environ.get("GRAFT_IMAGE_PX", "96"))
    n_ways = int(os.environ.get("GRAFT_N_WAYS", "1024"))
    scored = flagship.build_scored_ways(n_ways).materialize()

    def consume(ds) -> int:
        # count(): full pipeline execution, row counts from block
        # metadata — shipping result rows to the single-threaded driver
        # would serialize the tail of the measurement (bench._consume)
        return ds.count()

    consume(assign_images_to_ways(
        flagship.build_images(SF_DIR, limit=500), scored))  # warm workers
    t0 = time.monotonic()
    images = flagship.build_images(SF_DIR, per_doc=per_doc, size_px=size_px)
    n = consume(assign_images_to_ways(images, scored))
    elapsed = time.monotonic() - t0
    cpus = int(ray.cluster_resources().get("CPU", 0))
    ray.shutdown()
    print(json.dumps({"images": n, "sec": round(elapsed, 3),
                      "images_per_sec": round(n / elapsed, 1),
                      "cluster_cpus": cpus,
                      "attached": True}))


def _hash_dataset(ds) -> tuple[int, int]:
    """Order-insensitive (xor of row hashes, row count) over a Dataset —
    comparable across cluster topologies without shipping rows."""
    import numpy as np
    import pandas as pd

    def hash_batch(b: pd.DataFrame) -> pd.DataFrame:
        cols = sorted(b.columns)
        h = pd.util.hash_pandas_object(
            b[cols].reset_index(drop=True), index=False).to_numpy()
        acc = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
        return pd.DataFrame({"h": [np.uint64(acc)], "n": [len(b)]})

    parts = ds.map_batches(hash_batch, batch_format="pandas").to_pandas()
    import functools

    acc = functools.reduce(lambda a, b: a ^ b,
                           (int(v) for v in parts["h"]), 0)
    return acc, int(parts["n"].sum())


def two_node_driver() -> None:
    """Attached driver for the 2-node (or 1-node control) leg: flagship
    workload hash + an instrumented shuffle probe that counts reduce
    buckets whose input rows were produced on a DIFFERENT node."""
    import ray

    ray.init(address="auto", include_dashboard=False, logging_level="ERROR")
    from cqi_ray.runtime import tune_data_context

    tune_data_context()
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cqi_ray.pipelines import flagship
    from cqi_ray.pipelines.assign import assign_images_to_ways
    from cqi_ray.relational import grouped_map_buckets

    alive = [n for n in ray.nodes() if n["Alive"]]
    n_nodes = len(alive)
    cpus = int(ray.cluster_resources().get("CPU", 0))

    # 1) flagship workload: deterministic output hash across topologies
    per_doc = int(os.environ.get("GRAFT_IMAGES_PER_DOC", "64"))
    size_px = int(os.environ.get("GRAFT_IMAGE_PX", "96"))
    n_ways = int(os.environ.get("GRAFT_N_WAYS", "1024"))
    scored = flagship.build_scored_ways(n_ways).materialize()
    t0 = time.monotonic()
    images = flagship.build_images(SF_DIR, per_doc=per_doc, size_px=size_px)
    h, n = _hash_dataset(assign_images_to_ways(images, scored))
    elapsed = time.monotonic() - t0

    # 2) instrumented task-plan shuffle probe: which node produced each
    # input row vs which node ran its reduce bucket
    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["src_node"] = ray.get_runtime_context().get_node_id()
        return b

    probe_df = pd.DataFrame({
        "k": np.arange(200_000, dtype=np.int64) % 997,
        "v": np.arange(200_000, dtype=np.int64)})
    tagged = rd.from_pandas(probe_df).repartition(32) \
        .map_batches(tag, batch_format="pandas")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        me = ray.get_runtime_context().get_node_id()
        src = set(g["src_node"])
        return pd.DataFrame({
            "reduce_node": [me],
            "n_rows": [len(g)],
            "n_src_nodes": [len(src)],
            "crossed": [any(s != me for s in src)]})

    buckets = grouped_map_buckets(
        tagged, ["k"], per_bucket, num_buckets=32,
        whole_bucket=True, presort=False).to_pandas()
    probe_sum = int(probe_df["v"].sum())
    # the probe's own correctness: every row reduced exactly once
    assert int(buckets["n_rows"].sum()) == len(probe_df)

    ray.shutdown()
    print(json.dumps({
        "nodes": n_nodes, "cluster_cpus": cpus,
        "images": n, "sec": round(elapsed, 3),
        "images_per_sec": round(n / elapsed, 1),
        "assign_hash": f"{h:016x}",
        "probe_rows": int(buckets["n_rows"].sum()),
        "probe_expected_sum": probe_sum,
        "reduce_nodes": int(buckets["reduce_node"].nunique()),
        "buckets_total": len(buckets),
        "buckets_crossed_node_boundary": int(buckets["crossed"].sum()),
    }))


def two_node() -> None:
    """2-node cluster vs 1-node cluster at the SAME total CPUs: output
    hash must be identical; the probe must show cross-node piece flow."""
    total = int(os.environ.get("GRAFT_CLUSTER_CPUS", "32"))
    results = {}
    for nodes in (2, 1):
        subprocess.run(["ray", "stop", "--force"], capture_output=True)
        head_cpus = total // nodes
        up = subprocess.run(
            ["ray", "start", "--head", f"--num-cpus={head_cpus}",
             f"--port={PORT}", "--include-dashboard=false"],
            capture_output=True, text=True)
        if up.returncode != 0:
            print(up.stderr[-2000:], file=sys.stderr)
            sys.exit(1)
        try:
            if nodes == 2:
                up2 = subprocess.run(
                    ["ray", "start", f"--address=127.0.0.1:{PORT}",
                     f"--num-cpus={total - head_cpus}"],
                    capture_output=True, text=True)
                if up2.returncode != 0:
                    print(up2.stderr[-2000:], file=sys.stderr)
                    sys.exit(1)
            env = dict(os.environ, RAY_ADDRESS=f"127.0.0.1:{PORT}")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--two-node-driver"],
                env=env, capture_output=True, text=True, check=True)
            results[nodes] = json.loads(proc.stdout.strip().splitlines()[-1])
            assert results[nodes]["nodes"] == nodes, \
                f"expected {nodes} alive nodes, saw {results[nodes]['nodes']}"
            assert results[nodes]["cluster_cpus"] == total
        finally:
            subprocess.run(["ray", "stop", "--force"], capture_output=True)
    doc = {
        "experiment": "2-node vs 1-node cluster at equal total CPUs "
                      "(second raylet via ray start --address: separate "
                      "object store, object-manager transfers cross a "
                      "real node boundary)",
        "total_cpus": total,
        "two_node": results[2],
        "one_node": results[1],
        "hashes_match":
            results[2]["assign_hash"] == results[1]["assign_hash"],
        "cross_node_evidence": {
            "reduce_nodes_used": results[2]["reduce_nodes"],
            "buckets_crossed": results[2]["buckets_crossed_node_boundary"],
            "buckets_total": results[2]["buckets_total"],
        },
    }
    with open(os.path.join(REPO, "cluster_two_node_latest.json"), "w") as fh:
        json.dump(doc, fh)
    print(json.dumps(doc))


def main() -> None:
    # same leg pair as bench.py --scaling (default 4,16 — both legs
    # under the VM's frequency-boost threshold; see bench.py.scaling)
    lo, hi = (int(x) for x in os.environ.get(
        "GRAFT_SCALING_LEGS", "4,16").split(","))
    results = {}
    for ncpu in (lo, hi):
        subprocess.run(["ray", "stop", "--force"], capture_output=True)
        up = subprocess.run(
            ["ray", "start", "--head", f"--num-cpus={ncpu}",
             f"--port={PORT}", "--include-dashboard=false"],
            capture_output=True, text=True)
        if up.returncode != 0:
            print(up.stderr[-2000:], file=sys.stderr)
            sys.exit(1)
        try:
            env = dict(os.environ, RAY_ADDRESS=f"127.0.0.1:{PORT}")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--driver"],
                env=env, capture_output=True, text=True, check=True)
            results[ncpu] = json.loads(proc.stdout.strip().splitlines()[-1])
            assert results[ncpu]["cluster_cpus"] == ncpu, \
                "driver did not attach to the standing cluster"
        finally:
            subprocess.run(["ray", "stop", "--force"], capture_output=True)
    r_lo = results[lo]["images_per_sec"]
    r_hi = results[hi]["images_per_sec"]
    doc = {
        "experiment": "standing-cluster launch (ray start --head + "
                      "attached driver, the submitted-job execution mode)",
        "image_px": int(os.environ.get("GRAFT_IMAGE_PX", "96")),
        "images": results[hi]["images"],
        "cpus_lo": lo,
        "cpus_hi": hi,
        f"sec_{lo}": results[lo]["sec"], f"sec_{hi}": results[hi]["sec"],
        f"images_per_sec_{lo}": r_lo, f"images_per_sec_{hi}": r_hi,
        "scaling_efficiency": round((r_hi / r_lo) / (hi / lo), 3),
    }
    with open(os.path.join(REPO, "cluster_scaling_latest.json"), "w") as fh:
        json.dump(doc, fh)
    print(json.dumps(doc))


if __name__ == "__main__":
    if "--two-node-driver" in sys.argv:
        two_node_driver()
    elif "--driver" in sys.argv:
        driver()
    elif "--two-node" in sys.argv:
        two_node()
    else:
        main()
