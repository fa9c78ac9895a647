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

Usage: python scripts/cluster_scaling.py            # full protocol
       python scripts/cluster_scaling.py --driver   # one attached run
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


def main() -> None:
    results = {}
    for ncpu in (8, 32):
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
    r8, r32 = results[8]["images_per_sec"], results[32]["images_per_sec"]
    doc = {
        "experiment": "standing-cluster launch (ray start --head + "
                      "attached driver, the submitted-job execution mode)",
        "image_px": int(os.environ.get("GRAFT_IMAGE_PX", "96")),
        "images": results[32]["images"],
        "sec_8": results[8]["sec"], "sec_32": results[32]["sec"],
        "images_per_sec_8": r8, "images_per_sec_32": r32,
        "scaling_efficiency": round((r32 / r8) / 4.0, 3),
    }
    with open(os.path.join(REPO, "cluster_scaling_latest.json"), "w") as fh:
        json.dump(doc, fh)
    print(json.dumps(doc))


if __name__ == "__main__":
    if "--driver" in sys.argv:
        driver()
    else:
        main()
