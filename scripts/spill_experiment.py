"""Object-store spill experiment: prove the flagship pipeline STREAMS.

At 100 TB the working set never fits in the object store — correctness
and graceful throughput under spilling are a design requirement, not an
edge case ("let the object store spill rather than holding Python
lists").  This script runs the headline flagship workload (synthesize ->
decode/validate -> cell encode -> PIP/kNN assign vs CQI-scored ways)
twice in fresh processes:

  1. unconstrained object store (Ray default: 30% of RAM), and
  2. a deliberately tiny object store (default 1 GiB — far below the
     workload's aggregate block footprint),

then reports both throughputs, the MiB Ray actually spilled to disk,
and asserts the output row count is identical.  A pipeline that secretly
materializes (driver lists, full-dataset to_pandas, unbounded actor
state) either OOMs or deadlocks under (2); a streaming pipeline pays
only the spill-I/O tax.

Usage: python scripts/spill_experiment.py           # parent, prints JSON
       python scripts/spill_experiment.py --child N # one measured run
Env:   GRAFT_SPILL_STORE_BYTES (default 1 GiB), GRAFT_IMAGES_PER_DOC
       (default 64), GRAFT_IMAGE_PX (default 64), RAY_GRAFT_CPUS.
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
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
STORE_BYTES = int(os.environ.get("GRAFT_SPILL_STORE_BYTES", str(1 << 30)))


def _spilled_mib() -> float:
    """MiB spilled to disk this session: bytes on disk under the session's
    ``ray_spilled_objects*`` directories (ray's memory_summary needs grpc,
    which this env doesn't ship)."""
    import glob

    import ray

    sess = ray._private.worker._global_node.get_session_dir_path()
    total = 0
    for d in glob.glob(os.path.join(sess, "ray_spilled_objects*")):
        for root, _dirs, files in os.walk(d):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in files)
    return round(total / (1 << 20), 1)


def child(store_bytes: int) -> None:
    import ray

    kwargs = dict(address="local", num_cpus=NUM_CPUS,
                  include_dashboard=False, logging_level="ERROR")
    if store_bytes:
        kwargs["object_store_memory"] = store_bytes
    ray.init(**kwargs)
    from cqi_ray.pipelines import flagship
    from cqi_ray.pipelines.assign import assign_images_to_ways
    from cqi_ray.runtime import tune_data_context

    tune_data_context()
    per_doc = int(os.environ.get("GRAFT_IMAGES_PER_DOC", "64"))
    size_px = int(os.environ.get("GRAFT_IMAGE_PX", "64"))
    scored = flagship.build_scored_ways(1024).materialize()
    # warm-up pass: worker spawn/import costs out of the measurement
    assign_images_to_ways(flagship.build_images(SF_DIR, limit=500),
                          scored).count()
    t0 = time.monotonic()
    images = flagship.build_images(SF_DIR, per_doc=per_doc, size_px=size_px)
    n = assign_images_to_ways(images, scored).count()
    elapsed = time.monotonic() - t0
    doc = {"images": n, "sec": round(elapsed, 3),
           "images_per_sec": round(n / elapsed, 1),
           "spilled_mib": _spilled_mib(),
           "object_store_bytes": store_bytes or None,
           "num_cpus": NUM_CPUS}
    print(json.dumps(doc))
    sys.stdout.flush()
    os._exit(0)  # raylet teardown occasionally wedges on this VM


def main() -> None:
    results = {}
    for label, store in (("unconstrained", 0), ("spill", STORE_BYTES)):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(store)],
            capture_output=True, text=True, timeout=3600)
        line = proc.stdout.strip().splitlines()[-1]
        results[label] = json.loads(line)
    u, s = results["unconstrained"], results["spill"]
    doc = {
        "experiment": "flagship under object-store pressure "
                      "(streaming-vs-materializing evidence)",
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
        "images": u["images"],
        "rows_equal": u["images"] == s["images"],
        "store_gib_spill_leg": round(STORE_BYTES / (1 << 30), 2),
        "sec_unconstrained": u["sec"], "sec_spill": s["sec"],
        "images_per_sec_unconstrained": u["images_per_sec"],
        "images_per_sec_spill": s["images_per_sec"],
        "spilled_mib_unconstrained": u["spilled_mib"],
        "spilled_mib_spill": s["spilled_mib"],
        "throughput_retained": round(
            s["images_per_sec"] / u["images_per_sec"], 3),
    }
    print(json.dumps(doc))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        main()
