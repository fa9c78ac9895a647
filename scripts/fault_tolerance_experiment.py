"""Fault-tolerance experiment: SIGKILL workers mid-run, same answer out.

On a 256-node cluster pushing 100 TB, worker loss is routine — the
engine's correctness story has to survive it.  Ray Data re-executes
failed map tasks from lineage; because every cqi_ray kernel is
deterministic (no wall clock, no unseeded RNG), a retried task must
reproduce its block bit-for-bit, so the pipeline's OUTPUT is invariant
under worker death.  This script proves that end-to-end on the flagship
image->way assignment:

  1. baseline child run: flagship assign, order-insensitive content
     checksum (sum of ``pd.util.hash_pandas_object`` over all output
     columns — deterministic across processes),
  2. fault child run: same job; a watchdog thread waits until execution
     is underway, then SIGKILLs live ``ray::``-executing worker
     processes of THIS session (found via the raylet's child pids),
  3. parent compares row counts and checksums.

Usage: python scripts/fault_tolerance_experiment.py        # parent
Env:   GRAFT_SF_DIR, RAY_GRAFT_CPUS (default 16 here),
       GRAFT_FT_KILLS (workers to kill, default 4),
       GRAFT_IMAGES_PER_DOC (default 16).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
N_KILLS = int(os.environ.get("GRAFT_FT_KILLS", "4"))


def _raylet_children_running_tasks() -> list[int]:
    """PIDs of this session's worker processes currently executing a task
    (their argv[0] is rewritten to ``ray::<TaskName>``)."""
    import ray

    procs = ray._private.worker._global_node.all_processes
    raylet_pid = procs["raylet"][0].process.pid
    pids = []
    for ent in os.listdir("/proc"):
        if not ent.isdigit():
            continue
        try:
            with open(f"/proc/{ent}/stat") as fh:
                parts = fh.read().split()
            if int(parts[3]) != raylet_pid:  # ppid
                continue
            with open(f"/proc/{ent}/cmdline", "rb") as fh:
                cmd = fh.read().decode("utf-8", "replace")
            if cmd.startswith("ray::"):
                pids.append(int(ent))
        except (OSError, IndexError, ValueError):
            continue
    return sorted(pids)


def child(kills: int) -> None:
    import pandas as pd
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from cqi_ray.pipelines import flagship
    from cqi_ray.pipelines.assign import ASSIGN_COLS, assign_images_to_ways
    from cqi_ray.runtime import tune_data_context

    tune_data_context()
    per_doc = int(os.environ.get("GRAFT_IMAGES_PER_DOC", "16"))
    scored = flagship.build_scored_ways(256).materialize()
    images = flagship.build_images(SF_DIR, per_doc=per_doc)

    killed: list[int] = []

    def watchdog() -> None:
        # wait until tasks are actually executing, then murder workers in
        # two waves so retries themselves get retried
        deadline = time.monotonic() + 60
        waves = 0
        while waves < 2 and time.monotonic() < deadline:
            pids = _raylet_children_running_tasks()
            if len(pids) >= 2:
                for pid in pids[: max(1, kills // 2)]:
                    try:
                        os.kill(pid, signal.SIGKILL)
                        killed.append(pid)
                    except OSError:
                        pass
                waves += 1
                time.sleep(1.5)
            else:
                time.sleep(0.2)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        h = pd.util.hash_pandas_object(b[ASSIGN_COLS], index=False) \
            .to_numpy(np.uint64)
        # uint64 wrap-around sum: order-insensitive (modular), so block
        # arrival order can't change the checksum
        return pd.DataFrame({"n": np.array([len(b)], dtype=np.int64),
                             "h": np.array(
                                 [h.sum(dtype=np.uint64)], dtype=np.uint64)})

    # the watchdog starts BEFORE the pipeline is even built: the task-plan
    # shuffle inside assign_images_to_ways executes EAGERLY at call time
    # (materialize + split/apply waves), so kills must be armed first to
    # land inside the shuffle itself, not just the checksum tail
    if kills:
        threading.Thread(target=watchdog, daemon=True).start()
    t0 = time.monotonic()
    asn = assign_images_to_ways(images, scored)
    parts = asn.map_batches(partial, batch_format="pandas").to_pandas()
    elapsed = time.monotonic() - t0
    import numpy as np

    doc = {"rows": int(parts["n"].sum()),
           "checksum": int(parts["h"].to_numpy(np.uint64)
                           .sum(dtype=np.uint64)),
           "sec": round(elapsed, 3),
           "killed_pids": killed, "num_cpus": NUM_CPUS}
    print(json.dumps(doc))
    sys.stdout.flush()
    os._exit(0)


def main() -> None:
    results = {}
    for label, kills in (("baseline", 0), ("faulted", N_KILLS)):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(kills)],
            capture_output=True, text=True, timeout=1800)
        line = proc.stdout.strip().splitlines()[-1]
        results[label] = json.loads(line)
    b, f = results["baseline"], results["faulted"]
    print(json.dumps({
        "experiment": "flagship under worker SIGKILL (lineage-retry "
                      "determinism evidence)",
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
        "rows": b["rows"],
        "rows_equal": b["rows"] == f["rows"],
        "checksum_equal": b["checksum"] == f["checksum"],
        "workers_killed": len(f["killed_pids"]),
        "sec_baseline": b["sec"], "sec_faulted": f["sec"],
        "overhead": round(f["sec"] / b["sec"], 3) if b["sec"] else None,
    }))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(int(sys.argv[sys.argv.index("--child") + 1]))
    else:
        main()
