"""Cross-process resume: the checkpointed flagship run twice in SEPARATE
processes (fresh Ray sessions, via the CLI) must not recompute completed
stages; deleting one stage's manifest forces that stage to rebuild AND —
through the chained build-id fingerprints — invalidates exactly its
dependent stages (scores -> assignments, tiles)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_flagship(out_dir: str) -> str:
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "cqi_ray", "--cpus", "4", "flagship",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out_dir,
         "--n-ways", "9"],
        env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def _mtimes(out_dir: str) -> dict:
    return {stage: os.path.getmtime(f"{out_dir}/{stage}/_manifest.json")
            for stage in ("scores", "assignments", "tiles")}


@pytest.mark.slow
def test_resume_across_processes(tmp_path):
    out = str(tmp_path / "ckpt")
    first = _run_flagship(out)
    assert "assignments=500" in first
    m1 = _mtimes(out)
    with open(f"{out}/assignments/_manifest.json") as fh:
        man = json.load(fh)
    assert man["complete"] and man["partitions"]

    # second process: everything resumes, nothing recomputes
    second = _run_flagship(out)
    assert "assignments=500" in second
    assert _mtimes(out) == m1

    # tamper: drop the upstream stage's manifest -> it rebuilds with a new
    # build_id, which invalidates its dependents through the chained
    # fingerprints (upstream rebuild must never leave stale dependents)
    os.remove(f"{out}/scores/_manifest.json")
    third = _run_flagship(out)
    assert "assignments=500" in third
    m3 = _mtimes(out)
    assert m3["scores"] > m1["scores"], "scores should have rebuilt"
    assert m3["assignments"] > m1["assignments"], \
        "assignments must rebuild: upstream scores has a new build_id"
    assert m3["tiles"] > m1["tiles"], \
        "tiles must rebuild: upstream scores has a new build_id"

    # fourth run with nothing tampered: everything resumes again
    fourth = _run_flagship(out)
    assert "assignments=500" in fourth
    assert _mtimes(out) == m3
