"""Per-stage checkpointing with partition lineage + metrics, and resume.

Every stage of a long pipeline can be wrapped in ``checkpoint_stage``:
the stage's output Dataset is written as partitioned Parquet (one
directory per partition-key value when a partition column is given), a
``_manifest.json`` records per-partition lineage (stage name, partition
key, row count, input fingerprint, wall time), and a later run with the
same fingerprint short-circuits to ``read_parquet`` — the batch meaning
of "resume mid-shuffle": completed stages (and with partition columns,
completed partitions) are never recomputed.

Lance is the target format on a real deployment (column projection over
huge binary payloads); ray.data ships ``write_lance``/``read_lance`` and
``_write``/``_read`` branch to them whenever the lance wheel imports
(``HAVE_LANCE`` gate below — this environment has no wheel, so the
branch falls back to Parquet with the identical layout; the manifest
records which format a checkpoint was written in so resume reads it
back correctly either way).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable, Optional

import ray.data as rd

try:  # pragma: no cover - not present in this environment
    import lance  # noqa: F401
    HAVE_LANCE = True
except Exception:
    HAVE_LANCE = False

MANIFEST = "_manifest.json"


def _write(ds: rd.Dataset, path: str, partition_cols: Optional[list[str]]):
    """Stage sink: Lance when the wheel is importable (ray.data ships
    write_lance/read_lance; only the lance wheel is missing in this
    environment), Parquet otherwise.  The branch — not just the flag —
    is what tests/test_io.py's gate test pins."""
    if HAVE_LANCE and not partition_cols:
        # lance datasets are self-partitioned (fragments); partitioned
        # layouts keep the directory-per-key parquet form for resume
        ds.write_lance(path)
        return
    if partition_cols:
        ds.write_parquet(path, partition_cols=partition_cols)
    else:
        ds.write_parquet(path)


def _read(path: str, fmt: str) -> rd.Dataset:
    if fmt == "lance":
        return rd.read_lance(path)
    return rd.read_parquet(path, file_extensions=["parquet"])


def manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def sibling_manifest_path(path: str) -> str:
    """Manifest location for self-describing formats (Lance): a Lance
    dataset owns its directory layout, and whether it tolerates a
    foreign ``_manifest.json`` inside its root is format-internal —
    so the stage manifest lives NEXT TO the dataset dir, never inside
    it (round-5 ADVICE)."""
    return path.rstrip("/") + ".manifest.json"


def source_fingerprint(paths) -> str:
    """Stable fingerprint of input files (path, size, mtime_ns) — the
    'input fragment ids' lineage: a changed/replaced source file changes
    every downstream stage fingerprint built from it."""
    import hashlib

    h = hashlib.md5()
    for p in sorted(paths):
        try:
            st = os.stat(p)
            h.update(f"{p}:{st.st_size}:{st.st_mtime_ns};".encode())
        except OSError:
            h.update(f"{p}:missing;".encode())
    return h.hexdigest()[:16]


def stage_build_id(path: str) -> str:
    """The build id of a completed stage (changes on every rebuild, even
    with an unchanged fingerprint) — chain it into dependent stages'
    fingerprints so an upstream rebuild invalidates exactly its
    dependents."""
    man = load_manifest(path)
    return man.get("build_id", "") if man else ""


def load_manifest(path: str) -> Optional[dict]:
    for loc in (manifest_path(path), sibling_manifest_path(path)):
        try:
            with open(loc) as fh:
                return json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
    return None


def checkpoint_stage(builder: Callable[[], rd.Dataset], path: str, *,
                     stage: str, fingerprint: str,
                     partition_cols: Optional[list[str]] = None,
                     metrics: Optional[dict] = None,
                     inputs: Optional[list] = None) -> rd.Dataset:
    """Compute-or-resume one stage.

    ``fingerprint`` must change whenever the stage's inputs/parameters
    change — build it from params + ``source_fingerprint(files)`` +
    upstream ``stage_build_id``s; a matching completed manifest
    short-circuits to a read.  ``inputs`` (source paths / fragment ids)
    are recorded in the manifest for lineage inspection."""
    existing = load_manifest(path)
    if existing and existing.get("complete") and existing.get("fingerprint") == fingerprint:
        return _read(path, existing.get("format", "parquet"))

    # stale or partial output: rebuild atomically (write to tmp, swap)
    tmp = path.rstrip("/") + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.monotonic()
    ds = builder()
    _write(ds, tmp, partition_cols)
    elapsed = time.monotonic() - t0

    partitions = []
    if partition_cols:
        for entry in sorted(os.listdir(tmp)):
            full = os.path.join(tmp, entry)
            if os.path.isdir(full) and "=" in entry:
                n_files = len([f for f in os.listdir(full) if f.endswith(".parquet")])
                partitions.append({"key": entry, "files": n_files})
    fmt = "lance" if (HAVE_LANCE and not partition_cols) else "parquet"
    out = _read(tmp, fmt)
    row_count = out.count()

    import uuid

    doc = {
        "stage": stage,
        "fingerprint": fingerprint,
        "build_id": uuid.uuid4().hex[:16],
        "complete": True,
        "row_count": row_count,
        "partition_cols": partition_cols or [],
        "partitions": partitions,
        "inputs": inputs or [],
        "wall_time_sec": round(elapsed, 3),
        "metrics": metrics or {},
        "format": fmt,  # lance on deployments with the wheel
    }
    if fmt == "lance":
        # sibling manifest: never place a foreign file inside a Lance
        # dataset root.  Stale sibling removed BEFORE the dir swap so a
        # crash window leaves payload-without-manifest (=> rebuild),
        # never new-payload-with-old-manifest.
        with open(sibling_manifest_path(tmp), "w") as fh:
            json.dump(doc, fh, indent=1)
        for stale in (sibling_manifest_path(path),):
            if os.path.exists(stale):
                os.remove(stale)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        os.replace(sibling_manifest_path(tmp), sibling_manifest_path(path))
    else:
        with open(os.path.join(tmp, MANIFEST), "w") as fh:
            json.dump(doc, fh, indent=1)
        if os.path.exists(sibling_manifest_path(path)):
            os.remove(sibling_manifest_path(path))  # prior lance-format run
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
    return _read(path, fmt)
