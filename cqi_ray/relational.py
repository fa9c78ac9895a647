"""Relational building blocks on Ray Datasets: broadcast joins, bucketed
hash joins, exact dedup, partial-aggregate helpers.

Ray Data (2.49) has no native join, so the two scale-appropriate shapes
are implemented explicitly (see /opt/skills/guides/ray_guide.md "Joins"):

* **broadcast_map_join** — small right side: ``ray.put`` once, pandas merge
  inside ``map_batches``.  No shuffle; every task reads the same object.
* **bucketed_hash_join** — both sides large: co-partition on
  ``hash(key) % B`` and merge matching buckets.  Default plan (round 3)
  is the single-pass raw-task shuffle ``task_hash_join`` — split each
  side's pinned blocks into B hash pieces in one task wave, one pandas
  merge task per bucket — measured faster than the Dataset
  union/sort-groupby form at every probed size (scripts/join_probe.py).
  B and the optional salt column are the explicit knobs for skew.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit mixer (public splitmix64 constants)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _hash_bucket(values, num_buckets: int) -> np.ndarray:
    """Deterministic string/int hash -> bucket id (stable across workers,
    unlike Python's seeded hash()).  Integer keys take the fully
    vectorized splitmix64 path; strings go through pandas' C siphash."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        vals = _splitmix64(arr)
    else:
        vals = pd.util.hash_array(arr.astype(object), hash_key="0" * 16)
    return (vals % np.uint64(num_buckets)).astype(np.int64)


# --- shuffle sizing knobs (round 4) -------------------------------------
# Auto bucket sizing targets ~TARGET_BUCKET_BYTES of INPUT per reduce
# task; the guard splits any bucket above _GUARD_FACTOR x target into
# sub-buckets by a SECONDARY key hash (same keys stay together, so
# per-key semantics are preserved at any granularity).  Both are
# overridable per call and via env for the scale harnesses.
TARGET_BUCKET_BYTES = int(os.environ.get("CQI_TARGET_BUCKET_BYTES",
                                         128 << 20))
_GUARD_FACTOR = float(os.environ.get("CQI_BUCKET_GUARD_FACTOR", 2.0))
_AUTO_BUCKET_MIN = 16
_AUTO_BUCKET_MAX = 4096
_SPLIT_CHUNK_BYTES = 256 << 20   # split-task granularity while streaming
_SPLIT_CHUNK_BLOCKS = 32
_RESPLIT_SALT = np.uint64(0xA5A5A5A55A5A5A5A)


def _auto_bucket_count(total_bytes: int, target: int) -> int:
    return int(min(_AUTO_BUCKET_MAX,
                   max(_AUTO_BUCKET_MIN, -(-total_bytes // max(target, 1)))))


def _concat_parts(parts: list) -> pd.DataFrame:
    """Concat pieces, dropping zero-row frames first: empty pieces are
    routine (a chunk with no rows for a bucket), and pandas both warns
    on and (in future versions) changes dtype semantics for empty/all-NA
    entries in a concat — excluding them up front keeps today's dtypes,
    silences a per-task FutureWarning flood, and skips useless copies."""
    nonempty = [p for p in parts if len(p)]
    if not nonempty:
        return parts[0]
    if len(nonempty) == 1:
        return nonempty[0]
    import warnings

    with warnings.catch_warnings():
        # union-schema frames legitimately carry all-NA columns (e.g.
        # image rows' way columns); pandas emits one FutureWarning per
        # concat about their future dtype semantics — per shuffle task,
        # a stderr flood.  Downstream handles None and NaN uniformly,
        # so the future dtype change is immaterial here.
        warnings.simplefilter("ignore", FutureWarning)
        return pd.concat(nonempty, ignore_index=True)


def grouped_map_buckets(ds: rd.Dataset, key_cols: list[str], fn,
                        num_buckets: Optional[int] = None,
                        whole_bucket: bool = False,
                        shuffle_format: str = "pandas",
                        plan: str = "tasks",
                        presort: bool = True,
                        checkpoint_dir: Optional[str] = None,
                        checkpoint_key: str = "",
                        target_bucket_bytes: Optional[int] = None,
                        splittable: bool = True) -> rd.Dataset:
    """groupby(key).map_groups with bounded task count: keys are hashed into
    ``num_buckets`` coarse buckets (ONE shuffle on a small int key), and each
    bucket task runs a local pandas groupby over its keys.  This amortizes
    Ray's per-group overhead when there are thousands of small groups (cells,
    tiles, LSH bands) — the difference between O(#groups) tiny tasks and
    O(num_buckets) well-sized ones.

    With ``whole_bucket=True`` the callable receives the entire bucket
    frame, pre-sorted by ``key_cols``, and must handle group boundaries
    itself (numpy slice loops — no per-group pandas frames at all).  Use
    for hot kernels with very many small groups.

    **Bucket sizing (round 4).**  ``num_buckets=None`` (the default)
    auto-sizes the bucket count from the MEASURED input bytes (block
    metadata observed while the upstream stream is consumed), targeting
    ``target_bucket_bytes`` (module default ``TARGET_BUCKET_BYTES``,
    128 MiB) of input per reduce task — so the same call site is right
    at sf0.001 and at 100 TB.  An explicit ``num_buckets`` is honored
    as before, BUT every bucket is still protected by the byte guard:
    a bucket whose measured bytes exceed ``_GUARD_FACTOR x target`` is
    re-split by a SECONDARY hash of the same key columns into
    ceil(bytes/target) sub-buckets, each its own reduce task.  Keys
    never straddle sub-buckets, so any ``fn`` whose semantics are
    per-key (every caller in this repo: groupby kernels, dedup, set
    ops, anti joins) is granularity-invariant — pass
    ``splittable=False`` for a callable that genuinely needs its whole
    hash bucket in one frame.  A bucket holding a SINGLE hot key cannot
    be split further (per-group semantics need the whole group); the
    guard then isolates that key in its own task, bounding every other
    task at the target.

    ``plan='tasks'`` (default, round 3) runs the shuffle as one raw-task
    wave: chunked split tasks emit per-bucket pieces PLUS a per-bucket
    count vector, and apply tasks run ``fn`` only over NON-empty buckets
    (exactly the dataset plan's contract — fn never sees an empty
    bucket).  The Dataset form ('dataset': tag → repartition → native
    sort-groupby) pays two all-to-all exchanges and its sort-reduce goes
    super-linear past ~20M rows (scripts/relational_scale_experiment.py,
    scripts/join_probe.py); it remains the fallback for empty inputs.

    ``presort=False`` (whole-bucket mode only) skips the per-bucket sort
    by ``key_cols`` for callables that don't need group-contiguous rows
    (pure set/dedup/groupby kernels) — the sort is pure overhead there.

    NOTE: the task plan is EAGER — the upstream pipeline executes at
    call time (streamed into the split wave; apply tasks are scheduled
    async and land in the returned Dataset's blocks).  A shuffle is a
    pipeline barrier either way, but timing/fault harnesses must treat
    the CALL, not just the consume, as execution (this bit the fault
    experiment once — see scripts/fault_tolerance_experiment.py).
    Round 4: upstream blocks are consumed via streamed ref bundles
    (``iter_internal_ref_bundles``), NOT ``ds.materialize()`` — with an
    explicit ``num_buckets`` each split task launches as soon as its
    chunk of blocks lands and the driver drops its input refs right
    after scheduling, so input blocks are freed as the split wave
    consumes them (peak store residency ~1x input instead of 2x).
    With auto sizing the stream must be fully observed before B is
    known, so input refs are held until the split wave is scheduled —
    still no extra Dataset copy (scripts/spill_experiment.py measures
    both shapes).

    ``checkpoint_dir`` (task plan only) makes the shuffle RESUMABLE
    MID-SHUFFLE: every completed bucket's output is written atomically
    (tmp + rename) as ``bucket_%05d.parquet`` plus a lineage sidecar
    JSON (checkpoint_key, key_cols, num_buckets, bucket, rows, wall
    sec) by the apply task itself — a crash at ANY point preserves the
    finished buckets, and a re-run with the same ``checkpoint_key``
    recomputes only the missing ones (a fully-complete directory skips
    the input materialize and the split wave outright).  The caller's
    ``checkpoint_key`` must fingerprint the INPUT (upstream build id /
    source fingerprint — see state/checkpoint.py): sidecars with a
    different key are treated as stale and overwritten.  On a cluster
    the directory must be shared/cloud storage."""

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        h = np.zeros(len(batch), dtype=np.uint64)
        for col in key_cols:
            h = _splitmix64(h ^ _splitmix64_any(batch[col].to_numpy()))
        batch["__gb"] = (h % np.uint64(num_buckets)).astype(np.int64)
        return batch

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        group = group.drop(columns="__gb")
        if whole_bucket:
            if not presort:
                return fn(group)
            return fn(group.sort_values(key_cols, kind="mergesort",
                                        na_position="last"))
        outs = [fn(g) for _, g in group.groupby(key_cols, sort=True,
                                                dropna=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return fn(group.head(0))
        return pd.concat(outs, ignore_index=True)

    if plan == "tasks":
        out = _run_task_shuffle(ds, key_cols, per_bucket,
                                num_buckets=num_buckets,
                                checkpoint_dir=checkpoint_dir,
                                checkpoint_key=checkpoint_key,
                                target_bucket_bytes=target_bucket_bytes,
                                splittable=splittable)
        if out is not None:
            return rd.from_pandas_refs(out)
        # empty input: the dataset form below returns a typed empty

    if num_buckets is None:
        num_buckets = 64  # dataset-plan fallback keeps the legacy default

    # spread the shuffle's reduce side over one partition per bucket —
    # groupby output parallelism follows the input block count.
    # ``shuffle_format`` picks the block format that travels through the
    # sort shuffle; scripts/shuffle_experiment.py measures both per
    # workload (BASELINE.md records the numbers: pandas wins on the
    # object/binary-heavy spatial workloads because upstream stages
    # already produce pandas blocks and the conversion costs more than
    # the Arrow sort saves on the low-cardinality __gb key).
    if shuffle_format == "pyarrow":
        def add_bucket_arrow(t: pa.Table) -> pa.Table:
            h = np.zeros(t.num_rows, dtype=np.uint64)
            for col in key_cols:
                arr = t[col].to_numpy(zero_copy_only=False)
                h = _splitmix64(h ^ _splitmix64_any(arr))
            return t.append_column(
                "__gb", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

        tagged = ds.map_batches(add_bucket_arrow, batch_format="pyarrow",
                                batch_size=None).repartition(num_buckets)
        return tagged.groupby("__gb").map_groups(
            lambda t: per_bucket(t.to_pandas()), batch_format="pyarrow")

    tagged = ds.map_batches(add_bucket, batch_format="pandas",
                            batch_size=None).repartition(num_buckets)
    return tagged.groupby("__gb").map_groups(per_bucket, batch_format="pandas")


def _splitmix64_any(arr: np.ndarray) -> np.ndarray:
    a = np.asarray(arr)
    if a.dtype.kind in ("i", "u"):
        return _splitmix64(a)
    if a.dtype.kind == "f":
        return _splitmix64(a.view(np.uint64) if a.dtype == np.float64
                           else a.astype(np.float64).view(np.uint64))
    return pd.util.hash_array(a.astype(object), hash_key="0" * 16)


def broadcast_map_join(ds: rd.Dataset, right: pd.DataFrame, on: str,
                       how: str = "left", batch_format: str = "pandas") -> rd.Dataset:
    """Left join a Dataset against a small in-memory frame (broadcast once
    via ray.put; tasks read it zero-copy-ish from their node's object
    store).  Stateless task pool on purpose: an actor pool paid ~1.5-2 s
    of spin-up per invocation for a join with no real per-actor state
    (measured 2.7 s -> 0.9 s warm on the sf0.1 orders⨝customer)."""
    ref = ray.put(right)

    def join_fn(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=on, how=how)

    return ds.map_batches(join_fn, batch_format=batch_format)


def _block_to_pandas(block) -> pd.DataFrame:
    return block if isinstance(block, pd.DataFrame) else block.to_pandas()


def _nonempty_block_refs(ds: rd.Dataset) -> list:
    """Block refs of a materialized Dataset, skipping zero-row blocks
    (whose pandas form can be columnless)."""
    out = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                out.append(ref)
    return out


def _chunk_refs(refs: list, max_tasks: int = 64) -> list:
    """Contiguous ref chunks, at most ``max_tasks`` of them — one split
    task per chunk keeps the piece-object count ~max_tasks × buckets
    regardless of input block count (4096+ pieces put a ~5 s fixed
    floor under a shuffle; ~2k do not)."""
    k = min(len(refs), max_tasks)
    step = -(-len(refs) // k)
    return [refs[i:i + step] for i in range(0, len(refs), step)]


def _bucket_bytes(g: np.ndarray, frame: pd.DataFrame,
                  minlength: int) -> np.ndarray:
    """Per-bucket byte estimate for the oversized-bucket guard:
    fixed-width columns contribute rows x itemsize exactly; object
    columns (strings/bytes payloads — the skew signal) contribute their
    element lengths, measured EXACTLY up to 2^18 rows and by an unbiased
    1-in-stride row sample above (the python-level len() walk costs as
    much as the split sort itself at millions of rows, and the guard
    only needs accuracy on buckets big enough to matter — which a
    proportional sample covers by construction)."""
    n = len(frame)
    counts = np.bincount(g, minlength=minlength).astype(np.int64)
    total = np.zeros(minlength, dtype=np.int64)
    obj_cols = []
    for col in frame.columns:
        s = frame[col]
        if s.dtype == object:
            obj_cols.append(col)
        else:
            # extension dtypes (category, nullable Int64, ...) have no
            # itemsize; 8 is the right order of magnitude for the guard
            total += counts * getattr(s.dtype, "itemsize", 8)
    if not obj_cols or n == 0:
        return total
    if n > (1 << 18):
        stride = n // (1 << 17)
        idx = np.arange(0, n, stride)
    else:
        stride = 1
        idx = np.arange(n)
    per = np.zeros(len(idx), dtype=np.int64)
    for col in obj_cols:
        vals = frame[col].to_numpy()[idx]
        per += np.fromiter(
            (len(v) if isinstance(v, (bytes, str)) else 16 for v in vals),
            dtype=np.int64, count=len(vals))
    total += (np.bincount(g[idx], weights=per, minlength=minlength)
              * stride).astype(np.int64)
    return total


def _keyhash(b: pd.DataFrame, key_cols: list) -> np.ndarray:
    h = np.zeros(len(b), dtype=np.uint64)
    for col in key_cols:
        h = _splitmix64(h ^ _splitmix64_any(b[col].to_numpy()))
    return h


@ray.remote
def _split_by_keyhash(refs: list, key_cols: list, num_buckets: int):
    """One piece per hash bucket of ``key_cols`` over a chunk of blocks,
    PLUS a trailing (2, B) stats array — row 0 per-bucket row counts,
    row 1 per-bucket byte estimates (num_returns is set to
    ``num_buckets + 1`` at the call site).  Counts let the driver skip
    apply tasks for empty buckets (preserving the dataset plan's
    fn-never-sees-an-empty-bucket contract); bytes drive the oversized-
    bucket split guard.  Pieces keep the '__gb' column so the shared
    per_bucket closure drops it as usual."""
    parts = [_block_to_pandas(b) for b in ray.get(list(refs))]
    b = _concat_parts(parts)
    gb = (_keyhash(b, key_cols) % np.uint64(num_buckets)).astype(np.int64)
    b = b.copy()
    b["__gb"] = gb
    order = np.argsort(gb, kind="stable")
    bounds = np.searchsorted(gb[order], np.arange(num_buckets + 1))
    sb = b.take(order)
    stats = np.zeros((2, num_buckets), dtype=np.int64)
    stats[0] = np.bincount(gb, minlength=num_buckets)
    stats[1] = _bucket_bytes(gb, b, num_buckets)
    return (*(sb.iloc[bounds[i]:bounds[i + 1]]
              for i in range(num_buckets)), stats)


@ray.remote
def _resplit_piece(piece: pd.DataFrame, key_cols: list, k: int):
    """Secondary split of ONE oversized bucket's piece into ``k``
    sub-buckets by a re-salted hash of the SAME key columns (same key ->
    same sub-bucket, so per-key semantics survive the finer
    granularity), plus a trailing (2, k) stats array.  The piece is
    chunk-sized by construction, so this task's memory is bounded even
    when the bucket as a whole is not."""
    h2 = _splitmix64(_keyhash(piece, key_cols) ^ _RESPLIT_SALT)
    g = (h2 % np.uint64(k)).astype(np.int64)
    order = np.argsort(g, kind="stable")
    bounds = np.searchsorted(g[order], np.arange(k + 1))
    sb = piece.take(order)
    stats = np.zeros((2, k), dtype=np.int64)
    stats[0] = np.bincount(g, minlength=k)
    stats[1] = _bucket_bytes(g, piece, k)
    return (*(sb.iloc[bounds[i]:bounds[i + 1]] for i in range(k)), stats)


@ray.remote
def _ckpt_commit_concat(refs: list, ckpt_dir: str, key: str, key_cols: list,
                        num_buckets: int, b: int, sec: float) -> pd.DataFrame:
    """Concatenate an oversized bucket's sub-apply OUTPUTS (bounded by fn
    output size, not input size) and commit them as that bucket's single
    checkpoint payload + sidecar."""
    parts = ray.get(list(refs))
    out = _concat_parts(parts)
    _ckpt_write_payload(ckpt_dir, key, key_cols, num_buckets, b, out, sec)
    return out


def _iter_block_refs(ds: rd.Dataset):
    """Stream (block_ref, approx_bytes) pairs out of a Dataset as its
    execution produces them — the streaming replacement for
    ``ds.materialize()`` + ``_nonempty_block_refs`` (zero-row blocks are
    skipped by metadata; a missing size estimate falls back to 1 MiB)."""
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is not None and meta.num_rows == 0:
                continue
            yield ref, int(meta.size_bytes or (1 << 20))


def _run_task_shuffle(ds: rd.Dataset, key_cols: list, per_bucket,
                      num_buckets: Optional[int],
                      checkpoint_dir: Optional[str], checkpoint_key: str,
                      target_bucket_bytes: Optional[int],
                      splittable: bool) -> Optional[list]:
    """The single-pass raw-task shuffle behind ``grouped_map_buckets``
    (plan='tasks').  Returns a list of pandas-frame ObjectRefs (one per
    reduce task) or ``None`` for an empty input (the caller falls back
    to the dataset plan, which types empties correctly).

    Shape: stream upstream blocks -> chunked split wave (one task per
    ~_SPLIT_CHUNK_BYTES of input, num_returns = B pieces + stats) ->
    byte-guarded reduce wave (oversized buckets re-split by a secondary
    key hash into sub-tasks).  See grouped_map_buckets' docstring for
    the sizing/guard/checkpoint contracts."""
    target = target_bucket_bytes or TARGET_BUCKET_BYTES
    guard = int(target * _GUARD_FACTOR)
    B = num_buckets
    done: dict[int, dict] = {}
    if checkpoint_dir:
        if B is None:
            # resume must reuse the original run's bucket count — auto
            # sizing could land elsewhere on a resized input
            B = _ckpt_existing_bucket_count(checkpoint_dir, checkpoint_key,
                                            key_cols)
        if B is not None:
            done = _ckpt_scan(checkpoint_dir, checkpoint_key, key_cols, B)
            if len(done) == B:  # fully-complete shuffle: skip everything
                out = [_ckpt_read_bucket.remote(
                           os.path.join(checkpoint_dir, m["file"]))
                       for m in done.values() if m["rows"] > 0]
                if out:
                    return out
                empties = [m for m in done.values() if m.get("file")]
                if empties:  # fn ran and produced 0 rows everywhere:
                    # return ONE typed-empty payload instead of falling
                    # through to a full upstream re-execution
                    return [_ckpt_read_bucket.remote(
                        os.path.join(checkpoint_dir, empties[0]["file"]))]
                return None  # input itself was empty

    waves = []
    chunk: list = []
    chunk_bytes = 0
    chunk_target = _SPLIT_CHUNK_BYTES
    chunk_blocks = _SPLIT_CHUNK_BLOCKS

    def _flush():
        nonlocal chunk, chunk_bytes, chunk_target, chunk_blocks
        if chunk:
            split = _split_by_keyhash.options(num_returns=B + 1)
            waves.append(split.remote(list(chunk), key_cols, B))
            chunk = []
            chunk_bytes = 0
            if len(waves) % 64 == 0:
                # piece-object count is waves x B; unbounded chunk count
                # at huge inputs would reintroduce the 4096+-object
                # scheduling floor _chunk_refs was built to avoid —
                # grow the chunk granularity geometrically instead, so
                # waves stay O(64 log(input/64*chunk)) at any size
                chunk_target *= 2
                chunk_blocks *= 2

    if B is None:
        # auto sizing: observe the whole stream first (refs held until
        # the split wave is scheduled), then B = ceil(bytes / target)
        pending = list(_iter_block_refs(ds))
        if not pending:
            return None
        total = sum(nb for _, nb in pending)
        B = _auto_bucket_count(total, target)
        for ref, nb in pending:
            chunk.append(ref)
            chunk_bytes += nb
            if chunk_bytes >= chunk_target or len(chunk) >= chunk_blocks:
                _flush()
        _flush()
        del pending
    else:
        # explicit B: launch split tasks AS upstream blocks land and drop
        # the driver's input refs immediately — blocks are freed as soon
        # as their split task consumes them (streaming backpressure)
        for ref, nb in _iter_block_refs(ds):
            chunk.append(ref)
            chunk_bytes += nb
            if chunk_bytes >= chunk_target or len(chunk) >= chunk_blocks:
                _flush()
        _flush()
    if not waves:
        return None

    stats = np.sum(ray.get([w[B] for w in waves]), axis=0)
    counts, nbytes = stats[0], stats[1]
    out: list = []
    for b in range(B):
        if b in done:
            if done[b]["rows"] > 0:
                out.append(_ckpt_read_bucket.remote(
                    os.path.join(checkpoint_dir, done[b]["file"])))
            continue
        if counts[b] == 0:
            if checkpoint_dir:
                _ckpt_write_sidecar(checkpoint_dir, checkpoint_key,
                                    key_cols, B, b, rows=0, sec=0.0)
            continue
        pieces = [w[b] for w in waves]
        if splittable and nbytes[b] > guard and counts[b] > 1:
            # oversized bucket: secondary-hash re-split into ~target-
            # sized sub-buckets, one reduce task each (a single hot key
            # still lands in one sub-bucket — irreducible under
            # per-group semantics, but every other key is spread)
            k = int(min(64, -(-nbytes[b] // target)))
            rs = _resplit_piece.options(num_returns=k + 1)
            rwaves = [rs.remote(p, key_cols, k) for p in pieces]
            sstats = np.sum(ray.get([r[k] for r in rwaves]), axis=0)
            subs = [_apply_bucket_task.remote(
                        per_bucket, [r[j] for r in rwaves])
                    for j in range(k) if sstats[0][j] > 0]
            if checkpoint_dir:
                out.append(_ckpt_commit_concat.remote(
                    subs, checkpoint_dir, checkpoint_key, key_cols, B, b,
                    0.0))
            else:
                out.extend(subs)
        elif checkpoint_dir:
            out.append(_apply_bucket_task_ckpt.remote(
                per_bucket, pieces,
                checkpoint_dir, checkpoint_key, key_cols, B, b))
        else:
            out.append(_apply_bucket_task.remote(per_bucket, pieces))
    if out:
        return out
    # partial resume where every remaining bucket is empty and every
    # done bucket produced 0 rows: surface a typed-empty payload rather
    # than falling through to a full upstream re-execution
    for m in done.values():
        if m.get("file"):
            return [_ckpt_read_bucket.remote(
                os.path.join(checkpoint_dir, m["file"]))]
    return None


@ray.remote
def _apply_bucket_task(fn, pieces: list) -> pd.DataFrame:
    """Concatenate one bucket's pieces in block order and apply ``fn``
    (the per_bucket closure — pickled by value with each task)."""
    parts = ray.get(list(pieces))
    b = _concat_parts(parts)
    return fn(b)


# --- mid-shuffle checkpoint machinery (grouped_map_buckets task plan) ----
#
# Robustness contract (round 4, closing the round-3 ADVICE items):
#   * payload filenames embed a hash of checkpoint_key
#     (``bucket_%05d_<keyhash>.parquet``), so a crash after a NEW key's
#     payload write but before its sidecar can never leave an OLD key's
#     still-matching sidecar pointing at the new key's data;
#   * _ckpt_atomic_write fsyncs the tmp file AND the directory around
#     the rename, so the "finished buckets survive a crash" claim holds
#     for OS/power crashes, not just process kills;
#   * _ckpt_scan validates each payload's parquet-footer row count
#     against the sidecar (a truncated/empty payload reads as
#     not-done), and PURGES sidecars+payloads whose checkpoint_key no
#     longer matches (single-writer per directory, as documented);
#   * a bucket whose fn output is EMPTY still writes a typed empty
#     parquet payload, so a fully-complete all-empty shuffle resumes to
#     a typed empty dataset instead of re-executing the upstream
#     pipeline.

def _ckpt_meta(key: str, key_cols: list, num_buckets: int, b: int) -> dict:
    return {"checkpoint_key": key, "key_cols": list(key_cols),
            "num_buckets": int(num_buckets), "bucket": int(b)}


def _ckpt_keyhash(key: str) -> str:
    import hashlib

    return hashlib.md5(key.encode()).hexdigest()[:10]


def _ckpt_payload_name(key: str, b: int) -> str:
    return f"bucket_{b:05d}_{_ckpt_keyhash(key)}.parquet"


def _ckpt_atomic_write(path: str, data: bytes) -> None:
    """tmp + fsync + rename + dir fsync: after this returns, the file is
    durably either absent or complete, even across an OS crash."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(data)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)
    dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _ckpt_write_sidecar(ckpt_dir: str, key: str, key_cols: list,
                        num_buckets: int, b: int, rows: int, sec: float,
                        file: str = "") -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    meta = _ckpt_meta(key, key_cols, num_buckets, b)
    meta.update({"rows": int(rows), "sec": round(float(sec), 4),
                 "file": file, "written_at": time.time()})
    _ckpt_atomic_write(os.path.join(ckpt_dir, f"bucket_{b:05d}.json"),
                       json.dumps(meta).encode())


def _ckpt_write_payload(ckpt_dir: str, key: str, key_cols: list,
                        num_buckets: int, b: int, out: pd.DataFrame,
                        sec: float) -> None:
    """Payload (ALWAYS, even for an empty result — the typed-empty
    resume needs the schema) then sidecar; payload name is lineage-keyed
    so stale-key payloads can never be claimed by another key's
    sidecar."""
    import io

    os.makedirs(ckpt_dir, exist_ok=True)
    fname = _ckpt_payload_name(key, b)
    buf = io.BytesIO()
    out.to_parquet(buf)
    _ckpt_atomic_write(os.path.join(ckpt_dir, fname), buf.getvalue())
    _ckpt_write_sidecar(ckpt_dir, key, key_cols, num_buckets, b,
                        rows=len(out), sec=sec, file=fname)


def _parquet_num_rows(path: str) -> Optional[int]:
    try:
        import pyarrow.parquet as pq

        return pq.read_metadata(path).num_rows
    except Exception:
        return None


def _ckpt_scan(ckpt_dir: str, key: str, key_cols: list,
               num_buckets: int) -> dict:
    """Completed buckets of a prior run with MATCHING lineage meta.
    Stale artifacts — different key/key_cols/bucket count, payload
    filename not keyed to this checkpoint_key, payload missing, or
    payload row count disagreeing with the sidecar — are ignored AND
    deleted (the directory is single-writer per run by contract; purging
    keeps superseded-key payloads from accumulating across reruns).

    Only files that match the checkpoint naming scheme
    (``bucket_*.parquet`` / ``bucket_*.json`` and their ``.tmp.`` forms)
    are ever considered for deletion: a caller who points
    ``checkpoint_dir`` at a directory holding unrelated parquet data
    must not lose it — the single-writer contract promises exclusive
    *checkpoint* writes, not an empty directory."""
    done: dict = {}
    if not os.path.isdir(ckpt_dir):
        return done
    kh = _ckpt_keyhash(key)
    stale: list[str] = []
    for name in sorted(os.listdir(ckpt_dir)):
        if not name.startswith("bucket_"):
            continue  # foreign file: never touch
        full = os.path.join(ckpt_dir, name)
        if name.endswith(".parquet") and not name.endswith(f"_{kh}.parquet"):
            stale.append(full)  # another key's payload
            continue
        if ".tmp." in name:
            stale.append(full)  # interrupted atomic write
            continue
        if not name.endswith(".json"):
            continue
        try:
            with open(full) as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            stale.append(full)
            continue
        b = meta.get("bucket", -1)
        if {k: meta.get(k) for k in
                ("checkpoint_key", "key_cols", "num_buckets", "bucket")} \
                != _ckpt_meta(key, key_cols, num_buckets, b):
            stale.append(full)
            continue
        f = meta.get("file") or ""
        if f:
            if not f.endswith(f"_{kh}.parquet"):
                stale.append(full)  # legacy / foreign payload name
                continue
            n = _parquet_num_rows(os.path.join(ckpt_dir, f))
            if n is None or n != meta["rows"]:
                stale.append(full)  # missing or truncated payload
                continue
        elif meta["rows"] > 0:
            continue
        done[int(b)] = meta
    for p in stale:
        try:
            os.remove(p)
        except OSError:
            pass
    return done


def _ckpt_existing_bucket_count(ckpt_dir: str, key: str,
                                key_cols: list) -> Optional[int]:
    """num_buckets recorded by a prior run of the SAME checkpoint key —
    auto-sized resumes must reuse it or every sidecar reads as stale."""
    if not os.path.isdir(ckpt_dir):
        return None
    for name in sorted(os.listdir(ckpt_dir)):
        if not (name.startswith("bucket_") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(ckpt_dir, name)) as fh:
                meta = json.load(fh)
        except (OSError, ValueError):
            continue
        if (meta.get("checkpoint_key") == key
                and meta.get("key_cols") == list(key_cols)):
            return int(meta["num_buckets"])
    return None


@ray.remote
def _ckpt_read_bucket(path: str) -> pd.DataFrame:
    return pd.read_parquet(path)


@ray.remote
def _apply_bucket_task_ckpt(fn, pieces: list, ckpt_dir: str, key: str,
                            key_cols: list, num_buckets: int,
                            b: int) -> pd.DataFrame:
    """_apply_bucket_task that persists its result before returning it:
    parquet payload (atomic fsynced tmp+rename, lineage-keyed filename)
    then the lineage sidecar — a bucket is resumable iff its sidecar
    exists AND its payload row count matches, so a crash between the two
    writes just recomputes that bucket."""
    parts = ray.get(list(pieces))
    frame = _concat_parts(parts)
    t0 = time.monotonic()
    out = fn(frame)
    sec = time.monotonic() - t0
    _ckpt_write_payload(ckpt_dir, key, key_cols, num_buckets, b, out, sec)
    return out


@ray.remote
def _split_by_int_col(refs: list, col: str, num_buckets: int):
    """One piece per DIRECT integer value of ``col`` in [0, num_buckets)
    over a chunk of blocks (num_returns set at the call site) — the
    no-hash split for shuffles whose partition id is already a column
    (range partitioning, pre-computed cells)."""
    parts = [_block_to_pandas(b) for b in ray.get(list(refs))]
    b = _concat_parts(parts)
    h = np.clip(b[col].to_numpy(dtype=np.int64), 0, num_buckets - 1)
    order = np.argsort(h, kind="stable")
    bounds = np.searchsorted(h[order], np.arange(num_buckets + 1))
    sb = b.take(order)
    if num_buckets == 1:
        return sb
    return tuple(sb.iloc[bounds[i]:bounds[i + 1]]
                 for i in range(num_buckets))


@ray.remote
def _split_by_bucket(refs: list, on: str, num_buckets: int):
    """One stable-ordered piece per hash bucket of ``on`` over a CHUNK of
    blocks, PLUS a trailing (2, B) stats array (rows / byte estimate per
    bucket — num_returns is set to ``num_buckets + 1`` at the call
    site).  Chunking matters: one split task per block at 128 blocks ×
    32 buckets makes 4096 store objects whose fixed costs (~1 ms each)
    put a ~5 s floor under the whole join; ~64 split tasks keep the
    piece count ~2k regardless of input block count."""
    parts = [_block_to_pandas(b) for b in ray.get(list(refs))]
    b = _concat_parts(parts)
    h = _hash_bucket(b[on].to_numpy(), num_buckets)
    order = np.argsort(h, kind="stable")
    bounds = np.searchsorted(h[order], np.arange(num_buckets + 1))
    sb = b.take(order)
    stats = np.zeros((2, num_buckets), dtype=np.int64)
    stats[0] = np.bincount(h, minlength=num_buckets)
    stats[1] = _bucket_bytes(h, b, num_buckets)
    return (*(sb.iloc[bounds[i]:bounds[i + 1]]
              for i in range(num_buckets)), stats)


@ray.remote
def _split_salted(refs: list, on: str, num_buckets: int, salts: int,
                  side: int):
    """Salted split over a chunk of blocks: left rows (side=0) get
    salt = position % salts; right rows (side=1) are replicated once
    per salt.  Pieces bucket on hash(key) ^ salt and carry '__salt'."""
    parts = [_block_to_pandas(b) for b in ray.get(list(refs))]
    b = _concat_parts(parts)
    if side == 0:
        salt = (np.arange(len(b)) % salts).astype(np.uint64)
        b = b.copy()
    else:
        b = b.loc[b.index.repeat(salts)].reset_index(drop=True)
        salt = np.tile(np.arange(salts, dtype=np.uint64), len(b) // salts)
    h = _splitmix64(_salt_key_hash(b[on].to_numpy()) ^ salt)
    b["__salt"] = salt.astype(np.int64)
    hb = (h % np.uint64(num_buckets)).astype(np.int64)
    order = np.argsort(hb, kind="stable")
    bounds = np.searchsorted(hb[order], np.arange(num_buckets + 1))
    sb = b.take(order)
    if num_buckets == 1:
        return sb
    return tuple(sb.iloc[bounds[i]:bounds[i + 1]]
                 for i in range(num_buckets))


@ray.remote
def _rank_range_task(part: int, pieces: list, off, value_col: str,
                     id_col: str) -> pd.DataFrame:
    """Sort one range partition and attach its global row numbers.
    ``off`` arrives resolved (top-level ObjectRef args dematerialize);
    ``pieces`` arrive as refs (refs nested in a list do not)."""
    parts = ray.get(list(pieces))
    b = _concat_parts(parts)
    gs = b.sort_values([value_col, id_col], kind="mergesort")
    return pd.DataFrame({
        id_col: gs[id_col].to_numpy(),
        value_col: gs[value_col].to_numpy(),
        "rn": off[part] + np.arange(1, len(gs) + 1, dtype=np.int64)})


@ray.remote
def _join_bucket_task(on: str, right_cols: list, how: str,
                      restore_dtypes, left_pieces, right_pieces,
                      salt_col: Optional[str] = None) -> pd.DataFrame:
    """Local pandas merge of one co-partitioned bucket (pieces arrive as
    refs inside the lists; resolved here in block order, so the output
    row order is deterministic).  With ``salt_col`` the merge key is
    ``[on, salt_col]`` and the salt column is dropped afterwards (the
    skew-spreading salted plan)."""
    lparts = ray.get(list(left_pieces))
    rparts = ray.get(list(right_pieces))
    lhs = _concat_parts(lparts)
    keep_r = list(right_cols) + ([salt_col] if salt_col else [])
    if rparts:
        rhs = _concat_parts(rparts)
        rhs = rhs[[c for c in keep_r if c in rhs.columns]]
    else:
        rhs = pd.DataFrame(columns=keep_r)
    # a non-key column present on BOTH sides resolves to the RIGHT copy,
    # mirroring the union path (merge_bucket's left_cols excludes every
    # right_only column)
    clash = [c for c in right_cols
             if c != on and c in lhs.columns and c in rhs.columns]
    if clash:
        lhs = lhs.drop(columns=clash)
    keys = [on, salt_col] if salt_col else on
    merged = lhs.merge(rhs, on=keys, how=how)
    if salt_col:
        merged = merged.drop(columns=salt_col)
    for c in right_cols:
        if c not in merged.columns:
            merged[c] = None
    if restore_dtypes:
        for c, t in restore_dtypes.items():
            if c in merged.columns:
                try:
                    merged[c] = merged[c].astype(t)
                except (ValueError, TypeError):
                    pass
    return merged


def _stream_split_waves(ds: rd.Dataset, on: str, B: int) -> list:
    """Launch ``_split_by_bucket`` tasks over ``ds``'s blocks as its
    execution streams them out, dropping the driver's input refs right
    after each chunk is scheduled (blocks are freed as split tasks
    consume them).  Returns the list of wave handles (each ``B + 1``
    refs: B pieces + stats)."""
    waves, chunk, chunk_bytes = [], [], 0
    target, blocks = _SPLIT_CHUNK_BYTES, _SPLIT_CHUNK_BLOCKS
    split = _split_by_bucket.options(num_returns=B + 1)
    for ref, nb in _iter_block_refs(ds):
        chunk.append(ref)
        chunk_bytes += nb
        if chunk_bytes >= target or len(chunk) >= blocks:
            waves.append(split.remote(list(chunk), on, B))
            chunk, chunk_bytes = [], 0
            if len(waves) % 64 == 0:
                target *= 2  # bound wave count at any input size
                blocks *= 2
    if chunk:
        waves.append(split.remote(list(chunk), on, B))
    return waves


def task_hash_join(left: rd.Dataset, right: rd.Dataset, on: str,
                   right_cols: Iterable[str],
                   num_buckets: Optional[int] = 32,
                   how: str = "inner",
                   restore_dtypes: Optional[dict] = None,
                   target_bucket_bytes: Optional[int] = None) -> rd.Dataset:
    """Single-pass raw-task hash shuffle join — the at-scale plan behind
    ``bucketed_hash_join(plan='adaptive')``.

    The Dataset form (union → repartition → sort-groupby) moves the data
    through TWO all-to-all exchanges and pays the sort machinery on a
    NaN-widened union schema; measured at 40M⨝100k rows that is ~460 s
    of remote CPU for ~60 s of kernel work (scripts/join_probe.py).
    Here each side's blocks are split ONCE into ``num_buckets`` hash
    pieces (one wave of tasks, ``num_returns=B+1`` — pieces + stats),
    and one join task per bucket concatenates its pieces in block order
    and runs the local pandas merge — one data movement, no sort, no
    union schema, each side keeps its own dtypes (no NaN upcasts).
    Object count is O(blocks × buckets), one round — far below the B²
    per-round regime the graph experiments showed matters.

    Round 4: inputs are STREAMED into the split wave (blocks freed as
    consumed — no full materialize), ``num_buckets=None`` auto-sizes B
    from the left side's measured bytes (``TARGET_BUCKET_BYTES`` per
    bucket), and any bucket whose combined left+right bytes exceed the
    guard is re-split by a secondary key hash into ~target-sized
    sub-buckets, one join task each (same key -> same sub-bucket on
    both sides, so every join flavour stays exact).
    Output: one block per (sub-)bucket via ``from_pandas_refs``, bucket
    order — deterministic end to end."""
    right_cols = list(right_cols)
    target = target_bucket_bytes or TARGET_BUCKET_BYTES
    guard = int(target * _GUARD_FACTOR)
    if num_buckets is None:
        # observe the left (big) side first to size B, holding its refs
        l_pending = list(_iter_block_refs(left))
        total = sum(nb for _, nb in l_pending)
        B = _auto_bucket_count(total, target)
        split = _split_by_bucket.options(num_returns=B + 1)
        lp, chunk, cb = [], [], 0
        tgt, blk = _SPLIT_CHUNK_BYTES, _SPLIT_CHUNK_BLOCKS
        for ref, nb in l_pending:
            chunk.append(ref)
            cb += nb
            if cb >= tgt or len(chunk) >= blk:
                lp.append(split.remote(list(chunk), on, B))
                chunk, cb = [], 0
                if len(lp) % 64 == 0:
                    tgt *= 2
                    blk *= 2
        if chunk:
            lp.append(split.remote(list(chunk), on, B))
        del l_pending
    else:
        B = num_buckets
        lp = _stream_split_waves(left, on, B)
    rp = _stream_split_waves(right, on, B)
    if not lp or not rp:
        # a side with NO non-empty blocks: the dataset plan handles
        # empty inputs for every `how`
        return bucketed_hash_join(left, right, on=on, right_cols=right_cols,
                                  num_buckets=max(1, (B or 2) // 2),
                                  how=how, restore_dtypes=restore_dtypes,
                                  plan="dataset")
    lstats = np.sum(ray.get([w[B] for w in lp]), axis=0)
    rstats = np.sum(ray.get([w[B] for w in rp]), axis=0)
    out = []
    for b in range(B):
        if lstats[0][b] == 0 and rstats[0][b] == 0:
            continue  # no rows on either side: empty for every `how`
        lpieces = [p[b] for p in lp]
        rpieces = [p[b] for p in rp]
        bucket_bytes = int(lstats[1][b] + rstats[1][b])
        bucket_rows = int(lstats[0][b] + rstats[0][b])
        if bucket_bytes > guard and bucket_rows > 1:
            k = int(min(64, -(-bucket_bytes // target)))
            rs = _resplit_piece.options(num_returns=k + 1)
            lrw = [rs.remote(p, [on], k) for p in lpieces]
            rrw = [rs.remote(p, [on], k) for p in rpieces]
            lss = np.sum(ray.get([r[k] for r in lrw]), axis=0)
            rss = np.sum(ray.get([r[k] for r in rrw]), axis=0)
            for j in range(k):
                if lss[0][j] == 0 and rss[0][j] == 0:
                    continue
                out.append(_join_bucket_task.remote(
                    on, right_cols, how, restore_dtypes,
                    [r[j] for r in lrw], [r[j] for r in rrw]))
        else:
            out.append(_join_bucket_task.remote(
                on, right_cols, how, restore_dtypes, lpieces, rpieces))
    if not out:
        return bucketed_hash_join(left, right, on=on, right_cols=right_cols,
                                  num_buckets=1, how=how,
                                  restore_dtypes=restore_dtypes,
                                  plan="dataset")
    return rd.from_pandas_refs(out)


def bucketed_hash_join(left: rd.Dataset, right: rd.Dataset, on: str,
                       right_cols: Iterable[str],
                       num_buckets: Optional[int] = None, how: str = "inner",
                       restore_dtypes: Optional[dict] = None,
                       plan: str = "adaptive") -> rd.Dataset:
    """Partitioned hash join: one shuffle (groupby bucket) over the union of
    both sides, pandas merge per bucket.

    ``right_cols`` is the right side's full column list (including ``on``) —
    the union block carries left ∪ right columns, so the per-bucket merge
    needs the split spelled out to reconstruct the two sides.

    ``restore_dtypes``: {col: dtype} applied to the merged output.  The
    union shuffle fills each side's missing columns with NaN, which
    silently upcasts the OTHER side's int columns to float64 — a float key
    then hashes differently from an int key in any downstream join.
    Callers chaining joins should pin their left side's integer columns
    here (cheap metadata; avoids a schema fetch that would execute the
    upstream pipeline).

    ``plan``: 'tasks' / 'adaptive' (default) take the single-pass raw-task
    shuffle (``task_hash_join``); 'dataset' keeps the union/sort-groupby
    form below.  The task plan measured faster at EVERY probed size
    (scripts/join_probe.py best-of-4 warm, 32 CPUs: 0.34 s vs 1.02 s at
    500k⨝100k, 0.96 vs 2.53 s at 20M, 1.35 vs 12.48 s at 40M — the
    dataset form pays two all-to-all exchanges plus ~1 s of executor
    floors, and its sort-reduce goes super-linear past ~20M rows).
    'adaptive' additionally sizes the bucket count so one bucket holds
    ~2M rows (bounded per-task memory at any input size).  Both task
    paths materialize the inputs; the all-to-all barrier materializes
    them in every plan, so this costs no extra pass."""
    right_cols = list(right_cols)
    if plan == "tasks":
        return task_hash_join(left, right, on=on, right_cols=right_cols,
                              num_buckets=max(num_buckets or 0, 32), how=how,
                              restore_dtypes=restore_dtypes)
    if plan == "adaptive":
        # byte-based auto sizing (round 4): B = ceil(measured bytes /
        # TARGET_BUCKET_BYTES) observed from the streamed blocks, with
        # the caller's num_buckets (if given) as the floor so tuned call
        # sites keep their minimum reduce parallelism
        left = left.materialize()
        right = right.materialize()
        total = (left.size_bytes() or 0) + (right.size_bytes() or 0)
        B = max(num_buckets or 0, 32,
                _auto_bucket_count(total, TARGET_BUCKET_BYTES))
        return task_hash_join(left, right, on=on, right_cols=right_cols,
                              num_buckets=int(B), how=how,
                              restore_dtypes=restore_dtypes)
    num_buckets = num_buckets or 16  # dataset plan partitions directly
    right_only = [c for c in right_cols if c != on]

    def tag(side: int):
        def _tag(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__bucket"] = _hash_bucket(batch[on].to_numpy(), num_buckets)
            batch["__side"] = np.int8(side)  # int8, not str: object columns
            return batch                     # pickle slowly through shuffles
        return _tag

    lt = left.map_batches(tag(0), batch_format="pandas")
    rt = right.map_batches(tag(1), batch_format="pandas")
    # coalesce before the all-to-all: the sort-based shuffle materializes
    # O(blocks x partitions) fragments, so shuffling 128 tiny blocks into
    # 128 partitions costs far more scheduling than the data moves warrant
    union = lt.union(rt).repartition(num_buckets)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        left_cols = [c for c in group.columns
                     if c not in right_only and c not in ("__side", "__bucket")]
        lhs = group.loc[group["__side"] == 0, left_cols]
        rhs = group.loc[group["__side"] == 1,
                        [c for c in right_cols if c in group.columns]]
        merged = lhs.merge(rhs, on=on, how=how)
        for c in right_cols:
            if c not in merged.columns:
                merged[c] = None
        if restore_dtypes:
            for c, t in restore_dtypes.items():
                if c in merged.columns:
                    try:
                        merged[c] = merged[c].astype(t)
                    except (ValueError, TypeError):
                        pass  # NaNs from an outer join: leave as-is
        return merged

    return union.groupby("__bucket").map_groups(merge_bucket, batch_format="pandas")


def salted_hash_join(left: rd.Dataset, right: rd.Dataset, on: str,
                     right_cols: Iterable[str],
                     num_buckets: Optional[int] = None,
                     salts: int = 8, how: str = "inner",
                     plan: str = "tasks") -> rd.Dataset:
    """Skew-resistant partitioned hash join: a hot join key turns one
    bucket of ``bucketed_hash_join`` into a straggler that serializes the
    whole stage.  Here every LEFT row gets a salt (its position within
    the block — salt choice only affects placement, never the join
    result, so determinism of the OUTPUT is preserved), the RIGHT side
    is replicated once per salt, and co-partitioning happens on
    hash(key, salt): a key with N rows spreads over min(salts,
    num_buckets) tasks instead of one.  Cost: right side moves
    ``salts``x — use when right is the small/dimension side and the left
    key distribution is heavy-tailed (the classic fact⨝dim shape).

    ``plan='tasks'`` (default) runs the same salted co-partitioning as a
    single-pass raw-task shuffle (the ``task_hash_join`` machinery with
    '__salt' appended to the merge key); 'dataset' keeps the original
    union/sort-groupby form, which measured 17-58 s vs ~2-3 s at
    40M⨝100k (scripts/relational_scale_experiment.py)."""
    right_cols = list(right_cols)
    if plan == "tasks":
        left = left.materialize()
        right = right.materialize()
        l_refs = _nonempty_block_refs(left)
        r_refs = _nonempty_block_refs(right)
        if l_refs and r_refs:
            B = max(num_buckets or 0, 32, _auto_bucket_count(
                (left.size_bytes() or 0) + (right.size_bytes() or 0),
                TARGET_BUCKET_BYTES))
            split = _split_salted.options(num_returns=B) if B > 1 \
                else _split_salted
            lp = [split.remote(c, on, B, salts, 0)
                  for c in _chunk_refs(l_refs)]
            rp = [split.remote(c, on, B, salts, 1)
                  for c in _chunk_refs(r_refs)]
            if B == 1:
                lp, rp = [[p] for p in lp], [[p] for p in rp]
            out = [_join_bucket_task.remote(on, right_cols, how, None,
                                            [p[b] for p in lp],
                                            [p[b] for p in rp],
                                            "__salt")
                   for b in range(B)]
            return rd.from_pandas_refs(out)
        # empty side: the dataset form below handles it for every `how`
    num_buckets = num_buckets or 16  # dataset plan partitions directly
    right_only = [c for c in right_cols if c != on]

    def tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        salt = (np.arange(len(batch)) % salts).astype(np.uint64)
        h = _splitmix64(_salt_key_hash(batch[on].to_numpy()) ^ salt)
        batch["__salt"] = salt.astype(np.int64)
        batch["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
        batch["__side"] = np.int8(0)
        return batch

    def tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        rep = batch.loc[batch.index.repeat(salts)].reset_index(drop=True)
        salt = np.tile(np.arange(salts, dtype=np.uint64), len(batch))
        h = _splitmix64(_salt_key_hash(rep[on].to_numpy()) ^ salt)
        rep["__salt"] = salt.astype(np.int64)
        rep["__bucket"] = (h % np.uint64(num_buckets)).astype(np.int64)
        rep["__side"] = np.int8(1)
        return rep

    lt = left.map_batches(tag_left, batch_format="pandas")
    rt = right.map_batches(tag_right, batch_format="pandas")
    union = lt.union(rt).repartition(num_buckets)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # join on (key, salt): each right original row has exactly ONE
        # replica per salt value, so every left row meets every matching
        # right row exactly once — correct for one-to-many right sides
        # and immune to two salts of the same key sharing a bucket.
        left_cols = [c for c in group.columns
                     if c not in right_only and c not in ("__side", "__bucket")]
        lhs = group.loc[group["__side"] == 0, left_cols]
        rhs = group.loc[group["__side"] == 1,
                        [c for c in right_cols if c in group.columns]
                        + ["__salt"]]
        merged = lhs.merge(rhs, on=[on, "__salt"], how=how) \
            .drop(columns="__salt")
        for c in right_cols:
            if c not in merged.columns:
                merged[c] = None
        return merged

    return union.groupby("__bucket").map_groups(merge_bucket,
                                                batch_format="pandas")


def _salt_key_hash(values) -> np.ndarray:
    """uint64 key hash shared by both sides of salted_hash_join."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return _splitmix64(arr)
    return pd.util.hash_array(arr.astype(object), hash_key="0" * 16)


def distinct_rows(ds: rd.Dataset, cols: list[str],
                  num_buckets: Optional[int] = None) -> rd.Dataset:
    """DISTINCT over ``cols`` via ONE bucketed shuffle + per-bucket
    drop_duplicates.  Ray's native groupby sort-shuffles every input
    block into every output partition (O(blocks x partitions) fragments),
    which costs seconds of pure scheduling even for 10^5 rows; hashing
    into a few coarse buckets first bounds the fragment count.
    ``num_buckets=None`` (default) auto-sizes from measured input
    bytes — right from sf0.001 to 100 TB with no second guard pass."""

    def combiner(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols].drop_duplicates()  # combiner before the shuffle

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates()

    return grouped_map_buckets(
        ds.map_batches(combiner, batch_format="pandas"), cols, per_bucket,
        num_buckets=num_buckets, whole_bucket=True, presort=False)


def bucketed_anti_join(left: rd.Dataset, right: rd.Dataset, on: str,
                       num_buckets: Optional[int] = None) -> rd.Dataset:
    """Left rows whose ``on`` value does NOT appear in ``right`` — one
    co-partitioned shuffle (hash bucket on the key), no driver-side
    materialization of either side.  The scale-safe NOT IN for e.g.
    near-dup drop lists that can be a large fraction of the corpus."""

    def tag(side: int):
        def _tag(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["__side"] = np.int8(side)
            return batch
        return _tag

    lt = left.map_batches(tag(0), batch_format="pandas")
    rt = right.map_batches(
        lambda b: tag(1)(b[[on]].drop_duplicates()), batch_format="pandas")

    def anti_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lhs = group.loc[group["__side"] == 0]
        drop = set(group.loc[group["__side"] == 1, on])
        keep = lhs.loc[~lhs[on].isin(drop)]
        return keep.drop(columns=["__side"])

    return grouped_map_buckets(lt.union(rt), [on], anti_bucket,
                               num_buckets=num_buckets, whole_bucket=True,
                               presort=False)


def exact_dedup(ds: rd.Dataset, key: str, order_col: str) -> rd.Dataset:
    """Keep the first row (min order_col) per key — bucketed shuffle keyed
    on the content hash/key (SURVEY.md §2.1 S3), vectorized
    sort+drop_duplicates per bucket (no per-group task overhead)."""

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(order_col, kind="mergesort") \
                    .drop_duplicates(key, keep="first")

    return grouped_map_buckets(ds, [key], per_bucket, num_buckets=None,
                               whole_bucket=True, presort=False)


def partial_then_global_sum(ds: rd.Dataset, keys: list[str],
                            sums: dict[str, str], counts: Optional[str] = None,
                            num_buckets: Optional[int] = None) -> rd.Dataset:
    """Pre-aggregate inside map_batches, then a BUCKETED global reduce —
    the scale-correct aggregation shape (combiner before the shuffle).

    The reduce hashes the group keys into ``num_buckets`` coarse buckets
    and runs one vectorized pandas groupby per bucket: Ray's native
    ``groupby().aggregate()`` sort-shuffles every partial block into
    every output partition, which costs ~20 s of scheduling at 10^5
    high-cardinality groups (measured: window_tumbling at sf0.1 went
    21.6 s -> ~3 s with the bucketed reduce)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not sums:  # count-only aggregation: .agg({}) would raise
            return batch.groupby(keys, as_index=False, sort=False).size() \
                .rename(columns={"size": counts})
        agg = {src: "sum" for src in sums}
        grouped = batch.groupby(keys, as_index=False, sort=False).agg(agg)
        if counts:
            sizes = batch.groupby(keys, as_index=False, sort=False).size()
            grouped[counts] = sizes["size"].to_numpy()
        return grouped

    value_cols = list(sums) + ([counts] if counts else [])

    def reduce_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(keys, as_index=False, sort=False)[value_cols].sum()
        return g.rename(columns=sums)

    partials = ds.map_batches(partial, batch_format="pandas")
    return grouped_map_buckets(partials, keys, reduce_bucket,
                               num_buckets=num_buckets, whole_bucket=True,
                               presort=False)


def bucketed_set_op(left: rd.Dataset, right: rd.Dataset, on: str,
                    op: str, num_buckets: Optional[int] = None) -> rd.Dataset:
    """Distributed set INTERSECT / EXCEPT over one key column.

    Both sides are deduplicated per block (combiner), tagged with a side
    marker, unioned, and co-partitioned by a hash bucket of the key in
    ONE shuffle; each bucket task computes the set operation with numpy
    over its local uniques.  No driver-side sets, no all-to-all sort —
    the 100 TB shape for "ids present in A and/or absent from B"
    (e.g. drop-lists, holdout splits, cross-table audience overlap).
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"op must be 'intersect' or 'except', got {op!r}")

    def tag(side: int):
        def _tag(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[[on]].drop_duplicates()  # combiner before the shuffle
            out = out.copy()
            out["__side"] = np.int8(side)
            return out
        return _tag

    union = left.map_batches(tag(0), batch_format="pandas") \
        .union(right.map_batches(tag(1), batch_format="pandas"))

    def per_bucket(bucket: pd.DataFrame) -> pd.DataFrame:
        u0 = pd.unique(bucket.loc[bucket["__side"] == 0, on])
        u1 = pd.unique(bucket.loc[bucket["__side"] == 1, on])
        keys = (np.intersect1d(u0, u1) if op == "intersect"
                else np.setdiff1d(u0, u1))
        return pd.DataFrame({on: keys})

    return grouped_map_buckets(union, [on], per_bucket,
                               num_buckets=num_buckets, whole_bucket=True)


def global_exact_quantiles(ds: rd.Dataset, col: str,
                           qs: Iterable[float],
                           num_bins: int = 4096) -> pd.DataFrame:
    """EXACT global quantiles (discrete / lower-element convention:
    rank = clamp(ceil(q*n), 1, n), matching DuckDB ``quantile_disc``)
    without a global sort, via distributed histogram refinement:

    pass 1 — per-block (count, min, max), tiny driver reduce;
    pass 2 — per-block fixed-edge histogram (``num_bins`` ints per
             block cross the wire, not the data), summed on the driver
             to locate each target rank's bin and its in-bin rank;
    pass 3 — stream only the values falling in the few candidate bins
             back (expected n/num_bins rows per bin; heavy skew onto a
             single bin degrades this to the skewed mass — raise
             ``num_bins`` if one bin holds the quantile neighborhood).

    Each pass is a streaming map over the dataset; nothing but
    O(num_bins + selected-bin values) ever reaches the driver."""
    qs = list(qs)

    def block_stats(t: pa.Table) -> pa.Table:
        v = t[col]
        return pa.table({"n": [t.num_rows],
                         "mn": [pa.compute.min(v).as_py()],
                         "mx": [pa.compute.max(v).as_py()]})

    st = ds.map_batches(block_stats, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    # a fully-empty dataset can produce zero output blocks -> no columns
    n = int(st["n"].sum()) if "n" in st.columns else 0
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "val": pd.Series([np.nan] * len(qs))})
    mn, mx = float(st["mn"].min()), float(st["mx"].max())
    edges = np.linspace(mn, mx, num_bins + 1)

    def bin_of(vals: np.ndarray) -> np.ndarray:
        return np.clip(np.searchsorted(edges, vals, side="right") - 1,
                       0, num_bins - 1)

    def block_hist(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False)
        h = np.bincount(bin_of(vals), minlength=num_bins)
        return pa.table({"h": pa.array([h.astype(np.int64)])})

    hs = ds.map_batches(block_hist, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    cum = np.cumsum(np.sum(np.stack(hs["h"].to_numpy()), axis=0))

    ranks = {q: min(max(int(np.ceil(q * n)), 1), n) for q in qs}
    need = {}  # bin -> list of (q, rank_within_bin)
    for q, r in ranks.items():
        b = int(np.searchsorted(cum, r, side="left"))
        below = int(cum[b - 1]) if b else 0
        need.setdefault(b, []).append((q, r - below))
    need_bins = np.array(sorted(need), dtype=np.int64)

    def gather(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False)
        b = bin_of(vals)
        keep = np.isin(b, need_bins)
        return pa.table({col: vals[keep], "__bin": b[keep]})

    picked = ds.map_batches(gather, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    out = []
    for b, wants in need.items():
        inbin = np.sort(picked.loc[picked["__bin"] == b, col].to_numpy())
        for q, rib in wants:
            out.append((q, float(inbin[rib - 1])))
    out.sort()
    return pd.DataFrame({"q": [q for q, _ in out],
                         "val": [v for _, v in out]})


def global_row_number(ds: rd.Dataset, value_col: str, id_col: str,
                      parts: Optional[int] = None,
                      target_rows: int = 2_000_000):
    """Range-partitioned global sort with exact global row numbers over
    ``(value_col, id_col)`` — the distributed ROW_NUMBER() core shared by
    the global-sort and NTILE queries (queries.q_global_sort documents
    the three passes).  Returns ``(dataset, total_rows)`` where the
    dataset has columns ``[id_col, value_col, 'rn']`` (rn is 1-based and
    dense: ties broken by id_col, so the numbering is deterministic).

      1. deterministic per-block stride sample -> a FINE grid of up to
         1024 candidate split points
      2. count pass: exact rows per fine bin -> fine bins grouped into
         ``parts`` coarse ranges of ~N/parts MEASURED rows (not sampled
         guesses) -> rank offsets (+ total N).  ``parts=None`` (round 4)
         auto-sizes to ceil(N / target_rows) so the same call is right
         at any input size.
      3. shuffle on the partition id, per-partition mergesort,
         rn = partition offset + local position.

    Skew: coarse boundaries are placed on measured counts, so partition
    size is bounded by ~N/parts + one fine bin except under heavy key
    duplication, where equal keys co-locate by construction
    (side='right' searchsorted keeps equal keys together)."""

    def stride_sample(b: pd.DataFrame) -> pd.DataFrame:
        step = max(1, len(b) // 64)
        return b.iloc[::step][[value_col]]

    samp = np.sort(ds.map_batches(stride_sample, batch_format="pandas")
                   .to_pandas()[value_col].to_numpy())
    nf = int(min(1024, max(1, len(samp))))
    idx = np.linspace(0, len(samp) - 1, nf + 1).astype(np.int64)[1:-1] \
        if len(samp) else np.array([], dtype=np.int64)
    fine_splits = samp[idx] if len(samp) else np.array([])
    splits_ref = ray.put(fine_splits)

    def count_fine(b: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        p = np.searchsorted(sp, b[value_col].to_numpy(), side="right")
        c = np.bincount(p, minlength=nf)
        return pd.DataFrame({"part": np.arange(nf, dtype=np.int64),
                             "n": c.astype(np.int64)})

    cdf = ds.map_batches(count_fine, batch_format="pandas",
                         batch_size=None).to_pandas()
    fine_counts = (cdf.groupby("part")["n"].sum()
                   .reindex(range(nf), fill_value=0).to_numpy()
                   if "part" in cdf.columns else np.zeros(nf, np.int64))
    total = int(fine_counts.sum())
    if parts is None:
        parts = int(min(1024, max(1, -(-total // max(target_rows, 1)))))
    parts = int(min(parts, nf)) or 1
    # group fine bins into `parts` contiguous coarse ranges by MEASURED
    # cumulative rows (a fine bin never splits, so equal values stay in
    # one coarse partition)
    starts = np.cumsum(fine_counts) - fine_counts
    part_of_fine = np.minimum((starts * parts) // max(total, 1),
                              parts - 1).astype(np.int64)
    counts = np.bincount(part_of_fine, weights=fine_counts,
                         minlength=parts).astype(np.int64)
    offsets = np.zeros(parts, dtype=np.int64)
    offsets[1:] = np.cumsum(counts)[:-1]
    off_ref = ray.put(offsets)
    mapping_ref = ray.put(part_of_fine)

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        sp = ray.get(splits_ref)
        fine = np.searchsorted(sp, b[value_col].to_numpy(), side="right")
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            value_col: b[value_col].astype("float64"),
            "part": ray.get(mapping_ref)[fine]})

    with_part = ds.map_batches(add_part, batch_format="pandas") \
        .materialize()

    # range shuffle as ONE task wave over the pinned blocks: the former
    # grouped_map_buckets form (repartition + native sort-groupby) paid
    # two all-to-all exchanges and went super-linear past ~20M rows
    # (scripts/relational_scale_experiment.py: 25-48 s at 40M; this form
    # holds the 20M shape).  'part' IS the partition id, so the split is
    # the direct-value form — each rank task sorts exactly one range.
    refs = _nonempty_block_refs(with_part)
    if not refs:
        empty = pd.DataFrame({id_col: pd.Series(dtype="int64"),
                              value_col: pd.Series(dtype="float64"),
                              "rn": pd.Series(dtype="int64")})
        return rd.from_pandas(empty), 0
    split = _split_by_int_col.options(num_returns=parts) if parts > 1 \
        else _split_by_int_col
    lp = [split.remote(c, "part", parts) for c in _chunk_refs(refs)]
    if parts == 1:
        lp = [[p] for p in lp]
    out = [_rank_range_task.remote(b, [p[b] for p in lp], off_ref,
                                   value_col, id_col) for b in range(parts)]
    return rd.from_pandas_refs(out), total


def adaptive_join(left: rd.Dataset, right: rd.Dataset, on: str,
                  right_cols: Iterable[str],
                  broadcast_threshold_bytes: int = 64 << 20,
                  num_buckets: int = 16, how: str = "left",
                  restore_dtypes: Optional[dict] = None) -> rd.Dataset:
    """Stats-based join planning: execute the candidate small (RIGHT)
    side once, read its ACTUAL size from block metadata, then pick the
    physical join —

      size <= threshold  ->  broadcast_map_join (ray.put once, no
                             shuffle of the big side at all)
      size >  threshold  ->  bucketed_hash_join (co-partitioned shuffle
                             of both sides)

    This is the runtime analogue of a cost-based optimizer's
    broadcast-vs-exchange decision, made from measured bytes instead of
    cardinality guesses.  The right side is materialized to the OBJECT
    STORE (distributed, spillable) — never the driver heap; only the
    broadcast path then funnels it through one pandas frame, and only
    after the size check has bounded it.  The default 64 MiB mirrors the
    usual per-executor broadcast budget on a 256-node cluster.

    Returns (joined, plan) via the ``.plan`` attribute? No — keeps the
    Dataset contract: the chosen strategy is recorded on the function
    attribute ``adaptive_join.last_plan`` for tests/observability.
    """
    right = right.materialize()
    size = right.size_bytes() or 0
    right_cols = list(right_cols)
    if size <= broadcast_threshold_bytes:
        adaptive_join.last_plan = "broadcast"
        small = right.to_pandas()[right_cols]
        out = broadcast_map_join(left, small, on=on, how=how)
        if restore_dtypes:
            def _restore(b: pd.DataFrame) -> pd.DataFrame:
                for c, t in restore_dtypes.items():
                    if c in b.columns:
                        try:
                            b[c] = b[c].astype(t)
                        except (ValueError, TypeError):
                            pass
                return b
            out = out.map_batches(_restore, batch_format="pandas")
        return out
    adaptive_join.last_plan = "bucketed"
    return bucketed_hash_join(left, right, on=on, right_cols=right_cols,
                              num_buckets=num_buckets, how=how,
                              restore_dtypes=restore_dtypes)


adaptive_join.last_plan = None
