"""Flagship end-to-end pipeline: documents -> synthetic street imagery ->
decode/validate -> cell encode -> CQI-scored synthetic ways -> PIP/kNN
assignment -> tile pyramid.

This is the engine's headline composition (north rule: "H3 encode ->
PIP/kNN join -> tile assignment" over an image+caption table).  All image
content is synthesized deterministically from the documents table's ids
(captions = document text), so the pipeline runs on the driver-provided
parquet without external data, at any scale factor, shard-independently.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

import ray.data as rd

from ..images import codec, synth
from .assign import assign_images_to_ways
from .cqi import dataset_from_rows, score_ways_dataset
from .tiles import render_tiles

EXTENT = (13.40, 51.00, 13.60, 51.10)
_N_CENTERS = 8


def _hash_unit(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniforms in [0,1) from int ids (Knuth multiplicative)."""
    x = (ids.astype(np.uint64) * np.uint64(2654435761) + np.uint64(salt)) \
        % np.uint64(2**32)
    return x.astype(np.float64) / float(2**32)


def positions_for_ids(ids: np.ndarray):
    """Closed-form capture positions for image ids: heavy-tailed around
    the 8 urban centers (u1^2 bias onto center 0).  Shared by the image
    synthesizer and the position-only pipelines (hex binning) so the
    SQL oracles replay ONE formula."""
    lon0, lat0, lon1, lat1 = EXTENT
    centers_lon = lon0 + (np.arange(_N_CENTERS) + 0.5) * (lon1 - lon0) / _N_CENTERS
    centers_lat = lat0 + ((np.arange(_N_CENTERS) * 37) % _N_CENTERS + 0.5) \
        * (lat1 - lat0) / _N_CENTERS
    u1 = _hash_unit(ids, 1)
    u2 = _hash_unit(ids, 2)
    u3 = _hash_unit(ids, 3)
    center = np.floor(u1 * u1 * _N_CENTERS).astype(np.int64)
    lon = centers_lon[center] + (u2 - 0.5) * 0.01
    lat = centers_lat[center] + (u3 - 0.5) * 0.006
    return lon, lat


def images_from_documents(batch: pd.DataFrame, size_px: int = 32,
                          per_doc: int = 1) -> pd.DataFrame:
    """``per_doc`` synthetic street-level image rows per document row.
    Positions are heavy-tailed around urban centers (u^2 bias onto center
    0) to exercise the salted/skewed-cell path of the spatial join.
    Generation is keyed purely by (doc_id, replica) so it is deterministic
    and shard-independent at any fan-out."""
    base_ids = batch["doc_id"].to_numpy(dtype=np.int64)
    ids = (np.repeat(base_ids, per_doc) * per_doc
           + np.tile(np.arange(per_doc, dtype=np.int64), len(base_ids)))
    texts = np.repeat(batch["text"].to_numpy(), per_doc)
    lon, lat = positions_for_ids(ids)

    n = len(ids)
    px = synth.pixels_for_batch(ids, size_px, size_px)
    fmt_idx = ids % 3
    blobs = np.empty(n, dtype=object)
    phash = np.empty(n, dtype=np.int64)
    # batched per-format encodes (bit-identical to the scalar codec
    # paths — tests/test_images.py pins byte equality over the corpus);
    # the jpeg group's stored phash describes the STORED lossy image, as
    # it would in a real catalog, so the decode-side integrity check
    # stays exact
    for fi, enc in ((0, codec.png_encode_batch), (1, codec.raw_encode_batch)):
        sel = np.flatnonzero(fmt_idx == fi)
        if len(sel):
            out = np.empty(len(sel), dtype=object)
            out[:] = enc(px[sel])
            blobs[sel] = out
            phash[sel] = codec.phash64_batch(px[sel])
    sel = np.flatnonzero(fmt_idx == 2)
    if len(sel):
        jblobs, dec = codec.lossy_roundtrip_pixels_batch(px[sel])
        out = np.empty(len(sel), dtype=object)
        out[:] = jblobs
        blobs[sel] = out
        phash[sel] = codec.phash64_batch(dec)
    return pd.DataFrame({
        "image_id": np.array([f"img_{int(i):012d}" for i in ids],
                             dtype=object),
        "bytes": blobs,
        "w": np.full(n, size_px, dtype=np.int64),
        "h": np.full(n, size_px, dtype=np.int64),
        "fmt": np.array(("png", "raw", "jpeg"), dtype=object)[fmt_idx],
        "caption": texts,
        "phash": phash,
        "lon": lon,
        "lat": lat,
    })


def build_images(sf_dir: str, limit: Optional[int] = None,
                 per_doc: int = 1, size_px: int = 32) -> rd.Dataset:
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    if limit:
        docs = docs.limit(limit)
    # small text table fans out into heavy image synthesis: spread it over
    # a fixed block count so generation/decoding parallelizes fully and the
    # work layout is identical at every cluster size (scaling
    # comparability).  The count scales with the per-doc fan-out so
    # per-task compute stays roughly constant; round-5 sweep at 32 CPUs
    # (1.28M imgs, 96px): 512 blocks 68.3 s, 1024 64.0, 2048 61.1, 4096
    # 67.4 — finer tasks shorten the last-wave straggler tail until
    # per-task overhead wins, so the fan-out targets the 2048 point at
    # per_doc=256 (the 8-CPU leg measured flat across the same sweep).
    blocks = int(os.environ.get(
        "GRAFT_IMAGE_BLOCKS", str(256 * min(8, max(1, per_doc // 32)))))
    return docs.repartition(blocks).map_batches(
        lambda b: images_from_documents(b, size_px=size_px, per_doc=per_doc),
        batch_format="pandas", batch_size=None)


def build_scored_ways(n_ways: int = 64) -> rd.Dataset:
    from .cqi import synth_ways_dataset

    return score_ways_dataset(synth_ways_dataset(n_ways, extent=EXTENT))


def run_flagship(sf_dir: str, n_ways: int = 64,
                 image_limit: Optional[int] = None,
                 images_per_doc: int = 1, size_px: int = 32,
                 with_tiles: bool = False, zooms=(15,)):
    """Returns the assignments Dataset (and optionally the tiles Dataset)."""
    scored = build_scored_ways(n_ways)
    images = build_images(sf_dir, limit=image_limit, per_doc=images_per_doc,
                          size_px=size_px)
    assignments = assign_images_to_ways(images, scored)
    if with_tiles:
        return assignments, render_tiles(scored, zooms=zooms)
    return assignments


def run_flagship_checkpointed(sf_dir: str, out_dir: str, n_ways: int = 64,
                              zooms=(15,), version: str = "v1"):
    """Flagship with per-stage checkpoints + CHAINED lineage manifests:
    every stage writes partitioned Parquet; each dependent stage's
    fingerprint includes its upstream stage's ``build_id`` and the source
    files' fragment fingerprint, so a rebuilt upstream (or a changed
    input file) invalidates exactly the dependent stages while unchanged
    runs resume from the completed checkpoints (cqi_ray/state/checkpoint).
    Returns (scores, assignments, tiles) Datasets backed by the files."""
    import ray.data as rd
    from ..state.checkpoint import (checkpoint_stage, source_fingerprint,
                                    stage_build_id)

    docs_path = os.path.join(sf_dir, "documents.parquet")
    src_fp = source_fingerprint([docs_path])

    scores_path = os.path.join(out_dir, "scores")
    scores = checkpoint_stage(
        lambda: build_scored_ways(n_ways),
        scores_path,
        stage="cqi_scores", fingerprint=f"{version}:ways={n_ways}",
        metrics={"n_ways": n_ways})
    scores_bid = stage_build_id(scores_path)

    def _assignments() -> rd.Dataset:
        # the cell-match shuffle inside the stage checkpoints per bucket:
        # a crash mid-stage resumes the SHUFFLE (completed buckets reused)
        # before the stage checkpoint ever completes — shuffle-level and
        # stage-level resume compose
        out = assign_images_to_ways(
            build_images(sf_dir), scores,
            shuffle_checkpoint=(
                os.path.join(out_dir, "assignments_shuffle"),
                f"{version}:src={src_fp}:up={scores_bid}"))
        # partition by a bounded key range so a rerun can skip finished parts
        return out.map_batches(
            lambda b: b.assign(part=(b["cell"].astype("int64") % 8)),
            batch_format="pandas")

    assignments = checkpoint_stage(
        _assignments,
        os.path.join(out_dir, "assignments"),
        stage="image_assign",
        fingerprint=f"{version}:src={src_fp}:up={scores_bid}",
        partition_cols=["part"],
        inputs=[{"path": docs_path, "fingerprint": src_fp},
                {"stage": "cqi_scores", "build_id": scores_bid}])
    # the mid-shuffle checkpoint is only a crash net UNDER the stage
    # checkpoint: once the stage manifest commits, resume reads the stage
    # parquet and never consults the shuffle dir — drop it so disk does
    # not grow (and no superseded-key payloads linger) across reruns.
    # CQI_KEEP_SHUFFLE_CKPT=1 keeps it for debugging/inspection.
    if not os.environ.get("CQI_KEEP_SHUFFLE_CKPT"):
        import shutil

        shutil.rmtree(os.path.join(out_dir, "assignments_shuffle"),
                      ignore_errors=True)

    tiles = checkpoint_stage(
        lambda: render_tiles(scores, zooms=zooms),
        os.path.join(out_dir, "tiles"),
        stage="tiles", fingerprint=f"{version}:zooms={zooms}:up={scores_bid}",
        partition_cols=["z"],
        inputs=[{"stage": "cqi_scores", "build_id": scores_bid}])
    return scores, assignments, tiles
