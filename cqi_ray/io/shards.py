"""WebDataset-style binary shard sink + source for image/caption samples.

Training dataloaders consume multimodal corpora as sequential binary
shards (tar archives of <sample>.img + <sample>.json pairs) rather than
columnar files — sequential reads, one shard per loader worker.  The Ray
shape on both sides is embarrassingly parallel:

* sink — ``map_batches`` where each task packs ONE shard from its batch
  and emits a one-row manifest (shard path, sample count, byte size,
  content checksum).  The heavy bytes go straight from the worker to
  storage; only the tiny manifest flows through the object store.
* source — a dataset of shard paths ``map_batches``-expanded back into
  sample rows, one shard per task.

Shard bytes are DETERMINISTIC: USTAR format, zeroed mtime/uid/gid and
samples in batch order, so a re-run (or a retried task) produces
byte-identical shards — the same shard-addressability rule the synth
generator follows.  On a multi-node cluster ``out_dir`` must be shared
storage (each map task writes from its own worker).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

import numpy as np
import pandas as pd
import ray.data as rd


def _tar_member(name: str, payload: bytes) -> tarfile.TarInfo:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    return info


def write_image_shards(ds: rd.Dataset, out_dir: str,
                       samples_per_shard: int = 64) -> rd.Dataset:
    """Pack an image table (image_id, bytes, w, h, fmt, caption, phash)
    into tar shards of ``samples_per_shard`` samples; returns the
    manifest Dataset (shard, n_samples, n_bytes, md5)."""
    os.makedirs(out_dir, exist_ok=True)

    def pack(b: pd.DataFrame) -> pd.DataFrame:
        first = str(b["image_id"].iloc[0])
        path = os.path.join(out_dir, f"shard-{first}.tar")
        with tarfile.open(path, "w", format=tarfile.USTAR_FORMAT) as tar:
            for r in b.itertuples(index=False):
                img = bytes(r.bytes)
                meta = json.dumps(
                    {"caption": r.caption, "w": int(r.w), "h": int(r.h),
                     "fmt": str(r.fmt), "phash": int(r.phash)},
                    sort_keys=True).encode()
                tar.addfile(_tar_member(f"{r.image_id}.img", img),
                            io.BytesIO(img))
                tar.addfile(_tar_member(f"{r.image_id}.json", meta),
                            io.BytesIO(meta))
        with open(path, "rb") as fh:
            digest = hashlib.md5(fh.read()).hexdigest()
        return pd.DataFrame({
            "shard": [os.path.basename(path)],
            "n_samples": np.array([len(b)], dtype=np.int64),
            "n_bytes": np.array([os.path.getsize(path)], dtype=np.int64),
            "md5": [digest]})

    return ds.map_batches(pack, batch_format="pandas",
                          batch_size=samples_per_shard)


def read_image_shards(out_dir: str) -> rd.Dataset:
    """Stream shard files back into sample rows (one shard per task)."""
    paths = sorted(os.path.join(out_dir, n) for n in os.listdir(out_dir)
                   if n.endswith(".tar"))

    def load(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"image_id": [], "bytes": [], "w": [], "h": [],
                "fmt": [], "caption": [], "phash": []}
        for path in b["path"]:
            with tarfile.open(path, "r") as tar:
                members = tar.getmembers()
                imgs = {m.name[:-4]: tar.extractfile(m).read()
                        for m in members if m.name.endswith(".img")}
                for m in members:
                    if not m.name.endswith(".json"):
                        continue
                    sid = m.name[:-5]
                    meta = json.loads(tar.extractfile(m).read())
                    rows["image_id"].append(sid)
                    rows["bytes"].append(imgs[sid])
                    rows["w"].append(meta["w"])
                    rows["h"].append(meta["h"])
                    rows["fmt"].append(meta["fmt"])
                    rows["caption"].append(meta["caption"])
                    rows["phash"].append(meta["phash"])
        return pd.DataFrame({
            "image_id": rows["image_id"],
            "bytes": rows["bytes"],
            "w": np.asarray(rows["w"], dtype=np.int32),
            "h": np.asarray(rows["h"], dtype=np.int32),
            "fmt": rows["fmt"],
            "caption": rows["caption"],
            "phash": np.asarray(rows["phash"], dtype=np.int64)})

    return rd.from_items([{"path": p} for p in paths]) \
        .map_batches(load, batch_format="pandas", batch_size=1)
