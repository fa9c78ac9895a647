"""Deterministic image-augmentation kernels for training-data pipelines.

Augmentation at corpus scale is a pure per-image map — the Ray shape is a
stateless ``map_batches`` over the binary column (decode → transform →
re-encode) with per-image scalars emitted alongside so downstream QA
never re-decodes.  All transforms are numpy array ops (no pixel loops)
and the *choice* of transforms is a deterministic function of the row
index — no RNG state travels between tasks, so any block layout and any
retry produce identical bytes (the same shard-addressability rule the
synth generator follows).

Invertibility pairs used by the tests: hflip∘hflip = id, vflip∘vflip =
id, rot90 applied four times = id; center_crop and brightness are checked
against closed-form expectations.
"""

from __future__ import annotations

import numpy as np

_OPS = ("hflip", "vflip", "rot90", "crop", "brighten", "darken")


def hflip(px: np.ndarray) -> np.ndarray:
    return px[:, ::-1]


def vflip(px: np.ndarray) -> np.ndarray:
    return px[::-1, :]


def rot90(px: np.ndarray, k: int = 1) -> np.ndarray:
    """Counter-clockwise quarter turns (numpy convention, axes (0, 1))."""
    return np.rot90(px, k % 4, axes=(0, 1))


def center_crop(px: np.ndarray, frac: float = 0.75) -> np.ndarray:
    """Central crop keeping ``frac`` of each dimension (at least 1 px)."""
    h, w = px.shape[0], px.shape[1]
    ch = max(1, int(h * frac))
    cw = max(1, int(w * frac))
    top = (h - ch) // 2
    left = (w - cw) // 2
    return px[top:top + ch, left:left + cw]


def brightness(px: np.ndarray, scale: float) -> np.ndarray:
    """Multiplicative brightness with saturation to [0, 255] uint8."""
    out = np.asarray(px, dtype=np.float64) * float(scale)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def plan_for(index: int) -> list[str]:
    """Deterministic augmentation plan for row ``index``: one geometric
    op (chosen by index mod 4) plus one photometric op for every third
    row.  Pure arithmetic on the index — identical at any sharding."""
    geo = ("hflip", "vflip", "rot90", "crop")[index % 4]
    ops = [geo]
    if index % 3 == 0:
        ops.append("brighten" if index % 2 == 0 else "darken")
    return ops


def apply_plan(px: np.ndarray, ops) -> np.ndarray:
    """Apply a plan (sequence of op names) left to right."""
    out = np.ascontiguousarray(px)
    for op in ops:
        if op == "hflip":
            out = hflip(out)
        elif op == "vflip":
            out = vflip(out)
        elif op == "rot90":
            out = rot90(out)
        elif op == "crop":
            out = center_crop(out)
        elif op == "brighten":
            out = brightness(out, 1.25)
        elif op == "darken":
            out = brightness(out, 0.8)
        else:
            raise ValueError(f"unknown augmentation op {op!r}")
    return np.ascontiguousarray(out)
