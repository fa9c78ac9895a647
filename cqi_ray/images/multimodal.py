"""Multimodal column handling: audio / video payloads as opaque binary with
typed metadata, processed by actor-pool stages.

The Ray-side plumbing — schemas, batch sizing, actor signatures, output
layout — is real and tested; the codec internals for audio/video are
STUBBED behind ``NotImplementedError`` with a deterministic fake container
(this environment ships no media libraries), exactly like the JPEG path
in :mod:`cqi_ray.images.codec`.  A deployment plugs ffmpeg/soundfile into
the two ``_decode_real_*`` hooks without touching the pipeline shape.

Schemas:
  audio: (clip_id:string, bytes:binary, sample_rate:int32, n_samples:int64,
          channels:int32, fmt:string, caption:string)
  video: (video_id:string, bytes:binary, w:int32, h:int32, n_frames:int32,
          fps:float64, fmt:string, caption:string)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_FAKE_AUDIO_MAGIC = b"FAUD"
_FAKE_VIDEO_MAGIC = b"FVID"


def fake_audio_bytes(samples: np.ndarray) -> bytes:
    """Deterministic stand-in container: int16 PCM behind a magic prefix."""
    return _FAKE_AUDIO_MAGIC + np.ascontiguousarray(
        samples, dtype="<i2").tobytes()


def fake_video_bytes(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 frames behind a magic prefix."""
    return _FAKE_VIDEO_MAGIC + np.ascontiguousarray(
        frames, dtype=np.uint8).tobytes()


def decode_audio(data: bytes, n_samples: int, channels: int) -> np.ndarray:
    if data[:4] == _FAKE_AUDIO_MAGIC:
        return np.frombuffer(data[4:], dtype="<i2").reshape(n_samples, channels)
    raise NotImplementedError(
        "no audio codec in this environment; plug soundfile/ffmpeg here")


def decode_video_frames(data: bytes, w: int, h: int, n_frames: int) -> np.ndarray:
    if data[:4] == _FAKE_VIDEO_MAGIC:
        return np.frombuffer(data[4:], dtype=np.uint8).reshape(n_frames, h, w, 3)
    raise NotImplementedError(
        "no video codec in this environment; plug ffmpeg here")


class AudioFeatures:
    """Actor-pool stage: decode -> per-clip features (RMS energy, zero
    crossings, duration).  Batches should stay small — payloads dominate."""

    def __init__(self):
        pass  # real deployments: load codec / feature model once here

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rms, zc, dur = [], [], []
        for row in batch.itertuples(index=False):
            pcm = decode_audio(row.bytes, row.n_samples, row.channels)
            x = pcm.astype(np.float64) / 32768.0
            rms.append(float(np.sqrt(np.mean(x ** 2))))
            zc.append(int((np.diff(np.signbit(x[:, 0])) != 0).sum()))
            dur.append(row.n_samples / row.sample_rate)
        batch = batch.drop(columns=["bytes"]).copy()
        batch["rms"] = rms
        batch["zero_crossings"] = zc
        batch["duration_sec"] = dur
        return batch


class VideoFrameSample:
    """Actor-pool stage: sample ``every_n``-th frame, emit one image row per
    sampled frame (fan-out), ready for the image assignment pipeline."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from . import codec

        out = {"video_id": [], "frame_no": [], "bytes": [], "w": [], "h": [],
               "fmt": [], "caption": []}
        for row in batch.itertuples(index=False):
            frames = decode_video_frames(row.bytes, row.w, row.h, row.n_frames)
            for fi in range(0, row.n_frames, self.every_n):
                out["video_id"].append(row.video_id)
                out["frame_no"].append(fi)
                out["bytes"].append(codec.png_encode(frames[fi]))
                out["w"].append(row.w)
                out["h"].append(row.h)
                out["fmt"].append("png")
                out["caption"].append(row.caption)
        return pd.DataFrame(out)


def synth_audio_table(n: int, seed: int = 42, sample_rate: int = 8000,
                      n_samples: int = 4000) -> pd.DataFrame:
    """Deterministic synthetic clips: an INTEGER triangle wave (period
    sr/freq, amplitude ±12000) — exactly reproducible in ANSI SQL, which
    is what makes the audio-feature pipeline DuckDB-oracle-checkable
    (float sin would leave the pcm samples 1-ulp platform-dependent)."""
    rows = {"clip_id": [], "bytes": [], "sample_rate": [], "n_samples": [],
            "channels": [], "fmt": [], "caption": []}
    idx = np.arange(n_samples, dtype=np.int64)
    for i in range(n):
        freq = 110 * (1 + (i * 7 + seed) % 16)
        phase = (idx * freq) % sample_rate
        wave = (np.abs(phase - sample_rate // 2) * (48000 // sample_rate)
                - 12000).astype("<i2")[:, None]
        rows["clip_id"].append(f"clip_{i:08d}")
        rows["bytes"].append(fake_audio_bytes(wave))
        rows["sample_rate"].append(sample_rate)
        rows["n_samples"].append(n_samples)
        rows["channels"].append(1)
        rows["fmt"].append("pcm16")
        rows["caption"].append(f"synthetic tone clip {i} at {freq} Hz")
    return pd.DataFrame(rows)


def synth_video_table(n: int, seed: int = 42, w: int = 16, h: int = 16,
                      n_frames: int = 30) -> pd.DataFrame:
    from . import synth as _synth

    rows = {"video_id": [], "bytes": [], "w": [], "h": [], "n_frames": [],
            "fps": [], "fmt": [], "caption": []}
    for i in range(n):
        frames = np.stack([_synth._pixels_for(seed + i * 100 + f, w, h)
                           for f in range(n_frames)])
        rows["video_id"].append(f"vid_{i:08d}")
        rows["bytes"].append(fake_video_bytes(frames))
        rows["w"].append(w)
        rows["h"].append(h)
        rows["n_frames"].append(n_frames)
        rows["fps"].append(10.0)
        rows["fmt"].append("rawseq")
        rows["caption"].append(f"synthetic street clip {i}")
    return pd.DataFrame(rows)
