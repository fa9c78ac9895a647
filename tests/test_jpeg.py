"""Baseline JPEG (ITU-T T.81) codec tests — round-4 verdict item 4.

Two independent signals:

* **Externally-generated fixtures** — baseline JFIF files produced by
  libjpeg-family encoders, shipped with public software distributions
  (``ext_python_16x16.jpg`` from the CPython test suite — 2x2 chroma
  subsampling; ``ext_flower_161x161.jpg`` from the requests docs —
  restart markers + non-multiple-of-8 dimensions).  Their decodes were
  verified VISUALLY against the known source images once (a geometric
  flower-of-life line drawing; the Python-logo thumbnail) and are pinned
  here bit-for-bit by CRC — any decoder regression breaks the pin.
* **Cross-validated round trip** — ``jpeg_encode`` (written from the
  spec independently of the decoder: its own bit writer, canonical-code
  construction, zigzag, byte stuffing) feeds ``jpeg_decode``; PSNR
  bounds catch any systematic error either side, and a smooth-gradient
  frame must clear the input contract's 40 dB lossy bar.
"""

import os
import zlib

import numpy as np
import pandas as pd
import pytest

from cqi_ray.images import codec, jpeg, synth

DATA = os.path.join(os.path.dirname(__file__), "data")


class TestExternalFixtures:
    def test_python_thumbnail_2x2_subsampled(self):
        d = open(os.path.join(DATA, "ext_python_16x16.jpg"), "rb").read()
        img = jpeg.jpeg_decode(d)
        assert img.shape == (16, 16, 3) and img.dtype == np.uint8
        assert zlib.crc32(img.tobytes()) == 0x7A348587

    def test_flower_restart_markers_odd_dims(self):
        d = open(os.path.join(DATA, "ext_flower_161x161.jpg"), "rb").read()
        img = jpeg.jpeg_decode(d)
        assert img.shape == (161, 161, 3)
        assert zlib.crc32(img.tobytes()) == 0x1847D21
        # mostly-white line drawing: bright, low saturation
        assert img.mean() > 180
        assert abs(img[:, :, 0].astype(int) - img[:, :, 2]).mean() < 10

    def test_progressive_raises_clearly(self):
        d = open(os.path.join(DATA, "ext_progressive.jpg"), "rb").read()
        with pytest.raises(NotImplementedError, match="progressive"):
            jpeg.jpeg_decode(d)

    def test_non_jpeg_rejected(self):
        with pytest.raises(ValueError):
            jpeg.jpeg_decode(b"\x89PNG\r\n\x1a\n" + b"x" * 50)


class TestRoundTrip:
    @pytest.mark.parametrize("seed,size,quality,floor", [
        (42, 64, 90, 33.0), (7, 32, 95, 36.0), (3, 48, 75, 28.0)])
    def test_synth_psnr(self, seed, size, quality, floor):
        px = synth._pixels_for(seed, size, size)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=quality))
        assert dec.shape == px.shape
        assert codec.psnr(px, dec) >= floor

    def test_smooth_gradient_clears_40db(self):
        """The input contract's lossy bar (PSNR >= 40 dB) on natural
        smooth content."""
        yy, xx = np.mgrid[0:64, 0:64]
        px = np.stack([
            (yy * 2).astype(np.uint8),
            (xx * 2).astype(np.uint8),
            ((yy + xx)).astype(np.uint8)], axis=2)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=95))
        assert codec.psnr(px, dec) >= 40.0

    def test_odd_dimensions(self):
        px = synth._pixels_for(9, 37, 51)  # w=37, h=51
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=85))
        assert dec.shape == px.shape

    def test_flat_image_exact_dc(self):
        """A constant frame is a pure DC signal — survives quantization
        near-exactly at high quality."""
        px = np.full((24, 24, 3), 137, dtype=np.uint8)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=95))
        assert np.abs(dec.astype(int) - 137).max() <= 2

    def test_deterministic_bytes(self):
        px = synth._pixels_for(11, 40, 40)
        assert jpeg.jpeg_encode(px, 80) == jpeg.jpeg_encode(px, 80)

    def test_large_noisy_image_linear_time(self):
        """Regression (round-5 ADVICE): the bit reader/writer
        accumulators must stay machine-int-sized.  Unmasked they grow
        into bigints over the whole entropy-coded segment and codec time
        turns O(scan_bytes^2) — a 512px noise frame (≈0.5 MB scan, the
        worst case per byte) previously blew a 240 s timeout; bounded
        accumulators do it in ~2 s.  10x headroom on the bound."""
        import time

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(512, 512, 3), dtype=np.uint8)
        t0 = time.monotonic()
        data = jpeg.jpeg_encode(px, quality=90)
        enc_s = time.monotonic() - t0
        assert len(data) > 300_000  # noise really is incompressible
        t0 = time.monotonic()
        dec = jpeg.jpeg_decode(data)
        dec_s = time.monotonic() - t0
        assert dec.shape == (512, 512, 3)
        assert enc_s < 20.0, f"encode {enc_s:.1f}s — quadratic regression"
        assert dec_s < 20.0, f"decode {dec_s:.1f}s — quadratic regression"


class TestEngineIntegration:
    def test_decode_image_routes_jfif(self):
        d = open(os.path.join(DATA, "ext_python_16x16.jpg"), "rb").read()
        img = codec.decode_image(d, "jpeg", 16, 16)
        assert img.shape == (16, 16, 3)

    def test_decode_validate_mixed_real_and_ljpg(self):
        """The flagship decode stage accepts a batch mixing the engine's
        own LJPG payloads with REAL baseline JFIF bytes (round-4 'mixed
        real/LJPG payloads' requirement) — and still flags garbage."""
        from cqi_ray.pipelines.assign import decode_validate_batch

        px = synth._pixels_for(5, 32, 32)
        real = jpeg.jpeg_encode(px, quality=90)
        real_px = jpeg.jpeg_decode(real)
        ljpg = codec.lossy_encode(px, quality=92)
        ljpg_px = codec.lossy_decode(ljpg)
        batch = pd.DataFrame({
            "image_id": ["a", "b", "c"],
            "bytes": [real, ljpg, b"\xff\xd8garbage"],
            "w": [32, 32, 32], "h": [32, 32, 32],
            "fmt": ["jpeg", "jpeg", "jpeg"],
            "phash": [codec.phash64(real_px), codec.phash64(ljpg_px), 0],
        })
        out = decode_validate_batch(batch)
        assert list(out["decode_ok"]) == [True, True, False]
        assert list(out["phash_ok"]) == [True, True, False]

    def test_real_jpeg_meets_lossy_contract(self):
        """Per-row invariant from the input hint: decoded-pixel PSNR vs
        the pre-encode source >= 40 dB for lossy rows (smooth content at
        high quality)."""
        yy, xx = np.mgrid[0:48, 0:48]
        px = np.stack([(40 + yy * 2).astype(np.uint8),
                       (60 + xx * 2).astype(np.uint8),
                       np.full((48, 48), 90, np.uint8)], axis=2)
        dec = jpeg.jpeg_decode(jpeg.jpeg_encode(px, quality=95))
        assert codec.psnr(px, dec) >= 40.0
