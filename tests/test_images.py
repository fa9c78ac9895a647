"""Image codec / phash / synthetic-table tests incl. the PSNR + caption
invariants from the north rule."""

import numpy as np
import pytest

from cqi_ray.images import codec, synth


class TestCodec:
    def test_png_roundtrip_exact(self):
        px = synth._pixels_for(3, 40, 56)
        assert np.array_equal(codec.png_decode(codec.png_encode(px)), px)

    def test_png_grayscale_and_rgba(self):
        import struct
        import zlib

        # grayscale (color type 0)
        h, w = 8, 8
        gray = np.arange(64, dtype=np.uint8).reshape(h, w)
        raw = np.zeros((h, 1 + w), dtype=np.uint8)
        raw[:, 1:] = gray
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        data = (codec._PNG_SIG + codec._chunk(b"IHDR", ihdr)
                + codec._chunk(b"IDAT", zlib.compress(raw.tobytes()))
                + codec._chunk(b"IEND", b""))
        out = codec.png_decode(data)
        assert out.shape == (8, 8, 3)
        assert np.array_equal(out[:, :, 0], gray)

    def test_png_nonzero_filter_path(self):
        """The filter-0 whole-image fast path must not break decoding of
        externally-encoded PNGs using Up (type 2) filters."""
        import struct
        import zlib

        h, w = 8, 8
        img = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
        flat = img.reshape(h, -1)
        raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
        raw[:, 0] = 2  # Up filter on every scanline
        raw[0, 1:] = flat[0]
        for r in range(1, h):
            raw[r, 1:] = (flat[r].astype(int) - flat[r - 1].astype(int)) \
                & 0xFF
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (codec._PNG_SIG + codec._chunk(b"IHDR", ihdr)
                + codec._chunk(b"IDAT", zlib.compress(raw.tobytes()))
                + codec._chunk(b"IEND", b""))
        assert np.array_equal(codec.png_decode(data), img)

    def test_raw_roundtrip(self):
        px = synth._pixels_for(9, 16, 16)
        assert np.array_equal(codec.raw_decode(codec.raw_encode(px), 16, 16), px)

    def test_jpeg_payload_routing(self):
        """fmt='jpeg' routes by magic: legacy FJPG container, the
        engine's LJPG, and REAL baseline JFIF (round 4 — images/jpeg.py
        replaced the former NotImplementedError stub); truncated JFIF
        still fails loudly."""
        px = synth._pixels_for(1, 8, 8)
        blob = b"FJPG" + codec.raw_encode(px)
        assert np.array_equal(codec.decode_image(blob, "jpeg", 8, 8), px)
        from cqi_ray.images import jpeg as _jpeg

        real = _jpeg.jpeg_encode(synth._pixels_for(2, 16, 16), quality=95)
        assert codec.decode_image(real, "jpeg", 16, 16).shape == (16, 16, 3)
        with pytest.raises(ValueError):
            codec.decode_image(b"\xff\xd8\xff\xe0truncated", "jpeg", 8, 8,
                               allow_fake_jpeg=True)

    def test_lossy_roundtrip_psnr(self):
        """The DCT-quantization codec is genuinely lossy but stays above
        the 40 dB PSNR gate at the default quality, with real payload
        compression."""
        for idx in (0, 5, 17, 100):
            px = synth._pixels_for(idx, 32, 32)
            blob = codec.lossy_encode(px)
            rec = codec.lossy_decode(blob)
            assert not np.array_equal(rec, px), "codec must be lossy"
            assert codec.psnr(px, rec) >= 40
            assert len(blob) < 0.5 * px.nbytes
            # deterministic: same input -> same bytes -> same decode
            assert codec.lossy_encode(px) == blob
            assert np.array_equal(codec.lossy_decode(blob), rec)

    def test_lossy_decode_via_decode_image(self):
        px = synth._pixels_for(4, 24, 24)
        blob = codec.lossy_encode(px, quality=95)
        out = codec.decode_image(blob, "jpeg", 24, 24)
        assert codec.psnr(px, out) >= 40

    def test_psnr(self):
        px = synth._pixels_for(5, 32, 32)
        assert codec.psnr(px, px) == float("inf")
        noisy = np.clip(px.astype(int) + 3, 0, 255).astype(np.uint8)
        val = codec.psnr(px, noisy)
        assert 35 < val < 45  # +-3 uniform error ~= 38.6 dB

    def test_phash_properties(self):
        a = synth._pixels_for(10, 64, 64)
        b = synth._pixels_for(11, 64, 64)
        ha, hb = codec.phash64(a), codec.phash64(b)
        assert ha == codec.phash64(a)
        assert codec.hamming64([ha], [ha])[0] == 0
        assert codec.hamming64([ha], [hb])[0] > 0
        # phash is scale-robust: same pattern at 2x resolution hashes close
        big = np.kron(a, np.ones((2, 2, 1))).astype(np.uint8)
        assert codec.hamming64([ha], [codec.phash64(big)])[0] <= 6


class TestSynthTable:
    def test_schema_and_determinism(self):
        t1 = synth.synth_images_table(25, seed=42)
        t2 = synth.synth_images_table(25, seed=42)
        assert t1.equals(t2)
        assert t1.schema.names == ["image_id", "bytes", "w", "h", "fmt",
                                   "caption", "phash", "lon", "lat"]
        assert str(t1.schema.field("bytes").type) == "binary"
        assert str(t1.schema.field("phash").type) == "int64"

    def test_decode_psnr_invariant(self):
        """Every synthesized payload decodes back to its source pixels with
        PSNR >= 40 dB — png/raw rows losslessly (infinite), jpeg rows
        through the genuinely lossy DCT-quantization round trip; the
        stored phash always matches the stored (decoded) image exactly."""
        t = synth.synth_images_table(12, seed=42)
        saw_lossy = False
        for i in range(t.num_rows):
            px = codec.decode_image(t["bytes"][i].as_py(), t["fmt"][i].as_py(),
                                    t["w"][i].as_py(), t["h"][i].as_py())
            src = synth._pixels_for(i, 48, 48)
            assert codec.psnr(src, px) >= 40
            assert codec.phash64(px) == t["phash"][i].as_py()
            if t["fmt"][i].as_py() == "jpeg":
                saw_lossy = True
                assert not np.array_equal(px, src), "jpeg rows must be lossy"
        assert saw_lossy

    def test_sharded_generation_is_consistent(self):
        whole = synth.synth_images_table(20, seed=42).to_pandas()
        part = synth.synth_images_table(10, seed=42, start_index=10).to_pandas()
        assert list(part["image_id"]) == list(whole["image_id"][10:])
        assert list(part["caption"]) == list(whole["caption"][10:])
        assert [bytes(b) for b in part["bytes"]] == \
            [bytes(b) for b in whole["bytes"][10:]]


class TestLossyThroughAssignPipeline:
    def test_captions_and_phash_survive_lossy_path(self, ray_session):
        """North-rule invariant through the FULL assign pipeline: jpeg
        (lossy-coded) images decode, pass the exact phash integrity check,
        and their captions come out byte-identical to the source document
        text."""
        import pyarrow.parquet as pq

        from cqi_ray.pipelines.assign import DecodeValidate
        from cqi_ray.pipelines.flagship import build_images, run_flagship

        sf = "/root/testdata/sf0.001"
        decoded = build_images(sf).map_batches(
            DecodeValidate, batch_format="pandas", batch_size=64,
            concurrency=2).to_pandas()
        assert decoded["decode_ok"].all()
        assert decoded["phash_ok"].all()
        jpeg = decoded[decoded["fmt"] == "jpeg"]
        assert len(jpeg) > 0

        out = run_flagship(sf).to_pandas()
        docs = pq.read_table(f"{sf}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas()
        text_by_id = dict(zip(docs["doc_id"], docs["text"]))
        checked = 0
        for row in out.itertuples(index=False):
            doc_id = int(row.image_id.split("_")[1])
            assert row.caption == text_by_id[doc_id]
            if doc_id % 3 == 2:  # jpeg rows
                checked += 1
        assert checked > 0


class TestDecodeValidateStage:
    def test_actor_stage(self, ray_session):
        import ray.data as rd
        from cqi_ray.pipelines.assign import DecodeValidate

        t = synth.synth_images_table(30, seed=42)
        out = rd.from_arrow(t).map_batches(
            DecodeValidate, batch_format="pandas", batch_size=16,
            concurrency=2).to_pandas()
        assert out["decode_ok"].all()
        assert out["phash_ok"].all()

    def test_corrupt_payloads_flagged(self, ray_session):
        import ray.data as rd
        from cqi_ray.pipelines.assign import DecodeValidate

        t = synth.synth_images_table(6, seed=42).to_pandas()
        t.loc[0, "bytes"] = b"not an image"
        out = rd.from_pandas(t).map_batches(
            DecodeValidate, batch_format="pandas", concurrency=1).to_pandas()
        by_id = out.set_index("image_id")["decode_ok"]
        assert not by_id.loc[t.loc[0, "image_id"]]
        assert by_id.drop(t.loc[0, "image_id"]).all()


class TestResize:
    def test_identity_exact(self):
        import numpy as np

        from cqi_ray.images.codec import resize_bilinear, resize_nearest

        img = (np.arange(32 * 24 * 3, dtype=np.int64) % 251) \
            .astype(np.uint8).reshape(24, 32, 3)
        assert (resize_nearest(img, 32, 24) == img).all()
        assert (resize_bilinear(img, 32, 24) == img).all()

    def test_constant_image_stays_constant(self):
        import numpy as np

        from cqi_ray.images.codec import resize_bilinear, resize_nearest

        img = np.full((20, 30, 3), 137, dtype=np.uint8)
        for fn in (resize_nearest, resize_bilinear):
            out = fn(img, 7, 13)
            assert out.shape == (13, 7, 3)
            assert (out == 137).all()

    def test_bilinear_downsample_preserves_mean(self):
        import numpy as np

        from cqi_ray.images.codec import resize_bilinear

        rng = np.random.RandomState(8)
        img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
        out = resize_bilinear(img, 16, 16)
        assert abs(float(out.mean()) - float(img.mean())) < 8.0

    def test_gradient_monotone_after_resize(self):
        import numpy as np

        from cqi_ray.images.codec import resize_bilinear

        grad = np.tile(np.arange(0, 240, 10, dtype=np.uint8)[None, :, None],
                       (8, 1, 3))
        out = resize_bilinear(grad, 6, 4)
        rows = out[:, :, 0]
        assert (np.diff(rows, axis=1) >= 0).all()


class TestAnalysisKernels:
    def _sharp(self):
        # checkerboard: maximal local contrast
        y, x = np.mgrid[0:32, 0:32]
        return (((y + x) % 2) * 255).astype(np.uint8)

    def test_laplacian_var_orders_sharp_vs_flat(self):
        from cqi_ray.images import analysis

        flat = np.full((32, 32), 128, dtype=np.uint8)
        sharp = self._sharp()
        # box-blur the checkerboard -> mid-gray everywhere -> low response
        blurred = np.full((32, 32), 127.5)
        assert analysis.laplacian_var(flat) == 0.0
        assert analysis.laplacian_var(sharp) > 1000.0
        assert analysis.laplacian_var(blurred) < 1.0

    def test_image_stats(self):
        from cqi_ray.images import analysis

        mean, std, ent = analysis.image_stats(np.full((16, 16), 200.0))
        assert (mean, std, ent) == (200.0, 0.0, 0.0)
        # two equally-likely bins -> 1 bit of entropy
        two = np.zeros((16, 16))
        two[:, 8:] = 255.0
        _, _, e2 = analysis.image_stats(two)
        assert abs(e2 - 1.0) < 1e-9

    def test_dhash_deterministic_and_discriminates(self):
        from cqi_ray.images import analysis

        a = synth._pixels_for(5, 48, 48)
        g = analysis.to_gray(a)
        assert analysis.dhash64(g) == analysis.dhash64(g)
        # horizontal flip reverses every gradient comparison
        flipped = analysis.dhash64(g[:, ::-1])
        d = codec.hamming64(
            np.array([np.uint64(analysis.dhash64(g)).astype(np.int64)]),
            np.array([np.uint64(flipped).astype(np.int64)]))[0]
        assert d > 10

    def test_dhash_robust_to_brightness_shift(self):
        from cqi_ray.images import analysis

        g = analysis.to_gray(synth._pixels_for(7, 40, 40))
        shifted = np.clip(g + 10.0, 0, 255)
        d = codec.hamming64(
            np.array([np.uint64(analysis.dhash64(g)).astype(np.int64)]),
            np.array([np.uint64(analysis.dhash64(shifted)).astype(np.int64)]))[0]
        assert d <= 6

    def test_quality_flags_vectorized(self):
        from cqi_ray.images import analysis

        keep = analysis.quality_flags(
            sharpness=np.array([50.0, 0.1, 50.0, 50.0, 50.0]),
            mean=np.array([120.0, 120.0, 2.0, 120.0, 120.0]),
            std=np.array([30.0, 30.0, 30.0, 0.5, 30.0]),
            entropy=np.array([3.0, 3.0, 3.0, 3.0, 0.1]))
        assert list(keep) == [True, False, False, False, False]

    def test_query_runs_and_flags(self, ray_session):
        from cqi_ray.queries import q_images_quality

        # full 500 docs: the small-index frames never wrap their modulo
        # ramps (Laplacian == 0 everywhere), so discrimination needs the
        # higher doc_ids where the stripes fold
        out = q_images_quality("/root/testdata/sf0.001").to_pandas()
        # 500 docs, restricted to the lossless two-thirds (id%3 != 2)
        assert len(out) == 334
        assert set(out.columns) == {"image_id", "fmt", "sharpness",
                                    "mean_px", "std_px", "entropy",
                                    "keep"}
        assert set(out["fmt"]) == {"png", "raw"}
        # the synthetic corpus mixes pure linear ramps (Laplacian == 0 ->
        # "blurred") with striped frames: the filter must discriminate
        assert 0 < out["keep"].sum() < len(out)
        # keep is exactly the vectorized flag recomputed from the columns
        from cqi_ray.images.analysis import quality_flags
        expect = quality_flags(out["sharpness"].to_numpy(),
                               out["mean_px"].to_numpy(),
                               out["std_px"].to_numpy(),
                               out["entropy"].to_numpy())
        assert (out["keep"].to_numpy() == expect).all()
        # determinism across runs
        out2 = q_images_quality("/root/testdata/sf0.001").to_pandas()
        a = out.sort_values("image_id").reset_index(drop=True)
        b = out2.sort_values("image_id").reset_index(drop=True)
        import pandas as pd
        pd.testing.assert_frame_equal(a, b)


class TestMontage:
    def test_tile_placement_decodes_back(self, ray_session):
        """Contact-sheet compositor: rebuild the first montage locally
        and verify the pipeline's metadata (dims, checksum) matches a
        decode-back of the same composition."""
        import numpy as np

        from cqi_ray.images.codec import (decode_image, png_decode,
                                          png_encode, resize_bilinear)
        from cqi_ray.pipelines.flagship import build_images
        from cqi_ray.queries import q_images_montage

        out = q_images_montage("/root/testdata/sf0.001", n_images=16,
                               grid=4, tile_px=32).to_pandas() \
            .sort_values("montage_id").reset_index(drop=True)
        assert len(out) == 1
        assert out.loc[0, "n_tiles"] == 16
        assert out.loc[0, "width"] == 128 and out.loc[0, "height"] == 128

        imgs = build_images("/root/testdata/sf0.001", limit=16).to_pandas()
        canvas = np.zeros((128, 128, 3), dtype=np.uint8)
        for k, r in imgs.sort_values("image_id").iterrows():
            px = decode_image(r["bytes"], str(r["fmt"]), int(r["w"]),
                              int(r["h"]))
            t = resize_bilinear(px, 32, 32)
            rr, cc = divmod(k, 4)
            canvas[rr * 32:(rr + 1) * 32, cc * 32:(cc + 1) * 32] = t
        assert int(canvas.astype(np.int64).sum()) \
            == int(out.loc[0, "pixel_sum"])
        # the canvas round-trips the from-scratch PNG codec losslessly
        assert (png_decode(png_encode(canvas)) == canvas).all()


class TestSSIM:
    def test_identity_is_one(self):
        from cqi_ray.images.analysis import ssim, to_gray

        g = to_gray(synth._pixels_for(3, 32, 32))
        assert ssim(g, g) == 1.0

    def test_monotone_under_noise(self):
        from cqi_ray.images.analysis import ssim, to_gray

        g = to_gray(synth._pixels_for(7, 48, 48))
        rng = np.random.RandomState(11)
        noise = rng.normal(0, 1, g.shape)
        small = np.clip(g + 5 * noise, 0, 255)
        big = np.clip(g + 40 * noise, 0, 255)
        s_small, s_big = ssim(g, small), ssim(g, big)
        assert 0 < s_big < s_small < 1.0

    def test_constant_shift_beats_structure_loss(self):
        """SSIM is built to punish structural change more than luminance
        shift: a +10 global shift scores higher than a horizontal flip."""
        from cqi_ray.images.analysis import ssim, to_gray

        g = to_gray(synth._pixels_for(5, 48, 48))
        assert ssim(g, np.clip(g + 10, 0, 255)) > ssim(g, g[:, ::-1])

    def test_small_image_window_degrades(self):
        from cqi_ray.images.analysis import ssim

        g = np.arange(16, dtype=np.float64).reshape(4, 4)
        assert ssim(g, g, win=8) == 1.0  # window clamps to 4

    def test_lossy_codec_scores_high(self):
        from cqi_ray.images.analysis import ssim, to_gray
        from cqi_ray.images.codec import lossy_decode, lossy_encode

        px = synth._pixels_for(9, 32, 32)
        rec = lossy_decode(lossy_encode(px, quality=80))
        s = ssim(to_gray(px), to_gray(rec))
        assert 0.9 <= s < 1.0

    def test_query_rows_and_gate(self, ray_session):
        from cqi_ray.queries import q_images_ssim

        out = q_images_ssim("/root/testdata/sf0.001", limit=48).to_pandas()
        assert len(out) == 48
        assert set(out.columns) == {"image_id", "fmt", "ssim", "psnr",
                                    "lossy_bytes", "keep"}
        assert (out["ssim"] <= 1.0).all() and (out["ssim"] > 0.5).all()
        assert (out["psnr"] >= 30).all()
        # the gate discriminates at quality=80: most frames pass, the
        # hardest-to-code ones fall below the 0.9 SSIM bar
        assert 0 < out["keep"].sum() < len(out)
        expect = (out["ssim"].to_numpy() >= 0.9) \
            & (out["psnr"].to_numpy() >= 30.0)
        assert (out["keep"].to_numpy() == expect).all()


class TestAugment:
    def test_involutions(self):
        from cqi_ray.images import augment

        px = synth._pixels_for(4, 24, 32)
        assert np.array_equal(augment.hflip(augment.hflip(px)), px)
        assert np.array_equal(augment.vflip(augment.vflip(px)), px)
        out = px
        for _ in range(4):
            out = augment.rot90(out)
        assert np.array_equal(out, px)

    def test_rot90_shape_and_content(self):
        from cqi_ray.images import augment

        px = synth._pixels_for(2, 10, 6)  # (h=6, w=10)
        r = augment.rot90(px)
        assert r.shape == (10, 6, 3)
        assert np.array_equal(r, np.rot90(px, axes=(0, 1)))

    def test_center_crop_closed_form(self):
        from cqi_ray.images import augment

        px = synth._pixels_for(6, 40, 40)
        c = augment.center_crop(px, frac=0.5)
        assert c.shape == (20, 20, 3)
        assert np.array_equal(c, px[10:30, 10:30])

    def test_brightness_saturates(self):
        from cqi_ray.images import augment

        px = np.full((4, 4, 3), 200, dtype=np.uint8)
        up = augment.brightness(px, 1.5)
        assert (up == 255).all()
        down = augment.brightness(px, 0.5)
        assert (down == 100).all()

    def test_plan_deterministic_and_applies(self):
        from cqi_ray.images import augment

        assert augment.plan_for(0) == ["hflip", "brighten"]
        assert augment.plan_for(1) == ["vflip"]
        assert augment.plan_for(3) == ["crop", "darken"]
        px = synth._pixels_for(0, 16, 16)
        out = augment.apply_plan(px, augment.plan_for(0))
        expect = augment.brightness(augment.hflip(px), 1.25)
        assert np.array_equal(out, expect)

    def test_dihedral_phashes_exact_under_transforms(self):
        from cqi_ray.images.analysis import dihedral_phashes
        from cqi_ray.images.codec import phash64

        px = synth._pixels_for(13, 32, 32)
        dh = set(dihedral_phashes(px).tolist())
        for t in (px[:, ::-1], px[::-1, :], np.rot90(px, axes=(0, 1)),
                  np.rot90(px, 3, axes=(0, 1))):
            h = np.uint64(phash64(np.ascontiguousarray(t))).astype(np.int64)
            assert int(h) in dh

    def test_phash_layout_invariant(self):
        """phash64 must be a function of pixel VALUES, not memory layout
        (strided rot90/flip views vs contiguous copies hit different
        BLAS summation orders)."""
        from cqi_ray.images.codec import phash64

        px = synth._pixels_for(10, 32, 32)
        view = np.rot90(px, axes=(0, 1))
        assert phash64(view) == phash64(np.ascontiguousarray(view))
        flipped = px[:, ::-1]
        assert phash64(flipped) == phash64(np.ascontiguousarray(flipped))

    @pytest.mark.parametrize("size", [8, 17, 32, 33, 96])
    def test_phash_batch_scalar_conformance_all_sizes(self, size):
        """Batch and scalar phash must agree at EVERY frame size, odd
        ones included: with a matvec gray projection the SIMD grouping
        depended on each slice's byte alignment, so (n,17,17,3) batches
        drifted 1 ulp from their scalar slices and ~37% of hashes
        flipped a near-median bit (round-5 fix: elementwise
        projection + reduceat resize, one summation order per layout)."""
        from cqi_ray.images.codec import phash64, phash64_batch

        px = synth.pixels_for_batch(
            np.arange(64, dtype=np.int64), size, size)
        scalar = np.array([phash64(p) for p in px])
        assert np.array_equal(scalar, phash64_batch(px))

    def test_dedup_orientation_exact_geo_recall(self, ray_session):
        """Every purely-geometric re-upload (flip/rot plans, no
        photometric op) must match its own source; photometric and crop
        plans are documented out of scope."""
        from cqi_ray.images.augment import plan_for
        from cqi_ray.queries import q_dedup_orientation

        n = 48
        out = q_dedup_orientation("/root/testdata/sf0.001", limit=n) \
            .to_pandas()
        matched = set(zip(out["aug"], out["orig"]))
        for idx in range(n):
            plan = plan_for(idx)
            img = f"img_{idx:012d}"
            if "crop" not in plan and len(plan) == 1:  # pure geometric
                assert (img, img) in matched, (idx, plan)
        # crop plans never reach the hamming<=6 bar on this corpus
        for idx in range(n):
            if "crop" in plan_for(idx):
                img = f"img_{idx:012d}"
                assert (img, img) not in matched

    def test_shards_roundtrip_byte_exact(self, ray_session, tmp_path):
        """Shard sink/source: every payload byte, caption, dim and hash
        survives the tar round trip; shard bytes are deterministic."""
        import hashlib

        from cqi_ray.io.shards import read_image_shards, write_image_shards
        from cqi_ray.pipelines.flagship import build_images
        from cqi_ray.queries import q_shards_roundtrip

        sf = "/root/testdata/sf0.001"
        src = build_images(sf, limit=48).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)

        d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
        m1 = write_image_shards(build_images(sf, limit=48), d1, 16).to_pandas()
        m2 = write_image_shards(build_images(sf, limit=48), d2, 16).to_pandas()
        assert int(m1["n_samples"].sum()) == 48
        # deterministic shard bytes: same shard names -> same md5
        a = m1.sort_values("shard").reset_index(drop=True)
        b = m2.sort_values("shard").reset_index(drop=True)
        assert list(a["shard"]) == list(b["shard"])
        assert list(a["md5"]) == list(b["md5"])

        back = read_image_shards(d1).to_pandas() \
            .sort_values("image_id").reset_index(drop=True)
        assert list(back["image_id"]) == list(src["image_id"])
        assert list(back["caption"]) == list(src["caption"])
        assert list(back["phash"]) == list(src["phash"])
        assert [bytes(x) for x in back["bytes"]] \
            == [bytes(x) for x in src["bytes"]]

        out = q_shards_roundtrip(sf, limit=48, samples_per_shard=16) \
            .to_pandas().sort_values("image_id").reset_index(drop=True)
        assert list(out["bytes_md5"]) \
            == [hashlib.md5(bytes(x)).hexdigest() for x in src["bytes"]]
        assert list(out["caption"]) == list(src["caption"])

    def test_joint_curation_consistency(self, ray_session):
        """Cross-modal gate: keep ⇔ both modality flags, reasons name the
        failing side(s), and each side matches its standalone pipeline."""
        import pandas as pd

        from cqi_ray.ops.text import LangId, TextStats
        from cqi_ray.queries import q_images_quality, q_joint_curation

        out = q_joint_curation("/root/testdata/sf0.001", limit=64) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert len(out) == 64
        assert (out["keep"] == (out["img_keep"] & out["text_keep"])).all()
        for r in out.itertuples(index=False):
            want = ";".join(
                s for s, bad in (("image", not r.img_keep),
                                 ("text", not r.text_keep)) if bad)
            assert r.reason == want
        # image side == the standalone quality pipeline on the shared
        # (lossless) rows — q_images_quality covers the SQL-replayable
        # two-thirds; joint_curation gates all formats
        iq = q_images_quality("/root/testdata/sf0.001", limit=64).to_pandas()
        iq["doc_id"] = iq["image_id"].str.split("_").str[1].astype("int64")
        merged = out.merge(iq[["doc_id", "keep"]].rename(
            columns={"keep": "expect_img"}), on="doc_id")
        assert len(merged) == 43
        assert (merged["img_keep"] == merged["expect_img"]).all()
        # text side == TextStats+LangId recomputed locally
        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                               columns=["doc_id", "text"]).head(64)
        stats = TextStats()(docs)
        lang = LangId()(stats)
        expect_txt = (lang["n_tokens"].to_numpy() >= 20) \
            & (lang["lang_pred"].to_numpy() != "und")
        by_id = dict(zip(lang["doc_id"].astype(int), expect_txt))
        assert all(bool(by_id[int(d)]) == bool(k)
                   for d, k in zip(out["doc_id"], out["text_keep"]))
        assert 0 < out["keep"].sum()

    def test_query_decode_back(self, ray_session):
        """The emitted pHash/dims must match recomputation from the source
        pixels through the same plan — proving the distributed stage and
        the local kernels agree byte-for-byte."""
        from cqi_ray.images import augment
        from cqi_ray.images.codec import phash64
        from cqi_ray.queries import q_images_augment

        out = q_images_augment("/root/testdata/sf0.001", limit=24) \
            .to_pandas().sort_values("image_id").reset_index(drop=True)
        assert len(out) == 24
        for r in out.itertuples(index=False):
            idx = int(r.image_id.split("_")[1])
            src = synth._pixels_for(idx, 32, 32)
            if idx % 3 == 2:  # jpeg rows store the lossy pixels
                from cqi_ray.images.codec import lossy_decode, lossy_encode
                src = lossy_decode(lossy_encode(src))
            aug = augment.apply_plan(src, augment.plan_for(idx))
            assert (r.out_h, r.out_w) == aug.shape[:2]
            assert r.out_phash == np.uint64(phash64(aug)).astype(np.int64)
            assert r.ops == "+".join(augment.plan_for(idx))


class TestBoxes:
    """patchify / synth_boxes / NMS kernels (cqi_ray/images/boxes.py)."""

    def test_patchify_matches_explicit_slicing(self):
        from cqi_ray.images.boxes import patchify

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(3, 32, 32, 3)).astype(np.float64)
        p = patchify(px, 8)
        assert p.shape == (3, 4, 4, 8, 8, 3)
        for n in range(3):
            for gy in range(4):
                for gx in range(4):
                    want = px[n, gy * 8:(gy + 1) * 8, gx * 8:(gx + 1) * 8]
                    assert np.array_equal(p[n, gy, gx], want)

    def test_patchify_rejects_nondivisible(self):
        import pytest

        from cqi_ray.images.boxes import patchify

        with pytest.raises(ValueError):
            patchify(np.zeros((1, 30, 32, 3)), 8)

    def test_synth_boxes_deterministic_and_bounded(self):
        from cqi_ray.images.boxes import synth_boxes

        a = synth_boxes(12345, 24, 640, 480)
        b = synth_boxes(12345, 24, 640, 480)
        assert np.array_equal(a, b)
        assert a.shape == (24, 5)
        assert (a[:, 0] < a[:, 2]).all() and (a[:, 1] < a[:, 3]).all()
        assert (a[:, 0] >= 0).all() and (a[:, 2] <= 640).all()
        assert (a[:, 1] >= 0).all() and (a[:, 3] <= 480).all()
        assert not np.array_equal(a, synth_boxes(12346, 24, 640, 480))

    def test_nms_matches_bruteforce_greedy(self):
        from cqi_ray.images.boxes import iou_matrix, nms

        rng = np.random.default_rng(11)
        for trial in range(20):
            n = int(rng.integers(1, 40))
            x0 = rng.uniform(0, 80, n)
            y0 = rng.uniform(0, 80, n)
            boxes = np.stack([x0, y0, x0 + rng.uniform(5, 40, n),
                              y0 + rng.uniform(5, 40, n)], axis=1)
            scores = rng.uniform(0, 1, n)
            got = nms(boxes, scores, 0.4)
            # reference: textbook greedy, re-deriving IoU pairwise
            m = iou_matrix(boxes)
            order = sorted(range(n), key=lambda i: (-scores[i], i))
            kept = []
            for i in order:
                if all(m[i, j] <= 0.4 for j in kept):
                    kept.append(i)
            assert got.tolist() == kept

    def test_nms_suppresses_exact_duplicates(self):
        from cqi_ray.images.boxes import nms

        boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30.0]])
        keep = nms(boxes, np.array([0.9, 0.8, 0.5]), 0.5)
        assert keep.tolist() == [0, 2]


class TestBatchedCodecPaths:
    """The flagship synthesizer's batched encode/phash paths must be
    BIT-IDENTICAL to the scalar codec functions — the batching is a pure
    throughput change (it sits inside the timed scaling headline)."""

    def _px(self, n=200, size=32):
        from cqi_ray.images import synth

        return synth.pixels_for_batch(np.arange(n), size, size)

    def test_pixels_batch_matches_scalar(self):
        from cqi_ray.images import synth

        ids = np.array([0, 1, 2, 63, 499, 12345])
        got = synth.pixels_for_batch(ids, 32, 32)
        want = np.stack([synth._pixels_for(int(i), 32, 32) for i in ids])
        assert (got == want).all()

    def test_png_and_raw_batch_bytes_identical(self):
        from cqi_ray.images import codec

        px = self._px(120)
        assert codec.png_encode_batch(px) == [codec.png_encode(p)
                                              for p in px]
        assert codec.raw_encode_batch(px) == [codec.raw_encode(p)
                                              for p in px]

    def test_lossy_batch_bytes_and_decode_identical(self):
        from cqi_ray.images import codec

        for size in (32, 64):
            px = self._px(90, size)
            blobs, dec = codec.lossy_roundtrip_pixels_batch(px)
            want = [codec.lossy_encode(p) for p in px]
            assert blobs == want
            assert codec.lossy_encode_batch(px) == want
            assert (dec == np.stack([codec.lossy_decode(b)
                                     for b in want])).all()

    def test_phash_batch_identical_over_corpus(self):
        from cqi_ray.images import codec

        px = self._px(500)
        got = codec.phash64_batch(px)
        want = np.array([codec.phash64(p) for p in px])
        assert (got == want).all()

    def test_synthesizer_output_schema_and_determinism(self):
        import pandas as pd

        from cqi_ray.pipelines.flagship import images_from_documents

        docs = pd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"]).head(60)
        a = images_from_documents(docs, size_px=32, per_doc=2)
        b = images_from_documents(docs, size_px=32, per_doc=2)
        assert len(a) == 120
        assert list(a.columns) == ["image_id", "bytes", "w", "h", "fmt",
                                   "caption", "phash", "lon", "lat"]
        for c in a.columns:
            assert a[c].tolist() == b[c].tolist()
