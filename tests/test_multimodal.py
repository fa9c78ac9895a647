"""Multimodal (audio/video) stage plumbing + phash dedup + salted join."""

import numpy as np
import pandas as pd
import pytest

from cqi_ray.images import multimodal as mm


class TestAudioVideo:
    def test_audio_roundtrip_and_features(self, ray_session):
        import ray.data as rd

        clips = mm.synth_audio_table(8)
        out = rd.from_pandas(clips).map_batches(
            mm.AudioFeatures, batch_format="pandas", batch_size=4,
            concurrency=1).to_pandas()
        assert len(out) == 8
        assert "bytes" not in out.columns
        # triangle wave amplitude 12000/32768 -> RMS = 0.366/sqrt(3) = 0.211
        assert ((out["rms"] > 0.2) & (out["rms"] < 0.3)).all()
        assert (out["duration_sec"] == 0.5).all()
        assert (out["zero_crossings"] > 10).all()

    def test_video_frame_sampling(self, ray_session):
        import ray.data as rd
        from cqi_ray.images import codec

        vids = mm.synth_video_table(3, n_frames=30)
        frames = rd.from_pandas(vids).map_batches(
            mm.VideoFrameSample, batch_format="pandas", batch_size=2,
            concurrency=1, fn_constructor_kwargs={"every_n": 10}).to_pandas()
        assert len(frames) == 9  # 3 videos x frames {0, 10, 20}
        px = codec.png_decode(frames["bytes"].iloc[0])
        assert px.shape == (16, 16, 3)

    def test_wav_roundtrip_bit_exact(self):
        """Real RIFF/WAVE codec (round 4): PCM16 survives encode/decode
        bit-for-bit, stereo included."""
        rng = np.random.RandomState(3)
        mono = rng.randint(-32768, 32768, size=(500, 1)).astype(np.int16)
        pcm, sr = mm.wav_decode(mm.wav_encode(mono, 8000))
        assert sr == 8000 and np.array_equal(pcm, mono)
        stereo = rng.randint(-32768, 32768, size=(300, 2)).astype(np.int16)
        pcm2, sr2 = mm.wav_decode(mm.wav_encode(stereo, 44100))
        assert sr2 == 44100 and np.array_equal(pcm2, stereo)

    def test_wav_skips_unknown_chunks(self):
        wav = mm.wav_encode(np.arange(10, dtype=np.int16)[:, None], 8000)
        # splice a LIST chunk between header and fmt's sibling chunks
        spliced = wav[:12] + b"LIST\x04\x00\x00\x00INFO" + wav[12:]
        import struct as st
        spliced = (spliced[:4]
                   + st.pack("<I", len(spliced) - 8) + spliced[8:])
        pcm, sr = mm.wav_decode(spliced)
        assert np.array_equal(pcm[:, 0], np.arange(10))

    def test_unsupported_audio_rejected(self):
        with pytest.raises(ValueError):
            mm.decode_audio(b"OggSvorbis...", 100, 1)
        with pytest.raises(ValueError):
            mm.decode_video_frames(b"\x00\x00\x01\xba mpeg", 8, 8, 2)

    def test_mjpeg_index_seek_decodes_only_sampled(self):
        """The MJPG offset index: sampling must not parse unsampled
        frames (corrupting them is invisible to an index seek)."""
        from cqi_ray.images import synth

        frames = np.stack([synth._pixels_for(i, 16, 16) for i in range(6)])
        blob = bytearray(mm.mjpeg_encode(frames, quality=90))
        w, h, n, offs, base = mm._mjpeg_index(bytes(blob))
        # corrupt frame 1's payload entirely
        blob[base + int(offs[1]):base + int(offs[2])] = \
            b"\x00" * (int(offs[2]) - int(offs[1]))
        sampled = mm.mjpeg_decode_indices(bytes(blob), [0, 2, 4])
        assert sampled.shape == (3, 16, 16, 3)
        from cqi_ray.images import codec, jpeg
        # and the sampled frames decode to the true content (lossy codec)
        full = mm.mjpeg_decode_indices(mm.mjpeg_encode(frames, 90), [0])
        assert codec.psnr(full[0], frames[0]) > 28

    def test_spectral_features_exact_bins(self, ray_session):
        """AudioSpectral on leakage-free tones: the dominant bin equals
        the planted fundamental; rolloff sits on the fundamental too
        (a triangle wave carries ~98.5% of its power there)."""
        import ray.data as rd

        tones = mm.synth_tone_table(12)
        out = rd.from_pandas(tones).map_batches(
            mm.AudioSpectral, batch_format="pandas", batch_size=4,
            concurrency=1).to_pandas().sort_values("clip_id")
        planted = [5 + (i * 3) % 20 for i in range(12)]
        assert list(out["dominant_bin"]) == planted
        assert list(out["rolloff_bin"]) == planted
        assert (out["n_bins"] == 129).all()


class TestPhashDedup:
    def test_planted_near_dups_found(self, ray_session):
        """Band-LSH recall machinery: bands = d + 1 must find a planted
        pair at hamming d by pigeonhole, whatever d the codec assigns.
        The planted distance is MEASURED, not assumed — synthetic noise
        frames have near-degenerate spectra whose median-threshold bits
        shift with any codec summation-order change, so a hard-coded
        d would re-break on every legitimate codec change."""
        from cqi_ray.images.codec import hamming64, phash64
        from cqi_ray.ops.dedup import hash_band_rows, phash_dup_pairs_in_bucket
        from cqi_ray.images.synth import _pixels_for

        px = [_pixels_for(i, 32, 32) for i in range(10)]
        # plant a near-dup: tiny brightness shift of image 0
        near = np.clip(px[0].astype(int) + 2, 0, 255).astype(np.uint8)
        hashes = [phash64(p) for p in px] + [phash64(near)]
        ids = [f"im{i}" for i in range(11)]
        d = int(hamming64([hashes[0]], [hashes[10]])[0])
        assert 0 < d <= 20  # still a near-dup, not identical
        banded = hash_band_rows(np.array(hashes, dtype=np.uint64), ids,
                                bands=d + 1)
        found = set()
        for _, grp in banded.groupby(["band_id", "band_hash"]):
            if len(grp) > 1:
                h_by_id = dict(zip(ids, hashes))
                pairs = phash_dup_pairs_in_bucket(
                    grp["doc_id"].to_numpy(),
                    [h_by_id[i] for i in grp["doc_id"]], max_hamming=d)
                found.update((a, b) for a, b, _ in pairs)
        assert ("im0", "im10") in found


class TestSaltedAssign:
    def test_salting_preserves_results(self, ray_session):
        """Salted hot cells must not change any assignment."""
        import ray.data as rd
        from cqi_ray.images.synth import synth_images_table, synth_ways_grid
        from cqi_ray.pipelines.assign import (assign_images_to_ways,
                                              estimate_hot_cells)
        from cqi_ray.pipelines.cqi import dataset_from_rows, score_ways_dataset
        from cqi_ray.geo import cells

        scored = score_ways_dataset(dataset_from_rows(synth_ways_grid(16)))
        images = rd.from_arrow(synth_images_table(120, seed=5))
        res = cells.res_for_meters(3000, 51.0)
        hot = estimate_hot_cells(images, res, rows_per_group=20)
        assert hot, "skewed synthetic positions should produce hot cells"

        plain = assign_images_to_ways(images, scored, buffer_m=30,
                                      knn_radius_m=3000).to_pandas()
        salted = assign_images_to_ways(images, scored, buffer_m=30,
                                       knn_radius_m=3000,
                                       hot_cells=hot).to_pandas()
        key = lambda df: df.sort_values("image_id")[
            ["image_id", "way_id", "method"]].fillna("-").to_dict("records")
        assert key(plain) == key(salted)


class TestCheckpointedFlagship:
    def test_resume_skips_stages(self, ray_session, tmp_path):
        from cqi_ray.pipelines.flagship import run_flagship_checkpointed
        from cqi_ray.state.checkpoint import load_manifest

        out = str(tmp_path / "ckpt")
        s1, a1, t1 = run_flagship_checkpointed(
            "/root/testdata/sf0.001", out, n_ways=9, zooms=(14,))
        n_assign = a1.count()
        man = load_manifest(f"{out}/assignments")
        assert man["complete"] and man["row_count"] == n_assign
        assert man["partitions"], "expected per-partition lineage entries"
        mtimes = {}
        import os
        for stage in ("scores", "assignments", "tiles"):
            mtimes[stage] = os.path.getmtime(f"{out}/{stage}/_manifest.json")
        s2, a2, t2 = run_flagship_checkpointed(
            "/root/testdata/sf0.001", out, n_ways=9, zooms=(14,))
        for stage in ("scores", "assignments", "tiles"):
            assert os.path.getmtime(f"{out}/{stage}/_manifest.json") == \
                mtimes[stage], f"{stage} was recomputed"
        assert a2.count() == n_assign


class TestPhashClusters:
    def test_cluster_assignment(self, ray_session):
        """Every item gets a cluster; the planted near-dup groups of 4
        (nested bit-flip masks, hamming <= 9 within a group) collapse to
        one cluster each with the min doc_id as representative."""
        from cqi_ray.queries import q_dedup_phash_clusters

        out = q_dedup_phash_clusters("/root/testdata/sf0.001").to_pandas()
        assert len(out) == 500
        assert out["doc_id"].is_unique
        # reps are members mapped to themselves
        assert set(out["cluster_rep"]) <= set(out["doc_id"])
        rep_rows = out[out["doc_id"].isin(out["cluster_rep"].unique())]
        assert (rep_rows["doc_id"] == rep_rows["cluster_rep"]).all()
        # planted groups of 4 -> cluster rep == group min
        grouped = out.sort_values("doc_id")
        assert (grouped["cluster_rep"].to_numpy()
                == (grouped["doc_id"].to_numpy() // 4) * 4).all()

    def test_deterministic(self, ray_session):
        from cqi_ray.queries import q_dedup_phash_clusters

        a = q_dedup_phash_clusters("/root/testdata/sf0.001").to_pandas()
        b = q_dedup_phash_clusters("/root/testdata/sf0.001").to_pandas()
        ka = a.sort_values("doc_id").reset_index(drop=True)
        kb = b.sort_values("doc_id").reset_index(drop=True)
        assert ka.equals(kb)


class TestGroupedHammingPairs:
    """hamming_dup_pairs_grouped (exact-dup-pile-safe vectorized form)
    must equal the naive per-row loop on every group."""

    def test_differential_vs_naive(self):
        from cqi_ray.ops.dedup import (hamming_dup_pairs_grouped,
                                       phash_dup_pairs_in_bucket,
                                       run_bounds)
        import numpy as np

        rng = np.random.RandomState(7)
        # 3 groups: random hashes, a near-dup chain, a big exact-dup pile
        base = rng.randint(0, 1 << 32, size=30).astype(np.uint64)
        g0 = base
        g1 = np.array([100, 101, 102, 103], dtype=np.uint64)  # tiny hamming
        g2 = np.full(50, 0xDEADBEEF, dtype=np.uint64)         # exact pile
        hashes = np.concatenate([g0, g1, g2]).astype(np.int64)
        ids = np.arange(len(hashes), dtype=np.int64)
        band = np.concatenate([np.zeros(30), np.ones(4), np.full(50, 2)])
        bounds = run_bounds(band)

        a, b = hamming_dup_pairs_grouped(ids, hashes, bounds, max_hamming=6)
        got = set(zip(a.tolist(), b.tolist()))

        expect = set()
        for s, e in zip(bounds[:-1], bounds[1:]):
            for x, y, _ in phash_dup_pairs_in_bucket(
                    ids[s:e], hashes[s:e], max_hamming=6):
                expect.add((min(int(x), int(y)), max(int(x), int(y))))
        assert got == expect
        # the exact pile contributes all C(50,2) pairs
        assert len([1 for x, y in got if x >= 34]) == 50 * 49 // 2

    def test_empty_and_singletons(self):
        from cqi_ray.ops.dedup import hamming_dup_pairs_grouped, run_bounds
        import numpy as np

        ids = np.array([1, 2, 3], dtype=np.int64)
        h = np.array([10, 20, 30], dtype=np.int64)
        bounds = run_bounds(np.array([0, 1, 2]))  # all singleton groups
        a, b = hamming_dup_pairs_grouped(ids, h, bounds, max_hamming=1)
        assert len(a) == 0 and len(b) == 0


def test_flagship_resume_catalog_entry(ray_session):
    """The catalog's resume proof: second run must hit every stage
    manifest (resumed=True across the chain) and persist rows."""
    from cqi_ray.queries import q_flagship_resume

    out = q_flagship_resume("/root/testdata/sf0.001", n_ways=32)
    assert list(out["stage"]) == ["scores", "assignments", "tiles"]
    assert out["resumed"].all()
    assert (out["rows"] > 0).all()
    # assignments are hash-partitioned (cell % 8; sf0.001's tiny extent
    # concentrates into few cells), tiles partition by zoom
    assert int(out.loc[out["stage"] == "assignments",
                       "n_partitions"].iloc[0]) >= 1
    assert int(out.loc[out["stage"] == "tiles",
                       "n_partitions"].iloc[0]) >= 1
