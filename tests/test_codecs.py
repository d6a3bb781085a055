import numpy as np
import pytest

from go_osm_search_ray import codecs, synth


class TestPNG:
    def test_roundtrip_exact(self):
        rng = np.random.default_rng(1)
        for shape in [(8, 8, 3), (16, 9, 3), (1, 1, 3), (64, 64, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            out = codecs.png_decode(codecs.png_encode(img))
            np.testing.assert_array_equal(img, out)

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            codecs.png_decode(b"not a png at all")

    def test_psnr_lossless_inf(self):
        img = np.zeros((8, 8, 3), np.uint8)
        assert codecs.psnr(img, img) == float("inf")


class TestFakeJPEG:
    def test_lossy_but_above_invariant(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        out = codecs.jpeg_decode(codecs.jpeg_encode(img))
        p = codecs.psnr(img, out)
        assert p >= 40.0  # the per-row invariant floor (BASELINE.json)
        assert p != float("inf")  # genuinely lossy


class TestImagesBatch:
    def test_deterministic_and_decodable(self):
        idx = np.arange(100, dtype=np.uint64)
        t1 = synth.images_batch(idx, seed=42)
        t2 = synth.images_batch(idx, seed=42)
        assert t1.equals(t2)
        assert t1.num_rows == 100
        # every payload decodes and matches its fmt/w/h
        for i in range(0, 100, 17):
            row = {c: t1[c][i].as_py() for c in t1.column_names}
            img = codecs.decode(row["bytes"], row["fmt"])
            assert img.shape == (row["h"], row["w"], 3)

    def test_order_independence(self):
        a = synth.images_batch(np.array([5, 6, 7], dtype=np.uint64))
        b = synth.images_batch(np.array([7, 5, 6], dtype=np.uint64))
        assert a.slice(0, 1)["phash"][0].as_py() == b.slice(1, 1)["phash"][0].as_py()

    def test_phash_latlon_consistent(self):
        from go_osm_search_ray import geo

        t = synth.images_batch(np.arange(1000, dtype=np.uint64))
        lat, lon = geo.phash_to_latlon(t["phash"].to_numpy())
        assert (np.abs(lat) <= 90).all() and (np.abs(lon) <= 180).all()

    def test_hot_cells_exist(self):
        from go_osm_search_ray import geo

        t = synth.images_batch(np.arange(20000, dtype=np.uint64))
        lat, lon = geo.phash_to_latlon(t["phash"].to_numpy())
        tiles = geo.tile_id(lat, lon, 7)
        _, counts = np.unique(tiles, return_counts=True)
        # skewed: the hottest cell should hold far more than the mean
        assert counts.max() > 20 * counts.mean()


class TestSideTables:
    def test_polygons_closed_rings(self):
        t = synth.polygons_table(40)
        assert t.num_rows == 40
        for i in range(t.num_rows):
            ring = t["ring"][i].as_py()
            assert ring[0] == ring[-1]
            assert len(ring) >= 4

    def test_streets(self):
        t = synth.streets_table(20)
        assert t.num_rows == 20
        assert len(t["geom"][0].as_py()) >= 2

    def test_fence_events_cover_fences(self):
        f = synth.fences_table(5)
        ev = synth.fence_events_table(f, n_points=5, steps=10)
        assert ev.num_rows == 50
        # seq strictly increasing
        s = ev["seq"].to_numpy()
        assert (np.diff(s) > 0).all()


class TestMultiFrameAndPCM:
    def test_video_container_roundtrip(self):
        import numpy as np

        from go_osm_search_ray import codecs

        frames = []
        for i in range(5):
            img = np.full((8, 8, 3), i * 10, dtype=np.uint8)
            frames.append(codecs.png_encode(img))
        packed = codecs.video_pack(frames)
        out = codecs.video_unpack(packed)
        assert out == frames
        for i, f in enumerate(out):
            assert (codecs.png_decode(f) == i * 10).all()

    def test_pcm16_roundtrip(self):
        import numpy as np

        from go_osm_search_ray import codecs

        s = (np.arange(100) * 37 % 2048 - 1024).astype(np.int16)
        assert (codecs.pcm16_decode(codecs.pcm16_encode(s)) == s).all()

    def test_frame_sample_stride(self):
        import numpy as np
        import pyarrow as pa

        from go_osm_search_ray import synth
        from go_osm_search_ray.stages.images import FrameSample

        t = synth.videos_from_keys(np.array([7, 8]), n_frames=6)
        out = FrameSample(stride=2)(t)
        df = out.to_pandas()
        assert sorted(df["frame_idx"].unique()) == [0, 2, 4]
        assert len(df) == 6  # 2 videos x 3 sampled frames

    def test_audio_features_match_brute(self):
        import numpy as np

        from go_osm_search_ray import codecs, synth
        from go_osm_search_ray.stages.images import AudioFeatures

        t = synth.audio_from_keys(np.array([3, 9]), n_samples=64)
        out = AudioFeatures()(t).to_pandas()
        for i, kk in enumerate([3, 9]):
            s = codecs.pcm16_decode(t["bytes"][i].as_py()).astype(np.int64)
            assert out["n_samples"][i] == 64
            assert out["sum_abs"][i] == np.abs(s).sum()
            assert out["peak"][i] == np.abs(s).max()
            zc = ((s[:-1] < 0) != (s[1:] < 0)).sum()
            assert out["zero_crossings"][i] == zc
