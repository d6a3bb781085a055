"""Property-based tests (hypothesis) over the pure kernels — no Ray.

These pin the algebraic contracts the distributed operators rely on:
distance symmetry, tile containment, exact top-k cut semantics, codec
round-trips, bag-invariance of signatures.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from go_osm_search_ray import codecs, geo

lat_s = st.floats(min_value=-89.99, max_value=89.99, allow_nan=False)
lon_s = st.floats(min_value=-179.99, max_value=179.99, allow_nan=False)


class TestGeoProperties:
    @settings(max_examples=200, deadline=None)
    @given(lat_s, lon_s, lat_s, lon_s)
    def test_haversine_symmetric_bounded(self, a, b, c, d):
        d1 = float(geo.haversine_km(a, b, c, d))
        d2 = float(geo.haversine_km(c, d, a, b))
        assert abs(d1 - d2) < 1e-9
        assert 0.0 <= d1 <= np.pi * 6371.0 + 1e-6
        assert float(geo.haversine_km(a, b, a, b)) == 0.0

    @settings(max_examples=200, deadline=None)
    @given(lat_s, lon_s, st.integers(min_value=1, max_value=10))
    def test_point_inside_own_tile(self, lat, lon, res):
        t = int(geo.tile_id(lat, lon, res))
        lat0, lat1, lon0, lon1 = geo.tile_bounds(t, res)
        assert lat0 - 1e-9 <= lat <= lat1 + 1e-9
        assert lon0 - 1e-9 <= lon <= lon1 + 1e-9
        assert 0 <= t < (1 << res) * (1 << res)

    @settings(max_examples=200, deadline=None)
    @given(lat_s, lon_s, st.integers(min_value=2, max_value=10),
           st.integers(min_value=0, max_value=8))
    def test_tile_parent_consistent(self, lat, lon, res, dp):
        parent_res = max(0, res - 1 - dp % res)
        t = geo.tile_id(np.array([lat]), np.array([lon]), res)
        p = geo.tile_parent(t, res, parent_res)
        direct = geo.tile_id(np.array([lat]), np.array([lon]), parent_res)
        assert int(p[0]) == int(direct[0])

    @settings(max_examples=150, deadline=None)
    @given(lat_s, lon_s,
           st.floats(min_value=-80, max_value=80),
           st.floats(min_value=-170, max_value=170),
           st.floats(min_value=0.5, max_value=30.0),
           st.floats(min_value=0.5, max_value=30.0))
    def test_pip_rectangle_equals_between(self, plat, plon, lat0, lon0, dh, dw):
        lat1, lon1 = min(lat0 + dh, 89.9), min(lon0 + dw, 179.9)
        ring_lat = np.array([lat0, lat0, lat1, lat1, lat0])
        ring_lon = np.array([lon0, lon1, lon1, lon0, lon0])
        got = bool(geo.point_in_polygon(plat, plon, ring_lat, ring_lon)[0])
        want = (lat0 <= plat <= lat1) and (lon0 <= plon <= lon1)
        assert got == want

    @settings(max_examples=200, deadline=None)
    @given(lat_s, lon_s)
    def test_phash_roundtrip_quantization(self, lat, lon):
        from go_osm_search_ray.synth import latlon_to_phash

        ph = latlon_to_phash(np.array([lat]), np.array([lon]))
        qlat, qlon = geo.phash_to_latlon(ph)
        assert abs(float(qlat[0]) - lat) <= 180.0 / 2**32 + 1e-9
        assert abs(float(qlon[0]) - lon) <= 360.0 / 2**32 + 1e-9


class TestTopKCutProperties:
    @settings(max_examples=150, deadline=None)
    @given(st.integers(min_value=1, max_value=6),
           st.integers(min_value=2, max_value=30),
           st.integers(min_value=1, max_value=12),
           st.integers(min_value=0, max_value=10**6))
    def test_topk_cols_exact_matches_lexsort(self, rows, cols, k, seed):
        """The argpartition fast path must select EXACTLY the same
        members as a full (value, column) lexsort — ties forced by a
        tiny value alphabet."""
        from go_osm_search_ray.stages.knn import topk_cols_exact

        rng = np.random.default_rng(seed)
        a = rng.integers(0, 4, size=(rows, cols)).astype(np.float64)
        n = min(k, cols)
        got = topk_cols_exact(a, n)
        pos = np.broadcast_to(np.arange(cols), a.shape)
        want = np.lexsort((pos, a), axis=-1)[:, :n]
        for r in range(rows):
            assert set(got[r].tolist()) == set(want[r].tolist())


class TestCodecProperties:
    @settings(max_examples=60, deadline=None)
    @given(st.integers(min_value=1, max_value=24),
           st.integers(min_value=1, max_value=24),
           st.integers(min_value=0, max_value=10**6))
    def test_png_roundtrip_exact(self, h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        out = codecs.png_decode(codecs.png_encode(img))
        assert (out == img).all()

    @settings(max_examples=40, deadline=None)
    @given(st.integers(min_value=2, max_value=16),
           st.integers(min_value=0, max_value=10**6))
    def test_fake_jpeg_psnr_floor(self, side, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(side, side, 3)).astype(np.uint8)
        out = codecs.jpeg_decode(codecs.jpeg_encode(img))
        assert codecs.psnr(img, out) >= 40.0

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(min_value=-1024, max_value=1023),
                    min_size=0, max_size=200))
    def test_pcm_roundtrip(self, samples):
        s = np.array(samples, dtype=np.int16)
        assert (codecs.pcm16_decode(codecs.pcm16_encode(s)) == s).all()

    @settings(max_examples=30, deadline=None)
    @given(st.integers(min_value=0, max_value=6),
           st.integers(min_value=0, max_value=10**6))
    def test_video_container_roundtrip(self, n_frames, seed):
        rng = np.random.default_rng(seed)
        frames = [
            codecs.png_encode(
                rng.integers(0, 256, size=(4, 4, 3)).astype(np.uint8)
            )
            for _ in range(n_frames)
        ]
        assert codecs.video_unpack(codecs.video_pack(frames)) == frames


class TestTextProperties:
    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
                    min_size=1, max_size=20),
           st.integers(min_value=0, max_value=10**6))
    def test_simhash_is_bag_invariant(self, tokens, seed):
        """SimHash depends only on the token BAG, never the order —
        tested on the stage's own core function."""
        from go_osm_search_ray.stages.dedup import simhash64_batch

        rng = np.random.default_rng(seed)
        shuffled = list(tokens)
        rng.shuffle(shuffled)
        both = pd.Series([tokens, shuffled])
        sigs = simhash64_batch(both)
        assert sigs[0] == sigs[1]

    @settings(max_examples=100, deadline=None)
    @given(st.text(alphabet="abcde", min_size=0, max_size=8),
           st.text(alphabet="abcde", min_size=0, max_size=8))
    def test_levenshtein_exact_within_band(self, a, b):
        """Contract of the banded scan: distances <= max_d are EXACT
        (vs a full DP reference); anything above max_d only promises
        'too far' — callers compare with <= max_d, never read the
        overflow value."""
        from go_osm_search_ray.stages.spell import levenshtein

        def full_dp(x, y):
            prev = list(range(len(y) + 1))
            for i, cx in enumerate(x, 1):
                cur = [i]
                for j, cy in enumerate(y, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (cx != cy)))
                prev = cur
            return prev[-1]

        ref = full_dp(a, b)
        d = levenshtein(a, b, max_d=3)
        if ref <= 3:
            assert d == ref
        else:
            assert d > 3
        # decision symmetry
        assert (levenshtein(b, a, max_d=3) <= 3) == (d <= 3)


class TestQuantileHistogram:
    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=-100, max_value=100),
                    min_size=1, max_size=60),
           st.floats(min_value=0.01, max_value=1.0))
    def test_matches_sorted_multiset(self, vals, q):
        """percentile_disc over the histogram == indexing the sorted
        multiset at ceil(q*n) (the definition, independent code path)."""
        from go_osm_search_ray.stages.agg import quantile_disc_from_histogram

        arr = np.sort(np.array(vals, dtype=np.int64))
        uniq, counts = np.unique(arr, return_counts=True)
        got = quantile_disc_from_histogram(uniq, counts, q)
        want = arr[int(np.ceil(q * len(arr))) - 1]
        assert got == want
