"""Host image runtime: native C extension vs cv2/numpy references.

The native module (native/jpegdec.c) is the rebuild's equivalent of the
reference's libjpeg-turbo + OpenCV host path; these tests pin decode parity
(same libjpeg -> bit-identical), threaded batch behavior, error paths, and
tile-extraction equivalence with the pure-numpy fallback.
"""
import numpy as np
import pytest

from metro_pose3d_tpu.utils import improc

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def jpeg_bytes():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (240, 320, 3)).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 92])
    assert ok
    return enc.tobytes()


class TestDecode:
    def test_matches_cv2(self, jpeg_bytes):
        a = improc.decode_jpeg_bytes(jpeg_bytes)
        b = cv2.imdecode(np.frombuffer(jpeg_bytes, np.uint8), cv2.IMREAD_COLOR)[..., ::-1]
        assert a.shape == b.shape == (240, 320, 3)
        if improc.have_native():
            # same libjpeg underneath -> bit-identical
            np.testing.assert_array_equal(a, b)

    def test_batch(self, jpeg_bytes):
        outs = improc.decode_jpeg_batch([jpeg_bytes] * 9, threads=3)
        assert len(outs) == 9
        for o in outs:
            np.testing.assert_array_equal(o, outs[0])

    def test_corrupt_raises(self):
        with pytest.raises(ValueError):
            improc.decode_jpeg_bytes(b"definitely not a jpeg")

    def test_empty_batch(self):
        assert improc.decode_jpeg_batch([]) == []

    def test_imread_roundtrip(self, tmp_path, jpeg_bytes):
        p = tmp_path / "x.jpg"
        p.write_bytes(jpeg_bytes)
        img = improc.imread(str(p))
        assert img.shape == (240, 320, 3)
        with pytest.raises((FileNotFoundError, ValueError)):
            improc.imread(str(tmp_path / "missing.jpg"))


class TestExtractTile:
    @pytest.mark.parametrize("factor", [1, 2, 3])
    def test_native_matches_numpy(self, factor):
        if not improc.have_native():
            pytest.skip("native module unavailable")
        rng = np.random.default_rng(factor)
        img = rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
        args = (img, 11, 23, 290, 190, factor, 96)
        nat = improc.extract_tile_native(*args)
        saved = improc._native
        improc._native = None
        try:
            ref = improc.extract_tile_native(*args)
        finally:
            improc._native = saved
        np.testing.assert_array_equal(nat, ref)

    def test_zero_pad_and_bounds(self):
        img = np.full((50, 60, 3), 200, np.uint8)
        tile = improc.extract_tile_native(img, 0, 0, 60, 50, 1, 128)
        assert tile.shape == (128, 128, 3)
        assert np.all(tile[:50, :60] == 200)
        assert np.all(tile[50:] == 0) and np.all(tile[:, 60:] == 0)

    @pytest.mark.parametrize(
        "roi",
        [
            (56, 46, 60, 50),   # 4x4 ROI touching the bottom-right corner
            (0, 47, 60, 50),    # 3-row strip on the bottom edge (y-partial)
            (58, 0, 60, 50),    # 2-col strip on the right edge (x-partial)
            (59, 49, 60, 50),   # single pixel in the corner
            (10, 44, 58, 50),   # y-partial but x covers full blocks
        ],
    )
    @pytest.mark.parametrize("factor", [6, 20])  # 3-pass and naive C paths
    def test_thin_edge_roi_partial_blocks(self, roi, factor):
        """ADVICE r3 (medium): a clamped ROI dimension smaller than `factor`
        used to make the C decimation read past y1/x1 — and past the image
        buffer on edge-touching ROIs. Both engines must now average only the
        pixels inside the ROI and agree exactly."""
        rng = np.random.default_rng(factor)
        img = rng.integers(0, 255, (50, 60, 3)).astype(np.uint8)
        x0, y0, x1, y1 = roi
        args = (img, x0, y0, x1, y1, factor, 16)
        ref = self._numpy_tile(*args)
        # partial-block semantics: one output row/col averaging the ROI
        by = min(factor, y1 - y0)
        bx = min(factor, x1 - x0)
        blk = img[y0:y0 + by, x0:x0 + bx].astype(np.uint32)
        want = (blk.sum((0, 1)) + by * bx // 2) // (by * bx)
        np.testing.assert_array_equal(ref[0, 0], want.astype(np.uint8))
        if improc.have_native():
            np.testing.assert_array_equal(improc.extract_tile_native(*args), ref)

    def test_thin_edge_roi_gray_mask(self):
        """Same contract for single-channel mask tiles (the 3DHP green-screen
        path feeds masks through the native extractor)."""
        rng = np.random.default_rng(7)
        img = rng.integers(0, 255, (50, 60)).astype(np.uint8)
        args = (img, 57, 47, 60, 50, 8, 16)
        ref = self._numpy_tile(*args)
        assert ref.shape == (16, 16)
        if improc.have_native():
            np.testing.assert_array_equal(improc.extract_tile_native(*args), ref)

    @staticmethod
    def _numpy_tile(*args):
        saved = improc._native
        improc._native = None
        try:
            return improc.extract_tile_native(*args)
        finally:
            improc._native = saved


class TestPasteOver:
    def test_alpha_composite_and_clipping(self):
        dst = np.zeros((40, 40, 3), np.uint8)
        src = np.zeros((10, 10, 4), np.uint8)
        src[..., 0] = 255  # red
        src[..., 3] = 255  # opaque
        out = improc.paste_over(src, dst, (5, 5))  # partially off-canvas OK
        assert out[5, 5, 0] == 255 and out[5, 5, 1] == 0
        assert np.all(dst == 0)  # original untouched
        out2 = improc.paste_over(src, dst, (-100, -100))  # fully off-canvas
        np.testing.assert_array_equal(out2, dst)

    def test_half_alpha(self):
        dst = np.full((20, 20, 3), 100, np.uint8)
        src = np.zeros((4, 4, 4), np.uint8)
        src[..., 2] = 200
        src[..., 3] = 128
        out = improc.paste_over(src, dst, (10, 10))
        px = out[10, 10]
        assert 140 <= px[2] <= 160 and 45 <= px[0] <= 55


class TestResize:
    def test_shrink_and_grow(self):
        img = np.zeros((64, 48, 3), np.uint8)
        small = improc.resize_by_factor(img, 0.5)
        assert small.shape == (32, 24, 3)
        big = improc.resize_by_factor(img, 2.0)
        assert big.shape == (128, 96, 3)


class TestWhiteBalance:
    def test_gray_world_correction(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 120, (64, 64, 3)).astype(np.uint8)
        img[..., 2] = np.minimum(img[..., 2].astype(int) * 2, 255)  # blue cast
        out = improc.white_balance(img)
        means = out.reshape(-1, 3).mean(0)
        assert means.std() < img.reshape(-1, 3).mean(0).std()
        half = improc.white_balance(img, strength=0.5)
        h_std = half.reshape(-1, 3).mean(0).std()
        assert means.std() <= h_std <= img.reshape(-1, 3).mean(0).std() + 1e-6

    def test_identity_on_gray(self):
        img = np.full((8, 8, 3), 128, np.uint8)
        np.testing.assert_array_equal(improc.white_balance(img), img)


class TestFrameCache:
    """Decoded-frame LRU (utils/improc.imread_cached) — the host-feed
    lever from BASELINE.md: cold decode ~64 frames/s/core, so frame reuse
    across crops/epochs must come from cache hits, bounded in bytes."""

    def _write_jpegs(self, tmp_path, n, side=64):
        import cv2

        paths = []
        rng = np.random.RandomState(0)
        for i in range(n):
            p = str(tmp_path / f"f{i}.jpg")
            cv2.imwrite(p, rng.randint(0, 255, (side, side, 3), np.uint8))
            paths.append(p)
        return paths

    def test_hit_returns_same_object_and_counts(self, tmp_path):
        from metro_pose3d_tpu.utils.improc import _FrameCache

        cache = _FrameCache(budget_mb=64)
        [p] = self._write_jpegs(tmp_path, 1)
        a = cache.get(p)
        b = cache.get(p)
        assert a is b  # no re-decode, no copy
        assert cache.hits == 1 and cache.misses == 1

    def test_lru_eviction_under_budget(self, tmp_path):
        from metro_pose3d_tpu.utils.improc import _FrameCache

        # each 64x64 frame is 12 KiB decoded; budget of 1 MB holds ~85
        cache = _FrameCache(budget_mb=1)
        paths = self._write_jpegs(tmp_path, 100)
        for p in paths:
            cache.get(p)
        assert cache._bytes <= 1 << 20
        # oldest entries evicted, newest retained
        assert paths[-1] in cache._entries
        assert paths[0] not in cache._entries

    def test_cached_frames_are_read_only(self, tmp_path):
        """ADVICE r2: downstream code aliases cached frames (e.g. via
        np.ascontiguousarray, which returns the SAME object), so an
        accidental in-place edit must raise instead of corrupting the
        cache for every later crop of that frame."""
        import pytest

        from metro_pose3d_tpu.utils.improc import _FrameCache

        cache = _FrameCache(budget_mb=64)
        [p] = self._write_jpegs(tmp_path, 1)
        img = cache.get(p)
        with pytest.raises(ValueError):
            img[0, 0, 0] = 0
        alias = np.ascontiguousarray(img)
        if alias is img:  # aliasing case the guard exists for
            with pytest.raises(ValueError):
                alias[:] = 0

    def test_threaded_access_consistent(self, tmp_path):
        from concurrent.futures import ThreadPoolExecutor

        from metro_pose3d_tpu.utils.improc import _FrameCache, imread

        cache = _FrameCache(budget_mb=64)
        paths = self._write_jpegs(tmp_path, 8)
        with ThreadPoolExecutor(8) as pool:
            outs = list(pool.map(cache.get, paths * 8))
        for p, want in zip(paths, [imread(p) for p in paths]):
            got = cache.get(p)
            np.testing.assert_array_equal(got, want)
        assert len(outs) == 64
