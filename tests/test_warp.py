"""Kernel tests (SURVEY.md §5.3): the on-device warp vs OpenCV on random
homographies, border policy, distortion path vs the host camera math, color
jitter and occluder compositing."""
import cv2
import pytest
import numpy as np
import jax.numpy as jnp

from metro_pose3d_tpu.geom.camera import Camera, get_warp_params, reproject_image_points
from metro_pose3d_tpu.ops.color import color_jitter, denormalize, normalize
from metro_pose3d_tpu.ops.occlusion import occlude_with_tiles, paste_rgba
from metro_pose3d_tpu.ops.warp import warp_coords, warp_images

RNG = np.random.RandomState(3)


def smooth_image(h, w, c=3):
    img = RNG.uniform(0, 255, (h // 8, w // 8, c)).astype(np.float32)
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC).clip(0, 255)


def random_crop_cameras(imshape, out_side, with_distortion=False):
    src = Camera.from_fov(60.0, imshape)
    if with_distortion:
        src.dist[:] = [-0.15, 0.03, 1e-3, -1e-3, 0.0]
    dst = src.copy()
    dst.undistort()
    target = src.image_to_world(
        np.array([imshape[1] * RNG.uniform(0.3, 0.7), imshape[0] * RNG.uniform(0.3, 0.7)]),
        camera_depth=1000.0,
    )
    dst.turn_towards(target)
    dst.square_pixels()
    dst.rotate(np.deg2rad(RNG.uniform(-25, 25)))
    dst.zoom(RNG.uniform(1.2, 2.2) * out_side / max(imshape))
    dst.center_principal_point((out_side, out_side))
    return src, dst


class TestWarpVsOpenCV:
    def test_pure_homography_matches_cv2(self):
        out_side = 128
        imshape = (240, 320)
        img = smooth_image(*imshape)
        for _ in range(3):
            src_cam, dst_cam = random_crop_cameras(imshape, out_side)
            params = get_warp_params(src_cam, dst_cam, dtype=np.float64)
            # full dst->src pixel homography (no distortion): K_src @ H
            k = np.array(
                [
                    [params["K"][0], 0, params["K"][2]],
                    [0, params["K"][1], params["K"][3]],
                    [0, 0, 1],
                ]
            )
            m_full = k @ params["H"]
            expected = cv2.warpPerspective(
                img, m_full, (out_side, out_side),
                flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                borderMode=cv2.BORDER_CONSTANT, borderValue=0,
            )
            got = np.asarray(
                warp_images(
                    jnp.asarray(img[None]),
                    jnp.asarray(params["H"][None].astype(np.float32)),
                    jnp.asarray(params["K"][None].astype(np.float32)),
                    jnp.asarray(params["dist"][None].astype(np.float32)),
                    out_side,
                )
            )[0]
            # cv2 uses 5-bit fixed-point interpolation -> tolerance ~1/32 of
            # the value range plus coordinate rounding at edges.
            err = np.abs(got - expected)
            assert np.percentile(err, 99) < 3.0, np.percentile(err, 99)
            assert err.mean() < 1.0

    def test_distorted_coords_match_host_camera(self):
        out_side = 64
        imshape = (240, 320)
        src_cam, dst_cam = random_crop_cameras(imshape, out_side, with_distortion=True)
        params = get_warp_params(src_cam, dst_cam, dtype=np.float64)
        coords, in_front = warp_coords(
            jnp.asarray(params["H"].astype(np.float32)),
            jnp.asarray(params["K"].astype(np.float32)),
            jnp.asarray(params["dist"].astype(np.float32)),
            (out_side, out_side),
        )
        gy, gx = np.meshgrid(np.arange(out_side), np.arange(out_side), indexing="ij")
        dst_px = np.stack([gx, gy], -1).reshape(-1, 2).astype(np.float64)
        expected = reproject_image_points(dst_px, dst_cam, src_cam).reshape(out_side, out_side, 2)
        np.testing.assert_allclose(np.asarray(coords), expected, atol=0.01)
        assert bool(np.all(np.asarray(in_front)))

    def test_border_is_zero(self):
        img = np.full((64, 64, 3), 200.0, np.float32)
        # identity warp shifted far outside the source
        h = np.eye(3, dtype=np.float32)
        h[0, 2] = 1000.0
        k = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
        out = np.asarray(
            warp_images(jnp.asarray(img[None]), jnp.asarray(h[None]),
                        jnp.asarray(k[None]), jnp.zeros((1, 5), jnp.float32), 32)
        )
        assert np.all(out == 0.0)

    def test_identity_warp_preserves_image(self):
        img = smooth_image(64, 64)
        h = np.eye(3, dtype=np.float32)
        k = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
        out = np.asarray(
            warp_images(jnp.asarray(img[None]), jnp.asarray(h[None]),
                        jnp.asarray(k[None]), jnp.zeros((1, 5), jnp.float32), 64)
        )[0]
        np.testing.assert_allclose(out, img, atol=1e-2)

    def test_uint8_input(self):
        img = smooth_image(64, 64).astype(np.uint8)
        h = np.eye(3, dtype=np.float32)
        k = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
        out = np.asarray(
            warp_images(jnp.asarray(img[None]), jnp.asarray(h[None]),
                        jnp.asarray(k[None]), jnp.zeros((1, 5), jnp.float32), 64)
        )[0]
        np.testing.assert_allclose(out, img.astype(np.float32), atol=1e-3)


class TestColor:
    def test_identity_jitter(self):
        imgs = jnp.asarray(RNG.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
        out = color_jitter(
            imgs, jnp.zeros(2), jnp.ones(2), jnp.ones(2), jnp.zeros(2)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-5)

    def test_brightness_shift(self):
        imgs = jnp.full((1, 4, 4, 3), 0.4, jnp.float32)
        out = color_jitter(imgs, jnp.asarray([0.2]), jnp.ones(1), jnp.ones(1), jnp.zeros(1))
        np.testing.assert_allclose(np.asarray(out), 0.6, atol=1e-6)

    def test_saturation_zero_is_grayscale(self):
        imgs = jnp.asarray(RNG.uniform(0, 1, (1, 4, 4, 3)).astype(np.float32))
        out = np.asarray(
            color_jitter(imgs, jnp.zeros(1), jnp.ones(1), jnp.zeros(1), jnp.zeros(1))
        )
        assert np.abs(out - out.mean(-1, keepdims=True)).max() < 1e-5

    def test_hue_preserves_luma(self):
        # near-gray inputs keep the rotated color inside [0,1] (no clipping,
        # which is the only thing that can change luma)
        imgs = jnp.asarray(RNG.uniform(0.45, 0.55, (1, 8, 8, 3)).astype(np.float32))
        out = np.asarray(
            color_jitter(imgs, jnp.zeros(1), jnp.ones(1), jnp.ones(1), jnp.asarray([1.0]))
        )
        luma = np.array([0.299, 0.587, 0.114])
        np.testing.assert_allclose(out @ luma, np.asarray(imgs) @ luma, atol=1e-4)

    def test_normalize_roundtrip(self):
        imgs = jnp.asarray(RNG.uniform(0, 1, (4,)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(denormalize(normalize(imgs))), np.asarray(imgs), atol=1e-6)
        np.testing.assert_allclose(np.asarray(normalize(jnp.asarray([0.5]))), [0.0], atol=1e-6)


class TestOcclusion:
    def test_opaque_paste_replaces(self):
        crops = jnp.zeros((1, 8, 8, 3), jnp.float32)
        rgba = jnp.concatenate(
            [jnp.full((1, 8, 8, 3), 0.7), jnp.ones((1, 8, 8, 1))], -1
        )
        out = np.asarray(paste_rgba(crops, rgba))
        np.testing.assert_allclose(out, 0.7, atol=1e-6)

    def test_transparent_paste_noop(self):
        crops = jnp.asarray(RNG.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
        rgba = jnp.zeros((1, 8, 8, 4), jnp.float32)
        np.testing.assert_allclose(np.asarray(paste_rgba(crops, rgba)), np.asarray(crops))

    def test_occlude_with_tiles_gated(self):
        crops = jnp.asarray(RNG.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
        tiles = jnp.concatenate(
            [jnp.full((2, 8, 8, 3), 0.9), jnp.ones((2, 8, 8, 1))], -1
        )
        # identity placement: crop px -> tile px (top-left 8x8 covered)
        aff = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])[None], (2, 1, 1))
        out = np.asarray(
            occlude_with_tiles(crops, tiles, aff, jnp.asarray([1.0, 0.0]))
        )
        # crop 0: occluded in the top-left (interior away from tile border)
        np.testing.assert_allclose(out[0, :6, :6], 0.9, atol=1e-5)
        # crop 1: gate off -> unchanged
        np.testing.assert_allclose(out[1], np.asarray(crops)[1], atol=1e-6)


class TestPackedWarpEquivalence:
    """The packed/windowed uint8 gather path must reproduce the reference
    warp formulation exactly (same taps, same weights, same border policy),
    including crops that run off every tile border."""

    def _params(self, rng, b, t, extreme=False):
        hs = []
        ks = []
        ds = []
        for i in range(b):
            ang = rng.uniform(-0.7, 0.7)
            c, s = np.cos(ang), np.sin(ang)
            scale = rng.uniform(0.3, 3.0)
            # H maps output pixel -> source ray; keep z row near identity
            h = np.array([
                [c / scale, -s / scale, rng.uniform(-0.3, 0.3)],
                [s / scale, c / scale, rng.uniform(-0.3, 0.3)],
                [rng.uniform(-4e-4, 4e-4), rng.uniform(-4e-4, 4e-4), 1.0],
            ])
            if extreme:
                h[:2, 2] += rng.uniform(-2.0, 2.0, 2)  # push far off-tile
            hs.append(h)
            f = rng.uniform(0.4, 2.5)
            ks.append([f * t / 4, f * t / 4, t / 2 + rng.uniform(-t, t) * (2 if extreme else 0.4),
                       t / 2 + rng.uniform(-t, t) * (2 if extreme else 0.4)])
            ds.append(rng.uniform(-0.2, 0.2, 5) if i % 2 else np.zeros(5))
        return (jnp.asarray(np.array(hs), jnp.float32),
                jnp.asarray(np.array(ks), jnp.float32),
                jnp.asarray(np.array(ds), jnp.float32))

    @pytest.mark.parametrize("extreme", [False, True])
    def test_matches_reference(self, extreme):
        from metro_pose3d_tpu.ops.warp import (
            _warp_images_packed, warp_images, warp_images_reference,
        )

        rng = np.random.default_rng(11 + extreme)
        b, t, s = 4, 64, 32
        src = jnp.asarray(rng.integers(0, 256, (b, t, t, 3)), jnp.uint8)
        h, k, d = self._params(rng, b, t, extreme)
        ref = np.asarray(warp_images_reference(src, h, k, d, s))
        fast = np.asarray(_warp_images_packed(src, h, k, d, s))
        np.testing.assert_allclose(fast, ref, atol=1e-3)
        # the public entry point dispatches uint8 to the packed path
        pub = np.asarray(warp_images(src, h, k, d, s))
        np.testing.assert_allclose(pub, ref, atol=1e-3)

    def test_float_sources_use_reference_path(self):
        from metro_pose3d_tpu.ops.warp import warp_images, warp_images_reference

        rng = np.random.default_rng(3)
        b, t, s = 2, 32, 16
        src = jnp.asarray(rng.normal(0, 1, (b, t, t, 3)), jnp.float32)
        h, k, d = self._params(rng, b, t)
        np.testing.assert_allclose(
            np.asarray(warp_images(src, h, k, d, s)),
            np.asarray(warp_images_reference(src, h, k, d, s)),
            atol=1e-5,
        )


class TestPackedOcclusionEquivalence:
    def test_matches_reference_compositing(self):
        import jax
        from metro_pose3d_tpu.ops.occlusion import (
            occlude_with_bank, occlude_with_tiles, pack_occluder_bank,
        )
        from metro_pose3d_tpu.pipeline.occluders import make_procedural_occluders

        rng = np.random.default_rng(5)
        b, s, t = 6, 32, 48
        crops = jnp.asarray(rng.uniform(0, 1, (b, s, s, 3)), jnp.float32)
        bank = jnp.asarray(make_procedural_occluders(4, t), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 4, b), jnp.int32)
        # random placements incl. partially/fully off-tile
        affs = []
        for i in range(b):
            ang = rng.uniform(-3, 3)
            sc = rng.uniform(0.5, 3.0)
            c, sn = np.cos(ang) * sc, np.sin(ang) * sc
            affs.append([[c, -sn, rng.uniform(-30, 60)],
                         [sn, c, rng.uniform(-30, 60)]])
        affs = jnp.asarray(np.array(affs), jnp.float32)
        enabled = jnp.asarray([1, 1, 0, 1, 1, 1], jnp.float32)

        tiles = jnp.take(bank, idx, axis=0)
        ref = np.asarray(occlude_with_tiles(crops, tiles, affs, enabled))
        table = pack_occluder_bank(bank)
        fast = np.asarray(occlude_with_bank(crops, table, t, idx, affs, enabled))
        # 8-bit quantization of the bank bounds the difference by ~1/255
        # per channel times alpha weighting
        np.testing.assert_allclose(fast, ref, atol=3.0 / 255.0)
        # disabled crop untouched
        np.testing.assert_array_equal(fast[2], np.asarray(crops[2]))
