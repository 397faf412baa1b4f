"""Parity tests for the native C crop-parameter engine (native/croprep.c).

The engine replaces `prepare_example`'s numpy camera/GT chain (reference
responsibility: data_loading.load_and_transform3d, SURVEY.md §3.1) with one
C call. Contract: identical rng-driven behavior and ~1e-12-relative numerics
vs the Python engine across every code path — distortion, flip, rotation,
2D-only datasets, masks, and both inference prep paths. Goldens stay pinned
on the Python engine; these tests pin the equivalence instead.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from metro_pose3d_tpu.config import Config
from metro_pose3d_tpu.data.synthetic import make_example
from metro_pose3d_tpu.geom.camera import reproject_image_points
from metro_pose3d_tpu.geom.joints import H36M_17
from metro_pose3d_tpu.pipeline.crops import (
    _native_engine,
    prepare_example,
    prepare_inference_crop,
    prepare_inference_crop_params,
    sample_aug_params,
)

pytestmark = pytest.mark.skipif(
    _native_engine() is None, reason="native extension unavailable"
)

RTOL = 1e-6  # f32 outputs of f64 math; engines agree far tighter in f64


def assert_dicts_close(a, b, context=""):
    assert a.keys() == b.keys(), context
    for k in a:
        if k == "_crop_cam":
            continue
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        if va.dtype == np.uint8:
            np.testing.assert_array_equal(va, vb, err_msg=f"{context}:{k}")
        else:
            np.testing.assert_allclose(
                va.astype(np.float64), vb.astype(np.float64),
                rtol=RTOL, atol=RTOL, err_msg=f"{context}:{k}",
            )


def both_engines(ex, aug=None, occ=(0.5, 0.5), **kw):
    a = prepare_example(ex, H36M_17, 256, 512, aug=aug, occ_center=occ,
                        engine="python", **kw)
    b = prepare_example(ex, H36M_17, 256, 512, aug=aug, occ_center=occ,
                        engine="native", **kw)
    return a, b


class TestPrepareExampleParity:
    def test_test_time_path(self):
        ex = make_example(0, imshape=(720, 960))
        assert_dicts_close(*both_engines(ex))

    def test_augmented_draws(self):
        cfg = Config()
        rng = np.random.default_rng(11)
        ex = make_example(1, imshape=(720, 960))
        for trial in range(25):
            aug, occ = sample_aug_params(rng, cfg.aug, 50, 5)
            a, b = both_engines(ex, aug=aug, occ=occ)
            assert_dicts_close(a, b, context=f"trial{trial}")

    def test_distorted_camera(self):
        cfg = Config()
        rng = np.random.default_rng(12)
        ex = make_example(2, imshape=(720, 960))
        ex.camera.dist[:] = [-0.2, 0.05, 1e-3, -5e-4, 0.01]
        for trial in range(15):
            aug, occ = sample_aug_params(rng, cfg.aug, 50, 5)
            a, b = both_engines(ex, aug=aug, occ=occ)
            assert_dicts_close(a, b, context=f"dist-trial{trial}")

    def test_large_rotation_and_flip(self):
        cfg = Config()
        rng = np.random.default_rng(13)
        ex = make_example(3, imshape=(720, 960))
        for rot_deg in (-88.0, -45.0, 45.0, 88.0):
            aug, occ = sample_aug_params(rng, cfg.aug, 50, 5)
            aug = dataclasses.replace(
                aug, rot_rad=np.deg2rad(rot_deg), flip=True)
            a, b = both_engines(ex, aug=aug, occ=occ)
            assert_dicts_close(a, b, context=f"rot{rot_deg}")

    def test_2d_only_with_nan_and_invalid(self):
        cfg = Config()
        rng = np.random.default_rng(14)
        ex = make_example(4, imshape=(720, 960))
        pts = ex.camera.world_to_image(ex.world_coords)
        pts[3] = np.nan
        validity = np.ones(17, bool)
        validity[5] = False
        ex = dataclasses.replace(
            ex, world_coords=None, image_coords=pts, joint_validity=validity)
        for trial in range(10):
            aug, occ = sample_aug_params(rng, cfg.aug, 50, 5)
            a, b = both_engines(ex, aug=aug, occ=occ)
            assert a["is_3d"] == 0.0 and b["is_3d"] == 0.0
            assert_dicts_close(a, b, context=f"2d-trial{trial}")

    def test_nan_world_coords(self):
        ex = make_example(5, imshape=(720, 960))
        ex.world_coords[2] = np.nan
        a, b = both_engines(ex)
        assert a["joint_validity"][2] == 0.0
        assert_dicts_close(a, b)

    def test_green_screen_mask_chain(self):
        cfg = Config()
        rng = np.random.default_rng(15)
        ex = make_example(6, imshape=(720, 960))
        ex.mask = rng.random((720, 960)) > 0.4
        for trial in range(10):
            aug, occ = sample_aug_params(rng, cfg.aug, 50, 5)
            a, b = both_engines(ex, aug=aug, occ=occ, with_background=True)
            assert "source_mask" in a
            assert_dicts_close(a, b, context=f"mask-trial{trial}")

    def test_unknown_engine_rejected(self):
        ex = make_example(7, imshape=(720, 960))
        with pytest.raises(ValueError):
            prepare_example(ex, H36M_17, 256, 512, engine="cuda")


class TestInferencePrepParity:
    def test_tile_path_and_crop_cam(self):
        ex = make_example(8, imshape=(720, 960))
        ex.camera.dist[:] = [-0.1, 0.02, 1e-3, -5e-4, 0.0]
        box = np.array([300.0, 150.0, 180.0, 420.0])
        a = prepare_inference_crop(ex.image, box, ex.camera, 256, 512, 1.1,
                                   engine="python")
        b = prepare_inference_crop(ex.image, box, ex.camera, 256, 512, 1.1,
                                   engine="native")
        assert_dicts_close(a, b)
        # the reconstructed crop camera must back-project identically
        pts = np.random.default_rng(0).uniform(0, 255, (17, 2))
        ra = reproject_image_points(pts, a["_crop_cam"], ex.camera)
        rb = reproject_image_points(pts, b["_crop_cam"], ex.camera)
        np.testing.assert_allclose(ra, rb, atol=1e-6)

    def test_frame_mode_params(self):
        ex = make_example(9, imshape=(720, 960))
        box = np.array([500.0, 220.0, 150.0, 330.0])
        a = prepare_inference_crop_params(box, ex.camera, 256, 1.1,
                                          engine="python")
        b = prepare_inference_crop_params(box, ex.camera, 256, 1.1,
                                          engine="native")
        assert_dicts_close(a, b)

    def test_unknown_engine_rejected(self):
        """ADVICE r3: a typo like 'nativ' must raise, not silently behave
        as 'auto' (same contract as prepare_example)."""
        ex = make_example(9, imshape=(720, 960))
        box = np.array([500.0, 220.0, 150.0, 330.0])
        with pytest.raises(ValueError):
            prepare_inference_crop(ex.image, box, ex.camera, 256, 512,
                                   engine="nativ")
        with pytest.raises(ValueError):
            prepare_inference_crop_params(box, ex.camera, 256,
                                          engine="nativ")


class TestLoaderEngineEquivalence:
    def test_batch_iterator_engines_agree(self):
        from metro_pose3d_tpu.data.synthetic import SyntheticDataset
        from metro_pose3d_tpu.pipeline.loader import batch_iterator

        cfg = Config()
        ds = SyntheticDataset(n_train=8, n_test=2, imshape=(256, 256))
        batches = {}
        for eng in ("python", "native"):
            it = batch_iterator(
                ds.train_example, 8, ds.joint_info, 4, 128, 256,
                aug_cfg=cfg.aug, seed=3, n_workers=2, max_epochs=1,
                host_prep=eng,
            )
            batches[eng] = list(it)
        assert len(batches["python"]) == len(batches["native"]) == 2
        for bp, bn in zip(batches["python"], batches["native"]):
            assert_dicts_close(bp, bn)

    def test_process_pool_with_native_engine(self):
        """The production-host combination (data.pool_type="process" +
        data.host_prep="auto"/"native") must produce the SAME batches as the
        thread-pool python path: spawn workers build the C extension in
        their own interpreter and the (seed, epoch, idx) rng contract keeps
        draws engine- and pool-independent (VERDICT r3 next #7)."""
        from metro_pose3d_tpu.data.synthetic import SyntheticDataset
        from metro_pose3d_tpu.pipeline.loader import batch_iterator

        cfg = Config()
        ds = SyntheticDataset(n_train=8, n_test=2, imshape=(256, 256))

        def batches(pool, eng):
            return list(batch_iterator(
                ds.train_example, 8, ds.joint_info, 4, 128, 256,
                aug_cfg=cfg.aug, seed=3, n_workers=2, max_epochs=1,
                pool_type=pool, host_prep=eng,
            ))

        want = batches("thread", "python")
        got = batches("process", "native")
        assert len(got) == len(want) == 2
        for bp, bn in zip(want, got):
            assert_dicts_close(bp, bn)
