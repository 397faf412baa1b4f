"""Multi-person end-to-end subsystem (BASELINE config 5).

Covers: inference-crop geometry (rot_to_orig exactness), the bucketed
estimator driver, the 3DPW sequence parser (against a fabricated release
layout), and the offline 3DPW scorer.
"""
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metro_pose3d_tpu.config import Config, apply_overrides
from metro_pose3d_tpu.data.synthetic import make_multiperson_frame
from metro_pose3d_tpu.geom.camera import Camera
from metro_pose3d_tpu.geom.joints import H36M_17, SMPL_24, SMPL_EVAL_14_INDICES
from metro_pose3d_tpu.pipeline.crops import prepare_inference_crop


def tiny_cfg():
    return apply_overrides(
        Config(),
        {
            "model.backbone": "tiny",
            "model.proc_side": "64",
            "model.depth": "4",
            "model.compute_dtype": "float32",
            "data.source_side": "128",
        },
    )


class TestCropGeometry:
    def test_rot_to_orig_maps_crop_frame_to_orig_frame(self):
        image, boxes, cam, worlds = make_multiperson_frame(3, seed=1)
        for box, world in zip(boxes, worlds):
            prep = prepare_inference_crop(image, box, cam, 64, 128)
            crop_cam = prep["_crop_cam"]
            p_crop = crop_cam.world_to_camera(world)
            p_orig = cam.world_to_camera(world)
            np.testing.assert_allclose(
                p_crop @ prep["rot_to_orig"].T, p_orig, atol=1e-3
            )

    def test_crop_cameras_share_optical_center(self):
        image, boxes, cam, _ = make_multiperson_frame(2, seed=2)
        prep = prepare_inference_crop(image, boxes[0], cam, 64, 128)
        np.testing.assert_allclose(prep["_crop_cam"].t, cam.t, atol=1e-9)


@pytest.fixture(scope="module")
def estimator():
    from metro_pose3d_tpu.models.metro import MetroModel
    from metro_pose3d_tpu.multiperson import MultiPersonEstimator

    cfg = tiny_cfg()
    model = MetroModel(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3), jnp.float32),
        train=False,
    )
    return MultiPersonEstimator(cfg, variables, H36M_17, buckets=(1, 2, 4, 8))


class TestEstimator:
    def test_shapes_and_finiteness(self, estimator):
        image, boxes, cam, _ = make_multiperson_frame(3, seed=3)
        out = estimator.estimate_frame(image, boxes, cam)
        assert out["pose3d_abs"].shape == (3, 17, 3)
        assert out["pose3d_rootrel"].shape == (3, 17, 3)
        assert out["pose2d_px"].shape == (3, 17, 2)
        for v in out.values():
            assert np.all(np.isfinite(v))

    def test_bucket_padding_does_not_leak(self, estimator):
        """Result for person i must not depend on how the batch was padded."""
        image, boxes, cam, _ = make_multiperson_frame(3, seed=4)
        out3 = estimator.estimate_frame(image, boxes, cam)  # bucket 4
        out1 = estimator.estimate_frame(image, boxes[:1], cam)  # bucket 1
        # tolerance in mm: the absolute-reconstruction LSQ amplifies batch-
        # size-dependent float reduction order by ~1e-2 mm (micrometers)
        np.testing.assert_allclose(
            out3["pose3d_abs"][0], out1["pose3d_abs"][0], atol=0.05
        )

    def test_default_camera_and_empty_boxes(self, estimator):
        image, boxes, _, _ = make_multiperson_frame(1, seed=5)
        out = estimator.estimate_frame(image, boxes)  # no camera given
        assert out["pose3d_abs"].shape == (1, 17, 3)
        empty = estimator.estimate_frame(image, np.zeros((0, 4)))
        assert empty["pose3d_abs"].shape == (0, 17, 3)

    def test_chunking_beyond_largest_bucket(self, estimator):
        image, boxes, cam, _ = make_multiperson_frame(3, seed=6)
        many = np.concatenate([boxes] * 4)  # 12 > max bucket 8
        out = estimator.estimate_frame(image, many, cam)
        assert out["pose3d_abs"].shape == (12, 17, 3)
        # duplicated boxes give identical predictions (same bucket shape)
        np.testing.assert_allclose(
            out["pose3d_abs"][:3], out["pose3d_abs"][3:6], atol=0.05
        )

    def test_warmup_precompiles_buckets(self, estimator):
        """warmup(n) must build every bucket graph <= bucket(n) so serving
        streams never compile mid-video; results afterwards are unchanged."""
        image, boxes, cam, _ = make_multiperson_frame(3, seed=21)
        built = estimator.warmup(3, imshape=image.shape[:2], camera=cam)
        assert built == len([b for b in estimator.buckets if b <= 4])
        out = estimator.estimate_frame(image, boxes, cam)
        assert out["pose3d_abs"].shape == (3, 17, 3)
        assert np.isfinite(out["pose3d_abs"]).all()

    def test_estimate_stream_equals_per_frame(self, estimator):
        """The pipelined stream must yield EXACTLY what per-frame calls
        produce, in order — including the flush paths for empty-box frames
        and frames that exceed the largest bucket."""
        frames = []
        for seed in (11, 12, 13, 14):
            image, boxes, cam, _ = make_multiperson_frame(3, seed=seed)
            frames.append((image, boxes, cam))
        # edge frames: no boxes, more boxes than the max bucket (8), and a
        # 2-tuple without a camera (defaults like estimate_frame)
        img0 = frames[0][0]
        frames.insert(2, (img0, np.zeros((0, 4)), frames[0][2]))
        many = np.concatenate([frames[1][1]] * 4)  # 12 > 8
        frames.append((frames[1][0], many, frames[1][2]))
        frames.append((frames[0][0], frames[0][1]))

        ref = [estimator.estimate_frame(*f) for f in frames]
        for depth in (1, 2, 3):
            got = list(estimator.estimate_stream(iter(frames), depth=depth))
            assert len(got) == len(ref)
            for r, g in zip(ref, got):
                assert r.keys() == g.keys()
                for k in r:
                    np.testing.assert_array_equal(r[k], g[k], err_msg=k)

    def test_absolute_poses_in_shared_frame(self, estimator):
        """People placed left/right of the camera axis must decode to
        absolute positions on those sides (sign of x in the shared frame):
        the model is untrained, but reconstruction anchors to the 2D head,
        whose soft-argmax stays within the crop; the crop cameras look at
        the boxes, so the rotated-back positions must follow the boxes."""
        image, boxes, cam, worlds = make_multiperson_frame(2, seed=7)
        out = estimator.estimate_frame(image, boxes, cam)
        gt_x = np.array([cam.world_to_camera(w)[0, 0] for w in worlds])
        pred_x = out["pose3d_abs"][:, :, 0].mean(-1)
        assert np.all(np.sign(pred_x) == np.sign(gt_x))


class TestTdpwParser:
    @pytest.fixture()
    def fake_3dpw(self, tmp_path):
        import cv2

        root = tmp_path
        seq_dir = root / "3dpw" / "sequenceFiles" / "test"
        img_dir = root / "3dpw" / "imageFiles" / "fakeSeq_00"
        seq_dir.mkdir(parents=True)
        img_dir.mkdir(parents=True)

        rng = np.random.default_rng(0)
        n_frames, n_actors = 4, 2
        # Upright people ~3-4 m in front of a camera at the world origin.
        # Identity extrinsics -> world frame == camera frame (CV convention,
        # y DOWN), so an upright person has head_y < pelvis_y in world. This
        # gives the parser's skeleton-derived world_up something real to
        # recover (an isotropic cloud cannot catch an orientation bug).
        # SMPL_24 order: pelv lhip rhip spi1 lkne rkne spi2 lank rank spi3
        #               lfoo rfoo neck lcla rcla head lsho rsho lelb relb
        #               lwri rwri lhan rhan
        up_offsets = np.array(  # meters above (+) / below (-) the pelvis
            [0.0, -0.05, -0.05, 0.15, -0.45, -0.45, 0.3, -0.85, -0.85, 0.45,
             -0.9, -0.9, 0.55, 0.5, 0.5, 0.7, 0.5, 0.5, 0.25, 0.25,
             0.0, 0.0, -0.05, -0.05])
        x_offsets = np.array(
            [0.0, 0.1, -0.1, 0.0, 0.1, -0.1, 0.0, 0.1, -0.1, 0.0,
             0.12, -0.12, 0.0, 0.08, -0.08, 0.0, 0.2, -0.2, 0.3, -0.3,
             0.35, -0.35, 0.38, -0.38])
        skel = np.stack([x_offsets, -up_offsets, np.zeros(24)], axis=-1)
        joints = []
        for a in range(n_actors):
            base = np.array([(a - 0.5) * 1.2, 0.0, 3.5])
            jp = base + skel + rng.normal(0, 0.03, (n_frames, 24, 3))
            joints.append(jp.reshape(n_frames, 72))
        cam_poses = np.tile(np.eye(4), (n_frames, 1, 1))
        intr = np.array([[800.0, 0, 400], [0, 800.0, 300], [0, 0, 1]])
        seq = {
            "sequence": "fakeSeq_00",
            "jointPositions": joints,
            "campose_valid": [np.ones(n_frames), np.array([1, 1, 0, 1])],
            "cam_poses": cam_poses,
            "cam_intrinsics": intr,
        }
        with open(seq_dir / "fakeSeq_00.pkl", "wb") as f:
            pickle.dump(seq, f, protocol=2)
        for fidx in range(n_frames):
            cv2.imwrite(
                str(img_dir / f"image_{fidx:05d}.jpg"),
                rng.integers(0, 255, (600, 800, 3)).astype(np.uint8),
            )
        return str(root)

    def test_parse_and_frame_access(self, fake_3dpw):
        from metro_pose3d_tpu.data.tdpw import Tdpw3Dataset

        ds = Tdpw3Dataset(fake_3dpw)
        assert ds.n_test_frames == 4
        # frame 2 has only actor 0 valid
        assert ds.n_test == 4 * 2 - 1
        img, boxes, cam, world, seq = ds.test_frame(0)
        assert img.shape == (600, 800, 3)
        assert boxes.shape == (2, 4)
        assert world.shape == (2, 24, 3)
        assert seq == "fakeSeq_00"
        # meters were converted to mm and people project inside the image
        assert 2000 < np.mean(np.linalg.norm(cam.world_to_camera(world[0]), axis=-1)) < 6000
        px = cam.world_to_image(world[0])
        assert np.all(px >= -200) and np.all(px[:, 0] < 1000)

    def test_crop_orientation(self, fake_3dpw):
        """Virtual crop cameras must keep people upright: the parser-derived
        world_up has to put the head ABOVE the pelvis in crop pixels (a
        sign-flipped up vector rolls every crop 180 deg — ADVICE r1)."""
        from metro_pose3d_tpu.data.tdpw import Tdpw3Dataset
        from metro_pose3d_tpu.pipeline.crops import prepare_example

        ds = Tdpw3Dataset(fake_3dpw)
        head = SMPL_24.index_of("head")
        pelv = SMPL_24.index_of("pelv")
        for i in range(ds.n_test):
            ex = ds.test_example(i)
            out = prepare_example(ex, SMPL_24, proc_side=64, tile_side=128)
            c2d = out["coords2d_true"]
            # pixel y grows downward: upright means head_y < pelvis_y
            assert c2d[head, 1] < c2d[pelv, 1] - 5.0

    def test_person_protocol(self, fake_3dpw):
        from metro_pose3d_tpu.data.tdpw import Tdpw3Dataset

        ds = Tdpw3Dataset(fake_3dpw)
        ex = ds.test_example(0)
        assert ex.world_coords.shape == (24, 3)
        assert ex.image.shape == (600, 800, 3)
        assert ds.joint_info is SMPL_24


class TestJointCountGuard:
    def test_model_dataset_skeleton_mismatch_fails_loud(self):
        """Found by the config-5 chip CLI rehearsal: the default 17-joint
        model on 3DPW's SMPL-24 skeleton crashed with an opaque broadcast
        error deep inside the flip-TTA average. Both predict entry points
        must reject the mismatch up front with an actionable message."""
        import pytest

        from metro_pose3d_tpu.config import Config
        from metro_pose3d_tpu.evaluation.predict import (
            predict_dataset, predict_multiperson_dataset,
        )

        class _Ds:
            joint_info = SMPL_24
            root_joint = "pelv"
            n_test = 4
            n_test_frames = 1

        cfg = Config()  # model.num_joints=17 vs SMPL-24
        with pytest.raises(ValueError, match="num_joints=24"):
            predict_multiperson_dataset(cfg, None, _Ds())
        with pytest.raises(ValueError, match="num_joints=24"):
            predict_dataset(cfg, None, _Ds())


class TestEval3dpw:
    def test_scorer(self, tmp_path):
        from metro_pose3d_tpu.evaluation.eval_3dpw import evaluate_3dpw

        rng = np.random.default_rng(0)
        n = 40
        gt = rng.normal(0, 300, (n, 24, 3)).astype(np.float32)
        offset = rng.normal(0, 10, (n, 24, 3))
        pred = gt + offset
        seq = np.array(["seqA"] * 25 + ["seqB"] * 15)
        path = tmp_path / "preds.npz"
        np.savez(path, pose3d=pred, gt3d=gt, seq=seq,
                 pose3d_abs=pred + 50, gt3d_abs=gt.astype(np.float32) + 50)
        res = evaluate_3dpw(str(path))
        expected = float(np.linalg.norm(offset, axis=-1).mean())
        assert abs(res["mpjpe"] - expected) < 1e-3
        assert res["pa_mpjpe"] <= res["mpjpe"] + 1e-6
        assert set(res["per_sequence_mpjpe"]) == {"seqA", "seqB"}
        assert abs(res["abs_mpjpe"] - expected) < 1e-3
        res14 = evaluate_3dpw(str(path), joints14=True)
        assert res14["n_instances"] == n
        assert len(SMPL_EVAL_14_INDICES) == 14


class TestSmplJointInfo:
    def test_mirror_mapping_swaps_sides(self):
        m = SMPL_24.mirror_mapping
        assert m[SMPL_24.index_of("lwri")] == SMPL_24.index_of("rwri")
        assert m[SMPL_24.index_of("rkne")] == SMPL_24.index_of("lkne")
        assert m[SMPL_24.index_of("pelv")] == SMPL_24.index_of("pelv")
        assert np.array_equal(m[m], np.arange(24))


class TestFrameMode:
    def test_frame_mode_matches_tile_mode(self):
        """Frame-mode warps the shared original frame; with undecimated
        tiles (factor 1) the two paths sample identical pixels."""
        from metro_pose3d_tpu.models.metro import MetroModel
        from metro_pose3d_tpu.multiperson import MultiPersonEstimator

        # source_side must cover the whole ROI so the tile path runs at
        # factor 1 (no area decimation) — otherwise frame mode legitimately
        # differs (it always samples the full-resolution frame)
        cfg = apply_overrides(tiny_cfg(), {"data.source_side": "512"})
        model = MetroModel(cfg.model)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3),
                      jnp.float32), train=False)
        image, boxes, cam, _ = make_multiperson_frame(2, seed=9)
        est_frame = MultiPersonEstimator(cfg, variables, H36M_17,
                                         buckets=(4,), frame_mode=True)
        est_tiles = MultiPersonEstimator(cfg, variables, H36M_17,
                                         buckets=(4,), frame_mode=False)
        a = est_frame.estimate_frame(image, boxes, cam)
        b = est_tiles.estimate_frame(image, boxes, cam)
        np.testing.assert_allclose(
            a["pose3d_rootrel"], b["pose3d_rootrel"], atol=0.5)  # mm
        np.testing.assert_allclose(a["pose2d_px"], b["pose2d_px"], atol=0.1)

    def test_odd_width_frame(self):
        from metro_pose3d_tpu.models.metro import MetroModel
        from metro_pose3d_tpu.multiperson import MultiPersonEstimator

        cfg = tiny_cfg()
        model = MetroModel(cfg.model)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3),
                      jnp.float32), train=False)
        image, boxes, cam, _ = make_multiperson_frame(1, seed=10,
                                                      imshape=(480, 641))
        est = MultiPersonEstimator(cfg, variables, H36M_17, buckets=(2,))
        out = est.estimate_frame(image, boxes, cam)
        assert out["pose3d_abs"].shape == (1, 17, 3)
        assert np.isfinite(out["pose3d_abs"]).all()
