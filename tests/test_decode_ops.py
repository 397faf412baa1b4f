"""Golden numeric tests for the decode path (SURVEY.md §5.1): delta heatmaps
must decode to exact coordinates; reconstruct_absolute must recover a
synthetic ground-truth translation; TTA un-mirroring must be exact."""
import numpy as np
import jax.numpy as jnp

from metro_pose3d_tpu.geom.joints import H36M_17
from metro_pose3d_tpu.ops.decode import heatmap_to_image, heatmap_to_metric, image_to_unit, root_relative
from metro_pose3d_tpu.ops.pose3d import (
    bone_lengths,
    mean_bone_lengths,
    reconstruct_absolute,
    rescale_to_bone_lengths,
)
from metro_pose3d_tpu.ops.soft_argmax import soft_argmax_2d, soft_argmax_3d
from metro_pose3d_tpu.ops.tta import flip_crop, unflip_pose2d, unflip_pose3d

RNG = np.random.RandomState(1)


class TestSoftArgmax:
    def test_delta_heatmap_2d(self):
        h = w = 16
        logits = np.full((1, h, w, 2), -1e4, np.float32)
        logits[0, 3, 7, 0] = 0.0  # y=3, x=7
        logits[0, 15, 0, 1] = 0.0
        coords = np.asarray(soft_argmax_2d(jnp.asarray(logits)))
        np.testing.assert_allclose(coords[0, 0], [(7 + 0.5) / w, (3 + 0.5) / h], atol=1e-6)
        np.testing.assert_allclose(coords[0, 1], [0.5 / w, 15.5 / h], atol=1e-6)

    def test_delta_heatmap_3d(self):
        h = w = 16
        d = 8
        logits = np.full((1, h, w, d, 1), -1e4, np.float32)
        logits[0, 2, 11, 5, 0] = 0.0  # y=2, x=11, z=5
        coords = np.asarray(soft_argmax_3d(jnp.asarray(logits)))
        np.testing.assert_allclose(
            coords[0, 0], [(11 + 0.5) / w, (2 + 0.5) / h, (5 + 0.5) / d], atol=1e-6
        )

    def test_uniform_heatmap_decodes_to_center(self):
        logits = np.zeros((2, 16, 16, 8, 3), np.float32)
        coords = np.asarray(soft_argmax_3d(jnp.asarray(logits)))
        np.testing.assert_allclose(coords, 0.5, atol=1e-6)

    def test_two_peak_average(self):
        logits = np.full((1, 16, 16, 4), -1e4, np.float32)
        logits[0, 0, 0, 0] = 0.0
        logits[0, 0, 15, 0] = 0.0  # equal mass at x=0 and x=15
        coords = np.asarray(soft_argmax_2d(jnp.asarray(logits)))
        np.testing.assert_allclose(coords[0, 0, 0], 0.5, atol=1e-6)

    def test_metric_mapping(self):
        c = heatmap_to_metric(jnp.asarray([[0.5, 0.0, 1.0]]), 2200.0)
        np.testing.assert_allclose(np.asarray(c), [[0.0, -1100.0, 1100.0]])

    def test_image_mapping_roundtrip(self):
        u = jnp.asarray(RNG.uniform(0, 1, (5, 2)).astype(np.float32))
        px = heatmap_to_image(u, 256)
        np.testing.assert_allclose(np.asarray(image_to_unit(px, 256)), np.asarray(u), atol=1e-6)
        # u=0.5 must be the crop center (S-1)/2
        np.testing.assert_allclose(
            np.asarray(heatmap_to_image(jnp.asarray([0.5]), 256)), [127.5]
        )


def _project(pose_cam, intrinsics):
    p = pose_cam[..., :2] / pose_cam[..., 2:]
    return np.stack(
        [
            p[..., 0] * intrinsics[:, None, 0, 0] + intrinsics[:, None, 0, 2],
            p[..., 1] * intrinsics[:, None, 1, 1] + intrinsics[:, None, 1, 2],
        ],
        -1,
    )


class TestReconstructAbsolute:
    def _make_case(self, b=4, j=17):
        pose_abs = RNG.uniform(-400, 400, (b, j, 3))
        pose_abs[..., 2] += 3500  # in front of the camera
        intr = np.zeros((b, 3, 3))
        intr[:, 0, 0] = intr[:, 1, 1] = RNG.uniform(800, 1500, b)
        intr[:, 0, 2] = intr[:, 1, 2] = 127.5
        intr[:, 2, 2] = 1
        pose2d = _project(pose_abs, intr)
        rootrel = pose_abs - pose_abs[:, :1]  # gauge: root at origin
        return pose_abs, rootrel, pose2d, intr

    def test_recovers_translation_full_perspective(self):
        pose_abs, rootrel, pose2d, intr = self._make_case()
        rec = np.asarray(
            reconstruct_absolute(jnp.asarray(rootrel), jnp.asarray(pose2d), jnp.asarray(intr))
        )
        np.testing.assert_allclose(rec, pose_abs, atol=0.5)  # sub-mm

    def test_weights_ignore_corrupted_joints(self):
        pose_abs, rootrel, pose2d, intr = self._make_case()
        pose2d_bad = pose2d.copy()
        pose2d_bad[:, 0] += 500.0  # corrupt joint 0's 2D estimate
        w = np.ones(pose2d.shape[:2], np.float32)
        w[:, 0] = 0.0
        rec = np.asarray(
            reconstruct_absolute(
                jnp.asarray(rootrel), jnp.asarray(pose2d_bad), jnp.asarray(intr), jnp.asarray(w)
            )
        )
        np.testing.assert_allclose(rec, pose_abs, atol=0.5)

    def test_weak_perspective_exact_on_weak_perspective_data(self):
        b, j = 4, 17
        rootrel = RNG.uniform(-400, 400, (b, j, 3))
        rootrel -= rootrel[:, :1]
        t = np.concatenate([RNG.uniform(-300, 300, (b, 2)), RNG.uniform(3000, 5000, (b, 1))], -1)
        intr = np.zeros((b, 3, 3))
        intr[:, 0, 0] = intr[:, 1, 1] = RNG.uniform(800, 1500, b)
        intr[:, 0, 2] = intr[:, 1, 2] = 127.5
        intr[:, 2, 2] = 1
        # weak-perspective projection: divide by the COMMON depth t_z
        xy = (rootrel[..., :2] + t[:, None, :2]) / t[:, None, 2:]
        pose2d = np.stack(
            [
                xy[..., 0] * intr[:, None, 0, 0] + 127.5,
                xy[..., 1] * intr[:, None, 1, 1] + 127.5,
            ],
            -1,
        )
        rec = np.asarray(
            reconstruct_absolute(
                jnp.asarray(rootrel), jnp.asarray(pose2d), jnp.asarray(intr),
                weak_perspective=True,
            )
        )
        np.testing.assert_allclose(rec, rootrel + t[:, None, :], atol=1.0)


class TestBoneRescale:
    def test_recovers_known_scale(self):
        edges = jnp.asarray(H36M_17.bones)
        gt = RNG.uniform(-300, 300, (100, 17, 3))
        ref = mean_bone_lengths(jnp.asarray(gt), edges)
        pose = jnp.asarray(gt[0] * 0.8)[None]
        fixed = rescale_to_bone_lengths(pose, edges, ref * 0.0 + bone_lengths(jnp.asarray(gt[0])[None], edges)[0])
        np.testing.assert_allclose(np.asarray(fixed), gt[None, 0], rtol=1e-5)

    def test_scale_is_lsq_optimal(self):
        edges = jnp.asarray(H36M_17.bones)
        pose = jnp.asarray(RNG.uniform(-300, 300, (1, 17, 3)))
        ref = bone_lengths(pose, edges)[0] * jnp.asarray(RNG.uniform(0.8, 1.2, len(H36M_17.edges)))
        fixed = rescale_to_bone_lengths(pose, edges, ref)
        s_star = float(fixed[0, 1, 0] / pose[0, 1, 0])
        lens = np.asarray(bone_lengths(pose, edges)[0])
        expected = float(np.sum(lens * np.asarray(ref)) / np.sum(lens**2))
        np.testing.assert_allclose(s_star, expected, rtol=1e-5)


class TestFlipTTA:
    def test_unflip_3d_matches_mirrored_gt(self):
        m = jnp.asarray(H36M_17.mirror_mapping)
        pose = jnp.asarray(RNG.uniform(-500, 500, (3, 17, 3)).astype(np.float32))
        # prediction on the mirrored image = mirrored pose (x negated, joints permuted)
        mirrored_pred = jnp.take(pose * jnp.asarray([-1.0, 1.0, 1.0]), m, axis=-2)
        recovered = unflip_pose3d(mirrored_pred, m)
        np.testing.assert_allclose(np.asarray(recovered), np.asarray(pose), atol=1e-5)

    def test_unflip_2d(self):
        m = jnp.asarray(H36M_17.mirror_mapping)
        pose = jnp.asarray(RNG.uniform(0, 255, (2, 17, 2)).astype(np.float32))
        mirrored = jnp.take(
            jnp.stack([255.0 - pose[..., 0], pose[..., 1]], -1), m, axis=-2
        )
        recovered = unflip_pose2d(mirrored, m, 256)
        np.testing.assert_allclose(np.asarray(recovered), np.asarray(pose), atol=1e-4)

    def test_flip_crop_involution(self):
        crops = jnp.asarray(RNG.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(flip_crop(flip_crop(crops))), np.asarray(crops))

    def test_root_relative(self):
        pose = jnp.asarray(RNG.uniform(-1, 1, (2, 17, 3)).astype(np.float32))
        rel = root_relative(pose, 0)
        np.testing.assert_allclose(np.asarray(rel[:, 0]), 0.0, atol=1e-7)
