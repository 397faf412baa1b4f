"""Geometry-core tests: camera transforms, distortion, crop synthesis, boxes,
joint metadata, Procrustes. All host-side numpy (no device needed)."""
import numpy as np
import pytest

from metro_pose3d_tpu.geom import boxes
from metro_pose3d_tpu.geom.camera import (
    Camera,
    distort_points,
    get_warp_params,
    reproject_image_points,
    undistort_points,
)
from metro_pose3d_tpu.geom.joints import H36M_17, MPI3DHP_EVAL_14_INDICES, MPI3DHP_17, MPII_16
from metro_pose3d_tpu.geom.procrustes import procrustes_align

RNG = np.random.RandomState(0)


def random_camera(distortion=False):
    cam = Camera.from_fov(55.0, (480, 640))
    cam.t = RNG.uniform(-1000, 1000, 3)
    cam.turn_towards(cam.t + np.array([0.1, -0.2, 3.0]))
    if distortion:
        cam.dist[:] = [-0.2, 0.05, 1e-3, -2e-3, 0.01]
    return cam


class TestCamera:
    def test_world_camera_roundtrip(self):
        cam = random_camera()
        pts = RNG.uniform(-500, 500, (20, 3))
        np.testing.assert_allclose(cam.camera_to_world(cam.world_to_camera(pts)), pts, atol=1e-9)

    def test_rotation_orthonormal(self):
        cam = random_camera()
        np.testing.assert_allclose(cam.R @ cam.R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(cam.R) > 0

    def test_project_backproject_roundtrip(self):
        for distortion in (False, True):
            cam = random_camera(distortion)
            pts_cam = np.stack(
                [RNG.uniform(-0.4, 0.4, 50), RNG.uniform(-0.4, 0.4, 50), np.ones(50)], -1
            ) * RNG.uniform(500, 3000, (50, 1))
            px = cam.camera_to_image(pts_cam)
            back = cam.image_to_camera(px, depth=pts_cam[:, 2])
            np.testing.assert_allclose(back, pts_cam, rtol=1e-7, atol=1e-6)

    def test_distortion_inverse(self):
        dist = np.array([-0.3, 0.1, 1e-3, -1e-3, 0.02])
        pts = RNG.uniform(-0.5, 0.5, (100, 2))
        np.testing.assert_allclose(
            undistort_points(distort_points(pts, dist), dist), pts, atol=1e-8
        )

    def test_turn_towards_centers_target(self):
        cam = random_camera()
        target = cam.t + RNG.uniform(-1, 1, 3) * [500, 200, 2000]
        cam.turn_towards(target)
        px = cam.world_to_image(target[None])
        center = np.array([cam.K[0, 2], cam.K[1, 2]])
        np.testing.assert_allclose(px[0], center, atol=1e-6)

    def test_turn_towards_keeps_gravity_vertical(self):
        cam = Camera.from_fov(60.0, (256, 256), )
        cam.world_up = np.array([0.0, -1.0, 0.0])
        cam.turn_towards(np.array([300.0, 50.0, 2000.0]))
        # a world-vertical segment must project to a pixel-vertical segment
        p_lo = np.array([300.0, 50.0, 2000.0])
        p_hi = p_lo + np.array([0.0, -100.0, 0.0])  # world up = -y
        px = cam.world_to_image(np.stack([p_lo, p_hi]))
        assert abs(px[0, 0] - px[1, 0]) < 1e-6
        assert px[1, 1] < px[0, 1]  # up in world = up in image (smaller y)

    def test_zoom_scales_around_principal_point(self):
        cam = random_camera()
        pt = cam.t + cam.R[2] * 1000 + cam.R[0] * 100  # offset along camera x
        px_before = cam.world_to_image(pt[None])[0]
        cam.zoom(2.0)
        px_after = cam.world_to_image(pt[None])[0]
        pp = np.array([cam.K[0, 2], cam.K[1, 2]])
        np.testing.assert_allclose(px_after - pp, 2.0 * (px_before - pp), rtol=1e-9)

    def test_horizontal_flip_mirrors(self):
        cam = Camera.from_fov(60.0, (256, 256))
        pt = np.array([[100.0, -50.0, 1000.0]])  # world == camera frame here
        px = cam.world_to_image(pt)
        cam.horizontal_flip()
        px_flipped = cam.world_to_image(pt)
        # mirror around the principal point cx=(256-1)/2
        np.testing.assert_allclose(px_flipped[0, 0], 2 * cam.K[0, 2] - px[0, 0], atol=1e-9)
        np.testing.assert_allclose(px_flipped[0, 1], px[0, 1], atol=1e-9)

    def test_rotate_inplane(self):
        cam = Camera.from_fov(60.0, (256, 256))
        pt = np.array([[100.0, 0.0, 1000.0]])
        cam.rotate(np.pi / 2)  # 90 deg CCW in image coords
        px = cam.world_to_image(pt)[0]
        pp = np.array([cam.K[0, 2], cam.K[1, 2]])
        rel = px - pp
        # a point that was along +x should now be along -y (CCW, y-down coords)
        assert rel[1] < -10 and abs(rel[0]) < 1e-6

    def test_reproject_points_identity(self):
        cam = random_camera(True)
        pts = RNG.uniform(50, 400, (30, 2))
        np.testing.assert_allclose(reproject_image_points(pts, cam, cam), pts, atol=1e-6)

    def test_reproject_points_rotation_consistency(self):
        src = random_camera(True)
        dst = src.copy()
        dst.undistort()
        dst.turn_towards(dst.t + dst.R[2] * 100 + dst.R[0] * 30)
        dst.zoom(1.3)
        world = src.t + RNG.uniform(-0.3, 0.3, (40, 3)) * [500, 500, 0] + src.R[2] * 2500
        px_src = src.world_to_image(world)
        px_dst_direct = dst.world_to_image(world)
        px_dst_via_reproj = reproject_image_points(px_src, src, dst)
        np.testing.assert_allclose(px_dst_via_reproj, px_dst_direct, atol=1e-5)

    def test_warp_params_match_reprojection(self):
        """get_warp_params' H/K/dist must reproduce reproject_image_points
        (dst pixel -> src pixel), since the device sampler uses them."""
        src = random_camera(True)
        dst = src.copy()
        dst.undistort()
        dst.turn_towards(dst.t + dst.R[2] * 500 + dst.R[1] * 50)
        dst.square_pixels()
        dst.zoom(2.0)
        dst.center_principal_point((256, 256))
        params = get_warp_params(src, dst, dtype=np.float64)
        pts_dst = RNG.uniform(0, 255, (50, 2))
        ones = np.ones((50, 1))
        rays = np.concatenate([pts_dst, ones], -1) @ params["H"].T
        normalized = rays[:, :2] / rays[:, 2:]
        d = distort_points(normalized, params["dist"])
        fx, fy, cx, cy = params["K"]
        src_px = np.stack([d[:, 0] * fx + cx, d[:, 1] * fy + cy], -1)
        expected = reproject_image_points(pts_dst, dst, src)
        np.testing.assert_allclose(src_px, expected, atol=1e-6)


class TestBoxes:
    def test_expand_to_square(self):
        sq = boxes.expand_to_square([10, 20, 30, 50])
        np.testing.assert_allclose(sq, [0, 20, 50, 50])

    def test_center_box_around_roundtrip(self):
        box = np.array([3.0, 4.0, 10.0, 20.0])
        np.testing.assert_allclose(boxes.box_around(boxes.center(box), box[2:4]), box)

    def test_intersection_disjoint(self):
        inter = boxes.intersection([0, 0, 10, 10], [20, 20, 5, 5])
        assert boxes.area(inter) == 0

    def test_iou(self):
        assert boxes.iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
        assert boxes.iou([0, 0, 10, 10], [5, 0, 10, 10]) == pytest.approx(1 / 3)

    def test_contains(self):
        assert boxes.contains([0, 0, 10, 10], np.array([5.0, 5.0]))
        assert not boxes.contains([0, 0, 10, 10], np.array([15.0, 5.0]))


class TestJointInfo:
    def test_mirror_mapping_involution(self):
        for ji in (H36M_17, MPII_16, MPI3DHP_17):
            m = ji.mirror_mapping
            np.testing.assert_array_equal(m[m], np.arange(ji.n_joints))

    def test_mirror_swaps_left_right(self):
        m = H36M_17.mirror_mapping
        assert m[H36M_17.index_of("lwri")] == H36M_17.index_of("rwri")
        assert m[H36M_17.index_of("pelv")] == H36M_17.index_of("pelv")

    def test_edges_valid(self):
        for ji in (H36M_17, MPII_16, MPI3DHP_17):
            assert len(ji.edges) == ji.n_joints - 1  # tree skeleton
            for a, b in ji.edges:
                assert 0 <= a < ji.n_joints and 0 <= b < ji.n_joints

    def test_3dhp_eval_subset(self):
        assert len(MPI3DHP_EVAL_14_INDICES) == 14
        names = [MPI3DHP_17.names[i] for i in MPI3DHP_EVAL_14_INDICES]
        assert "pelv" not in names and "spin" not in names

    def test_select_joints(self):
        sub = MPI3DHP_17.select_joints(MPI3DHP_EVAL_14_INDICES)
        assert sub.n_joints == 14


class TestProcrustes:
    def test_recovers_similarity_transform(self):
        gt = RNG.uniform(-100, 100, (4, 17, 3))
        angle = 0.7
        rot = np.array(
            [[np.cos(angle), -np.sin(angle), 0], [np.sin(angle), np.cos(angle), 0], [0, 0, 1.0]]
        )
        pred = 2.5 * gt @ rot.T + np.array([10.0, -20.0, 5.0])
        aligned = procrustes_align(pred, gt)
        np.testing.assert_allclose(aligned, gt, atol=1e-8)

    def test_no_scaling_option(self):
        gt = RNG.uniform(-100, 100, (17, 3))
        pred = 2.0 * gt
        aligned = procrustes_align(pred, gt, allow_scaling=False)
        err = np.linalg.norm(aligned - gt, axis=-1).mean()
        assert err > 1.0  # scale mismatch must remain
