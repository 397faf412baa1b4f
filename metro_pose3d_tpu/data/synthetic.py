"""Synthetic 3D-pose dataset with exact, closed-form ground truth.

Renders stick-figure scenes with a known camera: joints are distinctly
colored discs, so end-to-end pipeline tests can verify that the on-device
warp places image content exactly where the host-side GT math says it lands.
Also serves as the benchmark data source (no licensed datasets in this
environment; SURVEY.md §8 hard-part 4).
"""
from __future__ import annotations

import numpy as np

from metro_pose3d_tpu.geom.camera import Camera
from metro_pose3d_tpu.geom.joints import H36M_17, JointInfo
from metro_pose3d_tpu.pipeline.crops import Example

# Rough adult skeleton in a T-ish pose, pelvis-origin, millimeters,
# y DOWN (camera-like world), matching H36M_17 joint order.
_BASE_POSE = np.array(
    [
        [0, 0, 0],        # pelv
        [-120, 0, 0],     # rhip
        [-130, 430, 30],  # rkne
        [-140, 860, 0],   # rank
        [120, 0, 0],      # lhip
        [130, 430, 30],   # lkne
        [140, 860, 0],    # lank
        [0, -230, -20],   # spin
        [0, -470, 0],     # neck
        [0, -590, 20],    # head
        [0, -700, 0],     # htop
        [200, -440, 0],   # lsho
        [340, -200, 30],  # lelb
        [400, 40, 60],    # lwri
        [-200, -440, 0],  # rsho
        [-340, -200, 30], # relb
        [-400, 40, 60],   # rwri
    ],
    np.float64,
)

_JOINT_COLORS = None


def _joint_colors(n):
    global _JOINT_COLORS
    if _JOINT_COLORS is None or len(_JOINT_COLORS) != n:
        rng = np.random.default_rng(7)
        _JOINT_COLORS = rng.integers(60, 255, (n, 3)).astype(np.uint8)
    return _JOINT_COLORS


def random_pose(rng: np.random.Generator) -> np.ndarray:
    """Perturbed base pose, rotated about the vertical axis, in world mm."""
    pose = _BASE_POSE + rng.normal(0, 40, _BASE_POSE.shape)
    yaw = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return pose @ rot.T


def make_example(index: int, seed: int = 0, imshape=(512, 512)) -> Example:
    """Deterministic synthetic example #index."""
    import cv2

    rng = np.random.default_rng((seed, index))
    h, w = imshape
    cam = Camera.from_fov(55.0, imshape)
    cam.world_up = np.array([0.0, -1.0, 0.0])

    # place the person in front of the camera with some lateral offset
    depth = rng.uniform(2500, 5500)
    lateral = rng.uniform(-0.25, 0.25, 2) * depth
    root_world = np.array([lateral[0], lateral[1] * 0.3, depth])
    world = random_pose(rng) + root_world

    img = np.zeros((h, w, 3), np.uint8)
    img[:] = rng.integers(10, 80, 3).astype(np.uint8)  # background
    # low-frequency clutter
    for _ in range(12):
        p1 = rng.integers(0, (w, h)).astype(int)
        p2 = rng.integers(0, (w, h)).astype(int)
        color = tuple(int(v) for v in rng.integers(0, 120, 3))
        cv2.line(img, tuple(p1), tuple(p2), color, int(rng.integers(1, 8)))

    px = cam.world_to_image(world)
    colors = _joint_colors(len(world))
    radius = max(2, int(180 / depth * cam.K[0, 0] / 55))
    for p, c in zip(px, colors):
        if np.all(np.isfinite(p)):
            cv2.circle(img, (int(round(p[0])), int(round(p[1]))), radius,
                       tuple(int(v) for v in c), -1)

    lo = px.min(0) - 60
    hi = px.max(0) + 60
    bbox = np.array([lo[0], lo[1], hi[0] - lo[0], hi[1] - lo[1]])
    return Example(image=img, bbox=bbox, camera=cam, world_coords=world)


def _make_frame_background(rng: np.random.Generator, imshape) -> np.ndarray:
    """Shared multi-person frame background: dark fill + random clutter."""
    import cv2

    h, w = imshape
    img = np.zeros((h, w, 3), np.uint8)
    img[:] = rng.integers(10, 70, 3).astype(np.uint8)
    for _ in range(16):
        p1 = rng.integers(0, (w, h)).astype(int)
        p2 = rng.integers(0, (w, h)).astype(int)
        cv2.line(img, tuple(p1), tuple(p2),
                 tuple(int(v) for v in rng.integers(0, 110, 3)),
                 int(rng.integers(1, 6)))
    return img


def _render_person(img, cam: Camera, world: np.ndarray, colors) -> list:
    """Draw one person's joints into `img`; returns their [x, y, w, h] box.

    Single source of truth for the circle radius formula and the 50 px
    detector-box margin — both the static frame and the video sequence
    generators depend on these staying identical."""
    import cv2

    px = cam.world_to_image(world)
    depth = float(world[:, 2].mean())
    radius = max(2, int(180 / depth * cam.K[0, 0] / 55))
    for pt, c in zip(px, colors):
        if np.all(np.isfinite(pt)):
            cv2.circle(img, (int(round(pt[0])), int(round(pt[1]))), radius,
                       tuple(int(v) for v in c), -1)
    lo, hi = px.min(0) - 50, px.max(0) + 50
    return [lo[0], lo[1], hi[0] - lo[0], hi[1] - lo[1]]


def make_multiperson_frame(n_persons: int, seed: int = 0, imshape=(512, 910)):
    """One synthetic frame with several people under a single camera.

    -> (image uint8 RGB, boxes [P,4], Camera, world [P,17,3] mm). Drives the
    multi-person estimator tests/bench (BASELINE config 5) without licensed
    detector or dataset assets.
    """
    rng = np.random.default_rng((seed, 777))
    cam = Camera.from_fov(65.0, imshape)
    img = _make_frame_background(rng, imshape)

    worlds, boxes = [], []
    colors = _joint_colors(len(_BASE_POSE))
    for p in range(n_persons):
        depth = rng.uniform(3000, 6500)
        # spread people horizontally so boxes don't fully overlap
        x = (p - (n_persons - 1) / 2) * depth * 0.45 / max(n_persons / 3, 1)
        root = np.array([x, rng.uniform(-0.05, 0.1) * depth, depth])
        world = random_pose(rng) + root
        boxes.append(_render_person(img, cam, world, colors))
        worlds.append(world)
    return img, np.asarray(boxes, np.float64), cam, np.stack(worlds)


def make_multiperson_sequence(n_persons: int, n_frames: int, seed: int = 0,
                              imshape=(512, 910)):
    """Smoothly-moving synthetic video: yields (image, boxes, Camera, world)
    per frame. People walk sinusoidal tracks in x/depth while their pose
    interpolates between two random poses — drives the pipelined
    `MultiPersonEstimator.estimate_stream` demo/test without video assets.
    Background and camera are fixed across frames (like a static camera)."""
    rng = np.random.default_rng((seed, 778))
    cam = Camera.from_fov(65.0, imshape)
    bg = _make_frame_background(rng, imshape)

    colors = _joint_colors(len(_BASE_POSE))
    tracks = []
    for p in range(n_persons):
        depth0 = rng.uniform(3500, 6000)
        x0 = (p - (n_persons - 1) / 2) * depth0 * 0.45 / max(n_persons / 3, 1)
        tracks.append({
            "x0": x0, "depth0": depth0,
            "amp_x": rng.uniform(200, 600), "amp_z": rng.uniform(150, 500),
            "phase": rng.uniform(0, 2 * np.pi),
            "period": rng.uniform(0.6, 1.4) * max(n_frames, 2),
            "pose_a": random_pose(rng), "pose_b": random_pose(rng),
            "y_frac": rng.uniform(-0.05, 0.1),
        })

    for f in range(n_frames):
        img = bg.copy()
        worlds, boxes = [], []
        for tr in tracks:
            t = 2 * np.pi * f / tr["period"] + tr["phase"]
            root = np.array([
                tr["x0"] + tr["amp_x"] * np.sin(t),
                tr["y_frac"] * tr["depth0"],
                tr["depth0"] + tr["amp_z"] * np.cos(t),
            ])
            # smooth pose morph a -> b -> a over the sequence
            alpha = 0.5 - 0.5 * np.cos(2 * np.pi * f / max(n_frames, 2))
            world = (1 - alpha) * tr["pose_a"] + alpha * tr["pose_b"] + root
            boxes.append(_render_person(img, cam, world, colors))
            worlds.append(world)
        yield img, np.asarray(boxes, np.float64), cam, np.stack(worlds)


class SyntheticDataset:
    joint_info: JointInfo = H36M_17
    root_joint = "pelv"

    def __init__(self, n_train=512, n_test=64, seed=0, imshape=(512, 512)):
        self.n_train = n_train
        self.n_test = n_test
        self.seed = seed
        self.imshape = imshape

    def train_example(self, i: int) -> Example:
        return make_example(i, seed=self.seed, imshape=self.imshape)

    def test_example(self, i: int) -> Example:
        return make_example(i, seed=self.seed + 10_000, imshape=self.imshape)
