"""Multi-person end-to-end estimation (BASELINE.json config 5).

Full frame + detector bounding boxes -> batched MeTRo crops -> fused
crop-in/skeleton-out forward -> absolute metric back-projection, with every
person's pose expressed in the ORIGINAL camera frame so a frame's skeletons
share one consistent 3D space.

TPU-shaped design decisions:
* The per-frame person count is dynamic, but XLA wants static shapes: crops
  are padded to the next BUCKET size (powers of two), so each bucket compiles
  once and stays cached (SURVEY.md §8 hard part 5).
* All pixel work (homography warp of the source tiles, normalization,
  flip-TTA, decode, absolute reconstruction) runs in ONE jit program per
  bucket — same fused graph as single-person eval, plus the per-crop
  `rot_to_orig` rotation folded in at the end.
* Host work per person is tiny: 3x3 camera algebra + a source-tile slice.

The reference repo has no multi-person driver (it consumes pre-cropped
single-person examples); this subsystem covers the driver-mandated config 5
(detector bboxes -> batched crops -> absolute back-projection).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from metro_pose3d_tpu.config import Config
from metro_pose3d_tpu.geom.camera import Camera, reproject_image_points
from metro_pose3d_tpu.geom.joints import JointInfo
from metro_pose3d_tpu.models.metro import MetroModel, decode_metro
from metro_pose3d_tpu.ops.decode import root_relative
from metro_pose3d_tpu.ops.pose3d import reconstruct_absolute, rescale_to_bone_lengths
from metro_pose3d_tpu.ops.tta import flip_crop, unflip_pose2d, unflip_pose3d
from metro_pose3d_tpu.pipeline.crops import prepare_inference_crop
from metro_pose3d_tpu.pipeline.device import device_augment

DEFAULT_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def make_multiperson_predict_fn(
    cfg: Config,
    mirror_mapping: np.ndarray,
    root_index: int = 0,
    flip_tta: bool | None = None,
    bone_edges: np.ndarray | None = None,
    mean_bones: np.ndarray | None = None,
    frame_mode: bool = False,
):
    """Fused jit fn: (variables, batch) -> per-crop poses, rotated into the
    original camera frame via the batch's `rot_to_orig`.

    `frame_mode`: the batch carries one shared "frame" [H, W, 3] uint8 and
    per-crop FRAME-coordinate warp params — the host ships the frame once
    (2.7 MB at 720p) instead of one 786 KB source tile per person, and the
    device warps all crops out of it (`ops.warp.warp_from_frame`)."""
    model = MetroModel(cfg.model.at_phase(train=False))
    flip_tta = cfg.eval.flip_tta if flip_tta is None else flip_tta
    use_bones = (
        cfg.eval.scale_recovery == "bone_lengths"
        and bone_edges is not None
        and mean_bones is not None
    )
    mirror = jnp.asarray(mirror_mapping)
    edges = jnp.asarray(bone_edges) if bone_edges is not None else None
    bones = jnp.asarray(mean_bones) if mean_bones is not None else None

    @jax.jit
    def predict(variables, batch):
        if frame_mode:
            from metro_pose3d_tpu.ops.color import normalize
            from metro_pose3d_tpu.ops.warp import warp_from_frame

            crops = normalize(
                warp_from_frame(
                    batch["frame"], batch["warp_h"], batch["warp_k"],
                    batch["warp_dist"], cfg.model.proc_side,
                    sampler=cfg.aug.warp_sampler,
                    newton_iters=cfg.aug.warp_newton_iters,
                ) / 255.0
            )
        else:
            crops = device_augment(
                batch, cfg.model.proc_side, train=False,
                warp_sampler=cfg.aug.warp_sampler,
                warp_newton_iters=cfg.aug.warp_newton_iters,
            )
        b = crops.shape[0]
        if flip_tta:
            both = jnp.concatenate([crops, flip_crop(crops)], axis=0)
            l3d, l2d = model.apply(variables, both, train=False)
            p3, p2 = decode_metro(l3d, l2d, cfg.model)
            pose3d = 0.5 * (p3[:b] + unflip_pose3d(p3[b:], mirror))
            pose2d = 0.5 * (p2[:b] + unflip_pose2d(p2[b:], mirror, cfg.model.proc_side))
        else:
            l3d, l2d = model.apply(variables, crops, train=False)
            pose3d, pose2d = decode_metro(l3d, l2d, cfg.model)

        pose3d_rel = root_relative(pose3d, root_index)
        if use_bones:
            pose3d_rel = rescale_to_bone_lengths(pose3d_rel, edges, bones)
        pose3d_abs = reconstruct_absolute(pose3d_rel, pose2d, batch["intrinsics"])

        # rotate out of each virtual crop camera into the shared orig frame
        rot = batch["rot_to_orig"]  # [B, 3, 3]
        # HIGHEST: mm-scale coordinates (|t| ~ metres) would lose up to
        # ~16 mm to the TPU-default bf16 einsum
        pose3d_abs_orig = jnp.einsum("bij,bkj->bki", rot, pose3d_abs,
                                     precision=jax.lax.Precision.HIGHEST)
        pose3d_rel_orig = jnp.einsum("bij,bkj->bki", rot, pose3d_rel,
                                     precision=jax.lax.Precision.HIGHEST)
        return {
            "pose3d_abs": pose3d_abs_orig,
            "pose3d_rootrel": pose3d_rel_orig,
            "pose2d_crop_px": pose2d,
        }

    return predict


class MultiPersonEstimator:
    """image + boxes -> absolute skeletons (mm) in the frame's camera."""

    def __init__(
        self,
        cfg: Config,
        variables,
        joint_info: JointInfo,
        root_name: str = "pelv",
        buckets=DEFAULT_BUCKETS,
        frame_mode: bool = True,
        **predict_kw,
    ):
        self.cfg = cfg
        self.variables = variables
        self.joint_info = joint_info
        self.buckets = tuple(sorted(buckets))
        self.frame_mode = frame_mode
        root = (
            joint_info.names.index(root_name)
            if root_name in joint_info.names
            else 0
        )
        self._predict = make_multiperson_predict_fn(
            cfg, joint_info.mirror_mapping, root_index=root,
            frame_mode=frame_mode, **predict_kw
        )

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def warmup(self, max_people: int, imshape=None, camera=None) -> int:
        """Pre-compile every bucket graph up to `max_people` so a serving
        stream never stalls on a cold compile mid-video (each bucket is a
        separate jit shape; a full R50 compile can take minutes via a
        remote-compile service). `imshape` must match the frames that will
        be served in frame mode (the shared-frame shape is part of the jit
        signature); defaults to 720p. Returns the number of buckets built.
        """
        h, w = imshape if imshape is not None else (720, 1280)
        image = np.zeros((h, w, 3), np.uint8)
        if camera is None:
            camera = Camera.from_fov(60.0, (h, w))
        built = 0
        side = min(h, w) // 3
        box = [w // 2 - side // 2, h // 2 - side // 2, side, side]
        for b in self.buckets:
            if b > self._bucket(max_people):
                break
            out = self._dispatch(image, np.asarray([box] * b, np.float64), camera)
            jax.tree.map(
                lambda t: np.asarray(t) if hasattr(t, "shape") else t, out[0])
            built += 1
        return built

    def _dispatch(self, image: np.ndarray, boxes: np.ndarray, camera: Camera):
        """Host prep + H2D + predict dispatch for one frame (0 < N <= max
        bucket). Returns the un-synced device output plus the host context
        `_collect` needs — splitting here is what lets `estimate_stream`
        overlap frame i+1's transfer/compute with frame i's output sync."""
        n = len(boxes)
        if self.frame_mode:
            from metro_pose3d_tpu.pipeline.crops import prepare_inference_crop_params

            prepared = [
                prepare_inference_crop_params(
                    box, camera, self.cfg.model.proc_side,
                    self.cfg.data.test_box_expansion,
                    engine=self.cfg.data.host_prep,
                )
                for box in boxes
            ]
        else:
            prepared = [
                prepare_inference_crop(
                    image, box, camera, self.cfg.model.proc_side,
                    self.cfg.data.source_side, self.cfg.data.test_box_expansion,
                    engine=self.cfg.data.host_prep,
                )
                for box in boxes
            ]
        crop_cams = [p.pop("_crop_cam") for p in prepared]
        bucket = self._bucket(n)
        prepared += [prepared[-1]] * (bucket - n)
        batch = {
            k: jnp.asarray(np.stack([p[k] for p in prepared]))
            for k in prepared[0]
        }
        if self.frame_mode:
            # COPY unconditionally (ascontiguousarray is a no-op for even
            # widths): the H2D transfer is asynchronous and _dispatch
            # returns while it may still be in flight — a caller that
            # decodes the next video frame into the same reused buffer
            # (standard cv2 stream pattern) would otherwise tear frame i
            frame = np.array(image[:, : image.shape[1] // 2 * 2])
            batch["frame"] = jnp.asarray(frame)
        out = self._predict(self.variables, batch)
        return out, n, crop_cams, camera

    def _collect(self, out, n, crop_cams, camera):
        """Sync one dispatched frame's outputs and finish the host work."""
        out = jax.tree.map(lambda t: np.asarray(t[:n]), out)
        # 2D joints back in full-image pixels (through each crop homography)
        pose2d_px = np.stack(
            [
                reproject_image_points(out["pose2d_crop_px"][i], crop_cams[i], camera)
                for i in range(n)
            ]
        ).astype(np.float32)
        return {
            "pose3d_abs": out["pose3d_abs"],
            "pose3d_rootrel": out["pose3d_rootrel"],
            "pose2d_px": pose2d_px,
        }

    def estimate_frame(self, image: np.ndarray, boxes, camera: Camera | None = None):
        """boxes: [N, 4] (x, y, w, h) detector boxes. camera defaults to a
        60-degree-FoV pinhole at the image center (the standard guess when
        intrinsics are unknown). Returns dict of [N, ...] numpy arrays;
        `pose2d_px` is in FULL-IMAGE pixels of the input camera.
        """
        boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
        if camera is None:
            camera = Camera.from_fov(60.0, image.shape[:2])
        n = len(boxes)
        if n == 0:
            j = self.joint_info.n_joints
            return {
                "pose3d_abs": np.zeros((0, j, 3), np.float32),
                "pose3d_rootrel": np.zeros((0, j, 3), np.float32),
                "pose2d_px": np.zeros((0, j, 2), np.float32),
            }
        if n > self.buckets[-1]:  # process in chunks, then concatenate
            parts = [
                self.estimate_frame(image, boxes[s : s + self.buckets[-1]], camera)
                for s in range(0, n, self.buckets[-1])
            ]
            return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
        return self._collect(*self._dispatch(image, boxes, camera))

    def estimate_stream(self, frames, depth: int = 2):
        """Pipelined per-frame estimation for video/streams: yields the same
        results as `estimate_frame` per (image, boxes, camera) tuple, in
        order, but keeps up to `depth` frames in flight — frame i+1's host
        prep, H2D ship, and predict dispatch overlap frame i's device
        compute and output sync. With the synchronous loop most of the
        per-frame wall time is dispatch/transfer latency, not compute
        (scripts/exp_multiperson_breakdown.py).

        Each frame is (image, boxes[, camera]) — the camera defaults like
        `estimate_frame`. Zero-box frames are pure host work and ride the
        pipeline as ready results (no flush); only frames with more boxes
        than the largest bucket drain it (they need synchronous chunking).
        """
        pending: list = []  # ("d", dispatch-tuple) | ("r", ready result)

        def _pop():
            kind, payload = pending.pop(0)
            return payload if kind == "r" else self._collect(*payload)

        for frame in frames:
            image, boxes, *rest = frame
            camera = rest[0] if rest else None
            boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
            if camera is None:
                camera = Camera.from_fov(60.0, image.shape[:2])
            if len(boxes) > self.buckets[-1]:
                while pending:
                    yield _pop()
                yield self.estimate_frame(image, boxes, camera)
                continue
            if len(boxes) == 0:
                pending.append(("r", self.estimate_frame(image, boxes, camera)))
            else:
                pending.append(("d", self._dispatch(image, boxes, camera)))
            if len(pending) >= max(depth, 1):
                yield _pop()
        while pending:
            yield _pop()

    def estimate_batch(self, frames):
        """Convenience: list of (image, boxes, camera) -> list of results
        (pipelined; identical outputs to calling estimate_frame per item)."""
        return list(self.estimate_stream(iter(frames)))
