"""Fused inference engine: crop-in -> skeleton-out in ONE jit graph.

This is the `[DRIVER]` headline path (SURVEY.md §4.4): normalization,
backbone, heads, soft-argmax decode, horizontal-flip TTA, bone-length
rescale and absolute back-projection all fuse into a single XLA program,
batched and shardable over the data mesh. The flip-TTA pass runs as one
doubled batch (not two launches) so the MXU stays saturated.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from metro_pose3d_tpu.config import Config
from metro_pose3d_tpu.models.metro import (
    MetroModel,
    decode_metro,
    decode_twofive,
    twofive_backproject,
)
from metro_pose3d_tpu.ops.color import normalize
from metro_pose3d_tpu.ops.decode import root_relative
from metro_pose3d_tpu.ops.pose3d import reconstruct_absolute, rescale_to_bone_lengths
from metro_pose3d_tpu.ops.tta import (
    flip_crop, unflip_pose25d, unflip_pose2d, unflip_pose3d,
)
from metro_pose3d_tpu.pipeline.device import device_augment


def make_predict_fn(
    cfg: Config,
    mirror_mapping: np.ndarray,
    root_index: int = 0,
    flip_tta: bool | None = None,
    reconstruct: bool | None = None,
    bone_edges: np.ndarray | None = None,
    mean_bones: np.ndarray | None = None,
    from_tiles: bool = False,
    mesh=None,
):
    """Build the jitted predict function.

    Signature of the returned fn:
      from_tiles=False: (variables, crops_uint8 [B,S,S,3], intrinsics [B,3,3])
      from_tiles=True:  (variables, batch dict from the input pipeline)
    Returns dict with pose3d_rootrel (mm), pose2d_px, and pose3d_abs (mm,
    camera frame) when reconstruction is enabled.
    """
    model = MetroModel(cfg.model.at_phase(train=False))
    flip_tta = cfg.eval.flip_tta if flip_tta is None else flip_tta
    reconstruct = cfg.eval.reconstruct_absolute if reconstruct is None else reconstruct
    use_bones = (
        cfg.eval.scale_recovery == "bone_lengths"
        and bone_edges is not None
        and mean_bones is not None
    )
    mirror = jnp.asarray(mirror_mapping)
    edges = jnp.asarray(bone_edges) if bone_edges is not None else None
    bones = jnp.asarray(mean_bones) if mean_bones is not None else None

    is_twofive = cfg.model.model_class == "twofive"

    def forward(variables, crops_norm, intrinsics):
        b = crops_norm.shape[0]
        if is_twofive:
            # 2.5D image-aligned baseline (`--model-class` in the reference):
            # x/y decode in crop pixels, z metric — root-relative metric
            # coordinates require a known root depth, so this path returns
            # the raw 2.5D prediction; predict_dataset lifts it with the GT
            # root depth (the paper's evaluation convention for baselines;
            # eval defaults keep TTA off for it, but the capability exists).
            if flip_tta:
                both = jnp.concatenate([crops_norm, flip_crop(crops_norm)], axis=0)
                l3d, l2d = model.apply(variables, both, train=False)
                p25, p2 = decode_twofive(l3d, l2d, cfg.model)
                p25_m = unflip_pose25d(p25[b:], mirror, cfg.model.proc_side)
                p2_m = unflip_pose2d(p2[b:], mirror, cfg.model.proc_side)
                pose25d = 0.5 * (p25[:b] + p25_m)
                pose2d = 0.5 * (p2[:b] + p2_m)
            else:
                l3d, l2d = model.apply(variables, crops_norm, train=False)
                pose25d, pose2d = decode_twofive(l3d, l2d, cfg.model)
            return {"pose25d": pose25d, "pose2d_px": pose2d}

        if flip_tta:
            # one doubled batch: [orig; mirrored]
            both = jnp.concatenate([crops_norm, flip_crop(crops_norm)], axis=0)
            l3d, l2d = model.apply(variables, both, train=False)
            p3, p2 = decode_metro(l3d, l2d, cfg.model)
            p3_m = unflip_pose3d(p3[b:], mirror)
            p2_m = unflip_pose2d(p2[b:], mirror, cfg.model.proc_side)
            pose3d = 0.5 * (p3[:b] + p3_m)
            pose2d = 0.5 * (p2[:b] + p2_m)
        else:
            l3d, l2d = model.apply(variables, crops_norm, train=False)
            pose3d, pose2d = decode_metro(l3d, l2d, cfg.model)

        pose3d_rel = root_relative(pose3d, root_index)
        if use_bones:
            pose3d_rel = rescale_to_bone_lengths(pose3d_rel, edges, bones)
        out = {"pose3d_rootrel": pose3d_rel, "pose2d_px": pose2d}
        if reconstruct:
            out["pose3d_abs"] = reconstruct_absolute(
                pose3d_rel, pose2d, intrinsics,
                weak_perspective=cfg.eval.reconstruction == "weak",
            )
        return out

    if from_tiles:
        def augment(batch):
            return device_augment(
                batch, cfg.model.proc_side, train=False,
                warp_sampler=cfg.aug.warp_sampler,
                warp_newton_iters=cfg.aug.warp_newton_iters,
            )

        if mesh is not None:
            # Pallas custom calls (two-pass warp kernel) cannot be GSPMD-
            # partitioned; shard_map runs one kernel grid per device shard
            from jax import shard_map  # jax>=0.8 home (experimental alias deprecated)
            from jax.sharding import PartitionSpec as P

            augment = shard_map(
                augment, mesh=mesh, in_specs=(P("data"),),
                out_specs=P("data"), check_vma=False,
            )

        def predict(variables, batch):
            crops = augment(batch)
            return forward(variables, crops, batch["intrinsics"])
    else:
        def predict(variables, crops_uint8, intrinsics):
            crops = normalize(crops_uint8.astype(jnp.float32) / 255.0)
            return forward(variables, crops, intrinsics)

    if mesh is None:
        return jax.jit(predict)
    from metro_pose3d_tpu.parallel.mesh import batch_sharding, replicated_sharding

    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    n_in = 1 if from_tiles else 2
    return jax.jit(predict, in_shardings=(repl,) + (data,) * n_in, out_shardings=data)


class PoseEstimator:
    """Convenience wrapper bundling variables + the fused predict fn."""

    def __init__(self, cfg: Config, variables, joint_info, mesh=None, **kw):
        self.cfg = cfg
        self.variables = variables
        self.joint_info = joint_info
        root = joint_info.names.index("pelv") if "pelv" in joint_info.names else 0
        self._fn = make_predict_fn(
            cfg, joint_info.mirror_mapping, root_index=root, mesh=mesh, **kw
        )

    def predict_crops(self, crops_uint8, intrinsics):
        return self._fn(self.variables, jnp.asarray(crops_uint8), jnp.asarray(intrinsics))
