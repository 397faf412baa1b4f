"""Training losses: root-relative 3D L1 + 2D heatmap L1, mixed 2D/3D batches.

Responsibility-parity with the reference's loss construction (SURVEY.md §3.2):
  * 3D loss on ROOT-RELATIVE metric coords — the volume center is a free
    gauge, fixed by root-centering both prediction and ground truth.
  * 2D loss on crop-pixel coords, masked by in-crop validity; 2D-only
    examples (e.g. MPII) contribute ONLY this term — per-example `is_3d`
    masking implements the truncation-robust 2D/3D supervision mixing.
All terms are validity-weighted means; everything is jittable and static.
"""
from __future__ import annotations

import jax.numpy as jnp

from metro_pose3d_tpu.config import Config
from metro_pose3d_tpu.models.metro import decode_metro, decode_twofive
from metro_pose3d_tpu.ops.decode import root_relative


def _masked_mean(err, mask):
    """Mean of `err` [B, J] under `mask` [B, J]; safe when mask is all-zero."""
    total = jnp.sum(err * mask)
    count = jnp.sum(mask)
    return total / jnp.maximum(count, 1.0)


def compute_losses(logits3d, logits2d, batch, cfg: Config, root_index: int = 0):
    """Returns (total_loss, dict of scalar sub-losses).

    batch fields (all device arrays):
      coords3d_true  [B, J, 3] camera-frame mm (garbage for 2D-only rows)
      coords2d_true  [B, J, 2] crop pixels
      joint_validity [B, J]    3D annotation validity
      joint_validity_2d [B, J] 2D in-crop validity
      is_3d          [B]       1.0 for 3D-supervised examples
    """
    mcfg = cfg.model
    gt3d = batch["coords3d_true"].astype(jnp.float32)
    gt2d = batch["coords2d_true"].astype(jnp.float32)
    valid3d = batch["joint_validity"].astype(jnp.float32)
    valid2d = batch["joint_validity_2d"].astype(jnp.float32)
    is3d = batch["is_3d"].astype(jnp.float32)[:, None]

    # The ROOT row of a root-relative L1 is structurally zero (a - a), but
    # XLA may materialize the two copies of `a` in different fusions with
    # different FMA contraction, leaving +/-eps — and d|x|/dx = sign(+/-eps)
    # = +/-1 instead of 0. The loss VALUE is unaffected (|eps| ~ 1e-7) but
    # the gradient gains a partitioning-dependent +/-1/(B*J) contribution
    # per example: measured 3-14%(!) of the total gradient norm varying
    # across unsharded / 8-device / 2-process compilations of the SAME
    # batch (round-4 multi-process rehearsal bisect; with the mask the
    # gradient is partition-stable to 1e-8). Multiplying the error by a
    # root-excluding mask is forward-identical (the entry was ~0) and kills
    # the subgradient noise; the validity DENOMINATOR keeps counting the
    # root row, preserving the reference's loss normalization.
    root_mask = jnp.ones((gt3d.shape[1],), jnp.float32).at[root_index].set(0.0)

    if mcfg.model_class == "metro":
        pose3d_mm, pose2d_px = decode_metro(logits3d, logits2d, mcfg)
        rel_pred = root_relative(pose3d_mm, root_index)
        rel_gt = root_relative(gt3d, root_index)
        err3d = jnp.abs(rel_pred - rel_gt).mean(-1) * root_mask  # [B, J], mm
        # meters keep the loss O(0.1) so Adam defaults behave
        loss3d = _masked_mean(err3d, valid3d * is3d) / 1000.0
    else:  # 2.5D image-aligned baseline
        pose25d, pose2d_px = decode_twofive(logits3d, logits2d, mcfg)
        gt_xy = gt2d / mcfg.proc_side
        gt_z = (gt3d[..., 2] - gt3d[..., root_index : root_index + 1, 2]) / mcfg.box_size_mm
        pred_xy = pose25d[..., :2] / mcfg.proc_side
        pred_z = (
            pose25d[..., 2] - pose25d[..., root_index : root_index + 1, 2]
        ) / mcfg.box_size_mm
        # same root-row subgradient hazard in the z term (z - z_root)
        err = (jnp.abs(pred_xy - gt_xy).mean(-1)
               + jnp.abs(pred_z - gt_z) * root_mask)
        loss3d = _masked_mean(err, valid3d * is3d)

    err2d = jnp.abs(pose2d_px - gt2d).mean(-1) / mcfg.proc_side
    loss2d = _masked_mean(err2d, valid2d)

    total = loss3d + cfg.train.loss_2d_weight * loss2d
    parts = {"loss3d": loss3d, "loss2d": loss2d}

    if cfg.train.absloss_weight > 0 and mcfg.model_class == "metro":
        # auxiliary absolute-pose loss: back-project through the 2D head and
        # crop intrinsics (the same closed-form LSQ used at inference) and
        # penalize against absolute camera-frame GT — trains the two heads
        # to be consistent under reconstruction
        from metro_pose3d_tpu.ops.pose3d import reconstruct_absolute

        abs_pred = reconstruct_absolute(
            rel_pred, pose2d_px, batch["intrinsics"].astype(jnp.float32)
        )
        err_abs = jnp.abs(abs_pred - gt3d).mean(-1)
        loss_abs = _masked_mean(err_abs, valid3d * is3d) / 1000.0
        parts["loss_abs"] = loss_abs
        total = total + cfg.train.absloss_weight * loss_abs

    parts["loss"] = total
    return total, parts
