"""MeTRo model: backbone -> metric-volumetric 3D head + 2D heatmap head.

Responsibility-parity with the reference's `src/model/metro.py` and
`src/model/twofive.py` (SURVEY.md §3.2 and §4.4):

    crop[B,S,S,3] -> resnet /16 dilated -> feat[B,16,16,C]
    -> conv1x1 -> [B,16,16,J*D] -> reshape [B,16,16,D,J]   (3D head)
    -> conv1x1 -> [B,16,16,J]                              (2D head)

Decode (pure functions, fused by jit into the head epilogue):
  * `decode_metro`   — MeTRo: ALL THREE heatmap axes metric (a fixed cube of
    `box_size_mm`), so decoded coords are bbox-scale- and distance-independent
    and can lie outside the crop (truncation robustness).
  * `decode_twofive` — the 2.5D image-aligned baseline (x, y in crop pixels,
    z metric), selected by `model.model_class=twofive` like the reference's
    `--model-class` flag.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from metro_pose3d_tpu.config import ModelConfig
from metro_pose3d_tpu.models.resnet import ResNet, parse_quantize_extras
from metro_pose3d_tpu.ops.decode import heatmap_to_image, heatmap_to_metric
from metro_pose3d_tpu.ops.soft_argmax import soft_argmax_2d, soft_argmax_3d


class MetroModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, crops, train: bool = False):
        """crops: [B, S, S, 3] normalized float -> (logits3d, logits2d).

        logits3d: [B, h, w, D, J] volumetric logits (h = w = S/stride)
        logits2d: [B, h, w, J] spatial logits
        """
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if train and cfg.quantize != "none":
            raise ValueError(
                "model.quantize is inference-only; training runs the bf16 graph"
            )
        feats = ResNet(
            variant=cfg.backbone,
            output_stride=cfg.stride,
            preact=cfg.preactivation,
            dtype=dtype,
            bn_momentum=cfg.bn_momentum,
            bn_epsilon=cfg.bn_epsilon,
            conv_padding=cfg.conv_padding,
            stride_position=cfg.stride_position,
            v2_biases=cfg.v2_biases,
            bn_group_size=cfg.bn_group_size,
            quantize=cfg.quantize,
            quantize_stages=cfg.quantize_stages,
            quantize_fused=cfg.quantize_fused,
            quantize_1x1_dot=cfg.quantize_1x1_dot,
            quantize_extras=cfg.quantize_extras,
            quantize_layout=cfg.quantize_layout,
            name="backbone",
        )(crops, train)

        b, h, w, _ = feats.shape
        j, d = cfg.num_joints, cfg.depth
        if ("heads" in parse_quantize_extras(cfg.quantize_extras)
                and cfg.quantize != "none"):
            # int8 1x1 heads: identical ("kernel", "bias") parameter tree as
            # nn.Conv, so any checkpoint serves either graph. Their input
            # (bn_final+ReLU features) is calibrated like the block convs.
            from metro_pose3d_tpu.models.quantize import QuantConv

            def head(features, name):
                return QuantConv(
                    features, (1, 1), use_bias=True, dtype=dtype,
                    mode=cfg.quantize, name=name,
                    dot_1x1=cfg.quantize_1x1_dot,
                )(feats)
        else:
            def head(features, name):
                return nn.Conv(
                    features, (1, 1), use_bias=True, dtype=dtype,
                    param_dtype=jnp.float32, name=name,
                )(feats)
        logits3d = head(j * d, "head3d").reshape(b, h, w, d, j).astype(jnp.float32)
        logits2d = head(j, "head2d").astype(jnp.float32)
        return logits3d, logits2d


def decode_metro(logits3d, logits2d, cfg: ModelConfig):
    """-> (pose3d_mm [B,J,3] centered-metric (gauge-free), pose2d_px [B,J,2])."""
    coords3d = soft_argmax_3d(logits3d)
    pose3d_mm = heatmap_to_metric(coords3d, cfg.box_size_mm)
    coords2d = soft_argmax_2d(logits2d)
    pose2d_px = heatmap_to_image(coords2d, cfg.proc_side)
    return pose3d_mm, pose2d_px


def decode_twofive(logits3d, logits2d, cfg: ModelConfig):
    """2.5D baseline decode: x,y crop pixels, z metric millimeters.

    The volumetric x/y axes are image-aligned (scale-dependent); this is the
    paper's comparison baseline, NOT truncation-robust.
    """
    coords3d = soft_argmax_3d(logits3d)
    xy_px = heatmap_to_image(coords3d[..., :2], cfg.proc_side)
    z_mm = (coords3d[..., 2:] - 0.5) * cfg.box_size_mm
    pose25d = jnp.concatenate([xy_px, z_mm], axis=-1)
    coords2d = soft_argmax_2d(logits2d)
    pose2d_px = heatmap_to_image(coords2d, cfg.proc_side)
    return pose25d, pose2d_px


def get_decoder(cfg: ModelConfig):
    return {"metro": decode_metro, "twofive": decode_twofive}[cfg.model_class]


def twofive_backproject(pose25d, intrinsics, root_depth_mm):
    """Lift the 2.5D baseline's (u, v, z_rel) output to camera-frame mm.

    Needs the person's (known or estimated) root depth — exactly the
    scale/distance dependence MeTRo's metric volume removes.
    """
    z_abs = pose25d[..., 2:] + root_depth_mm[..., None, None]
    fx = intrinsics[:, 0, 0][:, None, None]
    fy = intrinsics[:, 1, 1][:, None, None]
    cx = intrinsics[:, 0, 2][:, None, None]
    cy = intrinsics[:, 1, 2][:, None, None]
    x = (pose25d[..., 0:1] - cx) / fx * z_abs
    y = (pose25d[..., 1:2] - cy) / fy * z_abs
    return jnp.concatenate([x, y, z_abs], axis=-1)
