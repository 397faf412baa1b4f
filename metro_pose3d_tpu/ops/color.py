"""On-device color augmentation + normalization (SURVEY.md §3.1 step 4).

The reference jitters brightness/contrast/saturation/hue on the host inside
preprocessing workers; here the jitter is a handful of fused elementwise ops
(VPU work, fused by XLA into the warp epilogue). Parameters are sampled
per-crop (host or `jax.random`) so the transform itself is deterministic.

All ops act on float images in [0, 1]; hue rotation uses the YIQ
luma-preserving rotation (standard linear RGB approximation).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from metro_pose3d_tpu import reference_constants as C

# Rec.601 luma
_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)
# RGB -> YIQ and back (hue = rotation of the IQ plane)
_RGB2YIQ = jnp.array(
    [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]],
    jnp.float32,
)
import numpy as _np

_YIQ2RGB = jnp.asarray(_np.linalg.inv(_np.asarray(_RGB2YIQ)), jnp.float32)


def color_jitter(images, brightness, contrast, saturation, hue):
    """Apply per-image color jitter.

    images: [B, H, W, 3] float in [0, 1].
    brightness: [B] additive shift.
    contrast:   [B] multiplicative factor about 0.5.
    saturation: [B] multiplicative factor about per-pixel luma.
    hue:        [B] rotation in radians of the chroma plane.
    """
    b = brightness[:, None, None, None]
    c = contrast[:, None, None, None]
    s = saturation[:, None, None, None]

    x = images + b
    x = (x - 0.5) * c + 0.5
    # HIGHEST on all color-space einsums: the TPU-default bf16 matmul loses
    # ~0.4% relative, visible as banding after the uint8 round-trip
    luma = jnp.einsum("bhwc,c->bhw", x, _LUMA,
                      precision=jax.lax.Precision.HIGHEST)[..., None]
    x = luma + (x - luma) * s

    cos_h = jnp.cos(hue)[:, None, None]
    sin_h = jnp.sin(hue)[:, None, None]
    yiq = jnp.einsum("ij,bhwj->bhwi", _RGB2YIQ, x,
                     precision=jax.lax.Precision.HIGHEST)
    i, q = yiq[..., 1], yiq[..., 2]
    yiq = jnp.stack(
        [yiq[..., 0], i * cos_h - q * sin_h, i * sin_h + q * cos_h], axis=-1
    )
    x = jnp.einsum("ij,bhwj->bhwi", _YIQ2RGB, yiq,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(x, 0.0, 1.0)


def composite_background(sources_u8, masks_u8, bg_bank_u8, bg_params):
    """Green-screen background replacement in SOURCE TILE space.

    sources_u8: [B, T, T, 3] uint8 tiles; masks_u8: [B, T, T] uint8 (255 =
    foreground, 3DHP FGmasks warped to tile coords by the host ROI slice);
    bg_bank_u8: [N, T, T, 3] uint8 HBM-resident bank; bg_params: [B, 2]
    (enabled flag, bank index). One fused lerp BEFORE the crop warp — the
    warp then sees the composited scene, so background replacement costs no
    second homography gather (reference composites the full frame on host:
    `augmentation/background.py`).
    """
    enabled = bg_params[:, 0][:, None, None, None]
    idx = bg_params[:, 1].astype(jnp.int32)
    bg = jnp.take(bg_bank_u8, idx, axis=0).astype(jnp.float32)
    src = sources_u8.astype(jnp.float32)
    alpha = (masks_u8.astype(jnp.float32) / 255.0)[..., None]
    out = src * alpha + bg * (1.0 - alpha)
    out = src + enabled * (out - src)
    # round half-up like the host tile paths (C extension / numpy) — a bare
    # uint8 cast truncates and biases the blend up to 1 LSB dark
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


def normalize(images01):
    """[0,1] float images -> model input range [-1, 1]."""
    return images01 * (255.0 * C.IMAGE_SCALE) + C.IMAGE_OFFSET


def denormalize(images):
    return (images - C.IMAGE_OFFSET) / (255.0 * C.IMAGE_SCALE)
