"""On-device synthetic-occlusion compositing (SURVEY.md §3.1 step 4).

The reference pastes VOC object cutouts over crops on the host
(`augmentation/appearance.py`, his IROS'18 result that occlusion augmentation
is a large accuracy win). Here occluders are RGBA tiles resident in HBM; a
per-crop affine placement warps the occluder into crop space with the same
bilinear sampler as the main warp, and alpha-compositing is one fused FMA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from metro_pose3d_tpu.ops.warp import bilinear_sample


def paste_rgba(crops, occluder_rgba):
    """Alpha-composite [B,S,S,4] occluders over [B,S,S,3] crops (same range)."""
    rgb = occluder_rgba[..., :3]
    alpha = occluder_rgba[..., 3:4]
    return crops * (1.0 - alpha) + rgb * alpha


def occlude_with_tiles(crops, occluder_tiles, placements, enabled):
    """Warp occluder tiles into crop space and composite.

    crops:          [B, S, S, 3] float (any consistent range; alpha in [0,1]).
    occluder_tiles: [B, T, T, 4] RGBA, color channels in the crops' range,
                    alpha in [0, 1] (host pre-selects one tile per crop from
                    the occluder bank).
    placements:     [B, 2, 3] affine maps from crop pixel -> tile pixel.
    enabled:        [B] {0,1} — occlusion probability gate (sampled host-side
                    so the device graph stays static).
    """
    b, s, _, _ = crops.shape

    def one(crop, tile, aff, on):
        ys = jnp.arange(s, dtype=jnp.float32)
        xs = jnp.arange(s, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        p = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
        src = jnp.einsum("ij,hwj->hwi", aff, p)  # (S, S, 2) tile coords
        rgba = bilinear_sample(tile, src)  # zero alpha outside the tile
        rgba = rgba * on  # disabled -> fully transparent
        return paste_rgba(crop[None], rgba[None])[0]

    return jax.vmap(one)(crops, occluder_tiles, placements, enabled.astype(crops.dtype))
