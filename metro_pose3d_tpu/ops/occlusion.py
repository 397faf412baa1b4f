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
    """Warp occluder tiles into crop space and composite (reference form).

    crops:          [B, S, S, 3] float (any consistent range; alpha in [0,1]).
    occluder_tiles: [B, T, T, 4] RGBA, color channels in the crops' range,
                    alpha in [0, 1] (host pre-selects one tile per crop from
                    the occluder bank).
    placements:     [B, 2, 3] affine maps from crop pixel -> tile pixel.
    enabled:        [B] {0,1} — occlusion probability gate (sampled host-side
                    so the device graph stays static).

    This vmapped formulation is the numerical reference; the production
    path is `occlude_with_bank` below (same math, gathers restructured for
    the platform — see ops/warp.py for the measurements).
    """
    b, s, _, _ = crops.shape

    def one(crop, tile, aff, on):
        ys = jnp.arange(s, dtype=jnp.float32)
        xs = jnp.arange(s, dtype=jnp.float32)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        p = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)
        src = jnp.einsum("ij,hwj->hwi", aff, p,
                         precision=jax.lax.Precision.HIGHEST)  # (S,S,2) tile px
        rgba = bilinear_sample(tile, src)  # zero alpha outside the tile
        rgba = rgba * on  # disabled -> fully transparent
        return paste_rgba(crop[None], rgba[None])[0]

    return jax.vmap(one)(crops, occluder_tiles, placements, enabled.astype(crops.dtype))


def pack_occluder_bank(bank_rgba01: jnp.ndarray) -> jnp.ndarray:
    """[N, T, T, 4] float RGBA in [0,1] -> windowed packed-int32 table.

    RGBA quantizes to 8 bits per channel (the bank originates from uint8
    images anyway) and packs into ONE int32 per texel; rows are pre-windowed
    exactly like the warp sampler's source table (stride-2 width-3 windows,
    vertically paired), so compositing costs ONE flat `take` per crop pixel.
    Returns [N * T * (T//2), 6] int32; requires even T.
    """
    from metro_pose3d_tpu.ops.packed_gather import build_windowed_table

    n, t, tw, _ = bank_rgba01.shape
    assert t == tw and t % 2 == 0, f"even square occluder tiles required, got {bank_rgba01.shape}"
    u8 = jnp.clip(jnp.round(bank_rgba01 * 255.0), 0, 255).astype(jnp.int32)
    packed = u8[..., 0] | (u8[..., 1] << 8) | (u8[..., 2] << 16) | (u8[..., 3] << 24)
    return build_windowed_table(packed)


def pack_occluder_bank_raw(bank_rgba01: jnp.ndarray, pad_to: int = 128) -> jnp.ndarray:
    """[N, T, T, 4] float RGBA in [0,1] -> [N, Tp, Tp] packed int32 planes.

    Unwindowed variant feeding the Mosaic two-pass occluder kernel
    (`warp_pallas.sample_occluders_twopass`); tiles zero-pad up to the
    kernel's 128-lane granularity (invisible: the pad has alpha 0).
    """
    n, t, tw, _ = bank_rgba01.shape
    assert t == tw, f"square occluder tiles required, got {bank_rgba01.shape}"
    u8 = jnp.clip(jnp.round(bank_rgba01 * 255.0), 0, 255).astype(jnp.int32)
    packed = u8[..., 0] | (u8[..., 1] << 8) | (u8[..., 2] << 16) | (u8[..., 3] << 24)
    pad = (-t) % pad_to
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, pad), (0, pad)))
    return packed


def occlude_with_bank_twopass(crops, bank_packed_raw, tile_indices, placements,
                              enabled):
    """Two-pass-kernel variant of `occlude_with_bank` (same contract, with
    the raw [N,Tp,Tp] packed bank from `pack_occluder_bank_raw`)."""
    from metro_pose3d_tpu.ops.warp_pallas import sample_occluders_twopass

    rgba = sample_occluders_twopass(
        bank_packed_raw, tile_indices, placements, crops.shape[1]
    )
    rgba = rgba * enabled.astype(jnp.float32)[:, None, None, None]
    return paste_rgba(crops, rgba)


def occlude_with_bank(crops, packed_table, tile_side, tile_indices, placements,
                      enabled):
    """Composite occluders from the packed bank table (production path).

    crops [B,S,S,3] float in [0,1]; packed_table from `pack_occluder_bank`;
    tile_indices [B] int32 selects the bank tile per crop; placements
    [B,2,3] crop-px -> tile-px affine; enabled [B] {0,1}.
    """
    b, s, _, _ = crops.shape
    t = tile_side

    ys = jnp.arange(s, dtype=jnp.float32)
    xs = jnp.arange(s, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (S,S,3)
    src = jnp.einsum("bij,hwj->bhwi", placements.astype(jnp.float32), grid,
                     precision=jax.lax.Precision.HIGHEST)
    u, v = src[..., 0], src[..., 1]
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0).astype(jnp.float32)
    fy = (v - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    from metro_pose3d_tpu.ops.packed_gather import (
        bilinear_weights, gather_bilinear_taps, tap_masks,
    )

    base = (tile_indices.astype(jnp.int32) * t)[:, None, None]
    a_l, a_r, b_l, b_r = gather_bilinear_taps(packed_table, base, x0i, y0i, t, t)

    def unpack(px):
        return jnp.stack(
            [(px & 0xFF), ((px >> 8) & 0xFF), ((px >> 16) & 0xFF),
             ((px >> 24) & 0xFF)],
            axis=-1,
        ).astype(jnp.float32) / 255.0

    m00, m01, m10, m11 = tap_masks(x0i, y0i, t, t)
    w00, w01, w10, w11 = bilinear_weights(fx, fy)
    zero = jnp.zeros((), jnp.float32)
    rgba = (
        w00 * jnp.where(m00[..., None], unpack(a_l), zero)
        + w01 * jnp.where(m01[..., None], unpack(a_r), zero)
        + w10 * jnp.where(m10[..., None], unpack(b_l), zero)
        + w11 * jnp.where(m11[..., None], unpack(b_r), zero)
    )
    rgba = rgba * enabled.astype(jnp.float32)[:, None, None, None]
    return paste_rgba(crops, rgba)
