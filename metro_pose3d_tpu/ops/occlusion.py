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
        src = jnp.einsum("ij,hwj->hwi", aff, p)  # (S, S, 2) tile coords
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
    n, t, tw, _ = bank_rgba01.shape
    assert t == tw and t % 2 == 0, f"even square occluder tiles required, got {bank_rgba01.shape}"
    u8 = jnp.clip(jnp.round(bank_rgba01 * 255.0), 0, 255).astype(jnp.int32)
    packed = u8[..., 0] | (u8[..., 1] << 8) | (u8[..., 2] << 16) | (u8[..., 3] << 24)
    padded = jnp.pad(packed, ((0, 0), (0, 1), (0, 2)))
    nwin = t // 2
    win = jnp.stack(
        [padded[:, :, 0:t:2], padded[:, :, 1 : t + 1 : 2], padded[:, :, 2 : t + 2 : 2]],
        axis=-1,
    )  # [N, T+1, nwin, 3]
    win6 = jnp.concatenate([win[:, :-1], win[:, 1:]], axis=-1)  # [N, T, nwin, 6]
    return win6.reshape(n * t * nwin, 6)


def occlude_with_bank(crops, packed_table, tile_side, tile_indices, placements,
                      enabled):
    """Composite occluders from the packed bank table (production path).

    crops [B,S,S,3] float in [0,1]; packed_table from `pack_occluder_bank`;
    tile_indices [B] int32 selects the bank tile per crop; placements
    [B,2,3] crop-px -> tile-px affine; enabled [B] {0,1}.
    """
    b, s, _, _ = crops.shape
    t = tile_side
    nwin = t // 2

    ys = jnp.arange(s, dtype=jnp.float32)
    xs = jnp.arange(s, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (S,S,3)
    src = jnp.einsum("bij,hwj->bhwi", placements.astype(jnp.float32), grid)
    u, v = src[..., 0], src[..., 1]
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0).astype(jnp.float32)
    fy = (v - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    xeff = jnp.clip(x0i, -1, t - 1)
    kwin = jnp.maximum(xeff, 0) >> 1
    p = xeff - 2 * kwin
    yeff = jnp.clip(y0i, -1, t - 1)
    yc = jnp.maximum(yeff, 0)
    qtop = yeff < yc
    base = (tile_indices.astype(jnp.int32) * t)[:, None, None]
    lin = ((base + yc) * nwin + kwin).reshape(-1)
    rows = jnp.take(packed_table, lin, axis=0).reshape(b, s, s, 6)

    def pick(r0, r1, r2):
        left = jnp.where(p <= 0, r0, r1)
        right = jnp.where(p < 0, r0, jnp.where(p == 0, r1, r2))
        return left, right

    a_l, a_r = pick(rows[..., 0], rows[..., 1], rows[..., 2])
    b_l, b_r = pick(rows[..., 3], rows[..., 4], rows[..., 5])
    b_l = jnp.where(qtop, a_l, b_l)
    b_r = jnp.where(qtop, a_r, b_r)

    def unpack(px):
        return jnp.stack(
            [(px & 0xFF), ((px >> 8) & 0xFF), ((px >> 16) & 0xFF),
             ((px >> 24) & 0xFF)],
            axis=-1,
        ).astype(jnp.float32) / 255.0

    x_in0 = (x0i >= 0) & (x0i < t)
    x_in1 = (x0i + 1 >= 0) & (x0i + 1 < t)
    y_in0 = (y0i >= 0) & (y0i < t)
    y_in1 = (y0i + 1 >= 0) & (y0i + 1 < t)
    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    zero = jnp.zeros((), jnp.float32)
    rgba = (
        w00 * jnp.where((x_in0 & y_in0)[..., None], unpack(a_l), zero)
        + w01 * jnp.where((x_in1 & y_in0)[..., None], unpack(a_r), zero)
        + w10 * jnp.where((x_in0 & y_in1)[..., None], unpack(b_l), zero)
        + w11 * jnp.where((x_in1 & y_in1)[..., None], unpack(b_r), zero)
    )
    rgba = rgba * enabled.astype(jnp.float32)[:, None, None, None]
    return paste_rgba(crops, rgba)
