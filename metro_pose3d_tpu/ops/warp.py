"""On-device homography/distortion image warp — the OpenCV replacement.

The reference warps person crops on the host with `cv2.warpPerspective`
inside worker processes (`cameralib.reproject_image`, SURVEY.md §4.1 "host
hot loop #1"). Here the warp is a batched, jittable XLA program that runs on
TPU next to the model: the host only ships fixed-size uint8 source tiles and
3x3 warp parameters (`geom.camera.get_warp_params`), and crop extraction,
augmentation and normalization fuse into the inference/training graph.

Map for output pixel p = (x, y, 1):
    ray    = H @ p                  (H = R_src R_dst^T K_dst^{-1}, per crop)
    (xn,yn)= ray.xy / ray.z         (perspective divide)
    (xd,yd)= distort(xn, yn)        (OpenCV k1,k2,p1,p2,k3 model)
    src_px = (fx*xd + cx, fy*yd + cy)
followed by bilinear sampling with zero border (cv2 BORDER_CONSTANT default).

Why XLA and not a Pallas kernel: the sampler is one batched dynamic gather
per crop (`jnp.take` over the flattened tile), which XLA lowers to the TPU
gather unit directly; Mosaic (Pallas) on this toolchain only supports
same-shape "shuffle" gathers (`dynamic_gather` with indices shaped like the
operand), so a resampling gather cannot be expressed in-kernel — probed
2026-08-16 on jax 0.9.0/axon, see also the stem-pool measurements in
`ops/pool_pallas.py` for why custom-call boundaries are costly here. The
fused epilogue (occlusion/color/normalize) is elementwise and XLA fuses it
into the gather's consumer for free.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def distort_points(normalized: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """OpenCV distortion of (..., 2) normalized coords; dist: (..., 5)."""
    k1, k2, p1, p2, k3 = (dist[..., i] for i in range(5))
    x, y = normalized[..., 0], normalized[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def warp_coords(h_mat, k_vec, dist, out_shape):
    """Source-pixel coordinates for every output pixel of one crop.

    h_mat (3,3), k_vec (4,)=fx,fy,cx,cy, dist (5,) -> (H, W, 2) float32 and
    a (H, W) bool "in front of camera" mask.
    """
    out_h, out_w = out_shape
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    p = jnp.stack([grid_x, grid_y, jnp.ones_like(grid_x)], axis=-1)  # (H,W,3)
    # HIGHEST: the TPU-default bf16 einsum quantizes source coordinates to
    # ~0.8 px at tile scale (measured; scripts/exp_kernel_bisect.py round 2)
    ray = jnp.einsum("ij,hwj->hwi", h_mat.astype(jnp.float32), p,
                     precision=jax.lax.Precision.HIGHEST)
    z = ray[..., 2]
    in_front = z > 1e-9
    zsafe = jnp.where(in_front, z, 1.0)
    normalized = ray[..., :2] / zsafe[..., None]
    d = distort_points(normalized, dist.astype(jnp.float32))
    fx, fy, cx, cy = (k_vec[i] for i in range(4))
    u = d[..., 0] * fx + cx
    v = d[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1), in_front


def bilinear_sample(image, coords, valid_mask=None, border_value=0.0):
    """Bilinear sample of `image` [Hs, Ws, C] at `coords` [H, W, 2] (x, y).

    Zero (or `border_value`) outside the source image; pixel centers at
    integer coordinates. Gather is a flat `take` so XLA lowers it to a
    single TPU gather per crop.
    """
    hs, ws, c = image.shape
    img = image.astype(jnp.float32)
    u = coords[..., 0]
    v = coords[..., 1]
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = u - x0
    fy = v - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(hs * ws, c)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < ws) & (yi >= 0) & (yi < hs)
        lin = jnp.clip(yi, 0, hs - 1) * ws + jnp.clip(xi, 0, ws - 1)
        vals = jnp.take(flat, lin.reshape(-1), axis=0).reshape(*lin.shape, c)
        return jnp.where(inside[..., None], vals, border_value)

    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    out = (
        w00 * tap(y0i, x0i)
        + w01 * tap(y0i, x0i + 1)
        + w10 * tap(y0i + 1, x0i)
        + w11 * tap(y0i + 1, x0i + 1)
    )
    if valid_mask is not None:
        out = jnp.where(valid_mask[..., None], out, border_value)
    return out


@functools.partial(jax.jit, static_argnames=("out_side",))
def warp_images_reference(sources, h_mats, k_vecs, dists, out_side: int):
    """Per-crop vmapped warp (the straightforward formulation).

    Kept as the numerical reference and the path for float sources; the
    uint8 production path is `warp_images` below (identical math, gathers
    restructured for this platform's gather engine).
    """

    def one(src, h, k, d):
        coords, in_front = warp_coords(h, k, d, (out_side, out_side))
        return bilinear_sample(src, coords, valid_mask=in_front)

    return jax.vmap(one)(sources, h_mats, k_vecs, dists)


@functools.partial(jax.jit, static_argnames=("out_side",))
def _warp_images_packed(sources_u8, h_mats, k_vecs, dists, out_side: int,
                        source_indices=None):
    """Gather-engine-shaped warp for uint8 RGB tiles.

    Measured on the axon v5e: XLA `take` here is per-index-bound
    (~65-200M idx/s depending on row width) and value-bound (~0.5-2 GB/s);
    batched (vmapped) gathers are 16x slower and windowed (2,2)-slice
    gathers lower to serial loops. So the sampler (a) packs RGB into one
    int32 per pixel, (b) pre-builds stride-2 width-3 windowed rows PAIRED
    vertically (each table row holds the full 2x3 bilinear window for
    source rows y..y+1, columns 2k..2k+2), and (c) issues ONE global flat
    `take` for the whole batch — one index per output pixel instead of the
    naive form's 4 per-crop gathers of 3-value rows. 3.4x faster at
    [256,512,512,3]u8 -> 256^2 crops (1160 -> 337 ms).
    """
    nsrc, th, tw, _ = sources_u8.shape
    b = h_mats.shape[0]
    s = out_side
    # `source_indices` maps each crop to its source image; by default crop i
    # samples source i (the tile pipeline). Multi-person "frame mode" passes
    # ONE shared frame with all-zero indices, so the frame ships to the
    # device once instead of one tile per person.

    # ---- packed, windowed source table (see ops/packed_gather.py) ---------
    from metro_pose3d_tpu.ops.packed_gather import (
        bilinear_weights, build_windowed_table, gather_bilinear_taps, tap_masks,
    )

    s32 = sources_u8.astype(jnp.int32)
    packed = s32[..., 0] | (s32[..., 1] << 8) | (s32[..., 2] << 16)  # [N,TH,TW]
    flat = build_windowed_table(packed)

    # ---- per-crop sample coordinates --------------------------------------
    coords, in_front = jax.vmap(
        lambda h, k, d: warp_coords(h, k, d, (s, s))
    )(h_mats, k_vecs, dists)  # [B,S,S,2], [B,S,S]
    u = coords[..., 0]
    v = coords[..., 1]
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0).astype(jnp.float32)
    fy = (v - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if source_indices is None:
        src_idx = jnp.arange(b, dtype=jnp.int32)
    else:
        src_idx = source_indices.astype(jnp.int32)
    base = (src_idx * th)[:, None, None]
    a_l, a_r, b_l, b_r = gather_bilinear_taps(flat, base, x0i, y0i, th, tw)

    def unpack(px):
        return jnp.stack(
            [(px & 0xFF), ((px >> 8) & 0xFF), ((px >> 16) & 0xFF)], axis=-1
        ).astype(jnp.float32)

    # per-tap validity identical to bilinear_sample's zero-border policy
    m00, m01, m10, m11 = tap_masks(x0i, y0i, th, tw)
    w00, w01, w10, w11 = bilinear_weights(fx, fy)
    zero = jnp.zeros((), jnp.float32)
    out = (
        w00 * jnp.where(m00[..., None], unpack(a_l), zero)
        + w01 * jnp.where(m01[..., None], unpack(a_r), zero)
        + w10 * jnp.where(m10[..., None], unpack(b_l), zero)
        + w11 * jnp.where(m11[..., None], unpack(b_r), zero)
    )
    return jnp.where(in_front[..., None], out, zero)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001 — no backend at all
        return False


def _pad_for_kernel(sources):
    """Zero-pad tile dims up to multiples of 128 (the Mosaic lane width).

    Zero padding preserves the zero-border sampling policy exactly: taps in
    the pad region read the same zeros the border mask would have produced.
    """
    _, th, tw, _ = sources.shape
    ph = (-th) % 128
    pw = (-tw) % 128
    if ph or pw:
        sources = jnp.pad(sources, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return sources


def warp_images(sources, h_mats, k_vecs, dists, out_side: int,
                sampler: str = "auto", newton_iters: int = 3):
    """Batched crop warp: [B,Hs,Ws,C] sources -> [B,S,S,C] float32 crops.

    sampler:
      "auto"    — "twopass" on TPU for uint8 RGB with out_side % 128 == 0,
                  else "packed" (uint8 RGB, even width), else "reference".
      "twopass" — Mosaic two-pass kernel (`ops/warp_pallas.py`): 27x the
                  packed path on v5e (274.8 -> 10.0 ms at bs256 512^2->256^2,
                  scripts/exp_twopass_chip.py 2026-08-16); <= 1 LSB +
                  sub-pixel two-pass geometry vs the direct map.
      "packed"  — direct bilinear via the packed windowed HBM gather
                  (`_warp_images_packed`), exact vs cv2; golden-path default
                  off-TPU.
      "reference" — naive vmapped formulation (float sources, any channels).
    Values keep the source scale ([0,255] for uint8 inputs) — normalization
    happens in the augmentation pipeline.
    """
    u8rgb = sources.dtype == jnp.uint8 and sources.shape[-1] == 3
    if sampler == "auto":
        if u8rgb and out_side % 128 == 0 and _on_tpu():
            sampler = "twopass"
        elif u8rgb and sources.shape[2] % 2 == 0:
            sampler = "packed"
        else:
            sampler = "reference"
    if sampler == "twopass":
        from metro_pose3d_tpu.ops.warp_pallas import warp_images_twopass_pallas

        return warp_images_twopass_pallas(
            _pad_for_kernel(sources), h_mats, k_vecs, dists, out_side,
            newton_iters=newton_iters,
        )
    if sampler == "packed":
        return _warp_images_packed(sources, h_mats, k_vecs, dists, out_side)
    return warp_images_reference(sources, h_mats, k_vecs, dists, out_side)


def warp_from_frame(frame_u8, h_mats, k_vecs, dists, out_side: int,
                    sampler: str = "auto", newton_iters: int = 3):
    """Warp MANY crops out of ONE shared full frame ("frame mode").

    frame_u8 [H, W, 3] uint8 (W even); per-crop params in FRAME pixel
    coordinates (no tile rebasing). Used by the multi-person driver so the
    host ships one frame instead of one source tile per person. The shared
    frame maps to the two-pass kernel's nsrc == 1 broadcast (every grid
    step reads tile 0), so frame mode gets the same 27x speedup.
    """
    b = h_mats.shape[0]
    if sampler == "auto":
        sampler = "twopass" if (out_side % 128 == 0 and _on_tpu()) else "packed"
    if sampler == "twopass":
        from metro_pose3d_tpu.ops.warp_pallas import warp_images_twopass_pallas

        return warp_images_twopass_pallas(
            _pad_for_kernel(frame_u8[None]), h_mats, k_vecs, dists, out_side,
            newton_iters=newton_iters,
        )
    return _warp_images_packed(
        frame_u8[None], h_mats, k_vecs, dists, out_side,
        source_indices=jnp.zeros((b,), jnp.int32),
    )
