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
    ray = jnp.einsum("ij,hwj->hwi", h_mat.astype(jnp.float32), p)
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
def warp_images(sources, h_mats, k_vecs, dists, out_side: int):
    """Batched crop warp: [B,Hs,Ws,C] sources -> [B,S,S,C] float32 crops.

    sources may be uint8 (converted on device); per-crop params from
    `geom.camera.get_warp_params`. Values keep the source scale ([0,255] for
    uint8 inputs) — normalization happens in the augmentation pipeline.
    """

    def one(src, h, k, d):
        coords, in_front = warp_coords(h, k, d, (out_side, out_side))
        return bilinear_sample(src, coords, valid_mask=in_front)

    return jax.vmap(one)(sources, h_mats, k_vecs, dists)
