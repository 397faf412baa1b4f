"""Shared packed-windowed bilinear gather (the platform's fast sampler).

Both on-device samplers — the homography crop warp (`ops/warp.py`) and the
occluder compositor (`ops/occlusion.py`) — use the same access pattern,
shaped around measured XLA gather limits on this platform (flat takes are
per-index-bound; batched/windowed gathers degrade — see DESIGN.md §3):

1. pack each texel into ONE int32 (RGB, or RGBA for occluders);
2. pre-window rows: stride-2 width-3 horizontal windows, vertically paired,
   so one table row holds the full 2x3 bilinear neighborhood;
3. ONE global flat `jnp.take` per output sample, then 3-state selects for
   the horizontal/vertical borders (x0 == -1 / y0 == -1 read the window's
   first column/row; out-of-range taps are masked by the caller).
"""
from __future__ import annotations

import jax.numpy as jnp


def build_windowed_table(packed: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W] packed int32 texels -> [(N*H*(W//2)), 6] windowed table.

    Requires even W. Row ((n*H + y) * (W//2) + k) holds texels
    (y..y+1) x (2k..2k+2); the pad row/cols are zero and only ever read
    masked.
    """
    n, h, w = packed.shape
    assert w % 2 == 0, f"even width required, got {packed.shape}"
    padded = jnp.pad(packed, ((0, 0), (0, 1), (0, 2)))
    win = jnp.stack(
        [padded[:, :, 0:w:2], padded[:, :, 1 : w + 1 : 2], padded[:, :, 2 : w + 2 : 2]],
        axis=-1,
    )  # [N, H+1, W//2, 3]
    win6 = jnp.concatenate([win[:, :-1], win[:, 1:]], axis=-1)  # [N, H, W//2, 6]
    return win6.reshape(n * h * (w // 2), 6)


def gather_bilinear_taps(flat_table, src_rows_base, x0i, y0i, height, width):
    """Fetch the four packed bilinear taps for every output sample.

    flat_table: from `build_windowed_table` (built over `height` x `width`
        images); src_rows_base: broadcastable int32 = source_image_index *
        height (selects which image each sample reads); x0i/y0i: int32
        floor coordinates, any values (out-of-range handled).
    Returns (a_l, a_r, b_l, b_r): packed int32 taps at (y0,x0), (y0,x0+1),
        (y0+1,x0), (y0+1,x0+1) — garbage where out of range; callers mask
        with the standard border predicate on x0i/y0i.
    """
    nwin = width // 2
    xeff = jnp.clip(x0i, -1, width - 1)
    kwin = jnp.maximum(xeff, 0) >> 1
    p = xeff - 2 * kwin  # in {-1, 0, 1}
    yeff = jnp.clip(y0i, -1, height - 1)
    yc = jnp.maximum(yeff, 0)
    qtop = yeff < yc  # True only when y0 == -1

    lin = ((src_rows_base + yc) * nwin + kwin).reshape(-1)
    rows = jnp.take(flat_table, lin, axis=0).reshape(*x0i.shape, 6)

    def pick(r0, r1, r2):
        left = jnp.where(p <= 0, r0, r1)
        right = jnp.where(p < 0, r0, jnp.where(p == 0, r1, r2))
        return left, right

    a_l, a_r = pick(rows[..., 0], rows[..., 1], rows[..., 2])  # window row 0
    b_l, b_r = pick(rows[..., 3], rows[..., 4], rows[..., 5])  # window row 1
    # y0 == -1: the (valid) y0+1 tap is window row 0, not row 1
    b_l = jnp.where(qtop, a_l, b_l)
    b_r = jnp.where(qtop, a_r, b_r)
    return a_l, a_r, b_l, b_r


def tap_masks(x0i, y0i, height, width):
    """Border predicates for the four taps (zero-border policy)."""
    x_in0 = (x0i >= 0) & (x0i < width)
    x_in1 = (x0i + 1 >= 0) & (x0i + 1 < width)
    y_in0 = (y0i >= 0) & (y0i < height)
    y_in1 = (y0i + 1 >= 0) & (y0i + 1 < height)
    return (x_in0 & y_in0), (x_in1 & y_in0), (x_in0 & y_in1), (x_in1 & y_in1)


def bilinear_weights(fx, fy):
    """Standard bilinear weights, each expanded with a trailing channel dim."""
    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    return w00, w01, w10, w11
