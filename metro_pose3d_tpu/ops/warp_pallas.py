"""Pallas/Mosaic kernel for the two-pass homography warp.

The companion field math and the plain-XLA formulation live in
`ops/warp_twopass.py`; this module executes the two resampling passes as
Mosaic `dynamic_gather` shuffles in VMEM. Motivation (VERDICT r1, weak #1):
the direct sampler pays one HBM-gather index per output pixel at the
platform's measured ~65M idx/s ceiling, ~11x the model's own cost on the
tile->skeleton path. In-VMEM shuffles are VPU-rate, so the sampler drops
from the dominant cost to noise.

Mosaic constraints probed on this toolchain (scripts/exp_pallas_gather2.py,
axon/jax 0.9.0):
  - `jnp.take_along_axis(x, idx, axis=1)` lowers to `tpu.dynamic_gather`
    ONLY when the operand/index/output shapes match exactly and the lane
    width is 128 — wider operands must be chunked into 128-lane pieces with
    the out-of-chunk lanes masked out of the select;
  - axis=0 (sublane) gathers only work within one 8-row tile, so the
    vertical pass instead transposes the pass-1 output in VMEM (Mosaic has
    a native transpose) and gathers along lanes again.

Kernel layout, grid = (B, S // 128) (one crop x one 128-wide column block):
  pass 1: gather the packed-RGB source rows horizontally at u1, lerp,
          round, repack -> t [TH, 128] int32
  transpose t -> tT [128, TH]
  pass 2: gather tT along lanes (source rows) at v, lerp, round, repack
          -> out block [128, S] int32, TRANSPOSED (rows = output columns)
The caller transposes back and unpacks in XLA (cheap elementwise/HBM ops)
and applies the in-front mask. Values round to uint8 after each pass, so
the kernel path differs from the float-exact direct sampler by <= 1 LSB on
top of the two-pass geometry (see warp_twopass.py docstring). NOTE:
`aug.warp_sampler` defaults to "auto", which selects THIS kernel for all
on-TPU crop extraction — train augment, eval from-tiles AND multi-person
frame mode — so on-chip eval numerics carry the <=1-LSB + sub-pixel
two-pass deltas; the exact direct sampler is the default only off-TPU
(the CPU test mesh and the golden suite) and on-TPU via
`aug.warp_sampler=packed`. Kernel-path numerics are pinned separately by
the interpret-mode goldens in tests/test_golden.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax import lax

from metro_pose3d_tpu.ops.warp_twopass import (
    N_PARAMS, choose_swap, map_uv_scalars, pack_params,
    solve_row_crossings_scalars, swapped_params,
)

_LANE = 128


def _gather_lanes_chunked(operand, idx, width):
    """take_along_axis(operand, idx, axis=1) for lane widths > 128.

    operand [R, width], idx [R, C] int32 (any values; out-of-range handled
    by the caller's masks — here they clip into the first/last chunk).
    Returns [R, C] gathered values. C must be a multiple of 128.
    """
    r, c = idx.shape
    nchunk = width // _LANE
    out = None
    for cb in range(0, c, _LANE):
        ib = idx[:, cb : cb + _LANE]
        acc = None
        for ci in range(nchunk):
            local = jnp.clip(ib - ci * _LANE, 0, _LANE - 1)
            g = jnp.take_along_axis(
                operand[:, ci * _LANE : (ci + 1) * _LANE], local, axis=1
            )
            if ci == 0:
                acc = g
            else:
                sel = ib >= ci * _LANE
                acc = jnp.where(sel, g, acc)
        out = acc if out is None else jnp.concatenate([out, acc], axis=1)
    return out


def _unpack_n(px, nch):
    return tuple(((px >> (8 * c)) & 0xFF).astype(jnp.float32) for c in range(nch))


def _pack_n(channels):
    out = None
    for c, val in enumerate(channels):
        q = jnp.clip(val + 0.5, 0.0, 255.0).astype(jnp.int32)
        out = q if out is None else out | (q << (8 * c))
    return out


def _lerp_pass(tap0, tap1, frac, m0, m1, nch):
    """Masked 1-D lerp of two packed taps -> repacked int32."""
    zero = jnp.zeros((), jnp.float32)
    w0 = jnp.where(m0, 1.0 - frac, zero)
    w1 = jnp.where(m1, frac, zero)
    c0 = _unpack_n(tap0, nch)
    c1 = _unpack_n(tap1, nch)
    return _pack_n([w0 * a + w1 * b for a, b in zip(c0, c1)])


def _resample_twopass(src, u1, vt, tile_h, tile_w, nch):
    """Shared two-pass core: packed src [TH, TW] -> packed out [128, S].

    u1 [TH, 128]: pass-1 horizontal positions for this 128-wide column
    block; vt [128, S]: pass-2 vertical positions, transposed (rows =
    output columns). Output stays transposed; callers swap back in XLA.
    """
    # ---- pass 1: horizontal resample of every source row ------------------
    x0f = jnp.floor(u1)
    fx = u1 - x0f
    x0 = x0f.astype(jnp.int32)
    m0 = (x0 >= 0) & (x0 < tile_w)
    m1 = (x0 + 1 >= 0) & (x0 + 1 < tile_w)
    tap0 = _gather_lanes_chunked(src, jnp.clip(x0, 0, tile_w - 1), tile_w)
    tap1 = _gather_lanes_chunked(src, jnp.clip(x0 + 1, 0, tile_w - 1), tile_w)
    t = _lerp_pass(tap0, tap1, fx, m0, m1, nch)  # [TH, 128] int32

    # ---- pass 2: vertical resample, as a lane gather on the transpose -----
    tt = t.T  # [128, TH]
    y0f = jnp.floor(vt)
    fy = vt - y0f
    y0 = y0f.astype(jnp.int32)
    n0 = (y0 >= 0) & (y0 < tile_h)
    n1 = (y0 + 1 >= 0) & (y0 + 1 < tile_h)
    tap0 = _gather_lanes_chunked(tt, jnp.clip(y0, 0, tile_h - 1), tile_h)
    tap1 = _gather_lanes_chunked(tt, jnp.clip(y0 + 1, 0, tile_h - 1), tile_h)
    return _lerp_pass(tap0, tap1, fy, n0, n1, nch)  # [128, S] int32


def _warp_kernel_skip(params_ref, swap_ref, src_ref, out_ref, t_ref, a0_ref,
                      a1_ref, *scratch, tile_h, tile_w, out_side,
                      newton_iters, swap_enabled):
    """Range-skip variant of `_warp_kernel` (round 3, DESIGN §3.1.1's last
    named lever): a typical crop samples only ~60% of the tile's rows and
    columns (frame mode: far less), so both passes predicate their work on
    the crop's actual source ranges.

    - pass 2's fields are computed FIRST; the clipped tap rows' min/max
      give the v-range [vlo, vhi];
    - pass 1 runs per 128-row chunk under `pl.when(chunk ∩ v-range)`,
      skipping the row-crossing solve, Newton refinement AND both gathers
      for rows pass 2 never blends;
    - within a live row chunk, the lane-gather loop over 128-wide source
      column chunks skips chunks outside the rows' u-range (reduced over
      rows inside the v-range only — junk rows would widen it to the
      whole tile);
    - pass 2's source-chunk loop skips chunks outside the v-range.

    Accumulators live in VMEM scratch because `pl.when` is statement-level;
    chunk selection is two-sided (membership, not overwrite order), which
    picks identical values. Skipped work only ever affected taps whose
    blend weight is exactly zero, so in exact arithmetic the output equals
    the non-skip kernel bit-for-bit; in compiled arithmetic the cond-wrapped
    field math may FMA-contract differently, flipping the uint8 rounding by
    <= 1 LSB on rare boundary pixels (measured 10/147456; contract pinned by
    tests/test_warp_twopass.py::test_skip_ranges_one_lsb).
    """
    ib = pl.program_id(0)
    jblk = pl.program_id(1)
    p = tuple(params_ref[ib, i] for i in range(N_PARAMS))

    if swap_enabled:
        scratch_ref = scratch[0]
        sw = swap_ref[ib] != 0

        @pl.when(sw)
        def _():
            scratch_ref[...] = src_ref[0].T

        @pl.when(jnp.logical_not(sw))
        def _():
            scratch_ref[...] = src_ref[0]

        src = scratch_ref[...]
    else:
        src = src_ref[0]

    x0blk = (jblk * _LANE).astype(jnp.float32)

    # ---- pass-2 fields first: the v-range gates pass 1 --------------------
    xo_t = x0blk + lax.broadcasted_iota(
        jnp.int32, (_LANE, out_side), 0).astype(jnp.float32)
    yo_t = lax.broadcasted_iota(
        jnp.int32, (_LANE, out_side), 1).astype(jnp.float32)
    _, vt, front_t = map_uv_scalars(p, xo_t, yo_t)
    vt = jnp.nan_to_num(jnp.clip(vt, -1e6, 1e6))
    y0f = jnp.floor(vt)
    fy = vt - y0f
    y0 = y0f.astype(jnp.int32)
    # front joins the tap masks: not-in-front pixels are zeroed anyway, and
    # excluding them keeps behind-camera junk from widening the v-range
    n0 = front_t & (y0 >= 0) & (y0 < tile_h)
    n1 = front_t & (y0 + 1 >= 0) & (y0 + 1 < tile_h)
    y0c = jnp.clip(y0, 0, tile_h - 1)
    y1c = jnp.clip(y0 + 1, 0, tile_h - 1)
    vlo = jnp.minimum(jnp.min(jnp.where(n0, y0c, tile_h - 1)),
                      jnp.min(jnp.where(n1, y1c, tile_h - 1)))
    vhi = jnp.maximum(jnp.max(jnp.where(n0, y0c, 0)),
                      jnp.max(jnp.where(n1, y1c, 0)))

    # ---- pass 1: horizontal resample, per live 128-row chunk --------------
    nchunk1 = tile_w // _LANE
    for row0 in range(0, tile_h, _LANE):
        pred_rows = (row0 <= vhi) & (row0 + _LANE - 1 >= vlo)

        @pl.when(pred_rows)
        def _(row0=row0):
            ysi = row0 + lax.broadcasted_iota(jnp.int32, (_LANE, _LANE), 0)
            ys = ysi.astype(jnp.float32)
            xo = x0blk + lax.broadcasted_iota(
                jnp.int32, (_LANE, _LANE), 1).astype(jnp.float32)
            ystar = solve_row_crossings_scalars(p, ys, xo, newton_iters)
            u1, _, _ = map_uv_scalars(p, xo, ystar)
            u1 = jnp.nan_to_num(jnp.clip(u1, -1e6, 1e6))
            x0f = jnp.floor(u1)
            fx = u1 - x0f
            x0 = x0f.astype(jnp.int32)
            m0 = (x0 >= 0) & (x0 < tile_w)
            m1 = (x0 + 1 >= 0) & (x0 + 1 < tile_w)
            x0c = jnp.clip(x0, 0, tile_w - 1)
            x1c = jnp.clip(x0 + 1, 0, tile_w - 1)
            rows_live = (ysi >= vlo) & (ysi <= vhi)
            use0 = m0 & rows_live
            use1 = m1 & rows_live
            ulo = jnp.minimum(jnp.min(jnp.where(use0, x0c, tile_w - 1)),
                              jnp.min(jnp.where(use1, x1c, tile_w - 1)))
            uhi = jnp.maximum(jnp.max(jnp.where(use0, x0c, 0)),
                              jnp.max(jnp.where(use1, x1c, 0)))
            a0_ref[...] = jnp.zeros((_LANE, _LANE), jnp.int32)
            a1_ref[...] = jnp.zeros((_LANE, _LANE), jnp.int32)
            for ci in range(nchunk1):
                c0 = ci * _LANE
                pred_cols = (uhi >= c0) & (ulo < c0 + _LANE)

                @pl.when(pred_cols)
                def _(c0=c0):
                    chunk = src[row0:row0 + _LANE, c0:c0 + _LANE]
                    g0 = jnp.take_along_axis(
                        chunk, jnp.clip(x0c - c0, 0, _LANE - 1), axis=1)
                    g1 = jnp.take_along_axis(
                        chunk, jnp.clip(x1c - c0, 0, _LANE - 1), axis=1)
                    in0 = (x0c >= c0) & (x0c < c0 + _LANE)
                    in1 = (x1c >= c0) & (x1c < c0 + _LANE)
                    a0_ref[...] = jnp.where(in0, g0, a0_ref[...])
                    a1_ref[...] = jnp.where(in1, g1, a1_ref[...])

            t_ref[row0:row0 + _LANE, :] = _lerp_pass(
                a0_ref[...], a1_ref[...], fx, m0, m1, nch=3)

    # ---- pass 2: vertical resample on the transpose, v-range chunks only --
    tt = t_ref[...].T  # [128, TH]
    nchunk2 = tile_h // _LANE
    for cb in range(0, out_side, _LANE):
        ib0 = y0c[:, cb:cb + _LANE]
        ib1 = y1c[:, cb:cb + _LANE]
        a0_ref[...] = jnp.zeros((_LANE, _LANE), jnp.int32)
        a1_ref[...] = jnp.zeros((_LANE, _LANE), jnp.int32)
        for ci in range(nchunk2):
            c0 = ci * _LANE
            pred = (vhi >= c0) & (vlo < c0 + _LANE)

            @pl.when(pred)
            def _(c0=c0):
                chunk = tt[:, c0:c0 + _LANE]
                g0 = jnp.take_along_axis(
                    chunk, jnp.clip(ib0 - c0, 0, _LANE - 1), axis=1)
                g1 = jnp.take_along_axis(
                    chunk, jnp.clip(ib1 - c0, 0, _LANE - 1), axis=1)
                in0 = (ib0 >= c0) & (ib0 < c0 + _LANE)
                in1 = (ib1 >= c0) & (ib1 < c0 + _LANE)
                a0_ref[...] = jnp.where(in0, g0, a0_ref[...])
                a1_ref[...] = jnp.where(in1, g1, a1_ref[...])

        blk = _lerp_pass(a0_ref[...], a1_ref[...], fy[:, cb:cb + _LANE],
                         n0[:, cb:cb + _LANE], n1[:, cb:cb + _LANE], nch=3)
        out_ref[0, :, cb:cb + _LANE] = jnp.where(
            front_t[:, cb:cb + _LANE], blk, 0)


def _warp_kernel(params_ref, swap_ref, src_ref, out_ref, *scratch,
                 tile_h, tile_w, out_side, newton_iters, swap_enabled):
    """One (crop, 128-wide column block) step, fields computed IN-KERNEL.

    Round 3 (VERDICT r2 weak #4): u1/vt come from the 18 per-crop scalars
    (scalar-prefetched to SMEM) instead of precomputed HBM field arrays —
    that removes the XLA field stage (5.13 of 10.0 ms at bs256) AND
    ~200 MB/step of u1/vt HBM traffic. The in-front mask falls out of the
    same math (pz sign) and is applied in-kernel, so the caller's unpack
    is pure elementwise.
    """
    ib = pl.program_id(0)
    jblk = pl.program_id(1)
    p = tuple(params_ref[ib, i] for i in range(N_PARAMS))

    if swap_enabled:
        # transposed-source route for ill-conditioned (near +-90 deg) crops:
        # params were pre-swapped on the host side; here only the tile
        # transposes. pl.when keeps the common path a plain VMEM copy.
        scratch_ref = scratch[0]
        sw = swap_ref[ib] != 0

        @pl.when(sw)
        def _():
            scratch_ref[...] = src_ref[0].T

        @pl.when(jnp.logical_not(sw))
        def _():
            scratch_ref[...] = src_ref[0]

        src = scratch_ref[...]
    else:
        src = src_ref[0]

    x0 = (jblk * _LANE).astype(jnp.float32)
    # pass-1 field: u1[ys, xo] for this block's 128 output columns
    # (Mosaic's tpu.iota is integer-only — generate int32 and convert)
    ys = lax.broadcasted_iota(jnp.int32, (tile_h, _LANE), 0).astype(jnp.float32)
    xo = x0 + lax.broadcasted_iota(
        jnp.int32, (tile_h, _LANE), 1).astype(jnp.float32)
    ystar = solve_row_crossings_scalars(p, ys, xo, newton_iters)
    u1, _, _ = map_uv_scalars(p, xo, ystar)
    u1 = jnp.nan_to_num(jnp.clip(u1, -1e6, 1e6))

    # pass-2 field (transposed layout): rows = output columns, lanes = rows
    xo_t = x0 + lax.broadcasted_iota(
        jnp.int32, (_LANE, out_side), 0).astype(jnp.float32)
    yo_t = lax.broadcasted_iota(
        jnp.int32, (_LANE, out_side), 1).astype(jnp.float32)
    _, vt, front_t = map_uv_scalars(p, xo_t, yo_t)
    vt = jnp.nan_to_num(jnp.clip(vt, -1e6, 1e6))

    out = _resample_twopass(src, u1, vt, tile_h, tile_w, nch=3)
    out_ref[0] = jnp.where(front_t, out, 0)


@functools.partial(
    jax.jit, static_argnames=("out_side", "newton_iters", "skip_ranges"))
def warp_images_twopass_pallas(sources_u8, h_mats, k_vecs, dists,
                               out_side: int, source_indices=None,
                               newton_iters: int = 3,
                               skip_ranges: bool = False):
    """Two-pass Mosaic warp: [B,TH,TW,3] uint8 -> [B,S,S,3] f32 in [0,255].

    Same contract as `warp.warp_images`. Requires TH, TW, S multiples of
    128 (the dispatcher in `warp.py` falls back otherwise). With
    `source_indices`, crop i samples tile source_indices[i] (frame mode).
    Square tiles get the transposed-source reroute for near +-90-deg
    rotations (`warp_twopass.choose_swap`); non-square (frame-mode pads)
    keep the default route. `skip_ranges` selects the range-predicated
    kernel, which skips source rows/columns the crop never samples (see
    `_warp_kernel_skip`; <= 1-LSB-on-rare-pixels contract).
    """
    b = h_mats.shape[0]
    nsrc, th, tw, _ = sources_u8.shape
    s = out_side
    if th % _LANE or tw % _LANE or s % _LANE:
        raise ValueError(f"kernel path needs 128-multiples, got {sources_u8.shape}, {s}")
    if source_indices is not None and nsrc != 1:
        raise ValueError("kernel path supports per-crop tiles or one shared frame")
    del source_indices  # nsrc == 1 <=> frame mode (every crop reads tile 0)

    s32 = sources_u8.astype(jnp.int32)
    packed = s32[..., 0] | (s32[..., 1] << 8) | (s32[..., 2] << 16)  # [N,TH,TW]

    h_mats = h_mats.astype(jnp.float32)
    k_vecs = k_vecs.astype(jnp.float32)
    dists = dists.astype(jnp.float32)
    swap_enabled = th == tw
    if swap_enabled:
        swap = choose_swap(h_mats, k_vecs, dists, th, tw)
        h_sw, k_sw, d_sw = swapped_params(h_mats, k_vecs, dists)
        h_eff = jnp.where(swap[:, None, None], h_sw, h_mats)
        k_eff = jnp.where(swap[:, None], k_sw, k_vecs)
        d_eff = jnp.where(swap[:, None], d_sw, dists)
        params = pack_params(h_eff, k_eff, d_eff)
        swap_i = swap.astype(jnp.int32)
    else:
        params = pack_params(h_mats, k_vecs, dists)
        swap_i = jnp.zeros((b,), jnp.int32)

    nblocks = s // _LANE
    grid = (b, nblocks)
    # params/swap ride scalar prefetch: Mosaic requires VMEM blocks tiled
    # 8x128, so small per-crop scalar rows must be SMEM prefetch operands
    # (same pattern as the occluder kernel's bank indices)
    swap_scratch = [pltpu.VMEM((th, tw), jnp.int32)] if swap_enabled else []
    if skip_ranges:
        kernel = _warp_kernel_skip
        scratch_shapes = [
            pltpu.VMEM((th, _LANE), jnp.int32),    # t (pass-1 output)
            pltpu.VMEM((_LANE, _LANE), jnp.int32),  # tap-0 accumulator
            pltpu.VMEM((_LANE, _LANE), jnp.int32),  # tap-1 accumulator
        ] + swap_scratch
    else:
        kernel = _warp_kernel
        scratch_shapes = swap_scratch
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, tw), (lambda i, j, pp, sw: (0, 0, 0)) if nsrc == 1
                         else (lambda i, j, pp, sw: (i, 0, 0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _LANE, s), lambda i, j, pp, sw: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch_shapes,
    )
    out_t = pl.pallas_call(
        functools.partial(
            kernel, tile_h=th, tile_w=tw, out_side=s,
            newton_iters=newton_iters, swap_enabled=swap_enabled,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, s), jnp.int32),
    )(params, swap_i, packed)

    out_packed = jnp.swapaxes(out_t, 1, 2)  # back to [B, yo, xo]
    return jnp.stack(
        [(out_packed & 0xFF), ((out_packed >> 8) & 0xFF),
         ((out_packed >> 16) & 0xFF)], axis=-1
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Occluder sampling: affine RGBA warp out of a bank (ops/occlusion.py's
# production path). Same two-pass core; differences from the crop warp:
#   - the mapping is affine, so both passes' fields are closed-form;
#   - occluder rotations are full-range (-pi, pi], so the Catmull-Smith
#     "bottleneck" degeneracy (pass-1 denominator ~ 0 near +-90 deg) is
#     dodged by sampling the TRANSPOSED tile with a row-swapped affine
#     whenever |d v/d y| < |d u/d y| — one VMEM transpose + select;
#   - each crop reads its own bank tile, selected by a scalar-prefetch
#     index feeding the bank BlockSpec's index_map.
# ---------------------------------------------------------------------------


def _occluder_kernel(tile_idx_ref, swap_ref, bank_ref, u1_ref, vt_ref,
                     out_ref, *, tile_side):
    del tile_idx_ref  # consumed by the bank BlockSpec's index_map
    src = bank_ref[0]  # [T2, T2] packed RGBA int32
    swap = swap_ref[pl.program_id(0)] != 0
    src = jnp.where(swap, src.T, src)
    out_ref[0] = _resample_twopass(
        src, u1_ref[0], vt_ref[0], tile_side, tile_side, nch=4
    )


def _occluder_fields(ae, tile_side: int, out_side: int):
    """Closed-form two-pass fields for one crop's (swap-adjusted) affine."""
    ys = jnp.arange(tile_side, dtype=jnp.float32)[:, None]
    xo = jnp.arange(out_side, dtype=jnp.float32)[None, :]
    den = ae[1, 1]
    den = jnp.where(jnp.abs(den) < 1e-6, jnp.where(den < 0, -1e-6, 1e-6), den)
    ystar = (ys - ae[1, 2] - ae[1, 0] * xo) / den
    u1 = ae[0, 0] * xo + ae[0, 1] * ystar + ae[0, 2]  # [T2, S]
    yo = jnp.arange(out_side, dtype=jnp.float32)[:, None]
    v = ae[1, 0] * xo + ae[1, 1] * yo + ae[1, 2]  # [S, S]
    return jnp.clip(u1, -1e6, 1e6), v


@functools.partial(jax.jit, static_argnames=("out_side",))
def sample_occluders_twopass(bank_packed, tile_indices, placements,
                             out_side: int):
    """[N,T2,T2] packed-RGBA bank -> [B,S,S,4] float RGBA in [0,1].

    placements [B,2,3]: crop px -> tile px affine (same contract as
    `occlusion.occlude_with_bank`); T2 and S must be multiples of 128
    (callers pad the bank — zero padding is invisible: alpha 0).
    """
    n, t2, t2w = bank_packed.shape
    s = out_side
    if t2 != t2w or t2 % _LANE or s % _LANE:
        raise ValueError(f"kernel path needs square 128-multiple tiles, got {bank_packed.shape}, {s}")
    b = placements.shape[0]
    a = placements.astype(jnp.float32)
    # transposed-tile route when the pass-1 denominator |dv/dy| is the
    # smaller of the two y-coefficients (rotation near +-90 deg)
    swap = jnp.abs(a[:, 1, 1]) < jnp.abs(a[:, 0, 1])
    ae = jnp.where(swap[:, None, None], a[:, ::-1, :], a)
    u1, v = jax.vmap(lambda m: _occluder_fields(m, t2, s))(ae)
    vt = jnp.swapaxes(v, 1, 2)

    grid = (b, s // _LANE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            # index maps receive the grid indices first, then the
            # scalar-prefetch refs
            pl.BlockSpec((1, t2, t2), lambda i, j, ti, sw: (ti[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t2, _LANE), lambda i, j, ti, sw: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANE, s), lambda i, j, ti, sw: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _LANE, s), lambda i, j, ti, sw: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out_t = pl.pallas_call(
        functools.partial(_occluder_kernel, tile_side=t2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, s, s), jnp.int32),
    )(tile_indices.astype(jnp.int32), swap.astype(jnp.int32), bank_packed, u1, vt)

    out_packed = jnp.swapaxes(out_t, 1, 2)
    rgba = jnp.stack(
        [(out_packed >> (8 * c)) & 0xFF for c in range(4)], axis=-1
    ).astype(jnp.float32) / 255.0
    return rgba
