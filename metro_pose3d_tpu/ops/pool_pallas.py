"""3x3 stride-2 SAME max pool (the ResNet stem pool): XLA fwd, safe bwd,
optional Pallas kernel.

Semantics match XLA/TF "SAME" (window at rows/cols 2i..2i+2, pad high
only), which is what the reference's slim `max_pool2d(..., 'SAME')`
computes — required for ImageNet weight-conversion parity (SURVEY.md §8
hard part 1).

The split forward/backward design is axon-specific: `lax.reduce_window` has
the fastest forward (its strided-window read fuses with the stem conv), but
its select-and-scatter GRADIENT emits NaNs on this platform (jax 0.9.0 /
v5e; minimal repro: grad of sum(reduce_window_max(conv(x))**2)), so
`custom_vjp` routes the backward through a shift-and-max decomposition
whose elementwise-max gradient is safe. A Pallas kernel (H-blocked, halo
via a clamped second input view) is kept selectable but measured slower
in-graph: the custom call's operand layout constraint blocks fusion with
the surrounding convs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # large-negative fill; representable in bf16/f32


_ROWS_PER_CHUNK = 8  # output rows processed per unrolled step (bounds VMEM temps)


def _maxpool_kernel(x_ref, nxt_ref, o_ref):
    # x_ref: [1, HB, W, C] — one H-block of the image. nxt_ref is the NEXT
    # H-block (same array, index map j+1 clamped), supplying the single halo
    # row the 3x3/2 window needs across the block boundary; for the last
    # block it aliases the current block and is masked to the SAME padding
    # value. C is the lane dim, W the sublane dim; H-axis ops are cheap
    # major-dim moves. The block is processed in chunks of `rh` output rows
    # so elementwise temporaries stay small (a single whole-image pass
    # overflowed the 16 MB scoped-VMEM budget at [128,128,64]f32).
    hb, w, c = x_ref.shape[1:]
    ohb, ow = hb // 2, w // 2
    rh = min(_ROWS_PER_CHUNK, ohb)
    while ohb % rh:
        rh -= 1
    neg = jnp.array(_NEG, x_ref.dtype)
    is_last = pl.program_id(1) == pl.num_programs(1) - 1
    halo_row = jnp.where(is_last, jnp.full((1, w, c), neg, x_ref.dtype), nxt_ref[0, 0:1])

    for i in range(ohb // rh):
        r0 = 2 * rh * i
        xa = x_ref[0, r0 : r0 + 2 * rh]  # input rows r0 .. r0+2rh-1
        pairs = xa.reshape(rh, 2, w, c)
        pm = jnp.maximum(pairs[:, 0], pairs[:, 1])  # rows (2i, 2i+1)
        # rows 2i+2: even rows shifted one step; the final one comes from
        # the next H-block (or SAME padding on the last block).
        if r0 + 2 * rh < hb:
            ev_next = x_ref[0, r0 + 2 : r0 + 2 + 2 * rh].reshape(rh, 2, w, c)[:, 0]
        else:
            body = x_ref[0, r0 + 2 : r0 + 2 * rh].reshape(rh - 1, 2, w, c)[:, 0]
            ev_next = jnp.concatenate([body, halo_row], axis=0)
        rows = jnp.maximum(pm, ev_next)  # [rh, w, c]

        # cols: out[:, j] = max(rows[:, 2j], rows[:, 2j+1], rows[:, 2j+2])
        cpairs = rows.reshape(rh, ow, 2, c)
        cpm = jnp.maximum(cpairs[:, :, 0], cpairs[:, :, 1])
        cev_next = jnp.concatenate(
            [cpairs[:, 1:, 0], jnp.full((rh, 1, c), neg, x_ref.dtype)], axis=1
        )
        o_ref[0, rh * i : rh * (i + 1)] = jnp.maximum(cpm, cev_next)


def _maxpool_fwd_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, f"even spatial dims required, got {x.shape}"
    # Pick an H-block so in+halo+out blocks (double-buffered) stay well
    # under the 16 MB scoped-VMEM budget. Only the leading dims may be
    # blocked freely (last two must be full or hardware-tile multiples), so
    # the grid walks H; the halo row at each block boundary comes from a
    # second view of the same array offset one block (clamped at the end).
    budget = 6 * 1024 * 1024
    per_row = w * c * x.dtype.itemsize * 2  # double-buffered
    hb = h
    while hb % 2 == 0 and hb > 2 * _ROWS_PER_CHUNK and (2 * hb + hb // 2) * per_row > budget:
        hb //= 2
    nblocks = h // hb
    return pl.pallas_call(
        _maxpool_kernel,
        interpret=interpret,
        grid=(b, nblocks),
        in_specs=[
            pl.BlockSpec(
                (1, hb, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, hb, w, c),
                lambda i, j: (i, jnp.minimum(j + 1, nblocks - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb // 2, w // 2, c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h // 2, w // 2, c), x.dtype),
    )(x, x)


def _maxpool_reference(x: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA shift-and-max with the same (TF SAME) alignment.

    Used as the CPU/interpret fallback and as the differentiable body for
    the backward pass (elementwise-max gradients are safe on axon, unlike
    reduce_window's select-and-scatter grad, which emits NaNs there).
    """
    b, h, w, c = x.shape
    oh, ow = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=_NEG)
    out = None
    for dy in range(3):
        for dx in range(3):
            s = xp[:, dy : dy + h : 2, dx : dx + w : 2, :][:, :oh, :ow]
            out = s if out is None else jnp.maximum(out, s)
    return out


# Forward-pass implementation choice, measured on the axon v5e inside the
# full ResNet-50 forward at [256,128,128,64]bf16:
#   lax.reduce_window   39.5 ms end-to-end  <- default (fuses best in-graph)
#   shift-and-max       46.2 ms
#   Pallas kernel       75 ms (custom-call operand layout blocks fusion with
#                       the stem conv; kept selectable for other platforms)
# The backward pass NEVER uses reduce_window: its select-and-scatter gradient
# emits NaNs on axon (jax 0.9.0/v5e), so custom_vjp routes grads through the
# shift-and-max decomposition whose elementwise-max gradient is safe.
USE_PALLAS_POOL = False


@jax.custom_vjp
def max_pool_3x3_stride2_same(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 SAME max pool (TF/XLA SAME alignment), differentiable."""
    if USE_PALLAS_POOL and jax.default_backend() in ("tpu", "axon") and not (
        x.shape[1] % 2 or x.shape[2] % 2
    ):
        return _maxpool_fwd_pallas(x)
    return lax.reduce_window(
        x, _neg_inf(x.dtype), lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "SAME"
    )


@jax.custom_vjp
def max_pool_3x3_stride2_torch(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 max pool with SYMMETRIC padding 1 (torch MaxPool2d(3,2,1)).

    Window at rows 2i-1..2i+1 — one pixel off the TF/XLA SAME grid. Needed
    for numerically-exact use of torchvision-converted ImageNet backbones
    (utils/convert_backbone.py); the reference/TF-parity path uses the
    `_same` variant above.
    """
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    return lax.reduce_window(
        x, _neg_inf(x.dtype), lax.max, (1, 3, 3, 1), (1, 2, 2, 1), pads
    )


def _neg_inf(dtype):
    return jnp.asarray(-jnp.inf, dtype)


def _maxpool_reference_torch(x: jnp.ndarray) -> jnp.ndarray:
    """Shift-and-max with torch alignment (safe gradient on axon)."""
    b, h, w, c = x.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=_NEG)
    out = None
    for dy in range(3):
        for dx in range(3):
            s = xp[:, dy : dy + h : 2, dx : dx + w : 2, :][:, :oh, :ow]
            out = s if out is None else jnp.maximum(out, s)
    return out


# Backward implementation (round 3, VERDICT r2 weak #3): "masks" computes
# grad_in directly on the INPUT grid from the saved forward output —
# grad_in[i] = sum over the <=4 windows containing i of
# [x_i == out_w] * g_w / ties_w. Everything is upsample-by-repeat, pad/
# slice shifts and elementwise math. The HYPOTHESIS was that XLA fuses it
# into one pass over the input grid; MEASURED on the v5e (2026-08-17,
# scripts/exp_stem_bwd.py, pool alone at [256,128,128,64]) it LOSES:
# masks bwd 45.4 ms vs maxtree-recompute 28.8 ms — the 4 shifted
# input-grid terms each materialize through HBM instead of fusing.
# Kept selectable as the honest ledger entry; "maxtree" (recompute the
# shift-max tree, differentiate through it) is the default custom bwd.
# Gradient tie semantics: "masks" splits EQUALLY among tied maxima
# (per-window mass preserved); "maxtree" routes ties by jnp.maximum's
# bias; on unique maxima the two are exactly equal
# (tests/test_pool_pallas.py), and ties are only reachable where bf16
# quantizes window neighbors equal.
POOL_BWD_IMPL = "maxtree"  # "masks" | "maxtree"


def _maxpool_bwd_masks(x: jnp.ndarray, out: jnp.ndarray,
                       g: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the SAME 3x3/2 max pool, input-grid mask form.

    `out` is the forward result (saved residual — NOT recomputed).
    """
    b, h, w, c = x.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    ph, pw = max(2 * oh + 1 - h, 0), max(2 * ow + 1 - w, 0)
    plo_y, plo_x = ph // 2, pw // 2
    xp = jnp.pad(
        x, ((0, 0), (plo_y, ph - plo_y), (plo_x, pw - plo_x), (0, 0)),
        constant_values=_NEG)
    hp, wp = 2 * oh + 1, 2 * ow + 1

    # tie count per window (9 shifted compares at OUTPUT resolution)
    count = None
    for dy in range(3):
        for dx in range(3):
            s = xp[:, dy : dy + 2 * oh : 2, dx : dx + 2 * ow : 2, :][:, :oh, :ow]
            m = (s == out).astype(jnp.float32)
            count = m if count is None else count + m
    wgt = g.astype(jnp.float32) / count  # per-window mass, split among ties

    # upsample out/wgt onto the padded input grid: U[i] = V[i // 2]
    def up(v, fill):
        u = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
        return jnp.pad(
            u, ((0, 0), (0, hp - 2 * oh), (0, wp - 2 * ow), (0, 0)),
            constant_values=fill)

    out_up = up(out.astype(x.dtype), _NEG)
    wgt_up = up(wgt, 0.0)

    # candidate windows for padded-input row iy: oy = iy//2 (always) and
    # oy = iy//2 - 1 (even iy only; odd iy's second candidate coincides).
    # The -1 candidates read the upsampled grids shifted down/right by 2,
    # with _NEG/0 fill so out-of-range windows can never match.
    def shift2(t, axis, fill):
        cfg = [(0, 0)] * 4
        cfg[axis] = (2, 0)
        padded = jnp.pad(t, cfg, constant_values=fill)
        return lax.slice_in_dim(padded, 0, t.shape[axis], axis=axis)

    even_y = (lax.broadcasted_iota(jnp.int32, (hp, 1), 0) % 2 == 0)
    even_x = (lax.broadcasted_iota(jnp.int32, (1, wp), 1) % 2 == 0)
    my = even_y[None, :, :, None]
    mx = even_x[None, :, :, None]

    grad_p = jnp.zeros((b, hp, wp, c), jnp.float32)
    for ry, masky in ((0, None), (1, my)):
        for rx, maskx in ((0, None), (1, mx)):
            o_t = out_up
            w_t = wgt_up
            if ry:
                o_t = shift2(o_t, 1, _NEG)
                w_t = shift2(w_t, 1, 0.0)
            if rx:
                o_t = shift2(o_t, 2, _NEG)
                w_t = shift2(w_t, 2, 0.0)
            term = jnp.where(xp == o_t, w_t, 0.0)
            if masky is not None:
                term = jnp.where(masky, term, 0.0)
            if maskx is not None:
                term = jnp.where(maskx, term, 0.0)
            grad_p = grad_p + term
    grad = grad_p[:, plo_y : plo_y + h, plo_x : plo_x + w, :]
    return grad.astype(g.dtype)


def _fwd(x):
    out = max_pool_3x3_stride2_same(x)
    return out, (x, out)


def _bwd(res, g):
    x, out = res
    if POOL_BWD_IMPL == "masks":
        return (_maxpool_bwd_masks(x, out, g),)
    # _maxpool_reference_odd matches SAME for both spatial parities; the
    # even-only _maxpool_reference would raise a cotangent shape mismatch
    # for odd inputs the reduce_window forward happily accepts (ADVICE r1)
    _, vjp = jax.vjp(_maxpool_reference_odd, x)
    return vjp(g)


max_pool_3x3_stride2_same.defvjp(_fwd, _bwd)


@jax.custom_vjp
def max_pool_3x3_stride2_keras(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/2 max pool with symmetric ZERO padding 1 (Keras applications
    style: explicit ZeroPadding2D + valid MaxPooling2D). Differs from the
    torch/TF semantics only where a window is all-negative at the border
    (the zero pad wins) — needed for exact Keras-v2 weight conversion.

    The zero padding must be EXPLICIT: reduce_window's init value joins
    every window (it's the reduction seed, not just the pad fill), so
    seeding with 0 would clamp all-negative interior windows too."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return lax.reduce_window(
        xp, _neg_inf(x.dtype), lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _maxpool_reference_keras(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=0.0)
    out = None
    for dy in range(3):
        for dx in range(3):
            s = xp[:, dy : dy + h : 2, dx : dx + w : 2, :][:, :oh, :ow]
            out = s if out is None else jnp.maximum(out, s)
    return out


def _fwd_keras(x):
    return max_pool_3x3_stride2_keras(x), x


def _bwd_keras(x, g):
    _, vjp = jax.vjp(_maxpool_reference_keras, x)
    return vjp(g)


max_pool_3x3_stride2_keras.defvjp(_fwd_keras, _bwd_keras)


def _fwd_torch(x):
    return max_pool_3x3_stride2_torch(x), x


def _bwd_torch(x, g):
    _, vjp = jax.vjp(_maxpool_reference_torch, x)
    return vjp(g)


max_pool_3x3_stride2_torch.defvjp(_fwd_torch, _bwd_torch)


# Training-path routing (round 3; measured 2026-08-17 on the v5e,
# scripts/exp_stem_bwd.py, stem+pool at bs256 [256,128,128,64]):
#
#   custom_vjp (reduce_window fwd + masks bwd)    fwd  5.65  fwd+bwd 48.32 ms
#   custom_vjp (reduce_window fwd + maxtree bwd)  fwd  5.65  fwd+bwd ~45.6
#   plain shift-max AUTODIFF                      fwd 12.14  fwd+bwd 33.91  <-
#
# Autodiff through the shift-and-max decomposition wins fwd+bwd despite its
# 2.1x-slower forward, because it SAVES the 9 intermediate maxima and backs
# through them elementwise, while both custom backwards either recompute the
# tree (maxtree) or assemble 4 shifted input-grid mask terms through HBM
# (masks). So TRAINING routes through plain autodiff, and inference keeps
# the reduce_window forward (fastest, fuses with the stem conv; only its
# select-and-scatter GRADIENT NaNs on axon, never the forward). Forward
# values are identical in every form (exact window max).
POOL_TRAIN_IMPL = "ad"  # "ad" (shift-max autodiff) | "custom" (custom_vjp)


def stem_max_pool(x: jnp.ndarray, mode: str = "same",
                  train: bool = False) -> jnp.ndarray:
    """Mode-aware stem pool. `mode`: "same" (TF/XLA) | "torch" | "keras".

    With `train=True` (and POOL_TRAIN_IMPL="ad") the differentiable
    shift-and-max form is used so autodiff produces the cheap saved-
    intermediates backward; otherwise the custom_vjp reduce_window form.
    """
    if train and POOL_TRAIN_IMPL == "ad":
        if mode == "torch":
            return _maxpool_reference_torch(x)
        if mode == "keras":
            return _maxpool_reference_keras(x)
        if x.shape[1] % 2 or x.shape[2] % 2:
            return _maxpool_reference_odd(x)
        return _maxpool_reference(x)
    if mode == "torch":
        return max_pool_3x3_stride2_torch(x)
    if mode == "keras":
        return max_pool_3x3_stride2_keras(x)
    return max_pool_3x3_stride2_same(x)


def _maxpool_reference_odd(x: jnp.ndarray) -> jnp.ndarray:
    """SAME pool for any spatial size (XLA pad split: lo = total//2)."""
    b, h, w, c = x.shape
    oh, ow = (h + 1) // 2, (w + 1) // 2
    ph, pw = max(2 * oh + 1 - h, 0), max(2 * ow + 1 - w, 0)
    pads = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    xp = jnp.pad(x, pads, constant_values=_NEG)
    out = None
    for dy in range(3):
        for dx in range(3):
            s = xp[:, dy : dy + 2 * oh : 2, dx : dx + 2 * ow : 2, :][:, :oh, :ow]
            out = s if out is None else jnp.maximum(out, s)
    return out
