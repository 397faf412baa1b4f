"""Soft-argmax decode of 2D and 3D (volumetric) heatmaps.

Responsibility-parity with `tfu.soft_argmax` in the reference (SURVEY.md §3.2):
softmax over the full heatmap volume, then the probability-weighted average of
a normalized coordinate grid. Implemented the MXU-friendly way: the softmax is
computed once over the flattened volume per joint, and the three coordinate
expectations are a single (V, 3) matmul — XLA fuses the whole decode into the
head's epilogue.

Coordinate convention: cell centers at (i + 0.5) / N, so outputs live in
(0, 1); axis order of the returned coordinates is ALWAYS (x, y[, z]) where
x indexes W, y indexes H, z indexes D.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _grid_1d(n: int, dtype=jnp.float32) -> jnp.ndarray:
    return (jnp.arange(n, dtype=dtype) + 0.5) / n


def soft_argmax_2d(logits: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, J] logits -> [B, J, 2] expected (x, y) in (0, 1)."""
    b, h, w, j = logits.shape
    flat = logits.astype(jnp.float32).reshape(b, h * w, j)
    probs = jax.nn.softmax(flat, axis=1)
    ys = jnp.repeat(_grid_1d(h), w)  # index = y*W + x
    xs = jnp.tile(_grid_1d(w), h)
    grid = jnp.stack([xs, ys], axis=-1)  # (H*W, 2)
    # HIGHEST: TPU default matmul precision is bf16 (~0.4% relative), which
    # would cost millimetres after the 2200 mm box scale — decode must be f32
    return jnp.einsum("bvj,vc->bjc", probs, grid,
                      precision=jax.lax.Precision.HIGHEST)


def soft_argmax_3d(logits: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, D, J] logits -> [B, J, 3] expected (x, y, z) in (0, 1).

    H is image-y, W is image-x, D is the metric depth axis.
    """
    b, h, w, d, j = logits.shape
    flat = logits.astype(jnp.float32).reshape(b, h * w * d, j)
    probs = jax.nn.softmax(flat, axis=1)
    # index = (y*W + x)*D + z
    ys = jnp.repeat(_grid_1d(h), w * d)
    xs = jnp.tile(jnp.repeat(_grid_1d(w), d), h)
    zs = jnp.tile(_grid_1d(d), h * w)
    grid = jnp.stack([xs, ys, zs], axis=-1)  # (H*W*D, 3)
    return jnp.einsum("bvj,vc->bjc", probs, grid,
                      precision=jax.lax.Precision.HIGHEST)
