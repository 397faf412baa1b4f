"""Map soft-argmax outputs to metric / image coordinates.

MeTRo's defining property (SURVEY.md §3.2): all three axes of the volumetric
heatmap are METRIC — a fixed cube of side `box_size_mm` centered on the
(gauge-free) volume center, independent of bbox scale or person distance.
The 2D head lives in crop-pixel space.
"""
from __future__ import annotations

import jax.numpy as jnp


def heatmap_to_metric(coords01: jnp.ndarray, box_size_mm: float) -> jnp.ndarray:
    """(0,1)^3 soft-argmax coords -> millimeters in the metric cube.

    Output is centered: coordinates lie in (-box_size_mm/2, box_size_mm/2).
    The absolute offset of the cube is a free gauge fixed by root-centering.
    """
    return (coords01 - 0.5) * box_size_mm


def heatmap_to_image(coords01: jnp.ndarray, proc_side: int) -> jnp.ndarray:
    """(0,1)^2 soft-argmax coords -> crop pixel coordinates.

    Uses the pixel-center convention of reference_constants: continuous
    position u in [0,1] maps to pixel coordinate u*S - 0.5, so u=0.5 is the
    crop center (S-1)/2.
    """
    return coords01 * proc_side - 0.5


def image_to_unit(coords_px: jnp.ndarray, proc_side: int) -> jnp.ndarray:
    """Inverse of `heatmap_to_image` (used to build 2D training targets)."""
    return (coords_px + 0.5) / proc_side


def root_relative(coords: jnp.ndarray, root_index: int) -> jnp.ndarray:
    """Subtract the root joint: [..., J, C] -> root-relative coords."""
    return coords - coords[..., root_index : root_index + 1, :]
