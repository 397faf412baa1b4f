"""3D pose utilities: absolute reconstruction and bone-length scale recovery.

Responsibility-parity with `src/tfu3d.py` in the reference (SURVEY.md §3.2).
All functions are jittable, batched and differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp


def reconstruct_absolute(
    pose3d_rootrel: jnp.ndarray,
    pose2d_px: jnp.ndarray,
    intrinsics: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    weak_perspective: bool = False,
) -> jnp.ndarray:
    """Closed-form LSQ translation combining the metric 3D and 2D heads.

    The 2D head anchors the visible joints in the image; the metric 3D head
    supplies the full skeleton (incl. out-of-frame joints). Solving for the
    camera-frame translation t that best reprojects `pose3d_rootrel + t` onto
    the 2D predictions gives the ABSOLUTE pose — MeTRo's truncation-robust
    head mixing (SURVEY.md §3.2, "reconstruct_absolute").

    Each joint j with normalized ray (x_j, y_j) = K^-1 @ pose2d contributes
    two linear equations in t = (tx, ty, tz):

        tx - x_j tz = x_j P_jz - P_jx
        ty - y_j tz = y_j P_jz - P_jy

    solved via the 3x3 normal equations (batched `linalg.solve`).

    Args:
        pose3d_rootrel: [B, J, 3] metric root-relative pose, millimeters.
        pose2d_px: [B, J, 2] 2D-head predictions in crop pixels.
        intrinsics: [B, 3, 3] crop-camera intrinsic matrices.
        weights: optional [B, J] per-joint confidence/validity weights.
        weak_perspective: drop the x_j/y_j coupling in the z column
            (orthographic approximation; more stable for near-frontal crops).

    Returns:
        [B, J, 3] absolute camera-frame pose in millimeters.
    """
    p = pose3d_rootrel.astype(jnp.float32)
    b, j, _ = p.shape
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    skew = intrinsics[:, 0, 1][:, None]
    y = (pose2d_px[..., 1] - cy) / fy
    x = (pose2d_px[..., 0] - cx - skew * y) / fx

    if weights is None:
        w = jnp.ones((b, j), jnp.float32)
    else:
        w = weights.astype(jnp.float32)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-6)

    if weak_perspective:
        # Weak perspective: ignore per-joint relative depth in the projection
        # (x_j ~ (P_jx + tx) / tz), i.e. drop the x_j * P_jz term.
        bx = -p[..., 0]
        by = -p[..., 1]
    else:
        bx = x * p[..., 2] - p[..., 0]
        by = y * p[..., 2] - p[..., 1]
    xz, yz = x, y

    sw = jnp.sum(w, -1)
    swx = jnp.sum(w * xz, -1)
    swy = jnp.sum(w * yz, -1)
    swxx = jnp.sum(w * (xz * xz + yz * yz), -1)
    ata = jnp.stack(
        [
            jnp.stack([sw, jnp.zeros_like(sw), -swx], -1),
            jnp.stack([jnp.zeros_like(sw), sw, -swy], -1),
            jnp.stack([-swx, -swy, swxx], -1),
        ],
        axis=-2,
    )  # [B, 3, 3]
    atb = jnp.stack(
        [
            jnp.sum(w * bx, -1),
            jnp.sum(w * by, -1),
            jnp.sum(w * (-xz * bx - yz * by), -1),
        ],
        axis=-1,
    )  # [B, 3]
    # Tikhonov epsilon (relative to the matrix scale) keeps the solve
    # well-posed for degenerate 2D configurations without biasing tz.
    trace = ata[..., 0, 0] + ata[..., 1, 1] + ata[..., 2, 2]
    ata = ata + (1e-6 * trace + 1e-9)[..., None, None] * jnp.eye(3, dtype=ata.dtype)
    t = jnp.linalg.solve(ata, atb[..., None])[..., 0]  # [B, 3]

    # One step of iterative refinement in the least-squares residual space:
    # the 3x3 system is mildly ill-conditioned (|x|,|y| << 1 couples weakly to
    # tz ~ meters), so a single f32 solve leaves ~1 mm of roundoff in tz.
    def refine(t):
        tx, ty, tz = t[..., 0:1], t[..., 1:2], t[..., 2:3]
        rx = bx - (tx - xz * tz)
        ry = by - (ty - yz * tz)
        atr = jnp.stack(
            [
                jnp.sum(w * rx, -1),
                jnp.sum(w * ry, -1),
                jnp.sum(w * (-xz * rx - yz * ry), -1),
            ],
            axis=-1,
        )
        return t + jnp.linalg.solve(ata, atr[..., None])[..., 0]

    t = refine(refine(t))
    return p + t[:, None, :]


def bone_lengths(pose: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """[..., J, 3] pose + (E, 2) edges -> [..., E] bone lengths."""
    a = jnp.take(pose, edges[:, 0], axis=-2)
    c = jnp.take(pose, edges[:, 1], axis=-2)
    return jnp.linalg.norm(a - c, axis=-1)


def mean_bone_lengths(poses: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """Dataset-mean bone lengths [(E,)] from [N, J, 3] ground-truth poses."""
    return bone_lengths(poses, edges).mean(axis=0)


def rescale_to_bone_lengths(
    pose_rootrel: jnp.ndarray, edges: jnp.ndarray, ref_lengths: jnp.ndarray
) -> jnp.ndarray:
    """Uniformly rescale the skeleton to match reference bone lengths.

    LSQ-optimal scale s* = sum(l_ref * l_pred) / sum(l_pred^2) (SURVEY.md
    §3.2, `--scale-recovery=bone_lengths`); used e.g. for the 3DHP
    "universal skeleton" protocol.
    """
    lens = bone_lengths(pose_rootrel, edges)  # [..., E]
    num = jnp.sum(lens * ref_lengths, axis=-1)
    den = jnp.maximum(jnp.sum(lens * lens, axis=-1), 1e-8)
    scale = (num / den)[..., None, None]
    return pose_rootrel * scale
