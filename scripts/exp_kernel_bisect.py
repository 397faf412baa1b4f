"""Bisect the compiled-kernel mismatch: chip pallas vs the SAME two-pass
math in plain XLA (chip) vs the packed direct sampler (chip).

If pallas != xla_twopass elementwise -> Mosaic lowering bug.
If pallas == xla_twopass but both != packed -> two-pass semantics on this
image (expected, bounded).
Run: timeout 580 python scripts/exp_kernel_bisect.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.RandomState(0)
    B, T, S = 8, 512, 256
    from metro_pose3d_tpu.ops import warp as W
    from metro_pose3d_tpu.ops.warp_pallas import warp_images_twopass_pallas
    from metro_pose3d_tpu.ops.warp_twopass import warp_images_twopass_xla

    yy, xx = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    img = np.stack([np.sin((xx + 2 * yy) / 9.0 + p) * 100 + 120 for p in (0, 2, 4)], -1)
    tiles = jnp.asarray(np.tile(img[None], (B, 1, 1, 1)), jnp.uint8)
    hs = []
    for i in range(B):
        ang = rng.uniform(-0.5, 0.5)
        sc = rng.uniform(0.8, 1.8)
        c, s = np.cos(ang), np.sin(ang)
        a = sc * np.array([[c, -s], [s, c]])
        t = np.array([T / 2, T / 2]) - a @ np.array([S / 2, S / 2])
        hm = np.eye(3)
        hm[:2, :2] = a
        hm[:2, 2] = t
        hm[2, :2] = rng.uniform(-1, 1, 2) * 2e-4
        hs.append(hm)
    h = jnp.asarray(np.stack(hs), jnp.float32)
    k = jnp.tile(jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)[None], (B, 1))
    d = jnp.zeros((B, 5), jnp.float32)

    pallas = np.asarray(jax.jit(
        lambda *a: warp_images_twopass_pallas(*a, S))(tiles, h, k, d))
    xla2 = np.asarray(jax.jit(
        lambda *a: warp_images_twopass_xla(*a, S))(tiles, h, k, d))
    packed = np.asarray(jax.jit(
        lambda *a: W._warp_images_packed(*a, S))(tiles, h, k, d))

    for name, a, b in [("pallas vs xla2", pallas, xla2),
                       ("xla2 vs packed", xla2, packed),
                       ("pallas vs packed", pallas, packed)]:
        diff = np.abs(a - b)
        # per-crop to localize
        pc = [f"{diff[i].max():.0f}" for i in range(B)]
        print(f"{name}: max {diff.max():7.2f} mean {diff.mean():8.4f} "
              f"frac>4 {(diff > 4).mean():.3f}  percrop max [{' '.join(pc)}]")


if __name__ == "__main__":
    main()
