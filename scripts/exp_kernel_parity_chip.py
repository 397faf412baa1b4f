"""Elementwise parity of the COMPILED Mosaic kernels vs the exact samplers,
on the real chip (interpret-mode parity is covered by tests/; this catches
compiled-lowering drift). Small batch to keep tunnel transfers sane.

Run: timeout 580 python scripts/exp_kernel_parity_chip.py
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

    # smooth source so sub-pixel two-pass phase differences stay small
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

    packed = np.asarray(jax.jit(
        lambda *a: W._warp_images_packed(*a, S))(tiles, h, k, d))
    pallas = np.asarray(jax.jit(
        lambda *a: warp_images_twopass_pallas(*a, S))(tiles, h, k, d))
    diff = np.abs(packed - pallas)
    print(f"warp  compiled-vs-exact: max {diff.max():.3f} mean {diff.mean():.5f} "
          f"frac>4 {(diff > 4).mean():.2e}")

    # occluder kernel vs the windowed-gather path
    from metro_pose3d_tpu.ops.occlusion import (
        occlude_with_bank, occlude_with_bank_twopass,
        pack_occluder_bank, pack_occluder_bank_raw,
    )

    T2, N = 96, 12
    bank = np.zeros((N, T2, T2, 4), np.float32)
    y2, x2 = np.meshgrid(np.arange(T2), np.arange(T2), indexing="ij")
    for i in range(N):
        bank[i, ..., :3] = np.sin((x2 + (i + 1) * y2) / 7.0)[..., None] * 0.4 + 0.5
        bank[i, ..., 3] = ((x2 - T2 / 2) ** 2 + (y2 - T2 / 2) ** 2 < (T2 * 0.4) ** 2)
    bank = jnp.asarray(bank)
    crops = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)), jnp.float32)
    idx = jnp.asarray(rng.randint(0, N, (B,)), jnp.int32)
    affs = []
    for i in range(B):
        th = rng.uniform(-np.pi, np.pi)
        sc = 1.0 / rng.uniform(0.2, 0.7)
        c, s = np.cos(th), np.sin(th)
        m = sc * np.array([[c, -s], [s, c]])
        centre = rng.uniform(0.1, 0.9, 2) * S
        aff = np.zeros((2, 3))
        aff[:, :2] = m
        aff[:, 2] = np.array([T2 / 2, T2 / 2]) - m @ centre
        affs.append(aff)
    affs = jnp.asarray(np.stack(affs), jnp.float32)
    en = jnp.ones((B,), jnp.float32)
    ref = np.asarray(jax.jit(occlude_with_bank, static_argnums=(2,))(
        crops, pack_occluder_bank(bank), T2, idx, affs, en))
    two = np.asarray(jax.jit(occlude_with_bank_twopass)(
        crops, pack_occluder_bank_raw(bank), idx, affs, en))
    diff = np.abs(ref - two)
    print(f"occl  compiled-vs-exact: max {diff.max():.4f} mean {diff.mean():.6f} "
          f"frac>0.05 {(diff > 0.05).mean():.2e}")


if __name__ == "__main__":
    main()
