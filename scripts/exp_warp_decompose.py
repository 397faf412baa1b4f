"""Round-2 experiment: decompose the tile->skeleton cost and probe faster
gather formulations on the real chip (VERDICT r1 next-round item 1).

Run: timeout 580 python scripts/exp_warp_decompose.py [section]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    section = sys.argv[1] if len(sys.argv) > 1 else "all"
    B, T, S = 256, 512, 256
    rng = np.random.RandomState(0)
    tiles = jnp.asarray(rng.randint(0, 256, (B, T, T, 3)), jnp.uint8)

    # plausible warp params: modest zoom/rotation homographies
    from metro_pose3d_tpu.ops import warp as W

    hs = []
    for i in range(B):
        ang = rng.uniform(-0.4, 0.4)
        sc = rng.uniform(0.8, 1.6)
        c, s = np.cos(ang), np.sin(ang)
        h = np.array([[sc * c, -sc * s, 0], [sc * s, sc * c, 0], [0, 0, 1.0]])
        hs.append(h)
    h_mats = jnp.asarray(np.stack(hs), jnp.float32)
    k_vecs = jnp.tile(jnp.asarray([1.0, 1.0, 20.0, 20.0], jnp.float32)[None], (B, 1))
    dists = jnp.zeros((B, 5), jnp.float32)

    if section in ("all", "decompose"):
        # 1. full packed warp
        f_warp = jax.jit(lambda t, h, k, d: jnp.sum(
            W._warp_images_packed(t, h, k, d, S)))
        dt = timeit(f_warp, tiles, h_mats, k_vecs, dists)
        print(f"warp_packed total:           {dt*1e3:8.1f} ms  {B/dt:8.0f} crops/s")

        # 2. table build alone
        from metro_pose3d_tpu.ops.packed_gather import build_windowed_table

        def f_table(t):
            s32 = t.astype(jnp.int32)
            packed = s32[..., 0] | (s32[..., 1] << 8) | (s32[..., 2] << 16)
            return jnp.sum(build_windowed_table(packed))

        dt = timeit(jax.jit(f_table), tiles)
        print(f"table build alone:           {dt*1e3:8.1f} ms")

        # 3. coords alone
        def f_coords(h, k, d):
            coords, inf = jax.vmap(lambda hh, kk, dd: W.warp_coords(hh, kk, dd, (S, S)))(h, k, d)
            return jnp.sum(coords) + jnp.sum(inf)

        dt = timeit(jax.jit(f_coords), h_mats, k_vecs, dists)
        print(f"coords alone:                {dt*1e3:8.1f} ms")

        # 4. gather alone (precomputed indices, same table)
        from metro_pose3d_tpu.ops.packed_gather import gather_bilinear_taps

        def f_gather(t, h, k, d):
            s32 = t.astype(jnp.int32)
            packed = s32[..., 0] | (s32[..., 1] << 8) | (s32[..., 2] << 16)
            flat = build_windowed_table(packed)
            coords, _ = jax.vmap(lambda hh, kk, dd: W.warp_coords(hh, kk, dd, (S, S)))(h, k, d)
            x0i = jnp.floor(coords[..., 0]).astype(jnp.int32)
            y0i = jnp.floor(coords[..., 1]).astype(jnp.int32)
            base = (jnp.arange(B, dtype=jnp.int32) * T)[:, None, None]
            taps = gather_bilinear_taps(flat, base, x0i, y0i, T, T)
            return sum(jnp.sum(x) for x in taps)

        dt = timeit(jax.jit(f_gather), tiles, h_mats, k_vecs, dists)
        print(f"build+coords+gather:         {dt*1e3:8.1f} ms")

    if section in ("all", "tile256"):
        # same warp from 256^2 tiles (4x smaller table, same index count)
        t256 = tiles[:, :256, :256]
        f_warp = jax.jit(lambda t, h, k, d: jnp.sum(
            W._warp_images_packed(t, h, k, d, S)))
        dt = timeit(f_warp, t256, h_mats, k_vecs, dists)
        print(f"warp_packed 256^2 tiles:     {dt*1e3:8.1f} ms  {B/dt:8.0f} crops/s")
        t384 = tiles[:, :384, :384]
        dt = timeit(f_warp, t384, h_mats, k_vecs, dists)
        print(f"warp_packed 384^2 tiles:     {dt*1e3:8.1f} ms  {B/dt:8.0f} crops/s")

    if section in ("all", "tala"):
        # take_along_axis formulations (potential shuffle lowering)
        x = jnp.asarray(rng.randint(0, 2**30, (B, T, T)), jnp.int32)
        idx1 = jnp.asarray(rng.randint(0, T, (B, S, T)), jnp.int32)
        f = jax.jit(lambda x, i: jnp.sum(jnp.take_along_axis(x, i, axis=1)))
        dt = timeit(f, x, idx1)
        n_idx = B * S * T
        print(f"take_along_axis axis=1 [B,S,T] over [B,T,T]: {dt*1e3:8.1f} ms  {n_idx/dt/1e6:7.0f}M idx/s")

        idx2 = jnp.asarray(rng.randint(0, T, (B, S, S)), jnp.int32)
        xs = x[:, :S]  # [B,S,T]
        f2 = jax.jit(lambda x, i: jnp.sum(jnp.take_along_axis(x, i, axis=2)))
        dt = timeit(f2, xs, idx2)
        n_idx = B * S * S
        print(f"take_along_axis axis=2 [B,S,S] over [B,S,T]: {dt*1e3:8.1f} ms  {n_idx/dt/1e6:7.0f}M idx/s")

        # same-shape variants (exact shuffle shape)
        idx1s = jnp.asarray(rng.randint(0, T, (B, T, T)), jnp.int32)
        dt = timeit(f, x, idx1s)
        n_idx = B * T * T
        print(f"take_along_axis axis=1 same-shape [B,T,T]:   {dt*1e3:8.1f} ms  {n_idx/dt/1e6:7.0f}M idx/s")
        dt = timeit(f2, x, idx1s)
        print(f"take_along_axis axis=2 same-shape [B,T,T]:   {dt*1e3:8.1f} ms  {n_idx/dt/1e6:7.0f}M idx/s")

    if section in ("all", "widths"):
        # flat-take rate vs row width (bytes per index)
        n_rows = 4 * 1024 * 1024
        n_idx = 16 * 1024 * 1024
        ii = jnp.asarray(rng.randint(0, n_rows, (n_idx,)), jnp.int32)
        for width in (1, 2, 4, 6, 8):
            tbl = jnp.asarray(rng.randint(0, 100, (n_rows, width)), jnp.int32)
            if width == 1:
                tbl1 = tbl[:, 0]
                f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
                dt = timeit(f, tbl1, ii)
            else:
                f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
                dt = timeit(f, tbl, ii)
            print(f"flat take width={width}: {dt*1e3:8.1f} ms  {n_idx/dt/1e6:7.0f}M idx/s  {n_idx*width*4/dt/1e9:6.2f} GB/s")


if __name__ == "__main__":
    main()
