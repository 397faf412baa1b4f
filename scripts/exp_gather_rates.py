"""Map the XLA flat-take rate curve on axon: row width, dtype, table size,
sortedness — to size the quad-window warp redesign (VERDICT r1 item 1)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


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
    rng = np.random.RandomState(0)
    n_idx = 16 * 1024 * 1024

    print("== width curve (int32 rows, 4M-row table, random idx) ==")
    n_rows = 4 * 1024 * 1024
    ii = jnp.asarray(rng.randint(0, n_rows, (n_idx,)), jnp.int32)
    for width in (1, 2, 4, 6, 8, 12, 16, 24):
        tbl = jnp.asarray(rng.randint(0, 100, (n_rows, width)), jnp.int32)
        f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
        dt = timeit(f, tbl, ii)
        print(f"w={width:3d}: {dt*1e3:7.1f} ms {n_idx/dt/1e6:7.0f}M idx/s {n_idx*width*4/dt/1e9:6.2f} GB/s")

    print("== few indices, wide rows (quad candidates) ==")
    for n_i, width in ((n_idx // 4, 12), (n_idx // 4, 16), (n_idx // 4, 24),
                       (n_idx // 2, 8), (n_idx // 2, 12)):
        ii2 = jnp.asarray(rng.randint(0, n_rows, (n_i,)), jnp.int32)
        tbl = jnp.asarray(rng.randint(0, 100, (n_rows, width)), jnp.int32)
        f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
        dt = timeit(f, tbl, ii2)
        eq = n_idx / dt / 1e6  # equivalent output-pixel rate if 16.7M px
        print(f"n={n_i/1e6:.1f}M w={width:3d}: {dt*1e3:7.1f} ms {n_i/dt/1e6:7.0f}M idx/s -> {eq:6.0f}M px/s  {n_i*width*4/dt/1e9:6.2f} GB/s")

    print("== table size effect (w=6) ==")
    for n_rows2 in (256 * 1024, 1024 * 1024, 4 * 1024 * 1024, 32 * 1024 * 1024):
        ii2 = jnp.asarray(rng.randint(0, n_rows2, (n_idx,)), jnp.int32)
        tbl = jnp.asarray(rng.randint(0, 100, (n_rows2, 6)), jnp.int32)
        f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
        dt = timeit(f, tbl, ii2)
        print(f"rows={n_rows2//1024}k: {dt*1e3:7.1f} ms {n_idx/dt/1e6:7.0f}M idx/s")

    print("== locality: sorted-ish indices (w=6, 4M rows) ==")
    base = np.sort(rng.randint(0, n_rows, n_idx)).astype(np.int32)
    ii_sorted = jnp.asarray(base)
    tbl = jnp.asarray(rng.randint(0, 100, (n_rows, 6)), jnp.int32)
    f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
    dt = timeit(f, tbl, ii_sorted)
    print(f"sorted: {dt*1e3:7.1f} ms {n_idx/dt/1e6:7.0f}M idx/s")
    # and truly local: consecutive blocks
    loc = (np.arange(n_idx, dtype=np.int64) * n_rows // n_idx).astype(np.int32)
    dt = timeit(f, tbl, jnp.asarray(loc))
    print(f"strided-local: {dt*1e3:7.1f} ms {n_idx/dt/1e6:7.0f}M idx/s")

    print("== dtype: uint8 vs int32 rows (w=24 u8 vs w=6 i32, same bytes) ==")
    tbl8 = jnp.asarray(rng.randint(0, 255, (n_rows, 24)), jnp.uint8)
    f8 = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0).astype(jnp.int32)))
    dt = timeit(f8, tbl8, ii)
    print(f"u8 w=24: {dt*1e3:7.1f} ms {n_idx/dt/1e6:7.0f}M idx/s")

    print("== 2D operand gather: slice_sizes=(1, W) via take on axis 0 of [R, W] already covered; try gather with slice (2, w)? ==")
    # lax.gather pulling 2 ROWS per index from a [R, 8] table: offset_dims
    op = jnp.asarray(rng.randint(0, 100, (n_rows, 8)), jnp.int32)
    starts = jnp.asarray(rng.randint(0, n_rows - 2, (n_idx // 4, 1)), jnp.int32)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    g = jax.jit(lambda t, s: jnp.sum(lax.gather(
        t, s, dn, slice_sizes=(2, 8), mode="clip")))
    try:
        dt = timeit(g, op, starts)
        print(f"2-row slices w=8: {dt*1e3:7.1f} ms {(n_idx//4)/dt/1e6:7.0f}M idx/s")
    except Exception as e:  # noqa: BLE001
        print(f"2-row slices: FAIL {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
