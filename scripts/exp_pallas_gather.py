"""Probe: which gather forms does Mosaic (Pallas TPU) accept on this
toolchain, and how fast are they? (round-2 warp redesign groundwork)"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def probe(name, build):
    try:
        f, args, check = build()
        out = np.asarray(f(*args))
        ok = check(out)
        dt = timeit(f, *args)
        print(f"{name}: OK match={ok} {dt*1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


def main():
    rng = np.random.RandomState(0)
    H = W = 512
    B = 64

    x = jnp.asarray(rng.randint(0, 1000, (B, H, W)), jnp.int32)
    idx_sub = jnp.asarray(rng.randint(0, H, (B, H, W)), jnp.int32)

    # 1. sublane shuffle: out[i,j] = x[idx[i,j], j] per batch
    def build_sublane():
        def kernel(x_ref, i_ref, o_ref):
            o_ref[0] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=0)

        f = jax.jit(pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        ))
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx_sub), axis=1)
        return f, (x, idx_sub), lambda out: bool((out == ref).all())

    probe("pallas sublane take_along_axis(axis=0)", build_sublane)

    # 2. lane shuffle: out[i,j] = x[i, idx[i,j]] per batch
    def build_lane():
        def kernel(x_ref, i_ref, o_ref):
            o_ref[0] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=1)

        f = jax.jit(pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        ))
        idx_lane = jnp.asarray(rng.randint(0, W, (B, H, W)), jnp.int32)
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx_lane), axis=2)
        return f, (x, idx_lane), lambda out: bool((out == ref).all())

    probe("pallas lane take_along_axis(axis=1)", build_lane)

    # 3. XLA (non-pallas) same-shape take_along_axis for comparison
    def build_xla_sub():
        f = jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=1))
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx_sub), axis=1)
        return f, (x, idx_sub), lambda out: bool((out == ref).all())

    probe("XLA batched take_along_axis(axis=1)", build_xla_sub)

    def build_xla_lane():
        idx_lane = jnp.asarray(rng.randint(0, W, (B, H, W)), jnp.int32)
        f = jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=2))
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx_lane), axis=2)
        return f, (x, idx_lane), lambda out: bool((out == ref).all())

    probe("XLA batched take_along_axis(axis=2)", build_xla_lane)

    # 4. pallas f32 lane shuffle (bilinear pass dtype)
    def build_lane_f32():
        xf = x.astype(jnp.float32)

        def kernel(x_ref, i_ref, o_ref):
            o_ref[0] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=1)

        f = jax.jit(pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        ))
        idx_lane = jnp.asarray(rng.randint(0, W, (B, H, W)), jnp.int32)
        ref = np.take_along_axis(np.asarray(xf), np.asarray(idx_lane), axis=2)
        return f, (xf, idx_lane), lambda out: bool((out == ref).all())

    probe("pallas lane take_along_axis f32", build_lane_f32)


if __name__ == "__main__":
    main()
