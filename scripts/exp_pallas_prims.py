"""In-kernel primitive rates for the Pallas warp redesign:
1. lane dynamic_gather throughput at scale (loop in one kernel),
2. one-hot row-select matmul on the MXU,
3. pltpu.roll with dynamic shift,
4. dynamic-start VMEM slicing on the sublane dim.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20, warmup=2):
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
        f, args, n_work = build()
        out = np.asarray(f(*args))
        dt = timeit(f, *args)
        print(f"{name}: {dt*1e3:8.2f} ms  {n_work/dt/1e9:7.2f} G/s  (sum={out.sum() if out.ndim else out:.3g})")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:140]}")


REPS = 64


def main():
    rng = np.random.RandomState(0)
    B = 64

    # 1) lane gather, looped REPS times per program over VMEM-resident data
    def build_lane_loop(h, w):
        x = jnp.asarray(rng.randint(0, 1000, (B, h, w)), jnp.int32)
        idx = jnp.asarray(rng.randint(0, w, (B, h, w)), jnp.int32)

        def kernel(x_ref, i_ref, o_ref):
            xx = x_ref[0]
            ii = i_ref[0]
            acc = jnp.zeros_like(xx)

            def body(k, acc):
                g = jnp.take_along_axis(xx, (ii + k) % w, axis=1)
                return acc + g

            o_ref[0] = jax.lax.fori_loop(0, REPS, body, acc)

        f = jax.jit(pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.int32),
        ))
        return f, (x, idx), B * h * w * REPS

    probe("lane gather x64 [128,128] i32", functools.partial(build_lane_loop, 128, 128))
    probe("lane gather x64 [256,128] i32", functools.partial(build_lane_loop, 256, 128))
    probe("lane gather x64 [8,128] i32", functools.partial(build_lane_loop, 8, 128))

    # 2) one-hot row-select matmul: [64,160]x[160,128] bf16, looped
    def build_rowsel():
        slab = jnp.asarray(rng.randint(0, 255, (B, 160, 128)), jnp.float32).astype(jnp.bfloat16)
        onehot = jnp.asarray(
            np.eye(160, dtype=np.float32)[rng.randint(0, 160, (B, 64))], jnp.bfloat16
        )  # [B, 64, 160]

        def kernel(p_ref, s_ref, o_ref):
            p = p_ref[0]
            s = s_ref[0]
            acc = jnp.zeros((64, 128), jnp.float32)

            def body(k, acc):
                pk = pltpu.roll(p, k, 0)  # k-dependence so the loop isn't hoisted
                return acc + jax.lax.dot_general(
                    pk, s, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            o_ref[0] = jax.lax.fori_loop(0, REPS, body, acc)

        f = jax.jit(pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 64, 160), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 160, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 64, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 64, 128), jnp.float32),
        ))
        return f, (onehot, slab), B * 64 * 128 * REPS  # selected elems/s

    probe("one-hot rowsel x64 [64,160]@[160,128] bf16", build_rowsel)

    # 3) roll with dynamic shift
    def build_roll():
        x = jnp.asarray(rng.randint(0, 1000, (B, 64, 512)), jnp.int32)
        sh = jnp.asarray(rng.randint(0, 512, (B, 1, 1)), jnp.int32)

        def kernel(x_ref, s_ref, o_ref):
            xx = x_ref[0]
            shift = s_ref[0, 0]
            acc = jnp.zeros_like(xx)

            def body(k, acc):
                return acc + pltpu.roll(xx, shift + k, 1)

            o_ref[0] = jax.lax.fori_loop(0, REPS, body, acc)

        f = jax.jit(pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 64, 512), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 64, 512), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 64, 512), jnp.int32),
        ))
        return f, (x, sh), B * 64 * 512 * REPS

    probe("dyn roll x64 [64,512] i32", build_roll)

    # 4) dynamic-start sublane slice from VMEM
    def build_dynslice():
        x = jnp.asarray(rng.randint(0, 1000, (B, 512, 128)), jnp.int32)
        st = jnp.asarray(rng.randint(0, 512 - 64, (B, 1)), jnp.int32)

        def kernel(x_ref, s_ref, o_ref):
            start = s_ref[0, 0]
            acc = jnp.zeros((64, 128), jnp.int32)

            def body(k, acc):
                sl = x_ref[0, pl.ds((start + k) % (512 - 64), 64)]
                return acc + sl

            o_ref[0] = jax.lax.fori_loop(0, REPS, body, acc)

        f = jax.jit(pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 512, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 64, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 64, 128), jnp.int32),
        ))
        return f, (x, st), B * 64 * 128 * REPS

    probe("dyn sublane slice x64 [64,128] from [512,128]", build_dynslice)


if __name__ == "__main__":
    main()
