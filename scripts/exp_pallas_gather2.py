"""Bisect: which same-shape dynamic_gather shapes/axes compile on axon?"""
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


def probe(h, w, axis, dtype, b=8):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 1000, (b, h, w)).astype(dtype))
    idx = jnp.asarray(rng.randint(0, (h if axis == 0 else w), (b, h, w)), jnp.int32)

    def kernel(x_ref, i_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(x_ref[0], i_ref[0], axis=axis)

    f = jax.jit(pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), x.dtype),
    ))
    try:
        out = np.asarray(f(x, idx))
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=axis + 1)
        ok = bool((out == ref).all())
        dt = timeit(f, x, idx)
        rate = b * h * w / dt / 1e6
        print(f"[{h}x{w}] axis={axis} {np.dtype(dtype).name} b={b}: ok={ok} {dt*1e3:7.2f} ms {rate:8.0f}M idx/s")
    except Exception as e:  # noqa: BLE001
        print(f"[{h}x{w}] axis={axis} {np.dtype(dtype).name}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:100]}")


if __name__ == "__main__":
    for axis in (0, 1):
        for h, w in ((8, 128), (64, 128), (128, 128), (256, 256), (512, 512)):
            probe(h, w, axis, np.int32)
    probe(256, 256, 1, np.float32)
    probe(512, 512, 1, np.float32, b=64)
    probe(512, 512, 0, np.float32, b=64)
