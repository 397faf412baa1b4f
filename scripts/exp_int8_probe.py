"""Probe: does XLA emit fast int8 convolutions on this TPU toolchain?

If a representative R50 stage-3 conv runs ~2x bf16 rate in int8, a
quantized inference path could close the flip-TTA throughput gap
(DESIGN.md §3.2). If not, the roofline stands.

Run: timeout 580 python scripts/exp_int8_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timeit(fn, *args, iters=20, warmup=3):
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
    # R50 stage-3-ish: [B, 32, 32, 512] x 3x3x512x512
    b, h, w, cin, cout = 256, 32, 32, 512, 512
    x_f = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    k_f = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
    dn = lax.conv_dimension_numbers(x_f.shape, k_f.shape, ("NHWC", "HWIO", "NHWC"))
    flops = 2 * b * h * w * cin * cout * 9

    def conv(x, k, prefer):
        return jnp.sum(lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=prefer).astype(jnp.float32))

    for name, xx, kk, prefer in [
        ("bf16", x_f.astype(jnp.bfloat16), k_f.astype(jnp.bfloat16), jnp.float32),
        ("int8->int32", (x_f * 10).astype(jnp.int8), (k_f * 100).astype(jnp.int8),
         jnp.int32),
    ]:
        try:
            f = jax.jit(lambda a, c, p=prefer: conv(a, c, p))
            dt = timeit(f, xx, kk)
            print(f"conv {name:12s}: {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s-equiv")
        except Exception as e:  # noqa: BLE001
            print(f"conv {name:12s}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:120]}")

    # MXU-shaped matmul comparison for reference
    m = k = n = 4096
    a_f = jnp.asarray(rng.randn(m, k), jnp.float32)
    b_f = jnp.asarray(rng.randn(k, n), jnp.float32)
    mm_flops = 2 * m * k * n
    for name, aa, bb, prefer in [
        ("bf16", a_f.astype(jnp.bfloat16), b_f.astype(jnp.bfloat16), jnp.float32),
        ("int8->int32", (a_f * 10).astype(jnp.int8), (b_f * 10).astype(jnp.int8),
         jnp.int32),
    ]:
        try:
            f = jax.jit(lambda p, q, pref=prefer: jnp.sum(
                jnp.dot(p, q, preferred_element_type=pref,
                        precision=jax.lax.Precision.DEFAULT).astype(jnp.float32)))
            dt = timeit(f, aa, bb)
            print(f"mm   {name:12s}: {dt*1e3:7.2f} ms  {mm_flops/dt/1e12:6.1f} TFLOP/s-equiv")
        except Exception as e:  # noqa: BLE001
            print(f"mm   {name:12s}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
