"""Can int8 1x1 convs beat the conv emitter as reshaped matmuls?

The int8 conv emitter's per-shape efficiency spans 0.28x-3.29x vs bf16
(scripts/exp_int8_shapes.py, DESIGN §3.2) and was the recorded reason the
TTA margin question closed "unreachable from JAX". But a 1x1 conv IS a
matmul: [B,H,W,Cin] -> [B*H*W, Cin] @ [Cin, Cout]. If XLA's int8
dot_general emitter beats its int8 conv emitter on the R50 1x1 inventory,
QuantConv can route 1x1s through dot and reclaim real throughput.

Measures, per 1x1 shape at the production batch (128):
  - int8 conv_general_dilated (preferred int32)   [current path]
  - int8 reshaped dot_general (preferred int32)   [candidate]
  - bf16 conv                                     [reference]

Run: timeout 580 python scripts/exp_int8_dot1x1.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


# every distinct 1x1 conv shape in R50@256 stride-16 (name, H/W, Cin, Cout)
SHAPES = [
    ("s2 1x1 64->64 @64", 64, 64, 64),
    ("s2 1x1 64->256 @64", 64, 64, 256),
    ("s2 1x1 256->64 @64", 64, 256, 64),
    ("s2 proj 256 @64", 64, 256, 256),
    ("s3 1x1 256->128 @32", 32, 256, 128),
    ("s3 1x1 128->512 @32", 32, 128, 512),
    ("s3 1x1 512->128 @32", 32, 512, 128),
    ("s4 1x1 512->256 @16", 16, 512, 256),
    ("s4 1x1 256->1024 @16", 16, 256, 1024),
    ("s4 1x1 1024->256 @16", 16, 1024, 256),
    ("s5 1x1 1024->512 @16", 16, 1024, 512),
    ("s5 1x1 512->2048 @16", 16, 512, 2048),
    ("s5 1x1 2048->512 @16", 16, 2048, 512),
]


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.RandomState(0)
    print(f"batch={b}", flush=True)
    for name, hw, cin, cout in SHAPES:
        x8 = jnp.asarray(rng.randint(-100, 100, (b, hw, hw, cin)), jnp.int8)
        w8 = jnp.asarray(rng.randint(-100, 100, (1, 1, cin, cout)), jnp.int8)
        xb = x8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)
        dn = lax.conv_dimension_numbers(x8.shape, w8.shape, ("NHWC", "HWIO", "NHWC"))
        flops = 2 * b * hw * hw * cin * cout

        def conv(a, c, pref):
            return jnp.sum(lax.conv_general_dilated(
                a, c, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=pref,
            ).astype(jnp.float32))

        def dot(a, c):
            m = a.reshape(-1, a.shape[-1])
            k = c.reshape(c.shape[-2], c.shape[-1])
            out = lax.dot_general(
                m, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return jnp.sum(out.astype(jnp.float32))

        t_conv8 = timeit(jax.jit(lambda a, c: conv(a, c, jnp.int32)), x8, w8)
        t_dot8 = timeit(jax.jit(dot), x8, w8)
        t_convb = timeit(jax.jit(lambda a, c: conv(a, c, jnp.float32)), xb, wb)
        print(
            f"{name:22s} conv8 {t_conv8*1e3:6.2f} ms ({flops/t_conv8/1e12:5.1f} T)"
            f"  dot8 {t_dot8*1e3:6.2f} ms ({flops/t_dot8/1e12:5.1f} T)"
            f"  bf16 {t_convb*1e3:6.2f} ms ({flops/t_convb/1e12:5.1f} T)"
            f"  dot/conv {t_conv8/t_dot8:4.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
