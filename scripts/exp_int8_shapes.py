"""Per-shape int8-vs-bf16 conv rates over the R50@256 conv inventory.

The end-to-end int8 predict gained only +14% against the 1.66x raw conv
probe — this isolates which conv classes (1x1, 3x3, strided, dilated,
small-spatial) benefit, to drive a mixed-precision quantization policy.

Run: timeout 580 python scripts/exp_int8_shapes.py [start_idx]
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


# (name, H/W, Cin, Cout, k, stride, dilation) — R50@256 stride-16 inventory
SHAPES = [
    ("s2 1x1 256->64 @64", 64, 256, 64, 1, 1, 1),
    ("s2 3x3 64 @64", 64, 64, 64, 3, 1, 1),
    ("s2 1x1 64->256 @64", 64, 64, 256, 1, 1, 1),
    ("s3 3x3/2 128 @64", 64, 128, 128, 3, 2, 1),
    ("s3 1x1 512->128 @32", 32, 512, 128, 1, 1, 1),
    ("s3 3x3 128 @32", 32, 128, 128, 3, 1, 1),
    ("s4 1x1 1024->256 @16", 16, 1024, 256, 1, 1, 1),
    ("s4 3x3 256 @16", 16, 256, 256, 3, 1, 1),
    ("s5 1x1 2048->512 @16", 16, 2048, 512, 1, 1, 1),
    ("s5 3x3 512 dil2 @16", 16, 512, 512, 3, 1, 2),
    ("s5 1x1 512->2048 @16", 16, 512, 2048, 1, 1, 1),
]


def main():
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    b = 256
    rng = np.random.RandomState(0)
    for name, hw, cin, cout, k, s, d in SHAPES[start:]:
        x = jnp.asarray(rng.randn(b, hw, hw, cin), jnp.float32)
        w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.float32)
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        flops = 2 * b * (hw // s) ** 2 * cin * cout * k * k
        res = {}
        for mode in ("bf16", "int8"):
            if mode == "bf16":
                xx, ww, pref = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), jnp.float32
            else:
                xx = (x * 10).astype(jnp.int8)
                ww = (w * 100).astype(jnp.int8)
                pref = jnp.int32

            def f(a, c, pref=pref):
                return jnp.sum(lax.conv_general_dilated(
                    a, c, (s, s), "SAME", rhs_dilation=(d, d),
                    dimension_numbers=dn, preferred_element_type=pref,
                ).astype(jnp.float32))

            try:
                dt = timeit(jax.jit(f), xx, ww)
                res[mode] = dt
            except Exception as e:  # noqa: BLE001
                res[mode] = None
                print(f"{name:24s} {mode}: FAIL {str(e).splitlines()[0][:80]}")
        if res.get("bf16") and res.get("int8"):
            r = res["bf16"] / res["int8"]
            print(f"{name:24s} bf16 {res['bf16']*1e3:6.2f} ms ({flops/res['bf16']/1e12:5.1f} T)  "
                  f"int8 {res['int8']*1e3:6.2f} ms ({flops/res['int8']/1e12:5.1f} T)  int8/bf16 {r:4.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
