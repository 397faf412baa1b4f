"""Does the int8 conv emitter prefer a different data layout (NCHW)?

The int8 conv emitter's per-shape efficiency (0.28x-3.29x vs bf16,
exp_int8_shapes.py) is the residual TTA bottleneck. Layout is the one
emitter-visible axis we have not probed: XLA TPU canonicalizes layouts
internally, but the dimension_numbers we hand it change which transposes
it must insert and which emitter template it picks. This times the R50
conv inventory int8 NHWC vs int8 NCHW (inputs pre-laid-out, so any
in-graph transpose cost shows up as emitter overhead, exactly as it
would inside a whole-network layout flip).

Run: timeout 1200 python scripts/exp_int8_layout.py [batch]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SHAPES = [
    ("s2 1x1 256->64 @64", 64, 256, 64, 1, 1, 1),
    ("s2 3x3 64 @64", 64, 64, 64, 3, 1, 1),
    ("s3 3x3/2 128 @64", 64, 128, 128, 3, 2, 1),
    ("s3 1x1 512->128 @32", 32, 512, 128, 1, 1, 1),
    ("s4 3x3 256 @16", 16, 256, 256, 3, 1, 1),
    ("s5 1x1 2048->512 @16", 16, 2048, 512, 1, 1, 1),
    ("s5 3x3 512 dil2 @16", 16, 512, 512, 3, 1, 2),
    ("s5 1x1 512->2048 @16", 16, 512, 2048, 1, 1, 1),
]


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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.RandomState(0)
    print(f"batch={b}")
    for name, hw, cin, cout, k, s, d in SHAPES:
        x = rng.randint(-127, 128, (b, hw, hw, cin)).astype(np.int8)
        w = rng.randint(-127, 128, (k, k, cin, cout)).astype(np.int8)
        res = {}
        for layout in ("NHWC", "NCHW"):
            if layout == "NHWC":
                xx = jnp.asarray(x)
                ww = jnp.asarray(w)
                dn = ("NHWC", "HWIO", "NHWC")
            else:
                xx = jnp.asarray(np.transpose(x, (0, 3, 1, 2)))
                ww = jnp.asarray(np.transpose(w, (3, 2, 0, 1)))
                dn = ("NCHW", "OIHW", "NCHW")

            def f(a, c, dn=dn):
                return jnp.sum(lax.conv_general_dilated(
                    a, c, (s, s), "SAME", rhs_dilation=(d, d),
                    dimension_numbers=dn,
                    preferred_element_type=jnp.int32))

            try:
                res[layout] = timeit(jax.jit(f), xx, ww)
            except Exception as e:  # noqa: BLE001
                res[layout] = None
                print(f"{name:22s} {layout}: FAIL "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
        if res.get("NHWC") and res.get("NCHW"):
            flops = 2 * b * (hw // s) ** 2 * cin * cout * k * k
            print(
                f"{name:22s} NHWC {res['NHWC']*1e3:7.3f} ms "
                f"({flops/res['NHWC']/1e12:5.1f} T)  "
                f"NCHW {res['NCHW']*1e3:7.3f} ms "
                f"({flops/res['NCHW']/1e12:5.1f} T)  "
                f"NCHW/NHWC {res['NHWC']/res['NCHW']:4.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
