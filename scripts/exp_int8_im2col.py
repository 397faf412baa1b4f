"""Can im2col + int8 dot beat the int8 CONV emitter on R50 3x3 shapes?

Round-4 follow-up to exp_int8_dot1x1.py: routing pointwise convs through
the int8 *dot* emitter won 1.46-1.68x on fat shapes because the dot and
conv emitters are different code paths with different per-shape
efficiency. The same question for 3x3 convs: a conv is a matmul over
im2col patches, and `lax.conv_general_dilated_patches` + `dot_general`
is the same int8xint8->int32 integer sums (bit-exact, integer addition
associative) with a 9x activation materialization in between.

Hypothesis space:
  - win case: shapes where the int8 conv emitter is far below the dot
    emitter's rate (exp_int8_shapes found 0.28x-3.29x spread vs bf16);
  - lose case: the 9x int8 patches array costs an extra HBM write+read
    pass that the conv emitter's internal reuse avoids.

Run: timeout 1200 python scripts/exp_int8_im2col.py [batch]
Prints per-shape: conv ms / im2col-dot ms / ratio, plus a bit-exactness
check on the int32 accumulators.
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


# 3x3 conv inventory of R50@256 stride-16 (names match exp_int8_shapes.py)
SHAPES = [
    ("s2 3x3 64 @64", 64, 64, 64, 3, 1, 1),
    ("s3 3x3/2 128 @64", 64, 128, 128, 3, 2, 1),
    ("s3 3x3 128 @32", 32, 128, 128, 3, 1, 1),
    ("s4 3x3 256 @16", 16, 256, 256, 3, 1, 1),
    ("s5 3x3 512 dil2 @16", 16, 512, 512, 3, 1, 2),
]


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.RandomState(0)
    print(f"batch={b}  devices={jax.devices()}")
    for name, hw, cin, cout, k, s, d in SHAPES:
        xq = jnp.asarray(
            rng.randint(-127, 128, (b, hw, hw, cin)), jnp.int8)
        wq = jnp.asarray(
            rng.randint(-127, 128, (k, k, cin, cout)), jnp.int8)
        dn = ("NHWC", "HWIO", "NHWC")
        oh = hw // s
        flops = 2 * b * oh * oh * cin * cout * k * k

        def f_conv(a, w):
            return lax.conv_general_dilated(
                a, w, (s, s), "SAME", rhs_dilation=(d, d),
                dimension_numbers=dn, preferred_element_type=jnp.int32)

        def f_dot(a, w):
            # manual im2col via k*k static strided slices (int8-safe pure
            # data movement): patch channel order is [kh, kw, cin], which
            # matches kernel.reshape(kh*kw*cin, cout) exactly.
            bsz, ih = a.shape[0], a.shape[1]
            eff_k = (k - 1) * d + 1
            pad_total = max((oh - 1) * s + eff_k - ih, 0)
            lo = pad_total // 2
            ap = jnp.pad(a, ((0, 0), (lo, pad_total - lo),
                             (lo, pad_total - lo), (0, 0)))
            pieces = []
            for i in range(k):
                for j in range(k):
                    pieces.append(lax.slice(
                        ap,
                        (0, i * d, j * d, 0),
                        (bsz, i * d + (oh - 1) * s + 1,
                         j * d + (oh - 1) * s + 1, a.shape[3]),
                        (1, s, s, 1)))
            pat = jnp.concatenate(pieces, axis=-1)
            wmat = w.reshape(k * k * a.shape[3], cout)
            acc = lax.dot_general(
                pat.reshape(-1, k * k * a.shape[3]), wmat,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.reshape(bsz, oh, oh, cout)

        # bit-exactness on a small slice first (cheap, on-device compare)
        small = xq[:2]
        eq = jnp.array_equal(f_conv(small, wq), f_dot(small, wq))
        eq = bool(np.asarray(eq))

        tc = timeit(jax.jit(lambda a, w: jnp.sum(f_conv(a, w))), xq, wq)
        td = timeit(jax.jit(lambda a, w: jnp.sum(f_dot(a, w))), xq, wq)
        print(
            f"{name:22s} conv {tc*1e3:7.3f} ms ({flops/tc/1e12:5.1f} T)  "
            f"im2col-dot {td*1e3:7.3f} ms ({flops/td/1e12:5.1f} T)  "
            f"dot/conv {tc/td:4.2f}x  bit-exact={eq}",
            flush=True,
        )


if __name__ == "__main__":
    main()
