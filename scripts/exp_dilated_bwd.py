#!/usr/bin/env python
"""Stage-4 dilated-conv backward probe (round 3, after the pool fix).

DESIGN.md §3.3: stage 4 (3 dilated bottleneck blocks @16²) is 27.2 ms
backward vs 9.1 fwd (3.0x; the non-dilated stages run 2.2-3.0x). The
question: does the DILATION itself make the bwd convs slow on this
emitter, and does the exact space-to-batch reformulation (a dilation-2
3x3 conv's output phases decouple by parity, so 4 interleaved 8x8 maps
convolved densely as extra batch reproduce it exactly on even sides)
hit a faster path?

Measures, at the real stage-4 3x3 shape (bs x 16 x 16 x 512, d=2, bf16):
  a) conv_general_dilated rhs_dilation=2 (what models/resnet.py emits)
  b) dense 3x3 at the same shape, d=1 (lower bound: what dilation costs)
  c) space-to-batch: phase-split -> dense 3x3 on [4B, 8, 8, C] -> merge
and asserts a == c numerically (f32, tol) before timing.

Run: timeout 1500 python scripts/exp_dilated_bwd.py [--bs 256]
"""
import argparse
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


def consume(v, g):
    return v + jax.tree_util.tree_reduce(
        lambda a, l: a + jnp.sum(l.astype(jnp.float32)), g, 0.0)


DN = ("NHWC", "HWIO", "NHWC")


def conv_dilated(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
        rhs_dilation=(2, 2), dimension_numbers=DN)


def conv_dense(x, w):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=DN)


def conv_s2b(x, w):
    # phase split: [B,16,16,C] -> [B,2,8,2,8,C] -> [4B,8,8,C]
    b, h, wdt, c = x.shape
    xs = x.reshape(b, h // 2, 2, wdt // 2, 2, c).transpose(0, 2, 4, 1, 3, 5)
    xs = xs.reshape(b * 4, h // 2, wdt // 2, c)
    ys = conv_dense(xs, w)
    ys = ys.reshape(b, 2, 2, h // 2, wdt // 2, -1).transpose(0, 3, 1, 4, 2, 5)
    return ys.reshape(b, h, wdt, -1)


def bench_pair(name, f, w, x, iters=10):
    loss = lambda w_, x_: jnp.sum(f(x_, w_).astype(jnp.float32) ** 2)
    f_fwd = jax.jit(loss)
    f_bwd = jax.jit(lambda w_, x_: consume(*jax.value_and_grad(loss)(w_, x_)))
    t_f = timeit(f_fwd, w, x, iters=iters)
    t_b = timeit(f_bwd, w, x, iters=iters)
    print(f"{name:34s}: fwd {t_f*1e3:7.2f}  fwd+bwd {t_b*1e3:7.2f}  "
          f"bwd {1e3*(t_b-t_f):7.2f} ms", flush=True)
    return t_f, t_b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--chan", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (args.bs, 16, 16, args.chan), jnp.bfloat16)
    w = jax.random.normal(kw, (3, 3, args.chan, args.chan), jnp.bfloat16) * 0.02

    # correctness: s2b == dilated (f32 to dodge bf16 accumulation-order noise)
    xa = np.asarray(x[:8], np.float32)
    wa = np.asarray(w, np.float32)
    ref = np.asarray(jax.jit(conv_dilated)(xa, wa))
    got = np.asarray(jax.jit(conv_s2b)(xa, wa))
    err = np.abs(ref - got).max()
    print(f"s2b-vs-dilated max|err| = {err:.3e} (f32)", flush=True)
    assert err < 1e-3, "space-to-batch reformulation is not exact"

    bench_pair("3x3 d=2 (stage-4 as built)", conv_dilated, w, x, iters=args.iters)
    bench_pair("3x3 d=1 dense (lower bound)", conv_dense, w, x, iters=args.iters)
    bench_pair("3x3 d=2 via space-to-batch", conv_s2b, w, x, iters=args.iters)


if __name__ == "__main__":
    main()
