#!/usr/bin/env python
"""Stage-1 backward breakdown (follow-up to exp_backward_probe.py).

Stage 1 carries 57 of the 128 ms backward at bs256 (45%); candidates are
(a) the stem conv's weight-grad (3-input-channel contraction — terrible MXU
shape), (b) the pool backward (shift-and-max custom_vjp: an elementwise max
tree over 128^2 x 64 x bs grids), (c) the three bottleneck blocks at 64^2.
This measures each marginal piece and pool-backward alternatives.

Run: timeout 1500 python scripts/exp_stem_bwd.py [--bs 256]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def consume_grads(v, g):
    return v + jax.tree_util.tree_reduce(
        lambda a, l: a + jnp.sum(l.astype(jnp.float32)), g, 0.0)


def bench_pair(name, loss_fn, params, *args, iters=10):
    f_fwd = jax.jit(loss_fn)
    f_bwd = jax.jit(lambda p, *a: consume_grads(*jax.value_and_grad(loss_fn)(p, *a)))
    try:
        t_f = timeit(f_fwd, params, *args, iters=iters)
        t_b = timeit(f_bwd, params, *args, iters=iters)
        print(f"{name:34s}: fwd {t_f*1e3:7.2f}  fwd+bwd {t_b*1e3:7.2f}  "
              f"bwd {1e3*(t_b-t_f):7.2f} ms", flush=True)
        return t_f, t_b
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}", flush=True)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--side", type=int, default=256)
    args = ap.parse_args()

    from jax import lax

    from metro_pose3d_tpu.models.resnet import StemConv
    from metro_pose3d_tpu.ops import pool_pallas as P

    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.uniform(-1, 1, (args.bs, args.side, args.side, 3)), jnp.float32)

    stem = StemConv(64)
    sv = stem.init(jax.random.PRNGKey(0), x[:1])

    # 1. stem conv alone
    def stem_loss(params, x):
        return jnp.sum(stem.apply(params, x).astype(jnp.float32))

    bench_pair("stem conv 7x7/2", stem_loss, sv, x, iters=args.iters)

    # 2. stem + pool (production backward: shift-max custom_vjp)
    def stem_pool_loss(params, x):
        return jnp.sum(
            P.max_pool_3x3_stride2_same(stem.apply(params, x)).astype(jnp.float32))

    bench_pair("stem + pool (custom_vjp)", stem_pool_loss, sv, x, iters=args.iters)

    # 3. stem + pool via plain shift-max autodiff (max-tree backward)
    def stem_pool_shift_loss(params, x):
        return jnp.sum(
            P._maxpool_reference(stem.apply(params, x)).astype(jnp.float32))

    bench_pair("stem + pool (shift-max AD)", stem_pool_shift_loss, sv, x,
               iters=args.iters)

    # 4. pool backward in isolation (both implementations): input is a
    # ready stem output
    y = jax.jit(lambda p, x: stem.apply(p, x))(sv, x)
    y = jnp.asarray(np.asarray(y))  # materialize off the graph

    def pool_only(y):
        return jnp.sum(P.max_pool_3x3_stride2_same(y).astype(jnp.float32))

    default_impl = P.POOL_BWD_IMPL
    for impl in ("masks", "maxtree"):
        P.POOL_BWD_IMPL = impl
        f_fwd = jax.jit(pool_only)
        f_bwd = jax.jit(
            lambda y: consume_grads(*jax.value_and_grad(pool_only)(y)))
        t_f = timeit(f_fwd, y, iters=args.iters)
        t_b = timeit(f_bwd, y, iters=args.iters)
        print(f"{'pool alone bwd=' + impl:34s}: fwd {t_f*1e3:7.2f}  "
              f"fwd+bwd {t_b*1e3:7.2f}  bwd {1e3*(t_b-t_f):7.2f} ms",
              flush=True)
    P.POOL_BWD_IMPL = default_impl  # restore the module default for later runs

    # 5. one stage-1 bottleneck block at 64^2
    from metro_pose3d_tpu.models.resnet import Bottleneck

    blk = Bottleneck(features=64)
    bx = jnp.asarray(rng.uniform(-1, 1,
                                 (args.bs, args.side // 4, args.side // 4, 256)),
                     jnp.float32)
    bv = blk.init(jax.random.PRNGKey(1), bx[:1], train=True)

    def blk_loss(params, batch_stats, x):
        out, _ = blk.apply({"params": params, "batch_stats": batch_stats},
                           x, train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    f_fwd = jax.jit(blk_loss)
    f_bwd = jax.jit(lambda p, b, x: consume_grads(
        *jax.value_and_grad(blk_loss)(p, b, x)))
    t_f = timeit(f_fwd, bv["params"], bv["batch_stats"], bx, iters=args.iters)
    t_b = timeit(f_bwd, bv["params"], bv["batch_stats"], bx, iters=args.iters)
    print(f"{'one stage-1 bottleneck (64^2x256)':34s}: fwd {t_f*1e3:7.2f}  "
          f"fwd+bwd {t_b*1e3:7.2f}  bwd {1e3*(t_b-t_f):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
