#!/usr/bin/env python
"""Training-backward decomposition + remat sweep (VERDICT r2 weak #3).

Round-2 measured fwd 39.9 ms vs fwd+bwd+Adam 187.8 ms at bs256 (bwd ~3.7x
fwd, train MFU ~30% vs 55.6% inference) and left the backward unprobed.
This script measures, on ready crops (augment excluded):

  1. fwd-only (loss value) per stage-truncated backbone -> cumulative
     per-stage fwd cost
  2. fwd+bwd (value_and_grad) per truncation -> cumulative per-stage bwd
     cost (difference isolates each stage's backward share)
  3. remat policy sweep on the full model: none / dots-saveable / full
  4. Adam update share (grad application alone)

Run: timeout 1500 python scripts/exp_backward_probe.py [--bs 256]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--side", type=int, default=256)
    ap.add_argument("--depths", default="3,4,6,3",
                    help="stage depths (CPU smoke: 1,1,1,1)")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    depths = tuple(int(d) for d in args.depths.split(","))
    crops = jnp.asarray(
        rng.uniform(-1, 1, (args.bs, args.side, args.side, 3)), jnp.float32)

    # --- per-stage cumulative fwd/bwd via truncated trunks ------------------
    # stage truncation through the real ResNet: register depth-prefix
    # variants so each run is the genuine first-k-stages trunk
    from metro_pose3d_tpu.models import resnet as R

    results = {}
    for n_stages in (1, 2, 3, 4):
        name = f"r50cut{n_stages}"
        R.RESNET_DEPTHS[name] = depths[:n_stages]
        model = R.ResNet(variant=name, output_stride=16, preact=True)
        variables = model.init(jax.random.PRNGKey(0), crops[:1], train=False)

        def fwd(params, batch_stats, x, model=model):
            out, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))

        def bwd(p, b, x, fwd=fwd):
            # MUST consume the grads or XLA DCEs the whole backward
            v, g = jax.value_and_grad(fwd)(p, b, x)
            return v + jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l.astype(jnp.float32)), g, 0.0)

        f_fwd = jax.jit(fwd)
        f_bwd = jax.jit(bwd)
        # grad wrt params only; returns one scalar so output transfer is tiny
        try:
            t_f = timeit(f_fwd, variables["params"], variables["batch_stats"],
                         crops, iters=args.iters)
            t_b = timeit(f_bwd, variables["params"], variables["batch_stats"],
                         crops, iters=args.iters)
            results[n_stages] = (t_f, t_b)
            print(f"stages<= {n_stages}: fwd {t_f*1e3:7.2f} ms   "
                  f"fwd+bwd {t_b*1e3:7.2f} ms   bwd/fwd {t_b/t_f - 1:5.2f}x",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"stages<= {n_stages}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    if 4 in results and 1 in results:
        print("\nper-stage marginal costs (ms):", flush=True)
        prev_f = prev_b = 0.0
        for n_stages in (1, 2, 3, 4):
            if n_stages not in results:
                continue
            t_f, t_b = results[n_stages]
            print(f"  stage {n_stages}: fwd {1e3*(t_f-prev_f):7.2f}   "
                  f"bwd-only {1e3*((t_b-t_f)-(prev_b-prev_f)):7.2f}", flush=True)
            prev_f, prev_b = t_f, t_b

    # --- remat sweep on the full trunk -------------------------------------
    from jax.ad_checkpoint import checkpoint_policies as cp

    R.RESNET_DEPTHS["r50cut4"] = depths
    model = R.ResNet(variant="r50cut4", output_stride=16, preact=True)
    variables = model.init(jax.random.PRNGKey(0), crops[:1], train=False)

    def make_loss(policy):
        def apply_fn(params, batch_stats, x):
            out, _ = model.apply(
                {"params": params, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))

        if policy is None:
            return apply_fn
        return jax.checkpoint(apply_fn, policy=policy)

    for pname, policy in [
        ("baseline_no_remat", None),  # make_loss(None) returns the bare fn
        ("everything_saveable", cp.everything_saveable),
        ("dots_saveable", cp.dots_saveable),
        ("nothing_saveable_full_remat", cp.nothing_saveable),
        ("dots_no_batch_dims", cp.dots_with_no_batch_dims_saveable),
    ]:
        def f_remat(p, b, x, pol=policy):
            v, g = jax.value_and_grad(make_loss(pol))(p, b, x)
            return v + jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(l.astype(jnp.float32)), g, 0.0)

        f = jax.jit(f_remat)
        try:
            t = timeit(f, variables["params"], variables["batch_stats"],
                       crops, iters=args.iters)
            print(f"remat {pname:26s}: fwd+bwd {t*1e3:7.2f} ms "
                  f"({args.bs/t:7.0f} crops/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"remat {pname:26s}: FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:140]}", flush=True)

    # --- Adam share ---------------------------------------------------------
    import optax

    tx = optax.adam(1e-4)
    params = variables["params"]
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def upd(g, o, p):
        u, o2 = tx.update(g, o, p)
        p2 = optax.apply_updates(p, u)
        return jnp.sum(jax.tree_util.tree_reduce(
            lambda a, l: a + jnp.sum(l.astype(jnp.float32)), p2, 0.0))

    t = timeit(upd, grads, opt_state, params, iters=args.iters)
    print(f"adam update alone: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
