#!/usr/bin/env python
"""Adam-update probe (round 3): why is the optimizer 11.8 ms at 24M params?

The HBM-bandwidth bound for Adam on 24M f32 params (read p,m,v,g; write
p,m,v -> ~670 MB) is ~1 ms on a v5e. exp_backward_probe.py measured
11.8 ms for the as-built optax chain (clip_by_global_norm + adam over a
~160-leaf R50 tree). Candidates: per-leaf kernel launch/fusion overhead on
many small BN tensors, the extra global-norm pass, bf16->f32 grad casts.

Measures, on the real R50@256 param tree (bf16 grads, f32 state):
  a) optax.adam alone (tree)
  b) clip_by_global_norm(1.0) + adam (the as-built chain)
  c) flat Adam: one concatenated f32 vector per (p, m, v, g)
  d) flat Adam + global-norm clip (one extra reduction over the flat g)

Run: timeout 1500 python scripts/exp_adam_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timeit(fn, *args, iters=10, warmup=2):
    # fn must return a SCALAR that consumes its outputs: staging the full
    # param tree through the axon tunnel costs ~1 s/call and swamps the
    # measurement (CLAUDE.md: keep jit outputs small; sync via np.asarray).
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def tree_sum(*trees):
    tot = jnp.zeros((), jnp.float32)
    for t in trees:
        for leaf in jax.tree_util.tree_leaves(t):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
    return tot


def main():
    from metro_pose3d_tpu.config import Config
    from metro_pose3d_tpu.models.metro import MetroModel

    cfg = Config()
    model = MetroModel(cfg.model)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, cfg.model.proc_side, cfg.model.proc_side, 3), jnp.float32)
    variables = model.init(rng, x, train=False)
    params = variables["params"]
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    leaves = len(jax.tree_util.tree_leaves(params))
    print(f"params: {n/1e6:.1f}M in {leaves} leaves", flush=True)

    grads = jax.tree_util.tree_map(
        lambda p: jnp.ones_like(p, jnp.bfloat16) * 1e-4, params)

    for name, tx in [
        ("optax.adam (tree)", optax.adam(1e-3)),
        ("clip+adam (as built)", optax.chain(
            optax.clip_by_global_norm(1.0), optax.adam(1e-3))),
    ]:
        opt_state = jax.jit(tx.init)(params)

        @jax.jit
        def step(p, g, s, tx=tx):
            u, s2 = tx.update(g, s, p)
            return tree_sum(optax.apply_updates(p, u), s2)

        t = timeit(step, params, grads, opt_state)
        print(f"{name:28s}: {t*1e3:7.2f} ms", flush=True)

    # flat Adam: single concatenated buffers
    flat, tdef = jax.tree_util.tree_flatten(params)
    sizes = [p.size for p in flat]
    fp = jnp.concatenate([p.reshape(-1).astype(jnp.float32) for p in flat])
    fg = jnp.concatenate([g.reshape(-1).astype(jnp.bfloat16) for g in
                          jax.tree_util.tree_leaves(grads)])
    m = jnp.zeros_like(fp)
    v = jnp.zeros_like(fp)

    def flat_adam(p, g, m, v, t, clip=None):
        g = g.astype(jnp.float32)
        if clip is not None:
            norm = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.minimum(1.0, clip / (norm + 1e-12))
        b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-3
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** t)
        vh = v / (1 - b2 ** t)
        return tree_sum(p - lr * mh / (jnp.sqrt(vh) + eps), m, v)

    f_plain = jax.jit(lambda p, g, m, v: flat_adam(p, g, m, v, 10.0))
    f_clip = jax.jit(lambda p, g, m, v: flat_adam(p, g, m, v, 10.0, clip=1.0))
    t = timeit(f_plain, fp, fg, m, v)
    print(f"{'flat adam (1 buffer)':28s}: {t*1e3:7.2f} ms", flush=True)
    t = timeit(f_clip, fp, fg, m, v)
    print(f"{'flat adam + clip':28s}: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
