#!/usr/bin/env python
"""Diagnose the axon INVALID_ARGUMENT when the FULL train step combines the
Pallas augment kernels with flat_fused_adam (round 3).

Observed (exp_trainstep_decompose, bs256, 2026-08-17): fwd+bwd+fused-adam on
ready crops runs (189.6 ms, -4.1 vs the optax chain), but the production
step (augment in-graph) fails at run time with ``INVALID_ARGUMENT: TPU
backend error`` — reproducibly, while the same graph with the optax chain
runs. Hypotheses:
  a) Mosaic custom calls + the 24M-element concat/slice chain in one
     program trip a backend operand limit -> A/B with warp_sampler=packed
     (no Pallas) vs twopass;
  b) donation aliasing of the flat opt buffers -> A/B donate on/off.

Run: timeout 1500 python scripts/exp_fused_adam_probe.py [bs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_occ = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from bench_device import make_batch
    from metro_pose3d_tpu.config import Config, apply_overrides
    from metro_pose3d_tpu.train.loop import make_optimizer, make_train_step
    from metro_pose3d_tpu.train.state import TrainState
    from metro_pose3d_tpu.models.metro import MetroModel

    cfg0 = apply_overrides(Config(), {"train.fused_adam": "true"})
    j, tile, side = cfg0.model.num_joints, cfg0.data.source_side, cfg0.model.proc_side
    rng = np.random.RandomState(0)
    batch = make_batch(bs, tile, side, j, rng, None)
    occ = jnp.asarray(rng.uniform(0, 1, (n_occ, 128, 128, 4)), jnp.float32)
    print(f"bs={bs} occluder bank={n_occ} tiles", flush=True)

    model = MetroModel(cfg0.model)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, side, side, 3)), train=True)

    for sampler in ("twopass", "packed"):
        cfg = apply_overrides(cfg0, {"aug.warp_sampler": sampler})
        tx = make_optimizer(cfg)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=tx.init(variables["params"]))
        if "nocopy" not in sys.argv:
            # fresh buffers; with "nocopy" the state aliases `variables`
            # across samplers like exp_trainstep_decompose's full section
            state = jax.tree_util.tree_map(jnp.copy, state)
        step_fn = make_train_step(cfg, tx, 0, occluder_bank=occ)
        try:
            state, m = step_fn(state, batch)
            jax.block_until_ready(m)
            t0 = time.perf_counter()
            for _ in range(4):
                state, m = step_fn(state, batch)
            jax.block_until_ready(m)
            dt = (time.perf_counter() - t0) / 4
            print(f"full step sampler={sampler:8s}: OK  {dt*1e3:7.1f} ms", flush=True)
        except Exception as e:
            print(f"full step sampler={sampler:8s}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
