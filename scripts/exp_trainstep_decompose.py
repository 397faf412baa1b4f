"""Decompose the fused train step's 206.5 ms (bs256, R50@256, twopass).

Sections timed separately on the real chip:
  augment  — device_augment alone (warp + occluder + color + normalize)
  fwdloss  — model fwd (train mode, BN stats) + losses on ready crops
  step     — fwd+bwd+Adam on ready crops (no augment)
  full     — the production train step (augment included)

Run: timeout 580 python scripts/exp_trainstep_decompose.py [bs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit_fn(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sections = sys.argv[2].split(",") if len(sys.argv) > 2 else ["aug", "fwd", "step", "full"]
    sys.path.insert(0, "/root/repo/scripts")
    from bench_device import make_batch
    from metro_pose3d_tpu.config import Config, apply_overrides
    from metro_pose3d_tpu.models.losses import compute_losses
    from metro_pose3d_tpu.models.metro import MetroModel
    from metro_pose3d_tpu.pipeline.device import device_augment
    from metro_pose3d_tpu.train.loop import make_optimizer, make_train_step
    from metro_pose3d_tpu.train.state import TrainState

    cfg = Config()
    # argv[3:]: dotted config overrides, e.g. train.fused_adam=true
    overrides = dict(a.split("=", 1) for a in sys.argv[3:])
    if overrides:
        cfg = apply_overrides(cfg, overrides)
        print(f"overrides: {overrides}")
    j, tile, side = cfg.model.num_joints, cfg.data.source_side, cfg.model.proc_side
    rng = np.random.RandomState(0)
    batch = make_batch(bs, tile, side, j, rng, None)
    occ = jnp.asarray(rng.uniform(0, 1, (64, 128, 128, 4)), jnp.float32)

    # augment alone
    if "aug" in sections:
        f_aug = jax.jit(lambda b, o: jnp.sum(device_augment(b, side, o, train=True)))
        dt_aug = timeit_fn(f_aug, batch, occ)
        print(f"augment alone bs{bs}:       {dt_aug*1e3:7.1f} ms")

    crops = None
    if "fwd" in sections or "step" in sections:
        crops = jax.jit(lambda b, o: device_augment(b, side, o, train=True))(batch, occ)
        crops = jax.block_until_ready(crops)

    model = MetroModel(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, side, side, 3)), train=True)
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))

    # fwd(train)+losses only
    def fwdloss(params, stats, crops, batch):
        (l3d, l2d), _ = model.apply(
            {"params": params, "batch_stats": stats}, crops, train=True,
            mutable=["batch_stats"])
        total, _ = compute_losses(l3d, l2d, batch, cfg, 0)
        return total
    if "fwd" in sections:
        f_fwd = jax.jit(fwdloss)
        dt_fwd = timeit_fn(f_fwd, state.params, state.batch_stats, crops, batch)
        print(f"fwd(train)+loss bs{bs}:     {dt_fwd*1e3:7.1f} ms")

    # fwd+bwd+adam on ready crops
    def step_nocrop(state, crops, batch):
        def loss_fn(params):
            (l3d, l2d), upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, crops,
                train=True, mutable=["batch_stats"])
            total, parts = compute_losses(l3d, l2d, batch, cfg, 0)
            return total, upd["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        import optax
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), loss
    if "step" in sections:
        f_step = jax.jit(step_nocrop, donate_argnums=(0,))
        # donate a COPY: the "full" section below rebuilds its state from
        # the same `variables` arrays, which donation would delete
        st = jax.tree_util.tree_map(jnp.copy, state)
        st, loss = f_step(st, crops, batch); jax.block_until_ready(loss)
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            st, loss = f_step(st, crops, batch)
            jax.block_until_ready(loss)
            times.append(time.perf_counter() - t0)
        print(f"fwd+bwd+adam (no augment): {np.median(times)*1e3:7.1f} ms")

    # full production step
    if "full" not in sections:
        return
    state2 = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                        batch_stats=variables["batch_stats"],
                        opt_state=tx.init(variables["params"]))
    step_fn = make_train_step(cfg, tx, 0, occluder_bank=occ)
    state2, m = step_fn(state2, batch); jax.block_until_ready(m)
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        state2, m = step_fn(state2, batch)
        jax.block_until_ready(m)
        times.append(time.perf_counter() - t0)
    print(f"full train step:           {np.median(times)*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
