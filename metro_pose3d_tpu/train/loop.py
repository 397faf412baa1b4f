"""The single fused train step, pjit-sharded over the data mesh.

Responsibility-parity with the reference's TF1 Session loop (SURVEY.md §4.1),
re-designed TPU-first: ONE jit program per step does
  on-device crop warp + augmentation  (pipeline.device.device_augment)
  -> backbone + heads forward          (models.MetroModel, bf16 on the MXU)
  -> decode + mixed 2D/3D losses       (models.losses)
  -> backward + Adam update            (optax)
with the batch sharded over the `data` mesh axis and parameters replicated —
XLA inserts the gradient all-reduce and global-batch BN statistics over ICI.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from metro_pose3d_tpu.config import Config
from metro_pose3d_tpu.models.losses import compute_losses
from metro_pose3d_tpu.models.metro import MetroModel
from metro_pose3d_tpu.parallel.mesh import batch_sharding, replicated_sharding
from metro_pose3d_tpu.pipeline.device import device_augment
from metro_pose3d_tpu.train.state import TrainState


def make_lr_schedule(cfg: Config):
    t = cfg.train
    if t.lr_schedule == "constant":
        sched = optax.constant_schedule(t.base_lr)
    elif t.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(t.base_lr, max(t.num_steps - t.warmup_steps, 1))
    elif t.lr_schedule == "exp_decay":
        sched = optax.exponential_decay(
            t.base_lr, t.lr_decay_steps, t.lr_decay_rate, staircase=False
        )
    else:
        raise ValueError(t.lr_schedule)
    if t.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, t.base_lr, t.warmup_steps)
        return optax.join_schedules([warmup, sched], [t.warmup_steps])
    return sched


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    tx = optax.adam(make_lr_schedule(cfg))
    if cfg.train.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip_norm), tx)
    return tx


def make_train_step(cfg: Config, tx: optax.GradientTransformation,
                    root_index: int = 0, mesh=None, occluder_bank=None,
                    background_bank=None, occluder_packed: bool = False):
    """Build the jitted train step. With `mesh`, inputs/outputs get explicit
    shardings (state replicated, batch split on `data`) and donation.
    `background_bank` ([N,T,T,3] uint8, replicated) enables the 3DHP
    green-screen replacement for batches carrying "source_mask".
    `occluder_packed=True` declares that the bank operand passed at call
    time is the PRE-packed output of `pipeline.device.pack_occluder_bank_for`
    (pack once at setup rather than in-graph every step)."""
    model = MetroModel(cfg.model)
    bg_bank = (
        jnp.asarray(background_bank) if background_bank is not None else None
    )

    def augment(batch: dict, occ_bank):
        return device_augment(
            batch, cfg.model.proc_side, occ_bank, train=True,
            background_bank=bg_bank, warp_sampler=cfg.aug.warp_sampler,
            warp_newton_iters=cfg.aug.warp_newton_iters,
            occluder_packed=occluder_packed,
            occluder_tile_side=cfg.aug.occluder_tile_side,
        )

    if mesh is not None:
        # the augment stage contains Pallas custom calls (the two-pass warp
        # and occluder kernels), which GSPMD cannot partition — run it
        # under shard_map so each device executes its own kernel grid over
        # its batch shard (pure per-example math: no cross-shard deps)
        from jax import shard_map  # jax>=0.8 home (experimental alias deprecated)
        from jax.sharding import PartitionSpec as P

        augment = shard_map(
            augment, mesh=mesh,
            in_specs=(P("data"), P()), out_specs=P("data"),
            check_vma=False,
        )

    def step(state: TrainState, batch: dict, occ_bank) -> tuple[TrainState, dict]:
        crops = augment(batch, occ_bank)

        def loss_fn(params):
            (l3d, l2d), updated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                crops, train=True, mutable=["batch_stats"],
            )
            total, parts = compute_losses(l3d, l2d, batch, cfg, root_index)
            return total, (parts, updated["batch_stats"])

        (_, (parts, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
        )
        metrics = dict(parts)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        jitted = jax.jit(step, donate_argnums=(0,))
    else:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        jitted = jax.jit(
            step,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    if occluder_bank is not None:
        # positional bind: pjit rejects kwargs when in_shardings is given,
        # so a keyword partial would crash every MESHED run with occluders
        bank = occluder_bank

        def bound(state, batch):
            return jitted(state, batch, bank)

        return bound
    return jitted
