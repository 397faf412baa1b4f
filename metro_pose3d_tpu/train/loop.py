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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

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


class FlatAdamState(NamedTuple):
    count: jnp.ndarray  # number of applied updates
    mu: jnp.ndarray     # first moment, ONE concatenated f32 buffer
    nu: jnp.ndarray     # second moment, same layout


def flat_fused_adam(learning_rate, clip_norm: float = 0.0,
                    b1: float = 0.9, b2: float = 0.999,
                    eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam (+ optional global-norm clip) over ONE concatenated buffer.

    The optax chain walks the ~155-leaf R50 tree leaf-by-leaf, which on the
    v5e costs 8.2 ms/update standalone (11.8 in the train step) — mostly
    per-leaf kernel overhead on the many small BN tensors. Raveling grads
    into a single f32 vector and running the whole update as a few fused
    elementwise passes measures 3.5 ms INCLUDING the clip (chip A/B
    2026-08-17, scripts/exp_adam_probe.py; the concat/split is bandwidth
    noise). Math matches `clip_by_global_norm(clip) + adam(lr)` exactly up
    to float reassociation of the norm/concat order: bias correction uses
    the post-increment count, the LR schedule the pre-increment count, as
    optax does.
    """
    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init(params):
        flat, _ = ravel_pytree(params)
        # mu and nu MUST be distinct buffers: donated train-state trees
        # that alias one buffer twice die on the TPU backend with an opaque
        # INVALID_ARGUMENT at run time (axon, 2026-08-17 — reproduced and
        # isolated by scripts/exp_fused_adam_probe.py)
        return FlatAdamState(count=jnp.zeros((), jnp.int32),
                             mu=jnp.zeros(flat.shape, jnp.float32),
                             nu=jnp.zeros(flat.shape, jnp.float32))

    def update(grads, state, params=None):
        del params
        g, unravel = ravel_pytree(grads)
        g = g.astype(jnp.float32)
        if clip_norm > 0:
            norm = jnp.sqrt(jnp.sum(g * g))
            g = g * (clip_norm / jnp.maximum(norm, clip_norm))
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**c)
        nu_hat = nu / (1.0 - b2**c)
        lr = sched(state.count)
        flat_updates = (-lr) * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(flat_updates), FlatAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.train.fused_adam:
        return flat_fused_adam(make_lr_schedule(cfg), cfg.train.grad_clip_norm)
    tx = optax.adam(make_lr_schedule(cfg))
    if cfg.train.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip_norm), tx)
    return tx


def _build_raw_step(cfg: Config, tx: optax.GradientTransformation,
                    root_index: int, mesh, background_bank,
                    occluder_packed: bool):
    """The UN-jitted train step closure shared by `make_train_step` (one
    step per dispatch) and `make_fused_train_step` (K steps per dispatch
    inside a `lax.fori_loop`)."""
    model = MetroModel(cfg.model.at_phase(train=True))
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

    return step


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
    step = _build_raw_step(cfg, tx, root_index, mesh, background_bank,
                           occluder_packed)

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


def make_fused_train_step(cfg: Config, tx: optax.GradientTransformation,
                          root_index: int = 0, mesh=None,
                          background_bank=None, occluder_packed: bool = False):
    """K train steps per dispatch: `fused(state, batches, occ_bank, offset,
    n) -> (state, last_metrics)` where `batches` is a K-batch buffer stacked
    on a new leading axis (see `parallel.mesh.put_stacked_batch`) and the
    loop consumes `batches[(offset + i) % K]` for i in [0, n) — the same
    schedule the trainer's host-side `buf[step % K]` cycle produces, so a
    fused run is step-for-step equivalent to the unfused one (pinned by
    tests/test_fused_steps.py).

    Why: the reference dispatches one step at a time (SURVEY §4.1 Session
    loop). On TPU the per-dispatch host cost is pure overhead once batches
    are device-resident; a `lax.fori_loop` over the step body pays it once
    per K steps and lets XLA overlap the loop iterations' host-independent
    schedule. `n` is TRACED (the loop lowers to a dynamic-trip-count while
    loop), so one compile serves every chunk size — including the final
    partial chunk when num_steps % K != 0. The LR schedule and Adam bias
    correction advance via `state.step`/opt-state count inside the body,
    exactly as in sequential dispatch."""
    import jax.lax as lax

    step = _build_raw_step(cfg, tx, root_index, mesh, background_bank,
                           occluder_packed)

    def fused(state: TrainState, batches: dict, occ_bank, offset, n):
        n_buf = jax.tree_util.tree_leaves(batches)[0].shape[0]

        def batch_at(idx):
            return jax.tree_util.tree_map(
                lambda x: lax.dynamic_index_in_dim(x, idx, 0, keepdims=False),
                batches,
            )

        def body(i, carry):
            st, _ = carry
            return step(st, batch_at(lax.rem(offset + i, n_buf)), occ_bank)

        # run step 0 eagerly (in-trace) to materialize the metrics carry
        # structure, then loop the remaining n-1 steps; n >= 1 required
        carry = body(jnp.int32(0), (state, None))
        return lax.fori_loop(1, n, body, carry)

    if mesh is None:
        return jax.jit(fused, donate_argnums=(0,))
    repl = replicated_sharding(mesh)
    # in_shardings inferred: batches/occ_bank arrive committed (the stacked
    # buffer via put_stacked_batch, the bank via the trainer's device_put),
    # offset/n are replicated scalars
    return jax.jit(fused, out_shardings=(repl, repl), donate_argnums=(0,))
