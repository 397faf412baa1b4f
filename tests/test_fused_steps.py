"""Multi-step dispatch fusion (`train.fused_steps`).

The reference's Session loop dispatches one step at a time (SURVEY §4.1);
on TPU the idiomatic amortization for short steps is to run K train steps
inside ONE jitted `lax.fori_loop` dispatch over a device-resident batch
buffer — the host's per-dispatch cost (non-trivial through slow links,
μs-scale but nonzero even on real TPU hosts) is paid once per K steps.
These tests pin:

  * numerical equivalence: one fused dispatch of K steps == K sequential
    dispatches of the single-step fn (same cycled-batch schedule, same
    donated-state semantics, LR schedule advancing via state.step);
  * wraparound: the in-loop batch index cycles `(offset + i) % n_buf`
    exactly like the trainer's host-side `buf[i % K]` cycle;
  * the trainer integration: a `train()` run with fused_steps > 1
    produces the same step count/history boundaries as the unfused run,
    and misconfiguration (no cycle_batches, misaligned *_every) fails
    loud at setup rather than corrupting logging semantics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metro_pose3d_tpu.config import Config, apply_overrides
from metro_pose3d_tpu.data.synthetic import SyntheticDataset
from metro_pose3d_tpu.parallel.mesh import (
    make_mesh,
    put_stacked_batch,
    replicated_sharding,
    shard_batch,
)
from metro_pose3d_tpu.pipeline.loader import prepare_one, stack_examples
from metro_pose3d_tpu.train.loop import (
    make_fused_train_step,
    make_optimizer,
    make_train_step,
)
from metro_pose3d_tpu.train.state import create_train_state

TINY = {
    "model.backbone": "tiny",
    "model.proc_side": "64",
    "model.depth": "4",
    "model.compute_dtype": "float32",
    "train.warmup_steps": "0",
}


def make_batch(cfg, n, seed_base=0):
    ds = SyntheticDataset(imshape=(256, 256))
    prepared = [
        prepare_one(ds.train_example(seed_base + i), ds.joint_info,
                    cfg.model.proc_side, 128, cfg.aug,
                    (0, 0, seed_base + i), 4)
        for i in range(n)
    ]
    return stack_examples(prepared)


def _flat_params(state):
    return np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(state.params)]
    )


class TestFusedStepEquivalence:
    def _setup(self, n_buf=2, bs=8):
        cfg = apply_overrides(Config(), TINY)
        mesh = make_mesh(8)
        tx = make_optimizer(cfg)
        batches = [make_batch(cfg, bs, seed_base=100 * k) for k in range(n_buf)]
        return cfg, mesh, tx, batches

    def test_one_dispatch_matches_sequential(self):
        """K=2 buffer, 5 fused steps (wraps the buffer 2.5x) vs 5 sequential
        single-step dispatches over the same buf[i % K] schedule."""
        cfg, mesh, tx, batches = self._setup(n_buf=2)
        repl = replicated_sharding(mesh)
        n_steps = 5

        # sequential reference
        state_a = jax.device_put(create_train_state(cfg, tx), repl)
        step = make_train_step(cfg, tx, root_index=0, mesh=mesh)
        resident = [shard_batch(b, mesh) for b in batches]
        for i in range(n_steps):
            state_a, metrics_a = step(state_a, resident[i % 2], None)

        # fused: one dispatch
        state_b = jax.device_put(create_train_state(cfg, tx), repl)
        fused = make_fused_train_step(cfg, tx, root_index=0, mesh=mesh)
        stacked = put_stacked_batch(
            {k: np.stack([b[k] for b in batches]) for k in batches[0]}, mesh)
        state_b, metrics_b = fused(
            state_b, stacked, None, np.int32(0), np.int32(n_steps))

        assert int(state_b.step) == n_steps
        # atol 1e-5: compiling the step body inside a while loop recontracts
        # a few FMAs vs the standalone step (the documented ±1-LSB Mosaic/XLA
        # predication effect), and Adam's 1/(sqrt(nu)+eps) rescaling
        # amplifies an LSB gradient difference on near-zero-nu params —
        # measured max |Δ| 1.5e-6 over 6 of 149k params after 5 steps. A
        # semantic bug (wrong batch order, wrong offset, dropped step)
        # diverges at the 1e-2+ level.
        np.testing.assert_allclose(
            _flat_params(state_a), _flat_params(state_b), rtol=2e-5, atol=1e-5)
        # fused returns the LAST step's metrics (the value the trainer logs
        # at the chunk boundary)
        np.testing.assert_allclose(
            float(metrics_a["loss"]), float(metrics_b["loss"]),
            rtol=2e-5, atol=1e-6)

    def test_offset_continues_the_cycle(self):
        """Two fused dispatches (3 steps then 2, offsets 0 and 3) == one
        5-step dispatch: the offset argument keeps the buf[i % K] phase."""
        cfg, mesh, tx, batches = self._setup(n_buf=2)
        repl = replicated_sharding(mesh)
        fused = make_fused_train_step(cfg, tx, root_index=0, mesh=mesh)
        stacked = put_stacked_batch(
            {k: np.stack([b[k] for b in batches]) for k in batches[0]}, mesh)

        state_a = jax.device_put(create_train_state(cfg, tx), repl)
        state_a, _ = fused(state_a, stacked, None, np.int32(0), np.int32(3))
        state_a, m_a = fused(state_a, stacked, None, np.int32(3), np.int32(2))

        state_b = jax.device_put(create_train_state(cfg, tx), repl)
        state_b, m_b = fused(state_b, stacked, None, np.int32(0), np.int32(5))

        np.testing.assert_allclose(
            _flat_params(state_a), _flat_params(state_b), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            float(m_a["loss"]), float(m_b["loss"]), rtol=2e-5, atol=1e-6)


TRAINER_TINY = {
    "model.backbone": "tiny",
    "model.proc_side": "64",
    "model.depth": "4",
    "model.compute_dtype": "float32",
    "train.batch_size": "8",
    "train.batch_size_2d": "0",
    "train.num_steps": "4",
    "train.log_every": "2",
    "train.checkpoint_every": "2",
    "train.validate_every": "0",
    "train.warmup_steps": "0",
    "eval.batch_size": "8",
    "data.source_side": "128",
    "data.workers": "2",
    "data.cycle_batches": "2",
    "train.fused_steps": "2",
}


class TestTrainerFusedSteps:
    def test_fused_run_completes_with_correct_boundaries(self, tmp_path):
        import json
        import os

        from metro_pose3d_tpu.train.trainer import train

        cfg = apply_overrides(
            Config(), {**TRAINER_TINY, "train.logdir": str(tmp_path / "run")})
        ds = SyntheticDataset(n_train=32, n_test=8, imshape=(256, 256))
        mesh = make_mesh(4)
        state = train(cfg, ds, mesh=mesh, max_steps=4)
        assert int(state.step) == 4
        with open(os.path.join(str(tmp_path / "run"), "history.json")) as f:
            rows = json.load(f)
        # log_every=2 with fused_steps=2: boundaries land exactly on 2 and 4
        assert [r["step"] for r in rows if "loss" in r] == [2, 4]

    def test_requires_cycle_batches(self, tmp_path):
        from metro_pose3d_tpu.train.trainer import train

        cfg = apply_overrides(
            Config(),
            {**TRAINER_TINY, "data.cycle_batches": "0",
             "train.logdir": str(tmp_path / "run")})
        ds = SyntheticDataset(n_train=32, n_test=8, imshape=(256, 256))
        with pytest.raises(ValueError, match="cycle_batches"):
            train(cfg, ds, mesh=make_mesh(4), max_steps=4)

    def test_requires_aligned_boundaries(self, tmp_path):
        from metro_pose3d_tpu.train.trainer import train

        cfg = apply_overrides(
            Config(),
            {**TRAINER_TINY, "train.log_every": "3",
             "train.logdir": str(tmp_path / "run")})
        ds = SyntheticDataset(n_train=32, n_test=8, imshape=(256, 256))
        with pytest.raises(ValueError, match="fused_steps"):
            train(cfg, ds, mesh=make_mesh(4), max_steps=4)
