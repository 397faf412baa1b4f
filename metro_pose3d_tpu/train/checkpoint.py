"""Orbax checkpointing: periodic sharded saves + auto-resume.

Replaces the reference's `tf.train.Saver` flow (SURVEY.md §6): checkpoints
land under `<logdir>/checkpoints/<step>`, keep the last K, and training
auto-resumes from the latest on restart (preemption recovery for single-slice
runs — the failure-handling model appropriate to this workload).
"""
from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from metro_pose3d_tpu.train.state import TrainState


class Checkpointer:
    def __init__(self, logdir: str, keep: int = 3):
        self.dir = os.path.abspath(os.path.join(logdir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )
        # best-validation checkpoint lives in its own single-slot manager so
        # the rolling keep-K window can't evict it (training curves can spike
        # and recover; the best weights must survive)
        self._best_dir = os.path.abspath(os.path.join(logdir, "best"))
        self._best_manager = None
        self._best_metric = None

    def _best(self):
        if self._best_manager is None:
            os.makedirs(self._best_dir, exist_ok=True)
            self._best_manager = ocp.CheckpointManager(
                self._best_dir,
                options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
            )
            prev = self._best_manager.latest_step()
            if prev is not None:
                marker = os.path.join(self._best_dir, "best_metric.txt")
                if os.path.exists(marker):
                    self._best_metric = float(open(marker).read().strip())
        return self._best_manager

    def save(self, step: int, state: TrainState, force: bool = False):
        self.manager.save(step, args=ocp.args.StandardSave(state), force=force)

    def save_if_best(self, step: int, state: TrainState, metric: float) -> bool:
        """Keep the checkpoint with the LOWEST `metric` (e.g. val MPJPE)."""
        mgr = self._best()
        if self._best_metric is not None and metric >= self._best_metric:
            return False
        mgr.save(step, args=ocp.args.StandardSave(state), force=True)
        mgr.wait_until_finished()
        self._best_metric = float(metric)
        with open(os.path.join(self._best_dir, "best_metric.txt"), "w") as f:
            f.write(f"{metric}\n")
        return True

    def restore_best(self, state_template: TrainState) -> tuple[TrainState, int]:
        mgr = self._best()
        step = mgr.latest_step()
        if step is None:
            return self.restore(state_template)
        restored = mgr.restore(step, args=ocp.args.StandardRestore(state_template))
        return restored, int(step)

    def latest_step(self):
        return self.manager.latest_step()

    def restore(self, state_template: TrainState) -> tuple[TrainState, int]:
        """Restore the latest checkpoint into the template's structure."""
        step = self.manager.latest_step()
        if step is None:
            return state_template, 0
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
        return restored, int(step)

    def wait(self):
        self.manager.wait_until_finished()
