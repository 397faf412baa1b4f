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

    def save(self, step: int, state: TrainState, force: bool = False):
        self.manager.save(step, args=ocp.args.StandardSave(state), force=force)

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
