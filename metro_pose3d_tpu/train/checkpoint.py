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


def _sharded_template(state_template, sharding):
    """Template whose arrays carry the restore-target sharding.

    Fresh `model.init`/`tx.init` arrays are UNCOMMITTED, so `device_put`
    to a mesh-wide sharding works per-process (each process supplies its
    local copy); orbax then restores into exactly those global shardings.
    With `sharding=None` under multi-process execution, default to
    replicated over the standard global mesh — every current caller
    either replicates (trainer, eval variable loading) or passes its own.
    """
    if sharding is None:
        if jax.process_count() == 1:
            return state_template
        from metro_pose3d_tpu.parallel.mesh import make_mesh, replicated_sharding

        sharding = replicated_sharding(make_mesh())
    return jax.device_put(state_template, sharding)


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
        # multi-host: every process calls save() (orbax coordinates, the
        # primary writes), the comparison above is host-identical because
        # validation runs replicate_hosts=True — but this plain marker file
        # must have a single writer
        if jax.process_index() == 0:
            with open(os.path.join(self._best_dir, "best_metric.txt"), "w") as f:
                f.write(f"{metric}\n")
        return True

    def restore_best(self, state_template: TrainState,
                     sharding=None) -> tuple[TrainState, int]:
        mgr = self._best()
        step = mgr.latest_step()
        if step is None:
            return self.restore(state_template, sharding=sharding)
        tpl = _sharded_template(state_template, sharding)
        restored = mgr.restore(step, args=ocp.args.StandardRestore(tpl))
        return restored, int(step)

    def latest_step(self):
        return self.manager.latest_step()

    def restore(self, state_template: TrainState,
                sharding=None) -> tuple[TrainState, int]:
        """Restore the latest checkpoint into the template's structure.

        `sharding`: target sharding for the restored arrays (e.g. the
        trainer's replicated sharding over its mesh). Orbax restores into
        the TEMPLATE's shardings; a host-built template restores to
        committed single-device arrays, and on a pod the later
        `device_put(state, replicated)` is then a cross-host transfer,
        which the TPU runtime refuses (found by the round-4 multi-process
        driver rehearsal — resume crashed with
        "does not support cross-host device transfers"). Restoring
        straight into the global sharding avoids any post-hoc transfer.
        Defaults to replicated-over-the-global-mesh when running
        multi-process; single-process templates are used as-is.
        """
        step = self.manager.latest_step()
        if step is None:
            return state_template, 0
        tpl = _sharded_template(state_template, sharding)
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(tpl)
        )
        return restored, int(step)

    def wait(self):
        self.manager.wait_until_finished()
