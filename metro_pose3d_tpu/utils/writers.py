"""Metric writers: TensorBoard scalars via clu, with a JSON-lines fallback.

Responsibility-parity with the reference's TensorBoard summaries
(SURVEY.md §6 "Metrics / logging"): losses, learning rate, throughput and
validation metrics stream to the logdir; `history.jsonl` keeps a plain-text
mirror so runs remain inspectable without TensorBoard.
"""
from __future__ import annotations

import json
import os


class NullWriter:
    """No-op MetricWriter for non-primary hosts: on a pod every process runs
    the trainer loop with identical replicated metrics, but only process 0
    may write the shared logdir (round-4 multi-process driver rehearsal:
    unguarded writers raced on history.jsonl)."""

    def write_scalars(self, step: int, scalars: dict):
        pass

    def flush(self):
        pass

    def close(self):
        pass


def make_metric_writer(logdir: str, primary: bool = True):
    """MetricWriter on the primary host, NullWriter elsewhere."""
    return MetricWriter(logdir) if primary else NullWriter()


class MetricWriter:
    """Thin facade: write_scalars(step, dict) + flush/close."""

    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "history.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from clu import metric_writers

                self._tb = metric_writers.SummaryWriter(logdir)
            except Exception:  # clu/tf absent or incompatible: JSON only
                self._tb = None

    def write_scalars(self, step: int, scalars: dict):
        clean = {k: float(v) for k, v in scalars.items()}
        self._jsonl.write(json.dumps({"step": int(step), **clean}) + "\n")
        self._jsonl.flush()  # keep tail -f / crash forensics live
        if self._tb is not None:
            self._tb.write_scalars(int(step), clean)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
