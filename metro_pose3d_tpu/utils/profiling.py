"""Tracing / profiling utilities (SURVEY.md §6 "Tracing / profiling").

The reference has only TensorBoard scalars and ad-hoc timers; on TPU the
first-class tools are the XLA profiler (xprof/tensorboard-plugin-profile)
and wall-clock step timing around `block_until_ready`. This module wraps
both, plus the crops/sec counter that is the BASELINE.json north-star.

Usage:
    with trace(logdir):                      # xprof trace for a few steps
        step(...)

    timer = StepTimer()
    for batch in data:
        out = step(batch)
        timer.tick(batch_size)               # call after each step
    print(timer.summary())                   # p50/p90 latency, crops/sec

On the tunneled `axon` platform `jax.block_until_ready` can under-report
(dispatch only); `sync()` forces a tiny device->host readback instead.
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def sync(tree=None):
    """Reliable device sync: tiny readback of one leaf (works on axon)."""
    if tree is None:
        jax.device_put(0.0).block_until_ready()
        return
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.device_get(leaves[0].ravel()[:1] if hasattr(leaves[0], "ravel") else leaves[0]))


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """XLA profiler trace context; view with tensorboard-plugin-profile."""
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-latency and throughput tracker.

    `tick(n_items)` after each synchronized step; keeps the last `window`
    durations for robust percentiles (warmup steps excluded by `skip`).
    """

    def __init__(self, window: int = 200, skip: int = 2):
        self.window = window
        self.skip = skip
        self._seen = 0
        self._items = 0
        self._durations: list[float] = []
        self._last = time.perf_counter()

    def tick(self, n_items: int = 1):
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._seen += 1
        if self._seen <= self.skip:
            return dt
        self._items += n_items
        self._durations.append(dt)
        if len(self._durations) > self.window:
            self._durations.pop(0)
        return dt

    def reset_clock(self):
        self._last = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if not self._durations:
            return 0.0
        return 1.0 / float(np.mean(self._durations))

    def items_per_sec(self, items_per_step: int) -> float:
        return self.steps_per_sec * items_per_step

    def percentile_ms(self, q: float) -> float:
        if not self._durations:
            return 0.0
        return float(np.percentile(self._durations, q) * 1000)

    def summary(self, items_per_step: int | None = None) -> dict:
        out = {
            "steps": self._seen,
            "p50_ms": round(self.percentile_ms(50), 2),
            "p90_ms": round(self.percentile_ms(90), 2),
            "p99_ms": round(self.percentile_ms(99), 2),
            "steps_per_sec": round(self.steps_per_sec, 3),
        }
        if items_per_step:
            out["items_per_sec"] = round(self.items_per_sec(items_per_step), 1)
        return out


def device_memory_stats() -> dict:
    """Per-device HBM usage when the backend exposes it (bytes)."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
        except (AttributeError, NotImplementedError, RuntimeError):
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return stats
