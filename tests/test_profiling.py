"""StepTimer / profiling utilities."""
import time

import numpy as np

from metro_pose3d_tpu.utils.profiling import StepTimer, device_memory_stats, sync


class TestStepTimer:
    def test_percentiles_and_throughput(self):
        t = StepTimer(skip=1)
        t.reset_clock()
        for _ in range(6):
            time.sleep(0.01)
            t.tick(32)
        s = t.summary(items_per_step=32)
        assert s["steps"] == 6
        assert 5 <= s["p50_ms"] <= 100
        assert s["items_per_sec"] > 0
        assert s["p99_ms"] >= s["p50_ms"]

    def test_warmup_excluded(self):
        t = StepTimer(skip=2)
        t.reset_clock()
        time.sleep(0.05)  # slow "compile" step
        t.tick()
        time.sleep(0.05)
        t.tick()
        for _ in range(3):
            time.sleep(0.005)
            t.tick()
        assert t.percentile_ms(99) < 40  # warmup spikes not recorded

    def test_window_bounds_memory(self):
        t = StepTimer(window=10, skip=0)
        for _ in range(50):
            t.tick()
        assert len(t._durations) == 10


class TestSync:
    def test_sync_none_and_tree(self):
        import jax.numpy as jnp

        sync()
        sync({"a": jnp.ones(4), "b": jnp.zeros((2, 2))})

    def test_memory_stats_shape(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict)
        for v in stats.values():
            assert "bytes_in_use" in v
