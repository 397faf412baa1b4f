"""Test harness: run everything on an 8-device *virtual CPU* mesh.

This is the standard JAX fake backend for multi-chip tests (SURVEY.md §5.4):
the same shard_map/pjit code paths that run over ICI on a real pod slice run
here over 8 host devices. Must execute before jax is first imported.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")
