"""Test harness: run everything on an 8-device *virtual CPU* mesh.

This is the standard JAX fake backend for multi-chip tests (SURVEY.md §5.4):
the same shard_map/pjit code paths that run over ICI on a real pod slice run
here over 8 host devices.

Note: this image's sitecustomize registers the experimental `axon` TPU
platform and overrides JAX_PLATFORMS at interpreter start, so the env var is
NOT enough — we must force the platform through jax.config before any backend
initializes (XLA_FLAGS is still read at CPU-client creation, so setting it
here works as long as no test touched a device at collection time).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
