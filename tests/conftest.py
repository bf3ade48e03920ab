"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real multi-device paths without TPU hardware.

Note: the environment's sitecustomize registers a remote TPU ("axon") PJRT
plugin and force-sets jax_platforms via jax.config, so setting the
JAX_PLATFORMS env var is not enough — we must override the config after
import (before any backend is initialized)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_jax_memory_between_modules():
    """Full-size (B-scale) modules each hold hundreds of MB of compiled
    executables and device arrays; running several in one pytest process
    (e.g. `pytest -m slow tests/`) can exhaust process memory. Drop the
    compilation caches and collect after every module."""
    yield
    jax.clear_caches()
    gc.collect()
