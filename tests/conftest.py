"""Test config: force an 8-device virtual CPU platform.

The image's sitecustomize pre-imports jax with JAX_PLATFORMS=axon (the real
TPU tunnel), so plain env vars in this file would be too late for platform
selection — but `jax.config.update` still works before any backend is
initialized. All tests run on 8 virtual CPU devices; multi-chip sharding
tests use them as the mesh (the driver's dryrun_multichip does the same).
"""

import os

# XLA_FLAGS is read at (CPU) backend initialization, which hasn't happened yet.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
