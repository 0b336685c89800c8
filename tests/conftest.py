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
# persistent compilation cache: warm reruns skip nearly every XLA:CPU
# compile — faster, and it sidesteps an upstream compiler crash (abort/
# segfault in backend_compile_and_load) that a long-lived pytest process
# hits after ~130 tests' accumulated compilations (the big sharded
# compiles in test_parallel are the usual victims; each passes cleanly
# in isolation — also observed by the r3 review)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
