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


# The XLA:CPU JIT leaks virtual-memory MAPPINGS across compiles (~60k
# after ~150 tests on the 8-device mesh; observed via /proc/<pid>/maps),
# and crossing the kernel's default vm.max_map_count = 65530 makes the
# NEXT backend_compile segfault/abort — the "crashed test passes in
# isolation" mystery this suite (and the r3 review) kept hitting. Raise
# the limit best-effort (root in this image); harmless if not permitted.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1048576:
            _f.seek(0)
            _f.write("1048576")
except OSError:
    pass

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: warm reruns skip nearly every XLA:CPU
# compile — faster, and it sidesteps an upstream compiler crash (abort/
# segfault in backend_compile_and_load) that a long-lived pytest process
# hits after ~130 tests' accumulated compilations (the big sharded
# compiles in test_parallel are the usual victims; each passes cleanly
# in isolation — also observed by the r3 review)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


_MESH_HEAVY = ("test_parallel", "test_serving_tp", "test_sequence_parallel",
               "test_pipeline")


def pytest_collection_modifyitems(session, config, items):
    """Run the big 8-device sharded compiles FIRST, while the process is
    fresh: an aged XLA:CPU process (after ~130 tests' accumulated
    compilations) aborts/segfaults inside backend_compile or the cache
    serializer for exactly these executables (upstream issue — every one
    of them passes cleanly in isolation; the r3 review hit it too). With
    the persistent compile cache (above) warm, order barely matters; on a
    cold cache this keeps the heavy compiles inside the safe window."""
    front = [it for it in items
             if any(m in it.nodeid for m in _MESH_HEAVY)]
    rest = [it for it in items
            if not any(m in it.nodeid for m in _MESH_HEAVY)]
    items[:] = front + rest
