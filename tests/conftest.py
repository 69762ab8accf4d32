"""Test harness: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware, per the multi-chip dry-run contract.

Note: this image's sitecustomize registers the axon TPU backend and forces
JAX_PLATFORMS=axon for every interpreter, so env vars alone don't work —
we must override via jax.config after import (before first device use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite's wall-clock is dominated by XLA
# compiles of the same fixed-shape programs on every run
_cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
