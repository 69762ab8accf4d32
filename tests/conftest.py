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
# compiles of the same fixed-shape programs on every run.  Machine-keyed:
# XLA:CPU AOT executables embed the compile host's CPU features, and
# loading one on a different microarch risks SIGILL.
from orbslam2_dualcam_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    suffix="-tests")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
