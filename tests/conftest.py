"""Test environment: force an 8-device CPU mesh before JAX initializes.

Distributed tests run on a virtual 8-device CPU topology
(xla_force_host_platform_device_count), substituting for a TPU pod slice
(SURVEY.md §4c). Must run before any jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_pair():
    from mystereomatching_tpu.data import make_synthetic_pair

    return make_synthetic_pair(h=64, w=96, max_disp=11, seed=3, noise_sigma=0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
