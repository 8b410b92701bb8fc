"""Test environment: force an 8-device CPU mesh before JAX initializes.

Distributed tests run on a virtual 8-device CPU topology
(xla_force_host_platform_device_count), substituting for a TPU pod slice
(SURVEY.md §4c). Must run before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

# The axon TPU-tunnel sitecustomize registers its backend programmatically,
# overriding JAX_PLATFORMS — force the CPU backend + 8 devices explicitly.
# It also imports jax at interpreter startup, which freezes env-derived
# config (the cache env vars above never land) — set them via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def small_pair():
    from mystereomatching_tpu.data import make_synthetic_pair

    return make_synthetic_pair(h=64, w=96, max_disp=11, seed=3, noise_sigma=0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
