"""Test configuration: force an 8-device virtual CPU mesh.

This environment registers the real TPU (platform 'axon') via
sitecustomize and overrides JAX_PLATFORMS, so env vars are not enough —
the platform must be set programmatically before any backend is touched.
8 virtual CPU devices are the idiomatic JAX substitute for multi-device
testing without a cluster (SURVEY.md §4).

Set STCD_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os

import numpy as np
import pytest

import jax

if os.environ.get("STCD_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: repeat runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/stcd_jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(1337)
