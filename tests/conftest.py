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

# Exact f32 matmuls/convs for golden parity: on AVX512-BF16 hosts,
# XLA:CPU's default precision runs f32 convs as bf16 passes (~3e-3 abs
# error vs torch — found by the training-dynamics golden test). The CPU
# suite exists to check numerics, so pin the highest precision.
jax.config.update("jax_default_matmul_precision", "highest")

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
