"""Pins the fused Pallas augmentation kernel to the pure-jnp reference path.

Both backends consume the SAME sampled parameters
(augment.sample_augment_params), so agreement here means the TPU fast path
is numerically interchangeable with the torchvision-parity jnp pipeline
(ref data/dataset.py:404-411). Kernel runs in interpret mode off-TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stcd_tpu.data import augment
from stcd_tpu.ops.augment_kernel import apply_augment_batch


def _reference_batch(imgs, params):
    return jax.vmap(augment.apply_augment_reference)(
        augment.to_float01(imgs), params)


def _params(key, n, jitter_p=0.5, jitter_apply=None):
    keys = jax.random.split(key, n)
    if jitter_apply is None:
        return jax.vmap(
            lambda k: augment.sample_augment_params(k, jitter_p))(keys)
    return jax.vmap(
        lambda k, ja: augment.sample_augment_params(k, jitter_p, ja)
    )(keys, jitter_apply)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kernel_matches_reference_uint8(seed):
    key = jax.random.PRNGKey(seed)
    k_img, k_par = jax.random.split(key)
    imgs = jax.random.randint(k_img, (8, 64, 64, 3), 0, 256, jnp.uint8)
    params = _params(k_par, 8)
    ref = _reference_batch(imgs, params)
    out = apply_augment_batch(imgs, params, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_kernel_all_gates_forced_on():
    """Every stage active on every sample (jitter+gray+blur), so the whole
    chain incl. the HSV round-trip and the blur band matmuls is exercised
    regardless of coin luck."""
    key = jax.random.PRNGKey(7)
    k_img, k_par = jax.random.split(key)
    imgs = (jax.random.uniform(k_img, (4, 48, 80, 3)) * 0.98)
    params = _params(k_par, 4)
    on = jnp.ones((4,), bool)
    params = {**params, "jitter_apply": on, "gray_apply": on,
              "blur_apply": on}
    ref = _reference_batch(imgs, params)
    out = apply_augment_batch(imgs, params, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=0)


def test_kernel_all_gates_off_is_normalize_only():
    imgs = jax.random.randint(jax.random.PRNGKey(3), (2, 32, 32, 3), 0, 256,
                              jnp.uint8)
    params = _params(jax.random.PRNGKey(4), 2)
    off = jnp.zeros((2,), bool)
    params = {**params, "jitter_apply": off, "gray_apply": off,
              "blur_apply": off}
    out = apply_augment_batch(imgs, params, interpret=True)
    expect = augment.normalize(augment.to_float01(imgs))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=2e-6, rtol=0)


def test_dispatch_pallas_on_matches_jnp_path():
    """set_pallas_augment('on') must keep train_augment_pair numerically on
    the jnp path (identical parameter draws, float-tolerance application)."""
    key = jax.random.PRNGKey(11)
    a = jax.random.randint(jax.random.PRNGKey(12), (6, 32, 32, 3), 0, 256,
                           jnp.uint8)
    b = jax.random.randint(jax.random.PRNGKey(13), (6, 32, 32, 3), 0, 256,
                           jnp.uint8)
    ref_a, ref_b = augment.train_augment_pair(key, a, b)
    augment.set_pallas_augment("on")
    try:
        out_a, out_b = augment.train_augment_pair(key, a, b)
    finally:
        augment.set_pallas_augment("auto")
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref_b),
                               atol=2e-5, rtol=0)


def test_train_augment_single_unchanged_by_refactor():
    """The sample+apply split must reproduce the historical inline pipeline
    exactly: spot-check against a hand-inlined version of the old code."""
    key = jax.random.PRNGKey(21)
    img = jax.random.uniform(jax.random.PRNGKey(22), (16, 16, 3))

    k1, k1p, k2, k3 = jax.random.split(key, 4)
    jittered = augment.color_jitter(k1, img)
    gate = jax.random.uniform(k1p) < 0.5
    x = jnp.where(gate, jittered, img)
    x = augment.random_grayscale(k2, x)
    x = augment.gaussian_blur(k3, x)
    expect = augment.normalize(x)

    got = augment._train_augment_single(key, img, 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=0)
