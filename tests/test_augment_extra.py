"""Tests for the off-live-path reference augmentations rebuilt as
jittable ops: cutout (ref data/dataset.py:24-57) and the albumentations
get_training_augmentation pipeline (ref data/dataset.py:78-117), plus
the save_to_mat debug dump (ref models/help_funcs.py:189-215)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stcd_tpu.data.augment import (
    cutout, gauss_noise, get_training_augmentation, perspective,
    random_brightness_contrast, random_gamma, shift_scale,
)


@pytest.fixture(scope="module")
def img():
    return jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))


@pytest.fixture(scope="module")
def mask():
    return (jax.random.uniform(jax.random.PRNGKey(1), (32, 32, 1)) > 0.5
            ).astype(jnp.float32)


def test_cutout_erases_same_box_in_both_images(img, mask):
    a, b, m = jax.jit(lambda k: cutout(k, img, img, mask, p=1.0))(
        jax.random.PRNGKey(7))
    changed = np.asarray(jnp.any(a != img, axis=-1))
    assert changed.any(), "p=1 cutout must erase something"
    # both temporal images get the SAME random fill (ref :48-49)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the label is stamped with mask_value exactly inside the box (ref :50)
    m = np.asarray(m)[..., 0]
    assert (m[changed] == 1.0).all()
    # box is a contiguous rectangle: row/col extents are filled solid
    rows = np.where(changed.any(axis=1))[0]
    cols = np.where(changed.any(axis=0))[0]
    assert changed[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1].all()


def test_cutout_p0_is_identity(img, mask):
    a, b, m = cutout(jax.random.PRNGKey(3), img, img, mask, p=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(mask))


def test_shift_scale_identity_at_zero_limits(img, mask):
    i2, m2 = shift_scale(jax.random.PRNGKey(0), img, mask,
                         shift_limit=0.0, scale_limit=0.0)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(img), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(mask))


def test_perspective_identity_at_zero_scale(img, mask):
    i2, m2 = perspective(jax.random.PRNGKey(0), img, mask, scale=0.0)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(img), atol=1e-5)


def test_mask_stays_binary_under_pipeline(img, mask):
    aug = get_training_augmentation()
    ai, am = jax.jit(aug)(jax.random.PRNGKey(2), img, mask)
    assert ai.shape == img.shape and am.shape == mask.shape
    assert bool(jnp.isfinite(ai).all())
    vals = set(np.unique(np.asarray(am)).tolist())
    assert vals <= {0.0, 1.0}, "nearest-neighbor label warp must stay binary"
    assert float(ai.min()) >= 0.0 and float(ai.max()) <= 1.0


def test_photometric_ops_stay_in_range(img):
    for fn in (lambda k, x: gauss_noise(k, x),
               lambda k, x: random_brightness_contrast(k, x),
               lambda k, x: random_gamma(k, x)):
        out = fn(jax.random.PRNGKey(5), img)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_save_to_mat_roundtrip(tmp_path):
    from scipy.io import loadmat
    from stcd_tpu.utils.debug import save_to_mat

    x1 = jnp.ones((1, 8, 8, 3))
    fx = [jnp.full((1, 4, 4, 2), i, jnp.float32) for i in range(3)]
    cp = [jnp.zeros((1, 8, 8, 1)), jnp.ones((1, 8, 8, 1))]
    path = save_to_mat(x1, x1 * 2, fx, fx, cp, "sample", str(tmp_path))
    m = loadmat(path)
    assert m["x1"].shape == (1, 8, 8, 3)
    np.testing.assert_array_equal(m["x2"], 2 * np.ones((1, 8, 8, 3)))
    np.testing.assert_array_equal(m["fx1_2"], np.full((1, 4, 4, 2), 2.0))
    np.testing.assert_array_equal(m["final_pred"], np.ones((1, 8, 8, 1)))


def test_train_augment_per_sample_independence():
    """The reference augments in __getitem__, i.e. independently per sample
    (data/dataset.py:404-411). A batched train_augment must draw per-sample
    coins/factors, not one shared draw for the whole batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stcd_tpu.data.augment import normalize, train_augment

    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(16, 8, 8, 3)).astype(np.float32))
    y = train_augment(jax.random.PRNGKey(0), x)
    base = np.asarray(normalize(x))
    deltas = np.abs(np.asarray(y) - base).mean(axis=(1, 2, 3))
    # with one shared draw all per-sample deltas are equal (or all zero);
    # per-sample draws give a mixed population incl. untouched samples
    assert len(set(np.round(deltas, 5))) > 3
    # batched result == single-image path with the matching per-sample key
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    y0 = train_augment(keys[3], x[3])
    np.testing.assert_allclose(np.asarray(y[3]), np.asarray(y0), atol=1e-6)
