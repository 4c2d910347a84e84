"""stcd_tpu.layers.conv.Conv — pointwise-as-dot lowering vs nn.Conv.

The class must be a drop-in for flax.linen.Conv: identical parameter
tree/init, and numerically equivalent outputs/gradients (the dot path
only changes reduction scheduling, not the contraction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from stcd_tpu.layers.conv import Conv, pointwise_dot_conv


def _pair(kernel_size, **kw):
    return (
        nn.Conv(8, kernel_size, **kw),
        Conv(8, kernel_size, **kw),
    )


@pytest.mark.parametrize(
    "kernel_size,kw",
    [
        ((1, 1), {}),
        ((1, 1), {"use_bias": False}),
        ((1, 1), {"strides": (2, 2)}),           # falls back: strided
        ((3, 3), {}),                             # falls back: spatial
        ((1, 1), {"feature_group_count": 2}),     # falls back: grouped
        ((1, 1), {"padding": [(1, 1), (1, 1)]}),  # falls back: real pad
    ],
)
def test_conv_matches_nn_conv(kernel_size, kw):
    ref, ours = _pair(kernel_size, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 4), jnp.float32)
    vref = ref.init(jax.random.PRNGKey(1), x)
    vours = ours.init(jax.random.PRNGKey(1), x)
    # identical parameter tree and values
    chex_tree = jax.tree_util.tree_map(np.testing.assert_array_equal, vref, vours)
    del chex_tree
    yref = ref.apply(vref, x)
    yours = ours.apply(vours, x)
    np.testing.assert_allclose(np.asarray(yref), np.asarray(yours),
                               rtol=1e-6, atol=1e-6)


def test_gradients_match():
    ref, ours = _pair((1, 1))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 4), jnp.float32)
    v = ref.init(jax.random.PRNGKey(1), x)

    def loss(module, variables, x):
        y = module.apply(variables, x)
        return jnp.sum(y * y)

    gref = jax.grad(lambda v, x: loss(ref, v, x), argnums=(0, 1))(v, x)
    gours = jax.grad(lambda v, x: loss(ours, v, x), argnums=(0, 1))(v, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        gref, gours)


def test_env_toggle_disables_dot(monkeypatch):
    monkeypatch.setenv("STCD_DOT_1X1", "0")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 4), jnp.float32)
    m = Conv(8, (1, 1))
    v = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(v, x)
    monkeypatch.delenv("STCD_DOT_1X1")
    y2 = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                               rtol=1e-6, atol=1e-6)


def test_pointwise_dot_conv_is_exactly_conv_when_gated():
    """The raw helper: gated-off cases call lax.conv_general_dilated with
    the caller's arguments untouched (bitwise-identical results)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 6, 4), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 8), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    a = pointwise_dot_conv(x, k, (1, 1), "SAME", dimension_numbers=dn)
    b = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                     dimension_numbers=dn)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
