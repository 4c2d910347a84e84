"""Pallas kernel tests (interpret mode on CPU) vs einsum references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stcd_tpu.ops.attention import cross_attention, cross_attention_interpret


def _reference(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


@pytest.mark.parametrize("n,m,d", [(128, 16, 32), (96, 10, 64)])
def test_flash_cross_attention_matches_einsum(n, m, d):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 2, n, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 2, m, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 2, m, d), jnp.float32)
    scale = d ** -0.5
    expected = np.asarray(_reference(q, k, v, scale))
    got = np.asarray(cross_attention_interpret(q, k, v, scale))
    np.testing.assert_allclose(got, expected, atol=2e-5)


@pytest.mark.parametrize("block_n", [64, 32])
def test_flash_cross_attention_grad_matches(block_n):
    """block_n=32 forces multiple Q tiles so the backward kernel's
    in-VMEM dk/dv accumulation across the sequential grid is exercised;
    m=8 < 128 exercises the KV-padding mask in both directions."""
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 64, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 8, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 8, 32))

    def loss_flash(q, k, v):
        return jnp.sum(cross_attention_interpret(q, k, v,
                                                 block_n=block_n) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, 32 ** -0.5) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_flash_cross_attention_grad_ragged_n():
    """N not a multiple of the tile: padded Q rows (zero g) must not
    leak into dk/dv and the dq padding must be sliced off."""
    q = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 96, 32))
    k = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 10, 32))
    v = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 10, 32))

    def loss_flash(q, k, v):
        return jnp.sum(cross_attention_interpret(q, k, v, block_n=64) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference(q, k, v, 32 ** -0.5) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_cross_attention_einsum_fallback():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 32, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 4, 16))
    got = cross_attention(q, k, v, use_pallas=False)
    expected = _reference(q, k, v, 16 ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)
