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


def _dropout_reference(q, k, v, scale, rate, seed):
    """softmax attention with the stateless hash mask applied exactly as
    the kernel does (inverted dropout on the normalized weights)."""
    from stcd_tpu.ops.attention import dropout_keep_mask
    b, h, n, d = q.shape
    m = k.shape[2]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    bh = jnp.arange(b * h, dtype=jnp.int32).reshape(b, h, 1, 1)
    rows = jnp.arange(n, dtype=jnp.int32).reshape(1, 1, n, 1)
    cols = jnp.arange(m, dtype=jnp.int32).reshape(1, 1, 1, m)
    keep = dropout_keep_mask(jnp.uint32(seed), bh, rows, cols, rate)
    p = jnp.where(keep, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


@pytest.mark.parametrize("block_n", [64, 32])
def test_attention_dropout_kernel_matches_masked_einsum(block_n):
    """VERDICT r2 item 4: in-kernel attention dropout. The fused kernel
    (forward AND backward, via interpret mode), the einsum fallback, and
    a hand-built masked-einsum reference must all agree bit-for-bit on
    WHICH weights are dropped (the stateless hash mask) — block_n=32
    checks the mask's global row indexing across multiple Q tiles, and
    the ragged n=96/m=10 shapes check it under padding."""
    rate, seed = 0.3, 12345
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 96, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 10, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 10, 32))
    scale = 32 ** -0.5

    want = np.asarray(_dropout_reference(q, k, v, scale, rate, seed))
    got = np.asarray(cross_attention_interpret(
        q, k, v, scale, block_n=block_n, dropout_rate=rate,
        dropout_seed=jnp.uint32(seed)))
    np.testing.assert_allclose(got, want, atol=2e-5)
    # and it actually drops: some outputs must differ from no-dropout
    clean = np.asarray(cross_attention_interpret(q, k, v, scale,
                                                 block_n=block_n))
    assert np.abs(got - clean).max() > 1e-3

    # einsum fallback path: bit-identical mask to the kernel
    fb = np.asarray(cross_attention(q, k, v, scale, use_pallas=False,
                                    dropout_rate=rate,
                                    dropout_seed=jnp.uint32(seed)))
    np.testing.assert_allclose(fb, want, atol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(cross_attention_interpret(
            q, k, v, scale, block_n=block_n, dropout_rate=rate,
            dropout_seed=jnp.uint32(seed)) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_dropout_reference(q, k, v, scale, rate, seed) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_attention_dropout_mask_statistics():
    """Keep fraction ~= 1-rate, masks differ across seeds/heads, and the
    kept weights are scaled by 1/(1-rate)."""
    from stcd_tpu.ops.attention import dropout_keep_mask
    rows = jnp.arange(256, dtype=jnp.int32).reshape(256, 1)
    cols = jnp.arange(256, dtype=jnp.int32).reshape(1, 256)
    for rate in (0.1, 0.5):
        keeps = []
        for seed in (1, 2):
            for bh in (0, 3):
                m = np.asarray(dropout_keep_mask(
                    jnp.uint32(seed), jnp.int32(bh), rows, cols, rate))
                keeps.append(m)
                assert abs(m.mean() - (1 - rate)) < 0.02, m.mean()
        assert not np.array_equal(keeps[0], keeps[1])  # bh varies
        assert not np.array_equal(keeps[0], keeps[2])  # seed varies
