"""Correctness pins for the (rejected) Pallas BN-stats kernel.

The kernel lost its chip benchmark (see stcd_tpu/ops/bn_stats.py STATUS
and BASELINE.md) and is not wired into MPBatchNorm, but it stays in the
tree as the documented experiment — these tests keep it honest: forward
sums match the jnp formulation to f32 round-off, the custom VJP matches
jnp gradients, the supports_pallas gate only admits shapes the tiling
rules can handle, and the custom_partitioning rule reduces a
row-sharded operand with a psum instead of an all-gather (checked
numerically on the 8-device CPU mesh). Kernel runs in interpret mode
off-TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stcd_tpu.ops.bn_stats import bn_stats_pallas, supports_pallas


def _jnp_stats(x):
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, tuple(range(x.ndim - 1))), jnp.sum(
        jnp.square(xf), tuple(range(x.ndim - 1)))


@pytest.mark.parametrize("shape", [
    (8, 16, 16, 256),   # wide channels, no fold
    (8, 16, 16, 64),    # fold=2
    (4, 32, 32, 16),    # fold=8 (narrowest decoder stage)
    (2, 8, 8, 128),     # exactly one lane tile
])
def test_forward_matches_jnp(shape):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    assert supports_pallas(x.shape)
    s1, s2 = bn_stats_pallas(x, interpret=True)
    r1, r2 = _jnp_stats(x)
    n = x.size // x.shape[-1]
    np.testing.assert_allclose(np.asarray(s1), np.asarray(r1),
                               rtol=1e-5, atol=1e-4 * n ** 0.5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(r2),
                               rtol=1e-5, atol=1e-4 * n ** 0.5)


def test_grad_matches_jnp():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 64),
                          jnp.bfloat16)
    g1 = jax.random.normal(jax.random.PRNGKey(2), (64,), jnp.float32)
    g2 = jax.random.normal(jax.random.PRNGKey(3), (64,), jnp.float32)

    def scal_k(x):
        s1, s2 = bn_stats_pallas(x, interpret=True)
        return jnp.sum(s1 * g1) + jnp.sum(s2 * g2)

    def scal_j(x):
        s1, s2 = _jnp_stats(x)
        return jnp.sum(s1 * g1) + jnp.sum(s2 * g2)

    dk = jax.grad(scal_k)(x).astype(jnp.float32)
    dj = jax.grad(scal_j)(x).astype(jnp.float32)
    # both grads are bf16-rounded (x's dtype); agree to one bf16 ulp
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dj),
                               rtol=1e-2, atol=1e-2)


def test_supports_pallas_gate():
    assert supports_pallas((8, 16, 16, 64))
    assert not supports_pallas((1, 1, 1, 64))     # m % (fold*8) != 0
    assert not supports_pallas((0, 16, 16, 64))   # empty
    assert not supports_pallas((3, 5, 7, 48))     # 128 % 48 != 0, m % 8 != 0


def test_partitioned_row_sharded_psum():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(devs[:8]).reshape(8), ("data",))
    x = jax.random.normal(jax.random.PRNGKey(4), (16, 8, 8, 64),
                          jnp.bfloat16)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def f(x):
        return bn_stats_pallas(x, interpret=True)

    with mesh:
        s1, s2 = f(xs)
    r1, r2 = _jnp_stats(x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(r1),
                               rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(r2),
                               rtol=1e-5, atol=1e-2)
