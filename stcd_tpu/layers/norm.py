"""Mixed-precision BatchNorm.

bf16 BatchNorm statistics diverge (variance precision collapses) and pure
fp32 BN costs ~20% step time (fp32 tensor round-trips around every BN).
This drop-in computes the REDUCTIONS in fp32 (XLA fuses the upcast into
the reduce — no fp32 materialization) and applies the normalization as a
bf16 elementwise `x * w + b` with per-channel fp32-folded coefficients.

Parameter/collection layout matches flax.linen.BatchNorm exactly
({params: scale, bias}, {batch_stats: mean, var}), so converted torch
weights and existing checkpoints load unchanged.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None  # accepted for API parity; apply uses x.dtype

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)

        if self.use_running_average:
            mean = ra_mean.value.astype(jnp.float32)
            var = ra_var.value.astype(jnp.float32)
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            # E[x^2] - E[x]^2 in fp32: one fused pass over the bf16 input
            mean2 = jnp.mean(jnp.square(xf), axes)
            # Inside a manual spatial shard_map body each shard sees only
            # its H-strip; the reference's BN statistics span the whole
            # image (single-device whole-batch BN, SURVEY.md §5) — pmean
            # the moments over 'space' (equal-sized strips). The GSPMD
            # axes ('data') are all-reduced automatically by XLA.
            from stcd_tpu.parallel.spatial import active_space_axis
            space_axis = active_space_axis()
            if space_axis is not None:
                mean = jax.lax.pmean(mean, space_axis)
                mean2 = jax.lax.pmean(mean2, space_axis)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)

        w = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * w
        return x * w.astype(x.dtype) + b.astype(x.dtype)
