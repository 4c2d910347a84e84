"""Squeeze-and-Excitation layers (NHWC).

Parity with segmentation_models_pytorch/decoders/unet/se.py:20-126
(ChannelSELayer / SpatialSELayer / ChannelSpatialSELayer; note the
reference uses Linear layers and reduction_ratio=2 for the channel SE,
unlike the SCSE in base/modules.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class ChannelSELayer(nn.Module):
    """SE block, Hu et al. (ref se.py:20-57): GAP -> fc1 -> ReLU -> fc2 -> sigmoid."""

    reduction_ratio: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        squeeze = jnp.mean(x, axis=(1, 2))  # (N, C)
        h = nn.Dense(c // self.reduction_ratio, dtype=self.dtype, name="fc1")(squeeze)
        h = nn.relu(h)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        gate = jax.nn.sigmoid(h)
        return x * gate[:, None, None, :]


class SpatialSELayer(nn.Module):
    """Spatial SE (ref se.py:60-100): 1x1 conv to 1 channel -> sigmoid gate."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gate = jax.nn.sigmoid(nn.Conv(1, (1, 1), dtype=self.dtype, name="conv")(x))
        return x * gate


class ChannelSpatialSELayer(nn.Module):
    """cSE + sSE sum (ref se.py:103-126)."""

    reduction_ratio: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return (
            ChannelSELayer(self.reduction_ratio, dtype=self.dtype, name="cSE")(x)
            + SpatialSELayer(dtype=self.dtype, name="sSE")(x)
        )
