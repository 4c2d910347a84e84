"""ICNR-initialized sub-pixel (PixelShuffle) upsampling (NHWC).

Parity: models/pixel_shuffel_up.py — icnr :6-17, PixelShuffle :20-45,
PS_UP :48-54 (conv to scale^2*out channels, ICNR init, shuffle, ReLU).
Not on the reference's live path but part of its API surface.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """NHWC PixelShuffle: (N,H,W,C*s^2) -> (N,H*s,W*s,C) matching torch's
    channel ordering (C groups of s*s)."""
    n, h, w, c = x.shape
    co = c // (scale * scale)
    x = x.reshape(n, h, w, co, scale, scale)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * scale, w * scale, co)


def icnr_init(key, shape, dtype=jnp.float32, scale: int = 2,
              base_init=nn.initializers.kaiming_normal()):
    """ICNR (ref :6-17): initialize the (H,W,I,O*s^2) kernel so that the
    shuffled output equals nearest-neighbor upsampling of a conv."""
    h, w, i, o = shape
    sub = base_init(key, (h, w, i, o // (scale * scale)), dtype)
    return jnp.repeat(sub, scale * scale, axis=-1)


class PSUp(nn.Module):
    """PS_UP (ref :48-54): conv -> PixelShuffle(scale) -> ReLU."""

    out_channels: int
    scale: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c_out = self.out_channels * self.scale ** 2
        x = nn.Conv(c_out, (3, 3), padding=[(1, 1)] * 2,
                    kernel_init=lambda k, s, d=jnp.float32: icnr_init(
                        k, s, d, self.scale),
                    dtype=self.dtype, name="conv")(x)
        return nn.relu(pixel_shuffle(x, self.scale))
