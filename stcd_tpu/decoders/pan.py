"""PAN decoder (ref decoders/pan/decoder.py): FPA bottleneck + GAU ups."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.layers.modules import max_pool, resize_bilinear


class ConvBnRelu(nn.Module):
    features: int
    kernel_size: int = 1
    padding: int = 0
    add_relu: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False):
        p = self.padding
        x = nn.Conv(self.features, (self.kernel_size,) * 2, padding=[(p, p)] * 2,
                    dtype=self.dtype, name="conv")(x)
        x = MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        return nn.relu(x) if self.add_relu else x


class FPABlock(nn.Module):
    """Feature Pyramid Attention (ref pan/decoder.py:42-110)."""

    out_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False):
        h, w = x.shape[1:3]
        up = lambda t, size: resize_bilinear(t, size, align_corners=True)
        b1 = jnp.mean(x, axis=(1, 2), keepdims=True)
        b1 = ConvBnRelu(self.out_channels, dtype=self.dtype, name="branch1")(b1, train)
        b1 = jnp.broadcast_to(b1, (x.shape[0], h, w, self.out_channels))
        mid = ConvBnRelu(self.out_channels, dtype=self.dtype, name="mid")(x, train)
        x1 = ConvBnRelu(1, 7, 3, dtype=self.dtype, name="down1")(max_pool(x), train)
        x2 = ConvBnRelu(1, 5, 2, dtype=self.dtype, name="down2")(max_pool(x1), train)
        x3 = ConvBnRelu(1, 3, 1, dtype=self.dtype, name="down3a")(max_pool(x2), train)
        x3 = ConvBnRelu(1, 3, 1, dtype=self.dtype, name="down3b")(x3, train)
        x3 = up(x3, (h // 4, w // 4))
        x2 = ConvBnRelu(1, 5, 2, dtype=self.dtype, name="conv2")(x2, train)
        z = up(x2 + x3, (h // 2, w // 2))
        x1 = ConvBnRelu(1, 7, 3, dtype=self.dtype, name="conv1")(x1, train)
        z = up(z + x1, (h, w))
        return z * mid + b1


class GAUBlock(nn.Module):
    """Global Attention Upsample (ref pan/decoder.py:113-137)."""

    out_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, low, high, train=False):
        h, w = low.shape[1:3]
        y_up = resize_bilinear(high, (h, w), align_corners=True)
        x = ConvBnRelu(self.out_channels, 3, 1, dtype=self.dtype,
                       name="conv2")(low, train)
        g = jnp.mean(high, axis=(1, 2), keepdims=True)
        g = ConvBnRelu(self.out_channels, add_relu=False, dtype=self.dtype,
                       name="conv1")(g, train)
        g = jax.nn.sigmoid(g)
        return y_up + x * g


class PANDecoder(nn.Module):
    decoder_channels: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features, train=False):
        x5 = FPABlock(self.decoder_channels, dtype=self.dtype,
                      name="fpa")(features[-1], train)
        x4 = GAUBlock(self.decoder_channels, dtype=self.dtype,
                      name="gau3")(features[-2], x5, train)
        x3 = GAUBlock(self.decoder_channels, dtype=self.dtype,
                      name="gau2")(features[-3], x4, train)
        x2 = GAUBlock(self.decoder_channels, dtype=self.dtype,
                      name="gau1")(features[-4], x3, train)
        return x2
