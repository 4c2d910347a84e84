"""DeepLabV3 / DeepLabV3+ decoders (ref decoders/deeplabv3/decoder.py)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.layers.modules import upsample_bilinear


def _bn(train, dtype, name):
    return MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class SeparableConvBNReLU(nn.Module):
    features: int
    dilation: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False):
        c = x.shape[-1]
        d = self.dilation
        x = nn.Conv(c, (3, 3), padding=[(d, d)] * 2, kernel_dilation=(d, d),
                    feature_group_count=c, use_bias=False, dtype=self.dtype,
                    name="dw")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw")(x)
        x = _bn(train, self.dtype, "bn")(x)
        return nn.relu(x)


class ASPP(nn.Module):
    out_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    separable: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False):
        res = []
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="b0_conv")(x)
        res.append(nn.relu(_bn(train, self.dtype, "b0_bn")(h)))
        for i, rate in enumerate(self.atrous_rates):
            if self.separable:
                res.append(SeparableConvBNReLU(self.out_channels, rate,
                                               dtype=self.dtype,
                                               name=f"b{i + 1}")(x, train))
            else:
                h = nn.Conv(self.out_channels, (3, 3), padding=[(rate, rate)] * 2,
                            kernel_dilation=(rate, rate), use_bias=False,
                            dtype=self.dtype, name=f"b{i + 1}_conv")(x)
                res.append(nn.relu(_bn(train, self.dtype, f"b{i + 1}_bn")(h)))
        # image pooling branch
        p = jnp.mean(x, axis=(1, 2), keepdims=True)
        p = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pool_conv")(p)
        p = nn.relu(_bn(train, self.dtype, "pool_bn")(p))
        p = jnp.broadcast_to(p, (x.shape[0], x.shape[1], x.shape[2],
                                 self.out_channels))
        res.append(p)
        h = jnp.concatenate(res, axis=-1)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(h)
        h = nn.relu(_bn(train, self.dtype, "project_bn")(h))
        return nn.Dropout(0.5, deterministic=not train)(h)


class DeepLabV3Decoder(nn.Module):
    out_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features, train=False):
        x = ASPP(self.out_channels, self.atrous_rates, dtype=self.dtype,
                 name="aspp")(features[-1], train)
        x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = _bn(train, self.dtype, "bn")(x)
        return nn.relu(x)


class DeepLabV3PlusDecoder(nn.Module):
    out_channels: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    output_stride: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features, train=False):
        x = ASPP(self.out_channels, self.atrous_rates, separable=True,
                 dtype=self.dtype, name="aspp")(features[-1], train)
        x = SeparableConvBNReLU(self.out_channels, dtype=self.dtype,
                                name="aspp_sep")(x, train)
        scale = 2 if self.output_stride == 8 else 4
        x = upsample_bilinear(x, scale, align_corners=True)
        hi = nn.Conv(48, (1, 1), use_bias=False, dtype=self.dtype,
                     name="block1_conv")(features[-4])
        hi = nn.relu(_bn(train, self.dtype, "block1_bn")(hi))
        x = jnp.concatenate([x, hi], axis=-1)
        return SeparableConvBNReLU(self.out_channels, dtype=self.dtype,
                                   name="block2")(x, train)
