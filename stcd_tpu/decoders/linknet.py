"""LinkNet decoder (ref decoders/linknet/decoder.py)."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.layers.modules import ConvBNReLU


class LinknetDecoderBlock(nn.Module):
    out_channels: int
    use_batchnorm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip=None, train=False):
        c4 = x.shape[-1] // 4
        x = ConvBNReLU(c4, 1, use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                       name="conv1")(x, train)
        # TransposeX2: ConvTranspose(k4, s2, p1) + BN + ReLU
        x = nn.ConvTranspose(c4, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                             transpose_kernel=True, dtype=self.dtype,
                             name="transpose")(x)
        if self.use_batchnorm:
            x = MPBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="transpose_bn")(x)
        x = nn.relu(x)
        x = ConvBNReLU(self.out_channels, 1, use_batchnorm=self.use_batchnorm,
                       dtype=self.dtype, name="conv2")(x, train)
        if skip is not None:
            x = x + skip
        return x


class LinknetDecoder(nn.Module):
    prefinal_channels: int = 32
    n_blocks: int = 5
    use_batchnorm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features, train=False):
        feats = features[1:][::-1]
        channels = [f.shape[-1] for f in feats] + [self.prefinal_channels]
        x = feats[0]
        skips = feats[1:]
        for i in range(self.n_blocks):
            skip = skips[i] if i < len(skips) else None
            x = LinknetDecoderBlock(channels[i + 1], self.use_batchnorm,
                                    dtype=self.dtype, name=f"block{i}")(x, skip, train)
        return x
