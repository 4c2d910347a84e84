"""U-Net decoder (NHWC), parity with
segmentation_models_pytorch/decoders/unet/decoder.py:8-123.

DecoderBlock: nearest 2x upsample -> concat skip -> (attention1) ->
ConvBNReLU x2 -> (attention2). The upsample+concat is pure data movement;
``upsample_nearest`` is written so XLA fuses it into the following conv's
input (no extra HBM roundtrip) — the TPU-native replacement for a custom
fused kernel.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.modules import AttentionGate, ConvBNReLU, upsample_nearest


class DecoderBlock(nn.Module):
    """ref decoders/unet/decoder.py:8-43."""

    out_channels: int
    use_batchnorm: bool = True
    attention_type: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        x = upsample_nearest(x, 2)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
            x = AttentionGate(kind=self.attention_type, dtype=self.dtype, name="attention1")(x)
        x = ConvBNReLU(self.out_channels, 3, padding=1,
                       use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                       name="conv1")(x, train)
        x = ConvBNReLU(self.out_channels, 3, padding=1,
                       use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                       name="conv2")(x, train)
        x = AttentionGate(kind=self.attention_type, dtype=self.dtype, name="attention2")(x)
        return x


class CenterBlock(nn.Module):
    """ref decoders/unet/decoder.py:46-62 (used when encoder is VGG)."""

    out_channels: int
    use_batchnorm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvBNReLU(self.out_channels, 3, padding=1,
                       use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                       name="conv1")(x, train)
        x = ConvBNReLU(self.out_channels, 3, padding=1,
                       use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                       name="conv2")(x, train)
        return x


class UnetDecoder(nn.Module):
    """ref decoders/unet/decoder.py:65-123.

    ``__call__(features, train)``: features are the encoder pyramid
    [f0..f5]; f0 (input-resolution) is dropped, the rest reversed; the head
    feature passes through an optional center block, then n_blocks
    DecoderBlocks consume the remaining skips (deepest first), the last
    block(s) having no skip.
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    n_blocks: int = 5
    use_batchnorm: bool = True
    attention_type: Optional[str] = None
    center: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features: List[jax.Array], train: bool = False) -> jax.Array:
        if self.n_blocks != len(self.decoder_channels):
            raise ValueError(
                "Model depth is {}, but you provide `decoder_channels` for {} blocks.".format(
                    self.n_blocks, len(self.decoder_channels)
                )
            )
        feats = features[1:][::-1]
        head, skips = feats[0], feats[1:]
        x = head
        if self.center:
            x = CenterBlock(head.shape[-1], use_batchnorm=self.use_batchnorm,
                            dtype=self.dtype, name="center")(x, train)
        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(out_ch, use_batchnorm=self.use_batchnorm,
                             attention_type=self.attention_type, dtype=self.dtype,
                             name=f"block{i}")(x, skip, train)
        return x
