"""U-Net decoder (NHWC), parity with
segmentation_models_pytorch/decoders/unet/decoder.py:8-123.

DecoderBlock: nearest 2x upsample -> concat skip -> (attention1) ->
ConvBNReLU x2 -> (attention2).

TPU-first fusion (SURVEY.md §3.4's decoder hot path): XLA cannot fuse
data movement into a convolution's input, so the naive form materializes
TWO full-resolution HBM intermediates per block (the 4x nearest-upsample
and the concat). ``DecoderBlock`` therefore rewrites the first conv
exactly:

    conv3x3(cat(up2x(x), skip)) == dconv(x, K') + conv3x3(skip, K_b)

where the kernel is split along its input axis into K_a (the up(x)
channels) and K_b (the skip channels), and K' is K_a composed with the
nearest-upsample stencil: K'[u,v] = sum_{du,dv in {0,1}} K_a[u+du-1,
v+dv-1] — a 4x4 kernel applied with lhs_dilation=2, padding=2, which XLA
lowers to its native transposed-conv path. No upsampled tensor, no
concat, identical math and identical parameter layout (the single
(3,3,Cx+Cs,Cout) kernel of the reference); exactness is pinned by
tests/test_decoder_fusion.py. Blocks with attention (scse) fall back to
the materialized form — the attention gate needs the concatenated tensor.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.modules import AttentionGate, ConvBNReLU, upsample_nearest
from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

_DN = ("NHWC", "HWIO", "NHWC")


def _upsample_composed_kernel(ka: jax.Array) -> jax.Array:
    """Compose a 3x3 kernel with the nearest-2x upsample: the returned 4x4
    kernel applied to the zero-dilated input (lhs_dilation=2, padding=2)
    equals applying ``ka`` (padding=1) to the nearest-upsampled input."""
    kp = jnp.pad(ka, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return kp[:-1, :-1] + kp[:-1, 1:] + kp[1:, :-1] + kp[1:, 1:]


class _FusedUpConv(nn.Module):
    """Owns the same (3, 3, in_x + in_skip, features) kernel as the plain
    ``nn.Conv`` over the concatenated input (named identically, so weight
    conversion and checkpoints are unaffected) but computes the split
    dilated form above."""

    features: int
    in_x: int
    in_skip: int
    use_bias: bool
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: Optional[jax.Array]) -> jax.Array:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_x + self.in_skip, self.features),
                            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        x, skip, kernel, bias = nn.dtypes.promote_dtype(
            x, skip, kernel, bias, dtype=self.dtype)
        # both derived kernels are pinned replicated under an active
        # spatial mesh: as in-graph intermediates (slices/sums of the
        # parameter) GSPMD propagation may otherwise shard them over an
        # idle 'model' axis, which miscompiles the spatially-partitioned
        # conv (mesh.constrain_replicated docstring; round-4 repro)
        from stcd_tpu.parallel.mesh import constrain_replicated
        k4 = constrain_replicated(
            _upsample_composed_kernel(kernel[:, :, : self.in_x, :]))
        y = jax.lax.conv_general_dilated(
            x, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2), dimension_numbers=_DN)
        if skip is not None:
            y = y + jax.lax.conv_general_dilated(
                skip, constrain_replicated(kernel[:, :, self.in_x:, :]),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)), dimension_numbers=_DN)
        if bias is not None:
            y = y + bias
        return y


class FusedUpConvBNReLU(nn.Module):
    """Drop-in for ``upsample -> concat -> ConvBNReLU`` with the identical
    param/batch_stats tree (children named "conv" and "bn", exactly like
    ``ConvBNReLU``) so converted reference weights load unchanged."""

    features: int
    in_x: int
    in_skip: int
    use_batchnorm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: Optional[jax.Array],
                 train: bool = False) -> jax.Array:
        y = _FusedUpConv(self.features, self.in_x, self.in_skip,
                         use_bias=not self.use_batchnorm, dtype=self.dtype,
                         name="conv")(x, skip)
        if self.use_batchnorm:
            y = MPBatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32, name="bn")(y)
        return nn.relu(y)


class DecoderBlock(nn.Module):
    """ref decoders/unet/decoder.py:8-43. ``fused`` selects the exact
    upsample+concat+conv rewrite (module docstring); parameter layout is
    identical either way."""

    out_channels: int
    use_batchnorm: bool = True
    attention_type: Optional[str] = None
    fused: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        if self.fused and self.attention_type is None:
            x = FusedUpConvBNReLU(self.out_channels, x.shape[-1],
                                  0 if skip is None else skip.shape[-1],
                                  use_batchnorm=self.use_batchnorm,
                                  dtype=self.dtype,
                                  name="conv1")(x, skip, train)
        else:
            x = upsample_nearest(x, 2)
            if skip is not None:
                x = jnp.concatenate([x, skip], axis=-1)
                x = AttentionGate(kind=self.attention_type, dtype=self.dtype,
                                  name="attention1")(x)
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
    fused: bool = True
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
        from stcd_tpu.parallel.mesh import constrain_spatial
        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            prev_h = x.shape[1]
            x = DecoderBlock(out_ch, use_batchnorm=self.use_batchnorm,
                             attention_type=self.attention_type,
                             fused=self.fused, dtype=self.dtype,
                             name=f"block{i}")(x, skip, train)
            # no-op unless a 'space' mesh is registered: pins each stage
            # to the canonical spatial layout so GSPMD never picks the
            # degenerate H-over-space conv partitioning (mesh.py)
            x = constrain_spatial(x, prev_h=prev_h)
        return x
