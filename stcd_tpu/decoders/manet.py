"""MAnet decoder (ref decoders/manet/decoder.py): PAB center + MFAB blocks."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.modules import ConvBNReLU, upsample_nearest


class PAB(nn.Module):
    """Position-attention block (ref manet/decoder.py:8-37): full spatial
    self-attention over the head feature."""

    pab_channels: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        top = nn.Conv(self.pab_channels, (1, 1), dtype=self.dtype, name="top")(x)
        center = nn.Conv(self.pab_channels, (1, 1), dtype=self.dtype, name="center")(x)
        bottom = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                         name="bottom")(x)
        q = center.reshape(b, h * w, self.pab_channels)
        k = top.reshape(b, h * w, self.pab_channels)
        v = bottom.reshape(b, h * w, c)
        sp = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32)
        # NOTE ref softmaxes over the FLATTENED (h*w)^2 map (decoder.py:31)
        sp = jax.nn.softmax(sp.reshape(b, -1), axis=-1).reshape(b, h * w, h * w)
        out = jnp.einsum("bnm,bmc->bnc", sp.astype(v.dtype), v)
        # ref then row-major-reshapes the (hw, C) result straight to
        # (C, h, w) WITHOUT transposing (decoder.py:35) — a stock-smp quirk
        # that permutes (position, channel); reproduced for golden parity.
        out = out.reshape(b, c, h, w).transpose(0, 2, 3, 1)
        x = x + out
        return nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                       name="out_conv")(x)


class _SE(nn.Module):
    channels: int
    reduced: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return jax.nn.sigmoid(s)


class MFAB(nn.Module):
    """Multi-scale fusion attention block (ref manet/decoder.py:40-103)."""

    skip_channels: int
    out_channels: int
    reduction: int = 16
    use_batchnorm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip, train=False):
        cin = x.shape[-1]
        x = ConvBNReLU(cin, 3, padding=1, use_batchnorm=self.use_batchnorm,
                       dtype=self.dtype, name="hl1")(x, train)
        x = ConvBNReLU(self.skip_channels, 1, use_batchnorm=self.use_batchnorm,
                       dtype=self.dtype, name="hl2")(x, train)
        x = upsample_nearest(x, 2)
        reduced = max(1, self.skip_channels // self.reduction)
        att = _SE(self.skip_channels, reduced, dtype=self.dtype, name="se_hl")(x)
        if skip is not None:
            att = att + _SE(self.skip_channels, reduced, dtype=self.dtype,
                            name="se_ll")(skip)
            x = x * att
            x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNReLU(self.out_channels, 3, padding=1,
                       use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                       name="conv1")(x, train)
        return ConvBNReLU(self.out_channels, 3, padding=1,
                          use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                          name="conv2")(x, train)


class _PlainBlock(nn.Module):
    out_channels: int
    use_batchnorm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip=None, train=False):
        x = upsample_nearest(x, 2)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNReLU(self.out_channels, 3, padding=1,
                       use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                       name="conv1")(x, train)
        return ConvBNReLU(self.out_channels, 3, padding=1,
                          use_batchnorm=self.use_batchnorm, dtype=self.dtype,
                          name="conv2")(x, train)


class MAnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    n_blocks: int = 5
    reduction: int = 16
    use_batchnorm: bool = True
    pab_channels: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features, train=False):
        feats = features[1:][::-1]
        head, skips = feats[0], feats[1:]
        skip_channels = [f.shape[-1] for f in skips] + [0]
        x = PAB(self.pab_channels, dtype=self.dtype, name="center")(head)
        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            if skip_channels[i] > 0:
                x = MFAB(skip_channels[i], out_ch, self.reduction,
                         self.use_batchnorm, dtype=self.dtype,
                         name=f"block{i}")(x, skip, train)
            else:
                x = _PlainBlock(out_ch, self.use_batchnorm, dtype=self.dtype,
                                name=f"block{i}")(x, skip, train)
        return x
