"""The FC-EF / FC-Siam UNet family (Daudt et al., ICIP 2018) — one
parametric NHWC implementation covering the reference's five variants:

- UnetEF            <- models/Unet.py:10-154 (early fusion: cat(x1,x2) input)
- SiamUnetDiff      <- models/SiamUnet_diff.py:10-181 (|f1-f2| skips)
- SiamUnetConc      <- models/SiamUnet_conc.py (cat(f1,f2) skips; 384/192/96/48)
- SiamUnetSub       <- models/SiamUnet_sub.py (signed (f2-f1) skips)
- SiamUnetCrossConc <- models/SiamUnet_crossconc.py (channel-interleave +
                       grouped conv fusion, cross_conc :11-33)

Encoder: 4 stages of (2,2,3,3) Conv3x3+BN+Dropout2d(0.2)+ReLU at widths
(16,32,64,128), 2x2 maxpool between stages. Decoder per stage: exact-2x
ConvTranspose(k3,s2,p1,op1) upsample, replication-pad fixup, skip fusion,
then (3,3,3,2/2) ConvTranspose(k3,s1,p1) convs. A stride-1 ConvTranspose2d
with symmetric padding is mathematically a standard convolution with a
flipped kernel — identical shapes and expressive power — so the decoder
convs are implemented as nn.Conv (documented equivalence; weights convert
by flipping HW and transposing IO).

TPU-first: the Siamese encoder runs once on the 2N-batched concat of
(x1, x2) instead of twice sequentially (ref runs two passes,
models/SiamUnet_diff.py:100-146); fusion splits the batch back.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.layers.modules import (
    ConvTranspose2x,
    Dropout2d,
    max_pool,
    pad_replicate_to,
)

_STAGE_WIDTHS = (16, 32, 64, 128)
_STAGE_CONVS = (2, 2, 3, 3)
_DEC_CONVS = {  # per decoder stage (deepest first): conv out-widths
    3: (128, 128, 64),
    2: (64, 64, 32),
    1: (32, 16),
}


class _CBDR(nn.Module):
    """Conv3x3 + BN + Dropout2d(0.2) + ReLU, the family's unit block
    (e.g. models/SiamUnet_diff.py:100: do(relu(bn(conv(x)))))."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="conv")(x)
        x = MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        x = nn.relu(x)
        return Dropout2d(0.2, name="do")(x, train)


class _Encoder(nn.Module):
    """4-stage encoder; returns (pre-pool skip features, pooled bottom)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False) -> Tuple[List[jax.Array], jax.Array]:
        skips = []
        for s, (w, n) in enumerate(zip(_STAGE_WIDTHS, _STAGE_CONVS)):
            for i in range(n):
                x = _CBDR(w, dtype=self.dtype, name=f"conv{s + 1}{i + 1}")(x, train)
            skips.append(x)
            x = max_pool(x, 2, 2)
        return skips, x


class CrossConcFuse(nn.Module):
    """cross_conc fusion (ref models/SiamUnet_crossconc.py:11-33).

    Interleave A/B channels -> grouped 3x3 conv (groups=C, pairwise
    per-channel mixing) + BN + ReLU -> 3x3 conv + BN -> ReLU.
    """

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, a, b, train=False):
        n, h, w, c = a.shape
        x = jnp.stack([a, b], axis=-1).reshape(n, h, w, 2 * c)  # [a0,b0,a1,b1,...]
        x = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, feature_group_count=c,
                    dtype=self.dtype, name="diff_conv")(x)
        x = MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="diff_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="res_conv")(x)
        x = MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="res_bn")(x)
        return nn.relu(x)


class SiamUnet(nn.Module):
    """Parametric FC-(EF|Siam) UNet. ``fusion`` selects the variant."""

    fusion: str = "diff"  # ef | diff | conc | sub | crossconc
    label_nbr: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False) -> jax.Array:
        enc = _Encoder(dtype=self.dtype, name="encoder")
        if self.fusion == "ef":
            skips, bottom = enc(jnp.concatenate([x1, x2], axis=-1), train)
            fused = skips
        else:
            n = x1.shape[0]
            skips_ab, bottom_ab = enc(jnp.concatenate([x1, x2], axis=0), train)
            skips1 = [s[:n] for s in skips_ab]
            skips2 = [s[n:] for s in skips_ab]
            # The reference decodes from the *second* pass's x4p
            # (models/SiamUnet_diff.py:146,150 — x4p is overwritten by the
            # B-branch); we follow that exactly:
            bottom = bottom_ab[n:]
            if self.fusion == "diff":
                fused = [jnp.abs(a - b) for a, b in zip(skips1, skips2)]
            elif self.fusion == "sub":
                # ref models/SiamUnet_sub.py:150: torch.sub(x2, x1)... signed
                fused = [b - a for a, b in zip(skips1, skips2)]
            elif self.fusion == "conc":
                fused = [jnp.concatenate([a, b], axis=-1) for a, b in zip(skips1, skips2)]
            elif self.fusion == "crossconc":
                fused = [
                    CrossConcFuse(w, dtype=self.dtype, name=f"cross_conc{s + 1}")(
                        a, b, train)
                    for s, (w, a, b) in enumerate(zip(_STAGE_WIDTHS, skips1, skips2))
                ]
            else:
                raise ValueError(f"unknown fusion {self.fusion}")

        x = bottom
        for stage in (3, 2, 1):
            up_w = _STAGE_WIDTHS[stage]
            x = ConvTranspose2x(up_w, dtype=self.dtype, name=f"upconv{stage + 1}")(x)
            skip = fused[stage]
            x = pad_replicate_to(x, skip.shape[1:3])
            x = jnp.concatenate([x, skip], axis=-1)
            for i, w in enumerate(_DEC_CONVS[stage]):
                x = _CBDR(w, dtype=self.dtype,
                          name=f"conv{stage + 1}{len(_DEC_CONVS[stage]) - i}d")(x, train)
        # stage 1d
        x = ConvTranspose2x(16, dtype=self.dtype, name="upconv1")(x)
        skip = fused[0]
        x = pad_replicate_to(x, skip.shape[1:3])
        x = jnp.concatenate([x, skip], axis=-1)
        x = _CBDR(16, dtype=self.dtype, name="conv12d")(x, train)
        x = nn.Conv(self.label_nbr, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="conv11d")(x)
        return x


def UnetEF(label_nbr: int = 2, dtype=None) -> SiamUnet:
    return SiamUnet(fusion="ef", label_nbr=label_nbr, dtype=dtype)


def SiamUnetDiff(label_nbr: int = 2, dtype=None) -> SiamUnet:
    return SiamUnet(fusion="diff", label_nbr=label_nbr, dtype=dtype)


def SiamUnetConc(label_nbr: int = 2, dtype=None) -> SiamUnet:
    return SiamUnet(fusion="conc", label_nbr=label_nbr, dtype=dtype)


def SiamUnetSub(label_nbr: int = 2, dtype=None) -> SiamUnet:
    return SiamUnet(fusion="sub", label_nbr=label_nbr, dtype=dtype)


def SiamUnetCrossConc(label_nbr: int = 2, dtype=None) -> SiamUnet:
    return SiamUnet(fusion="crossconc", label_nbr=label_nbr, dtype=dtype)
