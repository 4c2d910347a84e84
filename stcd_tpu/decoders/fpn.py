"""FPN decoder (ref segmentation_models_pytorch/decoders/fpn/decoder.py)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.modules import upsample_bilinear, upsample_nearest


class Conv3x3GNReLU(nn.Module):
    features: int
    upsample: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="gn")(x)
        x = nn.relu(x)
        if self.upsample:
            x = upsample_bilinear(x, 2, align_corners=True)
        return x


class FPNDecoder(nn.Module):
    """p5..p2 lateral pyramid + per-level segmentation blocks + merge."""

    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dropout: float = 0.2
    merge_policy: str = "add"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features, train=False):
        c2, c3, c4, c5 = features[-4:]
        p5 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype, name="p5")(c5)
        p4 = upsample_nearest(p5, 2) + nn.Conv(self.pyramid_channels, (1, 1),
                                               dtype=self.dtype, name="p4_skip")(c4)
        p3 = upsample_nearest(p4, 2) + nn.Conv(self.pyramid_channels, (1, 1),
                                               dtype=self.dtype, name="p3_skip")(c3)
        p2 = upsample_nearest(p3, 2) + nn.Conv(self.pyramid_channels, (1, 1),
                                               dtype=self.dtype, name="p2_skip")(c2)
        outs = []
        for i, (p, n_up) in enumerate(zip((p5, p4, p3, p2), (3, 2, 1, 0))):
            h = Conv3x3GNReLU(self.segmentation_channels, upsample=bool(n_up),
                              dtype=self.dtype, name=f"seg{i}_0")(p)
            for j in range(1, n_up):
                h = Conv3x3GNReLU(self.segmentation_channels, upsample=True,
                                  dtype=self.dtype, name=f"seg{i}_{j}")(h)
            outs.append(h)
        x = sum(outs) if self.merge_policy == "add" else jnp.concatenate(outs, -1)
        return nn.Dropout(self.dropout, deterministic=not train,
                          broadcast_dims=(1, 2))(x)
