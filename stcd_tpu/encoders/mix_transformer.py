"""MixVisionTransformer (SegFormer) encoders with the smp contract.

Parity: segmentation_models_pytorch/encoders/mix_transformer.py (mit_b0..b5).
Reuses the parameterized SegFormer encoder from the ChangeFormer module;
the smp contract inserts a zero-channel dummy at the /2 level (smp's
MixVisionTransformerEncoder does the same — its out_channels[1] == 0).
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

_MIT_CFGS = {
    "mit_b0": dict(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mit_b1": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2)),
    "mit_b2": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3)),
    "mit_b3": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 18, 3)),
    "mit_b4": dict(embed_dims=(64, 128, 320, 512), depths=(3, 8, 27, 3)),
    "mit_b5": dict(embed_dims=(64, 128, 320, 512), depths=(3, 6, 40, 3)),
}


def mit_out_channels(name: str):
    dims = _MIT_CFGS[name]["embed_dims"]
    return (3, 0) + tuple(dims)


class MixTransformerEncoder(nn.Module):
    variant: str = "mit_b0"
    depth: int = 5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False) -> List:
        from stcd_tpu.models.changeformer import SegFormerEncoder
        cfg = _MIT_CFGS[self.variant]
        enc = SegFormerEncoder(
            embed_dims=cfg["embed_dims"], depths=cfg["depths"],
            num_heads=(1, 2, 5, 8), sr_ratios=(8, 4, 2, 1), first_patch=7,
            first_stride=4, qkv_bias=True, drop_path_rate=0.1,
            dtype=self.dtype, name="mit")
        feats = enc(x, train)
        n, h, w, _ = x.shape
        dummy = jnp.zeros((n, h // 2, w // 2, 0), x.dtype)
        # honor the smp depth contract: depth+1 features
        return ([x, dummy] + list(feats))[: self.depth + 1]
