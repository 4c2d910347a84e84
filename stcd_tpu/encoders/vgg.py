"""VGG encoders (NHWC).

Two variants are needed by the reference:
- ``VGG16Features``: torchvision vgg16.features taps at indices
  {3, 8, 15, 22, 29} = relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, used by
  DSIFN (ref models/DSIFN.py:9-21 vgg16_base).
- ``VGGEncoder``: smp stage contract for the Unet family
  (ref encoders/vgg.py): stages split *before* each MaxPool, 6 levels.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.layers.modules import max_pool

# torchvision vgg16 cfg "D"
_VGG16_CFG: Tuple = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                     512, 512, 512, "M", 512, 512, 512, "M")


class VGG16Features(nn.Module):
    """DSIFN's 5-tap VGG16 feature extractor (ref models/DSIFN.py:9-21).

    Returns [relu1_2, relu2_2, relu3_3, relu4_3, relu5_3] with channel
    counts (64, 128, 256, 512, 512) at strides (1, 2, 4, 8, 16).
    Note the reference runs this base in eval() (frozen BN-free convs),
    so there is no train-time state here.
    """

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        taps = []
        conv_idx = 0
        stage_convs = [2, 2, 3, 3, 3]
        stage_feats = [64, 128, 256, 512, 512]
        h = x
        for s, (n_convs, feats) in enumerate(zip(stage_convs, stage_feats)):
            if s > 0:
                h = max_pool(h, window=2, stride=2)
            for _ in range(n_convs):
                h = nn.Conv(feats, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                            name=f"conv{conv_idx}")(h)
                h = nn.relu(h)
                conv_idx += 1
            taps.append(h)
        return taps


# convs per stage for the torchvision configs A/B/D/E
_VGG_STAGE_CONVS = {
    "vgg11": (1, 1, 2, 2, 2),
    "vgg13": (2, 2, 2, 2, 2),
    "vgg16": (2, 2, 3, 3, 3),
    "vgg19": (2, 2, 4, 4, 4),
}


class VGGEncoder(nn.Module):
    """smp-contract VGG(-BN) encoder: 6-level pyramid, stages end before
    each MaxPool (ref encoders/vgg.py make_layers + get_stages)."""

    arch: str = "vgg16"
    batch_norm: bool = False
    depth: int = 5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        features = []
        conv_idx = 0
        stage_convs = _VGG_STAGE_CONVS[self.arch]
        stage_feats = [64, 128, 256, 512, 512]
        h = x
        # smp stage contract: depth+1 features = conv stages 0..depth, where
        # stage 5 (only at depth=5) is the final maxpool alone. A shallow
        # depth must still emit the NEXT conv stage (smp's stages split
        # before each pool), not a pool of the previous one.
        n_conv_stages = min(self.depth + 1, 5)
        for s in range(n_conv_stages):
            if s > 0:
                h = max_pool(h, window=2, stride=2)
            for _ in range(stage_convs[s]):
                # torchvision VGG convs keep bias=True in the _bn variants too
                h = nn.Conv(stage_feats[s], (3, 3), padding=[(1, 1)] * 2,
                            use_bias=True, dtype=self.dtype,
                            name=f"conv{conv_idx}")(h)
                if self.batch_norm:
                    h = MPBatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=1e-5, dtype=jnp.float32,
                                     name=f"bn{conv_idx}")(h)
                h = nn.relu(h)
                conv_idx += 1
            features.append(h)
        if self.depth >= 5:
            features.append(max_pool(h, window=2, stride=2))
        return features


def vgg_out_channels(name: str) -> Tuple[int, ...]:
    return (64, 128, 256, 512, 512, 512)
