"""DenseNet encoders (ref encoders/densenet.py, torchvision DenseNet).

Stage contract (ref densenet.py:59-87): the per-stage skip is taken inside
the transition, *after* its BN+ReLU but before the 1x1 conv + avg-pool
(``TransitionWithSkip``, ref densenet.py:35-46) — so skips carry the full
dense-block width while the downsampled stream continues at half width.
The final stage applies norm5 after denseblock4.

TPU notes: each dense layer is BN-ReLU-1x1conv(4k)-BN-ReLU-3x3conv(k) with
a channel concat; XLA fuses the concat chain, and the 1x1/3x3 convs run on
the MXU. Dilation is unsupported (same as the reference, which raises in
``make_dilated`` — densenet.py:57).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.layers.modules import max_pool

Dtype = Any

# name: (init_features, growth_rate, block_config)
_DENSENET_CFGS = {
    "densenet121": (64, 32, (6, 12, 24, 16)),
    "densenet169": (64, 32, (6, 12, 32, 32)),
    "densenet201": (64, 32, (6, 12, 48, 32)),
    "densenet161": (96, 48, (6, 12, 36, 24)),
}


def densenet_out_channels(name: str) -> Tuple[int, ...]:
    init, k, blocks = _DENSENET_CFGS[name]
    chans = [3, init]
    c = init
    for i, n in enumerate(blocks):
        c = c + n * k
        chans.append(c)
        if i < len(blocks) - 1:
            c = c // 2  # transition halves the stream, skip keeps full width
    return tuple(chans)


def _bn(train: bool, name: str):
    return MPBatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32, name=name)


class DenseLayer(nn.Module):
    """torchvision _DenseLayer: BN-ReLU-conv1x1(4k)-BN-ReLU-conv3x3(k)."""

    growth_rate: int
    bn_size: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.relu(_bn(train, "norm1")(x))
        h = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = nn.relu(_bn(train, "norm2")(h))
        h = nn.Conv(self.growth_rate, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.num_layers):
            x = DenseLayer(self.growth_rate, dtype=self.dtype,
                           name=f"denselayer{i + 1}")(x, train)
        return x


class DenseNetEncoder(nn.Module):
    """smp-contract DenseNet encoder.

    [x, conv0+norm0+relu (/2), pool+block1+T1-skip (/4),
     block2+T2-skip (/8), block3+T3-skip (/16), block4+norm5 (/32)].
    """

    arch: str = "densenet121"
    depth: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        init, k, blocks = _DENSENET_CFGS[self.arch]
        features = [x]
        if self.depth >= 1:
            h = nn.Conv(init, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=self.dtype, name="conv0")(x)
            h = nn.relu(_bn(train, "norm0")(h))
            features.append(h)
        for i, n in enumerate(blocks):
            if self.depth < 2 + i:
                break
            if i == 0:
                h = max_pool(h, window=3, stride=2, padding=1)
            h = DenseBlock(n, k, dtype=self.dtype,
                           name=f"denseblock{i + 1}")(h, train)
            if i < len(blocks) - 1:
                # transition: BN+ReLU -> skip; 1x1 conv halve + avgpool2 -> stream
                h = nn.relu(_bn(train, f"transition{i + 1}_norm")(h))
                features.append(h)
                h = nn.Conv(h.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"transition{i + 1}_conv")(h)
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            else:
                h = nn.relu(_bn(train, "norm5")(h))
                features.append(h)
        return features
