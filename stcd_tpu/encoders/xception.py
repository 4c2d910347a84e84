"""Xception encoder (ref encoders/xception.py, Cadene xception).

Stage split (ref xception.py:29-47): stem conv1+conv2 (64 /2), block1
(128 /4), block2 (256 /8), blocks 3-11 (728 /16), block12+conv3+conv4
(2048 /32). Dilation unsupported (pooling downsampling), matching the
reference's ``make_dilated`` error.

Separable conv = depthwise kxk + pointwise 1x1 (Cadene SeparableConv2d);
each Xception block is [relu ->] sepconv-bn x2-3 with an optional strided
maxpool and a 1x1-conv shortcut.

Padding parity: the smp reference PATCHES the Cadene stem's padding=0
convs to padding=(1,1) in __init__ ("modify padding to maintain output
shape", ref xception.py:19-21); our symmetric padding=1 reproduces that
exactly (TF-SAME would misalign the stride-2 conv1).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.layers.modules import max_pool

Dtype = Any


def xception_out_channels(name: str = "xception") -> Tuple[int, ...]:
    return (3, 64, 128, 256, 728, 2048)


def _bn(train: bool, name: str):
    return MPBatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32, name=name)


class SeparableConv(nn.Module):
    out_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        h = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                    use_bias=False, dtype=self.dtype, name="depthwise")(x)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       dtype=self.dtype, name="pointwise")(h)


class XceptionBlock(nn.Module):
    """Cadene Block: reps x (relu, sepconv, bn); optional entry relu skip,
    strided maxpool tail, and conv shortcut."""

    out_channels: int
    reps: int
    stride: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_c = x.shape[-1]
        h = x
        c = self.out_channels if self.grow_first else in_c
        for i in range(self.reps):
            if i > 0 or self.start_with_relu:
                h = nn.relu(h)
            oc = self.out_channels if (self.grow_first or i == self.reps - 1) else c
            h = SeparableConv(oc, dtype=self.dtype, name=f"sepconv{i + 1}")(h)
            h = _bn(train, f"bn{i + 1}")(h)
        if self.stride != 1:
            h = max_pool(h, window=3, stride=self.stride, padding=1)
        if self.out_channels != in_c or self.stride != 1:
            skip = nn.Conv(self.out_channels, (1, 1), strides=self.stride,
                           use_bias=False, dtype=self.dtype, name="skip_conv")(x)
            skip = _bn(train, "skip_bn")(skip)
        else:
            skip = x
        return h + skip


class XceptionEncoder(nn.Module):
    """smp-contract Xception encoder (ref xception.py:14-57)."""

    depth: int = 5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        features = [x]
        if self.depth >= 1:
            h = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            h = nn.relu(_bn(train, "bn1")(h))
            h = nn.Conv(64, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name="conv2")(h)
            h = nn.relu(_bn(train, "bn2")(h))
            features.append(h)
        if self.depth >= 2:
            h = XceptionBlock(128, 2, stride=2, start_with_relu=False,
                              dtype=self.dtype, name="block1")(h, train)
            features.append(h)
        if self.depth >= 3:
            h = XceptionBlock(256, 2, stride=2, dtype=self.dtype,
                              name="block2")(h, train)
            features.append(h)
        if self.depth >= 4:
            h = XceptionBlock(728, 2, stride=2, dtype=self.dtype,
                              name="block3")(h, train)
            for i in range(4, 12):  # middle flow: blocks 4..11
                h = XceptionBlock(728, 3, dtype=self.dtype,
                                  name=f"block{i}")(h, train)
            features.append(h)
        if self.depth >= 5:
            h = XceptionBlock(1024, 2, stride=2, grow_first=False,
                              dtype=self.dtype, name="block12")(h, train)
            h = SeparableConv(1536, dtype=self.dtype, name="conv3")(h)
            h = nn.relu(_bn(train, "bn3")(h))
            h = SeparableConv(2048, dtype=self.dtype, name="conv4")(h)
            # smp's stage 5 Sequential ENDS at bn4 — no trailing relu
            # (ref xception.py:46: [block12, conv3, bn3, relu, conv4, bn4])
            h = _bn(train, "bn4")(h)
            features.append(h)
        return features
