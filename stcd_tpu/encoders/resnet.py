"""ResNet encoder with the smp stage contract (NHWC).

Parity targets:
- torchvision-style ResNet (ref models/resnet.py:127-359), including
  ``replace_stride_with_dilation`` used by BIT (models/networks.py:234-241).
- smp ResNetEncoder stage contract (ref encoders/resnet.py:47-65):
  forward(x) returns a 6-level pyramid
  [identity(x), conv1+bn+relu, maxpool+layer1, layer2, layer3, layer4].

TPU-first notes: NHWC layout, all convs on the MXU; BN batch statistics
under a sharded global batch are global (XLA all-reduces them), matching
the reference's single-device whole-batch BN.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.layers.modules import max_pool

Dtype = Any


def _bn(train: bool, dtype, name: str):
    return MPBatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name=name
    )


class BasicBlock(nn.Module):
    """ResNet BasicBlock (ref models/resnet.py:37-76). expansion=1."""

    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Optional[Dtype] = None
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # interior spatial pins (no-ops without a 'space' mesh): leave
        # GSPMD no freedom to route block interiors through a free
        # 'model' axis — that freedom miscompiles the conv backward
        # (parallel/mesh._space_shardable docstring, round-4 discovery)
        from stcd_tpu.parallel.mesh import constrain_spatial

        identity = x
        # BasicBlock does NOT support dilation: torchvision raises, the
        # reference's local copy silently clamps to 1 (models/resnet.py:45-47).
        # replace_stride_with_dilation on resnet18/34 therefore only turns
        # strides into 1 — golden-matched in tests/test_golden_bit.py.
        d = 1
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(d, d)] * 2, kernel_dilation=(d, d), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = constrain_spatial(nn.relu(out))
        out = nn.Conv(
            self.features, (3, 3), padding=[(d, d)] * 2, kernel_dilation=(d, d),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = constrain_spatial(_bn(train, self.dtype, "bn2")(out))
        if self.downsample:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = constrain_spatial(
                _bn(train, self.dtype, "downsample_bn")(identity))
        return constrain_spatial(nn.relu(out + identity))


class Bottleneck(nn.Module):
    """ResNet Bottleneck (ref models/resnet.py:79-124). expansion=4.

    Stride on the 3x3 conv (torchvision v1.5 style, as in the reference).
    """

    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Optional[Dtype] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # interior spatial pins, same contract as BasicBlock's (ADVICE
        # r4: the asymmetry was undocumented): no-ops without a 'space'
        # mesh; with one, they leave GSPMD no freedom to route interiors
        # through a free 'model' axis (the round-4 conv-backward
        # miscompile, parallel/mesh._space_shardable docstring)
        from stcd_tpu.parallel.mesh import constrain_spatial

        width = int(self.features * (self.base_width / 64.0)) * self.groups
        identity = x
        d = self.dilation
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = constrain_spatial(nn.relu(out))
        out = nn.Conv(
            width, (3, 3), strides=(self.stride, self.stride), padding=[(d, d)] * 2,
            kernel_dilation=(d, d), feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = _bn(train, self.dtype, "bn2")(out)
        out = constrain_spatial(nn.relu(out))
        out = nn.Conv(
            self.features * self.expansion, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv3",
        )(out)
        out = constrain_spatial(_bn(train, self.dtype, "bn3")(out))
        if self.downsample:
            identity = nn.Conv(
                self.features * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = constrain_spatial(
                _bn(train, self.dtype, "downsample_bn")(identity))
        return constrain_spatial(nn.relu(out + identity))


_RESNET_CFGS = {
    # name: (block, layers[, groups, width_per_group])
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
    "resnet152": (Bottleneck, (3, 8, 36, 3)),
    # ResNeXt (ref encoders/resnet.py:142-232 variant table); grouped 3x3
    # bottleneck convs, width = planes * (width_per_group/64) * groups
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), 32, 4),
    "resnext101_32x4d": (Bottleneck, (3, 4, 23, 3), 32, 4),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 32, 8),
    "resnext101_32x16d": (Bottleneck, (3, 4, 23, 3), 32, 16),
    "resnext101_32x32d": (Bottleneck, (3, 4, 23, 3), 32, 32),
    "resnext101_32x48d": (Bottleneck, (3, 4, 23, 3), 32, 48),
}


def _resnet_cfg(name: str):
    cfg = _RESNET_CFGS[name]
    block, layers = cfg[0], cfg[1]
    groups, base_width = (cfg[2], cfg[3]) if len(cfg) > 2 else (1, 64)
    return block, layers, groups, base_width


def resnet_out_channels(name: str) -> Tuple[int, ...]:
    block, _, _, _ = _resnet_cfg(name)
    e = block.expansion
    return (3, 64, 64 * e, 128 * e, 256 * e, 512 * e)


class ResNetLayer(nn.Module):
    """One ResNet stage: ``blocks`` residual blocks, first may downsample."""

    block: Any
    features: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    prev_dilation: int = 1
    groups: int = 1
    base_width: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # per-BLOCK spatial pins: on a mesh that carries a free 'model'
        # axis next to 'space', GSPMD left to its own devices assigns
        # free-axis shardings to block interiors and miscompiles the conv
        # backward (parallel/mesh._space_shardable docstring); pinning
        # every block boundary removes that freedom. No-op without a
        # registered 'space' mesh.
        from stcd_tpu.parallel.mesh import constrain_spatial

        in_c = x.shape[-1]
        out_c = self.features * self.block.expansion
        extra = (
            {"groups": self.groups, "base_width": self.base_width}
            if self.block is Bottleneck else {}
        )
        x = self.block(
            self.features,
            stride=self.stride,
            dilation=self.prev_dilation,
            downsample=(self.stride != 1 or in_c != out_c),
            dtype=self.dtype,
            name="block0",
            **extra,
        )(x, train)
        x = constrain_spatial(x)
        for i in range(1, self.blocks):
            x = self.block(
                self.features, dilation=self.dilation, dtype=self.dtype,
                name=f"block{i}", **extra,
            )(x, train)
            x = constrain_spatial(x)
        return x


class ResNetEncoder(nn.Module):
    """smp-contract ResNet encoder (ref encoders/resnet.py:37-70).

    ``__call__(x, train)`` returns ``depth+1`` features:
    [x, conv1-relu (/2), layer1 (/4), layer2 (/8), layer3 (/16), layer4 (/32)].

    ``replace_stride_with_dilation``: per torchvision, a True entry converts
    layer{2,3,4}'s stride into dilation (used by BIT's dilated backbone,
    models/resnet.py + models/networks.py:234-241).
    """

    arch: str = "resnet50"
    depth: int = 5
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        # Stage-boundary spatial pins (no-ops unless a 'space' mesh is
        # registered): each stage's INPUT is pinned against the stage's
        # output height, so any stage whose maps fall below the
        # >= 2-rows-per-shard floor runs batch-parallel end to end. The
        # GSPMD partitioner computes wrong conv-kernel GRADIENTS for
        # 1-row-shard residual stages (mesh._space_shardable docstring;
        # round-4 discovery), so these pins are a correctness guard, not
        # an optimization.
        from stcd_tpu.parallel.mesh import constrain_spatial

        block, layers, groups, base_width = _resnet_cfg(self.arch)
        features = [x]
        if self.depth >= 1:
            x = constrain_spatial(x, out_h=x.shape[1] // 2)
            h = nn.Conv(
                64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2, use_bias=False,
                dtype=self.dtype, name="conv1",
            )(x)
            h = _bn(train, self.dtype, "bn1")(h)
            h = constrain_spatial(nn.relu(h))
            features.append(h)
        if self.depth >= 2:
            h = constrain_spatial(h, out_h=h.shape[1] // 2)
            h = constrain_spatial(max_pool(h, window=3, stride=2, padding=1))
            h = ResNetLayer(block, 64, layers[0], groups=groups,
                            base_width=base_width, dtype=self.dtype,
                            name="layer1")(h, train)
            features.append(h)
        dilation = 1
        strides_dil = []
        for replace in self.replace_stride_with_dilation:
            if replace:
                dilation *= 2
                strides_dil.append((1, dilation, dilation // 2))
            else:
                strides_dil.append((2, dilation, dilation))
        stage_feats = (128, 256, 512)
        for i in range(3):  # layer2..layer4 -> depth 3..5
            if self.depth >= 3 + i:
                stride, dil, prev_dil = strides_dil[i]
                h = constrain_spatial(h, out_h=h.shape[1] // stride)
                # prev_dilation applies to the first block of the stage
                h = ResNetLayer(
                    block, stage_feats[i], layers[1 + i], stride=stride,
                    dilation=dil, prev_dilation=max(prev_dil, 1),
                    groups=groups, base_width=base_width,
                    dtype=self.dtype, name=f"layer{2 + i}",
                )(h, train)
                features.append(h)
        return features
