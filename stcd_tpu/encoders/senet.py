"""SENet encoders (ref encoders/senet.py, Cadene pretrainedmodels SENet).

Variants and block semantics (Cadene senet.py):
- ``senet154``: SEBottleneck — conv1 1x1 -> planes*2, conv2 3x3 grouped
  (groups=64) stride -> planes*4, conv3 1x1 -> planes*4; 3x3-conv stem
  (64, 64, 128); downsample uses kernel 3 pad 1; input planes 128.
- ``se_resnet{50,101,152}``: SEResNetBottleneck — stride on conv1 (1x1),
  7x7 stem.
- ``se_resnext{50,101}_32x4d``: SEResNeXtBottleneck — width =
  floor(planes * base_width/64) * groups, stride on conv2.

All blocks end with a squeeze-excite (reduction 16) scaling the residual
branch. Stage split per ref senet.py:49-57: layer0-without-pool is stage 1,
pool+layer1 stage 2, then layer2..4.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.encoders.dilation import make_dilated_rates
from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.layers.modules import avg_pool_global, max_pool

Dtype = Any

# name: (block_kind, layers, groups, reduction, downsample_kernel, input_3x3)
_SENET_CFGS = {
    "senet154": ("se", (3, 8, 36, 3), 64, 16, 3, True),
    "se_resnet50": ("se_resnet", (3, 4, 6, 3), 1, 16, 1, False),
    "se_resnet101": ("se_resnet", (3, 4, 23, 3), 1, 16, 1, False),
    "se_resnet152": ("se_resnet", (3, 8, 36, 3), 1, 16, 1, False),
    "se_resnext50_32x4d": ("se_resnext", (3, 4, 6, 3), 32, 16, 1, False),
    "se_resnext101_32x4d": ("se_resnext", (3, 4, 23, 3), 32, 16, 1, False),
}


def senet_out_channels(name: str) -> Tuple[int, ...]:
    stem = 128 if _SENET_CFGS[name][5] else 64
    return (3, stem, 256, 512, 1024, 2048)


def _bn(train: bool, name: str):
    return MPBatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32, name=name)


class SEScale(nn.Module):
    """Cadene SEModule: GAP -> fc1 (1x1, /reduction) -> ReLU -> fc2 -> sigmoid."""

    channels: int
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = avg_pool_global(x)
        s = nn.relu(nn.Conv(self.channels // self.reduction, (1, 1),
                            dtype=self.dtype, name="fc1")(s))
        s = jax.nn.sigmoid(nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                                   name="fc2")(s))
        return x * s


class SENetBlock(nn.Module):
    """The three Cadene SE bottleneck flavours, selected by ``kind``."""

    kind: str  # "se" | "se_resnet" | "se_resnext"
    planes: int
    groups: int = 1
    reduction: int = 16
    stride: int = 1
    dilation: int = 1  # smp make_dilated semantics: stage-uniform rate
    downsample: bool = False
    downsample_kernel: int = 1
    base_width: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = self.planes
        out_c = p * 4
        if self.kind == "se":  # senet154
            c1, c2, g = p * 2, p * 4, self.groups
            s1, s2 = 1, self.stride
        elif self.kind == "se_resnet":
            c1, c2, g = p, p, 1
            s1, s2 = self.stride, 1  # stride on conv1 (Cadene quirk)
        else:  # se_resnext
            width = (p * self.base_width // 64) * self.groups
            c1, c2, g = width, width, self.groups
            s1, s2 = 1, self.stride
        d = self.dilation
        if d > 1:  # ref _utils.replace_strides_with_dilation: all strides -> 1
            s1 = s2 = 1
        h = nn.Conv(c1, (1, 1), strides=s1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(_bn(train, "bn1")(h))
        h = nn.Conv(c2, (3, 3), strides=s2, padding=d, kernel_dilation=(d, d),
                    feature_group_count=g,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(_bn(train, "bn2")(h))
        h = nn.Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = _bn(train, "bn3")(h)
        h = SEScale(out_c, self.reduction, dtype=self.dtype, name="se")(h)
        identity = x
        if self.downsample:
            k = self.downsample_kernel
            identity = nn.Conv(out_c, (k, k),
                               strides=1 if d > 1 else self.stride,
                               padding=(k // 2) * d, kernel_dilation=(d, d),
                               use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = _bn(train, "downsample_bn")(identity)
        return nn.relu(h + identity)


class SENetEncoder(nn.Module):
    """smp-contract SENet encoder (ref senet.py:27-67)."""

    arch: str = "se_resnet50"
    depth: int = 5
    # smp make_dilated semantics (ref encoders/_base.py:34-57 +
    # _utils.py:41-52): a True entry converts layer{2,3,4}'s stride into a
    # stage-uniform cumulative dilation (os=16 -> (F,F,T); os=8 -> (F,T,T))
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        kind, layers, groups, reduction, dk, input_3x3 = _SENET_CFGS[self.arch]
        features = [x]
        if self.depth >= 1:
            if input_3x3:  # senet154 stem: 3x conv3x3 (64, 64, 128)
                h = x
                for i, (c, s) in enumerate(((64, 2), (64, 1), (128, 1))):
                    h = nn.Conv(c, (3, 3), strides=s, padding=1, use_bias=False,
                                dtype=self.dtype, name=f"stem_conv{i + 1}")(h)
                    h = nn.relu(_bn(train, f"stem_bn{i + 1}")(h))
            else:
                h = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                            dtype=self.dtype, name="stem_conv1")(x)
                h = nn.relu(_bn(train, "stem_bn1")(h))
            features.append(h)
        planes = (64, 128, 256, 512)
        for i in range(4):
            if self.depth < 2 + i:
                break
            if i == 0:
                # Cadene: MaxPool2d(3, stride=2, ceil_mode=True, padding=0)
                # == VALID 3x3/2 over an input padded (0,1) on the high side
                # (flax pads max-pools with -inf); symmetric padding=1 would
                # shift every pooling window by one pixel
                h = nn.max_pool(h, (3, 3), strides=(2, 2),
                                padding=((0, 1), (0, 1)))
            stride = 1 if i == 0 else 2
            # layer{2,3,4} map onto the 3 flags; a dilated stage's rate is
            # the cumulative doubling including its own flag (os=8 ->
            # layer3 rate 2, layer4 rate 4 — ref _base.py:34-47)
            flags = self.replace_stride_with_dilation
            this_dilated = i > 0 and flags[i - 1]
            # smp make_dilated semantics (shared formula)
            dilation = make_dilated_rates(flags)[i - 1] if this_dilated else 1
            # Cadene: layer1 always uses downsample_kernel_size=1 even for
            # senet154; later layers use the config kernel
            this_dk = 1 if i == 0 else dk
            n = layers[i]
            for b in range(n):
                down = b == 0 and (stride != 1 or h.shape[-1] != planes[i] * 4)
                h = SENetBlock(kind, planes[i], groups=groups,
                               reduction=reduction,
                               stride=stride if b == 0 else 1,
                               dilation=dilation if this_dilated else 1,
                               downsample=down, downsample_kernel=this_dk,
                               dtype=self.dtype,
                               name=f"layer{i + 1}_block{b}")(h, train)
            features.append(h)
        return features
