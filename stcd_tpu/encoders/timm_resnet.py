"""Res2Net, ResNeSt and SKNet encoders (ref encoders/timm_res2net.py,
timm_resnest.py, timm_sknet.py — timm ResNet variants).

All three share the timm ResNet skeleton (stem -> maxpool -> 4 stages) and
differ in the residual block:
- Bottle2neck (Res2Net): the 3x3 conv is split into ``scale`` hierarchical
  groups with running additions (multi-scale receptive field).
- ResNestBottleneck: split-attention 3x3 (radix-wise softmax channel
  attention), deep 3-conv stem, avg-pool downsampling (avg_down + avd).
- SelectiveKernelBasic/Bottleneck (SKNet): two parallel 3x3 branches with
  different dilation, fused by channel attention over branches.

Configs per variant come from the reference tables (layers, base_width,
cardinality, radix/scale, stem type).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.encoders.dilation import make_dilated_rates
from stcd_tpu.layers.modules import avg_pool_global, max_pool

Dtype = Any

# name: (block, layers, base_width, cardinality, block_arg, stem_width, avg_down)
_TIMM_RESNET_CFGS = {
    # res2net: block_arg = scale (ref timm_res2net.py:94-186)
    "res2net50_26w_4s": ("res2", (3, 4, 6, 3), 26, 1, 4, 64, False),
    "res2net101_26w_4s": ("res2", (3, 4, 23, 3), 26, 1, 4, 64, False),
    "res2net50_26w_6s": ("res2", (3, 4, 6, 3), 26, 1, 6, 64, False),
    "res2net50_26w_8s": ("res2", (3, 4, 6, 3), 26, 1, 8, 64, False),
    "res2net50_48w_2s": ("res2", (3, 4, 6, 3), 48, 1, 2, 64, False),
    "res2net50_14w_8s": ("res2", (3, 4, 6, 3), 14, 1, 8, 64, False),
    "res2next50": ("res2", (3, 4, 6, 3), 4, 8, 4, 64, False),
    # resnest: block_arg = radix (ref timm_resnest.py:72-186)
    "resnest14d": ("nest", (1, 1, 1, 1), 64, 1, 2, 32, True),
    "resnest26d": ("nest", (2, 2, 2, 2), 64, 1, 2, 32, True),
    "resnest50d": ("nest", (3, 4, 6, 3), 64, 1, 2, 32, True),
    "resnest101e": ("nest", (3, 4, 23, 3), 64, 1, 2, 64, True),
    "resnest200e": ("nest", (3, 24, 36, 3), 64, 1, 2, 64, True),
    "resnest269e": ("nest", (3, 30, 48, 8), 64, 1, 2, 64, True),
    "resnest50d_4s2x40d": ("nest", (3, 4, 6, 3), 40, 2, 4, 32, True),
    "resnest50d_1s4x24d": ("nest", (3, 4, 6, 3), 24, 4, 1, 32, True),
    # sknet (ref timm_sknet.py:54-122); block_arg unused
    "skresnet18": ("sk_basic", (2, 2, 2, 2), 64, 1, 0, 64, False),
    "skresnet34": ("sk_basic", (3, 4, 6, 3), 64, 1, 0, 64, False),
    "skresnext50_32x4d": ("sk_bottle", (3, 4, 6, 3), 4, 32, 0, 64, False),
}


def timm_resnet_out_channels(name: str) -> Tuple[int, ...]:
    kind, _, _, _, _, stem_w, _ = _TIMM_RESNET_CFGS[name]
    e = 1 if kind == "sk_basic" else 4
    stem_out = stem_w * 2 if kind == "nest" else 64  # deep stems emit 2x width
    return (3, stem_out, 64 * e, 128 * e, 256 * e, 512 * e)


def _bn(train: bool, name: str):
    return MPBatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32, name=name)


class Bottle2neck(nn.Module):
    """Res2Net bottleneck (Gao et al. 2019; timm res2net.Bottle2neck)."""

    planes: int
    base_width: int = 26
    cardinality: int = 1
    scale: int = 4
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = int(math.floor(self.planes * (self.base_width / 64.0))) \
            * self.cardinality
        out_c = self.planes * 4
        is_first = self.stride > 1 or self.downsample
        h = nn.Conv(width * self.scale, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.relu(_bn(train, "bn1")(h))
        sp = jnp.split(h, self.scale, axis=-1)
        outs = []
        prev = None
        n_convs = max(1, self.scale - 1)
        for i in range(n_convs):
            s = sp[i] if (i == 0 or is_first) else sp[i] + prev
            s = nn.Conv(width, (3, 3), strides=self.stride, padding=1,
                        feature_group_count=self.cardinality, use_bias=False,
                        dtype=self.dtype, name=f"conv2_{i}")(s)
            s = nn.relu(_bn(train, f"bn2_{i}")(s))
            outs.append(s)
            prev = s
        if self.scale > 1:
            last = sp[-1]
            if is_first:  # pool the untouched group when downsampling
                last = nn.avg_pool(last, (3, 3), strides=(self.stride,) * 2,
                                   padding=((1, 1), (1, 1)))
            outs.append(last)
        h = jnp.concatenate(outs, -1)
        h = nn.Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = _bn(train, "bn3")(h)
        identity = x
        if self.downsample:
            identity = nn.Conv(out_c, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = _bn(train, "downsample_bn")(identity)
        return nn.relu(h + identity)


class SplitAttentionConv(nn.Module):
    """ResNeSt SplAtConv2d: radix-grouped 3x3 + softmax channel attention."""

    channels: int
    radix: int = 2
    groups: int = 1
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        r, c = self.radix, self.channels
        h = nn.Conv(c * r, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=self.groups * r, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        h = nn.relu(_bn(train, "bn0")(h))
        if r > 1:
            parts = jnp.split(h, r, axis=-1)
            gap = avg_pool_global(sum(parts))
        else:
            gap = avg_pool_global(h)
        # timm SplitAttn: attn_chs = make_divisible(in*r*0.25, 8, min 32)
        v = c * r // 4
        inter = max(32, int(v + 4) // 8 * 8)
        if inter < 0.9 * v:
            inter += 8
        a = nn.Conv(inter, (1, 1), feature_group_count=self.groups,
                    dtype=self.dtype, name="fc1")(gap)
        a = nn.relu(_bn(train, "bn1")(a))
        a = nn.Conv(c * r, (1, 1), feature_group_count=self.groups,
                    dtype=self.dtype, name="fc2")(a)
        if r > 1:
            # rSoftMax (timm/official): reshape (B, groups, radix, -1),
            # softmax over radix, then flatten RADIX-major so each split's
            # attention keeps the group-major channel layout of the conv.
            # (A group-major flatten is only correct for cardinality 1.)
            n = a.shape[0]
            a = a.reshape(n, self.groups, r, c // self.groups)
            a = jax.nn.softmax(a, axis=2)
            a = a.transpose(0, 2, 1, 3).reshape(n, 1, 1, r * c)
            att = jnp.split(a, r, axis=-1)
            return sum(att[i] * parts[i] for i in range(r))
        a = jax.nn.sigmoid(a)
        return h * a


class ResNestBottleneck(nn.Module):
    """ResNeSt block (Zhang et al. 2020; timm resnest.ResNestBottleneck)."""

    planes: int
    base_width: int = 64
    cardinality: int = 1
    radix: int = 2
    stride: int = 1
    downsample: bool = False
    avd_first: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        group_width = int(self.planes * (self.base_width / 64.0)) * self.cardinality
        out_c = self.planes * 4
        h = nn.Conv(group_width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(_bn(train, "bn1")(h))
        use_avd = self.stride > 1  # avd=True in all reference variants
        if use_avd and self.avd_first:
            h = nn.avg_pool(h, (3, 3), strides=(self.stride,) * 2,
                            padding=((1, 1), (1, 1)))
        h = SplitAttentionConv(group_width, radix=self.radix,
                               groups=self.cardinality, stride=1,
                               dtype=self.dtype, name="conv2")(h, train)
        if use_avd and not self.avd_first:
            h = nn.avg_pool(h, (3, 3), strides=(self.stride,) * 2,
                            padding=((1, 1), (1, 1)))
        h = nn.Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = _bn(train, "bn3")(h)
        identity = x
        if self.downsample:
            # avg_down: avgpool + 1x1 conv stride 1 (all reference variants)
            identity = x
            if self.stride > 1:
                identity = nn.avg_pool(identity, (2, 2), strides=(2, 2))
            identity = nn.Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(identity)
            identity = _bn(train, "downsample_bn")(identity)
        return nn.relu(h + identity)


def _make_divisible(v, divisor=8, min_value=None):
    """timm.layers.make_divisible."""
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class SelectiveKernel(nn.Module):
    """timm SelectiveKernel: two 3x3 branches (dilation 1 and 2), fused by
    softmax attention over branches. skresnet18/34 use split_input=True
    with rd_ratio=1/8 (timm sk_kwargs); skresnext50_32x4d uses
    split_input=False with rd_ratio=1/16, rd_divisor=32."""

    out_channels: int
    stride: int = 1
    dilation: int = 1  # smp make_dilated stage-uniform override
    groups: int = 1
    split_input: bool = True
    rd_ratio: float = 1 / 8
    rd_divisor: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        paths = jnp.split(x, 2, axis=-1) if self.split_input else [x, x]
        g = min(self.out_channels, self.groups)
        feats = []
        for i, (p, d) in enumerate(zip(paths, (1, 2))):
            if self.dilation > 1:
                # ref _utils.replace_strides_with_dilation patches EVERY
                # conv in the stage: both SK paths collapse to the SAME
                # dilation/padding (the reference's crude patch overrides
                # timm's per-path 1/2 dilations) and strides become 1
                d = self.dilation
            stride = 1 if self.dilation > 1 else self.stride
            f = nn.Conv(self.out_channels, (3, 3), strides=stride,
                        padding=d, kernel_dilation=d,
                        feature_group_count=max(g, 1), use_bias=False,
                        dtype=self.dtype, name=f"path{i}_conv")(p)
            f = nn.relu(_bn(train, f"path{i}_bn")(f))
            feats.append(f)
        u = feats[0] + feats[1]
        rd = _make_divisible(self.out_channels * self.rd_ratio,
                             self.rd_divisor)
        a = avg_pool_global(u)
        a = nn.relu(_bn(train, "attn_bn")(
            nn.Conv(rd, (1, 1), use_bias=False, dtype=self.dtype,
                    name="attn_fc1")(a)))
        a = nn.Conv(self.out_channels * 2, (1, 1), dtype=self.dtype,
                    name="attn_fc2")(a)
        n = a.shape[0]
        a = jax.nn.softmax(a.reshape(n, 1, 1, 2, self.out_channels), axis=3)
        return a[..., 0, :] * feats[0] + a[..., 1, :] * feats[1]


class SelectiveKernelBlock(nn.Module):
    """SK basic (sk18/34) or bottleneck (skresnext50) residual block."""

    planes: int
    bottleneck: bool = False
    base_width: int = 64
    cardinality: int = 1
    stride: int = 1
    dilation: int = 1  # smp make_dilated semantics: stage-uniform rate
    downsample: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dd = self.dilation
        if self.bottleneck:
            width = int(self.planes * (self.base_width / 64.0)) * self.cardinality
            out_c = self.planes * 4
            h = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv1")(x)
            h = nn.relu(_bn(train, "bn1")(h))
            # skresnext50_32x4d sk_kwargs (timm resnet.py):
            # split_input=False, rd_ratio=1/16, rd_divisor=32
            h = SelectiveKernel(width, stride=self.stride, dilation=dd,
                                groups=self.cardinality, split_input=False,
                                rd_ratio=1 / 16, rd_divisor=32,
                                dtype=self.dtype, name="sk")(h, train)
            h = nn.Conv(out_c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv3")(h)
            h = _bn(train, "bn3")(h)
        else:
            out_c = self.planes
            h = SelectiveKernel(self.planes, stride=self.stride, dilation=dd,
                                dtype=self.dtype, name="sk")(x, train)
            h = nn.Conv(out_c, (3, 3), padding=dd, kernel_dilation=(dd, dd),
                        use_bias=False,
                        dtype=self.dtype, name="conv2")(h)
            h = _bn(train, "bn2")(h)
        identity = x
        if self.downsample:
            identity = nn.Conv(out_c, (1, 1),
                               strides=1 if dd > 1 else self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = _bn(train, "downsample_bn")(identity)
        return nn.relu(h + identity)


class TimmResNetEncoder(nn.Module):
    """smp-contract encoder for the res2net/resnest/sknet families."""

    arch: str = "res2net50_26w_4s"
    depth: int = 5
    # smp make_dilated over layer2..4 — SKNET ONLY: the reference refuses
    # dilation for res2net/resnest (ref timm_res2net.py:27-28,
    # timm_resnest.py:27-28); check_dilation_support mirrors that.
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Optional[Dtype] = None

    @staticmethod
    def check_dilation_support(arch="res2net50_26w_4s", **_):
        kind = _TIMM_RESNET_CFGS[arch][0]
        if kind == "res2":
            raise ValueError("Res2Net encoders do not support dilated mode")
        if kind == "nest":
            raise ValueError("ResNest encoders do not support dilated mode")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        kind, layers, base_width, card, barg, stem_w, avg_down = \
            _TIMM_RESNET_CFGS[self.arch]
        flags = self.replace_stride_with_dilation
        if any(flags):
            self.check_dilation_support(self.arch)
        rates = make_dilated_rates(flags)
        features = [x]
        if self.depth >= 1:
            if kind == "nest":  # deep stem: 3x conv3x3 (w, w, 2w)
                h = x
                for i, (c, s) in enumerate(((stem_w, 2), (stem_w, 1),
                                            (stem_w * 2, 1))):
                    h = nn.Conv(c, (3, 3), strides=s, padding=1,
                                use_bias=False, dtype=self.dtype,
                                name=f"stem_conv{i + 1}")(h)
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
                h = max_pool(h, window=3, stride=2, padding=1)
            stride = 1 if i == 0 else 2
            for b in range(layers[i]):
                e = 1 if kind == "sk_basic" else 4
                down = b == 0 and (stride != 1 or h.shape[-1] != planes[i] * e)
                s = stride if b == 0 else 1
                name = f"layer{i + 1}_block{b}"
                if kind == "res2":
                    h = Bottle2neck(planes[i], base_width, card, scale=barg,
                                    stride=s, downsample=down,
                                    dtype=self.dtype, name=name)(h, train)
                elif kind == "nest":
                    avd_first = self.arch.endswith(("4s2x40d", "1s4x24d"))
                    h = ResNestBottleneck(planes[i], base_width, card,
                                          radix=barg, stride=s,
                                          downsample=down, avd_first=avd_first,
                                          dtype=self.dtype, name=name)(h, train)
                else:
                    dil = rates[i - 1] if i > 0 and flags[i - 1] else 1
                    h = SelectiveKernelBlock(planes[i],
                                             bottleneck=kind == "sk_bottle",
                                             base_width=base_width,
                                             cardinality=card, stride=s,
                                             dilation=dil,
                                             downsample=down,
                                             dtype=self.dtype, name=name)(h, train)
            features.append(h)
        return features
