"""MobileNetV2 / MobileNetV3 encoders (ref encoders/mobilenet.py,
encoders/timm_mobilenetv3.py).

Stage splits mirror the reference exactly:
- V2 (ref mobilenet.py:42-50): features[:2], [2:4], [4:7], [7:14], [14:]
  -> out_channels (3, 16, 24, 32, 96, 1280).
- V3 (ref timm_mobilenetv3.py:41-70): large groups stem+blocks[0] into
  stage 1; small starts stages at the stem. Channels are scaled by
  ``width_mult`` with the make_divisible(8) rule.

Inverted residual blocks (expand 1x1 -> depthwise 3x3/5x5 -> project 1x1)
keep the expansion in one fused XLA region; depthwise convs lower to XLA
feature-group convolutions.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.encoders.dilation import make_dilated_rates
from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.layers.modules import avg_pool_global

Dtype = Any


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """torchvision/timm _make_divisible: round to nearest multiple, never
    dropping more than 10%."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _bn(train: bool, name: str):
    return MPBatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32, name=name)


def hard_swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hard_sigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.relu6(x + 3.0) / 6.0


class InvertedResidual(nn.Module):
    """MobileNetV2/V3 inverted residual.

    V2: act=relu6, no SE. V3: act per-block (relu / hard_swish), optional
    squeeze-excite with hard-sigmoid gate.
    """

    exp_channels: int
    out_channels: int
    kernel: int = 3
    stride: int = 1
    # smp make_dilated semantics (ref _utils.py:41-52): stride forced to 1,
    # dw conv dilated. The residual connection keeps the ORIGINAL stride
    # condition (torch fixes use_res_connect at __init__, before patching).
    dilation: int = 1
    use_se: bool = False
    act: str = "relu6"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        act = {"relu6": jax.nn.relu6, "relu": nn.relu, "hswish": hard_swish}[self.act]
        in_c = x.shape[-1]
        h = x
        if self.exp_channels != in_c:
            h = nn.Conv(self.exp_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="expand_conv")(h)
            h = act(_bn(train, "expand_bn")(h))
        k, d = self.kernel, self.dilation
        p = (self.kernel // 2) * d
        eff_stride = 1 if d > 1 else self.stride
        h = nn.Conv(self.exp_channels, (k, k), strides=eff_stride, padding=p,
                    kernel_dilation=(d, d),
                    feature_group_count=self.exp_channels, use_bias=False,
                    dtype=self.dtype, name="dw_conv")(h)
        h = act(_bn(train, "dw_bn")(h))
        if self.use_se:
            # timm mobilenetv3 SE (se_from_exp=False): the reduction width
            # comes from the block INPUT channels, not the expanded width
            # (torchvision uses expanded/4 — the vendored reference is timm)
            rd = make_divisible(in_c / 4)
            s = avg_pool_global(h)
            s = nn.relu(nn.Conv(rd, (1, 1), dtype=self.dtype, name="se_reduce")(s))
            s = hard_sigmoid(nn.Conv(self.exp_channels, (1, 1), dtype=self.dtype,
                                     name="se_expand")(s))
            h = h * s
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project_conv")(h)
        h = _bn(train, "project_bn")(h)
        if self.stride == 1 and in_c == self.out_channels:
            h = h + x
        return h


# MobileNetV2 (t, c, n, s) table — torchvision mobilenet_v2
_V2_CFG = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class MobileNetV2Encoder(nn.Module):
    """smp-contract MobileNetV2 (ref mobilenet.py:33-63).

    Stage boundaries by torchvision feature index:
    [:2]=stem+block1 (16 /2), [2:4] (24 /4), [4:7] (32 /8),
    [7:14] (96 /16), [14:]=rest+final 1x1 conv (1280 /32).
    """

    depth: int = 5
    # (stage3, stage4, stage5) flags, smp make_dilated semantics
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        features = [x]
        # stage index (3..5) -> dilation rate from the cumulative flags
        flags = self.replace_stride_with_dilation
        rates = make_dilated_rates(flags)  # smp make_dilated semantics
        stage_dilation = {si: rates[si - 3] for si in (3, 4, 5) if flags[si - 3]}
        # expand the (t,c,n,s) table into the flat torchvision features list
        blocks = []
        for t, c, n, s in _V2_CFG:
            for i in range(n):
                blocks.append((t, c, s if i == 0 else 1))
        boundaries = {1: 1, 3: 2, 6: 3, 13: 4}  # feature idx -> stage end
        h = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        h = jax.nn.relu6(_bn(train, "stem_bn")(h))
        stage = 1
        for idx, (t, c, s) in enumerate(blocks, start=1):
            if stage > self.depth:
                return features
            in_c = h.shape[-1]
            h = InvertedResidual(t * in_c, c, stride=s, act="relu6",
                                 dilation=stage_dilation.get(stage, 1),
                                 dtype=self.dtype, name=f"block{idx}")(h, train)
            if boundaries.get(idx) is not None:
                features.append(h)
                stage += 1
        if stage <= self.depth:
            h = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                        name="final_conv")(h)
            h = jax.nn.relu6(_bn(train, "final_bn")(h))
            features.append(h)
        return features


# MobileNetV3 block specs: (kernel, exp, out, se, act, stride)
_V3_LARGE = [
    # stage 0 (fused into stage 1 with the stem, ref timm_mobilenetv3.py:56-62)
    [(3, 16, 16, False, "relu", 1)],
    [(3, 64, 24, False, "relu", 2), (3, 72, 24, False, "relu", 1)],
    [(5, 72, 40, True, "relu", 2), (5, 120, 40, True, "relu", 1),
     (5, 120, 40, True, "relu", 1)],
    [(3, 240, 80, False, "hswish", 2), (3, 200, 80, False, "hswish", 1),
     (3, 184, 80, False, "hswish", 1), (3, 184, 80, False, "hswish", 1)],
    [(3, 480, 112, True, "hswish", 1), (3, 672, 112, True, "hswish", 1)],
    [(5, 672, 160, True, "hswish", 2), (5, 960, 160, True, "hswish", 1),
     (5, 960, 160, True, "hswish", 1)],
]
_V3_SMALL = [
    [(3, 16, 16, True, "relu", 2)],
    [(3, 72, 24, False, "relu", 2), (3, 88, 24, False, "relu", 1)],
    [(5, 96, 40, True, "hswish", 2), (5, 240, 40, True, "hswish", 1),
     (5, 240, 40, True, "hswish", 1)],
    [(5, 120, 48, True, "hswish", 1), (5, 144, 48, True, "hswish", 1)],
    [(5, 288, 96, True, "hswish", 2), (5, 576, 96, True, "hswish", 1),
     (5, 576, 96, True, "hswish", 1)],
]


def mobilenetv3_out_channels(mode: str, width_mult: float = 1.0) -> Tuple[int, ...]:
    base = [16, 16, 24, 48, 576] if mode == "small" else [16, 24, 40, 112, 960]
    return tuple([3] + [make_divisible(c * width_mult) for c in base])


class MobileNetV3Encoder(nn.Module):
    """smp-contract MobileNetV3 (ref timm_mobilenetv3.py:14-96).

    ``minimal``: timm's *_minimal_100 variants — 3x3 kernels only, no SE,
    relu everywhere.
    """

    mode: str = "large"
    width_mult: float = 1.0
    minimal: bool = False
    depth: int = 5
    # (stage3, stage4, stage5) flags, smp make_dilated semantics
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        specs = _V3_LARGE if self.mode == "large" else _V3_SMALL
        wm = self.width_mult
        features = [x]
        stem_c = make_divisible(16 * wm)
        act_stem = nn.relu if self.minimal else hard_swish
        h = nn.Conv(stem_c, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        h = act_stem(_bn(train, "stem_bn")(h))
        # stage grouping (ref timm_mobilenetv3.py:41-70):
        # large: [stem+g0], [g1], [g2], [g3+g4], [g5]
        # small: [stem],    [g0], [g1], [g2+g3], [g4]
        if self.mode == "large":
            groups = [[0], [1], [2], [3, 4], [5]]
        else:
            groups = [[], [0], [1], [2, 3], [4]]
        flags = self.replace_stride_with_dilation
        rates = make_dilated_rates(flags)  # smp make_dilated semantics
        stage_dilation = {si: rates[si - 3] for si in (3, 4, 5) if flags[si - 3]}
        bidx = 0
        for stage, gids in enumerate(groups, start=1):
            if stage > self.depth:
                return features
            for g in gids:
                for (k, e, c, se, act, s) in specs[g]:
                    if self.minimal:
                        k, se, act = 3, False, "relu"
                    h = InvertedResidual(
                        make_divisible(e * wm), make_divisible(c * wm),
                        kernel=k, stride=s, use_se=se, act=act,
                        dilation=stage_dilation.get(stage, 1),
                        dtype=self.dtype, name=f"block{bidx}")(h, train)
                    bidx += 1
            if stage == 5:
                final_c = make_divisible((960 if self.mode == "large" else 576) * wm)
                h = nn.Conv(final_c, (1, 1), use_bias=False, dtype=self.dtype,
                            name="final_conv")(h)
                h = act_stem(_bn(train, "final_bn")(h))
            features.append(h)
        return features
