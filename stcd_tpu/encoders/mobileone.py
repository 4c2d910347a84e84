"""MobileOne encoders (ref encoders/mobileone.py, Apple MobileOne).

Train-time over-parameterized blocks: each stage block is a depthwise
conv (k parallel 3x3 branches + a 1x1 "scale" branch + BN identity when
shapes allow) followed by a pointwise conv (k parallel 1x1 branches + BN
identity). Branches are summed; at inference they fold into single convs
(reparameterization) — we keep the train form, XLA fuses the branch sums.

Variant table (ref mobileone.py:492-568): width multipliers over base
stage widths (64, 128, 256, 512), depths (2, 8, 10, 1), stem
min(64, 64*wm0); s0 uses 4 conv branches, s4 adds SE in the later stages.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.layers.modules import avg_pool_global
from stcd_tpu.encoders.dilation import make_dilated_rates

Dtype = Any

# name: (width_multipliers, num_conv_branches, use_se)
_MOBILEONE_CFGS = {
    "mobileone_s0": ((0.75, 1.0, 1.0, 2.0), 4, False),
    "mobileone_s1": ((1.5, 1.5, 2.0, 2.5), 1, False),
    "mobileone_s2": ((1.5, 2.0, 2.5, 4.0), 1, False),
    "mobileone_s3": ((2.0, 2.5, 3.0, 4.0), 1, False),
    "mobileone_s4": ((3.0, 3.5, 3.5, 4.0), 1, True),
}
_BASE_WIDTHS = (64, 128, 256, 512)
_DEPTHS = (2, 8, 10, 1)


def mobileone_out_channels(name: str) -> Tuple[int, ...]:
    wms = _MOBILEONE_CFGS[name][0]
    stem = min(64, int(64 * wms[0]))
    return (3, stem) + tuple(int(w * m) for w, m in zip(_BASE_WIDTHS, wms))


def _bn(train: bool, name: str):
    return MPBatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32, name=name)


class MobileOneConv(nn.Module):
    """One over-parameterized conv: ``branches`` kxk convs + 1x1 scale
    branch (if k > 1) + BN identity (if shape-preserving), summed."""

    out_channels: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1  # smp make_dilated semantics: stage-uniform rate
    groups: int = 1
    branches: int = 1
    use_se: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_c = x.shape[-1]
        k = self.kernel
        d = self.dilation
        # ref _utils.replace_strides_with_dilation patches convs AFTER
        # construction: strides -> 1, dilation d, padding (k//2)*d. The
        # identity-BN branch below keys on the ORIGINAL stride (branch
        # existence was decided at torch module construction).
        stride = 1 if d > 1 else self.stride
        out = 0.0
        for b in range(self.branches):
            h = nn.Conv(self.out_channels, (k, k), strides=stride,
                        padding=(k // 2) * d, kernel_dilation=(d, d),
                        feature_group_count=self.groups,
                        use_bias=False, dtype=self.dtype,
                        name=f"branch{b}_conv")(x)
            out = out + _bn(train, f"branch{b}_bn")(h)
        if k > 1:  # 1x1 scale branch
            h = nn.Conv(self.out_channels, (1, 1), strides=stride,
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, name="scale_conv")(x)
            out = out + _bn(train, "scale_bn")(h)
        if self.stride == 1 and in_c == self.out_channels:
            out = out + _bn(train, "identity_bn")(x)
        if self.use_se:
            s = avg_pool_global(out)
            s = nn.relu(nn.Conv(self.out_channels // 16, (1, 1),
                                dtype=self.dtype, name="se_fc1")(s))
            s = jax.nn.sigmoid(nn.Conv(self.out_channels, (1, 1),
                                       dtype=self.dtype, name="se_fc2")(s))
            out = out * s
        return nn.relu(out)


class MobileOneBlock(nn.Module):
    """Depthwise kxk MobileOneConv + pointwise 1x1 MobileOneConv."""

    out_channels: int
    stride: int = 1
    dilation: int = 1
    branches: int = 1
    use_se: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_c = x.shape[-1]
        h = MobileOneConv(in_c, kernel=3, stride=self.stride, groups=in_c,
                          dilation=self.dilation,
                          branches=self.branches, use_se=self.use_se,
                          dtype=self.dtype, name="dw")(x, train)
        return MobileOneConv(self.out_channels, kernel=1,
                             dilation=self.dilation,
                             branches=self.branches, use_se=self.use_se,
                             dtype=self.dtype, name="pw")(h, train)


class MobileOneEncoder(nn.Module):
    """smp-contract MobileOne encoder: [x, stem (/2), stage1..4]."""

    arch: str = "mobileone_s0"
    depth: int = 5
    # smp make_dilated over stages 2..4 (os=16 -> (F,F,T); os=8 -> (F,T,T))
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        wms, branches, use_se = _MOBILEONE_CFGS[self.arch]
        flags = self.replace_stride_with_dilation
        rates = make_dilated_rates(flags)
        features = [x]
        if self.depth >= 1:
            stem_c = min(64, int(64 * wms[0]))
            # ref stage0 keeps the DEFAULT single conv branch (mobileone.py:
            # 320-327 does not pass num_conv_branches) even for s0
            h = MobileOneConv(stem_c, kernel=3, stride=2,
                              dtype=self.dtype, name="stem")(x, train)
            features.append(h)
        for i in range(4):
            if self.depth < 2 + i:
                break
            c = int(_BASE_WIDTHS[i] * wms[i])
            # SE only in the deepest stages of s4 (last stage + second half
            # of stage 3, per the reference model)
            dil = rates[i - 1] if i > 0 and flags[i - 1] else 1
            for b in range(_DEPTHS[i]):
                se = use_se and (i == 3 or (i == 2 and b >= _DEPTHS[i] // 2))
                h = MobileOneBlock(c, stride=2 if b == 0 else 1, dilation=dil,
                                   branches=branches, use_se=se,
                                   dtype=self.dtype,
                                   name=f"stage{i + 1}_block{b}")(h, train)
            features.append(h)
        return features
