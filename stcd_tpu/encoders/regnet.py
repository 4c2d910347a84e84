"""RegNetX/Y encoders (ref encoders/timm_regnet.py).

Per-variant config is the published (w0, wa, wm, group_size, depth[,
se_ratio]) parameterization (ref timm_regnet.py:91-355 ``_mcfg`` table);
stage widths/depths are derived with the RegNet quantized-linear rule
(Radosavovic et al., "Designing Network Design Spaces"), so the generated
widths reproduce the reference's out_channels exactly (asserted in tests).

Block: 1x1 -> grouped 3x3 (stride) -> 1x1, BN+ReLU, residual with 1x1-conv
downsample; Y-variants add SE (ratio relative to block input width).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.layers.modules import avg_pool_global
from stcd_tpu.encoders.dilation import make_dilated_rates

Dtype = Any

# name: (w0, wa, wm, group_size, depth, se_ratio)
_REGNET_CFGS = {
    "regnetx_002": (24, 36.44, 2.49, 8, 13, 0.0),
    "regnetx_004": (24, 24.48, 2.54, 16, 22, 0.0),
    "regnetx_006": (48, 36.97, 2.24, 24, 16, 0.0),
    "regnetx_008": (56, 35.73, 2.28, 16, 16, 0.0),
    "regnetx_016": (80, 34.01, 2.25, 24, 18, 0.0),
    "regnetx_032": (88, 26.31, 2.25, 48, 25, 0.0),
    "regnetx_040": (96, 38.65, 2.43, 40, 23, 0.0),
    "regnetx_064": (184, 60.83, 2.07, 56, 17, 0.0),
    "regnetx_080": (80, 49.56, 2.88, 120, 23, 0.0),
    "regnetx_120": (168, 73.36, 2.37, 112, 19, 0.0),
    "regnetx_160": (216, 55.59, 2.1, 128, 22, 0.0),
    "regnetx_320": (320, 69.86, 2.0, 168, 23, 0.0),
    "regnety_002": (24, 36.44, 2.49, 8, 13, 0.25),
    "regnety_004": (48, 27.89, 2.09, 8, 16, 0.25),
    "regnety_006": (48, 32.54, 2.32, 16, 15, 0.25),
    "regnety_008": (56, 38.84, 2.4, 16, 14, 0.25),
    "regnety_016": (48, 20.71, 2.65, 24, 27, 0.25),
    "regnety_032": (80, 42.63, 2.66, 24, 21, 0.25),
    "regnety_040": (96, 31.41, 2.24, 64, 22, 0.25),
    "regnety_064": (112, 33.22, 2.27, 72, 25, 0.25),
    "regnety_080": (192, 76.82, 2.19, 56, 17, 0.25),
    "regnety_120": (168, 73.36, 2.37, 112, 19, 0.25),
    "regnety_160": (200, 106.23, 2.48, 112, 18, 0.25),
    "regnety_320": (232, 115.89, 2.53, 232, 20, 0.25),
}


def generate_regnet(name: str) -> Tuple[Tuple[int, ...], Tuple[int, ...], Tuple[int, ...]]:
    """Quantized linear width rule -> (stage_widths, stage_depths, stage_groups)."""
    w0, wa, wm, group_size, depth, _ = _REGNET_CFGS[name]
    widths_cont = np.arange(depth) * wa + w0
    width_exps = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, width_exps)
    widths = (np.round(widths / 8) * 8).astype(int)
    stage_widths, stage_depths = np.unique(widths, return_counts=True)
    # adjust width to be divisible by the (possibly clipped) group size
    groups = np.minimum(group_size, stage_widths)
    stage_widths = (np.round(stage_widths / groups) * groups).astype(int)
    return tuple(stage_widths), tuple(stage_depths), tuple(groups.astype(int))


def regnet_out_channels(name: str) -> Tuple[int, ...]:
    widths, _, _ = generate_regnet(name)
    return (3, 32) + widths


def _bn(train: bool, name: str):
    return MPBatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32, name=name)


class RegNetBlock(nn.Module):
    width: int
    groups: int
    stride: int = 1
    dilation: int = 1  # smp make_dilated semantics: stage-uniform rate
    se_ratio: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_c = x.shape[-1]
        d = self.dilation
        # ref _utils.replace_strides_with_dilation: all strides -> 1
        stride = 1 if d > 1 else self.stride
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(_bn(train, "bn1")(h))
        h = nn.Conv(self.width, (3, 3), strides=stride, padding=d,
                    kernel_dilation=(d, d),
                    feature_group_count=self.width // self.groups,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(_bn(train, "bn2")(h))
        if self.se_ratio > 0:
            rd = max(1, int(round(in_c * self.se_ratio)))
            s = avg_pool_global(h)
            s = nn.relu(nn.Conv(rd, (1, 1), dtype=self.dtype, name="se_fc1")(s))
            s = jax.nn.sigmoid(nn.Conv(self.width, (1, 1), dtype=self.dtype,
                                       name="se_fc2")(s))
            h = h * s
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = _bn(train, "bn3")(h)
        if self.stride != 1 or in_c != self.width:
            identity = nn.Conv(self.width, (1, 1), strides=stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = _bn(train, "downsample_bn")(identity)
        else:
            identity = x
        return nn.relu(h + identity)


class RegNetEncoder(nn.Module):
    """smp-contract RegNet encoder: [x, stem 32 (/2), stage1..4]."""

    arch: str = "regnetx_002"
    depth: int = 5
    # smp make_dilated semantics over stages 2..4 (os=16 -> (F,F,T);
    # os=8 -> (F,T,T)); stage 1 always keeps its stride
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        widths, depths, groups = generate_regnet(self.arch)
        se_ratio = _REGNET_CFGS[self.arch][5]
        flags = self.replace_stride_with_dilation
        rates = make_dilated_rates(flags)
        features = [x]
        if self.depth >= 1:
            h = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                        dtype=self.dtype, name="stem_conv")(x)
            h = nn.relu(_bn(train, "stem_bn")(h))
            features.append(h)
        for i in range(len(widths)):
            if self.depth < 2 + i:
                break
            dil = rates[i - 1] if i > 0 and flags[i - 1] else 1
            for b in range(depths[i]):
                h = RegNetBlock(int(widths[i]), int(groups[i]),
                                stride=2 if b == 0 else 1, dilation=dil,
                                se_ratio=se_ratio, dtype=self.dtype,
                                name=f"stage{i + 1}_block{b}")(h, train)
            features.append(h)
        return features
