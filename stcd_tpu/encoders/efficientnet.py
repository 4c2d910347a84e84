"""EfficientNet encoders (ref encoders/efficientnet.py and
encoders/timm_efficientnet.py).

One implementation covers both reference families:
- ``efficientnet-b0..b7`` (efficientnet_pytorch semantics; stage splits by
  flat block index, ref efficientnet.py:46-76 + the per-variant
  ``stage_idxs`` table at :104-176).
- ``timm-efficientnet-b0..b8, l2`` and ``timm-tf_efficientnet_lite0..4``
  (timm semantics; stage splits by block *group*, ref
  timm_efficientnet.py:79-113; lite variants use relu6 and no SE).

MBConv = expand 1x1 -> depthwise kxk -> SE (squeeze to in_c/4 of the
*unexpanded* width) -> project 1x1, swish activations, stochastic depth on
the residual (drop_connect, train only).

Width/depth scaling follows the published compound-scaling rule:
``round_filters`` (divisor 8) / ``round_repeats`` (ceil).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.layers.modules import avg_pool_global
from stcd_tpu.encoders.dilation import make_dilated_rates

Dtype = Any

# base (kernel, repeats, stride, expand, in_c, out_c, se_ratio)
_BASE_BLOCKS = [
    (3, 1, 1, 1, 32, 16, 0.25),
    (3, 2, 2, 6, 16, 24, 0.25),
    (5, 2, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (5, 3, 1, 6, 80, 112, 0.25),
    (5, 4, 2, 6, 112, 192, 0.25),
    (3, 1, 1, 6, 192, 320, 0.25),
]

# name: (width_coefficient, depth_coefficient, drop_connect_rate)
_EFFNET_CFGS = {
    "b0": (1.0, 1.0, 0.2), "b1": (1.0, 1.1, 0.2), "b2": (1.1, 1.2, 0.3),
    "b3": (1.2, 1.4, 0.3), "b4": (1.4, 1.8, 0.4), "b5": (1.6, 2.2, 0.4),
    "b6": (1.8, 2.6, 0.5), "b7": (2.0, 3.1, 0.5), "b8": (2.2, 3.6, 0.5),
    "l2": (4.3, 5.3, 0.5),
    "lite0": (1.0, 1.0, 0.2), "lite1": (1.0, 1.1, 0.2),
    "lite2": (1.1, 1.2, 0.3), "lite3": (1.2, 1.4, 0.3),
    "lite4": (1.4, 1.8, 0.4),
}

# group index (0..6) at which each smp stage ends for the TIMM naming
# (timm stage_idxs (2, 3, 5) slice whole block GROUPS, ref
# timm_efficientnet.py:105-113): stage2 = groups[0:2], stage3 =
# groups[2:3], stage4 = groups[3:5], stage5 = groups[5:7].
_STAGE_END_GROUP = (1, 2, 4, 6)

# The efficientnet_pytorch naming slices FLAT block indices with the
# per-variant table (ref efficientnet.py:104-176 "stage_idxs"). These are
# group-aligned for b1..b7 but NOT for b0: its stage4/5 boundary (flat 9)
# falls one block INTO the 112-channel group, so features[4] taps after
# g4's first block and blocks 9-10 belong to smp stage 5 (review finding:
# the group mapping silently shifted b0's tap by two blocks).
_REF_STAGE_IDXS = {
    "b0": (3, 5, 9, 16), "b1": (5, 8, 16, 23), "b2": (5, 8, 16, 23),
    "b3": (5, 8, 18, 26), "b4": (6, 10, 22, 32), "b5": (8, 13, 27, 39),
    "b6": (9, 15, 31, 45), "b7": (11, 18, 38, 55),
}


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def efficientnet_out_channels(variant: str, lite: bool = False) -> Tuple[int, ...]:
    width = _EFFNET_CFGS[variant][0]
    chans = [3, 32 if lite else round_filters(32, width)]  # lite fixes the stem
    group_out = [round_filters(b[5], width) for b in _BASE_BLOCKS]
    for end in _STAGE_END_GROUP:
        chans.append(group_out[end])
    return tuple(chans)


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def _bn(train: bool, name: str):
    return MPBatchNorm(use_running_average=not train, momentum=0.99,
                       epsilon=1e-3, dtype=jnp.float32, name=name)


class MBConv(nn.Module):
    kernel: int
    out_channels: int
    expand_ratio: int
    stride: int = 1
    dilation: int = 1  # smp make_dilated semantics: stage-uniform rate
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    lite: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        act = jax.nn.relu6 if self.lite else swish
        in_c = x.shape[-1]
        exp_c = in_c * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = nn.Conv(exp_c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(h)
            h = act(_bn(train, "expand_bn")(h))
        k = self.kernel
        d = self.dilation
        # TF SAME padding (efficientnet_pytorch Conv2dStaticSamePadding):
        # asymmetric (0,1)-style pads at stride 2, == symmetric k//2 at
        # stride 1 with odd kernels. Dilated stages (smp make_dilated):
        # strides -> 1 and padding becomes symmetric (k//2)*d in BOTH
        # reference families (the efficientnet_pytorch patch replaces
        # static_padding with Identity + torch symmetric padding; timm's
        # Conv2dSame recomputes SAME at stride 1, which equals it) — SAME
        # at stride 1 with kernel_dilation d is exactly that.
        h = nn.Conv(exp_c, (k, k), strides=1 if d > 1 else self.stride,
                    padding="SAME", kernel_dilation=(d, d),
                    feature_group_count=exp_c, use_bias=False,
                    dtype=self.dtype, name="dw_conv")(h)
        h = act(_bn(train, "dw_bn")(h))
        if self.se_ratio > 0 and not self.lite:
            rd = max(1, int(in_c * self.se_ratio))
            s = avg_pool_global(h)
            s = act(nn.Conv(rd, (1, 1), dtype=self.dtype, name="se_reduce")(s))
            s = jax.nn.sigmoid(nn.Conv(exp_c, (1, 1), dtype=self.dtype,
                                       name="se_expand")(s))
            h = h * s
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project_conv")(h)
        h = _bn(train, "project_bn")(h)
        if self.stride == 1 and in_c == self.out_channels:
            if train and self.drop_rate > 0:
                # stochastic depth (drop_connect): per-sample residual drop
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (h.shape[0], 1, 1, 1))
                h = h * mask.astype(h.dtype) / keep
            h = h + x
        return h


class EfficientNetEncoder(nn.Module):
    """smp-contract EfficientNet encoder.

    [x, stem (/2), g0-g1 (/4), g2 (/8), g3-g4 (/16), g5-g6 (/32)]
    where gN are the seven scaled MBConv groups.
    """

    variant: str = "b0"
    lite: bool = False
    depth: int = 5
    drop_connect_rate: float = 0.2
    # smp make_dilated over feature stages 3..5 (os=16 -> (F,F,T);
    # os=8 -> (F,T,T)); the residual-skip condition keys on the ORIGINAL
    # stride (efficientnet_pytorch id_skip uses block_args.stride)
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    # stage-boundary semantics: "flat" = the efficientnet_pytorch naming
    # (per-variant _REF_STAGE_IDXS flat block indices — mid-group for b0);
    # "group" = the timm naming (whole groups, _STAGE_END_GROUP)
    stage_split: str = "group"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        width, depth_c, _ = _EFFNET_CFGS[self.variant]
        features = [x]
        stem_c = 32 if self.lite else round_filters(32, width)
        h = nn.Conv(stem_c, (3, 3), strides=2, padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        act = jax.nn.relu6 if self.lite else swish
        h = act(_bn(train, "stem_bn")(h))
        if self.depth >= 1:
            features.append(h)
        # flat block list with per-group round_repeats (lite: first/last
        # group repeats fixed)
        blocks = []
        for gi, (k, r, s, e, _ic, oc, se) in enumerate(_BASE_BLOCKS):
            reps = r if self.lite and gi in (0, len(_BASE_BLOCKS) - 1) \
                else round_repeats(r, depth_c)
            oc = round_filters(oc, width)
            for i in range(reps):
                blocks.append((k, oc, e, se, s if i == 0 else 1, gi))
        # flat indices (exclusive) at which smp stages 2..5 end
        if self.stage_split == "flat":
            stage_ends = list(_REF_STAGE_IDXS[self.variant])
        else:
            ends_of_group = {}
            for bi, blk in enumerate(blocks):
                ends_of_group[blk[5]] = bi + 1
            stage_ends = [ends_of_group[g] for g in _STAGE_END_GROUP]
        flags = self.replace_stride_with_dilation
        rates = make_dilated_rates(flags)
        stage = 2
        for bidx, (k, oc, e, se, s, _gi) in enumerate(blocks):
            if stage > self.depth:
                return features
            dil = rates[stage - 3] if stage >= 3 and flags[stage - 3] else 1
            h = MBConv(k, oc, e, stride=s, dilation=dil, se_ratio=se,
                       drop_rate=self.drop_connect_rate * bidx / len(blocks),
                       lite=self.lite, dtype=self.dtype,
                       name=f"block{bidx}")(h, train)
            if stage - 2 < len(stage_ends) and bidx + 1 == stage_ends[stage - 2]:
                if stage <= self.depth:
                    features.append(h)
                stage += 1
        return features
