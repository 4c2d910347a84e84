"""GERNet encoders (ref encoders/timm_gernet.py — timm ByobNet subset).

Config is the reference's explicit ByoBlockCfg table (ref
timm_gernet.py:117-163): per-stage (type, depth, channels, stride,
group_size, bottle_ratio), a 3x3/2 stem, and a final 1x1 conv to
``num_features``. ``basic`` = two 3x3 convs; ``bottle`` = 1x1 -> grouped
3x3 -> 1x1 with mid width ``c * bottle_ratio`` (gs=1 means depthwise).
Stages 4 and 5 of the table both live in smp stage 5 (stride-1 tail).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.encoders.dilation import make_dilated_rates

Dtype = Any

# (type, depth, channels, stride, group_size, bottle_ratio)
_GERNET_CFGS = {
    "gernet_s": {
        "stem": 13, "features": 1920,
        "blocks": [("basic", 1, 48, 2, 0, 1.0), ("basic", 3, 48, 2, 0, 1.0),
                   ("bottle", 7, 384, 2, 0, 0.25), ("bottle", 2, 560, 2, 1, 3.0),
                   ("bottle", 1, 256, 1, 1, 3.0)],
    },
    "gernet_m": {
        "stem": 32, "features": 2560,
        "blocks": [("basic", 1, 128, 2, 0, 1.0), ("basic", 2, 192, 2, 0, 1.0),
                   ("bottle", 6, 640, 2, 0, 0.25), ("bottle", 4, 640, 2, 1, 3.0),
                   ("bottle", 1, 640, 1, 1, 3.0)],
    },
    "gernet_l": {
        "stem": 32, "features": 2560,
        "blocks": [("basic", 1, 128, 2, 0, 1.0), ("basic", 2, 192, 2, 0, 1.0),
                   ("bottle", 6, 640, 2, 0, 0.25), ("bottle", 5, 640, 2, 1, 3.0),
                   ("bottle", 4, 640, 1, 1, 3.0)],
    },
}


def gernet_out_channels(name: str) -> Tuple[int, ...]:
    cfg = _GERNET_CFGS[name]
    bl = cfg["blocks"]
    return (3, cfg["stem"], bl[0][2], bl[1][2], bl[2][2], cfg["features"])


def _bn(train: bool, name: str):
    return MPBatchNorm(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=jnp.float32, name=name)


class GERBlock(nn.Module):
    kind: str  # basic | bottle
    channels: int
    stride: int = 1
    dilation: int = 1  # smp make_dilated semantics: stage-uniform rate
    group_size: int = 0
    bottle_ratio: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_c = x.shape[-1]
        c = self.channels
        d = self.dilation
        # ref _utils.replace_strides_with_dilation: all strides -> 1,
        # every 3x3 conv in the stage gets dilation d + padding d
        stride = 1 if d > 1 else self.stride
        if self.kind == "basic":
            h = nn.Conv(c, (3, 3), strides=stride, padding=d,
                        kernel_dilation=(d, d),
                        use_bias=False, dtype=self.dtype, name="conv1")(x)
            h = nn.relu(_bn(train, "bn1")(h))
            h = nn.Conv(c, (3, 3), padding=d, kernel_dilation=(d, d),
                        use_bias=False, dtype=self.dtype, name="conv2")(h)
            h = _bn(train, "bn2")(h)
        else:
            mid = int(round(c * self.bottle_ratio))
            groups = mid // self.group_size if self.group_size else 1
            h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv1")(x)
            h = nn.relu(_bn(train, "bn1")(h))
            h = nn.Conv(mid, (3, 3), strides=stride, padding=d,
                        kernel_dilation=(d, d),
                        feature_group_count=groups, use_bias=False,
                        dtype=self.dtype, name="conv2")(h)
            h = nn.relu(_bn(train, "bn2")(h))
            h = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv3")(h)
            h = _bn(train, "bn3")(h)
        if self.stride != 1 or in_c != c:
            identity = nn.Conv(c, (1, 1), strides=stride, use_bias=False,
                               dtype=self.dtype, name="shortcut_conv")(x)
            identity = _bn(train, "shortcut_bn")(identity)
        else:
            identity = x
        return nn.relu(h + identity)


class GERNetEncoder(nn.Module):
    """smp-contract GERNet encoder (ref timm_gernet.py:14-40)."""

    arch: str = "gernet_s"
    depth: int = 5
    # smp make_dilated over feature stages 3..5; stage 5 covers table
    # stages 3..4 + the final conv (os=16 -> (F,F,T); os=8 -> (F,T,T))
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        cfg = _GERNET_CFGS[self.arch]
        flags = self.replace_stride_with_dilation
        rates = make_dilated_rates(flags)
        features = [x]
        if self.depth >= 1:
            h = nn.Conv(cfg["stem"], (3, 3), strides=2, padding=1,
                        use_bias=False, dtype=self.dtype, name="stem_conv")(x)
            h = nn.relu(_bn(train, "stem_bn")(h))
            features.append(h)
        # table stages 0..2 are smp stages 2..4; stages 3..4 + final conv = 5
        for si, (kind, d, c, s, gs, br) in enumerate(cfg["blocks"][:3]):
            if self.depth < 2 + si:
                return features
            dil = rates[si - 1] if si > 0 and flags[si - 1] else 1
            for b in range(d):
                h = GERBlock(kind, c, stride=s if b == 0 else 1, dilation=dil,
                             group_size=gs,
                             bottle_ratio=br, dtype=self.dtype,
                             name=f"stage{si}_block{b}")(h, train)
            features.append(h)
        if self.depth >= 5:
            dil = rates[2] if flags[2] else 1
            for si, (kind, d, c, s, gs, br) in enumerate(cfg["blocks"][3:],
                                                         start=3):
                for b in range(d):
                    h = GERBlock(kind, c, stride=s if b == 0 else 1,
                                 dilation=dil,
                                 group_size=gs, bottle_ratio=br,
                                 dtype=self.dtype,
                                 name=f"stage{si}_block{b}")(h, train)
            h = nn.Conv(cfg["features"], (1, 1), use_bias=False,
                        dtype=self.dtype, name="final_conv")(h)
            h = nn.relu(_bn(train, "final_bn")(h))
            features.append(h)
        return features
