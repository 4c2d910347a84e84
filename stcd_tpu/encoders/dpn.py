"""DPN encoders (ref encoders/dpn.py, Cadene pretrainedmodels DPN).

Dual-path block: a residual path of fixed width ``bw`` plus a dense path
growing by ``inc`` per block; every conv is pre-activated (BN+ReLU+conv,
Cadene BnActConv2d). Stage outputs are ``relu(cat(res, dense))``
(ref dpn.py:60-66). The last stage ends with cat+BN+ReLU (CatBnAct).

Per-variant config from the reference table (ref dpn.py:75-166):
(num_init_features, k_r, groups, k_sec, inc_sec, small, b).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.layers.modules import max_pool
from stcd_tpu.encoders.dilation import make_dilated_rates

Dtype = Any

# name: (init, k_r, groups, k_sec, inc_sec, small, b)
_DPN_CFGS = {
    "dpn68": (10, 128, 32, (3, 4, 12, 3), (16, 32, 32, 64), True, False),
    "dpn68b": (10, 128, 32, (3, 4, 12, 3), (16, 32, 32, 64), True, True),
    "dpn92": (64, 96, 32, (3, 4, 20, 3), (16, 32, 24, 128), False, False),
    "dpn98": (96, 160, 40, (3, 6, 20, 3), (16, 32, 32, 128), False, False),
    "dpn107": (128, 200, 50, (4, 8, 20, 3), (20, 64, 64, 128), False, False),
    "dpn131": (128, 160, 40, (4, 8, 28, 3), (16, 32, 32, 128), False, False),
}


def dpn_out_channels(name: str) -> Tuple[int, ...]:
    init, k_r, groups, k_sec, inc_sec, small, b = _DPN_CFGS[name]
    bwf = 1 if small else 4
    chans = [3, init]
    for i in range(4):
        bw = 64 * (2 ** i) * bwf
        chans.append(bw + (2 + k_sec[i]) * inc_sec[i])
    return tuple(chans)


def _bn_act(x, train: bool, name: str):
    h = MPBatchNorm(use_running_average=not train, momentum=0.9,
                    epsilon=1e-3, dtype=jnp.float32, name=name)(x)
    return nn.relu(h)


class DualPathBlock(nn.Module):
    """Cadene DualPathBlock; returns (residual, dense) tuple."""

    num_1x1_a: int
    num_3x3_b: int
    num_1x1_c: int
    inc: int
    groups: int
    block_type: str = "normal"  # proj | down | normal
    b: bool = False
    dilation: int = 1  # smp make_dilated semantics: stage-uniform rate
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (tuple, list)):
            x_in = jnp.concatenate(x, -1)
        else:
            x_in = x
        d = self.dilation
        # ref _utils.replace_strides_with_dilation: all strides -> 1
        stride = 1 if d > 1 else (2 if self.block_type == "down" else 1)
        if self.block_type in ("proj", "down"):
            w = _bn_act(x_in, train, "c1x1_w_bn")
            w = nn.Conv(self.num_1x1_c + 2 * self.inc, (1, 1), strides=stride,
                        use_bias=False, dtype=self.dtype, name="c1x1_w")(w)
            s1, s2 = w[..., : self.num_1x1_c], w[..., self.num_1x1_c:]
        else:
            s1, s2 = x[0], x[1]
        h = _bn_act(x_in, train, "c1x1_a_bn")
        h = nn.Conv(self.num_1x1_a, (1, 1), use_bias=False, dtype=self.dtype,
                    name="c1x1_a")(h)
        h = _bn_act(h, train, "c3x3_b_bn")
        h = nn.Conv(self.num_3x3_b, (3, 3), strides=stride, padding=d,
                    kernel_dilation=(d, d),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="c3x3_b")(h)
        h = _bn_act(h, train, "c1x1_c_bn")
        if self.b:  # dpn68b/dpn92b: two separate output convs
            out1 = nn.Conv(self.num_1x1_c, (1, 1), use_bias=False,
                           dtype=self.dtype, name="c1x1_c1")(h)
            out2 = nn.Conv(self.inc, (1, 1), use_bias=False,
                           dtype=self.dtype, name="c1x1_c2")(h)
        else:
            c = nn.Conv(self.num_1x1_c + self.inc, (1, 1), use_bias=False,
                        dtype=self.dtype, name="c1x1_c")(h)
            out1, out2 = c[..., : self.num_1x1_c], c[..., self.num_1x1_c:]
        return s1 + out1, jnp.concatenate([s2, out2], -1)


class DPNEncoder(nn.Module):
    """smp-contract DPN encoder (ref dpn.py:36-67).

    [x, stem conv (/2), pool+conv2 (/4), conv3 (/8), conv4 (/16),
     conv5+CatBnAct (/32)]; tuple stage outputs are relu(cat(...)).
    """

    arch: str = "dpn68"
    depth: int = 5
    # smp make_dilated over stages conv3..conv5 (os=16 -> (F,F,T);
    # os=8 -> (F,T,T)); conv2 always keeps its pool stride
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        init, k_r, groups, k_sec, inc_sec, small, b = _DPN_CFGS[self.arch]
        bwf = 1 if small else 4
        flags = self.replace_stride_with_dilation
        rates = make_dilated_rates(flags)
        features = [x]
        if self.depth >= 1:
            k = 3 if small else 7
            h = nn.Conv(init, (k, k), strides=2, padding=k // 2, use_bias=False,
                        dtype=self.dtype, name="stem_conv")(x)
            h = _bn_act(h, train, "stem_bn")
            features.append(h)
        for i in range(4):
            if self.depth < 2 + i:
                break
            if i == 0:
                h = max_pool(h, window=3, stride=2, padding=1)
            bw = 64 * (2 ** i) * bwf
            r = (k_r * bw) // (64 * bwf)
            inc = inc_sec[i]
            dil = rates[i - 1] if i > 0 and flags[i - 1] else 1
            h = DualPathBlock(r, r, bw, inc, groups,
                              block_type="proj" if i == 0 else "down", b=b,
                              dilation=dil,
                              dtype=self.dtype, name=f"conv{i + 2}_1")(h, train)
            for j in range(1, k_sec[i]):
                h = DualPathBlock(r, r, bw, inc, groups, block_type="normal",
                                  b=b, dilation=dil, dtype=self.dtype,
                                  name=f"conv{i + 2}_{j + 1}")(h, train)
            out = jnp.concatenate(h, -1)
            if i == 3:  # final CatBnAct
                out = _bn_act(out, train, "final_bn")
                features.append(out)
            else:
                features.append(nn.relu(out))
        return features
