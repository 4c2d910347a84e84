"""DTCDSCN — Dual-Task Constrained Deep Siamese CNN (NHWC).

Parity targets (ref models/DTCDSCN.py):
- SELayer       :11-26   (GAP -> Linear MLP -> sigmoid gate)
- Dblock        :52-74   (cascaded dilated 3x3 convs d=1,2,4,8, summed)
- SEBasicBlock  :79-113  (resnet basic block + SE before residual add)
- SCSEBlock     :144-173 (1x1-conv channel excitation + spatial SE, summed)
- DecoderBlock  :112-141 (1x1 reduce -> +SCSE -> ConvTranspose 2x -> 1x1)
- CDNet_model   :176-313 (SE-ResNet34 Siamese encoder; the dual decoders
  are commented out in the live reference, leaving the CD-only path:
  Dblock(e4_x - e4_y), decoder adds signed stage diffs, final deconv head)
- CDNet34       :316-320

TPU-first: Siamese encoder runs once on the 2N-batched pair.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.layers.modules import max_pool

Dtype = Any


def _bn(train, dtype, name):
    return MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class SELayer(nn.Module):
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return x * jax.nn.sigmoid(y)[:, None, None, :]


class Dblock(nn.Module):
    """Dilated-stack center block (ref :52-74): x + sum of cascaded
    d=1,2,4,8 conv outputs."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        outs = []
        h = x
        for i, d in enumerate((1, 2, 4, 8)):
            h = nn.relu(nn.Conv(c, (3, 3), padding=[(d, d)] * 2,
                                kernel_dilation=(d, d), dtype=self.dtype,
                                name=f"dilate{i + 1}")(h))
            outs.append(h)
        return x + sum(outs)


class SEBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = _bn(train, self.dtype, "bn2")(out)
        out = SELayer(self.reduction, dtype=self.dtype, name="se")(out)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            residual = _bn(train, self.dtype, "down_bn")(residual)
        return nn.relu(out + residual)


class SCSEBlock(nn.Module):
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        chn = jnp.mean(x, axis=(1, 2), keepdims=True)
        chn = nn.Conv(c // self.reduction, (1, 1), use_bias=False, dtype=self.dtype,
                      name="ce1")(chn)
        chn = nn.relu(chn)
        chn = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="ce2")(chn)
        chn_se = x * jax.nn.sigmoid(chn)
        spa = jax.nn.sigmoid(nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                                     name="se")(x))
        return chn_se + x * spa


class DecoderBlock(nn.Module):
    n_filters: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        c4 = x.shape[-1] // 4
        x = nn.Conv(c4, (1, 1), dtype=self.dtype, name="conv1")(x)
        x = _bn(train, self.dtype, "norm1")(x)
        x = nn.relu(x)
        x = x + SCSEBlock(dtype=self.dtype, name="scse")(x)
        # ConvTranspose(k3, s2, p1, op1): exact 2x (lax padding (1,2))
        x = nn.ConvTranspose(c4, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), transpose_kernel=True,
                             dtype=self.dtype, name="deconv2")(x)
        x = _bn(train, self.dtype, "norm2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.n_filters, (1, 1), dtype=self.dtype, name="conv3")(x)
        x = _bn(train, self.dtype, "norm3")(x)
        return nn.relu(x)


class _SEResNetLayer(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        down = self.stride != 1 or x.shape[-1] != self.planes
        x = SEBasicBlock(self.planes, self.stride, downsample=down,
                         dtype=self.dtype, name="block0")(x, train)
        for i in range(1, self.blocks):
            x = SEBasicBlock(self.planes, dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class CDNetModel(nn.Module):
    """The live CD-only DTCDSCN path (ref :176-313)."""

    num_classes: int = 2
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, y, train=False):
        n = x.shape[0]
        h = jnp.concatenate([x, y], axis=0)
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="firstconv")(h)
        h = _bn(train, self.dtype, "firstbn")(h)
        h = nn.relu(h)
        h = max_pool(h, 3, 2, 1)
        e1 = _SEResNetLayer(64, self.layers[0], dtype=self.dtype, name="encoder1")(h, train)
        e2 = _SEResNetLayer(128, self.layers[1], 2, dtype=self.dtype, name="encoder2")(e1, train)
        e3 = _SEResNetLayer(256, self.layers[2], 2, dtype=self.dtype, name="encoder3")(e2, train)
        e4 = _SEResNetLayer(512, self.layers[3], 2, dtype=self.dtype, name="encoder4")(e3, train)
        e1_x, e1_y = e1[:n], e1[n:]
        e2_x, e2_y = e2[:n], e2[n:]
        e3_x, e3_y = e3[:n], e3[n:]
        e4_x, e4_y = e4[:n], e4[n:]

        c = Dblock(dtype=self.dtype, name="dblock_master")(e4_x - e4_y)
        d4 = DecoderBlock(256, dtype=self.dtype, name="decoder4_master")(c, train) + e3_x - e3_y
        d3 = DecoderBlock(128, dtype=self.dtype, name="decoder3_master")(d4, train) + e2_x - e2_y
        d2 = DecoderBlock(64, dtype=self.dtype, name="decoder2_master")(d3, train) + e1_x - e1_y
        d1 = DecoderBlock(64, dtype=self.dtype, name="decoder1_master")(d2, train)

        # final head: ConvTranspose(k4, s2, p1) exact 2x -> (2,2) lax padding
        out = nn.ConvTranspose(32, (4, 4), strides=(2, 2), padding=((2, 2), (2, 2)),
                               transpose_kernel=True, dtype=self.dtype,
                               name="finaldeconv1_master")(d1)
        out = nn.relu(out)
        out = nn.Conv(32, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                      name="finalconv2_master")(out)
        out = nn.relu(out)
        return nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name="finalconv3_master")(out)


def CDNet34(num_classes: int = 2, dtype=None) -> CDNetModel:
    """ref :316-320 (SEBasicBlock, layers [3,4,6,3])."""
    return CDNetModel(num_classes=num_classes, layers=(3, 4, 6, 3), dtype=dtype)
