"""DSIFN — Deeply Supervised Image Fusion Network (NHWC).

Parity targets (ref models/DSIFN.py):
- vgg16_base        :9-21   -> stcd_tpu.encoders.vgg.VGG16Features
                              (taps {3,8,15,22,29}; the reference calls
                              .eval() on the base but that is a no-op for
                              VGG features (no BN/dropout) and it never
                              sets requires_grad=False — the base IS
                              trained, so its params are trainable here)
- ChannelAttention  :24-36  (avg+max pooled conv MLP, ratio 8)
- SpatialAttention  :40-52  (mean/max channel stats -> 7x7 conv -> sigmoid)
- conv2d_bn         :55-61  (Conv -> PReLU -> BN -> Dropout 0.6)
- DSIFN             :64-188 (5 cascaded decode branches over concatenated
                              bi-temporal taps; live code returns only the
                              final full-res logits)

TPU-first: the two VGG streams share one module instance (the reference
passes the same base twice, networks.py:165-167) and run 2N-batched.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.encoders.vgg import VGG16Features


def _bn(train, dtype, name):
    return MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=jnp.float32, name=name)


class ChannelAttention(nn.Module):
    ratio: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = nn.Conv(c // self.ratio, (1, 1), use_bias=False, dtype=self.dtype, name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        return jax.nn.sigmoid(fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx))))


class SpatialAttention(nn.Module):
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        h = jnp.concatenate([avg, mx], axis=-1)
        h = nn.Conv(1, (7, 7), padding=[(3, 3)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        return jax.nn.sigmoid(h)


class Conv2dBN(nn.Module):
    """Conv -> PReLU -> BN -> Dropout(0.6) (ref :55-61)."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="conv")(x)
        alpha = self.param("prelu", nn.initializers.constant(0.25), (1,))
        # keep the compute dtype: fp32 alpha would promote bf16 activations
        x = jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
        x = _bn(train, self.dtype, "bn")(x)
        return nn.Dropout(0.6, deterministic=not train, name="do")(x)


class _UpT(nn.Module):
    """ConvTranspose2d(k=2, s=2)."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                transpose_kernel=True, dtype=self.dtype)(x)


class DSIFN(nn.Module):
    """ref models/DSIFN.py:64-188. Returns final change logits (N,H,W,1)."""

    dtype: Optional[Any] = None
    return_aux: bool = False  # also return the 4 deep-supervision sigmoids

    @nn.compact
    def __call__(self, t1, t2, train=False):
        n = t1.shape[0]
        base = VGG16Features(dtype=self.dtype, name="base")
        taps = base(jnp.concatenate([t1, t2], axis=0))
        t1f = [t[:n] for t in taps]
        t2f = [t[n:] for t in taps]
        dt = self.dtype
        aux = []

        # branch 1 (1/16 res)
        x = jnp.concatenate([t1f[4], t2f[4]], axis=-1)
        x = Conv2dBN(512, dtype=dt, name="o1_conv1")(x, train)
        x = Conv2dBN(512, dtype=dt, name="o1_conv2")(x, train)
        x = SpatialAttention(dtype=dt, name="sa1")(x) * x
        x = _bn(train, dt, "bn_sa1")(x)
        aux.append(jax.nn.sigmoid(nn.Conv(1, (1, 1), dtype=dt, name="o1_conv3")(x)))
        x = _UpT(512, dtype=dt, name="trans_conv1")(x)

        # branch 2
        x = jnp.concatenate([x, t1f[3], t2f[3]], axis=-1)
        x = ChannelAttention(dtype=dt, name="ca2")(x) * x
        x = Conv2dBN(512, dtype=dt, name="o2_conv1")(x, train)
        x = Conv2dBN(256, dtype=dt, name="o2_conv2")(x, train)
        x = Conv2dBN(256, dtype=dt, name="o2_conv3")(x, train)
        x = SpatialAttention(dtype=dt, name="sa2")(x) * x
        x = _bn(train, dt, "bn_sa2")(x)
        aux.append(jax.nn.sigmoid(nn.Conv(1, (1, 1), dtype=dt, name="o2_conv4")(x)))
        x = _UpT(256, dtype=dt, name="trans_conv2")(x)

        # branch 3
        x = jnp.concatenate([x, t1f[2], t2f[2]], axis=-1)
        x = ChannelAttention(dtype=dt, name="ca3")(x) * x
        x = Conv2dBN(256, dtype=dt, name="o3_conv1")(x, train)
        x = Conv2dBN(128, dtype=dt, name="o3_conv2")(x, train)
        x = Conv2dBN(128, dtype=dt, name="o3_conv3")(x, train)
        x = SpatialAttention(dtype=dt, name="sa3")(x) * x
        x = _bn(train, dt, "bn_sa3")(x)
        aux.append(jax.nn.sigmoid(nn.Conv(1, (1, 1), dtype=dt, name="o3_conv4")(x)))
        x = _UpT(128, dtype=dt, name="trans_conv3")(x)

        # branch 4
        x = jnp.concatenate([x, t1f[1], t2f[1]], axis=-1)
        x = ChannelAttention(dtype=dt, name="ca4")(x) * x
        x = Conv2dBN(128, dtype=dt, name="o4_conv1")(x, train)
        x = Conv2dBN(64, dtype=dt, name="o4_conv2")(x, train)
        x = Conv2dBN(64, dtype=dt, name="o4_conv3")(x, train)
        x = SpatialAttention(dtype=dt, name="sa4")(x) * x
        x = _bn(train, dt, "bn_sa4")(x)
        aux.append(jax.nn.sigmoid(nn.Conv(1, (1, 1), dtype=dt, name="o4_conv4")(x)))
        x = _UpT(64, dtype=dt, name="trans_conv4")(x)

        # branch 5 (full res)
        x = jnp.concatenate([x, t1f[0], t2f[0]], axis=-1)
        x = ChannelAttention(dtype=dt, name="ca5")(x) * x
        x = Conv2dBN(64, dtype=dt, name="o5_conv1")(x, train)
        x = Conv2dBN(32, dtype=dt, name="o5_conv2")(x, train)
        x = Conv2dBN(16, dtype=dt, name="o5_conv3")(x, train)
        x = SpatialAttention(dtype=dt, name="sa5")(x) * x
        x = _bn(train, dt, "bn_sa5")(x)
        out = nn.Conv(1, (1, 1), dtype=dt, name="o5_conv4")(x)
        if self.return_aux:
            return out, aux
        return out
