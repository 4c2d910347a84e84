"""InceptionV4 and InceptionResNetV2 encoders (ref encoders/inceptionv4.py,
encoders/inceptionresnetv2.py, Cadene pretrainedmodels).

Stage splits match the reference:
- V4 (ref inceptionv4.py:57-65, stage_idxs (3, 5, 9, 15)): stem convs
  (64 /2), Mixed_3a+4a (192 /4), Mixed_5a + 3xInceptionA (384 /8),
  A+ReductionA+4xB (1024 /16; features[9:15]), 3xB+ReductionB+3xC
  (1536 /32).
- ResNetV2 (ref inceptionresnetv2.py:58-66): conv1a-2b (64 /2),
  pool+conv3b+4a (192 /4), pool+Mixed5b+10xBlock35 (320 /8),
  Mixed6a+20xBlock17 (1088 /16), Mixed7a+9xBlock8+Block8+conv7b (1536 /32).

Padding parity: the smp reference PATCHES Cadene's valid-padding 3x3
convs and maxpools to padding=(1,1) in the encoder __init__ ("correct
paddings", ref inceptionv4.py:42-47 / inceptionresnetv2.py:41-47); our
symmetric k//2 padding on every conv/pool reproduces that exactly (NOT a
deviation; TF-SAME would misalign the stride-2 kernels).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm
from stcd_tpu.layers.modules import max_pool

Dtype = Any


def inceptionv4_out_channels() -> Tuple[int, ...]:
    return (3, 64, 192, 384, 1024, 1536)


def inceptionresnetv2_out_channels() -> Tuple[int, ...]:
    return (3, 64, 192, 320, 1088, 1536)


class BasicConv(nn.Module):
    """Cadene BasicConv2d: conv(bias=False) + BN(eps 1e-3) + ReLU."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # symmetric k//2 padding (torch-style): identical to SAME for the
        # stride-1 odd kernels; for the stride-2 reductions it keeps the
        # kernel alignment converted torch weights were trained with
        # (TF-SAME would pad (0,1) instead of (1,1)).
        pad = [(k // 2, k // 2) for k in self.kernel]
        h = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        h = MPBatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, dtype=jnp.float32, name="bn")(h)
        return nn.relu(h)


def _avgpool3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 avg pool, count_include_pad=False (Cadene default)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                              ((0, 0), (1, 1), (1, 1), (0, 0)))
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / n


class InceptionV4Encoder(nn.Module):
    """smp-contract InceptionV4 encoder."""

    depth: int = 5
    dtype: Optional[Dtype] = None

    def _mixed_a(self, h, train, name):
        b0 = BasicConv(96, (1, 1), dtype=self.dtype, name=f"{name}_b0")(h, train)
        b1 = BasicConv(64, (1, 1), dtype=self.dtype, name=f"{name}_b1_0")(h, train)
        b1 = BasicConv(96, (3, 3), dtype=self.dtype, name=f"{name}_b1_1")(b1, train)
        b2 = BasicConv(64, (1, 1), dtype=self.dtype, name=f"{name}_b2_0")(h, train)
        b2 = BasicConv(96, (3, 3), dtype=self.dtype, name=f"{name}_b2_1")(b2, train)
        b2 = BasicConv(96, (3, 3), dtype=self.dtype, name=f"{name}_b2_2")(b2, train)
        b3 = BasicConv(96, (1, 1), dtype=self.dtype, name=f"{name}_b3")(
            _avgpool3(h), train)
        return jnp.concatenate([b0, b1, b2, b3], -1)

    def _mixed_b(self, h, train, name):
        b0 = BasicConv(384, (1, 1), dtype=self.dtype, name=f"{name}_b0")(h, train)
        b1 = BasicConv(192, (1, 1), dtype=self.dtype, name=f"{name}_b1_0")(h, train)
        b1 = BasicConv(224, (1, 7), dtype=self.dtype, name=f"{name}_b1_1")(b1, train)
        b1 = BasicConv(256, (7, 1), dtype=self.dtype, name=f"{name}_b1_2")(b1, train)
        b2 = BasicConv(192, (1, 1), dtype=self.dtype, name=f"{name}_b2_0")(h, train)
        b2 = BasicConv(192, (7, 1), dtype=self.dtype, name=f"{name}_b2_1")(b2, train)
        b2 = BasicConv(224, (1, 7), dtype=self.dtype, name=f"{name}_b2_2")(b2, train)
        b2 = BasicConv(224, (7, 1), dtype=self.dtype, name=f"{name}_b2_3")(b2, train)
        b2 = BasicConv(256, (1, 7), dtype=self.dtype, name=f"{name}_b2_4")(b2, train)
        b3 = BasicConv(128, (1, 1), dtype=self.dtype, name=f"{name}_b3")(
            _avgpool3(h), train)
        return jnp.concatenate([b0, b1, b2, b3], -1)

    def _mixed_c(self, h, train, name):
        b0 = BasicConv(256, (1, 1), dtype=self.dtype, name=f"{name}_b0")(h, train)
        b1 = BasicConv(384, (1, 1), dtype=self.dtype, name=f"{name}_b1_0")(h, train)
        b1a = BasicConv(256, (1, 3), dtype=self.dtype, name=f"{name}_b1_1a")(b1, train)
        b1b = BasicConv(256, (3, 1), dtype=self.dtype, name=f"{name}_b1_1b")(b1, train)
        b2 = BasicConv(384, (1, 1), dtype=self.dtype, name=f"{name}_b2_0")(h, train)
        b2 = BasicConv(448, (3, 1), dtype=self.dtype, name=f"{name}_b2_1")(b2, train)
        b2 = BasicConv(512, (1, 3), dtype=self.dtype, name=f"{name}_b2_2")(b2, train)
        b2a = BasicConv(256, (1, 3), dtype=self.dtype, name=f"{name}_b2_3a")(b2, train)
        b2b = BasicConv(256, (3, 1), dtype=self.dtype, name=f"{name}_b2_3b")(b2, train)
        b3 = BasicConv(256, (1, 1), dtype=self.dtype, name=f"{name}_b3")(
            _avgpool3(h), train)
        return jnp.concatenate([b0, b1a, b1b, b2a, b2b, b3], -1)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        features = [x]
        if self.depth >= 1:  # features[0:3]
            h = BasicConv(32, stride=2, dtype=self.dtype, name="conv1")(x, train)
            h = BasicConv(32, dtype=self.dtype, name="conv2")(h, train)
            h = BasicConv(64, dtype=self.dtype, name="conv3")(h, train)
            features.append(h)
        if self.depth >= 2:  # Mixed_3a + Mixed_4a
            p = max_pool(h, window=3, stride=2, padding=1)
            c = BasicConv(96, stride=2, dtype=self.dtype, name="mixed3a_conv")(h, train)
            h = jnp.concatenate([p, c], -1)  # 160
            b0 = BasicConv(64, (1, 1), dtype=self.dtype, name="mixed4a_b0_0")(h, train)
            b0 = BasicConv(96, (3, 3), dtype=self.dtype, name="mixed4a_b0_1")(b0, train)
            b1 = BasicConv(64, (1, 1), dtype=self.dtype, name="mixed4a_b1_0")(h, train)
            b1 = BasicConv(64, (1, 7), dtype=self.dtype, name="mixed4a_b1_1")(b1, train)
            b1 = BasicConv(64, (7, 1), dtype=self.dtype, name="mixed4a_b1_2")(b1, train)
            b1 = BasicConv(96, (3, 3), dtype=self.dtype, name="mixed4a_b1_3")(b1, train)
            h = jnp.concatenate([b0, b1], -1)  # 192
            features.append(h)
        if self.depth >= 3:  # Mixed_5a + 3x InceptionA
            c = BasicConv(192, stride=2, dtype=self.dtype, name="mixed5a_conv")(h, train)
            p = max_pool(h, window=3, stride=2, padding=1)
            h = jnp.concatenate([c, p], -1)  # 384
            for i in range(3):
                h = self._mixed_a(h, train, f"inceptionA{i}")
            features.append(h)
        if self.depth >= 4:  # InceptionA + ReductionA + 4x InceptionB
            h = self._mixed_a(h, train, "inceptionA3")
            b0 = BasicConv(384, stride=2, dtype=self.dtype, name="redA_b0")(h, train)
            b1 = BasicConv(192, (1, 1), dtype=self.dtype, name="redA_b1_0")(h, train)
            b1 = BasicConv(224, (3, 3), dtype=self.dtype, name="redA_b1_1")(b1, train)
            b1 = BasicConv(256, stride=2, dtype=self.dtype, name="redA_b1_2")(b1, train)
            p = max_pool(h, window=3, stride=2, padding=1)
            h = jnp.concatenate([b0, b1, p], -1)  # 1024
            for i in range(4):
                h = self._mixed_b(h, train, f"inceptionB{i}")
            features.append(h)
        if self.depth >= 5:  # 3x InceptionB + ReductionB + 3x InceptionC
            for i in range(4, 7):
                h = self._mixed_b(h, train, f"inceptionB{i}")
            b0 = BasicConv(192, (1, 1), dtype=self.dtype, name="redB_b0_0")(h, train)
            b0 = BasicConv(192, stride=2, dtype=self.dtype, name="redB_b0_1")(b0, train)
            b1 = BasicConv(256, (1, 1), dtype=self.dtype, name="redB_b1_0")(h, train)
            b1 = BasicConv(256, (1, 7), dtype=self.dtype, name="redB_b1_1")(b1, train)
            b1 = BasicConv(320, (7, 1), dtype=self.dtype, name="redB_b1_2")(b1, train)
            b1 = BasicConv(320, stride=2, dtype=self.dtype, name="redB_b1_3")(b1, train)
            p = max_pool(h, window=3, stride=2, padding=1)
            h = jnp.concatenate([b0, b1, p], -1)  # 1536
            for i in range(3):
                h = self._mixed_c(h, train, f"inceptionC{i}")
            features.append(h)
        return features


class InceptionResNetV2Encoder(nn.Module):
    """smp-contract InceptionResNetV2 encoder."""

    depth: int = 5
    dtype: Optional[Dtype] = None

    def _block35(self, h, train, name, scale=0.17):
        b0 = BasicConv(32, (1, 1), dtype=self.dtype, name=f"{name}_b0")(h, train)
        b1 = BasicConv(32, (1, 1), dtype=self.dtype, name=f"{name}_b1_0")(h, train)
        b1 = BasicConv(32, (3, 3), dtype=self.dtype, name=f"{name}_b1_1")(b1, train)
        b2 = BasicConv(32, (1, 1), dtype=self.dtype, name=f"{name}_b2_0")(h, train)
        b2 = BasicConv(48, (3, 3), dtype=self.dtype, name=f"{name}_b2_1")(b2, train)
        b2 = BasicConv(64, (3, 3), dtype=self.dtype, name=f"{name}_b2_2")(b2, train)
        up = nn.Conv(320, (1, 1), dtype=self.dtype, name=f"{name}_up")(
            jnp.concatenate([b0, b1, b2], -1))
        return nn.relu(h + scale * up)

    def _block17(self, h, train, name, scale=0.10):
        b0 = BasicConv(192, (1, 1), dtype=self.dtype, name=f"{name}_b0")(h, train)
        b1 = BasicConv(128, (1, 1), dtype=self.dtype, name=f"{name}_b1_0")(h, train)
        b1 = BasicConv(160, (1, 7), dtype=self.dtype, name=f"{name}_b1_1")(b1, train)
        b1 = BasicConv(192, (7, 1), dtype=self.dtype, name=f"{name}_b1_2")(b1, train)
        up = nn.Conv(1088, (1, 1), dtype=self.dtype, name=f"{name}_up")(
            jnp.concatenate([b0, b1], -1))
        return nn.relu(h + scale * up)

    def _block8(self, h, train, name, scale=0.20, relu=True):
        b0 = BasicConv(192, (1, 1), dtype=self.dtype, name=f"{name}_b0")(h, train)
        b1 = BasicConv(192, (1, 1), dtype=self.dtype, name=f"{name}_b1_0")(h, train)
        b1 = BasicConv(224, (1, 3), dtype=self.dtype, name=f"{name}_b1_1")(b1, train)
        b1 = BasicConv(256, (3, 1), dtype=self.dtype, name=f"{name}_b1_2")(b1, train)
        up = nn.Conv(2080, (1, 1), dtype=self.dtype, name=f"{name}_up")(
            jnp.concatenate([b0, b1], -1))
        out = h + scale * up
        return nn.relu(out) if relu else out

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        features = [x]
        if self.depth >= 1:  # conv1a, 2a, 2b
            h = BasicConv(32, stride=2, dtype=self.dtype, name="conv1a")(x, train)
            h = BasicConv(32, dtype=self.dtype, name="conv2a")(h, train)
            h = BasicConv(64, dtype=self.dtype, name="conv2b")(h, train)
            features.append(h)
        if self.depth >= 2:  # pool + conv3b + conv4a
            h = max_pool(h, window=3, stride=2, padding=1)
            h = BasicConv(80, (1, 1), dtype=self.dtype, name="conv3b")(h, train)
            h = BasicConv(192, dtype=self.dtype, name="conv4a")(h, train)
            features.append(h)
        if self.depth >= 3:  # pool + Mixed_5b + 10x Block35
            h = max_pool(h, window=3, stride=2, padding=1)
            b0 = BasicConv(96, (1, 1), dtype=self.dtype, name="m5b_b0")(h, train)
            b1 = BasicConv(48, (1, 1), dtype=self.dtype, name="m5b_b1_0")(h, train)
            b1 = BasicConv(64, (5, 5), dtype=self.dtype, name="m5b_b1_1")(b1, train)
            b2 = BasicConv(64, (1, 1), dtype=self.dtype, name="m5b_b2_0")(h, train)
            b2 = BasicConv(96, (3, 3), dtype=self.dtype, name="m5b_b2_1")(b2, train)
            b2 = BasicConv(96, (3, 3), dtype=self.dtype, name="m5b_b2_2")(b2, train)
            b3 = BasicConv(64, (1, 1), dtype=self.dtype, name="m5b_b3")(
                _avgpool3(h), train)
            h = jnp.concatenate([b0, b1, b2, b3], -1)  # 320
            for i in range(10):
                h = self._block35(h, train, f"block35_{i}")
            features.append(h)
        if self.depth >= 4:  # Mixed_6a + 20x Block17
            b0 = BasicConv(384, stride=2, dtype=self.dtype, name="m6a_b0")(h, train)
            b1 = BasicConv(256, (1, 1), dtype=self.dtype, name="m6a_b1_0")(h, train)
            b1 = BasicConv(256, (3, 3), dtype=self.dtype, name="m6a_b1_1")(b1, train)
            b1 = BasicConv(384, stride=2, dtype=self.dtype, name="m6a_b1_2")(b1, train)
            p = max_pool(h, window=3, stride=2, padding=1)
            h = jnp.concatenate([b0, b1, p], -1)  # 1088
            for i in range(20):
                h = self._block17(h, train, f"block17_{i}")
            features.append(h)
        if self.depth >= 5:  # Mixed_7a + 9x Block8 + Block8(no relu) + conv7b
            b0 = BasicConv(256, (1, 1), dtype=self.dtype, name="m7a_b0_0")(h, train)
            b0 = BasicConv(384, stride=2, dtype=self.dtype, name="m7a_b0_1")(b0, train)
            b1 = BasicConv(256, (1, 1), dtype=self.dtype, name="m7a_b1_0")(h, train)
            b1 = BasicConv(288, stride=2, dtype=self.dtype, name="m7a_b1_1")(b1, train)
            b2 = BasicConv(256, (1, 1), dtype=self.dtype, name="m7a_b2_0")(h, train)
            b2 = BasicConv(288, (3, 3), dtype=self.dtype, name="m7a_b2_1")(b2, train)
            b2 = BasicConv(320, stride=2, dtype=self.dtype, name="m7a_b2_2")(b2, train)
            p = max_pool(h, window=3, stride=2, padding=1)
            h = jnp.concatenate([b0, b1, b2, p], -1)  # 2080
            for i in range(9):
                h = self._block8(h, train, f"block8_{i}")
            h = self._block8(h, train, "block8_final", scale=1.0, relu=False)
            h = BasicConv(1536, (1, 1), dtype=self.dtype, name="conv7b")(h, train)
            features.append(h)
        return features
