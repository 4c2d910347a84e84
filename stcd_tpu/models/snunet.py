"""SNUNet-CD (Siamese Nested U-Net) with/without ECAM (NHWC).

Parity targets (ref models/SNUNet.py):
- ConvBlockNested   <- conv_block_nested :8-26 (conv->bn->relu->conv->bn,
                       residual from the FIRST conv's pre-BN output)
- Up                <- up :29-43 (ConvTranspose k2 s2)
- ChannelAttention  <- ChannelAttention :46-59 (avg+max pooled MLP gates)
- SNUNetECAM        <- SNUNet_ECAM :63-152
- SiamNestedUNetConc<- Siam_NestedUNet_Conc :155-243

TPU-first: the Siamese backbone columns (conv{0..4}_0) run once on the
2N-batched concat of (xA, xB); nested nodes operate on the split halves.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.norm import BatchNorm as MPBatchNorm

from stcd_tpu.layers.modules import max_pool


class ConvBlockNested(nn.Module):
    mid_ch: int
    out_ch: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.mid_ch, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="conv1")(x)
        identity = x
        x = MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="conv2")(x)
        x = MPBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn2")(x)
        return nn.relu(x + identity)


class _D2SUp(nn.Module):
    """Exact rewrite of ConvTranspose2d(k=2, s=2) as one matmul +
    depth-to-space interleave: out[b,2i+u,2j+v,o] = x[b,i,j,:] @ K[u,v,o,:]
    + bias — identical parameters (name/shape match nn.ConvTranspose with
    transpose_kernel=True, so checkpoints are interchangeable) and
    bit-matching math (tests/test_golden_zoo-level equality pinned in
    benchmarks/ab_snunet_levers.py). Candidate perf lever: the einsum
    lowers to one MXU matmul instead of XLA's transposed-conv path."""

    ch: int
    in_ch: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, self.ch, self.in_ch), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.ch,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        b, h, w, _ = x.shape
        y = jnp.einsum("bhwc,uvoc->bhwuvo", x, kernel)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, self.ch)
        return y + bias


class Up(nn.Module):
    """ConvTranspose2d(k=2, s=2) exact 2x upsample (ref SNUNet.py:29-43).

    ``mode="d2s"`` selects the mathematically-identical matmul +
    depth-to-space rewrite (_D2SUp) with the same parameter tree."""

    ch: int
    dtype: Optional[Any] = None
    mode: str = "convtranspose"

    @nn.compact
    def __call__(self, x):
        if self.mode == "d2s":
            return _D2SUp(self.ch, x.shape[-1], dtype=self.dtype,
                          name="ConvTranspose_0")(x)
        return nn.ConvTranspose(self.ch, (2, 2), strides=(2, 2),
                                transpose_kernel=True, dtype=self.dtype)(x)


class ChannelAttention(nn.Module):
    """avg- and max-pooled shared MLP -> sigmoid gate (ref SNUNet.py:46-59)."""

    ratio: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = nn.Conv(c // self.ratio, (1, 1), use_bias=False, dtype=self.dtype,
                      name="fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="fc2")
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return jax.nn.sigmoid(out)


class _NestedBody(nn.Module):
    """Shared encoder columns + nested dense skips; returns x0_1..x0_4."""

    n1: int = 32
    dtype: Optional[Any] = None
    up_mode: str = "convtranspose"

    @nn.compact
    def __call__(self, xa, xb, train=False):
        f = [self.n1, self.n1 * 2, self.n1 * 4, self.n1 * 8, self.n1 * 16]
        dt = self.dtype

        def blk(mid, out, name):
            return ConvBlockNested(mid, out, dtype=dt, name=name)

        n = xa.shape[0]
        ab = jnp.concatenate([xa, xb], axis=0)
        # Siamese columns batched 2N (ref runs A then B, :119-133)
        x0_0 = blk(f[0], f[0], "conv0_0")(ab, train)
        x1_0 = blk(f[1], f[1], "conv1_0")(max_pool(x0_0), train)
        x2_0 = blk(f[2], f[2], "conv2_0")(max_pool(x1_0), train)
        x3_0 = blk(f[3], f[3], "conv3_0")(max_pool(x2_0), train)
        x0_0A, x0_0B = x0_0[:n], x0_0[n:]
        x1_0A, x1_0B = x1_0[:n], x1_0[n:]
        x2_0A, x2_0B = x2_0[:n], x2_0[n:]
        x3_0A, x3_0B = x3_0[:n], x3_0[n:]
        # x4_0 only needed for the B branch (ref :123 commented for A)
        x4_0B = blk(f[4], f[4], "conv4_0")(max_pool(x3_0B), train)

        cat = lambda *xs: jnp.concatenate(xs, axis=-1)
        up = lambda ch, name: Up(ch, dtype=dt, mode=self.up_mode, name=name)

        x0_1 = blk(f[0], f[0], "conv0_1")(cat(x0_0A, x0_0B, up(f[1], "Up1_0")(x1_0B)), train)
        x1_1 = blk(f[1], f[1], "conv1_1")(cat(x1_0A, x1_0B, up(f[2], "Up2_0")(x2_0B)), train)
        x0_2 = blk(f[0], f[0], "conv0_2")(cat(x0_0A, x0_0B, x0_1, up(f[1], "Up1_1")(x1_1)), train)

        x2_1 = blk(f[2], f[2], "conv2_1")(cat(x2_0A, x2_0B, up(f[3], "Up3_0")(x3_0B)), train)
        x1_2 = blk(f[1], f[1], "conv1_2")(cat(x1_0A, x1_0B, x1_1, up(f[2], "Up2_1")(x2_1)), train)
        x0_3 = blk(f[0], f[0], "conv0_3")(cat(x0_0A, x0_0B, x0_1, x0_2, up(f[1], "Up1_2")(x1_2)), train)

        x3_1 = blk(f[3], f[3], "conv3_1")(cat(x3_0A, x3_0B, up(f[4], "Up4_0")(x4_0B)), train)
        x2_2 = blk(f[2], f[2], "conv2_2")(cat(x2_0A, x2_0B, x2_1, up(f[3], "Up3_1")(x3_1)), train)
        x1_3 = blk(f[1], f[1], "conv1_3")(cat(x1_0A, x1_0B, x1_1, x1_2, up(f[2], "Up2_2")(x2_2)), train)
        x0_4 = blk(f[0], f[0], "conv0_4")(cat(x0_0A, x0_0B, x0_1, x0_2, x0_3, up(f[1], "Up1_3")(x1_3)), train)
        return x0_1, x0_2, x0_3, x0_4


class SNUNetECAM(nn.Module):
    """SNUNet-CD with the Ensemble Channel Attention head (ref :63-152)."""

    out_ch: int = 1
    n1: int = 32
    dtype: Optional[Any] = None
    up_mode: str = "convtranspose"  # "d2s": exact matmul+interleave Up

    @nn.compact
    def __call__(self, xa, xb, train=False):
        x0_1, x0_2, x0_3, x0_4 = _NestedBody(self.n1, dtype=self.dtype,
                                             up_mode=self.up_mode,
                                             name="body")(xa, xb, train)
        out = jnp.concatenate([x0_1, x0_2, x0_3, x0_4], axis=-1)
        intra = x0_1 + x0_2 + x0_3 + x0_4
        ca1 = ChannelAttention(ratio=16 // 4, dtype=self.dtype, name="ca1")(intra)
        ca = ChannelAttention(ratio=16, dtype=self.dtype, name="ca")(out)
        out = ca * (out + jnp.tile(ca1, (1, 1, 1, 4)))
        return nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_final")(out)


class SiamNestedUNetConc(nn.Module):
    """SNUNet-CD without attention: 4 side heads + 1x1 fuse (ref :155-243)."""

    out_ch: int = 1
    n1: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xa, xb, train=False):
        xs = _NestedBody(self.n1, dtype=self.dtype, name="body")(xa, xb, train)
        outs = [nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name=f"final{i + 1}")(x)
                for i, x in enumerate(xs)]
        return nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                       name="conv_final")(jnp.concatenate(outs, axis=-1))
