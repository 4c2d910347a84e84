"""PSPNet decoder (ref decoders/pspnet/decoder.py)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.modules import ConvBNReLU, resize_bilinear


def _adaptive_avg_pool(x, out_size: int):
    """torch.nn.functional.adaptive_avg_pool2d semantics for any input
    size: window i spans [floor(i*H/out), ceil((i+1)*H/out)) — variable
    windows, exact means (shapes are static so the loop unrolls at trace)."""
    n, h, w, c = x.shape
    if h % out_size == 0 and w % out_size == 0:
        return x.reshape(n, out_size, h // out_size, out_size, w // out_size,
                         c).mean(axis=(2, 4))

    def bounds(dim):
        return [(i * dim // out_size, -(-(i + 1) * dim // out_size))
                for i in range(out_size)]

    rows = []
    for y0, y1 in bounds(h):
        cols = []
        for x0, x1 in bounds(w):
            cols.append(x[:, y0:y1, x0:x1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (n, out, out, c)


class PSPDecoder(nn.Module):
    sizes: Sequence[int] = (1, 2, 3, 6)
    out_channels: int = 512
    use_batchnorm: bool = True
    dropout: float = 0.2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features, train=False):
        x = features[-1]
        c = x.shape[-1]
        branches = []
        for i, size in enumerate(self.sizes):
            h = _adaptive_avg_pool(x, size)
            # pool_size==1 disables BN (ref pspnet/decoder.py:12-13)
            h = ConvBNReLU(c // len(self.sizes), 1,
                           use_batchnorm=self.use_batchnorm and size != 1,
                           dtype=self.dtype, name=f"psp{i}")(h, train)
            branches.append(resize_bilinear(h, x.shape[1:3], align_corners=True))
        x = jnp.concatenate(branches + [x], axis=-1)
        x = ConvBNReLU(self.out_channels, 1, use_batchnorm=self.use_batchnorm,
                       dtype=self.dtype, name="conv")(x, train)
        return nn.Dropout(self.dropout, deterministic=not train,
                          broadcast_dims=(1, 2))(x)
