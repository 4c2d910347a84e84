"""PSPNet decoder (ref decoders/pspnet/decoder.py)."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.layers.modules import ConvBNReLU, resize_bilinear


def _adaptive_avg_pool(x, out_size: int):
    n, h, w, c = x.shape
    # torch adaptive pooling with h % out == 0 reduces to uniform windows
    assert h % out_size == 0 and w % out_size == 0, "size must divide evenly"
    return x.reshape(n, out_size, h // out_size, out_size, w // out_size, c
                     ).mean(axis=(2, 4))


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
            h = _adaptive_avg_pool(x, size) if x.shape[1] % size == 0 else \
                jax.image.resize(x, (x.shape[0], size, size, c), "linear")
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
