"""UNet++ decoder (ref decoders/unetplusplus/decoder.py): nested dense
skip pathways over the encoder pyramid."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.decoders.unet import DecoderBlock


class UnetPlusPlusDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    n_blocks: int = 5
    use_batchnorm: bool = True
    attention_type: Optional[str] = None
    center: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, features, train=False):
        if self.n_blocks != len(self.decoder_channels):
            raise ValueError(
                "Model depth is {}, but you provide `decoder_channels` for {} blocks.".format(
                    self.n_blocks, len(self.decoder_channels)))
        feats = features[1:][::-1]
        depth = len(feats) - 1
        kwargs = dict(use_batchnorm=self.use_batchnorm,
                      attention_type=self.attention_type, dtype=self.dtype)

        # The reference's UnetPlusPlusDecoder CONSTRUCTS a center block for
        # vgg encoders (model.py:86) but its forward never applies it
        # (decoder.py:120-139 — upstream dead code). Matching behavior:
        # `center` is accepted for API parity and deliberately unused.

        out_channels = list(self.decoder_channels)
        skip_channels = [f.shape[-1] for f in feats[1:]] + [0]
        dense_x = {}
        for layer_idx in range(depth):
            for depth_idx in range(depth - layer_idx):
                if layer_idx == 0:
                    out_ch = out_channels[depth_idx] if depth_idx == 0 \
                        else skip_channels[depth_idx]
                    block = DecoderBlock(out_ch, name=f"x_{depth_idx}_{depth_idx}",
                                         **kwargs)
                    dense_x[f"x_{depth_idx}_{depth_idx}"] = block(
                        feats[depth_idx], feats[depth_idx + 1], train)
                else:
                    dense_l_i = depth_idx + layer_idx
                    cat_feats = [dense_x[f"x_{idx}_{dense_l_i}"]
                                 for idx in range(depth_idx + 1, dense_l_i + 1)]
                    cat = jnp.concatenate(cat_feats + [feats[dense_l_i + 1]], -1)
                    out_ch = out_channels[layer_idx] if depth_idx == 0 \
                        else skip_channels[dense_l_i]
                    block = DecoderBlock(out_ch, name=f"x_{depth_idx}_{dense_l_i}",
                                         **kwargs)
                    dense_x[f"x_{depth_idx}_{dense_l_i}"] = block(
                        dense_x[f"x_{depth_idx}_{dense_l_i - 1}"], cat, train)
        final = DecoderBlock(out_channels[-1], name=f"x_0_{depth}", **kwargs)
        return final(dense_x[f"x_0_{depth - 1}"], None, train)
