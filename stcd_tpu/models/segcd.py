"""The STCD model family (NHWC, TPU-native).

Parity targets in segmentation_models_pytorch/decoders/unet/model.py:
- Unet      :18-106   (standard smp Unet)
- UnetSeg   :109-171  (plain encoder-decoder-head; train_sup.py:303)
- CDNet     :174-251  (per-scale abs-diff + SE attention head)
- SegCD     :267-332  (the flagship: shared enc/dec on A and B; change =
                       min(head(|dA-dB|), |head(dA)-head(dB)|))
- FFCTLCD   :335-423  (feature-level abs-diff across all encoder levels)

TPU-first design: the Siamese double pass is folded into a single
2N-batched encoder/decoder call (``jnp.concatenate([A, B], 0)``). The
reference runs the encoder twice sequentially (unet/model.py:319-320);
batching doubles the matmul M-dimension, which keeps the MXU full at small
per-image batch sizes. Weight sharing is identical. (BatchNorm train-mode
statistics then cover both temporal images jointly — with the reference's
shared-weight BN this is the natural semantics; eval mode, which defines
metric parity, is bit-identical.)
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from stcd_tpu.decoders.unet import UnetDecoder
from stcd_tpu.encoders import get_encoder
from stcd_tpu.layers.modules import (
    Activation,
    ClassificationHead,
    ConvBNReLU,
    PredictMixin,
    SegmentationHead,
    resize_bilinear,
)


from stcd_tpu.layers.se import ChannelSpatialSELayer


class _EncDecHead(PredictMixin, nn.Module):
    """Shared encoder + UnetDecoder + SegmentationHead assembly."""

    encoder_name: str = "resnet34"
    encoder_depth: int = 5
    # Converted ImageNet msgpack path or "imagenet" (resolved against
    # $STCD_PRETRAINED_DIR); consumed by create_train_state, which grafts
    # the weights onto the initialized pytree (ref train_sup.py:303).
    encoder_weights: Optional[str] = None
    decoder_use_batchnorm: bool = True
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    decoder_attention_type: Optional[str] = None
    decoder_fused: bool = True  # exact upsample+concat+conv rewrite (unet.py)
    classes: int = 1
    activation: Union[str, None] = None
    aux_params: Optional[dict] = None
    dtype: Optional[Any] = None

    def setup(self):
        encoder, self.encoder_channels = get_encoder(
            self.encoder_name, depth=self.encoder_depth, dtype=self.dtype
        )
        self.encoder = encoder
        self.decoder = UnetDecoder(
            decoder_channels=tuple(self.decoder_channels),
            n_blocks=self.encoder_depth,
            use_batchnorm=self.decoder_use_batchnorm,
            attention_type=self.decoder_attention_type,
            center=self.encoder_name.startswith("vgg"),
            fused=self.decoder_fused,
            dtype=self.dtype,
        )
        self.segmentation_head = SegmentationHead(
            self.classes, kernel_size=3, activation=self.activation, dtype=self.dtype
        )
        if self.aux_params is not None:
            self.classification_head = ClassificationHead(
                dtype=self.dtype, **self.aux_params)
        else:
            self.classification_head = None

    def check_input_shape(self, x):
        """ref base/model.py:5-22: reject spatial sizes the encoder/decoder
        pyramid cannot round-trip (trace-time; zero runtime cost)."""
        h, w = x.shape[1:3]
        stride = 2 ** self.encoder_depth
        if h % stride != 0 or w % stride != 0:
            new_h = (h // stride + 1) * stride if h % stride != 0 else h
            new_w = (w // stride + 1) * stride if w % stride != 0 else w
            raise RuntimeError(
                f"Wrong input shape height={h}, width={w}. Expected image "
                f"height and width divisible by {stride}. Consider padding "
                f"your images to shape ({new_h}, {new_w}).")

    def encode(self, x, train=False):
        self.check_input_shape(x)
        from stcd_tpu.parallel.mesh import constrain_spatial
        # no-op unless a 'space' mesh is registered (VERDICT r2 item 3)
        return [constrain_spatial(f) for f in self.encoder(x, train)]

    def decode(self, features, train=False):
        return self.decoder(features, train)

    def head(self, x):
        return self.segmentation_head(x)


class Unet(_EncDecHead):
    """smp Unet (ref unet/model.py:18-106). ``__call__(x) -> mask`` or
    ``(mask, labels)`` with aux_params (ref base/model.py:24-56)."""

    def __call__(self, x: jax.Array, train: bool = False):
        feats = self.encode(x, train)
        mask = self.head(self.decode(feats, train))
        if self.classification_head is not None:
            return mask, self.classification_head(feats[-1], train)
        return mask


class UnetSeg(_EncDecHead):
    """ref unet/model.py:109-171; the train_sup.py:303 segmentation model."""

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return self.head(self.decode(self.encode(x, train), train))


class SegCD(_EncDecHead):
    """The STCD flagship (ref unet/model.py:267-332).

    ``__call__(A, B) -> (mask_t1, mask_t2, change)`` where
    change = min(head(|dec(A) - dec(B)|), |head(dec(A)) - head(dec(B))|)
    — feature-level vs decision-level difference fused by elementwise min
    ("compress false alarms", ref :329).
    """

    siamese_batched: bool = True  # fold A/B into one 2N-batch pass (TPU-first)

    def __call__(self, A: jax.Array, B: jax.Array, train: bool = False):
        if self.siamese_batched:
            n = A.shape[0]
            ab = jnp.concatenate([A, B], axis=0)
            d = self.decode(self.encode(ab, train), train)
            x1_decode, x2_decode = d[:n], d[n:]
            m = self.head(d)
            mask_t1, mask_t2 = m[:n], m[n:]
        else:
            x1_decode = self.decode(self.encode(A, train), train)
            x2_decode = self.decode(self.encode(B, train), train)
            mask_t1 = self.head(x1_decode)
            mask_t2 = self.head(x2_decode)
        diffea = self.head(jnp.abs(x1_decode - x2_decode))
        diffseg = jnp.abs(mask_t1 - mask_t2)
        change = jnp.minimum(diffea, diffseg)
        return mask_t1, mask_t2, change


class FFCTLCD(_EncDecHead):
    """ref unet/model.py:335-423: abs-diff applied at *every encoder level*
    then decoded, fused with the decision-level diff by min."""

    siamese_batched: bool = True

    def __call__(self, A: jax.Array, B: jax.Array, train: bool = False):
        if self.siamese_batched:
            n = A.shape[0]
            ab = jnp.concatenate([A, B], axis=0)
            feats = self.encode(ab, train)
            features1 = [f[:n] for f in feats]
            features2 = [f[n:] for f in feats]
        else:
            features1 = self.encode(A, train)
            features2 = self.encode(B, train)
        featurediff = [jnp.abs(f1 - f2) for f1, f2 in zip(features1, features2)]
        diffea = self.head(self.decode(featurediff, train))
        mask_t1 = self.head(self.decode(features1, train))
        mask_t2 = self.head(self.decode(features2, train))
        diffseg = jnp.abs(mask_t1 - mask_t2)
        change = jnp.minimum(diffea, diffseg)
        return mask_t1, mask_t2, change


class CDNet(nn.Module):
    """Per-scale abs-diff fusion head (ref unet/model.py:174-251).

    ``__call__(x1, x2)`` where x1/x2 are 5-level lists of decoder features
    (coarse->fine, matching the reference's per-DecoderBlock outputs).
    Each level's |x1-x2| is bilinearly resized to the finest level, all are
    concatenated, passed through conv+relu+ChannelSpatialSE, then a 2-conv
    change head.
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    classes: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1: List[jax.Array], x2: List[jax.Array],
                 train: bool = False) -> jax.Array:
        target_hw = x1[4].shape[1:3]
        diffs = []
        for i in range(5):
            d = jnp.abs(x1[i] - x2[i])  # ref Block :223-238 reduces to abs-diff
            if i < 4:
                d = resize_bilinear(d, target_hw, align_corners=False)
            diffs.append(d)
        diff_all = jnp.concatenate(diffs, axis=-1)
        h = nn.Conv(diff_all.shape[-1], (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name="att_conv")(diff_all)
        h = nn.relu(h)
        h = ChannelSpatialSELayer(reduction_ratio=2, dtype=self.dtype,
                                  name="att_se")(h)
        h = nn.Conv(64, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="cd1")(h)
        h = nn.relu(h)
        return nn.Conv(self.classes, (3, 3), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name="cd2")(h)
