"""smp model assemblies (ref segmentation_models_pytorch/__init__.py:7-18
exports + each decoders/*/model.py): UnetPlusPlus, MAnet, Linknet, FPN,
PSPNet, DeepLabV3, DeepLabV3Plus, PAN.

Each is encoder + decoder + SegmentationHead (+ optional aux
ClassificationHead) per the smp assembly, with the head upsampling factors
the reference models use (FPN 4x, PSPNet 8x w/ depth-3 encoder,
DeepLabV3 8x, DeepLabV3+ 4x, PAN 4x).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

from flax import linen as nn

from stcd_tpu.decoders.deeplabv3 import DeepLabV3Decoder, DeepLabV3PlusDecoder
from stcd_tpu.decoders.fpn import FPNDecoder
from stcd_tpu.decoders.linknet import LinknetDecoder
from stcd_tpu.decoders.manet import MAnetDecoder
from stcd_tpu.decoders.pan import PANDecoder
from stcd_tpu.decoders.pspnet import PSPDecoder
from stcd_tpu.decoders.unetplusplus import UnetPlusPlusDecoder
from stcd_tpu.encoders import get_encoder
from stcd_tpu.encoders.resnet import ResNetEncoder
from stcd_tpu.layers.modules import PredictMixin, SegmentationHead

Dtype = Any


class UnetPlusPlus(PredictMixin, nn.Module):
    """ref decoders/unetplusplus/model.py."""

    encoder_name: str = "resnet34"
    encoder_depth: int = 5
    encoder_weights: Optional[str] = None  # consumed by create_train_state
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    decoder_use_batchnorm: bool = True
    decoder_attention_type: Optional[str] = None
    classes: int = 1
    activation: Union[str, None] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        enc, _ = get_encoder(self.encoder_name, depth=self.encoder_depth,
                             dtype=self.dtype)
        feats = enc.copy(name="encoder")(x, train)
        h = UnetPlusPlusDecoder(
            decoder_channels=tuple(self.decoder_channels),
            n_blocks=self.encoder_depth,
            use_batchnorm=self.decoder_use_batchnorm,
            attention_type=self.decoder_attention_type,
            center=self.encoder_name.startswith("vgg"),
            dtype=self.dtype, name="decoder")(feats, train)
        return SegmentationHead(self.classes, activation=self.activation,
                                dtype=self.dtype, name="segmentation_head")(h)


class MAnet(PredictMixin, nn.Module):
    """ref decoders/manet/model.py."""

    encoder_name: str = "resnet34"
    encoder_depth: int = 5
    encoder_weights: Optional[str] = None  # consumed by create_train_state
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    decoder_use_batchnorm: bool = True
    decoder_pab_channels: int = 64
    classes: int = 1
    activation: Union[str, None] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        enc, _ = get_encoder(self.encoder_name, depth=self.encoder_depth,
                             dtype=self.dtype)
        feats = enc.copy(name="encoder")(x, train)
        h = MAnetDecoder(decoder_channels=tuple(self.decoder_channels),
                         n_blocks=self.encoder_depth,
                         use_batchnorm=self.decoder_use_batchnorm,
                         pab_channels=self.decoder_pab_channels,
                         dtype=self.dtype, name="decoder")(feats, train)
        return SegmentationHead(self.classes, activation=self.activation,
                                dtype=self.dtype, name="segmentation_head")(h)


class Linknet(PredictMixin, nn.Module):
    """ref decoders/linknet/model.py (head kernel 1)."""

    encoder_name: str = "resnet34"
    encoder_depth: int = 5
    encoder_weights: Optional[str] = None  # consumed by create_train_state
    decoder_use_batchnorm: bool = True
    classes: int = 1
    activation: Union[str, None] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        enc, _ = get_encoder(self.encoder_name, depth=self.encoder_depth,
                             dtype=self.dtype)
        feats = enc.copy(name="encoder")(x, train)
        h = LinknetDecoder(prefinal_channels=32, n_blocks=self.encoder_depth,
                           use_batchnorm=self.decoder_use_batchnorm,
                           dtype=self.dtype, name="decoder")(feats, train)
        return SegmentationHead(self.classes, kernel_size=1,
                                activation=self.activation, dtype=self.dtype,
                                name="segmentation_head")(h)


class FPN(PredictMixin, nn.Module):
    """ref decoders/fpn/model.py (head upsampling 4x)."""

    encoder_name: str = "resnet34"
    encoder_depth: int = 5
    encoder_weights: Optional[str] = None  # consumed by create_train_state
    decoder_pyramid_channels: int = 256
    decoder_segmentation_channels: int = 128
    decoder_merge_policy: str = "add"
    decoder_dropout: float = 0.2
    classes: int = 1
    activation: Union[str, None] = None
    upsampling: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        enc, _ = get_encoder(self.encoder_name, depth=self.encoder_depth,
                             dtype=self.dtype)
        feats = enc.copy(name="encoder")(x, train)
        h = FPNDecoder(pyramid_channels=self.decoder_pyramid_channels,
                       segmentation_channels=self.decoder_segmentation_channels,
                       dropout=self.decoder_dropout,
                       merge_policy=self.decoder_merge_policy,
                       dtype=self.dtype, name="decoder")(feats, train)
        return SegmentationHead(self.classes, activation=self.activation,
                                upsampling=self.upsampling, dtype=self.dtype,
                                name="segmentation_head")(h)


class PSPNet(PredictMixin, nn.Module):
    """ref decoders/pspnet/model.py (encoder_depth=3, head 8x)."""

    encoder_name: str = "resnet34"
    encoder_depth: int = 3
    encoder_weights: Optional[str] = None  # consumed by create_train_state
    psp_out_channels: int = 512
    psp_use_batchnorm: bool = True
    psp_dropout: float = 0.2
    classes: int = 1
    activation: Union[str, None] = None
    upsampling: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        enc, _ = get_encoder(self.encoder_name, depth=self.encoder_depth,
                             dtype=self.dtype)
        feats = enc.copy(name="encoder")(x, train)
        h = PSPDecoder(out_channels=self.psp_out_channels,
                       use_batchnorm=self.psp_use_batchnorm,
                       dropout=self.psp_dropout, dtype=self.dtype,
                       name="decoder")(feats, train)
        return SegmentationHead(self.classes, activation=self.activation,
                                upsampling=self.upsampling, dtype=self.dtype,
                                name="segmentation_head")(h)


class DeepLabV3(PredictMixin, nn.Module):
    """ref decoders/deeplabv3/model.py (output stride 8, head 8x)."""

    encoder_name: str = "resnet34"
    encoder_depth: int = 5
    encoder_weights: Optional[str] = None  # consumed by create_train_state
    decoder_channels: int = 256
    classes: int = 1
    activation: Union[str, None] = None
    upsampling: int = 8
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        enc, _ = get_encoder(self.encoder_name, depth=self.encoder_depth,
                             output_stride=8, dtype=self.dtype)
        feats = enc.copy(name="encoder")(x, train)
        h = DeepLabV3Decoder(out_channels=self.decoder_channels,
                             dtype=self.dtype, name="decoder")(feats, train)
        return SegmentationHead(self.classes, activation=self.activation,
                                upsampling=self.upsampling, dtype=self.dtype,
                                name="segmentation_head")(h)


class DeepLabV3Plus(PredictMixin, nn.Module):
    """ref decoders/deeplabv3/model.py (output stride 16, head 4x)."""

    encoder_name: str = "resnet34"
    encoder_depth: int = 5
    encoder_weights: Optional[str] = None  # consumed by create_train_state
    encoder_output_stride: int = 16
    decoder_channels: int = 256
    decoder_atrous_rates: Sequence[int] = (12, 24, 36)
    classes: int = 1
    activation: Union[str, None] = None
    upsampling: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        enc, _ = get_encoder(self.encoder_name, depth=self.encoder_depth,
                             output_stride=self.encoder_output_stride,
                             dtype=self.dtype)
        feats = enc.copy(name="encoder")(x, train)
        h = DeepLabV3PlusDecoder(out_channels=self.decoder_channels,
                                 atrous_rates=tuple(self.decoder_atrous_rates),
                                 output_stride=self.encoder_output_stride,
                                 dtype=self.dtype, name="decoder")(feats, train)
        return SegmentationHead(self.classes, activation=self.activation,
                                upsampling=self.upsampling, dtype=self.dtype,
                                name="segmentation_head")(h)


class PAN(PredictMixin, nn.Module):
    """ref decoders/pan/model.py (head 4x; encoder dilated to stride 16)."""

    encoder_name: str = "resnet34"
    encoder_weights: Optional[str] = None  # consumed by create_train_state
    decoder_channels: int = 32
    classes: int = 1
    activation: Union[str, None] = None
    upsampling: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train=False):
        enc, _ = get_encoder(self.encoder_name, depth=5, output_stride=16,
                             dtype=self.dtype)
        feats = enc.copy(name="encoder")(x, train)
        h = PANDecoder(decoder_channels=self.decoder_channels, dtype=self.dtype,
                       name="decoder")(feats, train)
        return SegmentationHead(self.classes, activation=self.activation,
                                upsampling=self.upsampling, dtype=self.dtype,
                                name="segmentation_head")(h)
