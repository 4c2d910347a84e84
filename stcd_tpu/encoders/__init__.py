"""Encoder registry (ref encoders/__init__.py:51-91 ``get_encoder``).

Every encoder obeys the smp stage contract: ``module(x, train)`` returns a
pyramid ``[f0 .. f_depth]`` of NHWC features, f0 at input resolution, each
subsequent level 2x smaller (ref encoders/resnet.py:1-24 docstring).

``weights="imagenet"`` resolves converted torchvision weights from a local
checkpoint directory ($STCD_PRETRAINED_DIR; no network egress on TPU
hosts) and raises FileNotFoundError with conversion instructions when they
are absent — never a silent fallback to random init. The graft itself
happens post-init on the param pytree (``stcd_tpu.convert.pretrained``);
accuracy parity runs require the weights (ref train_sup.py:303 et al.
always pass encoder_weights="imagenet").
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os

import numpy as np
from typing import Any, Optional, Tuple

from stcd_tpu.encoders.resnet import ResNetEncoder, resnet_out_channels
from stcd_tpu.encoders.vgg import VGGEncoder, VGG16Features, vgg_out_channels

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class EncoderSpec:
    cls: Any
    kwargs: dict
    out_channels: Tuple[int, ...]


_REGISTRY = {}


def register_encoder(name: str, cls, kwargs: dict, out_channels: Tuple[int, ...]):
    _REGISTRY[name] = EncoderSpec(cls, dict(kwargs), tuple(out_channels))


for _name in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
              "resnext50_32x4d", "resnext101_32x4d", "resnext101_32x8d",
              "resnext101_32x16d", "resnext101_32x32d", "resnext101_32x48d"):
    register_encoder(_name, ResNetEncoder, {"arch": _name}, resnet_out_channels(_name))

for _name in ("vgg11", "vgg13", "vgg16", "vgg19"):
    register_encoder(_name, VGGEncoder, {"arch": _name, "batch_norm": False},
                     vgg_out_channels(_name))
    register_encoder(_name + "_bn", VGGEncoder,
                     {"arch": _name, "batch_norm": True}, vgg_out_channels(_name))

from stcd_tpu.encoders.mix_transformer import (  # noqa: E402
    MixTransformerEncoder,
    mit_out_channels,
)

for _name in ("mit_b0", "mit_b1", "mit_b2", "mit_b3", "mit_b4", "mit_b5"):
    register_encoder(_name, MixTransformerEncoder, {"variant": _name},
                     mit_out_channels(_name))

from stcd_tpu.encoders.densenet import (  # noqa: E402
    _DENSENET_CFGS, DenseNetEncoder, densenet_out_channels)
from stcd_tpu.encoders.efficientnet import (  # noqa: E402
    EfficientNetEncoder, efficientnet_out_channels)
from stcd_tpu.encoders.mobilenet import (  # noqa: E402
    MobileNetV2Encoder, MobileNetV3Encoder, mobilenetv3_out_channels)
from stcd_tpu.encoders.senet import (  # noqa: E402
    _SENET_CFGS, SENetEncoder, senet_out_channels)
from stcd_tpu.encoders.xception import XceptionEncoder, xception_out_channels  # noqa: E402
from stcd_tpu.encoders.inception import (  # noqa: E402
    InceptionV4Encoder, InceptionResNetV2Encoder,
    inceptionv4_out_channels, inceptionresnetv2_out_channels)
from stcd_tpu.encoders.dpn import _DPN_CFGS, DPNEncoder, dpn_out_channels  # noqa: E402
from stcd_tpu.encoders.regnet import (  # noqa: E402
    _REGNET_CFGS, RegNetEncoder, regnet_out_channels)
from stcd_tpu.encoders.timm_resnet import (  # noqa: E402
    _TIMM_RESNET_CFGS, TimmResNetEncoder, timm_resnet_out_channels)
from stcd_tpu.encoders.gernet import (  # noqa: E402
    _GERNET_CFGS, GERNetEncoder, gernet_out_channels)
from stcd_tpu.encoders.mobileone import (  # noqa: E402
    _MOBILEONE_CFGS, MobileOneEncoder, mobileone_out_channels)

for _name in _DENSENET_CFGS:
    register_encoder(_name, DenseNetEncoder, {"arch": _name},
                     densenet_out_channels(_name))

# efficientnet_pytorch-style names (ref encoders/efficientnet.py) slice
# stages by the ref's FLAT stage_idxs table (mid-group for b0); the timm
# names below slice whole block groups (ref timm_efficientnet.py:105-113)
for _v in ("b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7"):
    register_encoder(f"efficientnet-{_v}", EfficientNetEncoder,
                     {"variant": _v, "stage_split": "flat"},
                     efficientnet_out_channels(_v))
# timm-style names (ref encoders/timm_efficientnet.py); same architecture
for _v in ("b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7", "b8", "l2"):
    register_encoder(f"timm-efficientnet-{_v}", EfficientNetEncoder,
                     {"variant": _v}, efficientnet_out_channels(_v))
for _v in ("lite0", "lite1", "lite2", "lite3", "lite4"):
    register_encoder(f"timm-tf_efficientnet_{_v}", EfficientNetEncoder,
                     {"variant": _v, "lite": True},
                     efficientnet_out_channels(_v, lite=True))

register_encoder("mobilenet_v2", MobileNetV2Encoder, {},
                 (3, 16, 24, 32, 96, 1280))
for _mode in ("large", "small"):
    for _wm, _tag in ((0.75, "075"), (1.0, "100")):
        register_encoder(f"timm-mobilenetv3_{_mode}_{_tag}", MobileNetV3Encoder,
                         {"mode": _mode, "width_mult": _wm},
                         mobilenetv3_out_channels(_mode, _wm))
    register_encoder(f"timm-mobilenetv3_{_mode}_minimal_100", MobileNetV3Encoder,
                     {"mode": _mode, "width_mult": 1.0, "minimal": True},
                     mobilenetv3_out_channels(_mode, 1.0))

for _name in _SENET_CFGS:
    register_encoder(_name, SENetEncoder, {"arch": _name},
                     senet_out_channels(_name))

register_encoder("xception", XceptionEncoder, {}, xception_out_channels())
register_encoder("inceptionv4", InceptionV4Encoder, {},
                 inceptionv4_out_channels())
register_encoder("inceptionresnetv2", InceptionResNetV2Encoder, {},
                 inceptionresnetv2_out_channels())

for _name in _DPN_CFGS:
    register_encoder(_name, DPNEncoder, {"arch": _name}, dpn_out_channels(_name))

for _name in _REGNET_CFGS:
    register_encoder(f"timm-{_name}", RegNetEncoder, {"arch": _name},
                     regnet_out_channels(_name))

for _name in _TIMM_RESNET_CFGS:
    register_encoder(f"timm-{_name}", TimmResNetEncoder, {"arch": _name},
                     timm_resnet_out_channels(_name))

for _name in _GERNET_CFGS:
    register_encoder(f"timm-{_name}", GERNetEncoder, {"arch": _name},
                     gernet_out_channels(_name))

for _name in _MOBILEONE_CFGS:
    register_encoder(_name, MobileOneEncoder, {"arch": _name},
                     mobileone_out_channels(_name))


def encoder_names():
    return sorted(_REGISTRY)


def encoder_out_channels(name: str, depth: int = 5) -> Tuple[int, ...]:
    return _REGISTRY[name].out_channels[: depth + 1]


def get_encoder(name: str, in_channels: int = 3, depth: int = 5,
                weights: Optional[str] = None, output_stride: int = 32,
                dtype=None):
    """Build an encoder module (ref encoders/__init__.py:51-91).

    Returns ``(module, out_channels)``. ``in_channels`` != 3 is handled by
    the caller supplying wider inputs (convs infer input width in Flax).
    ``output_stride`` in {8, 16} dilates the deepest stages instead of
    striding (ref :88 make_dilated; the DeepLabV3/+ encoder contract).
    ``weights`` is resolved here (raising when unresolvable) but applied to
    the param pytree post-init: see ``stcd_tpu.convert.pretrained``.
    """
    if name.startswith("tu-"):
        # timm_universal passthrough (ref encoders/__init__.py:56-66): the
        # reference delegates to timm's features_only. timm is an optional
        # dependency we don't vendor; resolve against the local registry
        # (with and without the timm- prefix) instead.
        for cand in (name[3:], f"timm-{name[3:]}"):
            if cand in _REGISTRY:
                name = cand
                break
        else:
            raise KeyError(
                f"`{name}`: timm universal encoders need the optional timm "
                f"dependency; locally available encoders: {encoder_names()}")
    if name not in _REGISTRY:
        raise KeyError(
            f"Wrong encoder name `{name}`, supported encoders: {encoder_names()}"
        )
    spec = _REGISTRY[name]
    kwargs = dict(spec.kwargs)
    if output_stride != 32:
        if output_stride not in (8, 16):
            raise ValueError(
                f"Output stride should be 8, 16 or 32, got {output_stride}")
        if not hasattr(spec.cls, "replace_stride_with_dilation"):
            # ref encoders/_base.py make_dilated raises for stage-less encoders
            raise ValueError(
                f"{name} encoder does not support dilated mode")
        check = getattr(spec.cls, "check_dilation_support", None)
        if check is not None:
            # per-arch refusals within a shared encoder class (e.g. the
            # reference refuses res2net/resnest but dilates sknet)
            check(**kwargs)
        kwargs["replace_stride_with_dilation"] = (
            (False, False, True) if output_stride == 16 else (False, True, True))
    module = spec.cls(depth=depth, dtype=dtype, **kwargs)
    if weights is not None:
        # Flax modules are stateless until init, so the actual graft happens
        # on the param pytree (stcd_tpu.convert.pretrained.apply_pretrained
        # or create_train_state(encoder_weights=...)). Resolve NOW so a
        # missing checkpoint raises here — mirroring the reference, which
        # loads (or 404s) inside get_encoder (ref encoders/__init__.py:83-86)
        # and never silently falls back to random init.
        from stcd_tpu.convert.pretrained import resolve_encoder_weights
        path = resolve_encoder_weights(weights, name)
        logger.info(
            "encoder %s: pretrained weights resolved to %s; apply them to "
            "the initialized params via stcd_tpu.convert.pretrained."
            "apply_pretrained (create_train_state does this automatically "
            "for models built through create_model)", name, path)
    return module, spec.out_channels[: depth + 1]


_PREPROCESS_SPECIAL = {
    # pretrainedmodels-style settings used by the reference's encoder zoo
    # (ref encoders/{dpn,inceptionv4,inceptionresnetv2,xception}.py import
    # them from the pretrainedmodels package; values reproduced here).
    "dpn": dict(mean=[124 / 255, 117 / 255, 104 / 255],
                std=[1 / (0.0167 * 255)] * 3),
    "inception": dict(mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5]),
    "xception": dict(mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5]),
}


def get_preprocessing_params(encoder_name: str, pretrained: str = "imagenet"):
    """ref encoders/__init__.py:98-117: the normalization settings the
    encoder's pretrained weights expect."""
    if encoder_name.startswith("tu-"):
        encoder_name = encoder_name[3:]
    if encoder_name not in _REGISTRY and f"timm-{encoder_name}" not in _REGISTRY:
        raise KeyError(f"Wrong encoder name `{encoder_name}`")
    settings = dict(input_space="RGB", input_range=[0, 1],
                    mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225])
    for prefix, special in _PREPROCESS_SPECIAL.items():
        if encoder_name.startswith(prefix):
            settings.update(special)
    if pretrained == "advprop":  # timm-efficientnet advprop variant
        settings.update(mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5])
    return settings


def preprocess_input(x, mean=None, std=None, input_space="RGB",
                     input_range=None, **kwargs):
    """ref encoders/_preprocessing.py — numpy/jax-array normalization."""
    if input_space == "BGR":
        x = x[..., ::-1]
    if input_range is not None and x.max() > 1 and input_range[1] == 1:
        x = x / 255.0
    if mean is not None:
        x = x - np.array(mean, dtype=np.float32)
    if std is not None:
        x = x / np.array(std, dtype=np.float32)
    return x


def get_preprocessing_fn(encoder_name: str, pretrained: str = "imagenet"):
    """ref encoders/__init__.py:120-126."""
    params = get_preprocessing_params(encoder_name, pretrained=pretrained)
    return functools.partial(preprocess_input, **params)


__all__ = [
    "get_encoder",
    "get_preprocessing_params",
    "get_preprocessing_fn",
    "preprocess_input",
    "encoder_names",
    "encoder_out_channels",
    "register_encoder",
    "ResNetEncoder",
    "VGGEncoder",
    "VGG16Features",
]
