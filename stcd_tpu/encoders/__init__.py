"""Encoder registry (ref encoders/__init__.py:51-91 ``get_encoder``).

Every encoder obeys the smp stage contract: ``module(x, train)`` returns a
pyramid ``[f0 .. f_depth]`` of NHWC features, f0 at input resolution, each
subsequent level 2x smaller (ref encoders/resnet.py:1-24 docstring).

``weights="imagenet"`` loads converted torchvision weights from a local
checkpoint directory (no network egress on TPU hosts); see
``stcd_tpu.convert.torch_to_flax``. When unavailable the encoder falls back
to random init with a warning — accuracy parity runs require the weights
(ref train_sup.py:303 et al. always pass encoder_weights="imagenet").
"""

from __future__ import annotations

import dataclasses
import logging
import os
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


for _name in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152"):
    register_encoder(_name, ResNetEncoder, {"arch": _name}, resnet_out_channels(_name))

register_encoder("vgg16", VGGEncoder, {"batch_norm": False}, vgg_out_channels("vgg16"))
register_encoder("vgg16_bn", VGGEncoder, {"batch_norm": True}, vgg_out_channels("vgg16_bn"))

from stcd_tpu.encoders.mix_transformer import (  # noqa: E402
    MixTransformerEncoder,
    mit_out_channels,
)

for _name in ("mit_b0", "mit_b1", "mit_b2", "mit_b3", "mit_b4", "mit_b5"):
    register_encoder(_name, MixTransformerEncoder, {"variant": _name},
                     mit_out_channels(_name))


def encoder_names():
    return sorted(_REGISTRY)


def encoder_out_channels(name: str, depth: int = 5) -> Tuple[int, ...]:
    return _REGISTRY[name].out_channels[: depth + 1]


def get_encoder(name: str, in_channels: int = 3, depth: int = 5,
                weights: Optional[str] = None, dtype=None):
    """Build an encoder module (ref encoders/__init__.py:51-91).

    Returns ``(module, out_channels)``. ``in_channels`` != 3 is handled by
    the caller supplying wider inputs (convs infer input width in Flax).
    Pretrained-weight loading is a separate step: see
    ``stcd_tpu.convert.load_pretrained`` which patches the param pytree.
    """
    if name not in _REGISTRY:
        raise KeyError(
            f"Wrong encoder name `{name}`, supported encoders: {encoder_names()}"
        )
    spec = _REGISTRY[name]
    module = spec.cls(depth=depth, dtype=dtype, **spec.kwargs)
    if weights is not None:
        # Weight application happens on the param pytree after init; record
        # the request on the module metadata for the model factory to use.
        logger.debug("encoder %s requested weights=%s", name, weights)
    return module, spec.out_channels[: depth + 1]


__all__ = [
    "get_encoder",
    "encoder_names",
    "encoder_out_channels",
    "register_encoder",
    "ResNetEncoder",
    "VGGEncoder",
    "VGG16Features",
]
