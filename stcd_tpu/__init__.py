"""STCD-TPU — a TPU-native change-detection framework (JAX / Flax / Pallas).

Rebuilds the capabilities of the PyTorch reference VCISwang/STCD
(TGRS 2024, "Diffusion Models and Pseudo-change: A Transfer Learning-based
Change Detection in Remote Sensing Images") as an idiomatic TPU-first stack:

- ``stcd_tpu.layers``    — Flax building blocks (Conv+BN+ReLU, SE/SCSE, heads).
- ``stcd_tpu.encoders``  — backbone zoo with the smp stage contract
  (ref: segmentation_models_pytorch/encoders/__init__.py:51-91).
- ``stcd_tpu.decoders``  — decoder zoo (Unet first; ref decoders/unet/decoder.py).
- ``stcd_tpu.models``    — the bespoke CD zoo (SegCD/UnetSeg/FFCTLCD/CDNet,
  FC-Siam family, SNUNet, DTCDSCN, DSIFN, BIT, ChangeFormer, ChangeVIG)
  mirroring ``define_G`` (ref: models/networks.py:138-215).
- ``stcd_tpu.losses``    — BCE+Dice and the full loss family
  (ref: models/losses.py, segmentation_models_pytorch/losses/).
- ``stcd_tpu.metrics``   — confusion-matrix metrics (ref: train_sup.py:188-266)
  and the functional metric suite (ref: metrics/functional.py).
- ``stcd_tpu.data``      — paired-image datasets, jittable on-device
  augmentation, double-buffered device prefetch (ref: data/dataset.py).
- ``stcd_tpu.parallel``  — mesh construction + sharded train steps (the
  TPU-native replacement for the reference's nn.DataParallel).
- ``stcd_tpu.train``     — train loops mirroring train_sup.py /
  train_pse_cd.py / train_stcd.py, orbax checkpointing, LR schedules.
- ``stcd_tpu.ops``       — Pallas TPU kernels for the hot fused ops.

Layout convention is NHWC (TPU-native); the reference is NCHW. All public
``forward`` semantics match the reference given a layout transpose.
"""

__version__ = "0.1.0"

# Submodule aliases so the smp access pattern works unchanged
# (ref segmentation_models_pytorch/__init__.py:1-5 re-exports datasets/
# encoders/decoders/losses/metrics as package attributes).
from stcd_tpu import losses  # noqa: F401
from stcd_tpu import metrics  # noqa: F401
from stcd_tpu import datasets  # noqa: F401
from stcd_tpu import encoders  # noqa: F401
from stcd_tpu import decoders  # noqa: F401
from stcd_tpu.models.factory import create_model, define_G  # noqa: F401
from stcd_tpu.models.segcd import (  # noqa: F401
    Unet,
    UnetSeg,
    SegCD,
    FFCTLCD,
    CDNet,
)
from stcd_tpu.models.smp_models import (  # noqa: F401  (smp top-level exports)
    UnetPlusPlus,
    MAnet,
    Linknet,
    FPN,
    PSPNet,
    DeepLabV3,
    DeepLabV3Plus,
    PAN,
)


# Bounded LRU keyed on hash(model) when the Module is hashable (so a
# fresh-but-equal model built per call still hits the cache and avoids a
# re-trace), falling back to id() for unhashable Modules (dict/list
# fields like aux_params — plain lru_cache crashed on those). The jit
# closure pins the module regardless, so entries hold it strongly.
_EVAL_CACHE: dict = {}
_EVAL_CACHE_MAX = 16


def _jitted_eval_apply(model):
    import jax

    try:
        key = ("hash", type(model), hash(model))
    except TypeError:
        key = ("id", id(model))
    entry = _EVAL_CACHE.pop(key, None)
    if entry is not None:
        same = entry[0] == model if key[0] == "hash" else entry[0] is model
        if same:
            _EVAL_CACHE[key] = entry  # re-insert: LRU recency
            return entry[1]
    fn = jax.jit(lambda variables, *inputs: model.apply(variables, *inputs))
    while len(_EVAL_CACHE) >= _EVAL_CACHE_MAX:
        _EVAL_CACHE.pop(next(iter(_EVAL_CACHE)))
    _EVAL_CACHE[key] = (model, fn)
    return fn


def predict(model, variables, *inputs):
    """smp ``SegmentationModel.predict`` parity (ref base/model.py:41-56):
    eval-mode forward, no gradients, jitted (cached per model instance).

    >>> masks = stcd_tpu.predict(model, variables, images)
    """
    return _jitted_eval_apply(model)(variables, *inputs)
