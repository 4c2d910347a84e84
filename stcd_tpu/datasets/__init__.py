"""smp-style ``datasets`` namespace.

Mirrors ref segmentation_models_pytorch/datasets/__init__.py, which
exports OxfordPetDataset/SimpleOxfordPetDataset; the implementations
live in :mod:`stcd_tpu.data.oxford_pet`. The STCD pair datasets are in
:mod:`stcd_tpu.data.datasets` (ref data/dataset.py).
"""

from stcd_tpu.data.oxford_pet import (  # noqa: F401
    OxfordPetDataset,
    SimpleOxfordPetDataset,
)

__all__ = ["OxfordPetDataset", "SimpleOxfordPetDataset"]
