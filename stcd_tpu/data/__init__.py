"""Data layer: datasets (reference file-layout conventions), threaded
loader with device prefetch, on-device augmentation, IO helpers."""

from stcd_tpu.data.loader import DataLoader  # noqa: F401
from stcd_tpu.data.datasets import (  # noqa: F401
    CDDataset,
    FFCDataset,
    LEVIRDataset,
    PSEDataset,
    SCDataset,
    SyntheticCDDataset,
    WHUDataset,
)
