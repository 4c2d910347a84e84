"""Host-side image IO helpers (PIL-based, matching the reference's reads)."""

from __future__ import annotations

import os
import numpy as np
from PIL import Image


def read_image(path: str) -> np.ndarray:
    """RGB image as float32 [0,1], HWC (torchvision ToTensor parity)."""
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32) / 255.0
    return arr


def read_label(path: str) -> np.ndarray:
    """Binary label from the R channel of an RGB-read PNG, binarized via
    label[label>=1]=1 (ref data/dataset.py:160-164 pattern). Returns (H,W,1)
    float32 in {0,1}."""
    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), np.float32)
    lab = arr[..., 0:1].copy()
    lab[lab >= 1] = 1.0
    return lab


def save_mask_png(mask: np.ndarray, path: str) -> None:
    """Save a {0,1} (or [0,1]) mask as an 8-bit PNG x255 (the pseudo-label
    writer's format, ref train_pse_cd.py:158-176)."""
    arr = np.asarray(mask)
    if arr.ndim == 3:
        arr = arr[..., 0]
    img = Image.fromarray((arr * 255).astype(np.uint8))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img.save(path)


def read_list(path: str) -> list:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def write_list(ids, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i in ids:
            f.write(f"{i}\n")
