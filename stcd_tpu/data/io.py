"""Host-side image IO helpers (decode parity with the reference's PIL reads).

JPEG/PNG decode goes through the native C++ runtime when available
(stcd_tpu/native: GIL-free libjpeg/libpng into numpy buffers — the
TPU-native stand-in for torch's C++ DataLoader workers, ref
train_sup.py:101-107); anything else — or a missing toolchain — falls
back to PIL per file.  Pixel output is identical either way
(tests/test_native_io.py)."""

from __future__ import annotations

import os
import numpy as np
from PIL import Image

from stcd_tpu import native


_UINT8_TRANSFER = False


def set_uint8_transfer(enabled: bool) -> None:
    """Keep decoded images/labels in uint8 on the host so host->device
    copies move 4x less data; the jitted train/eval steps convert to
    float and scale 1/255 on-device (stcd_tpu.data.augment.to_float01).
    Equivalent to the float path (n/255 either way) up to XLA
    fusion-level fp32 rounding (~1e-5 relative)."""
    global _UINT8_TRANSFER
    _UINT8_TRANSFER = bool(enabled)


def _read_rgb_u8(path: str) -> np.ndarray:
    arr = native.decode_rgb(path)
    if arr is None:  # non-JPEG/PNG, decode error, or no native toolchain
        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.uint8)
    return arr


def read_image(path: str) -> np.ndarray:
    """RGB image HWC: float32 [0,1] (torchvision ToTensor parity), or
    uint8 [0,255] under set_uint8_transfer(True)."""
    arr = _read_rgb_u8(path)
    if _UINT8_TRANSFER:
        return arr
    return arr.astype(np.float32) / 255.0


def read_label(path: str) -> np.ndarray:
    """Binary label from the R channel of an RGB-read PNG, binarized via
    label[label>=1]=1 (ref data/dataset.py:160-164 pattern). Returns (H,W,1)
    in {0,1}: float32, or uint8 under set_uint8_transfer(True)."""
    arr = _read_rgb_u8(path)
    lab = (arr[..., 0:1] >= 1)
    if _UINT8_TRANSFER:
        return lab.astype(np.uint8)
    return lab.astype(np.float32)


def save_mask_png(mask: np.ndarray, path: str) -> None:
    """Save a {0,1} (or [0,1]) mask as an 8-bit PNG x255 (the pseudo-label
    writer's format, ref train_pse_cd.py:158-176)."""
    arr = np.asarray(mask)
    if arr.ndim == 3:
        arr = arr[..., 0]
    img = Image.fromarray((arr * 255).astype(np.uint8))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    img.save(path)


def save_jet_png(values: np.ndarray, path: str) -> None:
    """Min-max-normalize a feature/probability map and save it JET-colorized
    (the reference's vis_feature blocks: cv2.applyColorMap(COLORMAP_JET)
    after x255 normalization, ref train_stcd.py:157-164, :343-360). The
    colormap is the standard jet ramp (blue->cyan->yellow->red), computed in
    numpy — cv2 is not a dependency here."""
    arr = np.asarray(values, np.float32)
    if arr.ndim == 3:
        arr = arr[..., 0]
    lo, hi = float(arr.min()), float(arr.max())
    t = (arr - lo) / (hi - lo) if hi > lo else np.zeros_like(arr)

    def ramp(c):
        return np.clip(1.5 - np.abs(4.0 * t - c), 0.0, 1.0)

    rgb = np.stack([ramp(3.0), ramp(2.0), ramp(1.0)], axis=-1)
    img = Image.fromarray((rgb * 255).astype(np.uint8))
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
