"""Native C++ IO runtime (stcd_tpu/native): decode parity + fallback.

Pins the contract io.read_image/read_label rely on: the native
libjpeg/libpng decode is pixel-identical to PIL's convert("RGB") for
every PNG flavor (RGB, gray, palette, RGBA — alpha STRIPPED like PIL,
1-bit) and for baseline JPEG on this host (both sides link the same
libjpeg-turbo generation); unsupported formats and IO errors degrade to
the PIL path rather than raising through ctypes.

The reference's equivalent machinery is torch's C++ DataLoader workers +
PIL (ref train_sup.py:101-107, data/dataset.py:150-158)."""

import os

import numpy as np
import pytest
from PIL import Image

from stcd_tpu import native
from stcd_tpu.data import io as stcd_io


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (64, 48, 3), np.uint8)
    rgba = np.concatenate(
        [rgb, rng.integers(0, 256, (64, 48, 1), np.uint8)], axis=-1)
    Image.fromarray(rgb).save(d / "rgb.png")
    Image.fromarray(rgb[..., 0]).save(d / "gray.png")
    Image.fromarray(rgb).convert(
        "P", palette=Image.ADAPTIVE).save(d / "pal.png")
    Image.fromarray(rgba).save(d / "rgba.png")
    Image.fromarray(rgb[..., 0] > 128).save(d / "bit.png")
    Image.fromarray(rgb).save(d / "color.jpg", quality=90)
    Image.fromarray(rgb[..., 0]).save(d / "gray.jpg", quality=90)
    Image.fromarray(rgb).save(d / "other.bmp")
    lab = np.zeros((64, 48, 3), np.uint8)
    lab[10:20, 5:15] = 255
    lab[30:40, 20:30] = 1  # >=1 counts as changed (ref dataset binarize)
    Image.fromarray(lab).save(d / "label.png")
    return d


def test_native_available():
    # This host has g++ + libjpeg/libpng; the lazy build must succeed.
    assert native.available()


@pytest.mark.parametrize("name", ["rgb.png", "gray.png", "pal.png",
                                  "rgba.png", "bit.png", "color.jpg",
                                  "gray.jpg"])
def test_decode_matches_pil_exactly(images, name):
    path = str(images / name)
    with Image.open(path) as im:
        ref = np.asarray(im.convert("RGB"), np.uint8)
    got = native.decode_rgb(path)
    assert got is not None and got.dtype == np.uint8
    np.testing.assert_array_equal(got, ref)


def test_image_dims(images):
    assert native.image_dims(str(images / "rgb.png")) == (64, 48)
    assert native.image_dims(str(images / "color.jpg")) == (64, 48)
    assert native.image_dims(str(images / "missing.png")) is None
    assert native.image_dims(str(images / "other.bmp")) is None


def test_unsupported_format_returns_none(images):
    # BMP is not JPEG/PNG -> native declines, read_image's PIL path serves.
    assert native.decode_rgb(str(images / "other.bmp")) is None
    arr = stcd_io.read_image(str(images / "other.bmp"))
    assert arr.shape == (64, 48, 3) and arr.dtype == np.float32


def test_truncated_file_returns_none(images, tmp_path):
    raw = (images / "rgb.png").read_bytes()
    bad = tmp_path / "trunc.png"
    bad.write_bytes(raw[: len(raw) // 2])
    assert native.decode_rgb(str(bad)) is None


def test_batch_decode_collates_and_flags_failures(images):
    paths = [str(images / "rgb.png"), str(images / "color.jpg"),
             str(images / "missing.png"), str(images / "pal.png")]
    batch, ok = native.decode_rgb_batch(paths, 64, 48, num_threads=3)
    assert ok == [True, True, False, True]
    assert batch.shape == (4, 64, 48, 3) and batch.dtype == np.uint8
    for i in (0, 1, 3):
        np.testing.assert_array_equal(batch[i], native.decode_rgb(paths[i]))
    assert not batch[2].any()  # failed row zero-filled


def test_batch_dimension_mismatch_flags_not_crashes(images):
    batch, ok = native.decode_rgb_batch([str(images / "rgb.png")], 32, 48)
    assert ok == [False] and not batch.any()


def test_read_image_native_and_pil_paths_agree(images, monkeypatch):
    path = str(images / "rgba.png")
    via_native = stcd_io.read_image(path)
    monkeypatch.setattr(native, "decode_rgb", lambda p: None)
    via_pil = stcd_io.read_image(path)
    np.testing.assert_array_equal(via_native, via_pil)
    assert via_native.dtype == np.float32 and via_native.max() <= 1.0


def test_read_label_native_and_pil_paths_agree(images, monkeypatch):
    path = str(images / "label.png")
    via_native = stcd_io.read_label(path)
    monkeypatch.setattr(native, "decode_rgb", lambda p: None)
    via_pil = stcd_io.read_label(path)
    np.testing.assert_array_equal(via_native, via_pil)
    assert set(np.unique(via_native)) <= {0.0, 1.0}
    assert via_native.sum() == 2 * 10 * 10  # both boxes binarized to 1


def test_env_kill_switch(images, monkeypatch):
    monkeypatch.setenv("STCD_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    assert native.load() is None
    assert native.decode_rgb(str(images / "rgb.png")) is None
    # read_image still serves through PIL
    assert stcd_io.read_image(str(images / "rgb.png")).shape == (64, 48, 3)
