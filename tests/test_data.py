"""Data layer tests: synthetic dataset, loader, on-device augmentation."""

import colorsys

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from stcd_tpu.data.augment import (
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
    color_jitter,
    gaussian_blur,
    normalize,
    train_augment,
)
from stcd_tpu.data.datasets import SyntheticCDDataset, WHUDataset, CDDataset
from stcd_tpu.data.io import save_mask_png, write_list
from stcd_tpu.data.loader import DataLoader


def test_synthetic_dataset_deterministic():
    ds = SyntheticCDDataset(length=4, size=32)
    s1, s2 = ds[0], ds[0]
    np.testing.assert_array_equal(s1["A"], s2["A"])
    assert s1["A"].shape == (32, 32, 3)
    assert s1["label"].shape == (32, 32, 1)
    # B differs from A exactly where label==1
    diff = np.any(s1["A"] != s1["B"], axis=-1, keepdims=True)
    assert np.all(diff <= (s1["label"] > 0))


def test_loader_batches_and_shuffles():
    ds = SyntheticCDDataset(length=10, size=16)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, prefetch=0)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["A"].shape == (4, 16, 16, 3)
    assert len(batches[0]["name"]) == 4


def test_loader_keeps_partial_final_batch_by_default():
    # regression: a val set smaller than the eval batch must still yield a
    # batch (the torch reference's loaders default drop_last=False); with
    # drop_last=True it silently produced zero eval batches -> nan metrics
    # -> no best checkpoint ever written
    ds = SyntheticCDDataset(length=10, size=16)
    dl = DataLoader(ds, batch_size=4, prefetch=0)
    batches = list(dl)
    assert len(batches) == 3 == len(dl)
    assert batches[-1]["A"].shape[0] == 2

    tiny = DataLoader(SyntheticCDDataset(length=3, size=16), batch_size=8,
                      prefetch=0)
    assert [b["A"].shape[0] for b in tiny] == [3]


def test_adjustments_match_torchvision_formulas(np_rng):
    """Expected values computed inline with the torchvision definitions
    (blend against mean-gray / per-pixel gray; hue shift in HSV)."""
    img = np_rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    gray_w = np.array([0.299, 0.587, 0.114], np.float32)
    gray = (img @ gray_w)[..., None]

    for factor in (0.5, 1.3):
        ours = np.asarray(adjust_brightness(jnp.asarray(img), factor))
        np.testing.assert_allclose(ours, np.clip(img * factor, 0, 1), atol=1e-5)

        ours = np.asarray(adjust_saturation(jnp.asarray(img), factor))
        expected = np.clip(img * factor + gray * (1 - factor), 0, 1)
        np.testing.assert_allclose(ours, expected, atol=1e-5)

        ours = np.asarray(adjust_contrast(jnp.asarray(img), factor))
        expected = np.clip(img * factor + gray.mean() * (1 - factor), 0, 1)
        np.testing.assert_allclose(ours, expected, atol=1e-5)

    shift = 0.1
    ours = np.asarray(adjust_hue(jnp.asarray(img), shift))
    expected = np.empty_like(img)
    for i in range(16):
        for j in range(16):
            h, s, v = colorsys.rgb_to_hsv(*img[i, j])
            expected[i, j] = colorsys.hsv_to_rgb((h + shift) % 1.0, s, v)
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_train_augment_shapes_and_normalization(rng):
    img = jnp.ones((8, 8, 3)) * 0.5
    out = train_augment(rng, img)
    assert out.shape == (8, 8, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # eval path: pure normalize
    normed = np.asarray(normalize(img))
    expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(normed[0, 0], expected, rtol=1e-5)


def test_gaussian_blur_preserves_mean(rng):
    img = jax.random.uniform(rng, (16, 16, 3))
    out = gaussian_blur(jax.random.PRNGKey(3), img, p=1.0)
    np.testing.assert_allclose(float(jnp.mean(out)), float(jnp.mean(img)), atol=0.02)


def test_file_datasets(tmp_path, np_rng):
    """Build a miniature WHU/CD tree and exercise the file-backed datasets."""
    root = tmp_path
    d = root / "WHU-AB" / "train"
    for sub in ("A", "B", "A_label", "label", "list"):
        (d / sub).mkdir(parents=True)
    names = [f"{i}.png" for i in range(3)]
    for n in names:
        arr = (np_rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / "A" / n)
        Image.fromarray(arr).save(d / "B" / n)
        lab = (np_rng.uniform(0, 1, (16, 16)) > 0.5).astype(np.uint8) * 255
        Image.fromarray(np.stack([lab] * 3, -1)).save(d / "A_label" / n)
        Image.fromarray(np.stack([lab] * 3, -1)).save(d / "label" / n)
    write_list(names, str(d / "list" / "train.txt"))

    whu = WHUDataset(str(root), "WHU-AB", "train")
    s = whu[0]
    assert s["image"].shape == (16, 16, 3) and s["label"].max() <= 1

    cd = CDDataset(str(root), "WHU-AB", "train")
    s = cd[0]
    assert s["A"].shape == (16, 16, 3) and s["label"].shape == (16, 16, 1)
    assert set(np.unique(s["label"])) <= {0.0, 1.0}


def test_tiled_inference_roundtrip(np_rng):
    from stcd_tpu.data.tiled_inference import extract_tiles, predict_scene, stitch_tiles

    img = np_rng.uniform(0, 1, (70, 90, 3)).astype(np.float32)
    tiles, origins = extract_tiles(img, tile=32, stride=32)
    rec = stitch_tiles(tiles, origins, img.shape[:2])
    np.testing.assert_allclose(rec, img, atol=1e-6)  # identity fn stitches back

    # scene prediction with a trivial channel-mean "model"
    def predict(a, b):
        return jnp.mean((a + b) / 2, axis=-1, keepdims=True)

    imgb = np_rng.uniform(0, 1, (70, 90, 3)).astype(np.float32)
    out = predict_scene(predict, img, imgb, tile=32, stride=16, batch=4)
    assert out.shape == (70, 90, 1)
    expected = ((img + imgb) / 2).mean(-1, keepdims=True)
    np.testing.assert_allclose(out, expected, atol=1e-5)

    # regression: remainder smaller than the pad (9 tiles, batch 8) — the
    # short-batch padding must be full-size or tiles are silently dropped
    img9 = np_rng.uniform(0, 1, (96, 96, 3)).astype(np.float32)
    out9 = predict_scene(lambda a: jnp.mean(a, -1, keepdims=True),
                         img9, tile=32, stride=32, batch=8)
    np.testing.assert_allclose(out9, img9.mean(-1, keepdims=True), atol=1e-5)


def test_uint8_transfer_path_matches_float(tmp_path):
    """set_uint8_transfer ships uint8 to the device; the jitted step's
    to_float01 must make it numerically identical to the float32 path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from stcd_tpu.data import io as dio
    from stcd_tpu.data.augment import eval_preprocess, train_augment

    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 256, (16, 16, 3), np.uint8)
    img_f = img_u8.astype(np.float32) / 255.0
    np.testing.assert_allclose(
        np.asarray(eval_preprocess(jnp.asarray(img_u8))),
        np.asarray(eval_preprocess(jnp.asarray(img_f))), atol=1e-6)
    key = jax.random.PRNGKey(0)
    np.testing.assert_allclose(
        np.asarray(train_augment(key, jnp.asarray(img_u8))),
        np.asarray(train_augment(key, jnp.asarray(img_f))), atol=1e-5)

    # file readers honor the switch and the binarization stays identical
    from PIL import Image
    p = tmp_path / "x.png"
    Image.fromarray(img_u8).save(p)
    lp = tmp_path / "l.png"
    Image.fromarray((rng.integers(0, 2, (16, 16), np.uint8) * 255)).save(lp)
    try:
        dio.set_uint8_transfer(True)
        assert dio.read_image(str(p)).dtype == np.uint8
        lab_u8 = dio.read_label(str(lp))
        assert lab_u8.dtype == np.uint8 and set(np.unique(lab_u8)) <= {0, 1}
    finally:
        dio.set_uint8_transfer(False)
    assert dio.read_image(str(p)).dtype == np.float32
    np.testing.assert_array_equal(dio.read_label(str(lp)),
                                  lab_u8.astype(np.float32))
