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


def test_gaussian_blur_edge_replicate_preserves_constant():
    """PIL GaussianBlur extends edge pixels — a constant image must come
    back EXACTLY constant (zero padding would darken a radius-wide
    border; round-2 review finding)."""
    img = jnp.full((16, 16, 3), 0.7, jnp.float32)
    out = gaussian_blur(jax.random.PRNGKey(3), img, p=1.0)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)


def test_train_augment_pair_shares_jitter_coin():
    """The reference gates ColorJitter with ONE coin per temporal pair
    (both images jittered or neither, ref data/dataset.py:241-243);
    exactly-one-jittered must never occur. For each key, the pair output
    must equal the (gate=True, gate=True) or (gate=False, gate=False)
    branch — never a mixed one."""
    from stcd_tpu.data.augment import (_train_augment_single,
                                       train_augment_pair)

    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(size=(12, 12, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(12, 12, 3)).astype(np.float32))
    gates_seen = set()
    for seed in range(8):
        key = jax.random.PRNGKey(seed)
        out_a, out_b = train_augment_pair(key, a, b, jitter_p=0.5)
        _, ka, kb = jax.random.split(key, 3)
        for gate in (False, True):
            ga = _train_augment_single(ka, a, 0.5, jnp.asarray(gate))
            gb = _train_augment_single(kb, b, 0.5, jnp.asarray(gate))
            if np.allclose(np.asarray(out_a), np.asarray(ga), atol=1e-6):
                # the SAME gate must explain the other image
                np.testing.assert_allclose(np.asarray(out_b), np.asarray(gb),
                                           atol=1e-6)
                gates_seen.add(gate)
    assert gates_seen == {False, True}, (
        f"p=0.5 over 8 keys should exercise both branches: {gates_seen}")


def test_semi_cd_train_cm_covers_full_concat_batch():
    """ref train_stcd.py:436-437 accumulates the train confusion matrix
    over the FULL concatenated batch (synthesized + real halves) — the
    CM pixel total must be 2*N*H*W, not N*H*W."""
    import optax

    from stcd_tpu.models import SegCD
    from stcd_tpu.train.state import create_train_state
    from stcd_tpu.train.steps import make_semi_cd_steps

    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(16, 12, 10, 8, 8))
    n, hw = 2, 32
    img = lambda s: jnp.asarray(np.random.default_rng(s).uniform(
        size=(n, hw, hw, 3)).astype(np.float32))
    lab = lambda s: jnp.asarray((np.random.default_rng(s).uniform(
        size=(n, hw, hw, 1)) > 0.7).astype(np.float32))
    batch = {"A": img(0), "B": img(1), "CA": img(2), "CB": img(3),
             "s_label_A": lab(4), "c_label": lab(5), "CL": lab(6)}
    for accum in (1, 2):
        # fresh state per variant: train_step donates its input state
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (batch["A"], batch["B"]), optax.adam(1e-3))
        train_step, _ = make_semi_cd_steps(model, augment=False,
                                           accum_steps=accum)
        _, metrics = train_step(state, batch, jax.random.PRNGKey(1))
        assert int(np.asarray(metrics["cm"]).sum()) == 2 * n * hw * hw, (
            f"accum={accum}: CM must cover both halves")
