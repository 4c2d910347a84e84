"""Golden-value tests for the loss layer vs torch-computed references.

The torch expressions reproduce the reference math (train_sup.py:312-338,
models/losses.py) independently — no reference code is imported.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from stcd_tpu import losses as L


@pytest.fixture
def probs_target(np_rng):
    p = np_rng.uniform(0.02, 0.98, size=(4, 16, 16, 1)).astype(np.float32)
    t = (np_rng.uniform(size=(4, 16, 16, 1)) > 0.7).astype(np.float32)
    return p, t


def test_bce_dice_matches_torch(probs_target):
    p, t = probs_target
    tp, tt = torch.tensor(p), torch.tensor(t)
    expected_bce = torch.nn.BCELoss(reduction="mean")(tp, tt).item()
    m1, m2 = tp.view(-1), tt.view(-1)
    inter = (m1 * m2).sum()
    expected_dice = (1 - (2.0 * inter + 1.0) / (m1.sum() + m2.sum() + 1.0)).item()

    np.testing.assert_allclose(float(L.bce_loss(p, t)), expected_bce, rtol=1e-5)
    np.testing.assert_allclose(float(L.dice_loss(p, t)), expected_dice, rtol=1e-5)
    np.testing.assert_allclose(float(L.bce_dice(p, t)),
                               expected_bce + expected_dice, rtol=1e-5)
    np.testing.assert_allclose(float(L.cd_loss(p, t)),
                               expected_bce + expected_dice, rtol=1e-5)


def test_cross_entropy_matches_torch(np_rng):
    logits = np_rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    target = np_rng.integers(0, 3, size=(2, 8, 8)).astype(np.int64)
    target[0, 0, :4] = 255  # ignore pixels
    expected = F.cross_entropy(
        torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(target),
        ignore_index=255).item()
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_cross_entropy_resizes_logits(np_rng):
    logits = np_rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    target = np_rng.integers(0, 3, size=(2, 8, 8)).astype(np.int64)
    up = F.interpolate(torch.tensor(logits).permute(0, 3, 1, 2), size=(8, 8),
                       mode="bilinear", align_corners=True)
    expected = F.cross_entropy(up, torch.tensor(target), ignore_index=255).item()
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_cross_entropy_class_weights_match_torch(np_rng):
    """Per-class weight path (torch weighted-mean semantics), combined with
    ignore_index — exercises the one-hot weight contraction that replaced
    the take_along_axis gather (TPU scalar-path fix, round 2)."""
    logits = np_rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    target = np_rng.integers(0, 4, size=(2, 8, 8)).astype(np.int64)
    target[1, 2, :3] = 255
    w = np.array([1.0, 2.0, 0.5, 1.5], np.float32)
    expected = F.cross_entropy(
        torch.tensor(logits).permute(0, 3, 1, 2), torch.tensor(target),
        weight=torch.tensor(w), ignore_index=255).item()
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(target),
                                weight=jnp.asarray(w)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_contrastive_loss_matches_reference_math(np_rng):
    """ref train_stcd.py:334-385."""
    n = 3
    pred = np_rng.uniform(0, 1, size=(2 * n, 8, 8, 1)).astype(np.float32)
    cd = (np_rng.uniform(size=(n, 8, 8, 1)) > 0.5).astype(np.float32)
    pse = (np_rng.uniform(size=(n, 8, 8, 1)) > 0.5).astype(np.float32)

    tp = torch.tensor(pred)
    cd_pred, pse_pred = tp[:n], tp[n:]
    cdt, pset = torch.tensor(cd), torch.tensor(pse)
    M = (cdt == pset).float()
    N = (cdt != pset).float()
    neg = torch.abs(cd_pred - 1)
    loss_pos = (F.mse_loss(pse_pred, cd_pred, reduction="none") * M).sum() / (M.sum() + 1e-8)
    loss_neg = (F.mse_loss(pse_pred, neg, reduction="none") * N).sum() / (N.sum() + 1e-8)
    expected = (loss_pos + loss_neg).item()

    got = float(L.contrastive_loss(jnp.asarray(pred), jnp.asarray(cd), jnp.asarray(pse)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_miou_mmiou_match_reference_math(np_rng):
    logits = np_rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
    target = np_rng.integers(0, 2, size=(2, 8, 8)).astype(np.int64)

    tl = torch.tensor(logits).permute(0, 3, 1, 2)
    tt = torch.tensor(target)
    inputs = F.softmax(tl, dim=1)
    one_hot = F.one_hot(tt, 2).permute(0, 3, 1, 2).float()
    inter = (inputs * one_hot).reshape(2, 2, -1).sum(2)
    union = (inputs + one_hot - inputs * one_hot).reshape(2, 2, -1).sum(2)
    expected_miou = (-torch.mean(inter / (union + 1e-8))).item()
    iou = inter / (union + 1e-8)
    expected_mmiou = (-iou.min() - iou.mean()).item()

    np.testing.assert_allclose(
        float(L.miou_loss(jnp.asarray(logits), jnp.asarray(target))),
        expected_miou, rtol=1e-5)
    np.testing.assert_allclose(
        float(L.mmiou_loss(jnp.asarray(logits), jnp.asarray(target))),
        expected_mmiou, rtol=1e-5)


def test_smp_dice_binary(np_rng):
    logits = np_rng.normal(size=(4, 8, 8, 1)).astype(np.float32)
    target = (np_rng.uniform(size=(4, 8, 8, 1)) > 0.5).astype(np.float32)
    p = torch.sigmoid(torch.tensor(logits)).view(-1)
    t = torch.tensor(target).view(-1)
    inter = (p * t).sum()
    card = p.sum() + t.sum()
    expected = (1 - (2 * inter) / card.clamp_min(1e-7)).item()
    got = float(L.DiceLoss(mode="binary")(jnp.asarray(logits), jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_smp_focal_binary(np_rng):
    logits = np_rng.normal(size=(4, 8, 8)).astype(np.float32)
    target = (np_rng.uniform(size=(4, 8, 8)) > 0.5).astype(np.float32)
    x, t = torch.tensor(logits), torch.tensor(target)
    logpt = F.binary_cross_entropy_with_logits(x, t, reduction="none")
    pt = torch.exp(-logpt)
    expected = ((1 - pt) ** 2.0 * logpt).mean().item()
    got = float(L.FocalLoss(mode="binary", gamma=2.0)(jnp.asarray(logits),
                                                      jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_smp_soft_ce(np_rng):
    logits = np_rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    target = np_rng.integers(0, 3, size=(4, 8, 8)).astype(np.int64)
    lsm = F.log_softmax(torch.tensor(logits), dim=-1)
    nll = F.nll_loss(lsm.reshape(-1, 3), torch.tensor(target).reshape(-1))
    smooth = -lsm.mean(-1).mean()
    expected = (0.9 * nll + 0.1 * smooth).item()
    got = float(L.SoftCrossEntropyLoss(smooth_factor=0.1)(jnp.asarray(logits),
                                                          jnp.asarray(target)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_smp_mcc(np_rng):
    pred = np_rng.uniform(size=(4, 8, 8, 1)).astype(np.float32)
    target = (np_rng.uniform(size=(4, 8, 8, 1)) > 0.5).astype(np.float32)
    got = float(L.MCCLoss()(jnp.asarray(pred), jnp.asarray(target)))
    p, t = torch.tensor(pred).view(4, -1), torch.tensor(target).view(4, -1)
    eps = 1e-5
    tp = (p * t).sum() + eps
    tn = ((1 - p) * (1 - t)).sum() + eps
    fp = (p * (1 - t)).sum() + eps
    fn = ((1 - p) * t).sum() + eps
    mcc = (tp * tn - fp * fn) / torch.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    np.testing.assert_allclose(got, (1 - mcc).item(), rtol=1e-5)


def test_lovasz_binary_nonnegative(np_rng):
    logits = np_rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    target = (np_rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32)
    val = float(L.LovaszLoss(mode="binary")(jnp.asarray(logits), jnp.asarray(target)))
    assert val >= 0.0


def test_focal_loss_reference_runs(np_rng):
    logits = np_rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
    target = np_rng.integers(0, 2, size=(2, 8, 8))
    val = float(L.focal_loss(jnp.asarray(logits), jnp.asarray(target), gamma=1.0))
    assert np.isfinite(val) and val > 0


def test_init_weights_pass(np_rng):
    import jax
    import jax.numpy as jnp
    from stcd_tpu.models.init import init_weights

    params = {"conv": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.ones((8,))},
              "bn": {"scale": jnp.full((8,), 2.0), "bias": jnp.full((8,), 2.0)}}
    out = init_weights(params, jax.random.PRNGKey(0), "normal", 0.02)
    k = np.asarray(out["conv"]["kernel"])
    assert abs(k.std() - 0.02) < 0.01 and abs(k.mean()) < 0.01
    assert np.allclose(np.asarray(out["conv"]["bias"]), 0)
    s = np.asarray(out["bn"]["scale"])
    assert abs(s.mean() - 1.0) < 0.1
    for kind in ("xavier", "kaiming", "orthogonal"):
        out = init_weights(params, jax.random.PRNGKey(1), kind)
        assert np.isfinite(np.asarray(out["conv"]["kernel"])).all()


def test_bce_grad_finite_at_saturation():
    """bf16 sigmoids reach exactly 0/1; BCE value AND grad must stay finite
    (regression: log(0) grad poisoned bf16 training with NaN)."""
    import jax

    probs = jnp.array([0.0, 1.0, 0.5, 1e-20], jnp.float32)
    target = jnp.array([1.0, 0.0, 1.0, 0.0], jnp.float32)
    val, grad = jax.value_and_grad(lambda p: L.bce_loss(p, target))(probs)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
    # torch-parity: the value clamp is -100 per element
    np.testing.assert_allclose(float(L.bce_loss(jnp.array([0.0]), jnp.array([1.0]))),
                               100.0, atol=1e-4)


def test_init_weights_leaves_layernorm_scales_alone():
    """ref networks.py:111-113 perturbs only BatchNorm2d weights; flax
    LayerNorm params are also named 'scale', so init_weights must use the
    batch_stats tree to tell them apart (review finding)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from stcd_tpu.models.init import init_weights

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Dense(4, name="fc")(x)
            x = nn.LayerNorm(name="ln")(x)
            x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
            return x

    m = Toy()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))
    out = init_weights(v["params"], jax.random.PRNGKey(1), "normal",
                       batch_stats=v["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out["ln"]["scale"]), 1.0)
    assert not np.allclose(np.asarray(out["bn"]["scale"]), 1.0)
    assert not np.allclose(np.asarray(out["fc"]["kernel"]),
                           np.asarray(v["params"]["fc"]["kernel"]))
