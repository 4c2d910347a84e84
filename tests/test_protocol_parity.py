"""END-TO-END eval-protocol parity: a reference-style torch SegCD
checkpoint evaluated by (a) a faithful torch reimplementation of the
reference protocol (ImageNet-normalize -> forward -> sigmoid(diff)>0.5 ->
float64 confusion matrix -> F1/IoU, ref train_stcd.py:464-510) and (b)
our full scripts/evaluate.py CLI with the converted checkpoint, on the
same on-disk dataset. The F1/IoU numbers must agree — this is the
'switch from the reference' contract (BASELINE.md) minus real data."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
torch = pytest.importorskip("torch")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _make_dataset(root, n=8, size=32, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "LEVIR", "val")
    for sub in ("A", "B", "label", "list"):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
    names = []
    for i in range(n):
        name = f"{i}.png"
        a = rng.integers(0, 256, (size, size, 3), np.uint8)
        b = np.clip(a.astype(np.int32)
                    + rng.integers(-60, 60, a.shape), 0, 255).astype(np.uint8)
        lab = (rng.random((size, size)) > 0.7).astype(np.uint8) * 255
        Image.fromarray(a).save(os.path.join(d, "A", name))
        Image.fromarray(b).save(os.path.join(d, "B", name))
        Image.fromarray(np.stack([lab] * 3, -1)).save(
            os.path.join(d, "label", name))
        names.append(name)
    with open(os.path.join(d, "list", "val.txt"), "w") as f:
        f.write("\n".join(names))
    return d


def _torch_protocol_eval(model, data_dir):
    """The reference's eval loop math on the torch model."""
    from PIL import Image
    cm = np.zeros((2, 2), np.float64)
    names = open(os.path.join(data_dir, "list", "val.txt")).read().split()
    model.eval()
    for name in names:
        def load(sub):
            arr = np.asarray(Image.open(os.path.join(data_dir, sub, name)
                                        ).convert("RGB"), np.float32) / 255.0
            arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
            return torch.from_numpy(arr.transpose(2, 0, 1))[None]
        lab = np.asarray(Image.open(os.path.join(data_dir, "label", name)
                                    ).convert("RGB"))[..., 0]
        lab = (lab >= 1).astype(np.int64)
        with torch.no_grad():
            _, _, diff = model(load("A"), load("B"))
            pred = (torch.sigmoid(diff)[0, 0].numpy() > 0.5).astype(np.int64)
        # ref SegmentationMetric: bincount(2*label+pred) (train_sup.py:245-252)
        cm += np.bincount(2 * lab.ravel() + pred.ravel(), minlength=4
                          ).reshape(2, 2).astype(np.float64)
    tp = cm[1, 1]
    fp = cm[0, 1]
    fn = cm[1, 0]
    precision = tp / max(tp + fp, 1e-12)
    recall = tp / max(tp + fn, 1e-12)
    f1 = 2 * precision * recall / max(precision + recall, 1e-12)
    iou = tp / max(tp + fp + fn, 1e-12)
    return f1, iou


def test_eval_protocol_parity(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_convert import TVSegCD

    import jax
    import jax.numpy as jnp
    import optax
    import stcd_tpu
    from stcd_tpu.convert.torch_to_flax import convert_unetseg
    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.state import create_train_state

    torch.manual_seed(0)
    ref = TVSegCD()
    # non-trivial BN stats
    ref.train()
    with torch.no_grad():
        for _ in range(3):
            ref(torch.randn(2, 3, 32, 32), torch.randn(2, 3, 32, 32))
    data_dir = _make_dataset(str(tmp_path))
    want_f1, want_iou = _torch_protocol_eval(ref, data_dir)

    params, stats = convert_unetseg(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        layers_per_stage=(2, 2, 2, 2))
    model = stcd_tpu.SegCD(encoder_name="resnet18", classes=1,
                           decoder_channels=(64, 32, 24, 16, 8))
    x = jnp.zeros((1, 32, 32, 3))
    state = create_train_state(model, jax.random.PRNGKey(0), (x, x),
                               optax.sgd(0.0))
    state = state.replace(params=jax.tree_util.tree_map(jnp.asarray, params),
                          batch_stats=jax.tree_util.tree_map(jnp.asarray, stats))
    CheckpointManager(str(tmp_path / "ck")).save_best(state, 0.0)

    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate.py"),
         "--root_path", str(tmp_path), "--dataset_name", "LEVIR",
         "--split", "val", "--load_path", str(tmp_path / "ck"),
         "--batch_size", "4", "--img_height", "32", "--img_width", "32",
         "--encoder", "resnet18", "--decoder_channels", "64,32,24,16,8"],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    got = {m.group(1): float(m.group(2))
           for m in re.finditer(r"(\w+): ([\d.]+)", out.stdout)}
    assert abs(got["F1"] - want_f1) < 1e-3, (got, want_f1)
    assert abs(got["IoU"] - want_iou) < 1e-3, (got, want_iou)
