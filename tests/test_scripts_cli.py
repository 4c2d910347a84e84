"""CLI end-to-end: stage-2 script on a miniature on-disk dataset tree,
exercising the reference's file-layout conventions + flag surface."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_tree(root, n=4, size=32):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = os.path.join(root, "LEVIR", split)
        for sub in ("A", "B", "pseudo_label_WHU", "label", "list"):
            os.makedirs(os.path.join(d, sub), exist_ok=True)
        names = [f"{i}.png" for i in range(n)]
        for name in names:
            img = (rng.uniform(0, 1, (size, size, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(d, "A", name))
            Image.fromarray(img[::-1]).save(os.path.join(d, "B", name))
            lab = ((rng.uniform(0, 1, (size, size)) > 0.7) * 255).astype(np.uint8)
            lab3 = np.stack([lab] * 3, -1)
            Image.fromarray(lab3).save(os.path.join(d, "pseudo_label_WHU", name))
            Image.fromarray(lab3).save(os.path.join(d, "label", name))
        with open(os.path.join(d, "list", split + ".txt"), "w") as f:
            f.write("\n".join(names))


@pytest.mark.slow
def test_train_pse_cd_cli(tmp_path):
    _make_tree(str(tmp_path))
    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_pse_cd.py"),
         "--root_path", str(tmp_path), "--dataset_name", "LEVIR",
         "--CDdataset_name", "LEVIR", "--n_epochs", "1", "--batch_size", "2",
         "--img_height", "32", "--img_width", "32", "--encoder", "resnet18",
         "--decoder_channels", "16,12,8,6,4",
         "--save_name", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "best cd IoU" in out.stdout
    assert (tmp_path / "run" / "last_ckpt").exists()


@pytest.mark.slow
def test_train_pse_cd_cli_tensor_parallel(tmp_path):
    """--model_axis: stage-2 training with the tensor-parallel sharding
    map (wide conv kernels + transformer Dense rules over 'model';
    scripts/common.place_state) on a 2(data) x 2(model) virtual mesh."""
    _make_tree(str(tmp_path))
    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1",
               STCD_CPU_DEVICES="4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_pse_cd.py"),
         "--root_path", str(tmp_path), "--dataset_name", "LEVIR",
         "--CDdataset_name", "LEVIR", "--n_epochs", "1", "--batch_size", "2",
         "--img_height", "32", "--img_width", "32", "--encoder", "resnet18",
         "--decoder_channels", "16,12,8,6,4",
         "--data_axis", "2", "--model_axis", "2",
         "--save_name", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "best cd IoU" in out.stdout
    assert (tmp_path / "run" / "last_ckpt").exists()


@pytest.mark.slow
def test_train_ffctl_cli(tmp_path):
    """The reference's alternate train_ffctl loop (train_stcd.py:229-331,
    dead in the ref's own live path): FFCDataset pairs labeled from
    ff_label/, plain BCE_DICE(sigmoid(diff)) loss, FFCTLCD model."""
    _make_tree(str(tmp_path))
    for split in ("train", "val"):  # ff_label/ = generated pseudo labels
        d = os.path.join(str(tmp_path), "LEVIR", split)
        os.makedirs(os.path.join(d, "ff_label"), exist_ok=True)
        for name in os.listdir(os.path.join(d, "label")):
            os.link(os.path.join(d, "label", name),
                    os.path.join(d, "ff_label", name))
    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_ffctl.py"),
         "--root_path", str(tmp_path), "--dataset_name", "LEVIR",
         "--CDdataset_name", "LEVIR", "--n_epochs", "1", "--batch_size", "2",
         "--img_height", "32", "--img_width", "32", "--encoder", "resnet18",
         "--decoder_channels", "16,12,8,6,4",
         "--save_name", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "best cd IoU" in out.stdout
    assert (tmp_path / "run" / "last_ckpt").exists()


@pytest.mark.slow
def test_train_pse_cd_cli_spatial(tmp_path):
    """--space_axis: the stage-2 script trains with image rows sharded
    over a 2(data) x 2(space) virtual-CPU mesh (spatial partitioning;
    stcd_tpu/parallel/mesh.py 'space' axis). Forces the jnp augmentation
    path per scripts/common.py make_mesh."""
    _make_tree(str(tmp_path))
    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1",
               STCD_CPU_DEVICES="4")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_pse_cd.py"),
         "--root_path", str(tmp_path), "--dataset_name", "LEVIR",
         "--CDdataset_name", "LEVIR", "--n_epochs", "1", "--batch_size", "2",
         "--img_height", "32", "--img_width", "32", "--encoder", "resnet18",
         "--decoder_channels", "16,12,8,6,4",
         "--data_axis", "2", "--space_axis", "2",
         "--save_name", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "best cd IoU" in out.stdout
    assert (tmp_path / "run" / "last_ckpt").exists()


@pytest.mark.slow
@pytest.mark.parametrize("int8", [False, True])
def test_predict_cli(tmp_path, int8):
    """Whole-scene inference CLI: checkpoint -> change PNG on an odd-sized
    scene with overlapping tiles; --int8 exercises the quantized serving
    path (calibration on the scene's own tiles, stcd_tpu/serving)."""
    import numpy as np
    from PIL import Image
    import jax
    import jax.numpy as jnp
    import optax
    import stcd_tpu
    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.state import create_train_state

    model = stcd_tpu.SegCD(encoder_name="resnet18", classes=1,
                           decoder_channels=(32, 24, 16, 12, 8))
    x = jnp.zeros((1, 32, 32, 3))
    state = create_train_state(model, jax.random.PRNGKey(0), (x, x),
                               optax.sgd(0.0))
    CheckpointManager(str(tmp_path / "ck")).save_best(state, 0.5)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (70, 80, 3), np.uint8)).save(
        tmp_path / "a.png")
    Image.fromarray(rng.integers(0, 256, (70, 80, 3), np.uint8)).save(
        tmp_path / "b.png")
    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "predict.py"),
         "--image_a", str(tmp_path / "a.png"),
         "--image_b", str(tmp_path / "b.png"),
         "--load_path", str(tmp_path / "ck"),
         "--out", str(tmp_path / "change.png"),
         "--encoder", "resnet18", "--decoder_channels", "32,24,16,12,8",
         "--tile", "32", "--stride", "16"] + (["--int8"] if int8 else []),
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert Image.open(tmp_path / "change.png").size == (80, 70)
    if int8:
        assert "conv sites quantized" in out.stdout, out.stdout


def test_export_model_roundtrip(tmp_path):
    """scripts/export_model.py: StableHLO export of a trained checkpoint,
    deserialized output matches the live model's eval forward."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    import stcd_tpu
    from stcd_tpu.train.state import create_train_state, adam_poly
    from stcd_tpu.train.checkpoint import CheckpointManager
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from export_model import build_export

    model = stcd_tpu.SegCD(encoder_name="resnet18", classes=1,
                           decoder_channels=(32, 24, 16, 12, 8))
    state = create_train_state(model, jax.random.PRNGKey(3),
                               (jnp.zeros((1, 32, 32, 3)),) * 2,
                               adam_poly(1e-3, 1, 1))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    exported = build_export(model, variables, 32, 32, batch=2, normalize=False)
    blob = exported.serialize()
    rt = jexport.deserialize(blob)

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    got = rt.call(a, b)
    want = model.apply(variables, a, b)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


@pytest.mark.slow
def test_evaluate_cli(tmp_path):
    """scripts/evaluate.py end-to-end: best-checkpoint load, val metrics,
    and the --save_preds prediction dump (the reference's inference
    entry, SURVEY.md §3.5)."""
    import jax
    import jax.numpy as jnp
    import optax

    from stcd_tpu.models import SegCD
    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.state import create_train_state

    _make_tree(str(tmp_path))
    dec = (16, 12, 8, 6, 4)
    model = SegCD(encoder_name="resnet18", classes=1, decoder_channels=dec)
    ex = jnp.zeros((1, 32, 32, 3))
    state = create_train_state(model, jax.random.PRNGKey(0), (ex, ex),
                               optax.sgd(0.0))
    mgr = CheckpointManager(str(tmp_path / "run"))
    mgr.save_best(state, 0.42)

    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate.py"),
         "--root_path", str(tmp_path), "--dataset_name", "LEVIR",
         "--split", "val", "--batch_size", "2",
         "--img_height", "32", "--img_width", "32", "--encoder", "resnet18",
         "--decoder_channels", ",".join(map(str, dec)),
         "--load_path", str(tmp_path / "run"),
         "--save_preds", str(tmp_path / "preds")],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "42.00_best_model" in out.stdout
    assert "F1" in out.stdout and "IoU" in out.stdout
    dumped = os.listdir(tmp_path / "preds")
    assert len(dumped) == 4 and all(n.endswith(".png") for n in dumped)

    # --int8 serving mode: quantized conv compute, same metric protocol
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate.py"),
         "--root_path", str(tmp_path), "--dataset_name", "LEVIR",
         "--split", "val", "--batch_size", "2",
         "--img_height", "32", "--img_width", "32", "--encoder", "resnet18",
         "--decoder_channels", ",".join(map(str, dec)),
         "--load_path", str(tmp_path / "run"), "--int8"],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "conv sites quantized" in out.stdout
    assert "F1" in out.stdout and "IoU" in out.stdout


@pytest.mark.slow
def test_train_cd_cli_and_zoo_predict(tmp_path):
    """scripts/train_cd.py — the CDTrainer zoo CLI (the reference's
    intended-but-dead main_cd-style entry point, ref models/trainer.py:
    22-371): trains SiamUnet_abs on the on-disk CDDataset tree with
    on-device augmentation, writes best/last ckpts + curves; --eval_only
    reloads weights-only (optimizer-agnostic); scripts/predict.py
    --net_G then runs whole-scene tiled inference straight from the
    CDTrainer checkpoint."""
    _make_tree(str(tmp_path))
    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1")
    ck = tmp_path / "run"
    base = [sys.executable, os.path.join(REPO, "scripts", "train_cd.py"),
            "--root_path", str(tmp_path), "--dataset_name", "LEVIR",
            "--net_G", "SiamUnet_abs", "--img_size", "32",
            "--max_epochs", "1", "--batch_size", "2", "--optimizer",
            "adamw", "--lr", "1e-3", "--augment",
            "--checkpoint_dir", str(ck)]
    out = subprocess.run(base, capture_output=True, text=True, timeout=560,
                         env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "val scores:" in out.stdout
    assert (ck / "best_ckpt").exists()
    assert (ck / "val_acc.npy").exists()

    # --eval_only with a DIFFERENT optimizer (the sgd default): weights-
    # only load must not depend on the training run's opt_state structure
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_cd.py"),
         "--net_G", "SiamUnet_abs", "--img_size", "32", "--batch_size", "2",
         "--root_path", str(tmp_path), "--dataset_name", "LEVIR",
         "--checkpoint_dir", str(ck), "--eval_only"],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "val scores:" in out.stdout

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "predict.py"),
         "--net_G", "SiamUnet_abs", "--load_path", str(ck),
         "--image_a", str(tmp_path / "LEVIR" / "train" / "A" / "0.png"),
         "--image_b", str(tmp_path / "LEVIR" / "train" / "B" / "0.png"),
         "--out", str(tmp_path / "change.png"),
         "--tile", "32", "--stride", "32"],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "best_ckpt" in out.stdout
    assert (tmp_path / "change.png").exists()


@pytest.mark.slow
def test_export_zoo_int8_roundtrip(tmp_path):
    """VERDICT r4 item 7: export widened to the zoo and int8 — the
    exported StableHLO artifact (a define_G model, int8 serving forward,
    calibration scales baked in) must produce the SAME probabilities as
    the live predict.py quantized path on the same tiles."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from stcd_tpu.models.factory import define_G
    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.state import adam_poly, create_train_state

    model = define_G("SiamUnet_conc", n_class=2)
    state = create_train_state(model, jax.random.PRNGKey(3),
                               (jnp.zeros((1, 32, 32, 3)),) * 2,
                               adam_poly(1e-3, 1, 1))
    mgr = CheckpointManager(str(tmp_path / "run"))
    mgr.save_last(state, 0, 0.5, 0, name="best_ckpt")

    rng = np.random.default_rng(1)
    ca = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    cb = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    np.savez(tmp_path / "calib.npz", A=ca, B=cb)

    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_model.py"),
         "--load_path", str(tmp_path / "run"),
         "--net_G", "SiamUnet_conc", "--int8",
         "--img_height", "32", "--img_width", "32", "--batch_size", "2",
         "--calib_npz", str(tmp_path / "calib.npz"),
         "--out", str(tmp_path / "zoo_int8.stablehlo")],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "conv sites quantized" in out.stdout, out.stdout

    # live reference: the exact predict.py --int8 path on the same tiles
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import predict
    from stcd_tpu.serving import calibrate_conv_scales, quantize_fn

    class A:
        net_G = "SiamUnet_conc"
        n_class = 2
        embed_dim = 64
        tile = 32
        bf16 = False

    base_fn = predict.make_base_fn(A, state)
    scales = calibrate_conv_scales(base_fn,
                                   [(jnp.asarray(ca), jnp.asarray(cb))])
    live = jax.jit(quantize_fn(base_fn, scales))(jnp.asarray(ca),
                                                 jnp.asarray(cb))

    rt = jexport.deserialize(
        open(tmp_path / "zoo_int8.stablehlo", "rb").read())
    got = rt.call(jnp.asarray(ca), jnp.asarray(cb))
    np.testing.assert_allclose(np.asarray(got), np.asarray(live),
                               atol=1e-5)


@pytest.mark.slow
def test_train_pse_cd_cli_composed_dp_tp_sp(tmp_path):
    """Round 5: --space_axis composes with --model_axis on the CLI —
    the run routes through the manual shard_map spatial step builders
    (parallel/spatial.py) on a 2x2x2 data x model x space mesh."""
    _make_tree(str(tmp_path), size=64)
    env = dict(os.environ, JAX_PLATFORMS="cpu", STCD_FORCE_CPU="1",
               STCD_CPU_DEVICES="8")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_pse_cd.py"),
         "--root_path", str(tmp_path), "--dataset_name", "LEVIR",
         "--CDdataset_name", "LEVIR", "--n_epochs", "1", "--batch_size", "4",
         "--img_height", "64", "--img_width", "64", "--encoder", "resnet18",
         "--decoder_channels", "32,24,16,12,8",
         "--data_axis", "2", "--model_axis", "2", "--space_axis", "2",
         "--save_name", str(tmp_path / "run_sp")],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "manual shard_map halo exchange" in out.stdout, out.stdout
    assert "best cd IoU" in out.stdout
    assert (tmp_path / "run_sp" / "last_ckpt").exists()
