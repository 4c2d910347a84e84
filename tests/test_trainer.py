"""CDTrainer/CDEvaluator equivalents: smoke over the define_G zoo with a
tiny FC-Siam model (the reference trainer is dead code; ours must run)."""

import numpy as np
import pytest

from stcd_tpu.data.datasets import SyntheticCDDataset
from stcd_tpu.data.loader import DataLoader
from stcd_tpu.train.trainer import CDEvaluator, CDTrainer, TrainerConfig


@pytest.fixture
def loaders():
    ds = SyntheticCDDataset(length=4, size=32)
    return {"train": DataLoader(ds, 2, shuffle=True, prefetch=0),
            "val": DataLoader(ds, 2, prefetch=0)}


def test_cdtrainer_ce(tmp_path, loaders):
    cfg = TrainerConfig(net_G="SiamUnet_abs", n_class=2, img_size=32,
                        max_epochs=2, loss="ce", optimizer="adamw",
                        lr=1e-3, checkpoint_dir=str(tmp_path / "ck"),
                        vis_dir=str(tmp_path / "vis"))
    trainer = CDTrainer(cfg, loaders)
    state = trainer.train_models()
    assert (tmp_path / "ck" / "last_ckpt").exists()
    assert (tmp_path / "ck" / "val_acc.npy").exists()
    curve = np.load(tmp_path / "ck" / "val_acc.npy")
    assert len(curve) == 2

    # resume: epoch_to_start advances past max -> returns immediately
    trainer2 = CDTrainer(cfg, loaders)
    trainer2.train_models()
    assert trainer2.epoch_to_start == 2

    ev = CDEvaluator(cfg, loaders["val"])
    scores = ev.eval_models("best_ckpt")
    assert 0.0 <= scores["mf1"] <= 1.0
    import glob
    assert glob.glob(str(tmp_path / "vis" / "*.png"))


def test_cdtrainer_losses(tmp_path, loaders):
    for loss in ("bce", "cd_loss", "mmiou"):
        cfg = TrainerConfig(net_G="SiamUnet_abs",
                            n_class=1 if loss in ("bce", "cd_loss") else 2,
                            img_size=32, max_epochs=1, loss=loss, optimizer="sgd",
                            lr=1e-3, checkpoint_dir=str(tmp_path / f"ck_{loss}"),
                            vis_dir=str(tmp_path / "vis"))
        trainer = CDTrainer(cfg, loaders)
        trainer.train_models()


def test_cdtrainer_normalize_semantics(tmp_path, loaders):
    """normalize=True (the default; CLI datasets yield raw [0,1] images)
    must equal feeding eval_preprocess'd batches to a normalize=False
    trainer; augment=True must be deterministic in the step rng."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from stcd_tpu.data.augment import eval_preprocess

    cfg = TrainerConfig(net_G="SiamUnet_abs", n_class=2, img_size=32,
                        max_epochs=1, loss="ce", optimizer="adam", lr=1e-3,
                        checkpoint_dir=str(tmp_path / "a"),
                        vis_dir=str(tmp_path / "v"))
    t1 = CDTrainer(cfg, loaders)
    t2 = CDTrainer(dataclasses.replace(
        cfg, normalize=False, checkpoint_dir=str(tmp_path / "b")), loaders)

    batch = next(iter(loaders["val"]))
    a = jnp.asarray(batch["A"])
    b = jnp.asarray(batch["B"])
    label = jnp.asarray(batch["label"]).astype(jnp.float32)
    rng = jax.random.PRNGKey(0)
    _, loss1, cm1 = t1.train_step(t1._init_state(), a, b, label, rng)
    _, loss2, cm2 = t2.train_step(t2._init_state(), eval_preprocess(a),
                                  eval_preprocess(b), label, rng)
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-6)
    np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cm2))

    t3 = CDTrainer(dataclasses.replace(
        cfg, augment=True, checkpoint_dir=str(tmp_path / "c")), loaders)
    _, l_a, _ = t3.train_step(t3._init_state(), a, b, label, rng)
    _, l_b, _ = t3.train_step(t3._init_state(), a, b, label, rng)
    assert float(l_a) == float(l_b)  # same rng -> same augmentation draws
    _, l_c, _ = t3.train_step(t3._init_state(), a, b, label,
                              jax.random.PRNGKey(1))
    assert float(l_c) != float(l_a)  # different rng -> different draws


def test_cdevaluator_recovers_swap_window_crash(tmp_path, loaders):
    """CDEvaluator.load must evaluate from the 'ckpt.new' + '.new.ok'
    state a crash inside save_last's swap window leaves behind (review
    finding 1: a bare os.path.exists check refused to evaluate a
    recoverable checkpoint) — WITHOUT renaming anything: the evaluator is
    a reader, and a LIVE trainer may own the swap window concurrently
    (review finding 2: running repair() from the evaluator could
    quarantine a half-written '.new' and crash the trainer's save)."""
    import os

    cfg = TrainerConfig(net_G="SiamUnet_abs", n_class=2, img_size=32,
                        max_epochs=1, loss="ce", optimizer="adamw", lr=1e-3,
                        checkpoint_dir=str(tmp_path / "ck"),
                        vis_dir=str(tmp_path / "vis"))
    CDTrainer(cfg, loaders).train_models()

    ck = tmp_path / "ck"
    # simulate SIGKILL between rmtree(path) and rename(new_path, path)
    os.rename(ck / "best_ckpt", ck / "best_ckpt.new")
    (ck / "best_ckpt.new.ok").touch()

    scores = CDEvaluator(cfg, loaders["val"]).eval_models(save_vis=False)
    assert 0.0 <= scores["mf1"] <= 1.0
    # loaded IN PLACE: the reader must leave the swap-window files alone
    # (the trainer repairs them itself at resume time)
    assert (ck / "best_ckpt.new").exists()
    assert (ck / "best_ckpt.new.ok").exists()
    assert not (ck / "best_ckpt").exists()

    # the trainer-side resume path still repairs the same state
    t = CDTrainer(cfg, loaders)
    assert t.ckpt.repair("best_ckpt")
    assert (ck / "best_ckpt").exists()


def test_cdevaluator_never_quarantines_live_save(tmp_path, loaders):
    """A partial '<name>.new' without a marker is indistinguishable from a
    trainer mid-save. The evaluator must raise FileNotFoundError and MUST
    NOT rename it to '.corrupt' (that would crash the live trainer's
    rename(new_path, path) and quarantine a healthy in-progress save)."""
    import pytest

    cfg = TrainerConfig(net_G="SiamUnet_abs", n_class=2, img_size=32,
                        max_epochs=1, loss="ce", optimizer="adamw", lr=1e-3,
                        checkpoint_dir=str(tmp_path / "ck"),
                        vis_dir=str(tmp_path / "vis"))
    ck = tmp_path / "ck"
    ck.mkdir()
    partial = ck / "best_ckpt.new"  # half-written orbax dir, no marker
    partial.mkdir()
    (partial / "garbage").write_text("not a checkpoint")

    with pytest.raises(FileNotFoundError):
        CDEvaluator(cfg, loaders["val"]).load("best_ckpt")
    assert partial.exists()  # untouched
    assert not (ck / "best_ckpt.new.corrupt").exists()


def test_cdtrainer_tp_axis_matches_replicated(tmp_path):
    """TrainerConfig.tp_axis: a CDTrainer training BIT with attention/MLP
    Dense kernels sharded over a 4(data) x 2(model) mesh computes the
    same train-step loss/confusion and eval logits as the replicated
    trainer (VERDICT r2 item 1 at the CDTrainer user surface)."""
    import jax
    import jax.numpy as jnp
    from stcd_tpu.data.datasets import SyntheticCDDataset
    from stcd_tpu.data.loader import DataLoader
    from stcd_tpu.train.trainer import CDTrainer, TrainerConfig

    ds = SyntheticCDDataset(length=4, size=32)
    loaders = {"train": DataLoader(ds, 4, prefetch=0),
               "val": DataLoader(ds, 4, prefetch=0)}

    def make(tp):
        cfg = TrainerConfig(net_G="base_transformer_pos_s4_dd8", n_class=2,
                            img_size=32, max_epochs=1, loss="ce",
                            optimizer="adam", lr=1e-3, seed=11,
                            checkpoint_dir=str(tmp_path / f"ck{tp}"),
                            tp_axis=tp)
        return CDTrainer(cfg, loaders)

    t_rep, t_tp = make(1), make(2)
    assert t_tp._tp_mesh is not None and t_tp._tp_mesh.shape["model"] == 2
    batch = next(iter(loaders["train"]))
    a = jnp.asarray(batch["A"])
    b = jnp.asarray(batch["B"])
    label = jnp.asarray(batch["label"]).astype(jnp.float32)

    s_rep = t_rep._init_state()
    s_tp = t_tp._init_state()  # same seed -> identical init, TP-placed
    rng = jax.random.PRNGKey(0)
    s_rep, loss_rep, cm_rep = t_rep.train_step(s_rep, a, b, label, rng)
    s_tp, loss_tp, cm_tp = t_tp.train_step(s_tp, a, b, label, rng)
    np.testing.assert_allclose(float(loss_tp), float(loss_rep), rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(cm_tp), np.asarray(cm_rep))

    f_rep, _ = t_rep.eval_step(s_rep, a, b, label)
    f_tp, _ = t_tp.eval_step(s_tp, a, b, label)
    np.testing.assert_allclose(np.asarray(f_tp), np.asarray(f_rep),
                               rtol=2e-4, atol=2e-4)


def test_cdtrainer_tp_with_pp_matches_replicated(tmp_path):
    """tp_axis x pp_stages composed (2 data x 2 model x 2 stage): the
    TP-sharded decoder params flow through the GPipe shard_map restack;
    loss/confusion and eval logits must equal the plain trainer's."""
    import jax
    import jax.numpy as jnp
    from stcd_tpu.data.datasets import SyntheticCDDataset
    from stcd_tpu.data.loader import DataLoader
    from stcd_tpu.train.trainer import CDTrainer, TrainerConfig

    ds = SyntheticCDDataset(length=4, size=32)
    loaders = {"train": DataLoader(ds, 4, prefetch=0),
               "val": DataLoader(ds, 4, prefetch=0)}

    def make(tp, pp):
        cfg = TrainerConfig(net_G="base_transformer_pos_s4_dd8", n_class=2,
                            img_size=32, max_epochs=1, loss="ce",
                            optimizer="adam", lr=1e-3, seed=11,
                            checkpoint_dir=str(tmp_path / f"ck{tp}{pp}"),
                            tp_axis=tp, pp_stages=pp,
                            pp_microbatches=2 if pp > 1 else 0)
        return CDTrainer(cfg, loaders)

    t_rep, t_tppp = make(1, 1), make(2, 2)
    assert t_tppp._tp_mesh.shape == {"data": 2, "model": 2, "space": 1,
                                     "stage": 2}
    batch = next(iter(loaders["train"]))
    a = jnp.asarray(batch["A"])
    b = jnp.asarray(batch["B"])
    label = jnp.asarray(batch["label"]).astype(jnp.float32)

    s_rep = t_rep._init_state()
    s_c = t_tppp._init_state()
    rng = jax.random.PRNGKey(0)
    s_rep, loss_rep, cm_rep = t_rep.train_step(s_rep, a, b, label, rng)
    s_c, loss_c, cm_c = t_tppp.train_step(s_c, a, b, label, rng)
    np.testing.assert_allclose(float(loss_c), float(loss_rep), rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(cm_c), np.asarray(cm_rep))

    f_rep, _ = t_rep.eval_step(s_rep, a, b, label)
    f_c, _ = t_tppp.eval_step(s_c, a, b, label)
    np.testing.assert_allclose(np.asarray(f_c), np.asarray(f_rep),
                               rtol=2e-4, atol=2e-4)
