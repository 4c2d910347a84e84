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
