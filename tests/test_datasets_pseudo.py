"""Pseudo-change pair-synthesis logic (ref data/dataset.py SC_Dataset
:260-376 and LEVIR_Dataset :424-547): changed tiles pair with the
inpainted WHU-A image and take the seg label as change label; unchanged
tiles pair with themselves and the all-zero label."""

import os

import numpy as np
import pytest
from PIL import Image

from stcd_tpu.data.datasets import LEVIRDataset, SCDataset, PSEDataset, FFCDataset
from stcd_tpu.data.io import write_list


def _img(rng, v=None):
    if v is not None:
        return np.full((8, 8, 3), v, np.uint8)
    return (rng.uniform(0, 1, (8, 8, 3)) * 255).astype(np.uint8)


@pytest.fixture
def tree(tmp_path, np_rng):
    d = tmp_path / "WHU-AB" / "train"
    for sub in ("A", "B", "A_label", "WHU-A", "pseudo_label",
                "pseudo_label_WHU", "ff_label", "label", "list"):
        (d / sub).mkdir(parents=True)
    names = ["0.tif", "1.tif"]
    for i, n in enumerate(names):
        Image.fromarray(_img(np_rng, v=10 + i)).save(d / "A" / n)
        Image.fromarray(_img(np_rng, v=100 + i)).save(d / "B" / n)
        lab = np.zeros((8, 8, 3), np.uint8)
        lab[:4] = 255
        Image.fromarray(lab).save(d / "A_label" / n)
        Image.fromarray(lab).save(d / "pseudo_label_WHU" / n)
        Image.fromarray(lab).save(d / "ff_label" / n)
        Image.fromarray(lab).save(d / "pseudo_label" / n)
    # all-zero no-change label file "3.tif" (ref :299) and "0.tif" for semi
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "A_label" / "3.tif")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "label" / "0.tif")
    # inpainted building-free versions
    Image.fromarray(_img(np_rng, v=200)).save(d / "WHU-A" / "0.png")
    Image.fromarray(_img(np_rng, v=201)).save(d / "WHU-A" / "1.png")
    write_list(["0.tif"], str(d / "list" / "changed.txt"))
    write_list(["0.tif"], str(d / "list" / "reliable_ids.txt"))
    return str(tmp_path)


def test_sc_dataset_changed_vs_unchanged(tree):
    ds = SCDataset(tree, "WHU-AB", "train")
    changed = ds[0]  # 0.tif in changed.txt
    # B must be the WHU-A inpainted image (value 200), c_label = seg label
    assert np.allclose(changed["B"][0, 0] * 255, 200, atol=1)
    assert changed["c_label"].max() == 1 and changed["c_label"][:4].min() == 1
    assert changed["s_label_B"].max() == 0  # nc label
    unchanged = ds[1]
    np.testing.assert_array_equal(unchanged["A"], unchanged["B"])  # B = A
    assert unchanged["c_label"].max() == 0  # all-zero 3.tif
    assert unchanged["s_label_B"].max() == 1  # = seg label


def test_sc_dataset_semi_branch(tree):
    ds = SCDataset(tree, "WHU-AB", "train", semi=True)
    reliable = ds[0]  # in reliable_ids.txt
    assert np.allclose(reliable["CA"][0, 0] * 255, 10, atol=1)  # real A
    assert np.allclose(reliable["CB"][0, 0] * 255, 100, atol=1)  # real B
    assert reliable["CL"].max() == 1  # pseudo_label
    unreliable = ds[1]
    np.testing.assert_array_equal(unreliable["CA"], unreliable["CB"])  # (B, B)
    assert unreliable["CL"].max() == 0  # zero label/0.tif


def test_levir_dataset_9tuple(tree):
    ds = LEVIRDataset(tree, "WHU-AB", "train")
    s = ds[0]
    for k in ("A", "B", "s_label_A", "s_label_B", "c_label", "CA", "CB", "CL"):
        assert k in s, k
    assert s["CL"].shape == (8, 8, 1)
    assert np.allclose(s["CA"][0, 0] * 255, 10, atol=1)
    assert np.allclose(s["CB"][0, 0] * 255, 100, atol=1)
    assert len(ds) == 2


def test_pse_and_ffc(tree):
    pse = PSEDataset(tree, "WHU-AB", "train")[0]
    assert pse["label"].max() == 1  # pseudo_label_WHU
    ffc = FFCDataset(tree, "WHU-AB", "train")[0]
    assert ffc["label"].max() == 1  # ff_label
