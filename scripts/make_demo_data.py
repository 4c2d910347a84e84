"""Generate a miniature synthetic WHU-AB + LEVIR tree exercising every
file-layout convention of the reference (SURVEY.md §2.2) so the full
3-stage pipeline can run end-to-end without the real datasets."""

import argparse
import os

import numpy as np
from PIL import Image


def _save(arr, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def make_tree(root: str, n: int = 8, size: int = 64, seed: int = 0):
    rng = np.random.default_rng(seed)

    def tile(v=None):
        base = (rng.uniform(0.2, 0.8, (size, size, 3)) * 255).astype(np.uint8)
        return base

    def blob_label():
        lab = np.zeros((size, size), np.uint8)
        y, x = rng.integers(4, size // 2, 2)
        h, w = rng.integers(size // 4, size // 2, 2)
        lab[y:y + h, x:x + w] = 255
        return lab

    for split, count in (("train", n), ("val", max(n // 2, 2))):
        # WHU-AB: seg pretrain + pseudo-change synthesis side
        whu = os.path.join(root, "WHU-AB", split)
        names = [f"{i}.tif" for i in range(count)]
        for nm in names:
            img = tile()
            lab = blob_label()
            lab3 = np.stack([lab] * 3, -1)
            _save(img, f"{whu}/A/{nm}")
            _save(lab3, f"{whu}/A_label/{nm}")
            # "inpainted building-free" B for changed tiles
            inp = img.copy()
            inp[lab > 0] = rng.integers(0, 255, 3, dtype=np.uint8)
            _save(inp, f"{whu}/WHU-A/{nm.replace('tif', 'png')}")
            _save(img, f"{whu}/B/{nm}")
            _save(lab3, f"{whu}/label/{nm}")
        _save(np.zeros((size, size, 3), np.uint8), f"{whu}/A_label/3.tif")
        _save(np.zeros((size, size, 3), np.uint8), f"{whu}/label/0.tif")
        os.makedirs(f"{whu}/list", exist_ok=True)
        open(f"{whu}/list/{split}.txt", "w").write("\n".join(names))
        open(f"{whu}/list/changed.txt", "w").write("\n".join(names[::2]))

        # LEVIR: CD side (real pairs + pseudo labels)
        lev = os.path.join(root, "LEVIR", split)
        lnames = [f"{i}.png" for i in range(count)]
        for nm in lnames:
            a = tile()
            lab = blob_label()
            b = a.copy()
            b[lab > 0] = rng.integers(0, 255, (int((lab > 0).sum()), 3),
                                      dtype=np.uint8)
            lab3 = np.stack([lab] * 3, -1)
            _save(a, f"{lev}/A/{nm}")
            _save(b, f"{lev}/B/{nm}")
            _save(lab3, f"{lev}/label/{nm}")
            _save(lab3, f"{lev}/pseudo_label_WHU/{nm}")
        os.makedirs(f"{lev}/list", exist_ok=True)
        open(f"{lev}/list/{split}.txt", "w").write("\n".join(lnames))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    ns = p.parse_args()
    make_tree(ns.root, ns.n, ns.size)
    print("demo tree at", ns.root)
