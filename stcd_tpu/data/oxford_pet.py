"""OxfordPetDataset (ref segmentation_models_pytorch/datasets/oxford_pet.py).

Local-directory variant (zero-egress hosts): expects the standard layout
{root}/images/*.jpg + {root}/annotations/trimaps/*.png and the
annotations/{trainval,test}.txt split lists (train/valid are derived from
trainval.txt by index modulo 10, as the reference does).
SimpleOxfordPetDataset resizes image, mask AND trimap to 256x256.
"""

from __future__ import annotations

import os
import numpy as np
from PIL import Image


class OxfordPetDataset:
    def __init__(self, root: str, mode: str = "train"):
        assert mode in {"train", "valid", "test"}
        self.root = root
        self.mode = mode
        self.images_directory = os.path.join(root, "images")
        self.masks_directory = os.path.join(root, "annotations", "trimaps")
        self.filenames = self._read_split()

    def __len__(self):
        return len(self.filenames)

    def _read_split(self):
        split_filename = "test.txt" if self.mode == "test" else "trainval.txt"
        split_filepath = os.path.join(self.root, "annotations", split_filename)
        with open(split_filepath) as f:
            split_data = f.read().strip("\n").split("\n")
        filenames = [x.split(" ")[0] for x in split_data]
        if self.mode == "train":
            filenames = [x for i, x in enumerate(filenames) if i % 10 != 0]
        elif self.mode == "valid":
            filenames = [x for i, x in enumerate(filenames) if i % 10 == 0]
        return filenames

    @staticmethod
    def _preprocess_mask(mask):
        mask = mask.astype(np.float32)
        mask[mask == 2.0] = 0.0
        mask[(mask == 1.0) | (mask == 3.0)] = 1.0
        return mask

    def __getitem__(self, idx):
        filename = self.filenames[idx]
        image = np.asarray(Image.open(
            os.path.join(self.images_directory, filename + ".jpg")).convert("RGB"))
        trimap = np.asarray(Image.open(
            os.path.join(self.masks_directory, filename + ".png")))
        mask = self._preprocess_mask(trimap)
        return {"image": image, "mask": mask, "trimap": trimap, "name": filename}


class SimpleOxfordPetDataset(OxfordPetDataset):
    def __getitem__(self, idx):
        sample = super().__getitem__(idx)
        image = np.asarray(Image.fromarray(sample["image"]).resize(
            (256, 256), Image.BILINEAR))
        mask = np.asarray(Image.fromarray(sample["mask"]).resize(
            (256, 256), Image.NEAREST))
        trimap = np.asarray(Image.fromarray(sample["trimap"]).resize(
            (256, 256), Image.NEAREST))
        sample["image"] = image
        sample["mask"] = mask[..., None]
        sample["trimap"] = trimap[..., None]
        sample["label"] = sample["mask"]
        return sample
