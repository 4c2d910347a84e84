"""Debug dump utilities.

save_to_mat mirrors the reference's feature-dump helper
(models/help_funcs.py:189-215): stores the two input images, the
per-level transformer/encoder features of both temporal streams, and the
final change prediction into a MATLAB .mat file. The reference hardcodes
an absolute output directory; here it is a parameter.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np


def save_to_mat(x1, x2, fx1: Sequence, fx2: Sequence, cp: Sequence,
                file_name: str, out_dir: str = "vis/mat") -> str:
    """Dump inputs, per-level features, and the final prediction to
    `{out_dir}/{file_name}.mat`. Accepts jax/numpy arrays (anything
    np.asarray can consume). Returns the written path."""
    from scipy.io import savemat

    mdic = {"x1": np.asarray(x1), "x2": np.asarray(x2),
            "final_pred": np.asarray(cp[-1])}
    for i, (f1, f2) in enumerate(zip(fx1, fx2)):
        mdic[f"fx1_{i}"] = np.asarray(f1)
        mdic[f"fx2_{i}"] = np.asarray(f2)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, file_name + ".mat")
    savemat(path, mdic)
    return path
