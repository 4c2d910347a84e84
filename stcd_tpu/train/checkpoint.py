"""Orbax checkpointing with the reference's artifact semantics.

Implements the vestigial CDTrainer's full-resume scheme
(ref models/trainer.py:130-186: model + optimizer + epoch + best metric in
last_ckpt/best_ckpt) while also emitting the live scripts' best-metric
artifacts ('%.2f_best_model.pth' keeping only the current best,
ref train_sup.py:175-183, plus periodic epoch snapshots).
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    # --- CDTrainer-style full resume (ref models/trainer.py:178-186) ---
    def save_last(self, state, epoch_id: int, best_val_acc: float,
                  best_epoch_id: int, name: str = "last_ckpt"):
        payload = {
            "epoch_id": epoch_id,
            "best_val_acc": float(best_val_acc),
            "best_epoch_id": best_epoch_id,
            "params": _to_host(state.params),
            "batch_stats": _to_host(state.batch_stats),
            "opt_state": _to_host(state.opt_state),
            "step": int(state.step),
        }
        # Crash-safe replace (review finding: rmtree-then-save destroyed
        # the only resume artifact if the process died mid-save): write
        # the new checkpoint COMPLETELY next to the old one, only then
        # swap. A crash during save leaves the old checkpoint intact; a
        # crash between rmtree and rename leaves a complete '.new' that
        # restore_last falls back to.
        path = os.path.join(self.directory, name)
        new_path = path + ".new"
        marker = path + ".new.ok"  # written only after save() completes:
        # distinguishes a COMPLETE .new (crash between rmtree and rename —
        # recoverable) from a PARTIAL .new (crash during save — garbage)
        if os.path.exists(marker):
            os.remove(marker)
        if os.path.exists(new_path):
            shutil.rmtree(new_path)  # stale partial from an earlier crash
        self._ckptr.save(new_path, payload)
        open(marker, "w").close()
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(new_path, path)
        os.remove(marker)

    def restore_last(self, state, name: str = "last_ckpt"):
        """Returns (state, epoch_id, best_val_acc, best_epoch_id) or None."""
        path = os.path.join(self.directory, name)
        if not os.path.exists(path):
            new_path, marker = path + ".new", path + ".new.ok"
            if not os.path.exists(new_path):
                return None
            if os.path.exists(marker):
                # complete .new (crash between rmtree and rename): recover
                os.rename(new_path, path)
                os.remove(marker)
            else:
                # No marker: either a partial save (garbage) or a complete
                # checkpoint written by a pre-marker version of this code.
                # Probe by restoring it — deleting a restorable artifact
                # would destroy the only resume state (review finding).
                try:
                    self._ckptr.restore(new_path)
                except Exception:
                    # keep the bytes for forensics instead of deleting
                    os.rename(new_path, new_path + ".corrupt")
                    return None
                os.rename(new_path, path)
        restored = self._ckptr.restore(path)
        tmpl = jax.tree_util.tree_structure(state.opt_state)
        opt_state = jax.tree_util.tree_unflatten(
            tmpl, jax.tree_util.tree_leaves(restored["opt_state"]))
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=opt_state,
            step=int(restored["step"]),
        )
        return (state, int(restored["epoch_id"]), float(restored["best_val_acc"]),
                int(restored["best_epoch_id"]))

    # --- live-script best artifacts (ref train_sup.py:175-183) ---
    def save_best(self, state, metric: float):
        """Keep only the current best, named '%.2f_best_model' (x100).
        The new best is written before the old one is deleted, so a crash
        mid-save never leaves the run without a best artifact."""
        path = os.path.join(self.directory, "%.2f_best_model" % (metric * 100))
        if os.path.exists(path):  # same metric value: replace
            shutil.rmtree(path)
        self._ckptr.save(path, {"params": _to_host(state.params),
                                "batch_stats": _to_host(state.batch_stats)})
        for old in glob.glob(os.path.join(self.directory, "*_best_model")):
            if old != path:
                shutil.rmtree(old)
        return path

    def save_snapshot(self, state, epoch: int):
        path = os.path.join(self.directory, "%.2f_model" % epoch)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, {"params": _to_host(state.params),
                                "batch_stats": _to_host(state.batch_stats)})
        return path

    def load_weights(self, state, path: str):
        """Weights-only load (the live scripts' load_state_dict equivalent,
        ref train_stcd.py:92-94)."""
        restored = self._ckptr.restore(path)
        return state.replace(params=restored["params"],
                             batch_stats=restored["batch_stats"])

    def best_path(self) -> Optional[str]:
        cands = sorted(glob.glob(os.path.join(self.directory, "*_best_model")))
        return cands[-1] if cands else None
