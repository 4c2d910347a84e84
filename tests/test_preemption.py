"""Preemption-safe training (stcd_tpu/train/preemption.py — beyond
parity; the reference's recovery is a manual load_model boolean,
ref train_sup.py:61-69).

Covers: the SIGTERM handler itself, the mid-epoch stop + full resume
point in run_training, an exact-continuation resume, and the multi-host
OR-reduction cadence (with a fake collective — one process here).
"""

import os
import signal

import numpy as np

import jax
import optax

from stcd_tpu.data.datasets import SyntheticCDDataset
from stcd_tpu.data.loader import DataLoader
from stcd_tpu.models import SegCD
from stcd_tpu.train.checkpoint import CheckpointManager
from stcd_tpu.train.loops import run_training
from stcd_tpu.train.preemption import PreemptionGuard
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_cd_steps


def _tiny(size=32):
    import jax.numpy as jnp
    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(32, 24, 16, 12, 8))
    a = jnp.zeros((2, size, size, 3))
    tx = optax.adam(poly_schedule(1e-3, 3, 2))
    state = create_train_state(model, jax.random.PRNGKey(0), (a, a), tx)
    return model, state


class _TriggerAfter:
    """Loader wrapper that flags the guard while yielding the Nth batch
    (counted across epochs) — simulates SIGTERM arriving mid-epoch."""

    def __init__(self, loader, guard, after: int):
        self.loader, self.guard, self.after = loader, guard, after
        self.count = 0

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for batch in self.loader:
            self.count += 1
            if self.count == self.after:
                self.guard.trigger()
            yield batch


def test_sigterm_sets_flag_and_chains_handler():
    chained = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: chained.append(s))
    try:
        guard = PreemptionGuard()
        assert not guard.should_stop()
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.should_stop() and guard.fired
        assert chained == [signal.SIGTERM]  # previous handler still ran
        guard.uninstall()
        # uninstall restored our lambda
        assert signal.getsignal(signal.SIGTERM) is not guard._handler
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_preempted_run_saves_resume_point_and_resumes_exactly(tmp_path):
    model, state = _tiny()
    train_step, eval_step = make_cd_steps(model, augment=False)
    ds = SyntheticCDDataset(length=4, size=32)
    save_dir = str(tmp_path / "ckpt")

    guard = PreemptionGuard(install=False)
    # 2 steps/epoch; trigger while yielding step 3 => epoch 2 aborts
    # before its first optimizer step
    loader = _TriggerAfter(DataLoader(ds, batch_size=2, prefetch=0),
                           guard, after=3)
    eval_loader = DataLoader(ds, batch_size=2, prefetch=0)
    state, best, history = run_training(
        train_step, eval_step, state, loader, eval_loader,
        n_epochs=3, save_dir=save_dir, rng=jax.random.PRNGKey(1),
        preemption=guard)
    assert guard.fired
    assert len(history) == 1  # only epoch 1 completed
    steps_done = int(state.step)
    assert steps_done == 2  # epoch 2 took no optimizer step

    # the resume point holds the full state at the preemption
    _, fresh = _tiny()
    restored = CheckpointManager(save_dir).restore_last(fresh)
    assert restored is not None
    rstate, epoch_id, rbest, rbest_epoch = restored
    assert epoch_id == 1 and rbest == best
    assert int(rstate.step) == steps_done
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(rstate.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))

    # resuming runs exactly the remaining epochs
    state2, best2, history2 = run_training(
        train_step, eval_step, rstate,
        DataLoader(ds, batch_size=2, prefetch=0), eval_loader,
        n_epochs=3, save_dir=save_dir, rng=jax.random.PRNGKey(1),
        start_epoch=epoch_id + 1, best=rbest, best_epoch=rbest_epoch)
    assert [h["epoch"] for h in history2] == [2, 3]
    assert int(state2.step) == 6  # 3 epochs x 2 steps total
    final = CheckpointManager(save_dir).restore_last(_tiny()[1])
    assert final[1] == 3  # last_ckpt records the completed run


def test_multihost_sync_cadence():
    calls = []

    def fake_or(flag):
        calls.append(flag)
        return flag

    guard = PreemptionGuard(install=False, sync_every=4, global_or=fake_or)
    guard._nprocs = 2  # force the collective-cadence path
    guard.trigger()
    # between sync points the (stale) agreed value is returned — the
    # collective only runs every sync_every calls, identically on every
    # process
    assert [guard.should_stop() for _ in range(3)] == [False] * 3
    assert calls == []
    assert guard.should_stop() is True  # 4th call syncs
    assert calls == [True]
    assert guard.should_stop() is True  # sticky, no further collectives
    assert calls == [True]
