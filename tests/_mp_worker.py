"""Subprocess body for tests/test_multiprocess.py: one process of a REAL
2-process SPMD run (jax.distributed + gloo CPU collectives, 2 local
devices each = 4 global). Exercises the actual multi-host machinery that
the simulated tests can't: parallel/distributed.initialize, the
DataLoader multihost place() branch (make_array_from_process_local_data
+ the indivisible-batch allgather fallback), and cross-process psum of
gradients/BN stats inside the jitted train step.

Prints "MP_LOSSES <json list>" on success; the parent compares across
processes and against a single-process replay of the same global batches.
"""

import json
import os
import sys

import jax


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # match tests/conftest.py numerics so the parent's replay agrees
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/root/.cache/stcd_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from stcd_tpu.parallel.distributed import initialize, global_batch_sharding
    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 2 * nprocs, jax.device_count()

    # Warm BOTH gloo cliques (all-devices, and the one-device-per-process
    # clique process_allgather uses) NOW, while the processes are still in
    # lockstep: gloo context creation has a 30 s rendezvous deadline, and
    # on a 1-core host the model-compile skew between the two processes
    # can exceed it if the contexts are first created lazily at the first
    # real collective (observed as GetKeyValue() DEADLINE_EXCEEDED).
    import numpy as np
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("stcd_mp_warmup")
    multihost_utils.process_allgather(np.zeros((1,), np.float32))

    # also warm the PERMUTED TP-span clique (_run_tp_span_check pairs
    # devices across processes — a distinct gloo context whose lazy
    # creation at first use hits the 30 s rendezvous deadline when the
    # preceding model compiles skew the processes; observed DEADLINE_
    # EXCEEDED on the 1-core host). One tiny all-reduce now, in lockstep.
    from jax.sharding import NamedSharding as _NS, PartitionSpec as _P
    from stcd_tpu.parallel.mesh import create_mesh as _cm
    _devs = jax.devices()
    _tpm = _cm(data=2, model=2,
               devices=[_devs[0], _devs[2], _devs[1], _devs[3]])
    _z = jax.device_put(np.zeros((4, 4), np.float32),
                        _NS(_tpm, _P("data", "model")))
    # full-mesh reduce (one clique) ...
    float(jax.jit(lambda t: t.sum(), out_shardings=_NS(_tpm, _P()))(_z))
    # ... and the model-PAIR subgroup reduce ({p0d0,p1d0}, {p0d1,p1d1})
    jax.block_until_ready(jax.jit(
        lambda t: t.sum(axis=1),
        out_shardings=_NS(_tpm, _P("data")))(_z))

    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stcd_tpu.data.datasets import SyntheticCDDataset
    from stcd_tpu.data.loader import DataLoader
    from stcd_tpu.models import SegCD
    from stcd_tpu.parallel.mesh import create_mesh
    from stcd_tpu.train.state import create_train_state
    from stcd_tpu.train.steps import make_cd_steps

    mesh = create_mesh()  # data axis spans both processes' devices
    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(16, 12, 8, 8, 8))
    zeros = jnp.zeros((1, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0), (zeros, zeros),
                               optax.adam(1e-3))
    rep = NamedSharding(mesh, P())
    state = state.replace(
        params=jax.device_put(state.params, rep),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.device_put(state.opt_state, rep))
    train_step, _ = make_cd_steps(model, augment=True)

    losses = []
    # bs=2: global batch 4 rows = divisible by the 4-device data axis
    #       (make_array_from_process_local_data path);
    # bs=3: global batch 6 rows = indivisible -> the allgather
    #       replicated-fallback path in assemble_global_batch.
    for bs in (2, 3):
        loader = DataLoader(SyntheticCDDataset(length=10, size=32, seed=7),
                            batch_size=bs, shuffle=True, num_workers=2,
                            seed=5, sharding=global_batch_sharding(mesh))
        for step_i, batch in enumerate(loader):
            batch.pop("name", None)
            state, out = train_step(state, batch, jax.random.PRNGKey(step_i))
            losses.append(float(out["loss"]))
    print("MP_LOSSES " + json.dumps(losses), flush=True)

    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
    if ckpt_dir:
        _run_tp_span_check(model, zeros)
        _run_checkpoint_check(state, model, zeros, mesh, rep, ckpt_dir)
        _run_preemption_check(pid, model, zeros, mesh, rep, ckpt_dir)


def _run_tp_span_check(model, zeros):
    """Tensor parallelism with the 'model' axis SPANNING the two
    processes (VERDICT r3 item 4a): the device order is permuted so each
    model-axis pair holds one device from each process — the Megatron
    conv-kernel shards then reduce across the process boundary through
    gloo. The TP train-step loss must equal the replicated (DP) loss on
    the same mesh, params and batch."""
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stcd_tpu.models import SegCD
    from stcd_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                        param_sharding)
    from stcd_tpu.train.state import create_train_state
    from stcd_tpu.train.steps import make_cd_steps
    import jax.numpy as jnp

    devs = jax.devices()  # [p0d0, p0d1, p1d0, p1d1]
    assert len(devs) == 4
    # rows = data shards, cols = model shards; cols mix processes
    tp_mesh = create_mesh(data=2, model=2,
                          devices=[devs[0], devs[2], devs[1], devs[3]])
    assert {d.process_index for d in tp_mesh.devices[0].flat} == {0, 1}, (
        "model axis does not span processes")

    state = create_train_state(model, jax.random.PRNGKey(5), (zeros, zeros),
                               optax.adam(1e-3))
    rng = np.random.default_rng(21)
    batch = {
        "A": jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)), jnp.float32),
        "B": jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)), jnp.float32),
        "label": jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 1)) > 0.8,
                             jnp.float32),
    }
    train_step, _ = make_cd_steps(model, augment=False)
    rep = NamedSharding(tp_mesh, P())

    def copy(st):
        return jax.tree_util.tree_map(jnp.array, st)

    def place(st, shardings):
        return st.replace(
            params=jax.device_put(st.params, shardings),
            batch_stats=jax.device_put(st.batch_stats, rep),
            opt_state=jax.device_put(st.opt_state, rep))

    bsh = jax.device_put(batch, batch_sharding(tp_mesh))
    _, out_dp = train_step(place(copy(state), rep), bsh,
                           jax.random.PRNGKey(0))
    shardings = param_sharding(tp_mesh, state.params, min_size_to_shard=1024)
    n_sharded = sum(sh.spec != P()
                    for sh in jax.tree_util.tree_leaves(shardings))
    assert n_sharded > 0, "no kernel sharded over the spanning model axis"
    _, out_tp = train_step(place(copy(state), shardings), bsh,
                           jax.random.PRNGKey(0))
    print("MP_TP " + json.dumps({
        "dp_loss": float(out_dp["loss"]),
        "tp_loss": float(out_tp["loss"]),
        "n_sharded": int(n_sharded),
    }), flush=True)


def _run_checkpoint_check(state, model, zeros, mesh, rep, ckpt_dir):
    """Multi-host CheckpointManager round-trip: primary-only writes with
    cross-process barriers, plus the _to_host allgather branch for leaves
    sharded across processes (stcd_tpu/train/checkpoint.py)."""
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.state import create_train_state

    def digest(tree):
        return float(sum(np.abs(np.asarray(x)).astype(np.float64).sum()
                         for x in jax.tree_util.tree_leaves(tree)))

    # shard 4-D conv kernels over output channels across the 4-device
    # (2-process) data axis — forces _to_host's process_allgather path
    nd = jax.device_count()
    def spec(x):
        if x.ndim == 4 and x.shape[-1] % nd == 0:
            return NamedSharding(mesh, P(None, None, None, "data"))
        return rep
    sharded = state.replace(params=jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec(x)), state.params))

    mgr = CheckpointManager(ckpt_dir)
    mgr.save_last(sharded, epoch_id=3, best_val_acc=0.5, best_epoch_id=2)
    mgr.save_best(sharded, metric=0.4242)

    fresh = create_train_state(model, jax.random.PRNGKey(1), (zeros, zeros),
                               optax.adam(1e-3))
    out = mgr.restore_last(fresh)
    assert out is not None, "restore_last returned None"
    rstate, epoch_id, best_val_acc, best_epoch_id = out
    assert (epoch_id, best_epoch_id) == (3, 2), (epoch_id, best_epoch_id)
    assert abs(best_val_acc - 0.5) < 1e-9
    best = mgr.best_path()
    assert best and best.endswith("42.42_best_model"), best
    wstate = mgr.load_weights(fresh, best)
    print("MP_CKPT " + json.dumps({
        "saved": digest(state.params),
        "restored": digest(rstate.params),
        "best": digest(wstate.params),
        "bn": digest(rstate.batch_stats),
        "bn_saved": digest(state.batch_stats),
    }), flush=True)


def _run_preemption_check(pid, model, zeros, mesh, rep, ckpt_dir):
    """Preemption propagation across REAL processes: the 'signal' lands
    on process 0 ONLY; the fixed-cadence allgather OR inside
    PreemptionGuard.should_stop must make BOTH processes leave the step
    loop at the same iteration (stcd_tpu/train/preemption.py — syncing
    only-when-flagged would deadlock the unsignaled host in the next
    collective), then save one coherent multi-host resume point."""
    import json
    import os

    import optax

    from stcd_tpu.data.datasets import SyntheticCDDataset
    from stcd_tpu.data.loader import DataLoader
    from stcd_tpu.parallel.distributed import global_batch_sharding
    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.loops import run_training
    from stcd_tpu.train.preemption import PreemptionGuard
    from stcd_tpu.train.state import create_train_state
    from stcd_tpu.train.steps import make_cd_steps

    state = create_train_state(model, jax.random.PRNGKey(2), (zeros, zeros),
                               optax.adam(1e-3))
    state = state.replace(
        params=jax.device_put(state.params, rep),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.device_put(state.opt_state, rep))
    train_step, eval_step = make_cd_steps(model, augment=True)

    guard = PreemptionGuard(install=False, sync_every=2)

    class TriggerOnP0:
        """Flags process 0's guard while yielding TRAIN batch 1 —
        should_stop call 1 is off-cadence (stale False, batch 1 still
        trains); call 2 syncs and every process agrees to stop."""

        def __init__(self, loader):
            self.loader = loader
            self.count = 0

        def __len__(self):
            return len(self.loader)

        seen = []

        def __iter__(self):
            for batch in self.loader:
                self.count += 1
                if pid == 0 and self.count == 1:
                    guard.trigger()
                self.seen.append(batch)
                yield batch

    # length=8 is partitioned across the 2 processes by the multihost
    # loader -> 4 local samples, bs=2 local -> 2 global batches/epoch.
    # Same shapes as the bs=2 loss loop -> compile-cache hit.
    def make_loader():
        return DataLoader(
            SyntheticCDDataset(length=8, size=32, seed=11), batch_size=2,
            shuffle=True, num_workers=2, seed=6,
            sharding=global_batch_sharding(mesh))

    import jax.numpy as jnp

    state0 = jax.tree_util.tree_map(jnp.array, state)  # pre-run copy
    save_dir = os.path.join(ckpt_dir, "preempt")
    trigger_loader = TriggerOnP0(make_loader())
    state, best, history = run_training(
        train_step, eval_step, state, trigger_loader,
        make_loader(),
        n_epochs=2, save_dir=save_dir, rng=jax.random.PRNGKey(3),
        preemption=guard)

    fresh = create_train_state(model, jax.random.PRNGKey(4), (zeros, zeros),
                               optax.adam(1e-3))
    restored = CheckpointManager(save_dir).restore_last(fresh)
    print("MP_PREEMPT " + json.dumps({
        "fired": guard.fired,
        "steps": int(jax.device_get(state.step)),
        "epochs_done": len(history),
        "ckpt_epoch": None if restored is None else restored[1],
        "ckpt_steps": None if restored is None else int(
            jax.device_get(restored[0].step)),
    }), flush=True)

    # resume-exactness (VERDICT r3 item 4b): continuing from the
    # restored shared-FS checkpoint must track BOTH the live
    # post-preemption state and a from-scratch replay (initial state +
    # the one batch that trained before the stop) EXACTLY over the same
    # continuation batches — the checkpoint IS the live state.
    import numpy as np

    rstate = restored[0].replace(
        params=jax.device_put(restored[0].params, rep),
        batch_stats=jax.device_put(restored[0].batch_stats, rep),
        opt_state=jax.device_put(restored[0].opt_state, rep))
    first_batch = {k: jnp.asarray(v)
                   for k, v in trigger_loader.seen[0].items()
                   if k != "name"}
    rng2 = np.random.default_rng(31)
    extra = []
    for i in range(2):
        extra.append({
            "A": jnp.asarray(rng2.uniform(0, 1, (4, 32, 32, 3)),
                             jnp.float32),
            "B": jnp.asarray(rng2.uniform(0, 1, (4, 32, 32, 3)),
                             jnp.float32),
            "label": jnp.asarray(rng2.uniform(0, 1, (4, 32, 32, 1)) > 0.8,
                                 jnp.float32)})

    def cont(st, batches, keys):
        st = jax.tree_util.tree_map(jnp.array, st)
        ls = []
        for b, k in zip(batches, keys):
            st, o = train_step(st, b, k)
            ls.append(float(o["loss"]))
        return ls

    # k1 reproduces run_training's first step key exactly (loops.py:
    # ``rng, step_rng = jax.random.split(rng)`` from rng=PRNGKey(3)), so
    # the from-scratch replay walks the SAME augmentation stream the
    # preempted run did — all three continuations must agree exactly.
    k1 = jax.random.split(jax.random.PRNGKey(3))[1]
    k2, k3 = jax.random.PRNGKey(102), jax.random.PRNGKey(103)
    live = cont(state, extra, [k2, k3])
    resumed = cont(rstate, extra, [k2, k3])
    replay = cont(state0, [first_batch] + extra, [k1, k2, k3])
    print("MP_RESUME " + json.dumps({
        "live": live, "resumed": resumed, "replay_tail": replay[1:],
        "replay_finite": bool(np.all(np.isfinite(replay))),
    }), flush=True)




# ---------------------------------------------------------------- round 5


def _init_dist(pid, nprocs, port, local_devices):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR",
                                     "/root/.cache/stcd_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from stcd_tpu.parallel.distributed import initialize
    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=nprocs, process_id=pid)


def _tiny_setup():
    import jax.numpy as jnp
    import optax

    from stcd_tpu.models import SegCD
    from stcd_tpu.train.state import create_train_state

    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(16, 12, 8, 8, 8))
    zeros = jnp.zeros((1, 32, 32, 3), jnp.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (zeros, zeros), optax.adam(1e-3))
    return model, state


def _det_batch(i, n=8):
    import numpy as np
    rng = np.random.default_rng(1000 + i)
    return {
        "A": rng.uniform(0, 1, (n, 32, 32, 3)).astype("float32"),
        "B": rng.uniform(0, 1, (n, 32, 32, 3)).astype("float32"),
        "label": (rng.uniform(0, 1, (n, 32, 32, 1)) > 0.8)
        .astype("float32"),
    }


def tp4(pid, nprocs, port):
    """4 processes x 1 device: a 2x2 data x model mesh where BOTH axes
    span process boundaries (VERDICT r4 item 5a) — every gradient psum
    AND every Megatron kernel-shard reduction crosses gloo. TP loss must
    equal DP loss; two further TP train steps must stay finite and
    identical across all four processes."""
    _init_dist(pid, nprocs, port, 1)
    assert jax.process_count() == 4 and jax.device_count() == 4

    import numpy as np
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("tp4_warmup")
    multihost_utils.process_allgather(np.zeros((1,), np.float32))

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stcd_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                        param_sharding)
    from stcd_tpu.train.steps import make_cd_steps

    mesh = create_mesh(data=2, model=2)
    for row in mesh.devices:          # data axis rows: 2 procs per row
        assert len({d.process_index for d in row.flat}) == 2
    for col in mesh.devices.T.reshape(2, -1):   # model axis columns
        assert len({d.process_index for d in col.flat}) == 2

    # warm both cliques in lockstep (full mesh + model-pair subgroups)
    z = jax.device_put(np.zeros((4, 4), np.float32),
                       NamedSharding(mesh, P("data", "model")))
    float(jax.jit(lambda t: t.sum(),
                  out_shardings=NamedSharding(mesh, P()))(z))
    jax.block_until_ready(jax.jit(
        lambda t: t.sum(axis=1),
        out_shardings=NamedSharding(mesh, P("data")))(z))

    model, state = _tiny_setup()
    train_step, _ = make_cd_steps(model, augment=False)
    rep = NamedSharding(mesh, P())
    batch = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in _det_batch(0).items()}

    def place(st, shardings):
        return st.replace(
            params=jax.device_put(st.params, shardings),
            batch_stats=jax.device_put(st.batch_stats, rep),
            opt_state=jax.device_put(st.opt_state, rep))

    def copy(st):
        return jax.tree_util.tree_map(jnp.array, st)

    _, out_dp = train_step(place(copy(state), rep), batch,
                           jax.random.PRNGKey(0))
    shardings = param_sharding(mesh, state.params, min_size_to_shard=1024)
    n_sharded = sum(sh.spec != P()
                    for sh in jax.tree_util.tree_leaves(shardings))
    tp_state = place(copy(state), shardings)
    tp_losses = []
    for i in range(3):
        b = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in _det_batch(i).items()}
        tp_state, out = train_step(tp_state, b, jax.random.PRNGKey(i))
        tp_losses.append(float(out["loss"]))
    print("MP_TP4 " + json.dumps({
        "dp_loss": float(out_dp["loss"]),
        "tp_losses": tp_losses,
        "n_sharded": int(n_sharded),
    }), flush=True)


def killrun(pid, nprocs, port, ckpt_dir):
    """Phase A of the hard-kill test (VERDICT r4 item 5b): train with a
    per-step multi-host checkpoint; the parent SIGKILLs this process
    mid-run with NO cleanup (then kills the hung peer). Emits a marker
    file per completed step so the parent can time the kill."""
    _init_dist(pid, nprocs, port, 2)
    import numpy as np
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("killrun_warmup")
    multihost_utils.process_allgather(np.zeros((1,), np.float32))

    from jax.sharding import NamedSharding, PartitionSpec as P

    from stcd_tpu.parallel.mesh import batch_sharding, create_mesh
    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.steps import make_cd_steps

    mesh = create_mesh()
    rep = NamedSharding(mesh, P())
    model, state = _tiny_setup()
    state = state.replace(
        params=jax.device_put(state.params, rep),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.device_put(state.opt_state, rep))
    train_step, _ = make_cd_steps(model, augment=False)
    mgr = CheckpointManager(ckpt_dir)

    for i in range(12):
        batch = {k: jax.device_put(v, batch_sharding(mesh))
                 for k, v in _det_batch(i).items()}
        state, out = train_step(state, batch, jax.random.PRNGKey(100 + i))
        mgr.save_last(state, epoch_id=i, best_val_acc=0.0, best_epoch_id=0)
        if pid == 0:
            with open(os.path.join(ckpt_dir, f"step_{i}.ok"), "w") as f:
                f.write(repr(float(out["loss"])))
        print(f"KILLRUN step {i} loss {float(out['loss'])}", flush=True)


def killresume(pid, nprocs, port, ckpt_dir):
    """Phase B: both processes restart from the shared-FS checkpoint the
    SIGKILL left behind (CheckpointManager.repair handles any torn
    .new), then run 3 deterministic continuation steps. The parent
    asserts both processes agree AND match its own single-process replay
    from the same checkpoint — exact-loss recovery from an uncleaned
    hard kill."""
    _init_dist(pid, nprocs, port, 2)
    import numpy as np
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("killresume_warmup")
    multihost_utils.process_allgather(np.zeros((1,), np.float32))

    from jax.sharding import NamedSharding, PartitionSpec as P

    from stcd_tpu.parallel.mesh import batch_sharding, create_mesh
    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.steps import make_cd_steps

    mesh = create_mesh()
    rep = NamedSharding(mesh, P())
    model, fresh = _tiny_setup()
    mgr = CheckpointManager(ckpt_dir)
    restored = mgr.restore_last(fresh)
    assert restored is not None, "no coherent checkpoint after hard kill"
    state, epoch_id, _, _ = restored
    state = state.replace(
        params=jax.device_put(state.params, rep),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.device_put(state.opt_state, rep))
    train_step, _ = make_cd_steps(model, augment=False)

    losses = []
    for j in range(3):
        batch = {k: jax.device_put(v, batch_sharding(mesh))
                 for k, v in _det_batch(500 + epoch_id * 10 + j).items()}
        state, out = train_step(state, batch, jax.random.PRNGKey(200 + j))
        losses.append(float(out["loss"]))
    print("MP_KILLRESUME " + json.dumps({
        "epoch": int(epoch_id),
        "step": int(jax.device_get(state.step)),
        "losses": losses,
    }), flush=True)


if __name__ == "__main__":
    mode = sys.argv[5] if len(sys.argv) > 5 else ""
    if mode == "tp4":
        tp4(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    elif mode == "killrun":
        killrun(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                sys.argv[4])
    elif mode == "killresume":
        killresume(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                   sys.argv[4])
    else:
        main()
