"""Regression tests for the round-2 self-review findings (see ADVICE-style
fixes in the corresponding commit): silent weight-path fallback, predict()
on unhashable modules, partial-checkpoint recovery, and the multi-device
Pallas-augmentation guard."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import stcd_tpu


def test_explicit_weights_path_never_falls_back(tmp_path, monkeypatch):
    """A literal --encoder_weights path that does not exist must raise,
    even when $STCD_PRETRAINED_DIR holds a same-named encoder msgpack
    (silent fallback to stock ImageNet weights is the exact divergence
    the resolution contract bans)."""
    from stcd_tpu.convert.pretrained import resolve_encoder_weights

    d = tmp_path / "pretrained"
    d.mkdir()
    (d / "resnet50.msgpack").write_bytes(b"x")
    monkeypatch.setenv("STCD_PRETRAINED_DIR", str(d))
    with pytest.raises(FileNotFoundError, match="Literal paths"):
        resolve_encoder_weights(str(tmp_path / "deleted.msgpack"), "resnet50")
    # name-based resolution still works
    assert resolve_encoder_weights("imagenet", "resnet50") == str(
        d / "resnet50.msgpack")


def test_predict_with_aux_params():
    """flax Modules with dict-valued fields (aux_params) are unhashable;
    predict() must still work (ref base/model.py:41-56 does)."""
    m = stcd_tpu.SegCD(encoder_name="resnet18", classes=1,
                       decoder_channels=(8, 8, 8, 8, 8),
                       aux_params={"classes": 4})
    with pytest.raises(TypeError):
        hash(m)  # precondition: this really is the unhashable case
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, x)
    out = stcd_tpu.predict(m, v, x, x)
    assert len(out) == 3
    # cached path returns the same jitted callable
    assert stcd_tpu._jitted_eval_apply(m) is stcd_tpu._jitted_eval_apply(m)
    # hashable models cache by EQUALITY: a fresh-but-equal model must hit
    # the same entry (no re-trace per call — review finding)
    m1 = stcd_tpu.UnetSeg(encoder_name="resnet18", classes=1,
                          decoder_channels=(8, 8, 8, 8, 8))
    m2 = stcd_tpu.UnetSeg(encoder_name="resnet18", classes=1,
                          decoder_channels=(8, 8, 8, 8, 8))
    assert m1 is not m2 and hash(m1) == hash(m2)
    assert stcd_tpu._jitted_eval_apply(m1) is stcd_tpu._jitted_eval_apply(m2)


def test_restore_last_discards_partial_new(tmp_path):
    """A crash DURING save_last leaves a partial '.new' with no completion
    marker: restore_last must treat it as garbage and start fresh, not
    promote it to the canonical path (where it would poison every later
    restore). A complete '.new' (marker present) is still recovered."""
    import optax

    from stcd_tpu.train.checkpoint import CheckpointManager
    from stcd_tpu.train.state import create_train_state

    m = stcd_tpu.UnetSeg(encoder_name="resnet18", classes=1,
                         decoder_channels=(8, 8, 8, 8, 8))
    st = create_train_state(m, jax.random.PRNGKey(0),
                            (jnp.zeros((1, 32, 32, 3)),), optax.adam(1e-3))
    cm = CheckpointManager(str(tmp_path))

    partial = tmp_path / "last_ckpt.new"
    partial.mkdir()
    (partial / "junk").write_text("truncated")
    assert cm.restore_last(st) is None
    # the unrestorable bytes are quarantined, not deleted
    assert not partial.exists()
    assert (tmp_path / "last_ckpt.new.corrupt").exists()

    cm.save_last(st, epoch_id=3, best_val_acc=0.5, best_epoch_id=2)
    # crash between rmtree(old) and rename: complete .new + marker
    os.rename(tmp_path / "last_ckpt", partial)
    (tmp_path / "last_ckpt.new.ok").touch()
    restored = cm.restore_last(st)
    assert restored is not None and restored[1] == 3

    # a COMPLETE .new without a marker (written by a pre-marker version)
    # must be recovered via the integrity probe, not deleted
    os.rename(tmp_path / "last_ckpt", partial)
    restored = cm.restore_last(st)
    assert restored is not None and restored[1] == 3


def test_pallas_augment_partitions_on_mesh():
    """A pallas_call is opaque to GSPMD: without the custom_partitioning
    batch-map rule on the augment kernel, a 'data'-sharded batch inside a
    pjit'd step was ALL-GATHERED and augmented fully replicated on every
    device. Pin that the kernel output keeps the batch sharding on an
    8-device mesh and matches the jnp reference path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from stcd_tpu.data import augment
    from stcd_tpu.data.augment import _batched_params
    from stcd_tpu.ops.augment_kernel import apply_augment_batch

    imgs = jax.random.uniform(jax.random.PRNGKey(0), (16, 32, 32, 3))
    params = _batched_params(jax.random.split(jax.random.PRNGKey(1), 16), 0.5)

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    imgs_sh = jax.device_put(imgs, NamedSharding(mesh, P("data")))
    params_sh = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
        params)

    out = jax.jit(lambda i, p: apply_augment_batch(i, p, interpret=True))(
        imgs_sh, params_sh)
    assert out.sharding.spec[0] == "data", out.sharding
    ref = jax.vmap(augment.apply_augment_reference)(
        augment.to_float01(imgs), params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
