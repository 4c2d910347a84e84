"""Pipeline parallelism (parallel/pipeline.py) on the 8-virtual-CPU mesh.

GPipe over the 'stage' axis must be EXACT: microbatching only splits the
batch dim, blocks are batch-independent (LayerNorm/attention/MLP), so the
pipelined forward and its gradients must match the sequential ones.
Covers: the generic gpipe combinator (toy blocks), DPxPP composition,
the BIT TransformerDecoder wrapper (ref models/help_funcs.py:170-186),
and a full BASETransformer '_dd8' forward+grad (ref networks.py:307-441).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stcd_tpu.parallel.mesh import create_mesh
from stcd_tpu.parallel.pipeline import (bit_pipeline_forward, gpipe,
                                        pipelined_decoder_apply, stack_params)


def _toy_block(p, act):
    x, skip = act
    return jnp.tanh(x @ p["w"] + p["b"]) + skip, skip


def _toy_setup(depth=8, batch=8, dim=16):
    keys = jax.random.split(jax.random.PRNGKey(0), depth)
    per_block = [{"w": jax.random.normal(k, (dim, dim)) * 0.3,
                  "b": jnp.zeros((dim,))} for k in keys]
    stacked = stack_params(per_block)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, dim))
    skip = jax.random.normal(jax.random.PRNGKey(2), (batch, dim)) * 0.1
    return stacked, (x, skip)


def _sequential(stacked, act):
    def body(a, p):
        return _toy_block(p, a), None
    out, _ = jax.lax.scan(body, act, stacked)
    return out


@pytest.mark.parametrize("stages,n_micro", [(4, 4), (8, 8), (2, 4)])
def test_gpipe_forward_matches_sequential(stages, n_micro):
    stacked, act = _toy_setup()
    ref, _ = _sequential(stacked, act)
    mesh = create_mesh(stage=stages)
    out, _ = jax.jit(lambda p, a: gpipe(_toy_block, p, a, mesh=mesh,
                                        n_micro=n_micro))(stacked, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_gpipe_gradients_match_sequential():
    stacked, act = _toy_setup()
    mesh = create_mesh(stage=4)

    def loss_seq(p):
        out, _ = _sequential(p, act)
        return jnp.sum(out ** 2)

    def loss_pp(p):
        out, _ = gpipe(_toy_block, p, act, mesh=mesh, n_micro=4)
        return jnp.sum(out ** 2)

    l1, g1 = jax.value_and_grad(loss_seq)(stacked)
    l2, g2 = jax.jit(jax.value_and_grad(loss_pp))(stacked)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_gpipe_composes_with_data_parallel():
    """DPxPP: 2 data x 4 stage mesh — the batch stays GSPMD-sharded over
    'data' while the pipeline shard_map is manual over 'stage' only."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    stacked, act = _toy_setup()
    ref, _ = _sequential(stacked, act)
    mesh = create_mesh(data=2, stage=4)
    act = jax.device_put(act, NamedSharding(mesh, P("data")))
    stacked_r = jax.device_put(stacked, NamedSharding(mesh, P()))
    out, _ = jax.jit(lambda p, a: gpipe(_toy_block, p, a, mesh=mesh,
                                        n_micro=4))(stacked_r, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def bit_decoder():
    from stcd_tpu.models.bit import TransformerDecoder

    dec = TransformerDecoder(depth=8, heads=8, dim_head=8, mlp_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 32))
    m = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 32))
    params = dec.init(jax.random.PRNGKey(2), x, m)["params"]
    return dec, params, x, m


def test_pipelined_decoder_matches_sequential(bit_decoder):
    dec, params, x, m = bit_decoder
    ref = dec.apply({"params": params}, x, m)
    mesh = create_mesh(stage=4)
    out = jax.jit(lambda p: pipelined_decoder_apply(
        dec, p, x, m, mesh=mesh, n_micro=4))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_decoder_grads_match(bit_decoder):
    dec, params, x, m = bit_decoder
    mesh = create_mesh(stage=4)

    def loss_seq(p):
        return jnp.mean(dec.apply({"params": p}, x, m) ** 2)

    def loss_pp(p):
        return jnp.mean(pipelined_decoder_apply(
            dec, p, x, m, mesh=mesh, n_micro=4) ** 2)

    l1, g1 = jax.value_and_grad(loss_seq)(params)
    l2, g2 = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(k1))


@pytest.fixture(scope="module")
def bit_model():
    from stcd_tpu.models.bit import BASETransformer

    # base_transformer_pos_s4_dd8 config (ref networks.py:82-88) at toy size
    model = BASETransformer(output_nc=2, resnet_stages_num=4, with_pos="learned",
                            enc_depth=1, dec_depth=8, decoder_dim_head=8)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(2), x1, x2)
    return model, variables, x1, x2


def test_bit_pipeline_forward_matches_apply(bit_model):
    model, variables, x1, x2 = bit_model
    ref = model.apply(variables, x1, x2)
    mesh = create_mesh(stage=4)
    out = jax.jit(lambda v: bit_pipeline_forward(
        model, v, x1, x2, mesh=mesh, n_micro=4))(variables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_bit_pipeline_train_grads_match(bit_model):
    """Full training-step math through the pipeline: CE loss, grads wrt
    every param (backbone included), and mutated BN stats all match the
    sequential model.apply path."""
    from stcd_tpu.losses.functional import cross_entropy

    model, variables, x1, x2 = bit_model
    label = (jax.random.uniform(jax.random.PRNGKey(3), (4, 32, 32, 1))
             > 0.7).astype(jnp.int32)
    mesh = create_mesh(stage=4)

    def loss_seq(p):
        logits, mut = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x1, x2, True, mutable=["batch_stats"])
        return cross_entropy(logits, label), mut["batch_stats"]

    def loss_pp(p):
        logits, new_stats = bit_pipeline_forward(
            model, {"params": p, "batch_stats": variables["batch_stats"]},
            x1, x2, mesh=mesh, n_micro=4, train=True)
        return cross_entropy(logits, label), new_stats

    (l1, bs1), g1 = jax.value_and_grad(loss_seq, has_aux=True)(
        variables["params"])
    (l2, bs2), g2 = jax.jit(jax.value_and_grad(loss_pp, has_aux=True))(
        variables["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs1),
                    jax.tree_util.tree_leaves(bs2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(k1))


def test_cdtrainer_pp_stages_matches_sequential(tmp_path):
    """TrainerConfig.pp_stages: a CDTrainer training the '_dd8' BIT with
    the decoder pipelined over 2 stages computes the same train-step
    loss/confusion and the same eval logits as the sequential trainer."""
    from stcd_tpu.data.datasets import SyntheticCDDataset
    from stcd_tpu.data.loader import DataLoader
    from stcd_tpu.train.trainer import CDTrainer, TrainerConfig

    ds = SyntheticCDDataset(length=4, size=32)
    loaders = {"train": DataLoader(ds, 2, prefetch=0),
               "val": DataLoader(ds, 2, prefetch=0)}

    def make(pp):
        cfg = TrainerConfig(net_G="base_transformer_pos_s4_dd8", n_class=2,
                            img_size=32, max_epochs=1, loss="ce",
                            optimizer="adam", lr=1e-3, seed=11,
                            checkpoint_dir=str(tmp_path / f"ck{pp}"),
                            pp_stages=pp, pp_microbatches=2 if pp > 1 else 0)
        return CDTrainer(cfg, loaders)

    t_seq, t_pp = make(1), make(2)
    batch = next(iter(loaders["train"]))
    a = jnp.asarray(batch["A"])
    b = jnp.asarray(batch["B"])
    label = jnp.asarray(batch["label"]).astype(jnp.float32)

    s_seq = t_seq._init_state()
    s_pp = t_pp._init_state()  # same seed -> identical init
    rng = jax.random.PRNGKey(0)
    s_seq, loss_seq, cm_seq = t_seq.train_step(s_seq, a, b, label, rng)
    s_pp, loss_pp, cm_pp = t_pp.train_step(s_pp, a, b, label, rng)
    np.testing.assert_allclose(float(loss_seq), float(loss_pp), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(cm_seq), np.asarray(cm_pp))

    f_seq, _ = t_seq.eval_step(s_seq, a, b, label)
    f_pp, _ = t_pp.eval_step(s_pp, a, b, label)
    np.testing.assert_allclose(np.asarray(f_seq), np.asarray(f_pp),
                               rtol=2e-4, atol=2e-4)


def test_cdtrainer_pp_stages_rejects_cnn():
    from stcd_tpu.data.datasets import SyntheticCDDataset
    from stcd_tpu.data.loader import DataLoader
    from stcd_tpu.train.trainer import CDTrainer, TrainerConfig

    ds = SyntheticCDDataset(length=2, size=32)
    loaders = {"train": DataLoader(ds, 2, prefetch=0),
               "val": DataLoader(ds, 2, prefetch=0)}
    cfg = TrainerConfig(net_G="SiamUnet_abs", img_size=32, pp_stages=2)
    with pytest.raises(NotImplementedError):
        CDTrainer(cfg, loaders)


# ------------------------- heterogeneous GPipe (VERDICT r2 item 5) ----------

def _hetero_setup(batch=8):
    """4 DISTINCT stages with changing activation shapes/structures: a
    downsampling conv-ish chain like the mit encoder's stages —
    (B,8,8,4) -> (B,4,4,8) -> (B,2,2,16) -> dict(x,(B,2,2,16),pooled
    (B,16)) -> (B,8)."""
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    params = [
        {"w": jax.random.normal(k[0], (4, 8)) * 0.4},
        {"w": jax.random.normal(k[1], (8, 16)) * 0.4,
         "b": jnp.ones((16,)) * 0.1},
        {"w": jax.random.normal(k[2], (16, 16)) * 0.4},
        {"w": jax.random.normal(k[3], (16, 8)) * 0.4},
    ]

    def s0(p, x):  # (B,8,8,4) -> (B,4,4,8): 2x2 mean-pool + channel mix
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
        return jnp.tanh(x @ p["w"])

    def s1(p, x):  # (B,4,4,8) -> (B,2,2,16)
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
        return jnp.tanh(x @ p["w"] + p["b"])

    def s2(p, x):  # (B,2,2,16) -> dict: structure change mid-pipeline
        y = jnp.tanh(x @ p["w"]) + x
        return {"x": y, "pooled": y.mean(axis=(1, 2))}

    def s3(p, d):  # dict -> (B,8)
        return d["pooled"] @ p["w"] + d["x"].sum(axis=(1, 2, 3))[:, None]

    x0 = jax.random.normal(jax.random.PRNGKey(9), (batch, 8, 8, 4))
    return [s0, s1, s2, s3], params, x0


@pytest.mark.parametrize("n_micro", [2, 4])
def test_gpipe_hetero_forward_matches_sequential(n_micro):
    from stcd_tpu.parallel.pipeline import gpipe_hetero
    fns, params, x0 = _hetero_setup()
    ref = x0
    for f, p in zip(fns, params):
        ref = f(p, ref)
    mesh = create_mesh(stage=4)
    out = jax.jit(lambda ps, a: gpipe_hetero(fns, ps, a, mesh=mesh,
                                             n_micro=n_micro))(params, x0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gpipe_hetero_grads_match_sequential():
    from stcd_tpu.parallel.pipeline import gpipe_hetero
    fns, params, x0 = _hetero_setup()
    mesh = create_mesh(stage=4)

    def loss_seq(ps):
        a = x0
        for f, p in zip(fns, ps):
            a = f(p, a)
        return jnp.sum(a ** 2)

    def loss_pp(ps):
        return jnp.sum(gpipe_hetero(fns, ps, x0, mesh=mesh, n_micro=4) ** 2)

    l1, g1 = jax.jit(jax.value_and_grad(loss_seq))(params)
    l2, g2 = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_gpipe_hetero_composes_with_data_parallel():
    from stcd_tpu.parallel.pipeline import gpipe_hetero
    from jax.sharding import NamedSharding, PartitionSpec as P
    fns, params, x0 = _hetero_setup()
    mesh = create_mesh(data=2, stage=4)
    ref = x0
    for f, p in zip(fns, params):
        ref = f(p, ref)
    xsh = jax.device_put(x0, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda ps, a: gpipe_hetero(fns, ps, a, mesh=mesh,
                                             n_micro=2))(params, xsh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gpipe_hetero_single_stage_reduces_to_sequential():
    from stcd_tpu.parallel.pipeline import gpipe_hetero
    fns, params, x0 = _hetero_setup()
    mesh = create_mesh(stage=1)
    ref = x0
    for f, p in zip(fns, params):
        ref = f(p, ref)
    out = gpipe_hetero(fns, params, x0, mesh=mesh, n_micro=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_segformer_encoder_pipeline_matches_sequential():
    """The MiT encoder with its 4 heterogeneous stages run as a GPipe
    pipeline (SegFormerEncoder.pipeline -> gpipe_hetero) must reproduce
    the sequential forward exactly in eval mode, and its grads."""
    from stcd_tpu.models.changeformer import SegFormerEncoder

    enc = SegFormerEncoder(embed_dims=(8, 12, 16, 24), depths=(1, 1, 2, 1),
                           num_heads=(1, 2, 2, 4), sr_ratios=(4, 2, 2, 1),
                           mlp_ratios=(2, 2, 2, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    v = enc.init(jax.random.PRNGKey(1), x)
    ref = enc.apply(v, x)

    mesh = create_mesh(data=2, stage=4)
    penc = enc.clone(pipeline={"mesh": mesh, "n_micro": 2})
    out = jax.jit(lambda p, a: penc.apply({"params": p}, a))(v["params"], x)
    assert len(out) == len(ref) == 4
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)

    def loss_seq(p):
        return sum(jnp.mean(o ** 2) for o in enc.apply({"params": p}, x))

    def loss_pp(p):
        return sum(jnp.mean(o ** 2) for o in penc.apply({"params": p}, x))

    l1, g1 = jax.jit(jax.value_and_grad(loss_seq))(v["params"])
    l2, g2 = jax.jit(jax.value_and_grad(loss_pp))(v["params"])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for (k1, a), b2 in zip(jax.tree_util.tree_leaves_with_path(g1),
                           jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b2), np.asarray(a),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(k1))


@pytest.mark.slow
def test_cdtrainer_pp_stages_changeformer(tmp_path):
    """CDTrainer(pp_stages=4) with net_G=ChangeFormerV6: the encoder
    pipeline trains (finite loss, params move) and eval logits equal the
    sequential trainer's (VERDICT r2 item 5 wiring criterion)."""
    from stcd_tpu.data.datasets import SyntheticCDDataset
    from stcd_tpu.data.loader import DataLoader
    from stcd_tpu.train.trainer import CDTrainer, TrainerConfig

    ds = SyntheticCDDataset(length=4, size=32)
    loaders = {"train": DataLoader(ds, 4, prefetch=0),
               "val": DataLoader(ds, 4, prefetch=0)}

    def make(pp):
        cfg = TrainerConfig(net_G="ChangeFormerV6", n_class=2,
                            img_size=32, max_epochs=1, loss="ce",
                            optimizer="adam", lr=1e-3, seed=11,
                            checkpoint_dir=str(tmp_path / f"ck{pp}"),
                            pp_stages=pp, pp_microbatches=2 if pp > 1 else 0)
        return CDTrainer(cfg, loaders)

    t_seq, t_pp = make(1), make(4)
    batch = next(iter(loaders["train"]))
    a = jnp.asarray(batch["A"])
    b = jnp.asarray(batch["B"])
    label = jnp.asarray(batch["label"]).astype(jnp.float32)

    s_seq = t_seq._init_state()
    s_pp = t_pp._init_state()
    f_seq, _ = t_seq.eval_step(s_seq, a, b, label)
    f_pp, _ = t_pp.eval_step(s_pp, a, b, label)
    np.testing.assert_allclose(np.asarray(f_pp), np.asarray(f_seq),
                               rtol=2e-4, atol=2e-4)

    rng = jax.random.PRNGKey(0)
    s_pp, loss_pp, cm_pp = t_pp.train_step(s_pp, a, b, label, rng)
    assert np.isfinite(float(loss_pp))
    moved = jax.tree_util.tree_map(
        lambda p0, p1: float(jnp.max(jnp.abs(p0 - p1))),
        t_pp._init_state().params, s_pp.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_gpipe_hetero_collect_aux_matches_sequential():
    """collect_aux: per-stage auxiliary outputs (device-resident slot
    buffers, never on the ring) must equal the sequential per-stage
    values, for forward AND gradients."""
    from stcd_tpu.parallel.pipeline import gpipe_hetero
    fns, params, x0 = _hetero_setup()

    def with_aux(f):
        def g(p, a):
            y = f(p, a)
            leaf = y["pooled"] if isinstance(y, dict) else y
            return y, leaf.reshape(leaf.shape[0], -1).sum(-1)
        return g

    afns = [with_aux(f) for f in fns]

    def seq(ps):
        a, auxes = x0, []
        for f, p in zip(afns, ps):
            a, aux = f(p, a)
            auxes.append(aux)
        return a, auxes

    ref_final, ref_aux = seq(params)
    mesh = create_mesh(stage=4)
    out, auxes = jax.jit(lambda ps: gpipe_hetero(
        afns, ps, x0, mesh=mesh, n_micro=4, collect_aux=True))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_final),
                               rtol=1e-5, atol=1e-5)
    assert len(auxes) == 4
    for a, r in zip(auxes, ref_aux):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)

    def loss_pp(ps):
        _, aux = gpipe_hetero(afns, ps, x0, mesh=mesh, n_micro=4,
                              collect_aux=True)
        return sum(jnp.sum(a ** 2) for a in aux)

    def loss_seq(ps):
        _, aux = seq(ps)
        return sum(jnp.sum(a ** 2) for a in aux)

    l1, g1 = jax.jit(jax.value_and_grad(loss_seq))(params)
    l2, g2 = jax.jit(jax.value_and_grad(loss_pp))(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_vig_encoder_pipeline_matches_sequential():
    """VERDICT r3 item 6: the pyramid ViG encoder's DeepGCN stages run as
    a heterogeneous GPipe (VIGBackbone.pipeline -> gpipe_hetero) must
    reproduce the sequential forward exactly in eval mode (frozen BN on
    both sides -> bit-level agreement expected), and its grads."""
    from stcd_tpu.models.changevig import VIGBackbone

    enc = VIGBackbone(blocks=(1, 1, 1, 1), channels=(8, 12, 16, 24),
                      k=4, img_size=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    v = enc.init(jax.random.PRNGKey(1), x)
    ref = enc.apply(v, x)

    mesh = create_mesh(data=2, stage=4)
    penc = enc.clone(pipeline={"mesh": mesh, "n_micro": 2})
    out = jax.jit(lambda vv, a: penc.apply(vv, a))(v, x)
    assert len(out) == len(ref) == 4
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)

    def loss_seq(p):
        outs = enc.apply({"params": p, "batch_stats": v["batch_stats"]}, x)
        return sum(jnp.mean(o ** 2) for o in outs)

    def loss_pp(p):
        outs = penc.apply({"params": p, "batch_stats": v["batch_stats"]}, x)
        return sum(jnp.mean(o ** 2) for o in outs)

    l1, g1 = jax.jit(jax.value_and_grad(loss_seq))(v["params"])
    l2, g2 = jax.jit(jax.value_and_grad(loss_pp))(v["params"])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for (k1, a), b2 in zip(jax.tree_util.tree_leaves_with_path(g1),
                           jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b2), np.asarray(a),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(k1))


@pytest.mark.slow
def test_cdtrainer_pp_stages_changevig(tmp_path):
    """CDTrainer(pp_stages=4) with net_G=ChangeGNNV2: the ViG encoder
    pipeline trains (finite loss, params move) and eval logits equal the
    sequential trainer's (VERDICT r3 item 6 wiring criterion; pipelined
    encoder stages run frozen-BN — VIGBackbone.pipeline docstring)."""
    from stcd_tpu.data.datasets import SyntheticCDDataset
    from stcd_tpu.data.loader import DataLoader
    from stcd_tpu.train.trainer import CDTrainer, TrainerConfig

    ds = SyntheticCDDataset(length=4, size=32)
    loaders = {"train": DataLoader(ds, 4, prefetch=0),
               "val": DataLoader(ds, 4, prefetch=0)}

    def make(pp):
        cfg = TrainerConfig(net_G="ChangeGNNV2", n_class=2,
                            img_size=32, max_epochs=1, loss="ce",
                            optimizer="adam", lr=1e-3, seed=11,
                            checkpoint_dir=str(tmp_path / f"ck{pp}"),
                            pp_stages=pp, pp_microbatches=2 if pp > 1 else 0)
        return CDTrainer(cfg, loaders)

    t_seq, t_pp = make(1), make(4)
    batch = next(iter(loaders["train"]))
    a = jnp.asarray(batch["A"])
    b = jnp.asarray(batch["B"])
    label = jnp.asarray(batch["label"]).astype(jnp.float32)

    s_seq = t_seq._init_state()
    s_pp = t_pp._init_state()
    f_seq, _ = t_seq.eval_step(s_seq, a, b, label)
    f_pp, _ = t_pp.eval_step(s_pp, a, b, label)
    np.testing.assert_allclose(np.asarray(f_pp), np.asarray(f_seq),
                               rtol=2e-4, atol=2e-4)

    s2, loss, _cm = t_pp.train_step(s_pp, a, b, label, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    moved = any(
        float(np.abs(np.asarray(x) - np.asarray(y)).max()) > 0
        for x, y in zip(jax.tree_util.tree_leaves(s_seq.params),
                        jax.tree_util.tree_leaves(s2.params)))
    assert moved, "pipelined ViG train step did not move params"
