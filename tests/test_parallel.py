"""Multi-device data parallelism tests on the 8-virtual-CPU mesh.

Validates the TPU-native DataParallel replacement (SURVEY.md §2.5):
a train step over a batch sharded across 8 devices computes exactly the
same loss/gradient math as the single-placement step — XLA inserts the
cross-device reductions, including global BatchNorm statistics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from stcd_tpu.models import SegCD
from stcd_tpu.parallel.mesh import batch_sharding, create_mesh, param_sharding
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_cd_steps


@pytest.fixture(scope="module")
def setup():
    model = SegCD(encoder_name="resnet18", classes=1,
                  decoder_channels=(16, 12, 8, 6, 4))
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (8, 32, 32, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3))
    lab = (jax.random.uniform(jax.random.PRNGKey(2), (8, 32, 32, 1)) > 0.8
           ).astype(jnp.float32)
    tx = optax.adam(poly_schedule(1e-3, 2, 2))
    state = create_train_state(model, key, (a, b), tx)
    return model, state, {"A": a, "B": b, "label": lab}


def test_mesh_shapes():
    mesh = create_mesh()
    assert (mesh.shape["data"] * mesh.shape["model"] * mesh.shape["space"]
            * mesh.shape["stage"] == len(jax.devices()))
    mesh2 = create_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2, "space": 1, "stage": 1}
    mesh3 = create_mesh(model=1, space=4)
    assert mesh3.shape == {"data": 2, "model": 1, "space": 4, "stage": 1}
    mesh4 = create_mesh(stage=4)
    assert mesh4.shape == {"data": 2, "model": 1, "space": 1, "stage": 4}


def _copy(state):
    # train_step donates its input state; give each call a fresh copy
    return jax.tree_util.tree_map(jnp.array, state)


def test_sharded_step_matches_single_device(setup):
    model, state, batch = setup
    train_step, _ = make_cd_steps(model, augment=False)

    # single placement (copy: device_put below may alias the originals)
    s1, out1 = train_step(_copy(state), batch, jax.random.PRNGKey(3))
    state = _copy(state)

    # 8-way data-parallel placement
    mesh = create_mesh(data=8, model=1)
    repl = NamedSharding(mesh, P())
    state_sharded = state.replace(
        params=jax.device_put(state.params, repl),
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=jax.device_put(state.opt_state, repl),
    )
    batch_sharded = jax.device_put(batch, batch_sharding(mesh))
    s2, out2 = train_step(state_sharded, batch_sharded, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out1["cm"]), np.asarray(out2["cm"]))
    # updated params identical -> gradient psum == single-device gradient
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for x, y in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-3)


def test_tensor_parallel_matches_single_device(setup):
    """TP correctness, not just finiteness (VERDICT r1 item 3): the 4x2
    DPxTP step — conv kernels sharded over 'model' output channels —
    produces the SAME loss, confusion matrix and updated params as the
    unsharded single-placement step, at the DP test's tolerances."""
    model, state, batch = setup
    train_step, _ = make_cd_steps(model, augment=False)

    s1, out1 = train_step(_copy(state), batch, jax.random.PRNGKey(3))
    state = _copy(state)

    mesh = create_mesh(data=4, model=2)
    shardings = param_sharding(mesh, state.params, min_size_to_shard=1024)
    n_sharded = sum(
        s.spec != P() for s in jax.tree_util.tree_leaves(shardings))
    assert n_sharded > 0, "no kernel qualified for model-axis sharding"
    repl = NamedSharding(mesh, P())
    state2 = state.replace(
        params=jax.device_put(state.params, shardings),
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=jax.device_put(state.opt_state, repl),
    )
    batch_sharded = jax.device_put(batch, batch_sharding(mesh))
    s2, out2 = train_step(state2, batch_sharded, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out1["cm"]),
                                  np.asarray(out2["cm"]))
    for x, y in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-3)


def _tp_placements(mesh, params):
    """param_sharding placements + the count of 2-D (Dense) kernels that
    actually landed on the 'model' axis."""
    from stcd_tpu.parallel.mesh import param_sharding
    sh = param_sharding(mesh, params, min_size_to_shard=1 << 30)
    flat = jax.tree_util.tree_leaves_with_path(sh)
    n_dense = sum(1 for p, s in flat if s.spec != P())
    return sh, n_dense


def test_tensor_parallel_transformer_bit():
    """VERDICT r2 item 1: the 'model' axis must mean something for the
    transformer family. BIT's attention (to_qkv/to_q/to_k/to_v column-,
    to_out row-parallel) and FeedForward (Dense_0/Dense_1) kernels are
    sharded over 'model'; loss AND grads of the full BIT train-loss must
    equal the replicated single-placement values."""
    from stcd_tpu.losses.functional import cross_entropy
    from stcd_tpu.models.bit import BASETransformer

    model = BASETransformer(output_nc=2, resnet_stages_num=3,
                            with_pos="learned", enc_depth=1, dec_depth=2,
                            decoder_dim_head=16)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    label = (jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 16, 1))
             > 0.7).astype(jnp.int32)
    variables = model.init(jax.random.PRNGKey(3), x1, x2)

    def loss_fn(p, a, b):
        logits = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, a, b)
        return cross_entropy(logits, label)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    ref_loss, ref_grads = vg(variables["params"], x1, x2)

    mesh = create_mesh(data=4, model=2)
    shardings, n_dense = _tp_placements(mesh, variables["params"])
    assert n_dense >= 8, f"only {n_dense} transformer kernels sharded"
    p_sh = jax.device_put(variables["params"], shardings)
    bs = batch_sharding(mesh)
    loss, grads = vg(p_sh, jax.device_put(x1, bs), jax.device_put(x2, bs))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for (path, g1), g2 in zip(
            jax.tree_util.tree_leaves_with_path(ref_grads),
            jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=5e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_tensor_parallel_segformer_block():
    """The exact modules ChangeFormerV5/V6 instantiate — SRAttention
    (q/kv column-, proj row-parallel) + MixFFN (fc1/dwconv/fc2 hidden
    sharding) — run TP-sharded with fwd AND grads equal to replicated."""
    from stcd_tpu.models.changeformer import SegFormerEncoder

    enc = SegFormerEncoder(embed_dims=(16, 32), depths=(1, 1),
                           num_heads=(2, 4), sr_ratios=(4, 2),
                           first_patch=7, first_stride=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3))
    variables = enc.init(jax.random.PRNGKey(1), x)

    def loss_fn(p, xx):
        outs = enc.apply({"params": p}, xx)
        return sum(jnp.mean(jnp.square(o)) for o in outs)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    ref_loss, ref_grads = vg(variables["params"], x)

    mesh = create_mesh(data=4, model=2)
    shardings, n_dense = _tp_placements(mesh, variables["params"])
    assert n_dense >= 10, f"only {n_dense} transformer kernels sharded"
    # the sharded set must include every rule family
    specs = {jax.tree_util.keystr(p): s.spec for p, s in
             jax.tree_util.tree_leaves_with_path(shardings)}
    assert any("'q'" in k and s == P(None, "model") for k, s in specs.items())
    assert any("'proj'" in k and s == P("model", None) for k, s in specs.items())
    assert any("'fc1'" in k and s == P(None, "model") for k, s in specs.items())
    assert any("'fc2'" in k and s == P("model", None) for k, s in specs.items())
    assert any("'dwconv'" in k and s == P(None, None, None, "model")
               for k, s in specs.items())
    # patch-embed projections must stay replicated (the "proj" conv)
    assert all(s == P() for k, s in specs.items() if "patch_embed" in k)

    p_sh = jax.device_put(variables["params"], shardings)
    loss, grads = vg(p_sh, jax.device_put(x, batch_sharding(mesh)))

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-5)
    for (path, g1), g2 in zip(
            jax.tree_util.tree_leaves_with_path(ref_grads),
            jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=5e-4, rtol=5e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_spatial_partition_matches_single_device(setup):
    """Spatial partitioning (SP, beyond parity): with NHWC activations
    sharded along H over the 'space' axis (2 data x 4 space mesh), GSPMD
    inserts the conv/pool halo exchanges and the train step produces the
    SAME loss, confusion matrix and updated params as the unsharded
    single-placement step. This is the TPU-native answer to the
    reference's offline raster tiling (split.py:43-46) for training at
    resolutions where the per-device batch would drop below one image."""
    model, state, batch = setup
    train_step, _ = make_cd_steps(model, augment=False)

    s1, out1 = train_step(_copy(state), batch, jax.random.PRNGKey(3))
    state = _copy(state)

    mesh = create_mesh(data=2, model=1, space=4)
    repl = NamedSharding(mesh, P())
    state2 = state.replace(
        params=jax.device_put(state.params, repl),
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=jax.device_put(state.opt_state, repl),
    )
    sharded = batch_sharding(mesh, spatial=True)
    assert sharded.spec == P("data", "space")
    batch_sharded = jax.device_put(batch, sharded)
    # the input really is split into 8-row strips across 'space'
    a_shard_shape = batch_sharded["A"].addressable_shards[0].data.shape
    assert a_shard_shape == (4, 8, 32, 3)
    from stcd_tpu.parallel.mesh import set_spatial_mesh
    set_spatial_mesh(mesh)  # exercise the constrain_spatial layout pins
    try:
        # fresh step builder: the flag is read at TRACE time, and the
        # earlier single-placement call already traced train_step
        train_step_sp, _ = make_cd_steps(model, augment=False)
        s2, out2 = train_step_sp(state2, batch_sharded,
                                 jax.random.PRNGKey(3))
    finally:
        set_spatial_mesh(None)

    # looser than the DP/TP checks: splitting H changes the ORDER of the
    # BN-stat / loss-mean reductions (per-strip partials then a psum), so
    # fp32 rounding differs by ~1e-4 relative — reduction reordering, not
    # wrong halo math (DP/TP keep each image's reduction on one device).
    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=5e-4)
    # random-init logits cluster at sigmoid~0.5, so the same reordering
    # noise flips a handful of exactly-borderline pixels across the 0.5
    # threshold; bound the flip count instead of demanding bit equality
    cm_delta = int(np.abs(np.asarray(out1["cm"], np.int64)
                          - np.asarray(out2["cm"], np.int64)).sum())
    assert cm_delta <= 16, f"confusion counts moved by {cm_delta} pixels"
    for x, y in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-3)


def test_gspmd_conv_kernel_slice_hazard():
    """Round-4 discovery #1: on a mesh with BOTH a (even idle) 'model'
    axis and a 'space' axis, a conv whose kernel operand is an in-graph
    SLICE of a wider array lets GSPMD propagation assign the kernel a
    free-axis sharding — and the feature-partitioned + spatially-
    partitioned conv it then emits computes WRONG VALUES (f64 error ~3e2
    observed). This pins the framework's guards:
      (a) mesh.constrain_replicated makes the sliced-kernel conv exact
          (used by the fused decoder's derived kernels);
      (b) param_sharding never puts conv kernels on 'model' when the
          mesh has a real 'space' axis (defense in depth behind the
          create_mesh rejection).
    The unpinned hazard itself is only diagnostic: if a future XLA fixes
    it, this test still passes (the guards stay correct either way)."""
    from jax.sharding import Mesh
    from stcd_tpu.parallel.mesh import (constrain_replicated,
                                        set_spatial_mesh)

    skip = jax.random.normal(jax.random.PRNGKey(1), (8, 2, 2, 64))
    kw = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 192, 16))
    dn = ("NHWC", "HWIO", "NHWC")
    devs = np.array(jax.devices()).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "model", "space"))

    def conv(a, k):
        return jax.lax.conv_general_dilated(a, k, (1, 1), ((1, 1), (1, 1)),
                                            dimension_numbers=dn)

    y_ref = np.asarray(jax.jit(lambda a, k: conv(a, k[:, :, 128:, :])
                               )(skip, kw))
    sp = jax.device_put(skip, NamedSharding(mesh, P("data", "space")))
    kp = jax.device_put(kw, NamedSharding(mesh, P()))

    set_spatial_mesh(mesh)
    try:
        y_fix = np.asarray(jax.jit(
            lambda a, k: conv(a, constrain_replicated(k[:, :, 128:, :]))
        )(sp, kp))
    finally:
        set_spatial_mesh(None)
    np.testing.assert_allclose(y_ref, y_fix, atol=1e-5)

    # guard (b): conv kernels stay off 'model' whenever space > 1 in
    # GSPMD mode; manual_space=True (the shard_map spatial path, where
    # GSPMD never sees the axis) re-enables conv TP on the same mesh
    cnn_params = {"big_conv": {"kernel": jnp.zeros((3, 3, 64, 64))}}
    raw3 = Mesh(np.array(jax.devices()).reshape(2, 2, 2),
                ("data", "model", "space"))
    sh = param_sharding(raw3, cnn_params, min_size_to_shard=1024)
    assert sh["big_conv"]["kernel"].spec == P()
    sh_manual = param_sharding(raw3, cnn_params, min_size_to_shard=1024,
                               manual_space=True)
    assert sh_manual["big_conv"]["kernel"].spec \
        == P(None, None, None, "model")
    sh2 = param_sharding(create_mesh(data=4, model=2), cnn_params,
                         min_size_to_shard=1024)
    assert sh2["big_conv"]["kernel"].spec == P(None, None, None, "model")


def test_gspmd_free_axis_kernel_grad_hazard():
    """Round-4 discovery #2 (the decisive one): ANY mesh carrying a
    size>1 third axis next to 'data' x 'space' makes GSPMD (classic and
    shardy partitioners alike) compute WRONG conv kernel GRADIENTS for
    spatially-sharded wide-channel convs — loss exact, grads off by ~1e1
    in f64, i.e. silent training corruption. The 2-axis data x space
    mesh is exact at every split. This is why create_mesh REJECTS
    space>1 combined with model>1/stage>1 (asserted here), and the
    2-axis exactness is pinned as the supported contract."""
    from jax.sharding import Mesh

    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64))

    def loss(kk, xx):
        y = jax.lax.conv_general_dilated(xx, kk, (1, 1), ((1, 1), (1, 1)),
                                         dimension_numbers=dn)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.jit(jax.grad(loss))(k, x)
    mesh2 = Mesh(np.array(jax.devices()).reshape(4, 2), ("data", "space"))
    g2 = jax.jit(jax.grad(loss))(
        jax.device_put(k, NamedSharding(mesh2, P())),
        jax.device_put(x, NamedSharding(mesh2, P("data", "space"))))
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g2),
                               atol=1e-5)

    # Round 5: create_mesh ACCEPTS the composed geometry (the manual
    # shard_map 'space' path makes it exact — test_spatial_shardmap.py);
    # the guard moved to the GSPMD-spatial entry point, which still
    # must reject it while the partitioner bug stands.
    for mesh_bad in (create_mesh(data=2, model=2, space=2),
                     create_mesh(data=2, space=2, stage=2)):
        with pytest.raises(ValueError, match="spatial.py"):
            batch_sharding(mesh_bad, spatial=True)


@pytest.mark.parametrize("arch", ["resnet18", "resnet50"])
def test_spatial_backward_tiny_maps(arch):
    """Round-4 discovery #3: below 2 rows per space-shard, the GSPMD
    conv BACKWARD of a strided residual stage is miscompiled (loss
    exact, kernel grads off by ~1e2) — caught because rounds 1-3 only
    asserted SP losses and post-Adam params (Adam's normalizer masks
    gradient magnitude errors). The >= 2-rows floor
    (mesh._space_shardable) now pins every too-small stage batch-
    parallel, and this test asserts DIRECT gradient equality for the
    resnet encoder under DP x SP — the layout the r3 dryrun/tests ran
    loss-only. Covers BOTH block types: resnet18 (BasicBlock) and
    resnet50 (Bottleneck — the bench encoder; ADVICE r4 asked for its
    interior pins + coverage)."""
    from stcd_tpu.encoders.resnet import ResNetEncoder
    from stcd_tpu.parallel.mesh import set_spatial_mesh

    x = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 16, 3))
    mesh = create_mesh(data=4, model=1, space=2)
    module = ResNetEncoder(arch=arch, depth=3)
    variables = module.init(jax.random.PRNGKey(3), x, True)

    def loss_fn(p, a):
        out, _ = module.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, a,
            True, mutable=["batch_stats"])
        return jnp.sum(jnp.sin(out[-1].astype(jnp.float32)) ** 2)

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"], x)
    set_spatial_mesh(mesh)
    try:
        vg = jax.jit(jax.value_and_grad(loss_fn))
        loss, grads = vg(
            jax.device_put(variables["params"], NamedSharding(mesh, P())),
            jax.device_put(x, batch_sharding(mesh, spatial=True)))
    finally:
        set_spatial_mesh(None)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=5e-5)
    for (path, g1), g2 in zip(
            jax.tree_util.tree_leaves_with_path(ref_grads),
            jax.tree_util.tree_leaves(grads)):
        # fp32 BN-stat reduction reordering is the only allowed noise.
        # Measured for the Bottleneck stack: a DP-ONLY sharded run shows
        # the same ~5e-3..5e-2 absolute diffs vs unsharded on O(1e2-1e3)
        # grads (pure reduction-order noise, no 'space' involvement);
        # the miscompile this test guards produces O(|g|) errors, so the
        # floor scales with the leaf's gradient magnitude.
        a1 = np.asarray(g1)
        atol = max(2e-3, 1e-4 * float(np.abs(a1).max()))
        np.testing.assert_allclose(a1, np.asarray(g2),
                                   atol=atol, rtol=1e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_dp_sp_bit_grads_exact(setup):
    """DP x SP direct-GRADIENT equality for the transformer family (the
    full BIT train loss), plus the SegCD composed-geometry regression:
    the fused decoder under a spatially-sharded step must match the
    single placement (the round-4 kernel-slice hazard corrupted exactly
    this before the constrain_replicated pins)."""
    from stcd_tpu.losses.functional import cross_entropy
    from stcd_tpu.models.bit import BASETransformer
    from stcd_tpu.parallel.mesh import set_spatial_mesh

    bit = BASETransformer(output_nc=2, resnet_stages_num=3,
                          with_pos="learned", enc_depth=1, dec_depth=2,
                          decoder_dim_head=16)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    label = (jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 16, 1))
             > 0.7).astype(jnp.int32)
    variables = bit.init(jax.random.PRNGKey(3), x1, x2)

    def loss_fn(p, a, b):
        logits = bit.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, a, b)
        return cross_entropy(logits, label)

    ref_loss, ref_grads = jax.jit(jax.value_and_grad(loss_fn))(
        variables["params"], x1, x2)

    mesh = create_mesh(data=4, model=1, space=2)
    set_spatial_mesh(mesh)
    try:
        vg = jax.jit(jax.value_and_grad(loss_fn))
        bs = batch_sharding(mesh, spatial=True)
        loss, grads = vg(
            jax.device_put(variables["params"], NamedSharding(mesh, P())),
            jax.device_put(x1, bs), jax.device_put(x2, bs))
    finally:
        set_spatial_mesh(None)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=5e-5)
    for (path, g1), g2 in zip(
            jax.tree_util.tree_leaves_with_path(ref_grads),
            jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=2e-3, rtol=1e-3,
                                   err_msg=jax.tree_util.keystr(path))

    # SegCD (fused decoder) under the same spatially-sharded geometry:
    # train-step equality at the SP tolerance regime
    model, state, batch = setup
    train_step, _ = make_cd_steps(model, augment=False)
    s1, out1 = train_step(_copy(state), batch, jax.random.PRNGKey(3))
    state = _copy(state)
    repl = NamedSharding(mesh, P())
    state2 = state.replace(
        params=jax.device_put(state.params, repl),
        batch_stats=jax.device_put(state.batch_stats, repl),
        opt_state=jax.device_put(state.opt_state, repl),
    )
    batch_sharded = jax.device_put(batch, batch_sharding(mesh, spatial=True))
    set_spatial_mesh(mesh)
    try:
        train_step_sp, _ = make_cd_steps(model, augment=False)
        s2, out2 = train_step_sp(state2, batch_sharded,
                                 jax.random.PRNGKey(3))
    finally:
        set_spatial_mesh(None)
    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=5e-4)
    for xx, yy in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(xx), np.asarray(yy),
                                   atol=5e-3)


def test_loader_process_partitioning():
    """Multi-host dataset sharding: disjoint strided subsets that cover
    the dataset, same shuffle permutation on every process, and EQUAL
    per-process sample counts (wraparound padding)."""
    import numpy as np
    from stcd_tpu.data.loader import DataLoader

    class Idx:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2, 2, 1), i, np.float32)}

    seen = []
    for p in range(3):
        dl = DataLoader(Idx(), batch_size=2, shuffle=True, prefetch=0,
                        process_index=p, process_count=3, seed=7)
        vals = []
        for batch in dl:
            vals.extend(int(v) for v in np.asarray(batch["x"])[:, 0, 0, 0])
        seen.append(vals)
    assert set(v for vals in seen for v in vals) == set(range(10)), \
        "processes must cover the dataset"
    assert not (set(seen[0]) & set(seen[1])), "shards must be disjoint"
    # every process sees EXACTLY ceil(10/3)=4 samples (short shards wrap
    # their own samples, DistributedSampler-style) so all processes run the
    # same number of jitted steps — unequal counts would deadlock SPMD
    assert [len(v) for v in seen] == [4, 4, 4]


def test_assemble_global_batch_single_host():
    import numpy as np
    import jax.numpy as jnp
    from stcd_tpu.parallel.distributed import assemble_global_batch, initialize
    from stcd_tpu.parallel.mesh import create_mesh

    initialize(num_processes=1)  # no-op
    mesh = create_mesh(model=1)
    batch = {"A": np.ones((8, 4, 4, 3), np.float32), "name": ["a"] * 8}
    out = assemble_global_batch(mesh, batch)
    assert out["A"].shape == (8, 4, 4, 3)
    assert float(jnp.sum(out["A"])) == 8 * 4 * 4 * 3
    assert out["name"] == ["a"] * 8


def test_assemble_global_batch_partial_final_batch():
    """drop_last=False val loaders can emit a final batch that does not
    divide the data axis (ADVICE r1): assemble must fall back to a
    replicated placement instead of raising, mirroring data/loader.py's
    single-host _shardable fallback."""
    import numpy as np
    import jax.numpy as jnp
    from stcd_tpu.parallel.distributed import assemble_global_batch
    from stcd_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(model=1)  # 8-way data axis
    rows = 5  # 5 % 8 != 0 -> make_array_from_process_local_data raises
    batch = {"A": np.arange(rows * 4, dtype=np.float32).reshape(rows, 2, 2, 1),
             "name": ["n"] * rows}
    out = assemble_global_batch(mesh, batch)
    assert out["A"].shape == (rows, 2, 2, 1)
    np.testing.assert_array_equal(np.asarray(out["A"]),
                                  batch["A"])
    assert out["name"] == ["n"] * rows
    # and the replicated batch still feeds a jitted reduction
    assert float(jnp.sum(out["A"])) == float(batch["A"].sum())
