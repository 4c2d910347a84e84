"""Manual shard_map spatial partitioning (parallel/spatial.py).

Round-5 (VERDICT r4 item 1): the 'space' axis owned by explicit halo
exchange instead of GSPMD — composable with 'data'/'model'/'stage'
because the partitioner never sees it. These tests pin:

- halo-conv exactness vs the global conv across the stencil zoo
  (strided, kernel-dilated, lhs-dilated/fused-upsample, 1-row strips,
  halo-wider-than-shard gather path), forward AND both gradients;
- max_pool halo exactness (-inf edge fill);
- BatchNorm spatial-pmean statistics;
- the headline: SegCD resnet18 train step on a DP x TP x SP 2x2x2 mesh
  — the exact geometry the GSPMD partitioner miscompiles
  (test_parallel.py::test_gspmd_free_axis_kernel_grad_hazard) — with
  DIRECT gradient equality vs the unsharded step.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stcd_tpu.parallel.mesh import batch_sharding, param_sharding
from stcd_tpu.parallel.spatial import (make_spatial_cd_steps,
                                       spatial_context)

DN = ("NHWC", "HWIO", "NHWC")
ORIG_CONV = jax.lax.conv_general_dilated


def _mesh_ds(data, space):
    devs = np.array(jax.devices())[: data * space]
    return Mesh(devs.reshape(data, space), ("data", "space"))


CONV_CASES = [
    # name,            H,  W, cin, cout, kh, sh, pt, pb, dh, L, S
    ("k3s1p1",         16, 16, 8, 8, 3, 1, 1, 1, 1, 1, 2),
    ("k7s2p3_stem",    32, 32, 3, 8, 7, 2, 3, 3, 1, 1, 2),
    ("k1s1",           16, 16, 8, 8, 1, 1, 0, 0, 1, 1, 2),
    ("k1s2_downsample", 16, 16, 8, 8, 1, 2, 0, 0, 1, 1, 2),
    ("k3s2p1",         16, 16, 8, 8, 3, 2, 1, 1, 1, 1, 2),
    ("k3d2p2_dilated", 16, 16, 8, 8, 3, 1, 2, 2, 2, 1, 2),
    ("k4L2p2_fusedup", 8,  8,  8, 8, 4, 1, 2, 2, 1, 2, 2),
    ("k4L2p2_tiny",    2,  2,  8, 8, 4, 1, 2, 2, 1, 2, 2),  # 1-row strips
    ("k3_1row_strips", 4,  4,  8, 8, 3, 1, 1, 1, 1, 1, 4),
    ("k7_gather_path", 8,  8,  8, 8, 7, 1, 3, 3, 1, 1, 4),  # halo > strip
]


@pytest.mark.parametrize(
    "case", CONV_CASES, ids=[c[0] for c in CONV_CASES])
def test_halo_conv_matches_global(case):
    """Forward + input-grad + kernel-grad equality of the halo conv vs
    the global conv, for every stencil shape the SP surface uses."""
    name, H, W, cin, cout, kh, sh, pt, pb, dh, L, S = case
    mesh = _mesh_ds(8 // S, S)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, H, W, cin))
    k = jax.random.normal(jax.random.PRNGKey(1), (kh, kh, cin, cout)) * 0.1

    def gloss(conv, xx, kk):
        y = conv(xx, kk, (sh, sh), ((pt, pb), (pt, pb)), (L, L), (dh, dh),
                 DN)
        return jnp.sum(jnp.sin(y)), y

    (_, y_ref), (gx_ref, gk_ref) = jax.value_and_grad(
        functools.partial(gloss, ORIG_CONV), argnums=(0, 1),
        has_aux=True)(x, k)

    def body(xl, kl):
        with spatial_context(S):
            (_, y), (gx, gk) = jax.value_and_grad(
                functools.partial(gloss, jax.lax.conv_general_dilated),
                argnums=(0, 1), has_aux=True)(xl, kl)
        return y, gx, gk

    y, gx, gk = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(None, "space"), P()),
        out_specs=(P(None, "space"), P(None, "space"), P()),
        axis_names=frozenset({"space"})))(x, k)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y),
                               atol=1e-5, err_msg=f"{name} forward")
    np.testing.assert_allclose(np.asarray(gx_ref), np.asarray(gx),
                               atol=1e-5, err_msg=f"{name} dx")
    np.testing.assert_allclose(np.asarray(gk_ref), np.asarray(gk),
                               atol=1e-4, err_msg=f"{name} dk")


def test_halo_max_pool_matches_global():
    """max_pool k3s2p1 (the resnet stem pool) with NEGATIVE inputs: the
    -inf edge fill must not let ppermute's zero-fill win the max."""
    from stcd_tpu.layers.modules import max_pool

    mesh = _mesh_ds(4, 2)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 8)) - 5.0
    ref = max_pool(x, window=3, stride=2, padding=1)

    def body(xl):
        with spatial_context(2):
            return max_pool(xl, window=3, stride=2, padding=1)

    out = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(None, "space"),
        out_specs=P(None, "space"), axis_names=frozenset({"space"})))(x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=0)


def test_batchnorm_spatial_stats():
    """BN batch statistics under manual space = whole-image statistics
    (pmean over strips), matching the reference's single-device BN."""
    from stcd_tpu.layers.norm import BatchNorm

    mesh = _mesh_ds(4, 2)
    bn = BatchNorm(use_running_average=False, momentum=0.9)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 8)) * 3 + 1
    variables = bn.init(jax.random.PRNGKey(1), x)
    ref, ref_mut = bn.apply(variables, x, mutable=["batch_stats"])

    def body(xl):
        with spatial_context(2):
            y, mut = bn.apply(variables, xl, mutable=["batch_stats"])
        return y, mut["batch_stats"]

    out, stats = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(None, "space"),
        out_specs=(P(None, "space"), P()),
        axis_names=frozenset({"space"})))(x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_mut["batch_stats"]),
                    jax.tree_util.tree_leaves(stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def _cd_setup():
    import stcd_tpu
    from stcd_tpu.train.state import adam_poly, create_train_state

    model = stcd_tpu.SegCD(encoder_name="resnet18", classes=1,
                           decoder_channels=(32, 24, 16, 12, 8))
    x = jnp.zeros((4, 64, 64, 3))
    state = create_train_state(model, jax.random.PRNGKey(0), (x, x),
                               adam_poly(1e-3, 2, 2))
    batch = {
        "A": jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3)),
        "B": jax.random.uniform(jax.random.PRNGKey(2), (8, 64, 64, 3)),
        "label": (jax.random.uniform(jax.random.PRNGKey(3),
                                     (8, 64, 64, 1)) > 0.5)
        .astype(jnp.float32),
    }
    return model, state, batch


def test_dp_tp_sp_2x2x2_direct_grads():
    """THE composed-geometry test: SegCD resnet18 on a 2x2x2
    data x model x space mesh — manual 'space' (halo exchange), GSPMD
    'data' + 'model' (conv kernels genuinely model-sharded via
    param_sharding(manual_space=True)) — DIRECT gradient equality vs the
    single-placement value_and_grad. This is the layout round 4's GSPMD
    guard had to reject (create_mesh docstring); the manual axis makes
    it exact."""
    from stcd_tpu.parallel.spatial import bce_dice_spatial
    from stcd_tpu.losses.functional import bce_dice

    model, state, batch = _cd_setup()
    a = batch["A"] * 2 - 1
    b = batch["B"] * 2 - 1
    label = batch["label"]

    def ref_loss(params):
        (_, _, diff), _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats}, a, b,
            True, mutable=["batch_stats"])
        probs = jax.nn.sigmoid(diff.astype(jnp.float32))
        return bce_dice(probs, label)

    ref_l, ref_g = jax.jit(jax.value_and_grad(ref_loss))(state.params)

    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2, 1),
                ("data", "model", "space", "stage"))
    shmap = param_sharding(mesh, state.params, min_size_to_shard=2 ** 12,
                           manual_space=True)
    n_tp = sum(1 for s in jax.tree_util.tree_leaves(shmap)
               if s.spec != P())
    assert n_tp >= 10, "TP must actually shard conv kernels over 'model'"
    params_p = jax.device_put(state.params, shmap)

    def body(params, aa, bb, ll):
        with spatial_context(2):
            def loss_fn(p):
                (_, _, diff), _ = model.apply(
                    {"params": p, "batch_stats": state.batch_stats},
                    aa, bb, True, mutable=["batch_stats"])
                probs = jax.nn.sigmoid(diff.astype(jnp.float32))
                return bce_dice_spatial(probs, ll)
            return jax.value_and_grad(loss_fn)(params)

    bspec = P(None, "space")
    loss, grads = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(), bspec, bspec, bspec),
        out_specs=(P(), P()), axis_names=frozenset({"space"})))(
        params_p,
        jax.device_put(a, batch_sharding(mesh)),
        jax.device_put(b, batch_sharding(mesh)),
        jax.device_put(label, batch_sharding(mesh)))

    np.testing.assert_allclose(float(ref_l), float(loss), rtol=5e-5)
    for (path, g1), g2 in zip(
            jax.tree_util.tree_leaves_with_path(ref_g),
            jax.tree_util.tree_leaves(grads)):
        a1 = np.asarray(g1)
        # same measured noise floor as test_spatial_backward_tiny_maps:
        # BN-stat reduction reordering scales with the leaf's magnitude
        atol = max(2e-3, 1e-4 * float(np.abs(a1).max()))
        np.testing.assert_allclose(a1, np.asarray(g2), atol=atol,
                                   rtol=1e-3,
                                   err_msg=jax.tree_util.keystr(path))


def test_spatial_cd_steps_match_reference_steps():
    """make_spatial_cd_steps on the composed mesh == make_cd_steps on a
    single placement: loss, confusion counts, post-Adam batch_stats, and
    eval probs (after identical states)."""
    from stcd_tpu.train.steps import make_cd_steps

    model, state, batch = _cd_setup()
    ts_ref, es_ref = make_cd_steps(model, augment=False)
    s1, out1 = ts_ref(state, batch, jax.random.PRNGKey(7))

    mesh = Mesh(np.array(jax.devices()).reshape(2, 2, 2, 1),
                ("data", "model", "space", "stage"))
    model2, state2, _ = _cd_setup()
    shmap = param_sharding(mesh, state2.params, min_size_to_shard=2 ** 12,
                           manual_space=True)
    state2 = state2.replace(params=jax.device_put(state2.params, shmap))
    ts_sp, es_sp = make_spatial_cd_steps(model2, mesh, augment=False)
    batch_p = {k: jax.device_put(v, batch_sharding(mesh))
               for k, v in batch.items()}
    s2, out2 = ts_sp(state2, batch_p, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=5e-5)
    cm_delta = int(np.abs(np.asarray(out1["cm"], np.int64)
                          - np.asarray(out2["cm"], np.int64)).sum())
    assert cm_delta <= 16, f"confusion counts moved by {cm_delta}"
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
    # eval from the SAME state on both sides isolates the eval path from
    # Adam's amplification of reduction noise
    e1 = es_ref(s1, batch)
    es_sp2 = make_spatial_cd_steps(model2, mesh, augment=False)[1]
    s1_on_mesh = s2.replace(
        params=jax.device_put(s1.params, shmap),
        batch_stats=jax.device_put(s1.batch_stats,
                                   NamedSharding(mesh, P())))
    e2 = es_sp2(s1_on_mesh, batch_p)
    np.testing.assert_allclose(np.asarray(e1["probs"]),
                               np.asarray(e2["probs"]), atol=1e-4)


def test_spatial_divisibility_errors():
    """Loud ValueError when a stage height stops dividing the space
    axis (depth-5 resnet at 32^2 reaches H=1)."""
    mesh = _mesh_ds(4, 2)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 6, 4))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 4))

    def body(xl, kl):
        with spatial_context(2):
            return jax.lax.conv_general_dilated(
                xl, kl, (2, 2), ((1, 1), (1, 1)), (1, 1), (1, 1), DN)

    with pytest.raises(ValueError, match="divide"):
        jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(P(None, "space"), P()),
            out_specs=P(None, "space"),
            axis_names=frozenset({"space"})))(x, k)
