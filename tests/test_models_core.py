"""Shape/forward sanity tests for the core model family — the TPU
replacement for the reference's __main__ smoke blocks (SURVEY.md §4),
plus structural checks of the SegCD fusion semantics
(unet/model.py:316-332)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stcd_tpu.models import (
    SegCD,
    UnetSeg,
    FFCTLCD,
    SiamUnet,
)
from stcd_tpu.models.factory import define_G, create_model

H = W = 32  # small spatial size keeps CPU tests fast


@pytest.fixture(scope="module")
def ab():
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (2, H, W, 3), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 3), jnp.float32)
    return a, b


def test_unetseg_shapes(ab):
    a, _ = ab
    model = UnetSeg(encoder_name="resnet18", classes=1)
    variables = model.init(jax.random.PRNGKey(0), a)
    out = model.apply(variables, a)
    assert out.shape == (2, H, W, 1)


def test_segcd_shapes_and_fusion(ab):
    a, b = ab
    model = SegCD(encoder_name="resnet18", classes=1)
    variables = model.init(jax.random.PRNGKey(0), a, b)
    m1, m2, change = model.apply(variables, a, b)
    assert m1.shape == m2.shape == change.shape == (2, H, W, 1)
    # identical inputs -> decision diff is 0 -> change == min(diffea, 0) <= 0
    m1s, m2s, ch = model.apply(variables, a, a)
    np.testing.assert_allclose(np.asarray(m1s), np.asarray(m2s), atol=1e-5)
    assert np.max(np.abs(np.asarray(ch))) < 1e-4


def test_segcd_batched_equals_sequential(ab):
    """The 2N-batched Siamese pass must equal two sequential passes in
    eval mode (running-stats BN)."""
    a, b = ab
    batched = SegCD(encoder_name="resnet18", classes=1, siamese_batched=True)
    seq = SegCD(encoder_name="resnet18", classes=1, siamese_batched=False)
    variables = batched.init(jax.random.PRNGKey(0), a, b)
    out_b = batched.apply(variables, a, b)
    out_s = seq.apply(variables, a, b)
    for x, y in zip(out_b, out_s):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)


def test_ffctlcd_shapes(ab):
    a, b = ab
    model = FFCTLCD(encoder_name="resnet18", classes=1)
    variables = model.init(jax.random.PRNGKey(0), a, b)
    m1, m2, change = model.apply(variables, a, b)
    assert change.shape == (2, H, W, 1)


@pytest.mark.parametrize("fusion", ["ef", "diff", "conc", "sub", "crossconc"])
def test_siam_unet_family(ab, fusion):
    a, b = ab
    model = SiamUnet(fusion=fusion, label_nbr=2)
    variables = model.init(jax.random.PRNGKey(0), a, b)
    out = model.apply(variables, a, b)
    assert out.shape == (2, H, W, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_factory_keys(ab):
    a, b = ab
    model = define_G("SiamUnet_abs", n_class=2)
    variables = model.init(jax.random.PRNGKey(0), a, b)
    out = model.apply(variables, a, b)
    assert out.shape == (2, H, W, 2)
    with pytest.raises(NotImplementedError):
        define_G("nope")


def test_create_model(ab):
    a, _ = ab
    m = create_model("unetseg", encoder_name="resnet18")
    v = m.init(jax.random.PRNGKey(0), a)
    assert m.apply(v, a).shape == (2, H, W, 1)


def test_train_mode_updates_batch_stats(ab):
    a, b = ab
    model = SegCD(encoder_name="resnet18", classes=1)
    variables = model.init(jax.random.PRNGKey(0), a, b)
    outs, mutated = model.apply(
        variables, a, b, True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["batch_stats"])
    assert "batch_stats" in mutated
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(o), np.asarray(n)) for o, n in zip(old, new))


def test_sra_attention_train_dropout_paths():
    """SRAttention with attn_drop > 0 must route through the fused
    cross_attention dropout (no materialized-einsum fallback branch left,
    VERDICT r2 item 4): train mode with a dropout rng runs, differs from
    eval, and is deterministic under a fixed rng."""
    from stcd_tpu.models.changeformer import SRAttention

    att = SRAttention(num_heads=2, sr_ratio=2, attn_drop=0.1, proj_drop=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    v = att.init({"params": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)}, x, True)
    ev = att.apply(v, x, False)
    tr1 = att.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(3)})
    tr2 = att.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(3)})
    tr3 = att.apply(v, x, True, rngs={"dropout": jax.random.PRNGKey(4)})
    assert tr1.shape == ev.shape
    np.testing.assert_array_equal(np.asarray(tr1), np.asarray(tr2))
    assert np.abs(np.asarray(tr1) - np.asarray(ev)).max() > 1e-4
    assert np.abs(np.asarray(tr1) - np.asarray(tr3)).max() > 1e-6
