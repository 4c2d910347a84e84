"""Shape/forward tests for the wider CD zoo (replacing the reference's
__main__ smoke blocks: SNUNet.py:246-251, DTCDSCN.py:323-329,
DSIFN.py:191-198, networks.py:444-451)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

H = W = 64


@pytest.fixture(scope="module")
def ab():
    a = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, 3), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (2, H, W, 3), jnp.float32)
    return a, b


def _run(model, a, b, train_rngs=False):
    variables = model.init(jax.random.PRNGKey(0), a, b)
    out = model.apply(variables, a, b)
    return out


def test_snunet_ecam(ab):
    from stcd_tpu.models.snunet import SNUNetECAM
    out = _run(SNUNetECAM(out_ch=1, n1=8), *ab)
    assert out.shape == (2, H, W, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_snunet_conc(ab):
    from stcd_tpu.models.snunet import SiamNestedUNetConc
    out = _run(SiamNestedUNetConc(out_ch=1, n1=8), *ab)
    assert out.shape == (2, H, W, 1)


def test_dtcdscn(ab):
    from stcd_tpu.models.dtcdscn import CDNet34
    out = _run(CDNet34(num_classes=1), *ab)
    assert out.shape == (2, H, W, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dsifn(ab):
    from stcd_tpu.models.dsifn import DSIFN
    out = _run(DSIFN(), *ab)
    assert out.shape == (2, H, W, 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bit_resnet(ab):
    from stcd_tpu.models.bit import ResNetCD
    out = _run(ResNetCD(output_nc=2), *ab)
    assert out.shape == (2, H, W, 2)


def test_bit_transformer(ab):
    from stcd_tpu.models.bit import BASETransformer
    model = BASETransformer(output_nc=2, token_len=4, resnet_stages_num=4,
                            with_pos="learned", enc_depth=1, dec_depth=1)
    out = _run(model, *ab)
    assert out.shape == (2, H, W, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_bit_no_tokenizer(ab):
    from stcd_tpu.models.bit import BASETransformer
    model = BASETransformer(output_nc=2, tokenizer=False, pool_size=2,
                            resnet_stages_num=4, with_pos=None, token_trans=True)
    out = _run(model, *ab)
    assert out.shape == (2, H, W, 2)


def test_changeformer_v6(ab):
    from stcd_tpu.models.changeformer import ChangeFormerV6
    model = ChangeFormerV6(embed_dim=64)
    a, b = ab
    variables = model.init(jax.random.PRNGKey(0), a, b)
    outs = model.apply(variables, a, b)
    assert isinstance(outs, list) and len(outs) == 5
    assert outs[-1].shape == (2, H, W, 2)  # full-res final pred
    assert outs[0].shape == (2, H // 32, W // 32, 2)  # 1/32 side pred
    assert np.all(np.isfinite(np.asarray(outs[-1])))


def test_changeformer_v1(ab):
    from stcd_tpu.models.changeformer import ChangeFormerV1
    model = ChangeFormerV1()
    a, b = ab
    variables = model.init(jax.random.PRNGKey(0), a, b)
    out = model.apply(variables, a, b)
    assert out.shape == (2, H, W, 2)


def test_changeformer_v3(ab):
    from stcd_tpu.models.changeformer import ChangeFormerV3
    model = ChangeFormerV3()
    a, b = ab
    variables = model.init(jax.random.PRNGKey(0), a, b)
    out = model.apply(variables, a, b)
    assert out.shape == (2, H, W, 2)


def test_changeformer_v4(ab):
    from stcd_tpu.models.changeformer import ChangeFormerV4
    model = ChangeFormerV4()
    a, b = ab
    variables = model.init(jax.random.PRNGKey(0), a, b)
    outs = model.apply(variables, a, b)
    assert outs[-1].shape == (2, H, W, 2)


def test_knn_graph_correctness(np_rng):
    """KNN indices must match brute-force nearest neighbors."""
    from stcd_tpu.models.gcn_lib import knn_graph
    x = np_rng.normal(size=(1, 12, 4)).astype(np.float32)
    idx = np.asarray(knn_graph(jnp.asarray(x), jnp.asarray(x), k=3))
    d = ((x[0][:, None, :] - x[0][None, :, :]) ** 2).sum(-1)
    expected = np.argsort(d, axis=1)[:, :3]
    assert set(idx[0, 0].tolist()) == set(expected[0].tolist())
    assert idx[0, 0, 0] == 0  # nearest neighbor of a point is itself


def test_gather_neighbors_paths_agree(np_rng, monkeypatch):
    """The one-hot MXU gather and the take_along_axis fallback must be
    exact twins (the fallback triggers past ONEHOT_GATHER_BUDGET_BYTES)."""
    from stcd_tpu.models import gcn_lib
    neigh = jnp.asarray(np_rng.normal(size=(2, 7, 5)).astype(np.float32))
    idx = jnp.asarray(np_rng.integers(0, 7, size=(2, 11, 3)))
    onehot = gcn_lib.gather_neighbors(neigh, idx)
    monkeypatch.setattr(gcn_lib, "ONEHOT_GATHER_BUDGET_BYTES", 0)
    fallback = gcn_lib.gather_neighbors(neigh, idx)
    assert onehot.shape == (2, 11, 3, 5)
    np.testing.assert_array_equal(np.asarray(onehot), np.asarray(fallback))


def test_relative_pos_bias_factored_matches_gram(np_rng):
    """The factored form pe @ resize(pe).T must equal resizing the full
    (n, n) gram (the resize is linear along the second node axis only,
    so it commutes with the product); channels < 4 — no sin-cos
    frequencies — must yield the degenerate zero bias, not NaN."""
    from stcd_tpu.models.gcn_lib import (relative_pos_bias,
                                         _get_2d_sincos_pos_embed)
    for c, n, m, grid in [(48, 64, 16, None), (64, 96, 24, (12, 8))]:
        pe = _get_2d_sincos_pos_embed(c, grid if grid else int(round(n ** 0.5)))
        gram = -jnp.asarray(2.0 * (pe @ pe.T) / pe.shape[1],
                            jnp.float32)[None, :, :, None]
        want = np.asarray(jax.image.resize(gram, (1, n, m, 1),
                                           method="linear")[..., 0])
        got = np.asarray(relative_pos_bias(c, n, m, grid_hw=grid))
        np.testing.assert_allclose(got, want, atol=2e-6)
    degenerate = np.asarray(relative_pos_bias(3, 16, 4))
    np.testing.assert_array_equal(degenerate, np.zeros((1, 16, 4), np.float32))
    # non-perfect-square n without grid_hw: the factored form cannot
    # resize the first node axis, so it must fail loudly (ADVICE r2)
    # instead of returning a (1, round(sqrt(n))**2, m) mis-shaped bias
    # (ValueError, not assert: the guard must survive python -O)
    with pytest.raises(ValueError, match="grid_hw"):
        relative_pos_bias(48, 60, 16)


def test_grapher_shapes(ab):
    from stcd_tpu.models.gcn_lib import Grapher
    a, _ = ab
    x = a[:, :16, :16, :]
    g = Grapher(kernel_size=4, dilation=1, r=2)
    v = g.init(jax.random.PRNGKey(0), x)
    out = g.apply(v, x)
    assert out.shape == x.shape


def test_changegnn_v2(ab):
    from stcd_tpu.models.changevig import ChangeGNNV2
    a, b = ab
    model = ChangeGNNV2(embed_dim=32, img_size=H)
    v = model.init(jax.random.PRNGKey(0), a, b)
    outs = model.apply(v, a, b)
    assert outs[-1].shape == (2, H, W, 2)
    assert np.all(np.isfinite(np.asarray(outs[-1])))


def test_vig_v20(ab):
    from stcd_tpu.models.changevig import VIG
    a, b = ab
    model = VIG(embed_dim=32, img_size=H)
    v = model.init(jax.random.PRNGKey(0), a, b)
    outs = model.apply(v, a, b)
    assert outs[-1].shape == (2, H, W, 2)


def test_changegnn_v2_compare_modes(ab):
    from stcd_tpu.models.changevig import ChangeGNNV2Compare
    a, b = ab
    model = ChangeGNNV2Compare(embed_dim=32, img_size=H, diff_mode="abs")
    v = model.init(jax.random.PRNGKey(0), a, b)
    outs = model.apply(v, a, b)
    assert outs[-1].shape == (2, H, W, 2)


def test_changegnn_v1(ab):
    from stcd_tpu.models.changevig import ChangeGNNV1
    a, b = ab
    model = ChangeGNNV1(embed_dim=32, img_size=H)
    v = model.init(jax.random.PRNGKey(0), a, b)
    outs = model.apply(v, a, b)
    assert len(outs) == 5 and outs[-1].shape == (2, H, W, 2)


def test_define_g_covers_all_reference_keys():
    """Every net_G key in the reference factory (networks.py:138-215)
    constructs a module."""
    from stcd_tpu.models.factory import define_G
    keys = ["Unet", "SiamUnet_sub", "SiamUnet_abs", "SiamUnet_conc",
            "SiamUnet_cross_conc", "DTCDSCN", "IFNet", "SNUNet",
            "base_resnet18", "base_transformer_pos_s4",
            "base_transformer_pos_s4_dd8", "base_transformer_pos_s4_dd8_dedim8",
            "ChangeFormerV1", "ChangeFormerV2", "ChangeFormerV3",
            "ChangeFormerV4", "ChangeFormerV5", "ChangeFormerV6",
            "ChangeGNNV1", "ChangeGNNV2", "ChangeGNNV2_sub", "ChangeGNNV2_abs",
            "ChangeGNNV2_conc", "GNN"]
    for k in keys:
        m = define_G(k, n_class=2, embed_dim=64, img_size=64)
        assert m is not None, k


def test_bit_family_hardcodes_two_output_channels():
    """ref networks.py:171-184 passes output_nc=2 for base_resnet18 and
    every base_transformer_pos_s4* key REGARDLESS of n_class — matched,
    so converted reference checkpoints always fit (review finding)."""
    from stcd_tpu.models.factory import define_G
    m = define_G("base_transformer_pos_s4_dd8", n_class=5)
    a = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), a, a)
    out = m.apply(v, a, a)
    out = out[-1] if isinstance(out, (list, tuple)) else out
    assert out.shape[-1] == 2
