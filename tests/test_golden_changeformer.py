"""Golden forward parity for ChangeFormerV6 (ref models/ChangeFormer.py:
1669-1701, EncoderTransformer_v3 + DecoderTransformer_v3) vs our
models/changeformer.py — the reference file is loaded standalone through
tests/_ref_stubs.py (timm stubbed; DropPath is identity at eval, which is
the golden path). Validates the SRA attention math, overlap patch embeds,
DWConv-MLP, conv_diff/make_prediction/PReLU blocks, the multi-scale
cascade + fuse, and transposed-conv upsampling.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
torch = pytest.importorskip("torch")


def _compare_v3_family(ref, model, depths):
    from stcd_tpu.convert.torch_to_flax import convert_changeformer_v6

    rng = np.random.default_rng(3)
    a = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    b = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ref.train()
    with torch.no_grad():
        for _ in range(2):
            ref(ta + torch.randn_like(ta) * 0.1, tb)
    ref.eval()
    with torch.no_grad():
        wants = [o.numpy() for o in ref(ta, tb)]

    params, stats = convert_changeformer_v6(
        {k: v.numpy() for k, v in ref.state_dict().items()}, depths=depths)
    ja = jnp.asarray(a.transpose(0, 2, 3, 1))
    jb = jnp.asarray(b.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), ja, jb)
    t_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(template["params"])[0]}
    c_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert t_paths == c_paths, (
        f"missing={sorted(t_paths - c_paths)[:6]} "
        f"extra={sorted(c_paths - t_paths)[:6]}")
    gots = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        ja, jb)
    assert len(gots) == len(wants) == 5  # 4 side preds + final
    for i, (got, want) in enumerate(zip(gots, wants)):
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(
            got, want, atol=5e-4, rtol=1e-3,
            err_msg=f"multi-scale output {i} diverges")


def test_changeformer_v6_forward_parity():
    from _ref_stubs import load_ref_model_module
    from stcd_tpu.models.changeformer import ChangeFormerV6

    mod = load_ref_model_module("ChangeFormer")
    torch.manual_seed(5)
    ref = mod.ChangeFormerV6(input_nc=3, output_nc=2, decoder_softmax=False,
                             embed_dim=256)
    _compare_v3_family(ref, ChangeFormerV6(output_nc=2, decoder_softmax=False,
                                           embed_dim=256), (3, 3, 4, 3))


def test_reference_changeformer_v5_is_broken_but_ours_runs():
    """The reference V5 (patch_size=4 embeds) crashes on every input size:
    stages 2-4 come out (H/2+1)-sized and the decoder's scale_factor=2
    interpolate mismatches at ChangeFormer.py:1582. Document the quirk and
    verify OUR V5 (patch-3 embeds, same depths/heads) actually runs."""
    from _ref_stubs import load_ref_model_module
    from stcd_tpu.models.changeformer import ChangeFormerV5

    mod = load_ref_model_module("ChangeFormer")
    torch.manual_seed(8)
    ref = mod.ChangeFormerV5(input_nc=3, output_nc=2)
    with pytest.raises(RuntimeError):
        with torch.no_grad():
            ref(torch.zeros(1, 3, 64, 64), torch.zeros(1, 3, 64, 64))

    model = ChangeFormerV5(output_nc=2)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x)
    outs = model.apply(variables, x, x)
    assert outs[-1].shape == (1, 64, 64, 2)


@pytest.mark.parametrize("variant,softmax", [(1, False), (2, False),
                                             (3, False), (2, True)])
def test_changeformer_v1_v2_v3_forward_parity(variant, softmax):
    """(2, True) pins the ref quirk of applying softmax TWICE in V2:
    once inside TDec (:787-788), again in forward (:945-946)."""
    from _ref_stubs import load_ref_model_module
    from stcd_tpu.convert import torch_to_flax as conv
    from stcd_tpu.models import changeformer as cf

    mod = load_ref_model_module("ChangeFormer")
    torch.manual_seed(20 + variant)
    ref = getattr(mod, f"ChangeFormerV{variant}")(
        input_nc=3, output_nc=2, decoder_softmax=softmax).eval()

    rng = np.random.default_rng(20 + variant)
    a = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    b = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(a), torch.from_numpy(b))
        if isinstance(want, (list, tuple)):
            want = want[-1]
        want = want.numpy()

    converter = getattr(conv, f"convert_changeformer_v{variant}")
    params, stats = converter({k: v.numpy() for k, v in ref.state_dict().items()})
    model = getattr(cf, f"ChangeFormerV{variant}")(output_nc=2,
                                                   decoder_softmax=softmax)
    ja = jnp.asarray(a.transpose(0, 2, 3, 1))
    jb = jnp.asarray(b.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), ja, jb)
    t_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(template["params"])[0]}
    c_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert t_paths == c_paths, (
        f"missing={sorted(t_paths - c_paths)[:6]} "
        f"extra={sorted(c_paths - t_paths)[:6]}")
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    if "batch_stats" in template:
        variables["batch_stats"] = template["batch_stats"]
    got = model.apply(variables, ja, jb)
    if isinstance(got, (list, tuple)):
        got = got[-1]
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_changeformer_v4_forward_parity():
    from _ref_stubs import load_ref_model_module
    from stcd_tpu.convert.torch_to_flax import convert_changeformer_v4
    from stcd_tpu.models.changeformer import ChangeFormerV4

    mod = load_ref_model_module("ChangeFormer")
    torch.manual_seed(30)
    ref = mod.ChangeFormerV4(input_nc=3, output_nc=2, decoder_softmax=False)

    rng = np.random.default_rng(30)
    a = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    b = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ref.train()
    with torch.no_grad():
        for _ in range(2):
            ref(ta + torch.randn_like(ta) * 0.1, tb)
    ref.eval()
    with torch.no_grad():
        wants = [o.numpy() for o in ref(ta, tb)]

    params, stats = convert_changeformer_v4(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = ChangeFormerV4(output_nc=2, decoder_softmax=False)
    ja = jnp.asarray(a.transpose(0, 2, 3, 1))
    jb = jnp.asarray(b.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), ja, jb)
    t_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(template["params"])[0]}
    c_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert t_paths == c_paths, (
        f"missing={sorted(t_paths - c_paths)[:6]} "
        f"extra={sorted(c_paths - t_paths)[:6]}")
    gots = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        ja, jb)
    assert len(gots) == len(wants) == 6  # 5 side preds + final
    for i, (got, want) in enumerate(zip(gots, wants)):
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3,
                                   err_msg=f"x2 multi-scale output {i}")
