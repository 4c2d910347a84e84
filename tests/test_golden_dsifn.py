"""Golden forward parity for DSIFN (ref models/DSIFN.py) vs our
models/dsifn.py. The reference's torchvision vgg16 dependency is replaced
by a structure-faithful stub (tests/_ref_stubs.py) — weights are random
but shared with the converted model, which is what parity tests need.
Validates the 5-tap VGG16 extractor, channel/spatial attention decode
branches, PReLU conv2d_bn blocks, and k2-s2 transposed-conv upsampling."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
torch = pytest.importorskip("torch")


def test_dsifn_forward_parity():
    from _ref_stubs import load_ref_model_module
    from stcd_tpu.convert.torch_to_flax import convert_dsifn
    from stcd_tpu.models.dsifn import DSIFN

    mod = load_ref_model_module("DSIFN")
    torch.manual_seed(6)
    base = mod.vgg16_base()
    ref = mod.DSIFN(base, base)

    rng = np.random.default_rng(8)
    a = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    b = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ref.train()
    with torch.no_grad():
        for _ in range(2):
            ref(ta + torch.randn_like(ta) * 0.1, tb)
    ref.eval()
    with torch.no_grad():
        want = ref(ta, tb).numpy()

    params, stats = convert_dsifn(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    model = DSIFN()
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
    got = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        ja, jb)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)
