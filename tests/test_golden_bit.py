"""Golden forward parity for BIT (ref models/networks.py:223-441
ResNet/BASE_Transformer) vs our models/bit.py — loaded from the reference
tree through import stubs (tests/_ref_stubs.py); skipped when absent.

Validates: dilated-resnet18 backbone taps, semantic tokenizer einsum,
pre-norm transformer encoder/decoder (incl. the reference's model-dim
attention scaling), |diff| fusion, nearest-2x + bilinear-4x upsampling,
TwoLayerConv2d head.
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


def _golden_compare(ref, model, params, stats, size=64, atol=3e-4):
    rng = np.random.default_rng(2)
    a = rng.standard_normal((1, 3, size, size)).astype(np.float32)
    b = rng.standard_normal((1, 3, size, size)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    ref.train()
    with torch.no_grad():
        for _ in range(2):
            ref(ta + torch.randn_like(ta) * 0.1, tb)
    ref.eval()
    with torch.no_grad():
        want = ref(ta, tb)
        if isinstance(want, (list, tuple)):
            want = want[-1]
        want = want.numpy()

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
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


def test_bit_base_transformer_parity():
    from _ref_stubs import load_ref_model_module
    from stcd_tpu.convert.torch_to_flax import convert_bit
    from stcd_tpu.models.bit import BASETransformer

    net = load_ref_model_module("networks")
    torch.manual_seed(3)
    # define_G 'base_transformer_pos_s4_dd8' (ref networks.py:138-215)
    ref = net.BASE_Transformer(input_nc=3, output_nc=2, token_len=4,
                               resnet_stages_num=4, with_pos="learned",
                               enc_depth=1, dec_depth=8)
    params, stats = convert_bit(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        layers_per_stage=(2, 2, 2, 2), enc_depth=1, dec_depth=8,
        resnet_stages_num=4)
    model = BASETransformer(output_nc=2, token_len=4, resnet_stages_num=4,
                            with_pos="learned", enc_depth=1, dec_depth=8)
    _golden_compare(ref, model, params, stats)


def test_bit_base_resnet18_parity():
    from _ref_stubs import load_ref_model_module
    from stcd_tpu.convert.torch_to_flax import convert_bit
    from stcd_tpu.models.bit import ResNetCD

    net = load_ref_model_module("networks")
    torch.manual_seed(4)
    # define_G 'base_resnet18'
    ref = net.ResNet(input_nc=3, output_nc=2, resnet_stages_num=4)
    params, stats = convert_bit(
        {k: v.numpy() for k, v in ref.state_dict().items()},
        layers_per_stage=(2, 2, 2, 2), resnet_stages_num=4)
    model = ResNetCD(output_nc=2, resnet_stages_num=4)
    _golden_compare(ref, model, params, stats)
