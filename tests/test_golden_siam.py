"""Golden forward parity for the FC-EF / FC-Siam family vs the REFERENCE's
own torch modules (loaded file-by-file from /root/reference — they depend
only on torch, so they import standalone; skipped when absent).

This proves the SURVEY.md §7 'hard part': ConvTranspose2d(k3,s2,p1,op1)
upconvs + ReplicationPad2d shape fixups + stride-1 ConvTranspose decoder
convs are matched exactly by our ConvTranspose2x / pad_replicate_to /
flipped-kernel nn.Conv formulation.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/models"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
torch = pytest.importorskip("torch")


def _load_ref(fname):
    """Load a reference model file WITHOUT executing the models package
    __init__ (which needs torchvision/timm, absent here)."""
    if "models" not in sys.modules or not hasattr(sys.modules["models"], "__path__"):
        pkg = types.ModuleType("models")
        pkg.__path__ = [REF]
        sys.modules["models"] = pkg
    name = f"models.{fname[:-3]}"
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, fname))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _populate_bn_stats(model, x1, x2):
    """Run a few train-mode passes so running_mean/var are non-trivial."""
    model.train()
    with torch.no_grad():
        for _ in range(3):
            model(x1 + torch.randn_like(x1) * 0.1,
                  x2 + torch.randn_like(x2) * 0.1)
    model.eval()


CASES = [
    ("SiamUnet_diff.py", "SiamUnet_diff", "diff"),
    ("SiamUnet_conc.py", "SiamUnet_conc", "conc"),
    ("SiamUnet_sub.py", "SiamUnet_sub", "sub"),
    ("SiamUnet_crossconc.py", "SiamUnet_cross_conc", "crossconc"),
    ("Unet.py", "Unet", "ef"),
]


@pytest.mark.parametrize("fname,cls,fusion", CASES)
def test_siam_family_forward_parity(fname, cls, fusion):
    from stcd_tpu.convert.torch_to_flax import convert_siam_unet
    from stcd_tpu.models.siam_unet import SiamUnet

    torch.manual_seed(1337)
    mod = _load_ref(fname)
    ref = getattr(mod, cls)(3, 2)

    # odd spatial size (36 -> 18 -> 9 -> 4 -> 2) exercises the
    # ReplicationPad2d fixups on the 8->9 upsample
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 3, 36, 36)).astype(np.float32)
    b = rng.standard_normal((2, 3, 36, 36)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    _populate_bn_stats(ref, ta, tb)
    with torch.no_grad():
        want = ref(ta, tb)
        if isinstance(want, (list, tuple)):  # SiamUnet_sub returns [logits]
            want = want[0]
        want = want.numpy()

    params, stats = convert_siam_unet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, fusion)
    model = SiamUnet(fusion=fusion, label_nbr=2)
    ja = jnp.asarray(a.transpose(0, 2, 3, 1))
    jb = jnp.asarray(b.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), ja, jb)
    # structure check: converted tree must cover the template exactly
    t_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(template["params"])[0]}
    c_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert t_paths == c_paths, (
        f"missing={sorted(t_paths - c_paths)[:4]} "
        f"extra={sorted(c_paths - t_paths)[:4]}")

    got = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        ja, jb)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("cls,ecam", [("SNUNet_ECAM", True),
                                      ("Siam_NestedUNet_Conc", False)])
def test_snunet_forward_parity(cls, ecam):
    from stcd_tpu.convert.torch_to_flax import convert_snunet
    from stcd_tpu.models.snunet import SiamNestedUNetConc, SNUNetECAM

    torch.manual_seed(7)
    mod = _load_ref("SNUNet.py")
    ref = getattr(mod, cls)(in_ch=3, out_ch=1)

    rng = np.random.default_rng(1)
    a = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    b = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    _populate_bn_stats(ref, ta, tb)
    with torch.no_grad():
        want = ref(ta, tb)
        if isinstance(want, (list, tuple)):
            want = want[0]
        want = want.numpy()

    params, stats = convert_snunet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, ecam=ecam)
    model = (SNUNetECAM if ecam else SiamNestedUNetConc)(out_ch=1)
    ja = jnp.asarray(a.transpose(0, 2, 3, 1))
    jb = jnp.asarray(b.transpose(0, 2, 3, 1))
    template = model.init(jax.random.PRNGKey(0), ja, jb)
    t_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(template["params"])[0]}
    c_paths = {jax.tree_util.keystr(p) for p, _ in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    assert t_paths == c_paths, (
        f"missing={sorted(t_paths - c_paths)[:4]} "
        f"extra={sorted(c_paths - t_paths)[:4]}")
    got = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)},
        ja, jb)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
