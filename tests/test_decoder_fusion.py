"""Exactness of the fused decoder block (stcd_tpu/decoders/unet.py):

    conv3x3(cat(up2x(x), skip)) == dconv(x, K') + conv3x3(skip, K_b)

The fused and materialized paths share an identical parameter layout, so
the SAME params are applied through both and outputs must agree to float
round-off. Also pins that UnetDecoder's param tree is unchanged by the
fusion (converted reference weights keep loading)."""

import numpy as np

import jax
import jax.numpy as jnp

from stcd_tpu.decoders.unet import DecoderBlock, UnetDecoder


def _block_pair(use_batchnorm):
    fused = DecoderBlock(out_channels=8, use_batchnorm=use_batchnorm, fused=True)
    plain = DecoderBlock(out_channels=8, use_batchnorm=use_batchnorm, fused=False)
    return fused, plain


def test_fused_block_exact_with_skip(rng, np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
    skip = jnp.asarray(np_rng.normal(size=(2, 16, 16, 6)).astype(np.float32))
    for use_bn in (True, False):
        fused, plain = _block_pair(use_bn)
        v = plain.init(rng, x, skip)
        assert jax.tree_util.tree_structure(
            fused.init(rng, x, skip)) == jax.tree_util.tree_structure(v), \
            "fusion must not change the param tree"
        out_f = fused.apply(v, x, skip)
        out_p = plain.apply(v, x, skip)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                                   atol=2e-5, err_msg=f"use_bn={use_bn}")


def test_fused_block_exact_no_skip(rng, np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
    fused, plain = _block_pair(True)
    v = plain.init(rng, x, None)
    np.testing.assert_allclose(np.asarray(fused.apply(v, x, None)),
                               np.asarray(plain.apply(v, x, None)), atol=2e-5)


def test_fused_block_train_mode_bn_stats(rng, np_rng):
    """Train-mode BN statistics come from the identical pre-BN tensor."""
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 12)).astype(np.float32))
    skip = jnp.asarray(np_rng.normal(size=(2, 16, 16, 6)).astype(np.float32))
    fused, plain = _block_pair(True)
    v = plain.init(rng, x, skip)
    out_f, mut_f = fused.apply(v, x, skip, True, mutable=["batch_stats"])
    out_p, mut_p = plain.apply(v, x, skip, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut_f),
                    jax.tree_util.tree_leaves(mut_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_decoder_matches_plain(rng, np_rng):
    feats = [jnp.asarray(np_rng.normal(size=(1, 64 >> i, 64 >> i, c)
                                       ).astype(np.float32))
             for i, c in enumerate((3, 8, 12, 16, 24, 32))]
    dec_f = UnetDecoder(decoder_channels=(16, 12, 8, 6, 4), fused=True)
    dec_p = UnetDecoder(decoder_channels=(16, 12, 8, 6, 4), fused=False)
    v = dec_p.init(rng, feats)
    np.testing.assert_allclose(np.asarray(dec_f.apply(v, feats)),
                               np.asarray(dec_p.apply(v, feats)), atol=2e-5)


def test_scse_attention_falls_back(rng, np_rng):
    """attention_type='scse' needs the concatenated tensor; the block must
    still run (materialized path) and keep the reference param names."""
    x = jnp.asarray(np_rng.normal(size=(1, 8, 8, 12)).astype(np.float32))
    skip = jnp.asarray(np_rng.normal(size=(1, 16, 16, 6)).astype(np.float32))
    blk = DecoderBlock(out_channels=8, attention_type="scse", fused=True)
    v = blk.init(rng, x, skip)
    assert "attention1" in v["params"]
    assert blk.apply(v, x, skip).shape == (1, 16, 16, 8)
