"""Fused Pallas TPU kernel for the train-time photometric augmentation.

One HBM pass per image applies the whole reference pipeline (ref
data/dataset.py:404-411): uint8->float scale, torchvision ColorJitter
(random-order brightness/contrast/saturation/hue chain), RandomGrayscale,
Gaussian blur, ImageNet normalization. The pure-jnp path
(stcd_tpu.data.augment.apply_augment_reference) evaluates the ColorJitter
order as a scan/switch chain that costs ~7.8 ms of the bs=64 SegCD train
step on a v5e; here the whole image sits in VMEM and the chain is applied
in-register, so the op is HBM-bandwidth-bound on a single read+write.

Random parameters are sampled OUTSIDE the kernel with the exact same
jax.random draws as the jnp path (augment.sample_augment_params), so both
backends are numerically interchangeable (tests/test_augment_pallas.py
pins them together to float tolerance).

Layout: channels are folded onto the sublane axis — each grid step sees a
planar (3H, W) block (rows [0,H)=R, [H,2H)=G, [2H,3H)=B), keeping W on the
128-lane axis; NHWC with C=3 would waste 125/128 lanes. The blur is two
MXU band-matrix matmuls (vertical B @ x, horizontal x @ B^T) with the
edge-replicate mass folded into the band edges — identical function to the
jnp path's edge-pad + separable conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

RADIUS = 5
TAPS = 2 * RADIUS + 1

# ImageNet constants inlined as compile-time scalars (augment.normalize).
_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)
_GRAY = (0.299, 0.587, 0.114)  # torchvision rgb_to_grayscale


def _augment_kernel(perm_ref, fac_ref, flag_ref, kern_ref, img_ref, out_ref,
                    *, height, is_int):
    h = height
    pid = pl.program_id(0)

    def split3(t):
        return t[0:h], t[h:2 * h], t[2 * h:3 * h]

    def cat3(r, g, b):
        return jnp.concatenate([r, g, b], axis=0)

    def gray_of(t):
        r, g, b = split3(t)
        return _GRAY[0] * r + _GRAY[1] * g + _GRAY[2] * b

    if is_int:
        # Mosaic has no direct uint8->f32 cast; widen to int32 first.
        x = img_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    else:
        x = img_ref[0].astype(jnp.float32)

    fb, fc, fs, fh = fac_ref[pid, 0], fac_ref[pid, 1], fac_ref[pid, 2], fac_ref[pid, 3]

    # --- ColorJitter ops (identical math to augment.adjust_*) ---
    def op_brightness(t):
        return jnp.clip(t * fb, 0.0, 1.0)

    def op_contrast(t):
        m = jnp.mean(gray_of(t))
        return jnp.clip(t * fc + m * (1.0 - fc), 0.0, 1.0)

    def op_saturation(t):
        g = gray_of(t)
        return jnp.clip(t * fs + cat3(g, g, g) * (1.0 - fs), 0.0, 1.0)

    def op_hue(t):
        t = jnp.clip(t, 0.0, 1.0)
        r, g, b = split3(t)
        maxc = jnp.maximum(jnp.maximum(r, g), b)
        minc = jnp.minimum(jnp.minimum(r, g), b)
        deltac = maxc - minc
        s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-8), 0.0)
        dsafe = jnp.maximum(deltac, 1e-8)
        rc = (maxc - r) / dsafe
        gc = (maxc - g) / dsafe
        bc = (maxc - b) / dsafe
        hh = jnp.where(r == maxc, bc - gc,
                       jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
        hh = (hh / 6.0) % 1.0
        hh = jnp.where(deltac == 0, 0.0, hh)
        hh = (hh + fh) % 1.0
        v = maxc
        i = jnp.floor(hh * 6.0)
        f = hh * 6.0 - i
        p = v * (1.0 - s)
        q = v * (1.0 - f * s)
        tt = v * (1.0 - (1.0 - f) * s)
        ii = i.astype(jnp.int32) % 6

        def pick(vals):
            # jnp.select lowers through argmax, which Mosaic restricts to
            # f32 inputs — use a where-chain instead (same semantics here:
            # the ii==j conditions are mutually exclusive).
            out = jnp.zeros_like(vals[0])
            for j in range(6):
                out = jnp.where(ii == j, vals[j], out)
            return out

        r2 = pick([v, q, p, p, tt, v])
        g2 = pick([tt, v, v, q, p, p])
        b2 = pick([p, p, tt, v, v, q])
        return cat3(r2, g2, b2)

    def jitter_chain(t):
        def body(k, acc):
            return jax.lax.switch(
                perm_ref[pid, k],
                [op_brightness, op_contrast, op_saturation, op_hue], acc)
        return jax.lax.fori_loop(0, 4, body, t)

    x = jnp.where(flag_ref[pid, 0] != 0, jitter_chain(x), x)

    # --- RandomGrayscale ---
    g = gray_of(x)
    x = jnp.where(flag_ref[pid, 1] != 0, cat3(g, g, g), x)

    # --- Gaussian blur: band-matrix matmuls, edge-replicate semantics ---
    def band(n):
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        acc = jnp.zeros((n, n), jnp.float32)
        for t in range(TAPS):
            idx = jnp.clip(rows + (t - RADIUS), 0, n - 1)
            acc = acc + kern_ref[pid, t] * (cols == idx).astype(jnp.float32)
        return acc

    w = x.shape[1]
    bv = band(h)
    bh = band(w)
    r, gg, b = split3(x)

    def blur_c(c):
        # HIGHEST: the default f32 matmul runs as bf16 MXU passes (~1e-2
        # error on a [0,1] image); the band matmuls are tiny, so full f32
        # precision costs nothing measurable.
        tmp = jnp.dot(bv, c, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        return jnp.dot(tmp, bh.T, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    blurred = cat3(blur_c(r), blur_c(gg), blur_c(b))
    x = jnp.where(flag_ref[pid, 2] != 0, blurred, x)

    # --- ImageNet normalize ---
    r, gg, b = split3(x)
    out_ref[0] = cat3((r - _MEAN[0]) * (1.0 / _STD[0]),
                      (gg - _MEAN[1]) * (1.0 / _STD[1]),
                      (b - _MEAN[2]) * (1.0 / _STD[2]))


def _planar_pallas(interpret: bool, perm: jax.Array, factors: jax.Array,
                   flags: jax.Array, kern: jax.Array,
                   img_planar: jax.Array) -> jax.Array:
    """The raw pallas_call over a (possibly per-shard) planar batch."""
    n, h3, w = img_planar.shape
    assert h3 % 3 == 0, img_planar.shape
    is_int = jnp.issubdtype(img_planar.dtype, jnp.integer)
    kernel = functools.partial(_augment_kernel, height=h3 // 3, is_int=is_int)
    # Per-image parameter tables ride as scalar-prefetch SMEM arrays (tiny),
    # indexed by program_id; the image/output blocks are whole planar images.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h3, w), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h3, w), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, h3, w), jnp.float32),
        interpret=interpret,
    )(perm.astype(jnp.int32), factors.astype(jnp.float32),
      flags.astype(jnp.int32), kern.astype(jnp.float32), img_planar)


# --- GSPMD partitioning --------------------------------------------------
# A pallas_call is opaque to the partitioner: without this, a
# 'data'-sharded batch inside a pjit'd train step would be ALL-GATHERED
# and the kernel run fully replicated on every device. The op is a pure
# batch map (grid = batch, every operand batch-leading), so partitioning
# is trivial: shard every operand and the result along dim 0 with
# whatever spec the batch arrives with, and run the same pallas_call on
# each per-device shard (tests/test_augment_pallas.py pins behavior on a
# forced 8-device CPU mesh in interpret mode).

def _batch_spec(arg_infos):
    from jax.sharding import NamedSharding, PartitionSpec as P
    for info in arg_infos:
        s = getattr(info, "sharding", None)
        if s is not None and getattr(s, "spec", None) and s.spec[0] is not None:
            return s.spec[0], s.mesh
    return None, None


def _cp_infer(interpret, mesh, arg_infos, result_infos):
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch, m = _batch_spec(arg_infos)
    return NamedSharding(m or mesh, P(batch, None, None))


def _cp_partition(interpret, mesh, arg_infos, result_infos):
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch, m = _batch_spec(arg_infos)
    m = m or mesh
    arg_shardings = tuple(
        NamedSharding(m, P(batch, *([None] * (len(info.shape) - 1))))
        for info in arg_infos)
    out_sharding = NamedSharding(m, P(batch, None, None))
    lower_fn = functools.partial(_planar_pallas, interpret)
    return m, lower_fn, out_sharding, arg_shardings


_planar_cp = custom_partitioning(_planar_pallas, static_argnums=(0,))
_planar_cp.def_partition(
    partition=_cp_partition,
    infer_sharding_from_operands=_cp_infer,
    # Shardy propagation rule: batch factor shared by every operand and
    # the result; all other dims independent (unsharded in practice).
    sharding_rule="b p, b f, b g, b k, b h w -> b h w")


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_augment_planar(img_planar: jax.Array, perm: jax.Array,
                         factors: jax.Array, flags: jax.Array,
                         kern: jax.Array, interpret: bool = False) -> jax.Array:
    """img_planar: (N, 3H, W) uint8 or float in [0,1]; returns normalized
    float32 of the same planar shape. perm (N,4) i32, factors (N,4) f32,
    flags (N,3|4) i32 [jitter, gray, blur], kern (N, 11) f32."""
    return _planar_cp(interpret, perm, factors, flags, kern, img_planar)


def apply_augment_batch(imgs: jax.Array, params: dict,
                        interpret: bool = False) -> jax.Array:
    """NHWC (N,H,W,3) batch + vmapped params from
    augment.sample_augment_params -> augmented/normalized float32 NHWC."""
    n, h, w, c = imgs.shape
    assert c == 3, imgs.shape
    planar = imgs.transpose(0, 3, 1, 2).reshape(n, c * h, w)
    flags = jnp.stack([params["jitter_apply"], params["gray_apply"],
                       params["blur_apply"]], axis=1)
    out = apply_augment_planar(planar, params["perm"], params["factors"],
                               flags, params["blur_kern"],
                               interpret=interpret)
    return out.reshape(n, c, h, w).transpose(0, 2, 3, 1)
