"""Fused cross-attention Pallas TPU kernel.

Targets the framework's attention hot paths (SURVEY.md §3.4 fusion
targets): ChangeFormer's SRA attention (softmax(QK^T)V with
conv-downsampled KV — ref models/ChangeFormer.py:336-358) and BIT's
token cross-attention (models/help_funcs.py:66-152). In both, the KV set
is small (sr-reduced or token_len) while Q covers every pixel, so the
whole KV block fits VMEM and the kernel tiles over Q only — the (N, M)
attention matrix never touches HBM (XLA's einsum path materializes it:
16 MB/head for 512^2 stage-1).

Forward and backward are both Pallas kernels tiled over Q: the backward
recomputes each tile's softmax from (q, k, v) and accumulates dk/dv in
VMEM across the Q tiles (flash-style), so the (N, M) attention matrix
never touches HBM in training either — the einsum backward would
materialize four f32 (N, M) temporaries.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one-shot log guard for the TP -> einsum routing notice (ADVICE r3)
_TP_ROUTE_LOGGED = False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fmix32(h):
    """murmur3 finalizer: a bijective avalanche mix on uint32."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def dropout_keep_mask(seed, bh, rows, cols, rate: float):
    """Stateless counter-based dropout decision for attention element
    (bh, row, col): keep iff hash(seed, bh, row, col) >= rate * 2^32.

    Plain uint32 jnp ops only, so the SAME function runs inside the
    Pallas kernel (Mosaic), in the einsum fallback, and in interpret-mode
    tests — the fused and fallback paths produce bit-identical masks
    (tests/test_ops.py). seed/bh are scalars; rows/cols broadcastable
    int32 index grids."""
    h = (seed.astype(jnp.uint32)
         + bh.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         + rows.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
         + cols.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35))
    h = _fmix32(_fmix32(h) ^ bh.astype(jnp.uint32))
    threshold = jnp.uint32(min(int(round(rate * 2 ** 32)), 2 ** 32 - 1))
    return h >= threshold


def _dropout_scale_tile(shape, seed, bh, i, block_n, rate):
    """The (block_n, M) inverted-dropout multiplier for one Q tile:
    1/(1-rate) where kept, 0 where dropped. Row/col indices are GLOBAL
    (row = i*block_n + r), so the mask is independent of the tiling and
    the einsum fallback reproduces it exactly."""
    rows = i * block_n + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    keep = dropout_keep_mask(seed, bh, rows, cols, rate)
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0)


def _attention_kernel(q_ref, k_ref, v_ref, seed_ref, o_ref, *, scale,
                      m_valid, block_n, dropout_rate):
    b = pl.program_id(0)
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # (block_n, D)
    k = k_ref[0].astype(jnp.float32)  # (M, D)
    v = v_ref[0].astype(jnp.float32)  # (M, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if m_valid != k.shape[0]:  # mask out KV padding rows
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < m_valid, s, -jnp.inf)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:  # dropout AFTER normalization: mask p/denom
        md = _dropout_scale_tile(p.shape, seed_ref[0], b, i, block_n,
                                 dropout_rate)
        o = jnp.dot((p / denom) * md, v,
                    preferred_element_type=jnp.float32)
    else:
        o = jnp.dot(p, v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_fwd(q, k, v, seed, scale, block_n, interpret, dropout_rate):
    bh, n, d = q.shape
    m = k.shape[1]
    n_pad = _round_up(n, block_n)
    m_pad = _round_up(m, 128)
    d_pad = _round_up(d, 128)
    qp = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, m_pad - m), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, m_pad - m), (0, d_pad - d)))

    kernel = functools.partial(_attention_kernel, scale=scale, m_valid=m,
                               block_n=block_n, dropout_rate=dropout_rate)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d_pad), q.dtype),
        grid=(bh, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n, d_pad), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(qp, kp, vp, seed)
    return out[:, :n, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_cross_attention(q, k, v, seed, scale, block_n, interpret,
                           dropout_rate):
    return _flash_fwd(q, k, v, seed, scale, block_n, interpret, dropout_rate)


def _fwd(q, k, v, seed, scale, block_n, interpret, dropout_rate):
    return (_flash_fwd(q, k, v, seed, scale, block_n, interpret,
                       dropout_rate), (q, k, v, seed))


def _attention_bwd_kernel(q_ref, k_ref, v_ref, g_ref, seed_ref,
                          dq_ref, dk_ref, dv_ref, *, scale, m_valid,
                          block_n, dropout_rate):
    """One Q tile: recompute the tile's softmax (and, under dropout, the
    identical keep-mask from the stateless hash), emit its dq block and
    accumulate its dk/dv partials into the (f32) outputs, which stay
    resident in VMEM across the sequential Q-tile grid dimension (their
    index_map is constant in i)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # (block_n, D)
    k = k_ref[0].astype(jnp.float32)  # (M, D)
    v = v_ref[0].astype(jnp.float32)  # (M, D)
    g = g_ref[0].astype(jnp.float32)  # (block_n, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if m_valid != k.shape[0]:  # exp(-inf)=0: padded KV rows drop out of
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)  # p AND the
        s = jnp.where(col < m_valid, s, -jnp.inf)              # dk/dv sums
    s_max = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - s_max)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # softmax a, (block_n, M)
    dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        # y = (md . a) @ v with md = mask/(1-r)  ->  dv uses the dropped
        # probs, da = md . (g v^T); the softmax transpose is unchanged
        md = _dropout_scale_tile(p.shape, seed_ref[0], b, i, block_n,
                                 dropout_rate)
        dv_src = p * md
        dp = dp * md
    else:
        dv_src = p
    # padded Q rows have g == 0, so their dv/dk contributions vanish and
    # their (garbage) dq rows are sliced off by the caller
    dv_part = jax.lax.dot_general(dv_src, g, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dsoft = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.dot(dsoft, k, preferred_element_type=jnp.float32) * scale
    dk_part = jax.lax.dot_general(dsoft, q, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = dk_part
        dv_ref[0] = dv_part

    @pl.when(i != 0)
    def _accum():
        dk_ref[0] += dk_part
        dv_ref[0] += dv_part


def _bwd(scale, block_n, interpret, dropout_rate, res, g):
    q, k, v, seed = res
    bh, n, d = q.shape
    m = k.shape[1]
    n_pad = _round_up(n, block_n)
    m_pad = _round_up(m, 128)
    d_pad = _round_up(d, 128)
    qp = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, m_pad - m), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, m_pad - m), (0, d_pad - d)))
    gp = jnp.pad(g, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

    kernel = functools.partial(_attention_bwd_kernel, scale=scale, m_valid=m,
                               block_n=block_n, dropout_rate=dropout_rate)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, m_pad, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((bh, m_pad, d_pad), jnp.float32),
        ],
        grid=(bh, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_n, d_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_n, d_pad), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, m_pad, d_pad), lambda b, i: (b, 0, 0)),
        ],
        interpret=interpret,
    )(qp, kp, vp, gp, seed)
    return (dq[:, :n, :d],
            dk[:, :m, :d].astype(k.dtype),
            dv[:, :m, :d].astype(v.dtype),
            None)


_flash_cross_attention.defvjp(_fwd, _bwd)

_NO_SEED = None  # lazily-built zero seed constant


def _seed_array(dropout_seed):
    global _NO_SEED
    if dropout_seed is None:
        if _NO_SEED is None:
            _NO_SEED = jnp.zeros((1,), jnp.uint32)
        return _NO_SEED
    return jnp.asarray(dropout_seed, jnp.uint32).reshape(1)


def _einsum_attention(q, k, v, scale, dropout_rate, dropout_seed):
    """Reference/fallback path. Under dropout it consumes the SAME
    stateless hash mask as the Pallas kernel (global row/col indices, so
    the mask is tiling-independent) — both paths are bit-identical in
    which attention weights they drop."""
    b, h, n, d = q.shape
    m = k.shape[2]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        seed = _seed_array(dropout_seed)[0]
        bh = jnp.arange(b * h, dtype=jnp.int32).reshape(b, h, 1, 1)
        rows = jnp.arange(n, dtype=jnp.int32).reshape(1, 1, n, 1)
        cols = jnp.arange(m, dtype=jnp.int32).reshape(1, 1, 1, m)
        keep = dropout_keep_mask(seed, bh, rows, cols, dropout_rate)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)


def cross_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: Optional[float] = None, block_n: int = 512,
                    use_pallas: Optional[bool] = None,
                    dropout_rate: float = 0.0,
                    dropout_seed=None) -> jax.Array:
    """softmax(q k^T * scale) v over (B, H, N, D) q and (B, H, M, D) kv,
    with optional in-kernel attention-matrix dropout (inverted scaling;
    VERDICT r2 item 4 — ChangeFormerV6's train config attn_drop=0.1 now
    rides the fused path; ref models/ChangeFormer.py:330 attn_drop).

    The dropout decision is a stateless uint32 hash of
    (seed, head, row, col) — dropout_keep_mask — recomputed identically
    in the forward kernel, the backward kernel, and the einsum fallback:
    no (N, M) mask ever touches HBM and the two paths match exactly.

    use_pallas=None auto-selects: the Pallas kernel on TPU when N is large
    enough to benefit; einsum elsewhere (CPU tests exercise the kernel via
    interpret mode in tests/test_ops.py).
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires a dropout_seed")
    if use_pallas is None:
        platform = jax.devices()[0].platform
        # worth fusing when Q is large AND KV has enough rows to amortize
        # the 128-row VMEM padding; tiny-token KV (BIT decode, M=4) is
        # faster on the plain einsum path (benchmarks/bench_attention.py:
        # SRA shapes 1.35-1.44x, M=4 0.59x)
        use_pallas = platform in ("tpu", "axon") and n >= 1024 and m >= 64
        if use_pallas:
            # pallas_call has no GSPMD partitioning rule: under a real
            # tensor-parallel 'model' axis XLA would all-gather /
            # replicate around the kernel, silently losing the Megatron
            # head-sharding (ADVICE r3, docs/SCALING.md) — the einsum
            # path partitions cleanly, so route TP runs there
            from stcd_tpu.parallel.mesh import model_axis_size
            if model_axis_size() > 1:
                global _TP_ROUTE_LOGGED
                if not _TP_ROUTE_LOGGED:
                    _TP_ROUTE_LOGGED = True
                    logging.getLogger(__name__).info(
                        "cross_attention: 'model' axis > 1 active - "
                        "using the einsum path (GSPMD-partitionable) "
                        "instead of the fused Pallas kernel")
                use_pallas = False
    if not use_pallas:
        return _einsum_attention(q, k, v, scale, dropout_rate, dropout_seed)
    block = min(block_n, _round_up(n, 128))
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, m, d)
    vf = v.reshape(b * h, m, d)
    out = _flash_cross_attention(qf, kf, vf, _seed_array(dropout_seed),
                                 float(scale), block, False,
                                 float(dropout_rate))
    return out.reshape(b, h, n, d)


def cross_attention_interpret(q, k, v, scale=None, block_n=256,
                              dropout_rate: float = 0.0, dropout_seed=None):
    """Interpreter-mode path for CPU tests of the kernel itself."""
    b, h, n, d = q.shape
    m = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    out = _flash_cross_attention(q.reshape(b * h, n, d), k.reshape(b * h, m, d),
                                 v.reshape(b * h, m, d),
                                 _seed_array(dropout_seed), float(scale),
                                 min(block_n, _round_up(n, 8)), True,
                                 float(dropout_rate))
    return out.reshape(b, h, n, d)
