"""Diagnostic for the conv+BN-stats Pallas feasibility gate: where does
the pallas_fused gap vs XLA's dot come from?

Variants (per shape):
  pallas_mm       : pure Pallas matmul, NO stats epilogue (isolates Mosaic
                    matmul quality vs XLA's dot emitter)
  pallas_1d       : fused kernel on a 1-D grid (gm only; gn folded away
                    for shapes with n == bn) — isolates grid overhead
  pallas_mxu_stats: stats via MXU ones-row contraction instead of the
                    sublane reshape-sum — isolates the VPU epilogue cost

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_bnstats_diag.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm_kernel(x_ref, w_ref, y_ref):
    y_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm",))
def pallas_mm(x, w, bm=4096):
    m, k = x.shape
    _, n = w.shape
    return pl.pallas_call(
        _mm_kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
    )(x, w)


def _fused1d_kernel(x_ref, w_ref, y_ref, s1_ref, s2_ref):
    i = pl.program_id(0)
    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    bm, bn = y.shape
    ps1 = jnp.sum(y.reshape(bm // 8, 8, bn), 0)
    ps2 = jnp.sum((y * y).reshape(bm // 8, 8, bn), 0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += ps1
    s2_ref[:] += ps2


@functools.partial(jax.jit, static_argnames=("bm",))
def pallas_1d(x, w, bm=4096):
    m, k = x.shape
    _, n = w.shape
    y, s1, s2 = pl.pallas_call(
        _fused1d_kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
        ],
    )(x, w)
    return y, jnp.sum(s1, 0), jnp.sum(s2, 0)


def _mxu_stats_kernel(x_ref, w_ref, y_ref, s1_ref, s2_ref):
    i = pl.program_id(0)
    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    bm, bn = y.shape
    ones = jnp.ones((8, bm), jnp.float32)
    ps1 = jax.lax.dot_general(ones, y, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) / 8.0
    ps2 = jax.lax.dot_general(ones, y * y, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) / 8.0

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += ps1
    s2_ref[:] += ps2


@functools.partial(jax.jit, static_argnames=("bm",))
def pallas_mxu_stats(x, w, bm=4096):
    m, k = x.shape
    _, n = w.shape
    y, s1, s2 = pl.pallas_call(
        _mxu_stats_kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
        ],
    )(x, w)
    return y, jnp.sum(s1, 0), jnp.sum(s2, 0)


@jax.jit
def xla_dot(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)


def timeit(fn, x, w, iters=30):
    @jax.jit
    def run(x, w):
        def body(_, carry):
            out = fn(carry, w)
            y = out[0] if isinstance(out, tuple) else out
            s = y[0, 0].astype(jnp.float32) * 1e-30
            return carry + s.astype(carry.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    float(jnp.sum(run(x, w)))
    t0 = time.perf_counter()
    float(jnp.sum(run(x, w)))
    return (time.perf_counter() - t0) / iters


SHAPES = [
    (128 * 64 * 64, 64, 256),    # worst gap (2.2x)
    (128 * 32 * 32, 512, 128),   # best gap (1.13x)
    (128 * 32 * 32, 128, 512),
]


def main():
    for m, k, n in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
        # sanity: fused variants agree with each other
        _, a1, a2 = pallas_1d(x, w)
        _, b1, b2 = pallas_mxu_stats(x, w)
        err = float(jnp.max(jnp.abs(a1 - b1))) + float(jnp.max(jnp.abs(a2 - b2)))
        t_dot = timeit(xla_dot, x, w)
        for name, fn in [("pallas_mm", pallas_mm), ("pallas_1d", pallas_1d),
                         ("pallas_mxu_stats", pallas_mxu_stats)]:
            for bm in (2048, 4096, 8192):
                t = timeit(functools.partial(fn, bm=bm), x, w)
                print(f"M={m} K={k} N={n} {name} bm={bm}: {t * 1e3:.3f}ms "
                      f"({t / t_dot:.2f}x of dot={t_dot * 1e3:.3f}ms)",
                      flush=True)
        print(f"  cross-variant stats err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
