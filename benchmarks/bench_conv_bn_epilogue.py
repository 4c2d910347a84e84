"""Feasibility microbenchmark: Pallas 1x1-conv (matmul) with a fused
BN-statistics epilogue vs XLA conv + separate stats passes.

The SegCD/CFv6 step profiles cap at ~19%/~13% of time in BN statistics
reductions — the documented escape is computing sum(y)/sum(y^2) while the
conv's output tile is still in VMEM (BASELINE.md, docs/DESIGN.md
"Step-time profile"). ResNet50 bottlenecks are ~2/3 1x1 convs, which are
plain matmuls, so the question reduces to: can a Pallas matmul with a
stats epilogue match XLA's conv + stats on those shapes?

Variants per shape (bf16 in/out, f32 accumulation):
  xla_conv       : y = x @ w                          (lower bound)
  xla_conv_stats : y, sum(y), sum(y^2) via jnp        (status quo)
  pallas_fused   : one kernel emitting y + per-M-tile partial sums
                   (final (gm, N) -> (N,) reduce is epsilon-sized)

Run on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_conv_bn_epilogue.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, y_ref, s1_ref, s2_ref):
    # grid = (gn, gm); the m index (last) varies fastest, so the stats
    # block (index map (0, j)) stays resident in VMEM across the whole
    # m sweep and is flushed once per column block.
    i = pl.program_id(1)
    y = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    bm, bn = y.shape
    # partial sums folded to 8 sublane rows (final (8,)->() reduce is
    # epsilon-sized and happens outside the kernel)
    ps1 = jnp.sum(y.reshape(bm // 8, 8, bn), 0)
    ps2 = jnp.sum((y * y).reshape(bm // 8, 8, bn), 0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[:] += ps1
    s2_ref[:] += ps2


@functools.partial(jax.jit, static_argnames=("bm", "bn", "pipeline"))
def pallas_fused(x, w, bm=256, bn=256, pipeline=False):
    m, k = x.shape
    _, n = w.shape
    bn = min(bn, n)
    bm = min(bm, m)
    gm, gn = m // bm, n // bn
    params = {}
    if pipeline:
        # n is the outer (sequential, stats-carrying) dim; m sweeps fastest
        # and is declared arbitrary too (the stats block accumulates across
        # it) but Mosaic can still double-buffer the x/y DMAs.
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    y, s1, s2 = pl.pallas_call(
        _kernel,
        grid=(gn, gm),
        in_specs=[
            pl.BlockSpec((bm, k), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((8, n), jnp.float32),
        ],
        **params,
    )(x, w)
    return y, jnp.sum(s1, 0), jnp.sum(s2, 0)


@jax.jit
def xla_conv(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)


@jax.jit
def xla_conv4d_stats(x, w):
    """What the model actually does today: a REAL 1x1 convolution
    (lax.conv_general_dilated, NHWC) + separate fp32 stats passes."""
    m, k = x.shape
    n = w.shape[1]
    x4 = x.reshape(1, m // 128, 128, k)
    y = jax.lax.conv_general_dilated(
        x4, w.reshape(1, 1, k, n), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)
    yf = y.astype(jnp.float32)
    return y.reshape(m, n), jnp.sum(yf, (0, 1, 2)), jnp.sum(yf * yf, (0, 1, 2))


@jax.jit
def xla_conv_stats(x, w):
    y = jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, 0), jnp.sum(yf * yf, 0)


def timeit(fn, x, w, iters=30):
    """Time `iters` sequential executions INSIDE one jitted fori_loop.

    Each iteration's input is data-dependent on the previous output
    (x + y[0,0]*1e-30 — exact no-op in bf16 but not foldable), so the
    whole chain is one dispatch: no per-call tunnel RPC in the number.
    """

    @jax.jit
    def run(x, w):
        def body(_, carry):
            out = fn(carry, w)
            y = out[0] if isinstance(out, tuple) else out
            s = y[0, 0].astype(jnp.float32) * 1e-30
            return carry + s.astype(carry.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    float(jnp.sum(run(x, w)))  # warmup + compile
    t0 = time.perf_counter()
    float(jnp.sum(run(x, w)))
    return (time.perf_counter() - t0) / iters


# (M, K, N): SegCD resnet50 bottleneck 1x1 shapes at bs=64 pairs (2N fold
# = 128 images); M = imgs * H * W at the stage resolution.
SHAPES = [
    (128 * 64 * 64, 64, 256),    # stage2 expand
    (128 * 64 * 64, 256, 64),    # stage2 reduce
    (128 * 32 * 32, 512, 128),   # stage3 reduce
    (128 * 32 * 32, 128, 512),   # stage3 expand
    (128 * 16 * 16, 1024, 256),  # stage4 reduce
]


def main():
    import os
    sweep = os.environ.get("SWEEP_BM")  # e.g. "512,1024,2048,4096"
    for m, k, n in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)
        # correctness: BN-meaningful scales — |d mean| / std(y), |d var| / var
        y0, s1a, s2a = xla_conv_stats(x, w)
        y1, s1b, s2b = pallas_fused(x, w)
        ma, va = s1a / m, s2a / m - (s1a / m) ** 2
        mb, vb = s1b / m, s2b / m - (s1b / m) ** 2
        std = jnp.sqrt(jnp.maximum(va, 1e-6))
        err = max(float(jnp.max(jnp.abs(ma - mb) / std)),
                  float(jnp.max(jnp.abs(va - vb) / jnp.maximum(va, 1e-6))),
                  float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32)))) / float(jnp.max(std)))
        t_conv = timeit(xla_conv, x, w)
        t_stat = timeit(xla_conv_stats, x, w)
        t_4d = timeit(xla_conv4d_stats, x, w)
        t_pall = timeit(pallas_fused, x, w)
        print(f"M={m} K={k} N={n}: dot={t_conv * 1e3:.3f}ms "
              f"dot+stats={t_stat * 1e3:.3f}ms "
              f"CONV4d+stats={t_4d * 1e3:.3f}ms "
              f"pallas_fused={t_pall * 1e3:.3f}ms "
              f"(dot-stats overhead {100 * (t_stat / t_conv - 1):.0f}%, "
              f"conv4d vs dot+stats {t_4d / t_stat:.2f}x, relerr {err:.2e})",
              flush=True)
        if sweep:
            for bm in (int(v) for v in sweep.split(",")):
                if bm > m:
                    continue
                for pipe in (False, True):
                    f = functools.partial(pallas_fused, bm=bm, pipeline=pipe)
                    t = timeit(f, x, w)
                    print(f"  bm={bm:5d} pipeline={int(pipe)}: "
                          f"pallas_fused={t * 1e3:.3f}ms "
                          f"({t / t_conv:.2f}x of dot, "
                          f"{t / t_4d:.2f}x of CONV4d+stats)", flush=True)


if __name__ == "__main__":
    main()
