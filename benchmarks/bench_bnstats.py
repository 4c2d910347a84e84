"""Microbenchmark: BatchNorm statistics passes on the real TPU.

VERDICT (chip run 2026-08-18): net of the harness's per-iteration
carry-add pass (`null`), stats_jnp costs ~0.03-0.05 ms — XLA fuses the
stats reduce into whatever elementwise pass already reads x, so in a
real graph the reduction is effectively FREE riding an existing pass.
The earlier reading that "reduce events run 5-20x above read roofline"
was an attribution artifact: each fused trace event does several
tensors' worth of work. Both MXU gram formulations and the Pallas kernel
force a standalone read and are strictly worse (0.17-1.1 ms net). The
~19% BN share of the step is the irreducible extra-pass bandwidth of a
BN-heavy convnet, reachable only via a conv-epilogue kernel (measured
slower — bench_conv_bn_epilogue.py). Chapter closed; MPBatchNorm keeps
the jnp formulation.

The SegCD/CFv6 step traces attribute ~19% of train time to BN statistic
reduce fusions (multiply_reduce/convert_reduce). This bench isolates the
pass: for each conv-output shape,

  stats_jnp    : s1=sum(xf), s2=sum(xf^2) over (N,H,W) — what MPBatchNorm
                 emits today (one fused convert+multiply reduce in XLA)
  apply_jnp    : z = relu(x*w + b) — the elementwise normalize-apply pass
                 (bandwidth yardstick: read 2B + write 2B per element)
  stats_pallas : Pallas reduction kernel, (M, C) view with small channels
                 lane-folded to 128 (ops/bn_stats.py)
  stats_gram2  : MXU formulation — s1 = ones(8,M)@X summed, s2 =
                 diag(X^T X); two dot_generals contracting over M (reads
                 X twice but at dot bandwidth instead of reduce bandwidth;
                 M*C^2 extra MACs are cheap for C<=1024 at these shapes)
  stats_gramA  : one-dot variant — augment X with 8 ones columns, one
                 gram; s1 is the ones row, s2 the diagonal (pays a concat
                 materialization pass to read X once)
  null         : the timing harness's per-iteration carry-add pass alone
                 (subtract from the others for the op's true cost)

and prints the HBM roofline for each (820 GB/s v5e).

Timing: chained fori_loop (one dispatch for all iters; tunneled-platform
methodology per docs/DESIGN.md). The data-dependent carry add costs one
elementwise pass over x per iteration — that is the `null` row.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_bnstats.py
"""

import functools
import time

import jax
import jax.numpy as jnp

from stcd_tpu.ops.bn_stats import bn_stats_pallas

HBM_GBPS = 820.0


def chained_timeit(fn, x, iters=30):
    """One jitted fori_loop of `iters` data-dependent executions."""

    @jax.jit
    def run(x):
        def body(_, carry):
            out = fn(carry)
            s = out[0].reshape(-1)[0].astype(jnp.float32) * 1e-30
            return carry + s.astype(carry.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    float(jnp.sum(run(x).astype(jnp.float32)))  # warmup + compile
    t0 = time.perf_counter()
    float(jnp.sum(run(x).astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def stats_jnp(x):
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, (0, 1, 2)), jnp.sum(jnp.square(xf), (0, 1, 2))


def stats_gram2(x):
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    m = x2.shape[0]
    ones = jnp.ones((8, m), x.dtype)
    s1 = jax.lax.dot_general(ones, x2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x2, x2, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s1[0], jnp.diagonal(g)


def stats_gramA(x):
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    m = x2.shape[0]
    xa = jnp.concatenate([x2, jnp.ones((m, 8), x.dtype)], axis=1)
    g = jax.lax.dot_general(xa, xa, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return g[-1, :c], jnp.diagonal(g)[:c]


def null_op(x):
    return (x[:1, :1, :1, :1] * 1.0,)


def make_apply(c):
    w = jnp.full((c,), 1.01, jnp.bfloat16)
    b = jnp.full((c,), 0.02, jnp.bfloat16)

    def apply_jnp(x):
        return (jnp.maximum(x * w + b, 0),)

    return apply_jnp


# bs=64 pairs -> 128 folded images; SegCD resnet50 conv-output shapes.
SHAPES = [
    (128, 64, 64, 256),     # stage2 conv3 out (the 3.2 ms trace events)
    (128, 128, 128, 64),    # stem / stage1
    (128, 32, 32, 512),     # stage3 conv3 out
    (128, 16, 16, 1024),    # stage4 conv3 out
    (128, 256, 256, 16),    # decoder full-res
    (128, 128, 128, 32),    # decoder half-res
]


def main():
    for shape in SHAPES:
        n, h, w, c = shape
        elts = n * h * w * c
        read_ms = elts * 2 / HBM_GBPS / 1e6   # bf16 read
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)

        s1a, s2a = jax.jit(stats_jnp)(x)
        errs = {}
        for name, fn in (("pallas", bn_stats_pallas),
                         ("gram2", stats_gram2), ("gramA", stats_gramA)):
            s1b, s2b = jax.jit(fn)(x)
            errs[name] = max(
                float(jnp.max(jnp.abs(s1a - s1b))) / elts ** 0.5,
                float(jnp.max(jnp.abs(s2a - s2b))) / elts ** 0.5)

        t_null = chained_timeit(jax.jit(null_op), x)
        t_stats = chained_timeit(jax.jit(stats_jnp), x) - t_null
        t_pallas = chained_timeit(jax.jit(bn_stats_pallas), x) - t_null
        t_gram2 = chained_timeit(jax.jit(stats_gram2), x) - t_null
        t_gramA = chained_timeit(jax.jit(stats_gramA), x) - t_null
        t_apply = chained_timeit(jax.jit(make_apply(c)), x) - t_null
        print(f"{shape}: null={t_null * 1e3:.3f}ms | net of null: "
              f"stats_jnp={t_stats * 1e3:.3f}ms "
              f"({t_stats * 1e6 / read_ms / 1e3:.1f}x read-roofline "
              f"{read_ms:.3f}ms) "
              f"pallas={t_pallas * 1e3:.3f}ms ({t_pallas / t_stats:.2f}x) "
              f"gram2={t_gram2 * 1e3:.3f}ms ({t_gram2 / t_stats:.2f}x, "
              f"err {errs['gram2']:.1e}) "
              f"gramA={t_gramA * 1e3:.3f}ms ({t_gramA / t_stats:.2f}x, "
              f"err {errs['gramA']:.1e}) "
              f"apply={t_apply * 1e3:.3f}ms "
              f"(roofline {2 * read_ms:.3f}ms)",
              flush=True)


if __name__ == "__main__":
    main()
