"""Microbenchmark: BatchNorm statistics passes on the real TPU.

The SegCD/CFv6 step traces attribute ~19% of train time to BN statistic
reduce fusions (multiply_reduce/convert_reduce), and the per-event times
run 5-20x above the HBM read roofline for the tensor being reduced
(BASELINE.md). This bench isolates the pass: for each conv-output shape,

  stats_jnp    : s1=sum(xf), s2=sum(xf^2) over (N,H,W) — what MPBatchNorm
                 emits today (one fused convert+multiply reduce in XLA)
  apply_jnp    : z = relu(x*w + b) — the elementwise normalize-apply pass
                 (bandwidth yardstick: read 2B + write 2B per element)
  stats_pallas : Pallas reduction kernel, (M, C) view with small channels
                 lane-folded to 128 (ops/bn_stats.py)

and prints the HBM roofline for each (820 GB/s v5e).

Timing: chained fori_loop (one dispatch for all iters; tunneled-platform
methodology per docs/DESIGN.md).

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
        s1b, s2b = jax.jit(bn_stats_pallas)(x)
        err = max(float(jnp.max(jnp.abs(s1a - s1b))) / elts ** 0.5,
                  float(jnp.max(jnp.abs(s2a - s2b))) / elts ** 0.5)

        t_stats = chained_timeit(jax.jit(stats_jnp), x)
        t_pallas = chained_timeit(jax.jit(bn_stats_pallas), x)
        t_apply = chained_timeit(jax.jit(make_apply(c)), x)
        print(f"{shape}: stats_jnp={t_stats * 1e3:.3f}ms "
              f"({t_stats * 1e6 / read_ms / 1e3:.1f}x read-roofline "
              f"{read_ms:.3f}ms) "
              f"stats_pallas={t_pallas * 1e3:.3f}ms "
              f"({t_pallas / t_stats:.2f}x of jnp) "
              f"apply={t_apply * 1e3:.3f}ms "
              f"(roofline {2 * read_ms:.3f}ms) err={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
