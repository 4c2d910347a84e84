"""Microbenchmark: BatchNorm statistics formulations on the real TPU.

The step profile shows ~20% of SegCD train time in BN-stat reductions.
Candidates:
  two_means : mean(x), mean(x*x) as two jnp calls (current MPBatchNorm)
  variadic  : one lax.reduce over (x, x*x) — single pass, two outputs
  dot_stats : ones-vector matmuls (rides the MXU instead of the VPU)
All produce (mean, var) per channel from a bf16 NHWC activation.
"""

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def two_means(x):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, (0, 1, 2))
    m2 = jnp.mean(jnp.square(xf), (0, 1, 2))
    return m, jnp.maximum(m2 - jnp.square(m), 0.0)


def variadic(x):
    xf = x.astype(jnp.float32)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    s, s2 = jax.lax.reduce((xf, xf * xf), (jnp.float32(0), jnp.float32(0)),
                           lambda a, b: (a[0] + b[0], a[1] + b[1]), (0, 1, 2))
    m = s / n
    return m, jnp.maximum(s2 / n - jnp.square(m), 0.0)


def dot_stats(x):
    n, h, w, c = x.shape
    xf = x.reshape(-1, c).astype(jnp.float32)
    cnt = n * h * w
    ones = jnp.ones((cnt,), jnp.float32)
    s = ones @ xf
    s2 = jnp.einsum("nc,nc->c", xf, xf)
    m = s / cnt
    return m, jnp.maximum(s2 / cnt - jnp.square(m), 0.0)


SHAPES = [(64, 128, 128, 64), (64, 64, 64, 256), (128, 256, 256, 16)]


def main():
    for shape in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        row = [f"{shape}"]
        base = None
        for name, fn in (("two_means", two_means), ("variadic", variadic),
                         ("dot_stats", dot_stats)):
            f = jax.jit(fn)
            m, v = f(x)
            t = timeit(f, x)
            if base is None:
                base = t
            row.append(f"{name}={t * 1e3:.3f}ms({base / t:.2f}x)")
        print("  ".join(row))


if __name__ == "__main__":
    main()
