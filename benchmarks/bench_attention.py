"""Microbenchmark: Pallas fused cross-attention vs the XLA einsum path on
the real TPU, at ChangeFormer SRA shapes (large N, sr-reduced M) and BIT
token shapes. Prints a small table; evidence that the fused kernel is the
right default (ops/attention.py auto-select)."""

import time

import jax
import jax.numpy as jnp

from stcd_tpu.ops.attention import cross_attention


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


CASES = [
    # (label, B, H, N, M, D) — SRA stage1 512^2: N=(512/4)^2=16384, sr 8 -> M=256
    ("sra_512_stage1", 8, 1, 16384, 256, 64),
    ("sra_256_stage1", 8, 1, 4096, 64, 64),
    ("sra_256_stage2", 8, 2, 1024, 64, 64),
    ("bit_decode", 8, 8, 4096, 4, 64),
]


def main():
    print(f"{'case':18} {'einsum_ms':>10} {'pallas_ms':>10} {'speedup':>8}")
    for label, b, h, n, m, d in CASES:
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, h, m, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, h, m, d), jnp.bfloat16)
        f_ein = jax.jit(lambda q, k, v: cross_attention(q, k, v, use_pallas=False))
        f_pal = jax.jit(lambda q, k, v: cross_attention(q, k, v, use_pallas=True))
        # numerics check first
        ref = f_ein(q, k, v)
        got = f_pal(q, k, v)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        te = timeit(f_ein, q, k, v)
        tp = timeit(f_pal, q, k, v)
        print(f"{label:18} {te * 1e3:10.3f} {tp * 1e3:10.3f} "
              f"{te / tp:7.2f}x  (max|d|={err:.3e})")


if __name__ == "__main__":
    main()
