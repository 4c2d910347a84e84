"""Capture a jax.profiler trace of the ChangeFormerV6 train step (real
TPU) for benchmarks/parse_trace.py.

Usage: python benchmarks/trace_changeformer.py [outdir]   (5 steps traced)
"""

import os
import sys

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.losses.functional import cross_entropy
from stcd_tpu.models.changeformer import ChangeFormerV6

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cfv6_trace"
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SIZE = int(os.environ.get("BENCH_SIZE", "256"))


def main():
    model = ChangeFormerV6(embed_dim=256, dtype=jnp.bfloat16)
    a = jax.random.normal(jax.random.PRNGKey(0), (BATCH, SIZE, SIZE, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3))
    label = (jax.random.uniform(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE)) > 0.8
             ).astype(jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), a[:1], b[:1])
    tx = optax.adamw(1e-4)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, a, b, label, rng):
        def loss_fn(p):
            preds, mut = model.apply({"params": p, "batch_stats": batch_stats},
                                     a, b, True, mutable=["batch_stats"],
                                     rngs={"dropout": rng})
            return sum(cross_entropy(pr, label) for pr in preds), mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), mut["batch_stats"], \
            opt_state2, loss

    params, bs = variables["params"], variables.get("batch_stats", {})
    params, bs, opt_state, loss = step(params, bs, opt_state, a, b, label,
                                       jax.random.PRNGKey(3))
    print("warmup loss:", float(loss), flush=True)

    with jax.profiler.trace(OUT):
        for i in range(5):
            params, bs, opt_state, loss = step(params, bs, opt_state, a, b,
                                               label, jax.random.PRNGKey(10 + i))
        float(loss)
    print("trace written to", OUT)


if __name__ == "__main__":
    main()
