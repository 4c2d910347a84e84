"""A/B: SNUNet perf-floor levers (VERDICT r3 item 7).

SNUNet is the zoo's perf floor — 314 ms/step at bs=32 256² bf16
(BASELINE.md zoo sweep), trace-attributed to the narrow nested-skip
trunk; the r2 split-kernel concat-elimination lever measured SLOWER and
was reverted. This measures one more lever, plus a control:

- ``baseline``: SNUNetECAM as shipped (nn.ConvTranspose k2 s2 Ups).
- ``d2s``: every Up replaced by the mathematically-IDENTICAL matmul +
  depth-to-space rewrite (models/snunet._D2SUp — same params, equality
  pinned here at fp32 on the first step): one MXU matmul instead of
  XLA's transposed-conv path. If the transposed convs were a real cost,
  this shows it.

Run on the chip:  nohup python benchmarks/ab_snunet_levers.py > log &
Prints one JSON line per arm.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stcd_tpu.losses.functional import cross_entropy
from stcd_tpu.models.snunet import SNUNetECAM

BATCH, SIZE = 32, 256


def bench(model, variables, tag):
    a = jax.random.normal(jax.random.PRNGKey(0), (BATCH, SIZE, SIZE, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3))
    label = (jax.random.uniform(jax.random.PRNGKey(2),
                                (BATCH, SIZE, SIZE)) > 0.8).astype(jnp.int32)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, a, b, rng):
        def loss_fn(p):
            pred, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, a, b, True,
                mutable=["batch_stats"], rngs={"dropout": rng})
            return cross_entropy(pred, label), mut["batch_stats"]
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state2, loss

    params, bs = variables["params"], variables.get("batch_stats", {})
    params, bs, opt_state, loss = step(params, bs, opt_state, a, b,
                                       jax.random.PRNGKey(3))
    print(f"{tag} warmup loss: {float(loss):.4f}", flush=True)
    dt = None
    for iters in (5, 15):
        t0 = time.perf_counter()
        for i in range(iters):
            params, bs, opt_state, loss = step(params, bs, opt_state, a, b,
                                               jax.random.PRNGKey(100 + i))
        float(loss)
        dt = (time.perf_counter() - t0) / iters
        print(f"  {tag} iters={iters}: {dt * 1e3:.2f} ms/step", flush=True)
    return {"arm": tag, "batch": BATCH, "size": SIZE,
            "step_ms": round(dt * 1e3, 2),
            "pairs_per_s": round(BATCH / dt, 1)}


def main():
    print(f"devices: {jax.devices()}", flush=True)
    base = SNUNetECAM(out_ch=2, dtype=jnp.bfloat16)
    a0 = jnp.zeros((1, SIZE, SIZE, 3))
    variables = base.init(jax.random.PRNGKey(0), a0, a0)

    # exactness pin (small fp32 forward, same params both arms)
    m32a = SNUNetECAM(out_ch=2)
    m32b = SNUNetECAM(out_ch=2, up_mode="d2s")
    xa = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64, 3))
    xb = jax.random.normal(jax.random.PRNGKey(8), (2, 64, 64, 3))
    v32 = m32a.init(jax.random.PRNGKey(9), xa, xb)
    d = float(jnp.abs(m32a.apply(v32, xa, xb)
                      - m32b.apply(v32, xa, xb)).max())
    print(f"d2s fp32 equality maxdiff: {d:.2e}", flush=True)
    assert d < 1e-5

    results = [bench(base, variables, "baseline"),
               bench(SNUNetECAM(out_ch=2, dtype=jnp.bfloat16, up_mode="d2s"),
                     variables, "d2s")]
    speedup = results[0]["step_ms"] / results[1]["step_ms"]
    for r in results:
        print(json.dumps(r), flush=True)
    print(json.dumps({"d2s_speedup": round(speedup, 3)}), flush=True)


if __name__ == "__main__":
    main()
