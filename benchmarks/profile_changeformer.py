"""ChangeFormerV6 512x512 bf16 train-step profile: step time, pairs/s,
XLA FLOP count and implied MXU utilization (VERDICT r1 item 10: the
512 config had pairs/s but no MFU on record)."""

import json
import os
import time

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.losses.functional import cross_entropy
from stcd_tpu.models.changeformer import ChangeFormerV6

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
PEAK_BF16_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))  # v5e ~197


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

    # Timing methodology (hard-won on the tunneled axon platform; r1's
    # 611 pairs/s was an artifact): time GROUPS of chained steps and fetch
    # the final loss VALUE once per group — block_until_ready alone can
    # return optimistically here, while a mid-stream fetch per iteration
    # costs ~45 s (full remote-state sync). Increasing group sizes must
    # converge (506 -> 465 -> 458 ms/step for this config), which proves
    # the chain serializes on device; the largest group is reported.
    params, bs, opt_state, loss = step(params, bs, opt_state, a, b, label,
                                       jax.random.PRNGKey(3))
    print("warmup loss:", float(loss), flush=True)
    dt = None
    for iters in (5, 20):
        t0 = time.perf_counter()
        for i in range(iters):
            params, bs, opt_state, loss = step(params, bs, opt_state, a, b,
                                               label, jax.random.PRNGKey(100 + i))
        float(loss)  # one real fetch closes the group
        dt = (time.perf_counter() - t0) / iters
        print(f"group iters={iters}: {dt * 1e3:.2f} ms/step", flush=True)

    cost = step.lower(params, bs, opt_state, a, b, label,
                      jax.random.PRNGKey(3)).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", 0.0)

    print(json.dumps({
        "batch": BATCH, "size": SIZE,
        "step_ms": round(dt * 1e3, 2),
        "pairs_per_s": round(BATCH / dt, 1),
        "train_flops_T": round(flops / 1e12, 3),
        "mxu_util_pct": round(100 * (flops / dt) / (PEAK_BF16_TFLOPS * 1e12), 1),
    }))


if __name__ == "__main__":
    main()
