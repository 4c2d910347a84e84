"""ChangeFormerV6 512x512 bf16 train-step profile: step time, pairs/s,
XLA FLOP count and implied MXU utilization (VERDICT r1 item 10: the
512 config had pairs/s but no MFU on record)."""

import json
import os
import time

import jax

from cfv6_common import build_step

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
PEAK_BF16_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))  # v5e ~197


def main():
    step, (params, bs, opt_state, a, b, label) = build_step(BATCH, SIZE)

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
