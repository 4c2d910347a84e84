"""One-off TPU profile of the SegCD train step: where does the time go?

Variants timed (same shapes, bs configurable):
  - train+aug   : the bench.py configuration
  - train-noaug : augmentation disabled (isolate the aug cost)
  - eval        : forward-only
Also prints XLA's cost_analysis (FLOPs, bytes) and the implied MXU
utilization for the train step.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.models import SegCD
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_cd_steps

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
SIZE = 256
PEAK_BF16_TFLOPS = float(os.environ.get("PEAK_TFLOPS", "197"))  # v5e ~197


def timeit(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    model = SegCD(encoder_name="resnet50", classes=1,
                  decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3), jnp.float32)
    label = (jax.random.uniform(jax.random.PRNGKey(2),
                                (BATCH, SIZE, SIZE, 1)) > 0.8).astype(jnp.float32)
    batch = {"A": a, "B": b, "label": label}
    tx = optax.adam(poly_schedule(1e-3, 60, 1000))

    results = {}
    for name, augment in (("train+aug", True), ("train-noaug", False)):
        state = create_train_state(model, key, (a[:1], b[:1]), tx)
        train_step, eval_step = make_cd_steps(model, augment=augment)

        def step(state, batch, rng):
            s2, out = train_step(state, batch, rng)
            return out["loss"]

        # fresh state per call would donate-and-die; time the full step fn
        st = state
        t = None
        rng = jax.random.PRNGKey(3)
        s2, out = train_step(st, batch, rng)
        jax.block_until_ready(out["loss"])
        for _ in range(3):
            s2, out = train_step(s2, batch, rng)
        jax.block_until_ready(out["loss"])
        t0 = time.perf_counter()
        iters = 20
        for i in range(iters):
            s2, out = train_step(s2, batch, jax.random.PRNGKey(i))
        jax.block_until_ready(out["loss"])
        t = (time.perf_counter() - t0) / iters
        results[name] = t
        if name == "train-noaug":
            lowered = train_step.lower(s2, batch, rng)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = cost.get("flops", 0.0)
            results["train_flops_T"] = flops / 1e12
            results["mxu_util_pct"] = round(
                100 * (flops / t) / (PEAK_BF16_TFLOPS * 1e12), 1)

        if name == "train+aug":
            t_eval = timeit(lambda bb: eval_step(s2, bb)["cm"], batch)
            results["eval"] = t_eval

    print(json.dumps({
        "batch": BATCH,
        "train+aug_ms": round(results["train+aug"] * 1e3, 2),
        "train-noaug_ms": round(results["train-noaug"] * 1e3, 2),
        "eval_ms": round(results["eval"] * 1e3, 2),
        "train+aug_pairs_per_s": round(BATCH / results["train+aug"], 1),
        "train-noaug_pairs_per_s": round(BATCH / results["train-noaug"], 1),
        "eval_pairs_per_s": round(BATCH / results["eval"], 1),
        "train_flops_T": round(results.get("train_flops_T", 0.0), 3),
        "mxu_util_pct_noaug": results.get("mxu_util_pct"),
    }, indent=1))


if __name__ == "__main__":
    main()
