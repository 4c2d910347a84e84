"""Shared SegCD(resnet50) bs=64 256x256 bf16 A/B harness.

One definition of the model/step/timing for the A/B experiments
(ab_decoder_fusion.py, ab_opt_flatten.py — review finding: the two files
were near-verbatim copies). Timing follows the grouped-chained-steps
methodology (docs/DESIGN.md "Benchmarking on the tunneled axon
platform"): chain ITERS steps, fetch the final loss VALUE once.
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
SIZE = int(os.environ.get("BENCH_SIZE", "256"))
ITERS, WARMUP = int(os.environ.get("BENCH_ITERS", "20")), 3


def run_variant(record: dict, model_kwargs=None, tx_wrap=None) -> float:
    """Build + time one variant; prints `record` + measurements as one
    JSON line, returns pairs/sec. `model_kwargs` extends the SegCD
    constructor; `tx_wrap` wraps the optax transformation."""
    kwargs = dict(encoder_name="resnet50", classes=1,
                  decoder_channels=(256, 128, 64, 32, 16),
                  dtype=jnp.bfloat16)
    kwargs.update(model_kwargs or {})
    model = SegCD(**kwargs)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3))
    label = (jax.random.uniform(jax.random.PRNGKey(2),
                                (BATCH, SIZE, SIZE, 1)) > 0.8).astype(jnp.float32)
    tx = optax.adam(poly_schedule(1e-3, 60, 1000))
    if tx_wrap is not None:
        tx = tx_wrap(tx)
    state = create_train_state(model, key, (a[:1], b[:1]), tx)
    train_step, _ = make_cd_steps(model, augment=True)
    batch = {"A": a, "B": b, "label": label}

    state, out = train_step(state, batch, jax.random.PRNGKey(3))
    float(out["loss"])
    for i in range(WARMUP):
        state, out = train_step(state, batch, jax.random.PRNGKey(4 + i))
    float(out["loss"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, out = train_step(state, batch, jax.random.PRNGKey(100 + i))
    loss = float(out["loss"])  # one real value fetch closes the group
    dt = time.perf_counter() - t0
    pairs = BATCH * ITERS / dt
    print(json.dumps({**record, "pairs_per_sec": round(pairs, 2),
                      "ms_per_step": round(1000 * dt / ITERS, 2),
                      "loss": round(loss, 4)}), flush=True)
    return pairs


def ab(name: str, off, on) -> None:
    """Run the (False, True) pair and print the speedup line.
    `off`/`on` are thunks returning pairs/sec."""
    base, variant = off(), on()
    print(json.dumps({"experiment": name,
                      "speedup": round(variant / base, 4)}))
