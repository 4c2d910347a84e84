"""A/B: SegCD(resnet50) bs=64 train step with per-leaf Adam (a fused
update kernel per parameter tensor — fixed overhead x ~320 leaves) vs
optax.flatten(adam) (one update over a single concatenated vector)."""

import json
import time

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.models import SegCD
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_cd_steps

BATCH, SIZE, ITERS = 64, 256, 20


def run(flatten: bool) -> float:
    model = SegCD(encoder_name="resnet50", classes=1,
                  decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3))
    label = (jax.random.uniform(jax.random.PRNGKey(2),
                                (BATCH, SIZE, SIZE, 1)) > 0.8).astype(jnp.float32)
    tx = optax.adam(poly_schedule(1e-3, 60, 1000))
    if flatten:
        tx = optax.flatten(tx)
    state = create_train_state(model, key, (a[:1], b[:1]), tx)
    train_step, _ = make_cd_steps(model, augment=True)
    batch = {"A": a, "B": b, "label": label}

    state, out = train_step(state, batch, jax.random.PRNGKey(3))
    jax.block_until_ready(out["loss"])
    for i in range(3):
        state, out = train_step(state, batch, jax.random.PRNGKey(4 + i))
    jax.block_until_ready(out["loss"])
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, out = train_step(state, batch, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(out["loss"])
    dt = time.perf_counter() - t0
    pairs = BATCH * ITERS / dt
    print(json.dumps({"flatten": flatten, "pairs_per_sec": round(pairs, 2),
                      "ms_per_step": round(1000 * dt / ITERS, 2),
                      "loss": float(out["loss"])}), flush=True)
    return pairs


if __name__ == "__main__":
    base = run(False)
    flat = run(True)
    print(json.dumps({"speedup": round(flat / base, 4)}))
