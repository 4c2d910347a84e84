"""A/B sweep of XLA:TPU compiler options on the SegCD bs=64 train step.

The one documented lever not yet tried (docs/DESIGN.md step-time
profile): the scoped-VMEM budget. XLA:TPU caps how much VMEM a fusion
may claim (default ~16 MB on v5e); raising it lets the fusion pass
build deeper conv+elementwise fusions — potentially shaving the BN/
elementwise HBM passes that are ~19% of the SegCD step. Options are
passed per-compile via the AOT path (``jitted.lower(...).compile(
compiler_options=...)``) because the axon sitecustomize overrides
XLA_FLAGS env vars (CLAUDE.md).

Each distinct option set is a fresh XLA compile (~4-6 min over the
tunnel) — run under nohup and poll the log.
"""

import json
import time

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.models import SegCD
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_cd_steps

BATCH, SIZE = 64, 256
ITERS, WARMUP = 20, 3

CONFIGS = [
    ("baseline", None),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
]


def build():
    model = SegCD(encoder_name="resnet50", classes=1,
                  decoder_channels=(256, 128, 64, 32, 16),
                  dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3))
    label = (jax.random.uniform(jax.random.PRNGKey(2),
                                (BATCH, SIZE, SIZE, 1)) > 0.8
             ).astype(jnp.float32)
    tx = optax.adam(poly_schedule(1e-3, 60, 1000))
    state = create_train_state(model, key, (a[:1], b[:1]), tx)
    train_step, _ = make_cd_steps(model, augment=True)
    return train_step, state, {"A": a, "B": b, "label": label}


def main():
    train_step, template_state, batch = build()
    for name, options in CONFIGS:
        # fresh state per config: the step donates its input state
        state = jax.tree.map(jnp.copy, template_state)
        try:
            t0 = time.perf_counter()
            compiled = train_step.lower(state, batch, jax.random.PRNGKey(3)
                                        ).compile(compiler_options=options)
            compile_s = time.perf_counter() - t0
        except Exception as e:  # unknown flag names raise at compile time
            print(json.dumps({"config": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        state, out = compiled(state, batch, jax.random.PRNGKey(3))
        float(out["loss"])
        for i in range(WARMUP):
            state, out = compiled(state, batch, jax.random.PRNGKey(4 + i))
        float(out["loss"])
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, out = compiled(state, batch, jax.random.PRNGKey(100 + i))
        loss = float(out["loss"])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "config": name, "pairs_per_sec": round(BATCH * ITERS / dt, 2),
            "ms_per_step": round(1000 * dt / ITERS, 2),
            "compile_s": round(compile_s, 1), "loss": round(loss, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
