"""Throughput of the flagship STAGE-3 train step (train_semi_cd).

bench.py measures the stage-2 CD step; the stage-3 fine-tune step (ref
train_stcd.py:388-462) is heavier per sample: the batch concatenates a
pseudo pair with a real pair (data_A=cat(A,CA), data_B=cat(B,CB), ref
:421-423 — so the folded Siamese encode sees 4x `batch` images), and the
loss adds seg_loss_A + the masked contrastive MSE (:334-385,445) on top
of BCE+Dice. This measures SegCD(resnet50) 256^2 bf16 with on-device
augmentation, reporting REAL-pair throughput (the unit the reference's
epoch length is defined in: len(LEVIR_Dataset) = change-set length,
data/dataset.py:446-447).

Run:  nohup python benchmarks/bench_semi_step.py [batch] > /tmp/semi.log 2>&1 &
"""

import json
import os
import sys
import time

import jax

if os.environ.get("STCD_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from stcd_tpu.models import SegCD
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_semi_cd_steps


def main():
    platform = jax.devices()[0].platform
    print(f"devices: {jax.devices()}", flush=True)
    small = os.environ.get("BENCH_SMALL") == "1" or platform == "cpu"
    if small:
        batch, size, iters, warmup = 2, 64, 3, 1
        encoder, dec = "resnet18", (32, 24, 16, 12, 8)
    else:
        batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
        size, iters, warmup = 256, 20, 3
        encoder, dec = "resnet50", (256, 128, 64, 32, 16)

    dtype = jnp.bfloat16 if platform != "cpu" else None
    model = SegCD(encoder_name=encoder, classes=1, decoder_channels=dec,
                  dtype=dtype)
    key = jax.random.PRNGKey(0)

    def img(k):
        return jax.random.normal(jax.random.PRNGKey(k),
                                 (batch, size, size, 3), jnp.float32)

    def lab(k):
        return (jax.random.uniform(jax.random.PRNGKey(k),
                                   (batch, size, size, 1)) > 0.8
                ).astype(jnp.float32)

    batch_dict = {"A": img(1), "B": img(2), "CA": img(3), "CB": img(4),
                  "s_label_A": lab(5), "c_label": lab(6), "CL": lab(7)}
    tx = optax.adam(poly_schedule(1e-3, 60, 1000))
    state = create_train_state(model, key, (img(1), img(2)), tx)
    train_step, _ = make_semi_cd_steps(model, augment=True)

    # warmup; final sync fetches the VALUE (tunneled-platform methodology,
    # see bench.py)
    state, out = train_step(state, batch_dict, jax.random.PRNGKey(30))
    float(out["loss"])
    for i in range(warmup):
        state, out = train_step(state, batch_dict, jax.random.PRNGKey(40 + i))
    float(out["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, out = train_step(state, batch_dict, jax.random.PRNGKey(100 + i))
    float(out["loss"])
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "segcd_resnet50_semi_cd_train_real_pairs_per_sec_per_chip",
        "value": round(batch * iters / dt, 3),
        "unit": f"{size}x{size} real pairs/sec/chip "
                f"(each step also trains {batch} pseudo pairs: "
                f"{2 * batch} pairs = {4 * batch} images/step)",
        "ms_per_step": round(dt / iters * 1e3, 1),
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
