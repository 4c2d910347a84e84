"""End-to-end training-loop throughput on the real TPU: SegCD(resnet50),
bs=64 256x256, synthetic host-side data through the DataLoader (real H2D
path + device-side metric accumulation + logging), one warmup epoch + one
timed epoch. Compares against bench.py's device-resident number to show
input-pipeline overhead."""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.data.loader import DataLoader
from stcd_tpu.models import SegCD
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_cd_steps
from stcd_tpu.metrics.confusion import SegmentationMetric

BATCH = int(os.environ.get("BENCH_BATCH", "64"))
STEPS = int(os.environ.get("BENCH_STEPS", "30"))


UINT8 = os.environ.get("BENCH_UINT8") == "1"


class SyntheticPairs:
    def __init__(self, n, size=256):
        self.n, self.size = n, size
        rng = np.random.default_rng(0)
        # distinct arrays per index so H2D can't be page-cached away
        if UINT8:  # uint8 transfer: 4x less H2D traffic, same numerics
            self.a = rng.integers(0, 256, (n, size, size, 3), np.uint8)
            self.b = rng.integers(0, 256, (n, size, size, 3), np.uint8)
            self.l = (rng.random((n, size, size, 1)) > 0.8).astype(np.uint8)
        else:
            self.a = rng.random((n, size, size, 3), np.float32)
            self.b = rng.random((n, size, size, 3), np.float32)
            self.l = (rng.random((n, size, size, 1)) > 0.8).astype(np.float32)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"A": self.a[i], "B": self.b[i], "label": self.l[i]}


def run_epoch(train_step, state, loader, rng):
    metric = SegmentationMetric(2)
    cm_dev = None
    n = 0
    t0 = time.perf_counter()
    for batch in loader:
        rng, step_rng = jax.random.split(rng)
        state, out = train_step(state, batch, step_rng)
        cm_dev = out["cm"] if cm_dev is None else cm_dev + out["cm"]
        n += batch["A"].shape[0]
    metric.confusionMatrix += np.asarray(cm_dev, np.float64)
    jax.block_until_ready(out["loss"])
    return state, n / (time.perf_counter() - t0), rng


def main():
    model = SegCD(encoder_name="resnet50", classes=1,
                  decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16)
    ds = SyntheticPairs(BATCH * STEPS)
    loader = DataLoader(ds, BATCH, shuffle=False, drop_last=True)
    tx = optax.adam(poly_schedule(1e-3, 60, 1000))
    a0 = jnp.zeros((1, 256, 256, 3))
    state = create_train_state(model, jax.random.PRNGKey(0), (a0, a0), tx)
    train_step, _ = make_cd_steps(model, augment=True)
    rng = jax.random.PRNGKey(1)

    state, warm_rate, rng = run_epoch(train_step, state, loader, rng)  # compile+warm
    state, rate, rng = run_epoch(train_step, state, loader, rng)
    print(json.dumps({
        "metric": "segcd_realloop%s_pairs_per_sec_per_chip" % (
            "_uint8" if UINT8 else ""),
        "value": round(rate, 1),
        "unit": "256x256 pairs/sec incl. host data path",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
