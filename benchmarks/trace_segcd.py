"""Capture a jax.profiler trace of the SegCD train step (real TPU) and
print the top self-time ops, to direct kernel-fusion work.

Usage: python benchmarks/trace_segcd.py [outdir]
Parses the xplane with tensorboard_plugin_profile when available.
"""

import glob
import os
import sys

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.models import SegCD
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.steps import make_cd_steps

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/segcd_trace"
BATCH = int(os.environ.get("BENCH_BATCH", "64"))


def main():
    model = SegCD(encoder_name="resnet50", classes=1,
                  decoder_channels=(256, 128, 64, 32, 16), dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (BATCH, 256, 256, 3), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 256, 3), jnp.float32)
    label = (jax.random.uniform(jax.random.PRNGKey(2), (BATCH, 256, 256, 1)) > 0.8
             ).astype(jnp.float32)
    batch = {"A": a, "B": b, "label": label}
    tx = optax.adam(poly_schedule(1e-3, 60, 1000))
    state = create_train_state(model, key, (a[:1], b[:1]), tx)
    train_step, _ = make_cd_steps(model, augment=True)
    state, out = train_step(state, batch, jax.random.PRNGKey(3))
    jax.block_until_ready(out["loss"])

    with jax.profiler.trace(OUT):
        for i in range(5):
            state, out = train_step(state, batch, jax.random.PRNGKey(10 + i))
        jax.block_until_ready(out["loss"])
    print("trace written to", OUT)

    planes = glob.glob(os.path.join(OUT, "plugins/profile/*/*.xplane.pb"))
    print("xplane files:", planes)
    if not planes:
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
        data, _ = rtd.xspace_to_tool_data(planes, "framework_op_stats", {})
        out_path = os.path.join(OUT, "op_stats.csv")
        with open(out_path, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
        print("op stats written to", out_path)
    except Exception as e:
        print("op-stats conversion failed:", type(e).__name__, e)


if __name__ == "__main__":
    main()
