"""Bespoke CD-zoo throughput sweep on the real chip: one bf16 train step
per define_G family at 256x256, grouped-chained timing (docs/DESIGN.md
"Benchmarking on the tunneled axon platform").

Prints one JSON line per model; BASELINE.md records the results.

Usage: python benchmarks/bench_zoo.py [net_G ...]   (default: the sweep)
       TRACE_DIR=/tmp/t python benchmarks/bench_zoo.py SNUNet   (+ xplane
       trace of 5 steps for benchmarks/parse_trace.py)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import optax

from stcd_tpu.losses.functional import bce_loss, cross_entropy
from stcd_tpu.models.factory import define_G

# (net_G key, batch size) — batches picked to fit v5e HBM at 256^2.
SWEEP = [
    ("SiamUnet_conc", 64),
    ("SNUNet", 32),
    ("DTCDSCN", 32),
    ("IFNet", 16),
    ("base_transformer_pos_s4_dd8", 32),
    ("ChangeGNNV2", 8),
]


def bench_one(net_g: str, batch: int, size: int = 256) -> dict:
    model = define_G(net_g, n_class=2, img_size=size, dtype=jnp.bfloat16)
    a = jax.random.normal(jax.random.PRNGKey(0), (batch, size, size, 3))
    b = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), a[:1], b[:1])
    has_bn = "batch_stats" in variables
    int_label = (jax.random.uniform(jax.random.PRNGKey(2),
                                    (batch, size, size)) > 0.8).astype(jnp.int32)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(variables["params"])

    def pick_loss(pred):
        p = pred[-1] if isinstance(pred, (list, tuple)) else pred
        if p.shape[-1] == 1:  # DSIFN head already returns sigmoid probs
            return bce_loss(p.astype(jnp.float32),
                            int_label[..., None].astype(jnp.float32))
        return cross_entropy(p, int_label)

    @jax.jit
    def step(params, batch_stats, opt_state, a, b, rng):
        def loss_fn(p):
            v = {"params": p}
            if has_bn:
                v["batch_stats"] = batch_stats
                pred, mut = model.apply(v, a, b, True, mutable=["batch_stats"],
                                        rngs={"dropout": rng})
                return pick_loss(pred), mut["batch_stats"]
            pred = model.apply(v, a, b, True, rngs={"dropout": rng})
            return pick_loss(pred), batch_stats
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state2, loss

    params, bs = variables["params"], variables.get("batch_stats", {})
    params, bs, opt_state, loss = step(params, bs, opt_state, a, b,
                                       jax.random.PRNGKey(3))
    print(f"{net_g} warmup loss: {float(loss):.4f}", flush=True)
    dt = None
    for iters in (5, 15):
        t0 = time.perf_counter()
        for i in range(iters):
            params, bs, opt_state, loss = step(params, bs, opt_state, a, b,
                                               jax.random.PRNGKey(100 + i))
        float(loss)  # one real value fetch closes the timed group
        dt = (time.perf_counter() - t0) / iters
        print(f"  group iters={iters}: {dt * 1e3:.2f} ms/step", flush=True)

    if os.environ.get("TRACE_DIR"):
        with jax.profiler.trace(os.environ["TRACE_DIR"]):
            for i in range(5):
                params, bs, opt_state, loss = step(
                    params, bs, opt_state, a, b, jax.random.PRNGKey(200 + i))
            float(loss)
        print(f"  trace written to {os.environ['TRACE_DIR']}", flush=True)

    n_params = sum(x.size for x in jax.tree.leaves(params))
    return {"net_G": net_g, "batch": batch, "size": size,
            "step_ms": round(dt * 1e3, 2),
            "pairs_per_s": round(batch / dt, 1),
            "params_M": round(n_params / 1e6, 2)}


def main():
    names = sys.argv[1:]
    sweep = [(n, dict(SWEEP).get(n, 16)) for n in names] if names else SWEEP
    for net_g, batch in sweep:
        try:
            print(json.dumps(bench_one(net_g, batch)), flush=True)
        except Exception as e:  # keep sweeping; record the failure
            print(json.dumps({"net_G": net_g, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
