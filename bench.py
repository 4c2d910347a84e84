"""Throughput benchmark: SegCD(resnet50) train step, 256x256 pairs/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

vs_baseline = ours / PyTorch-CPU reference throughput (measured by
benchmarks/torch_cpu_baseline.py, recorded in baseline_measured.json;
BASELINE.md: the reference publishes no numbers, so the CPU baseline is
ours to measure). Target >= 5x (BASELINE.json).

"extra" (VERDICT r3 item 8) widens the artifact beyond the headline so
BENCH_r*.json tracks the whole perf surface round-over-round: the bf16
eval step, the int8-quantized eval step (serving/quant.py), and the
ChangeFormerV6 512^2 bf16 train step. Each is measured best-effort
(None on failure) and skipped entirely on CPU/BENCH_SMALL sanity runs.

Runs on whatever jax.devices() offers (real TPU chip under the driver;
CPU locally with BENCH_SMALL=1 for a quick sanity run).
"""

import json
import os
import time

import jax

if os.environ.get("STCD_FORCE_CPU") == "1":
    # env JAX_PLATFORMS is overridden by the axon sitecustomize; force
    # programmatically for local CPU sanity runs (pair with BENCH_SMALL=1)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from stcd_tpu.models import SegCD
from stcd_tpu.train.state import create_train_state
from stcd_tpu.train.schedules import poly_schedule
from stcd_tpu.train.steps import make_cd_steps


def bench_changeformer():
    """Secondary config (BASELINE.json): ChangeFormerV6 at 512x512, bf16
    train step with the fused Pallas SRA attention path."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "benchmarks"))
    from cfv6_common import build_step

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    step, (params, bs, opt_state, a, b, label) = build_step(batch, size)
    params, bs, opt_state, loss = step(params, bs, opt_state, a, b, label,
                                       jax.random.PRNGKey(3))
    float(loss)  # warmup + real sync (see benchmarks/profile_changeformer.py
    # methodology note: block_until_ready alone can return optimistically on
    # the tunneled axon platform; fetch the VALUE once per timed group)
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        params, bs, opt_state, loss = step(params, bs, opt_state, a, b, label,
                                           jax.random.PRNGKey(4 + i))
    float(loss)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "changeformerv6_512_train_pairs_per_sec_per_chip",
        "value": round(batch * iters / dt, 3),
        "unit": f"{size}x{size} bi-temporal pairs/sec/chip",
        "vs_baseline": None,
    }))


def _timed_eval_chain(fwd, a, b, batch, iters=10):
    """pairs/s for an eval forward, timed as one jitted scan of dependent
    steps (2N-N subtraction cancels dispatch; fetch ONE scalar per timed
    call — benchmarks/bench_quant_eval.py methodology, tunnel-safe)."""
    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(xa, xb, iters):
        def body(c, _):
            d = fwd(xa + c, xb)
            return jnp.mean(d).astype(jnp.float32) * 0.0, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(chain(a, b, iters))
    float(chain(a, b, 2 * iters))
    t1 = t2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(a, b, iters))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(a, b, 2 * iters))
        t2 = min(t2, time.perf_counter() - t0)
    return batch / (max(t2 - t1, 1e-9) / iters)


def bench_extras(model, variables, a, b):
    """The non-headline driver metrics (VERDICT r3 item 8): bf16 eval,
    int8 eval, ChangeFormerV6-512 train. Best-effort: a failure records
    None for that key and never sinks the headline."""
    import numpy as np

    from stcd_tpu.data.augment import eval_preprocess

    extra = {}
    batch = a.shape[0]

    def fwd(xa, xb):
        return model.apply(variables, eval_preprocess(xa),
                           eval_preprocess(xb), False)[2]

    try:
        extra["segcd_eval_pairs_per_sec"] = round(
            _timed_eval_chain(fwd, a, b, batch), 1)
    except Exception as e:  # noqa: BLE001 - record, don't sink the bench
        print(f"# eval extra failed: {e!r}", flush=True)
        extra["segcd_eval_pairs_per_sec"] = None

    try:
        from stcd_tpu.serving import calibrate_conv_scales, quantize_fn
        scales = calibrate_conv_scales(fwd, [(a, b)])
        extra["segcd_int8_eval_pairs_per_sec"] = round(
            _timed_eval_chain(quantize_fn(fwd, scales), a, b, batch), 1)
        extra["int8_sites"] = int(np.isfinite(scales).sum())
    except Exception as e:  # noqa: BLE001
        print(f"# int8 extra failed: {e!r}", flush=True)
        extra["segcd_int8_eval_pairs_per_sec"] = None

    try:
        import sys
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        from cfv6_common import build_step
        cf_batch, cf_size = 8, 512
        step, (params, bs, opt_state, ca, cb, lab) = build_step(cf_batch,
                                                                cf_size)
        params, bs, opt_state, loss = step(params, bs, opt_state, ca, cb,
                                           lab, jax.random.PRNGKey(3))
        float(loss)
        t0 = time.perf_counter()
        cf_iters = 10
        for i in range(cf_iters):
            params, bs, opt_state, loss = step(params, bs, opt_state, ca,
                                               cb, lab,
                                               jax.random.PRNGKey(4 + i))
        float(loss)
        extra["changeformerv6_512_train_pairs_per_sec"] = round(
            cf_batch * cf_iters / (time.perf_counter() - t0), 1)
    except Exception as e:  # noqa: BLE001
        print(f"# changeformer extra failed: {e!r}", flush=True)
        extra["changeformerv6_512_train_pairs_per_sec"] = None
    return extra


def main():
    if os.environ.get("BENCH_MODEL") == "changeformer":
        bench_changeformer()
        return
    small = os.environ.get("BENCH_SMALL") == "1"
    platform = jax.devices()[0].platform
    if small or platform == "cpu":
        batch, size, iters, warmup = 2, 64, 3, 1
        encoder, dec = "resnet18", (32, 24, 16, 12, 8)
    else:
        batch = int(os.environ.get("BENCH_BATCH", "64"))
        size, iters, warmup = 256, 20, 3
        encoder, dec = "resnet50", (256, 128, 64, 32, 16)

    dtype = jnp.bfloat16 if platform != "cpu" else None
    model = SegCD(encoder_name=encoder, classes=1, decoder_channels=dec,
                  dtype=dtype)
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (batch, size, size, 3), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3), jnp.float32)
    label = (jax.random.uniform(jax.random.PRNGKey(2), (batch, size, size, 1)) > 0.8
             ).astype(jnp.float32)
    tx = optax.adam(poly_schedule(1e-3, 60, 1000))
    state = create_train_state(model, key, (a, b), tx)
    train_step, _ = make_cd_steps(model, augment=True)
    batch_dict = {"A": a, "B": b, "label": label}

    # compile + warmup (final sync fetches the VALUE: block_until_ready can
    # return optimistically on the tunneled axon platform; device-time
    # validated against a jax.profiler trace, 110.6 ms/step on-device vs
    # 112 ms measured for the bs=64 config)
    state, out = train_step(state, batch_dict, jax.random.PRNGKey(3))
    float(out["loss"])
    for i in range(warmup):
        state, out = train_step(state, batch_dict, jax.random.PRNGKey(4 + i))
    float(out["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, out = train_step(state, batch_dict, jax.random.PRNGKey(100 + i))
    float(out["loss"])
    dt = time.perf_counter() - t0
    pairs_per_sec = batch * iters / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "benchmarks", "baseline_measured.json")
    vs = None
    try:
        with open(baseline_path) as f:
            base = json.load(f)["value"]
        if not (small or platform == "cpu"):
            vs = pairs_per_sec / base
    except Exception:
        pass

    record = {
        "metric": "segcd_resnet50_train_pairs_per_sec_per_chip"
        if not (small or platform == "cpu") else "segcd_small_cpu_pairs_per_sec",
        "value": round(pairs_per_sec, 3),
        "unit": "256x256 bi-temporal pairs/sec/chip" if not (small or platform == "cpu")
        else f"{size}x{size} pairs/sec (cpu sanity)",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    if not (small or platform == "cpu") \
            and os.environ.get("BENCH_EXTRAS", "1") != "0":
        record["extra"] = bench_extras(
            model, {"params": state.params,
                    "batch_stats": state.batch_stats}, a, b)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
