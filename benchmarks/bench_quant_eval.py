"""Model-level serving benchmark: int8-quantized vs bf16 SegCD eval.

bench_int8_conv.py showed raw s8xs8->s32 convs run ~2.2x bf16 at the
serving batch (bs=64 256^2 encoder shapes; the small-batch rows there
are tunnel-noise-limited). This measures what that buys END TO END on
the flagship eval forward: SegCD(resnet50) bs=64 256^2, bf16 compute
(the production eval config, BASELINE.md eval 2581 pairs/s) vs the same
forward wrapped by serving/quant.py.

Timing: one jitted lax.scan of ITERS dependent evals per side (the
output feeds a zero-scaled perturbation of the next input, forcing
sequential execution); fetch one scalar per timed call (axon tunnel:
block_until_ready can return optimistically, and fetching a feature map
would swamp the measurement — see the bench_int8_conv.py history).

Run:  nohup python benchmarks/bench_quant_eval.py [batch] [model] > /tmp/qeval.log 2>&1 &
      model: segcd (default) | changeformer (V6 256^2 — checks the quant
      interception generalizes to the transformer family: patch-embed /
      conv_diff / decoder convs quantize, DWConv depthwise and the Pallas
      SRA attention stay untouched)
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from stcd_tpu.data.augment import eval_preprocess
from stcd_tpu.models import SegCD
from stcd_tpu.serving import calibrate_conv_scales, quantize_fn

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MODEL = sys.argv[2] if len(sys.argv) > 2 else "segcd"
SIZE = 256
ITERS = 10


def main():
    print(f"devices: {jax.devices()} model={MODEL}", flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (BATCH, SIZE, SIZE, 3)), jnp.float32)
    if MODEL == "changeformer":
        from stcd_tpu.models.changeformer import ChangeFormerV6

        model = ChangeFormerV6(embed_dim=256, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), a[:2], b[:2])

        def fwd(xa, xb):
            return model.apply(variables, eval_preprocess(xa),
                               eval_preprocess(xb), False)[-1]
    elif MODEL not in ("segcd",):
        # bespoke-zoo sweep (VERDICT r2 item 9): any define_G net_G key
        from stcd_tpu.models.factory import define_G

        model = define_G(MODEL, n_class=2, img_size=SIZE,
                         dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), a[:2], b[:2])

        def fwd(xa, xb):
            out = model.apply(variables, eval_preprocess(xa),
                              eval_preprocess(xb))
            return out[-1] if isinstance(out, (list, tuple)) else out
    else:
        model = SegCD(encoder_name="resnet50", classes=1,
                      decoder_channels=(256, 128, 64, 32, 16),
                      dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), a[:2], b[:2])

        def fwd(xa, xb):
            return model.apply(variables, eval_preprocess(xa),
                               eval_preprocess(xb), False)[2]

    print("calibrating...", flush=True)
    scales = calibrate_conv_scales(fwd, [(a, b)])
    n_q = int(np.isfinite(scales).sum())
    print(f"{scales.shape[0]} conv sites, {n_q} quantized", flush=True)
    qfwd = quantize_fn(fwd, scales)

    def timed(tag, f):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def chain(xa, xb, iters):
            def body(c, _):
                d = f(xa + c, xb)
                return jnp.mean(d).astype(jnp.float32) * 0.0, ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        float(chain(a, b, ITERS))      # compile + sync
        float(chain(a, b, 2 * ITERS))  # compile + sync
        t1 = t2 = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(a, b, ITERS))
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(chain(a, b, 2 * ITERS))
            t2 = min(t2, time.perf_counter() - t0)
        dt = max(t2 - t1, 1e-9) / ITERS
        pairs = BATCH / dt
        print(f"{tag}: {dt * 1e3:.1f} ms/eval-step, "
              f"{pairs:.0f} pairs/s/chip", flush=True)
        return pairs

    p_bf = timed("bf16 ", fwd)
    p_q = timed("int8 ", qfwd)
    print(f"speedup: {p_q / p_bf:.2f}x", flush=True)


if __name__ == "__main__":
    main()
