"""int8 vs bf16 conv microbench — go/no-go for a quantized serving path.

TPU v5e's MXU runs s8xs8->s32 at 2x the bf16 rate (394 vs 197 TOPS peak).
This measures whether XLA:TPU actually lowers `lax.conv_general_dilated`
on int8 operands to that native path (vs emulating in wider types) on the
SegCD/ChangeFormer-relevant shapes, fwd only (serving is eval-side).

Method matches the repo's chip-timing convention (see
benchmarks/profile_changeformer.py): chained dependent iterations inside
one jit body, fetch the VALUE once per timed group (block_until_ready can
return optimistically through the axon tunnel).

Run:  nohup python benchmarks/bench_int8_conv.py > /tmp/int8.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

# (N, H, W, Cin, Cout, k) — SegCD eval hot shapes + one lane-bound one
SHAPES = [
    (8, 64, 64, 256, 256, 3),    # resnet50 layer2-ish
    (8, 32, 32, 512, 512, 3),    # layer3-ish
    (8, 128, 128, 64, 64, 3),    # decoder mid
    (8, 256, 256, 16, 16, 3),    # decoder full-res (lane-padding-bound)
    (64, 64, 64, 256, 256, 3),   # bench.py batch
]

ITERS = 30


def conv(x, k, out_dtype):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "iters"))
def chain(x, k, out_dtype, iters):
    # dependent chain: re-quantize each output back to the input dtype so
    # every iteration is a fresh conv of identical shape; returns ONE
    # scalar — fetching a full feature map would ride the slow tunnel and
    # swamp the conv time
    def body(c, _):
        y = conv(c, k, out_dtype)
        # cheap cast back (shift into range for int8 to avoid saturation)
        c2 = (y >> 8).astype(x.dtype) if x.dtype == jnp.int8 else y.astype(x.dtype)
        return c2, ()

    out, _ = jax.lax.scan(body, x, None, length=iters)
    return out.ravel()[0].astype(jnp.float32)


def time_one(n, h, w, cin, cout, k, dtype, out_dtype):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, (n, h, w, cin)), jnp.int8)
        kern = jnp.asarray(rng.integers(-127, 127, (k, k, cin, cout)), jnp.int8)
    else:
        x = jnp.asarray(rng.normal(0, 1, (n, h, w, cin)), dtype)
        kern = jnp.asarray(rng.normal(0, 0.05, (k, k, cin, cout)), dtype)
    # warm up BOTH iteration counts (each is its own executable), then
    # net T(2N) - T(N): the difference is exactly N convs and cancels
    # dispatch + tunnel-roundtrip constants. min over repeats rejects
    # host-contention noise.
    float(chain(x, kern, out_dtype, ITERS))
    float(chain(x, kern, out_dtype, 2 * ITERS))
    t1 = t2 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x, kern, out_dtype, ITERS))
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(x, kern, out_dtype, 2 * ITERS))
        t2 = min(t2, time.perf_counter() - t0)
    dt = max(t2 - t1, 1e-9) / ITERS
    flops = 2 * n * h * w * cin * cout * k * k
    return dt * 1e3, flops / dt / 1e12


def main():
    print(f"devices: {jax.devices()}")
    for shape in SHAPES:
        n, h, w, cin, cout, k = shape
        ms_bf, tf_bf = time_one(n, h, w, cin, cout, k, jnp.bfloat16, jnp.float32)
        ms_i8, tf_i8 = time_one(n, h, w, cin, cout, k, jnp.int8, jnp.int32)
        print(f"N{n} {h}x{w} {cin}->{cout} k{k}: "
              f"bf16 {ms_bf:7.3f} ms ({tf_bf:6.1f} TF/s) | "
              f"int8 {ms_i8:7.3f} ms ({tf_i8:6.1f} TOP/s) | "
              f"speedup {ms_bf / ms_i8:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
