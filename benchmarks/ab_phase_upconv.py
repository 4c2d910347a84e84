"""A/B: dilated up-conv vs 4-phase (subpixel) decomposition, on chip.

The fused decoder block computes conv3x3(cat(up2x(x), skip)) as a 4x4
kernel over the zero-dilated input (lhs_dilation=2 — XLA's transposed-
conv path, stcd_tpu/decoders/unet.py). If XLA:TPU executes that densely,
75% of the MACs hit structural zeros (XLA's own FLOP count does count
them — docs/DESIGN.md notes transposed convs are overcounted). The exact
alternative: the output's 4 interleaved phases are four INDEPENDENT 2x2
convs over the un-dilated input,

    out[2i+di, 2j+dj] = conv2x2(x, k4[di::2, dj::2], pad=(1-di,di)x(1-dj,dj))

followed by one interleave (reshape/transpose). 4x fewer MACs if the
dense path really is dense. This script times forward+backward of the
up-conv alone for each SegCD(resnet50) decoder block shape, both forms.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

DN = ("NHWC", "HWIO", "NHWC")

# (in_x, H_in, out_ch) per decoder block, bs=64 SegCD resnet50 @256
SHAPES = [
    ("block0", 2048, 8, 256),
    ("block1", 256, 16, 128),
    ("block2", 128, 32, 64),
    ("block3", 64, 64, 32),
    ("block4", 32, 128, 16),
]
BATCH = 64


def dilated(x, k4):
    return jax.lax.conv_general_dilated(
        x, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=DN)


def phase(x, k4):
    n, h, w, _ = x.shape
    outs = []
    for di in (0, 1):
        for dj in (0, 1):
            kk = k4[di::2, dj::2]
            y = jax.lax.conv_general_dilated(
                x, kk, window_strides=(1, 1),
                padding=((1 - di, di), (1 - dj, dj)),
                dimension_numbers=DN)
            outs.append(y)
    c = outs[0].shape[-1]
    y = jnp.stack(outs, axis=3)  # (N, H, W, 4, C): order (di,dj)=00,01,10,11
    y = y.reshape(n, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, 2 * h, 2 * w, c)


def check_exact():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 32), jnp.float32)
    k4 = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 16), jnp.float32)
    a = jax.jit(dilated)(x, k4)
    b = jax.jit(phase)(x, k4)
    err = float(jnp.max(jnp.abs(a - b)))
    assert err < 1e-4, err
    return err


def timed(fn, x, k4, iters=30):
    @jax.jit
    def step(x, k4):
        def loss(k4):
            return jnp.sum(fn(x, k4) ** 2)
        return jax.grad(loss)(k4)

    g = step(x, k4)
    float(jnp.sum(g))
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(x, k4)
    float(jnp.sum(g))
    return (time.perf_counter() - t0) / iters * 1000


def main():
    print(json.dumps({"exactness_max_abs_err": check_exact()}), flush=True)
    for name, cin, h, cout in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(2), (BATCH, h, h, cin),
                              jnp.bfloat16)
        k4 = jax.random.normal(jax.random.PRNGKey(3), (4, 4, cin, cout),
                               jnp.bfloat16)
        md = timed(dilated, x, k4)
        mp = timed(phase, x, k4)
        print(json.dumps({"shape": name, "cin": cin, "h_in": h, "cout": cout,
                          "dilated_ms": round(md, 3), "phase_ms": round(mp, 3),
                          "speedup": round(md / mp, 3)}), flush=True)


if __name__ == "__main__":
    main()
