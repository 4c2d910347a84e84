"""A/B: ResNet stem conv1 (7x7/s2, C_in=3) vs space-to-depth rewrite, on chip.

The first conv of every ImageNet-style backbone contracts only 3 input
channels — the MXU's 128-deep reduction dimension runs ~2% occupied, and
the stride-2 window re-reads the full-res input. The classic TPU fix
(MLPerf ResNet): fold 2x2 spatial blocks into channels (space-to-depth)
and run an EXACT 4x4 stride-1 conv with C_in=12 over the half-res image.

Derivation (exact): with u = 2a + di - 1 (a in [0,4), di in {0,1}),
  out[p,q,f] = sum_{u,v,c} W[u,v,c,f] x[2p+u-3, 2q+v-3, c]
             = sum_{a,b,di,dj,c} Wp[2a+di, 2b+dj, c, f] xs[p+a-2, q+b-2, (di,dj,c)]
where Wp is W zero-padded from 7x7 to 8x8 at the TOP-LEFT and
xs = space_to_depth(x, 2) with channel order (di, dj, c). The padding of
the folded conv is (2,1)x(2,1).

This times conv-forward + kernel-gradient (the input is data — no input
grad in training) for both forms at the SegCD bs=64 folded-Siamese batch
(2N = 128 images, 256^2), plus the BIT 256^2 bs=64 case.
"""

import json
import time

import jax
import jax.numpy as jnp

DN = ("NHWC", "HWIO", "NHWC")


def stem_ref(x, k7):
    return jax.lax.conv_general_dilated(
        x, k7, window_strides=(2, 2), padding=((3, 3), (3, 3)),
        dimension_numbers=DN)


def fold_kernel(k7):
    """(7,7,C,F) -> the exact (4,4,4C,F) kernel for the s2d input."""
    c, f = k7.shape[2], k7.shape[3]
    kp = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
    kp = kp.reshape(4, 2, 4, 2, c, f).transpose(0, 2, 1, 3, 4, 5)
    return kp.reshape(4, 4, 4 * c, f)


def space_to_depth(x):
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def stem_s2d(x, k7):
    return jax.lax.conv_general_dilated(
        space_to_depth(x), fold_kernel(k7), window_strides=(1, 1),
        padding=((2, 1), (2, 1)), dimension_numbers=DN)


def check_exact():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    k7 = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 64), jnp.float32)
    a = jax.jit(stem_ref)(x, k7)
    b = jax.jit(stem_s2d)(x, k7)
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
    assert err < 1e-5, err
    return err


def timed(fn, x, k7, iters=30):
    @jax.jit
    def step(x, k7):
        def loss(k7):
            return jnp.sum(fn(x, k7) ** 2)
        return jax.grad(loss)(k7)

    g = step(x, k7)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(x, k7)
    jax.block_until_ready(g)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    print(json.dumps({"exactness_rel_err": check_exact()}), flush=True)
    for name, batch, size in [("segcd_fold2N", 128, 256), ("bs64", 64, 256),
                              ("bs64_512", 16, 512)]:
        x = jax.random.normal(jax.random.PRNGKey(2), (batch, size, size, 3),
                              jnp.bfloat16)
        k7 = jax.random.normal(jax.random.PRNGKey(3), (7, 7, 3, 64),
                               jnp.bfloat16)
        mr = timed(stem_ref, x, k7)
        ms = timed(stem_s2d, x, k7)
        print(json.dumps({"case": name, "batch": batch, "size": size,
                          "ref_ms": round(mr, 3), "s2d_ms": round(ms, 3),
                          "speedup": round(mr / ms, 3)}), flush=True)


if __name__ == "__main__":
    main()
