"""Jittable on-device augmentation (NHWC, values in [0, 1]).

Parity targets (distributional, not bit-for-bit — SURVEY.md §7 hard parts):
- torchvision ColorJitter(0.5, 0.5, 0.5, 0.25) applied with p=0.5
  (ref data/dataset.py:404-407 and equivalents).
- RandomGrayscale(p=0.2).
- Gaussian blur with sigma ~ U[0.1, 2], p=0.5 (ref blur(), data/dataset.py:120-124).

torchvision ColorJitter semantics reproduced:
- brightness: x * f,  f ~ U[max(0, 1-b), 1+b]
- contrast:   mean = gray(x).mean();  x*f + mean*(1-f)
- saturation: gray = rgb_to_gray(x);  x*f + gray*(1-f)
- hue:        shift hue channel in HSV by h ~ U[-hue, hue]
applied in a random order per call, each factor sampled independently.
The reference samples augmentation *independently per temporal image*
(data/dataset.py:404-411) — callers pass distinct rng keys for A and B.

Everything is pure jnp → runs on-device inside the jitted train step, so
augmentation rides the TPU's VPU instead of host CPU workers (the
reference burns DataLoader worker processes on this).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_GRAY_W = jnp.array([0.299, 0.587, 0.114], jnp.float32)  # torchvision rgb_to_grayscale


def _grayscale(img: jax.Array) -> jax.Array:
    g = jnp.tensordot(img[..., :3], _GRAY_W, axes=[[-1], [0]])
    return g[..., None]


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    mean = jnp.mean(_grayscale(img))
    return jnp.clip(img * factor + mean * (1.0 - factor), 0.0, 1.0)


def adjust_saturation(img, factor):
    gray = _grayscale(img)
    return jnp.clip(img * factor + gray * (1.0 - factor), 0.0, 1.0)


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-8), 0.0)
    dsafe = jnp.maximum(deltac, 1e-8)
    rc = (maxc - r) / dsafe
    gc = (maxc - g) / dsafe
    bc = (maxc - b) / dsafe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(deltac == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(img, shift):
    hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
    return _hsv_to_rgb(hsv)


def color_jitter(key: jax.Array, img: jax.Array, brightness: float = 0.5,
                 contrast: float = 0.5, saturation: float = 0.5,
                 hue: float = 0.25) -> jax.Array:
    """torchvision ColorJitter parity: random order, independent factors."""
    k_order, kb, kc, ks, kh = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    ops = [
        lambda x: adjust_brightness(x, fb),
        lambda x: adjust_contrast(x, fc),
        lambda x: adjust_saturation(x, fs),
        lambda x: adjust_hue(x, fh),
    ]
    perm = jax.random.permutation(k_order, 4)

    def apply_op(x, idx):
        return jax.lax.switch(idx, ops, x), None

    out, _ = jax.lax.scan(apply_op, img, perm)
    return out


def random_grayscale(key: jax.Array, img: jax.Array, p: float = 0.2) -> jax.Array:
    gray = jnp.broadcast_to(_grayscale(img), img.shape)
    return jnp.where(jax.random.uniform(key) < p, gray, img)


def _gaussian_kernel_1d(sigma: jax.Array, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(key: jax.Array, img: jax.Array, p: float = 0.5,
                  sigma_range: Tuple[float, float] = (0.1, 2.0),
                  radius: int = 5) -> jax.Array:
    """PIL GaussianBlur(radius=sigma) approximation: separable Gaussian with
    a fixed-size kernel (static shapes for XLA; radius=5 covers sigma<=2)."""
    k_apply, k_sigma = jax.random.split(key)
    sigma = jax.random.uniform(k_sigma, (), minval=sigma_range[0], maxval=sigma_range[1])
    kern = _gaussian_kernel_1d(sigma, radius)
    c = img.shape[-1]
    x = img[None] if img.ndim == 3 else img
    # separable depthwise conv: vertical then horizontal
    kv = jnp.tile(kern.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    khz = jnp.tile(kern.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    blurred = jax.lax.conv_general_dilated(
        x, kv, (1, 1), [(radius, radius), (0, 0)], dimension_numbers=dn,
        feature_group_count=c)
    blurred = jax.lax.conv_general_dilated(
        blurred, khz, (1, 1), [(0, 0), (radius, radius)], dimension_numbers=dn,
        feature_group_count=c)
    if img.ndim == 3:
        blurred = blurred[0]
    return jnp.where(jax.random.uniform(k_apply) < p, blurred, img)


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize(img: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jax.Array:
    """ImageNet normalization (ref data/dataset.py:129-130)."""
    return (img - mean) / std


@functools.partial(jax.jit, static_argnames=("jitter_p",))
def train_augment(key: jax.Array, img: jax.Array, jitter_p: float = 0.5) -> jax.Array:
    """The reference's train-time pipeline for ONE temporal image
    (ref data/dataset.py:404-411): ColorJitter p=0.5 -> RandomGrayscale
    p=0.2 -> blur p=0.5 -> ImageNet-normalize. Input [0,1] float NHWC or HWC."""
    k1, k1p, k2, k3 = jax.random.split(key, 4)
    jittered = color_jitter(k1, img)
    img = jnp.where(jax.random.uniform(k1p) < jitter_p, jittered, img)
    img = random_grayscale(k2, img)
    img = gaussian_blur(k3, img)
    return normalize(img)


def eval_preprocess(img: jax.Array) -> jax.Array:
    return normalize(img)
