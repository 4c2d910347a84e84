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
from typing import Optional, Tuple

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


def _sample_jitter_params(key: jax.Array, brightness: float = 0.5,
                          contrast: float = 0.5, saturation: float = 0.5,
                          hue: float = 0.25):
    """The ColorJitter random draws (order permutation + four factors)."""
    k_order, kb, kc, ks, kh = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    perm = jax.random.permutation(k_order, 4)
    return perm, fb, fc, fs, fh


def _apply_color_jitter(img, perm, fb, fc, fs, fh):
    ops = [
        lambda x: adjust_brightness(x, fb),
        lambda x: adjust_contrast(x, fc),
        lambda x: adjust_saturation(x, fs),
        lambda x: adjust_hue(x, fh),
    ]

    # lax.scan over the order (becomes a while loop under vmap). Measured
    # on chip: this form costs ~7.8 ms in the bs=64 SegCD step; UNROLLING
    # the 4 slots was tried in round 2 and is SLOWER (~12.8 ms — the
    # unrolled all-branch selects quadruple the hue evaluations without
    # the loop's memory locality), so the scan stays. (The Pallas fused
    # path in stcd_tpu.ops.augment_kernel replaces this entirely on TPU.)
    def apply_op(x, idx):
        return jax.lax.switch(idx, ops, x), None

    out, _ = jax.lax.scan(apply_op, img, perm)
    return out


def color_jitter(key: jax.Array, img: jax.Array, brightness: float = 0.5,
                 contrast: float = 0.5, saturation: float = 0.5,
                 hue: float = 0.25) -> jax.Array:
    """torchvision ColorJitter parity: random order, independent factors."""
    perm, fb, fc, fs, fh = _sample_jitter_params(
        key, brightness, contrast, saturation, hue)
    return _apply_color_jitter(img, perm, fb, fc, fs, fh)


def random_grayscale(key: jax.Array, img: jax.Array, p: float = 0.2) -> jax.Array:
    gray = jnp.broadcast_to(_grayscale(img), img.shape)
    return jnp.where(jax.random.uniform(key) < p, gray, img)


def _gaussian_kernel_1d(sigma: jax.Array, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-3)) ** 2)
    return k / jnp.sum(k)


def _apply_gaussian_blur(img: jax.Array, kern: jax.Array) -> jax.Array:
    """Separable blur by a precomputed (2r+1,) kernel; edge-replicate pad."""
    radius = kern.shape[0] // 2
    c = img.shape[-1]
    x = img[None] if img.ndim == 3 else img
    # separable depthwise conv: vertical then horizontal, VALID over an
    # edge-replicated pad (PIL extends edge pixels; kernel mass must not
    # fall off the image)
    kv = jnp.tile(kern.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    khz = jnp.tile(kern.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    padded = jnp.pad(x, ((0, 0), (radius, radius), (0, 0), (0, 0)), mode="edge")
    blurred = jax.lax.conv_general_dilated(
        padded, kv, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        feature_group_count=c)
    blurred = jnp.pad(blurred, ((0, 0), (0, 0), (radius, radius), (0, 0)),
                      mode="edge")
    blurred = jax.lax.conv_general_dilated(
        blurred, khz, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn,
        feature_group_count=c)
    if img.ndim == 3:
        blurred = blurred[0]
    return blurred


def gaussian_blur(key: jax.Array, img: jax.Array, p: float = 0.5,
                  sigma_range: Tuple[float, float] = (0.1, 2.0),
                  radius: int = 5) -> jax.Array:
    """PIL GaussianBlur(radius=sigma) approximation: separable Gaussian with
    a fixed-size kernel (static shapes for XLA; radius=5 covers sigma<=2).
    Edge-replicate padding matches PIL's edge extension — zero padding
    would darken a radius-wide border on every blurred image."""
    k_apply, k_sigma = jax.random.split(key)
    sigma = jax.random.uniform(k_sigma, (), minval=sigma_range[0], maxval=sigma_range[1])
    kern = _gaussian_kernel_1d(sigma, radius)
    blurred = _apply_gaussian_blur(img, kern)
    return jnp.where(jax.random.uniform(k_apply) < p, blurred, img)


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize(img: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jax.Array:
    """ImageNet normalization (ref data/dataset.py:129-130)."""
    return (img - mean) / std


def to_float01(img: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [0,1]; float inputs pass through. Lets the
    host pipeline ship uint8 (4x less H2D traffic) with the scale fused
    into the jitted step."""
    if jnp.issubdtype(img.dtype, jnp.integer):
        return img.astype(jnp.float32) / 255.0
    return img


def sample_augment_params(key: jax.Array, jitter_p: float,
                          jitter_apply: Optional[jax.Array] = None,
                          blur_radius: int = 5) -> dict:
    """All random draws for one image's train-time pipeline, with the exact
    key-split structure of the fused application paths so the jnp and
    Pallas backends consume identical parameters."""
    k1, k1p, k2, k3 = jax.random.split(key, 4)
    perm, fb, fc, fs, fh = _sample_jitter_params(k1)
    if jitter_apply is None:
        jitter_apply = jax.random.uniform(k1p) < jitter_p
    gray_apply = jax.random.uniform(k2) < 0.2
    k_apply, k_sigma = jax.random.split(k3)
    sigma = jax.random.uniform(k_sigma, (), minval=0.1, maxval=2.0)
    return {
        "perm": perm,
        "factors": jnp.stack([fb, fc, fs, fh]),
        "jitter_apply": jitter_apply,
        "gray_apply": gray_apply,
        "blur_apply": jax.random.uniform(k_apply) < 0.5,
        "blur_kern": _gaussian_kernel_1d(sigma, blur_radius),
    }


def apply_augment_reference(img: jax.Array, p: dict) -> jax.Array:
    """Pure-jnp application of sampled params (HWC). Bit-identical to the
    historical inline pipeline; the golden reference for the Pallas path."""
    f = p["factors"]
    jittered = _apply_color_jitter(img, p["perm"], f[0], f[1], f[2], f[3])
    img = jnp.where(p["jitter_apply"], jittered, img)
    gray = jnp.broadcast_to(_grayscale(img), img.shape)
    img = jnp.where(p["gray_apply"], gray, img)
    img = jnp.where(p["blur_apply"], _apply_gaussian_blur(img, p["blur_kern"]),
                    img)
    return normalize(img)


def _train_augment_single(key: jax.Array, img: jax.Array, jitter_p: float,
                          jitter_apply: Optional[jax.Array] = None) -> jax.Array:
    """One image: ColorJitter gated by its own coin (or by a precomputed
    `jitter_apply` bool when the coin is shared across a temporal pair),
    then per-image grayscale + blur, then normalize."""
    return apply_augment_reference(
        img, sample_augment_params(key, jitter_p, jitter_apply))


# --- backend dispatch -------------------------------------------------------
# "auto" uses the fused Pallas kernel (stcd_tpu.ops.augment_kernel) for
# batched NHWC inputs on TPU — one HBM pass instead of the scan/switch
# chain (~7.8 ms of the bs=64 SegCD step) — and the pure-jnp path
# everywhere else. set_pallas_augment("on"/"off") overrides.
_PALLAS_MODE = "auto"


def set_pallas_augment(mode: str) -> None:
    global _PALLAS_MODE
    assert mode in ("auto", "on", "off"), mode
    _PALLAS_MODE = mode


def _use_pallas(img: jax.Array) -> bool:
    if _PALLAS_MODE == "off":
        return False
    if img.ndim != 4 or img.shape[-1] != 3:
        return False
    if _PALLAS_MODE == "on":
        return True
    # auto: TPU only, whole-image VMEM blocks up to 512x512. Multi-device
    # meshes are fine: the kernel carries a custom_partitioning batch-map
    # rule (ops/augment_kernel.py) so a 'data'-sharded batch stays sharded
    # and each device runs the kernel on its own shard (without the rule a
    # pallas_call is opaque to GSPMD and the batch would be all-gathered
    # and processed fully replicated — pinned by tests/test_augment_pallas).
    return (jax.default_backend() == "tpu"
            and img.shape[1] * img.shape[2] <= 512 * 512)


def _batched_params(keys: jax.Array, jitter_p: float,
                    jitter_apply: Optional[jax.Array] = None) -> dict:
    if jitter_apply is None:
        return jax.vmap(lambda k: sample_augment_params(k, jitter_p))(keys)
    return jax.vmap(
        lambda k, ja: sample_augment_params(k, jitter_p, ja)
    )(keys, jitter_apply)


def _apply_batch(imgs: jax.Array, params: dict, use_pallas: bool) -> jax.Array:
    if use_pallas:
        from stcd_tpu.ops.augment_kernel import apply_augment_batch
        return apply_augment_batch(
            imgs, params, interpret=jax.default_backend() != "tpu")
    return jax.vmap(apply_augment_reference)(to_float01(imgs), params)


@functools.partial(jax.jit, static_argnames=("jitter_p", "use_pallas"))
def _train_augment_impl(key, img, jitter_p, use_pallas):
    if img.ndim == 4:
        keys = jax.random.split(key, img.shape[0])
        return _apply_batch(img, _batched_params(keys, jitter_p), use_pallas)
    return _train_augment_single(key, to_float01(img), jitter_p)


def train_augment(key: jax.Array, img: jax.Array, jitter_p: float = 0.5) -> jax.Array:
    """The reference's train-time pipeline (ref data/dataset.py:404-411):
    ColorJitter p=0.5 -> RandomGrayscale p=0.2 -> blur p=0.5 ->
    ImageNet-normalize. Input [0,1] float (or uint8), HWC or NHWC.

    The reference augments in ``__getitem__`` — every SAMPLE draws its own
    coins/factors. A batched input is therefore vmapped over per-sample
    keys (one shared draw per batch would collapse augmentation diversity
    by the batch size)."""
    return _train_augment_impl(key, img, jitter_p, _use_pallas(img))


def _train_augment_pair_single(key: jax.Array, a: jax.Array, b: jax.Array,
                               jitter_p: float):
    k_shared, ka, kb = jax.random.split(key, 3)
    apply = jax.random.uniform(k_shared) < jitter_p
    return (_train_augment_single(ka, a, jitter_p, apply),
            _train_augment_single(kb, b, jitter_p, apply))


@functools.partial(jax.jit, static_argnames=("jitter_p", "use_pallas"))
def _train_augment_pair_impl(key, a, b, jitter_p, use_pallas):
    if a.ndim == 4:
        keys = jax.random.split(key, a.shape[0])
        k_shared = jax.vmap(lambda k: jax.random.split(k, 3))(keys)
        shared_coin = jax.vmap(
            lambda k: jax.random.uniform(k[0]) < jitter_p)(k_shared)
        pa = _batched_params(k_shared[:, 1], jitter_p, shared_coin)
        pb = _batched_params(k_shared[:, 2], jitter_p, shared_coin)
        n = a.shape[0]
        both = _apply_batch(
            jnp.concatenate([a, b], axis=0),
            jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), pa, pb),
            use_pallas)
        return both[:n], both[n:]
    return _train_augment_pair_single(key, to_float01(a), to_float01(b),
                                      jitter_p)


def train_augment_pair(key: jax.Array, a: jax.Array, b: jax.Array,
                       jitter_p: float = 0.5):
    """Bi-temporal pair augmentation: ONE shared ColorJitter apply-coin
    per pair — the reference jitters both images or neither (independent
    factors, shared gate: ``if random.random() < 0.5:`` then two separate
    ColorJitter calls, ref data/dataset.py:241-243/320-322/405-407), so
    an exactly-one-jittered pair never occurs. Grayscale and blur stay
    per-image (ref :244-247). The stage-3 synthesized pair (CA, CB) uses
    jitter_p=0.8 (ref :354-356/525-527). Inputs [0,1] float (or uint8),
    HWC or NHWC (batched -> per-sample coins via vmap)."""
    return _train_augment_pair_impl(key, a, b, jitter_p, _use_pallas(a))


def eval_preprocess(img: jax.Array) -> jax.Array:
    return normalize(to_float01(img))


# ---------------------------------------------------------------------------
# cutout (ref data/dataset.py:24-57; defined there but call sites commented
# out — provided for API completeness). Jittable, static-shape formulation:
# instead of rejection-sampling a box that fits, the box origin is sampled
# uniformly over the valid range (same marginal distribution over boxes),
# and the erase region is a coordinate-grid mask so shapes stay static.
# ---------------------------------------------------------------------------

def cutout(key: jax.Array, img_a: jax.Array, img_b: jax.Array,
           mask: jax.Array, p: float = 0.5, size_min: float = 0.02,
           size_max: float = 0.4, ratio_1: float = 0.3,
           ratio_2: float = 1 / 0.3, value_min: float = 0.0,
           value_max: float = 1.0, mask_value: float = 1.0):
    """Erase one random rectangle from BOTH temporal images (pixel-level
    random fill) and stamp the label there. Ref fills the uint8 label with
    255 (pre-binarization); here images are [0,1] floats and the label is
    stamped with `mask_value`. Works on HWC or NHWC (one box per call)."""
    h, w = img_a.shape[-3], img_a.shape[-2]
    k_apply, k_size, k_ratio, k_x, k_y, k_fill = jax.random.split(key, 6)
    size = jax.random.uniform(k_size, (), minval=size_min, maxval=size_max) * h * w
    ratio = jax.random.uniform(k_ratio, (), minval=ratio_1, maxval=ratio_2)
    erase_w = jnp.clip(jnp.sqrt(size / ratio), 1.0, w)
    erase_h = jnp.clip(jnp.sqrt(size * ratio), 1.0, h)
    x0 = jax.random.uniform(k_x, ()) * (w - erase_w)
    y0 = jax.random.uniform(k_y, ()) * (h - erase_h)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    inside = ((ys >= y0) & (ys < y0 + erase_h)
              & (xs >= x0) & (xs < x0 + erase_w))
    inside &= jax.random.uniform(k_apply) < p
    box = inside[..., None]
    fill = jax.random.uniform(k_fill, img_a.shape,
                              minval=value_min, maxval=value_max)
    img_a = jnp.where(box, fill, img_a)
    img_b = jnp.where(box, fill, img_b)
    mask = jnp.where(box if mask.ndim == img_a.ndim else inside,
                     jnp.asarray(mask_value, mask.dtype), mask)
    return img_a, img_b, mask


# ---------------------------------------------------------------------------
# Geometric/photometric training pipeline (ref data/dataset.py:78-117
# get_training_augmentation — an albumentations Compose that is defined but
# OFF the live path). Rebuilt as jittable on-device ops with the same
# structure and probabilities: HFlip(0.5) -> ShiftScale(p=1) ->
# GaussNoise(0.2) -> Perspective(0.5) -> OneOf{equalize-stretch,
# brightness-contrast, gamma}(0.9) -> OneOf{sharpen, blur, motion-blur}(0.9)
# -> OneOf{brightness-contrast, hue-saturation}(0.9).
# CLAHE has no static-shape TPU analogue; a global percentile contrast
# stretch stands in for it (documented substitution).
# ---------------------------------------------------------------------------

def _warp(img: jax.Array, matrix: jax.Array, order: int = 1) -> jax.Array:
    """Backward-warp HWC image by a 3x3 homography mapping output pixel
    coords -> source coords; bilinear (order=1) or nearest (order=0),
    zero border (albumentations border_mode=0)."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xs)
    coords = jnp.stack([xs.ravel(), ys.ravel(), ones.ravel()], axis=0)
    src = matrix @ coords
    sx = (src[0] / src[2]).reshape(h, w)
    sy = (src[1] / src[2]).reshape(h, w)
    chans = [jax.scipy.ndimage.map_coordinates(
        img[..., c], [sy, sx], order=order, mode="constant", cval=0.0)
        for c in range(img.shape[-1])]
    return jnp.stack(chans, axis=-1)


def _affine_about_center(h, w, scale, tx, ty):
    """Output->source affine: scale about the image center + translate."""
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    inv_s = 1.0 / scale
    return jnp.array([
        [inv_s, 0.0, cx - inv_s * (cx + tx)],
        [0.0, inv_s, cy - inv_s * (cy + ty)],
        [0.0, 0.0, 1.0],
    ])


def shift_scale(key: jax.Array, img: jax.Array, mask: jax.Array,
                shift_limit: float = 0.1, scale_limit: float = 0.5):
    """ShiftScaleRotate(scale_limit=0.5, rotate_limit=0, shift_limit=0.1)."""
    h, w = img.shape[0], img.shape[1]
    ks, kx, ky = jax.random.split(key, 3)
    scale = 1.0 + jax.random.uniform(ks, (), minval=-scale_limit,
                                     maxval=scale_limit)
    tx = jax.random.uniform(kx, (), minval=-shift_limit, maxval=shift_limit) * w
    ty = jax.random.uniform(ky, (), minval=-shift_limit, maxval=shift_limit) * h
    m = _affine_about_center(h, w, scale, tx, ty)
    return _warp(img, m, order=1), _warp(mask, m, order=0)


def _solve_homography(dst_pts: jax.Array, src_pts: jax.Array) -> jax.Array:
    """3x3 H with H @ [dst,1] ~ [src,1] from 4 point pairs (8x8 solve)."""
    rows = []
    for i in range(4):
        xd, yd = dst_pts[i, 0], dst_pts[i, 1]
        xs_, ys_ = src_pts[i, 0], src_pts[i, 1]
        rows.append(jnp.stack([xd, yd, 1.0, 0.0 * xd, 0.0 * xd, 0.0 * xd,
                               -xs_ * xd, -xs_ * yd]))
        rows.append(jnp.stack([0.0 * xd, 0.0 * xd, 0.0 * xd, xd, yd, 1.0,
                               -ys_ * xd, -ys_ * yd]))
    a = jnp.stack(rows)
    b = jnp.stack([src_pts[i // 2, i % 2] for i in range(8)])
    hvec = jnp.linalg.solve(a, b)
    return jnp.concatenate([hvec, jnp.ones((1,))]).reshape(3, 3)


def perspective(key: jax.Array, img: jax.Array, mask: jax.Array,
                scale: float = 0.05):
    """albumentations Perspective: jitter the 4 corners by U[0, scale]*side."""
    h, w = img.shape[0], img.shape[1]
    corners = jnp.array([[0.0, 0.0], [w - 1.0, 0.0],
                         [w - 1.0, h - 1.0], [0.0, h - 1.0]])
    jitter = jax.random.uniform(key, (4, 2), minval=-scale, maxval=scale)
    src = corners + jitter * jnp.array([w, h])
    m = _solve_homography(corners, src)
    return _warp(img, m, order=1), _warp(mask, m, order=0)


def gauss_noise(key: jax.Array, img: jax.Array,
                var_limit=(10.0 / 255**2, 50.0 / 255**2)) -> jax.Array:
    kv, kn = jax.random.split(key)
    var = jax.random.uniform(kv, (), minval=var_limit[0], maxval=var_limit[1])
    return jnp.clip(img + jnp.sqrt(var) * jax.random.normal(kn, img.shape),
                    0.0, 1.0)


def contrast_stretch(img: jax.Array, lo_pct: float = 2.0,
                     hi_pct: float = 98.0) -> jax.Array:
    """Global percentile contrast stretch — TPU stand-in for CLAHE."""
    lo = jnp.percentile(img, lo_pct)
    hi = jnp.percentile(img, hi_pct)
    return jnp.clip((img - lo) / jnp.maximum(hi - lo, 1e-6), 0.0, 1.0)


def random_brightness_contrast(key: jax.Array, img: jax.Array,
                               brightness_limit: float = 0.2,
                               contrast_limit: float = 0.2) -> jax.Array:
    kb, kc = jax.random.split(key)
    alpha = 1.0 + jax.random.uniform(kc, (), minval=-contrast_limit,
                                     maxval=contrast_limit)
    beta = jax.random.uniform(kb, (), minval=-brightness_limit,
                              maxval=brightness_limit)
    mean = jnp.mean(img)
    return jnp.clip((img - mean) * alpha + mean + beta, 0.0, 1.0)


def random_gamma(key: jax.Array, img: jax.Array,
                 gamma_limit=(80.0, 120.0)) -> jax.Array:
    gamma = jax.random.uniform(key, (), minval=gamma_limit[0],
                               maxval=gamma_limit[1]) / 100.0
    return jnp.clip(jnp.maximum(img, 1e-8) ** gamma, 0.0, 1.0)


def _conv3x3(img: jax.Array, kern: jax.Array) -> jax.Array:
    c = img.shape[-1]
    x = img[None]
    k = jnp.tile(kern.reshape(3, 3, 1, 1), (1, 1, 1, c)).astype(jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, (3, 3, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                       dimension_numbers=dn,
                                       feature_group_count=c)
    return out[0]


def sharpen(key: jax.Array, img: jax.Array, alpha=(0.2, 0.5)) -> jax.Array:
    a = jax.random.uniform(key, (), minval=alpha[0], maxval=alpha[1])
    lap = jnp.array([[-1.0, -1, -1], [-1, 9, -1], [-1, -1, -1]]) / 1.0
    sharp = _conv3x3(img, lap)
    return jnp.clip((1 - a) * img + a * sharp, 0.0, 1.0)


def box_blur(img: jax.Array) -> jax.Array:
    return _conv3x3(img, jnp.full((3, 3), 1.0 / 9.0))


def motion_blur(key: jax.Array, img: jax.Array) -> jax.Array:
    """3x3 motion blur: random direction among horizontal/vertical/2 diagonals."""
    kerns = jnp.stack([
        jnp.array([[0.0, 0, 0], [1, 1, 1], [0, 0, 0]]) / 3.0,
        jnp.array([[0.0, 1, 0], [0, 1, 0], [0, 1, 0]]) / 3.0,
        jnp.eye(3) / 3.0,
        jnp.fliplr(jnp.eye(3)) / 3.0,
    ])
    idx = jax.random.randint(key, (), 0, 4)
    return _conv3x3(img, kerns[idx])


def hue_saturation_value(key: jax.Array, img: jax.Array,
                         hue_shift: float = 20.0, sat_shift: float = 30.0,
                         val_shift: float = 20.0) -> jax.Array:
    kh, ks, kv = jax.random.split(key, 3)
    hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    # albumentations shifts the cv2 uint8 H channel, whose range is
    # [0, 180) — a hue_shift of 20 is 20/180 of the hue circle, not 20/360
    h = (hsv[..., 0] + jax.random.uniform(
        kh, (), minval=-hue_shift, maxval=hue_shift) / 180.0) % 1.0
    s = jnp.clip(hsv[..., 1] + jax.random.uniform(
        ks, (), minval=-sat_shift, maxval=sat_shift) / 255.0, 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] + jax.random.uniform(
        kv, (), minval=-val_shift, maxval=val_shift) / 255.0, 0.0, 1.0)
    return _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def _one_of(key: jax.Array, branches, x, p: float):
    k_apply, k_pick = jax.random.split(key)
    picked = jax.lax.switch(jax.random.randint(k_pick, (), 0, len(branches)),
                            branches, x)
    return jnp.where(jax.random.uniform(k_apply) < p, picked, x)


def get_training_augmentation(shift_limit: float = 0.1,
                              scale_limit: float = 0.5,
                              noise_p: float = 0.2,
                              perspective_p: float = 0.5,
                              one_of_p: float = 0.9):
    """Jittable equivalent of the reference's albumentations pipeline
    (data/dataset.py:78-117). Returns fn(key, img_hwc, mask_hwc) ->
    (img, mask); same op structure and probabilities, on-device."""

    def apply(key: jax.Array, img: jax.Array, mask: jax.Array):
        keys = jax.random.split(key, 10)
        # HorizontalFlip p=0.5
        flip = jax.random.uniform(keys[0]) < 0.5
        img = jnp.where(flip, img[:, ::-1], img)
        mask = jnp.where(flip, mask[:, ::-1], mask)
        # ShiftScaleRotate(rotate_limit=0) p=1
        img, mask = shift_scale(keys[1], img, mask, shift_limit, scale_limit)
        # GaussNoise p=0.2
        noised = gauss_noise(keys[2], img)
        img = jnp.where(jax.random.uniform(keys[3]) < noise_p, noised, img)
        # Perspective p=0.5
        pimg, pmask = perspective(keys[4], img, mask)
        persp = jax.random.uniform(keys[5]) < perspective_p
        img = jnp.where(persp, pimg, img)
        mask = jnp.where(persp, pmask, mask)
        # OneOf {contrast-stretch (CLAHE stand-in), brightness-contrast, gamma}
        k6a, k6b = jax.random.split(keys[6])
        img = _one_of(k6a, [
            lambda x: contrast_stretch(x),
            lambda x: random_brightness_contrast(k6b, x),
            lambda x: random_gamma(k6b, x),
        ], img, one_of_p)
        # OneOf {sharpen, blur, motion-blur}
        k7a, k7b = jax.random.split(keys[7])
        img = _one_of(k7a, [
            lambda x: sharpen(k7b, x),
            lambda x: box_blur(x),
            lambda x: motion_blur(k7b, x),
        ], img, one_of_p)
        # OneOf {brightness-contrast, hue-saturation}
        k8a, k8b = jax.random.split(keys[8])
        img = _one_of(k8a, [
            lambda x: random_brightness_contrast(k8b, x),
            lambda x: hue_saturation_value(k8b, x),
        ], img, one_of_p)
        return img, mask

    return apply
