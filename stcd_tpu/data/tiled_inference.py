"""Whole-scene tiled inference, sharded across the device mesh.

The reference handles large rasters by OFFLINE tiling to disk
(split.py:43-46) and processes tiles one by one. TPU-native version:
tile in memory, run the model over tile batches sharded on the mesh's
'data' axis (embarrassingly parallel — SURVEY.md §5 long-context note),
and stitch predictions back, averaging overlaps.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def tile_origins(h: int, w: int, tile: int = 256, stride: int = 256) -> list:
    """Top-left (y, x) corners covering an (h, w) scene. Edge tiles are
    shifted inward so every pixel is covered (unlike split.py, which drops
    the remainder)."""
    ys = list(range(0, max(h - tile, 0) + 1, stride))
    xs = list(range(0, max(w - tile, 0) + 1, stride))
    if ys[-1] + tile < h:
        ys.append(h - tile)
    if xs[-1] + tile < w:
        xs.append(w - tile)
    return [(y, x) for y in ys for x in xs]


def extract_tiles(image: np.ndarray, tile: int = 256, stride: int = 256
                  ) -> Tuple[np.ndarray, list]:
    """(H, W, C) -> (N, tile, tile, C) + origin list (see tile_origins)."""
    origins = tile_origins(image.shape[0], image.shape[1], tile, stride)
    tiles = [image[y:y + tile, x:x + tile] for y, x in origins]
    return np.stack(tiles), origins


def stitch_tiles(tiles: np.ndarray, origins: list, out_hw: Tuple[int, int]
                 ) -> np.ndarray:
    """Average overlapping tile predictions back into (H, W, C)."""
    assert len(tiles) == len(origins), (
        f"{len(tiles)} tile predictions for {len(origins)} origins")
    t = tiles.shape[1]
    c = tiles.shape[-1]
    acc = np.zeros((*out_hw, c), np.float64)
    cnt = np.zeros((*out_hw, 1), np.float64)
    for tile_arr, (y, x) in zip(tiles, origins):
        acc[y:y + t, x:x + t] += tile_arr
        cnt[y:y + t, x:x + t] += 1
    return (acc / np.maximum(cnt, 1)).astype(np.float32)


def predict_scene(predict_fn: Callable, image_a: np.ndarray,
                  image_b: Optional[np.ndarray] = None, tile: int = 256,
                  stride: int = 256, batch: Optional[int] = None,
                  sharding=None) -> np.ndarray:
    """Run ``predict_fn(tiles_a[, tiles_b]) -> probs`` over a whole scene.

    ``batch`` defaults to a multiple of the device count; the final
    short batch is padded (and the padding dropped after).
    """
    tiles_a, origins = extract_tiles(image_a, tile, stride)
    tiles_b = extract_tiles(image_b, tile, stride)[0] if image_b is not None else None
    n = tiles_a.shape[0]
    if batch is None:
        batch = max(len(jax.devices()), 1) * 4
    outs = []
    for i in range(0, n, batch):
        a = tiles_a[i:i + batch]
        b = tiles_b[i:i + batch] if tiles_b is not None else None
        pad = batch - a.shape[0]
        if pad:
            # Full-size zero padding: `a[:pad]` would be short whenever the
            # remainder is smaller than pad, silently dropping tiles.
            zeros = np.zeros((pad,) + a.shape[1:], a.dtype)
            a = np.concatenate([a, zeros])
            if b is not None:
                b = np.concatenate([b, np.zeros((pad,) + b.shape[1:], b.dtype)])
        a_dev = jax.device_put(jnp.asarray(a), sharding)
        if b is not None:
            b_dev = jax.device_put(jnp.asarray(b), sharding)
            pred = predict_fn(a_dev, b_dev)
        else:
            pred = predict_fn(a_dev)
        pred = np.asarray(pred)
        if pad:
            pred = pred[:-pad]
        outs.append(pred)
    return stitch_tiles(np.concatenate(outs), origins, image_a.shape[:2])
