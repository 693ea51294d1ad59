"""Sliding-window inference with count-normalized probability accumulation.

Parity target: regda/utils/tools.py:61-97 (`pre_slide`): 512-pixel tiles,
50% overlap, end-aligned edge tiles, per-tile eval forward (softmax-averaged
dual heads), sum of probabilities divided by visit counts.

TPU-first: the reference runs a Python double loop of single-tile model
calls. Here the (statically known) tile grid is extracted into one batched
model call — grid positions are trace-time constants, so the gather/scatter
unrolls into fused slices with no dynamic shapes, and the model sees a
(B*T)-sized batch that keeps the MXU saturated.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from regda_tpu.ops.tta import tta_apply


def tile_positions(h: int, w: int, tile: int, stride: int) -> list[tuple[int, int]]:
    rows = int(math.ceil(max(h - tile, 0) / stride) + 1)
    cols = int(math.ceil(max(w - tile, 0) / stride) + 1)
    pos = []
    for r in range(rows):
        for c in range(cols):
            y2 = min(r * stride + tile, h)
            x2 = min(c * stride + tile, w)
            y1 = max(y2 - tile, 0)
            x1 = max(x2 - tile, 0)
            pos.append((y1, x1))
    return pos


def slide_inference(apply_fn, image: jnp.ndarray, num_classes: int,
                    tile: int = 512, stride: int = 256,
                    tta: bool = False) -> jnp.ndarray:
    """apply_fn: (N,tile,tile,3)->(N,tile,tile,C) probs. image: (B,H,W,3).

    Returns (B, H, W, C) count-normalized probabilities.
    """
    b, h, w, _ = image.shape
    pad_h, pad_w = max(tile - h, 0), max(tile - w, 0)
    if pad_h or pad_w:
        image = jnp.pad(image, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
    else:
        hp, wp = h, w
    pos = tile_positions(hp, wp, tile, stride)

    tiles = jnp.concatenate(
        [image[:, y:y + tile, x:x + tile] for y, x in pos], axis=0)
    probs = tta_apply(apply_fn, tiles) if tta else apply_fn(tiles)

    full = jnp.zeros((b, hp, wp, num_classes), probs.dtype)
    count = jnp.zeros((1, hp, wp, 1), probs.dtype)
    for i, (y, x) in enumerate(pos):
        full = full.at[:, y:y + tile, x:x + tile].add(probs[i * b:(i + 1) * b])
        count = count.at[:, y:y + tile, x:x + tile].add(1.0)
    full = full / count
    return full[:, :h, :w]
