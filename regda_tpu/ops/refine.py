"""Multi-view pseudo-label refinement (MPC in the reference).

Parity target: regda/gast/alignment.py:194-265 (`Aligner.label_refine`,
mode='all' as used by train_align_reg.py:169 and train_ssl_reg.py:214; the
superpixel branch is never exercised by the regda tools — label_t_sup=None).

Soft pseudo-labels are re-weighted by two detached views and renormalized:
  (p) prototype view: inverse Pearson distance of stride-16 features to the
      class prototypes, upsampled (align_corners) to label resolution,
      softmax(T=1), divided by its per-pixel max;
  (l) prediction view: per-head logits upsampled, softmax(T=temp), averaged
      across heads, divided by its per-pixel max.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from regda_tpu.ops.prototypes import pearson_dist
from regda_tpu.ops.resize import resize_bilinear_align_corners

EPS = 1e-7


def _norm_by_max(w: jnp.ndarray) -> jnp.ndarray:
    return w / (w.max(axis=-1, keepdims=True) + EPS)


def prototype_weight(feat: jnp.ndarray, prototypes: jnp.ndarray,
                     out_hw: tuple[int, int]) -> jnp.ndarray:
    """(B, h, w, K) stride-16 features -> (B, H, W, C) prototype-view weight."""
    b, h, w, k = feat.shape
    simi = 1.0 / pearson_dist(feat.reshape(-1, k), prototypes)      # (bhw, C)
    simi = simi.reshape(b, h, w, -1)
    simi = resize_bilinear_align_corners(simi, out_hw)              # (B, H, W, C)
    wgt = jax.nn.softmax(simi, axis=-1)
    return _norm_by_max(wgt)


def prediction_weight(preds: Sequence[jnp.ndarray], out_hw: tuple[int, int],
                      temp: float = 2.0) -> jnp.ndarray:
    """Per-head logits (B, h, w, C) -> (B, H, W, C) prediction-view weight."""
    ws = []
    for p in preds:
        x = resize_bilinear_align_corners(p, out_hw)
        ws.append(jax.nn.softmax(x / temp, axis=-1))
    wgt = sum(ws) / len(ws)
    return _norm_by_max(wgt)


def label_refine(feat: jnp.ndarray, preds: Sequence[jnp.ndarray],
                 label_soft: jnp.ndarray, prototypes: jnp.ndarray,
                 mode: str = 'all', temp: float = 2.0) -> jnp.ndarray:
    """Refine soft pseudo-labels (B, H, W, C); returns renormalized (B, H, W, C).

    All weights are stop-gradiented, matching the reference's .detach().
    """
    assert mode in ('all', 'p', 'l')
    out_hw = label_soft.shape[1:3]
    weight = 0.0
    if mode in ('all', 'p'):
        weight = weight + prototype_weight(feat, prototypes, out_hw)
    if mode in ('all', 'l'):
        weight = weight + prediction_weight(preds, out_hw, temp)
    weight = jax.lax.stop_gradient(weight)
    refined = weight * label_soft
    return refined / (refined.sum(axis=-1, keepdims=True) + EPS)
