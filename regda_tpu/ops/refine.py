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


def superpixel_weight(label_soft: jnp.ndarray, sup_ids: jnp.ndarray,
                      num_sup: int, temp: float = 2.0):
    """Superpixel view (alignment.py:239-258): per-superpixel max of the
    soft label per class, gathered back to pixels, temp-softmaxed and
    max-normalized. Pixels whose id equals the batch max id are "ignored"
    (the edge-shrink fill id).

    Args:
      label_soft: (B, H, W, C). sup_ids: (B, H, W) int32 in [0, num_sup).
      num_sup: static superpixel-count bound.
    Returns: (weight (B, H, W, C), ignored (B, H, W, 1) bool).
    """
    b, h, w, c = label_soft.shape
    flat_ids = sup_ids.reshape(b, h * w)
    flat = label_soft.reshape(b, h * w, c)
    seg_max = jax.vmap(
        lambda v, i: jax.ops.segment_max(v, i, num_segments=num_sup))(
        flat, flat_ids)                                          # (B, S, C)
    prob_pixel = jnp.take_along_axis(
        seg_max, flat_ids[..., None], axis=1).reshape(b, h, w, c)
    wgt = jax.nn.softmax(prob_pixel / temp, axis=-1)
    wgt = _norm_by_max(wgt)
    ignored = (sup_ids == sup_ids.max())[..., None]
    return wgt, ignored


def label_refine(feat: jnp.ndarray, preds: Sequence[jnp.ndarray],
                 label_soft: jnp.ndarray, prototypes: jnp.ndarray,
                 mode: str = 'all', temp: float = 2.0,
                 sup_ids: jnp.ndarray | None = None,
                 num_sup: int | None = None) -> jnp.ndarray:
    """Refine soft pseudo-labels (B, H, W, C); returns renormalized (B, H, W, C).

    All weights are stop-gradiented, matching the reference's .detach().
    The superpixel view applies when `sup_ids` is given and mode is
    'all'/'s' (the regda tools never pass it — alignment.py:169 note).
    """
    assert mode in ('all', 'p', 'l', 's')
    out_hw = label_soft.shape[1:3]
    weight = 0.0
    if mode in ('all', 'p'):
        weight = weight + prototype_weight(feat, prototypes, out_hw)
    if mode in ('all', 'l'):
        weight = weight + prediction_weight(preds, out_hw, temp)
    if sup_ids is not None and mode in ('all', 's'):
        # num_sup must be a static bound: deriving it from sup_ids.max()
        # would concretize a tracer under jit
        assert num_sup is not None, \
            'label_refine: pass a static num_sup with sup_ids'
        sup_w, ignored = superpixel_weight(label_soft, sup_ids, num_sup,
                                           temp)
        if mode == 'all':
            weight = jnp.where(ignored, weight, weight * sup_w)
        else:
            weight = jnp.where(ignored, jnp.ones_like(sup_w), sup_w)
    if isinstance(weight, float):                    # mode had no views
        return label_soft
    weight = jax.lax.stop_gradient(weight)
    refined = weight * label_soft
    return refined / (refined.sum(axis=-1, keepdims=True) + EPS)
