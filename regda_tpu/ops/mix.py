"""Batch-mixing augmentations: ClassMix / CutMix / Mixup.

Parity targets (available-but-unused helpers in the reference, kept for
inventory completeness — SURVEY.md §2.3):
  - classmix: regda/utils/classmix.py:17-53
  - cutmix / cutmix2: regda/utils/cutmix.py:15-53
  - mixup: regda/utils/tools.py:155-170

TPU-first notes: the reference's numpy box sampling + dynamic tensor slicing
would force recompilation per box under jit. Here every mix is expressed as a
static-shape mask select (`jnp.where`) driven by an explicit PRNG key, so a
whole mixing stage fuses into the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def classmix(rng: jax.Array,
             data_s: jnp.ndarray, targets_s: jnp.ndarray,
             data_t: jnp.ndarray, targets_t: jnp.ndarray,
             ratio: float = 0.5, class_num: int = 7,
             ignore_label: int = -1):
    """Paste a random half of the source classes onto the target batch.

    Args:
      data_s/data_t: (B, H, W, C) images.   targets_s/targets_t: (B, H, W) ids.
    Returns: (data_s, targets_s, data_t_mixed, targets_t_mixed).
    """
    n_mix = int(class_num * ratio)
    perm = jax.random.permutation(rng, class_num)
    chosen = jnp.zeros((class_num,), bool).at[perm[:n_mix]].set(True)
    valid = (targets_s >= 0) & (targets_s != ignore_label)
    cond = jnp.where(valid, chosen[jnp.clip(targets_s, 0, class_num - 1)], False)
    targets_t = jnp.where(cond, targets_s, targets_t)
    data_t = jnp.where(cond[..., None], data_s, data_t)
    return data_s, targets_s, data_t, targets_t


def _box_mask(rng: jax.Array, h: int, w: int, alpha: float) -> jnp.ndarray:
    """(H, W) bool mask of a random box covering ~(1-lam) of the image, with
    lam ~ Beta(alpha, alpha) and a uniformly random center."""
    k_lam, k_cx, k_cy = jax.random.split(rng, 3)
    lam = jax.random.beta(k_lam, alpha, alpha)
    cx = jax.random.uniform(k_cx, (), minval=0.0, maxval=float(w))
    cy = jax.random.uniform(k_cy, (), minval=0.0, maxval=float(h))
    bw = w * jnp.sqrt(1.0 - lam)
    bh = h * jnp.sqrt(1.0 - lam)
    x0, x1 = jnp.round(cx - bw / 2), jnp.round(cx + bw / 2)
    y0, y1 = jnp.round(cy - bh / 2), jnp.round(cy + bh / 2)
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    return (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)


def cutmix(rng: jax.Array,
           data_s: jnp.ndarray, targets_s: jnp.ndarray,
           data_t: jnp.ndarray, targets_t: jnp.ndarray,
           alpha: float = 1.0):
    """Paste one shared random source box onto every target image."""
    h, w = data_s.shape[1:3]
    box = _box_mask(rng, h, w, alpha)
    data_t = jnp.where(box[None, :, :, None], data_s, data_t)
    targets_t = jnp.where(box[None, :, :], targets_s, targets_t)
    return data_s, targets_s, data_t, targets_t


def cutmix2(rng: jax.Array, data: jnp.ndarray, targets: jnp.ndarray,
            alpha: float = 1.0):
    """In-batch CutMix: paste a box from a shuffled copy of the batch."""
    k_perm, k_box = jax.random.split(rng)
    idx = jax.random.permutation(k_perm, data.shape[0])
    h, w = data.shape[1:3]
    box = _box_mask(k_box, h, w, alpha)
    data = jnp.where(box[None, :, :, None], data[idx], data)
    targets = jnp.where(box[None, :, :], targets[idx], targets)
    return data, targets


def mixup(rng: jax.Array,
          s_img: jnp.ndarray, s_lab: jnp.ndarray,
          t_img: jnp.ndarray, t_lab: jnp.ndarray,
          alpha: float = 0.2):
    """Row-cut mixup: swap the top lam-fraction of rows between the source
    batch and a shuffled target batch (hard labels, not blended)."""
    k_perm, k_lam = jax.random.split(rng)
    h = s_img.shape[1]
    idx = jax.random.permutation(k_perm, t_img.shape[0])
    lam_rows = jnp.floor(jax.random.beta(k_lam, alpha, alpha) * h)
    top = jnp.arange(h)[:, None] < lam_rows      # (H, 1) row mask
    t_img_p, t_lab_p = t_img[idx], t_lab[idx]
    new_s_img = jnp.where(top[None, :, :, None], s_img, t_img_p)
    new_s_lab = jnp.where(top[None, :, :], s_lab, t_lab_p)
    new_t_img = jnp.where(top[None, :, :, None], t_img_p, s_img)
    new_t_lab = jnp.where(top[None, :, :], t_lab_p, s_lab)
    return new_s_img, new_s_lab, new_t_img, new_t_lab
