"""Class-aware feature whitening loss.

Parity target: regda/gast/class_ware_whiten.py:14-65 (`ClassWareWhitening`,
exposed via `Aligner.whiten_class_ware`, unused by the regda tools). Golden
value: the reference's embedded 1x4x6x1 example evaluates to 12.4375
(class_ware_whiten.py:68-80).

For each class id and each channel group, compute the covariance of the
class-masked (zero-filled) feature vectors and penalize its MSE distance to
identity. The reference's per-class Python loop over `class_ids` maps to a
vmap over a stacked mask tensor so that XLA sees one batched matmul chain
(MXU-friendly) instead of C small ones.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def masked_covariance(feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Covariance of masked feature rows (zeros outside the mask kept in the
    product, matching the reference's zero-fill semantics).

    Args:
      feats: (N, K) flattened feature rows.
      mask:  (N,) 0/1 float mask.
    Returns: (K, K) covariance; identity when the mask selects <= 1 element.
    """
    k = feats.shape[-1]
    num = mask.sum()
    x_masked = feats * mask[:, None]
    x_centered = x_masked - x_masked.sum(axis=0, keepdims=True) * mask[:, None] / jnp.maximum(num, 1.0)
    cov = x_centered.T @ x_centered / jnp.maximum(num - 1.0, 1.0)
    return jnp.where(num > 1, cov, jnp.eye(k, dtype=feats.dtype))


def class_ware_whitening(feats: jnp.ndarray, labels: jnp.ndarray,
                         class_ids: Sequence[int], groups: int = 1) -> jnp.ndarray:
    """Sum over classes and channel groups of ||cov - I||^2_mse.

    Args:
      feats: (B, H, W, K) encoder features (NHWC; reference uses NCHW).
      labels: (B, H, W) int ids (GT or pseudo).
      class_ids: classes to whiten.
      groups: channel group count; K % groups == 0.
    """
    b, h, w, k = feats.shape
    assert k % groups == 0, "channels must divide into groups"
    step = k // groups
    flat = feats.reshape(-1, k)
    lab = labels.reshape(-1)
    masks = jnp.stack([(lab == c).astype(feats.dtype) for c in class_ids])  # (C, N)
    grouped = jnp.stack([flat[:, g * step:(g + 1) * step] for g in range(groups)])  # (G, N, step)

    def per_class(mask):
        def per_group(fg):
            cov = masked_covariance(fg, mask)
            return jnp.mean((cov - jnp.eye(step, dtype=fg.dtype)) ** 2)
        return jax.vmap(per_group)(grouped).sum()

    return jax.vmap(per_class)(masks).sum()
