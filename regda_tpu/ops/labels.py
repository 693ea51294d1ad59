"""Label helpers: ignore-aware one-hot and label downscaling.

Behavioral parity targets (reference, StuLiu/RegDA):
  - one_hot_ignore:  regda/gast/alignment.py:440-453 (`Aligner._index2onehot`)
  - downscale_label: regda/gast/alignment.py:456-481 (`DownscaleLabel`)

TPU-first notes: everything is channel-last, shape-static, and expressed as
reshape/reduce so XLA fuses it into the surrounding step. The 16x avg-pool in
`downscale_label` is a reshape-mean (no reduce_window needed since the scale
factor divides the tile size).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def one_hot_ignore(label: jax.Array, num_classes: int, ignore_label: int = -1,
                   dtype=jnp.float32) -> jax.Array:
    """One-hot encode integer labels; `ignore_label` pixels become all-zero rows.

    Args:
      label: int array, any shape (...,).
      num_classes: C.
    Returns:
      (..., C) array; rows for ignored pixels are all zeros.
    """
    lbl = jnp.where(label == ignore_label, num_classes, label)
    # one_hot with C+1 classes then drop the ignore bucket => all-zero row.
    return jax.nn.one_hot(lbl, num_classes + 1, dtype=dtype)[..., :-1]


def downscale_label(label: jax.Array, scale_factor: int = 16,
                    num_classes: int = 6, ignore_label: int = -1,
                    min_ratio: float = 0.75) -> jax.Array:
    """Downscale a (B, H, W) hard label map to (B, H/s, W/s) by majority vote.

    A low-res pixel becomes `ignore_label` when either (a) the winning bucket
    is the ignore bucket, or (b) the winning class covers < `min_ratio` of the
    s*s window.
    """
    assert label.ndim == 3, label.shape
    b, h, w = label.shape
    s = scale_factor
    assert h % s == 0 and w % s == 0, (label.shape, s)
    lbl = jnp.where(label == ignore_label, num_classes, label)
    onehot = jax.nn.one_hot(lbl, num_classes + 1, dtype=jnp.float32)  # (B,H,W,C+1)
    # avg-pool s*s via reshape-mean (XLA fuses this into one reduce).
    pooled = onehot.reshape(b, h // s, s, w // s, s, num_classes + 1).mean(axis=(2, 4))
    max_ratio = pooled.max(axis=-1)
    out = jnp.argmax(pooled, axis=-1).astype(jnp.int32)
    out = jnp.where(out == num_classes, ignore_label, out)
    out = jnp.where(max_ratio < min_ratio, ignore_label, out)
    return out
