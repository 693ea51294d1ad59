"""Online pseudo-label selection by per-class adaptive thresholds.

Parity target: regda/gast/pseudo_generation.py:59-93 (`pseudo_selection`).

Given softmaxed probabilities, a pixel gets the label of the single class
whose probability exceeds max(class_max * cutoff_top, cutoff_low); pixels
where zero or >1 classes exceed their thresholds are ignored.
"""

from __future__ import annotations

import jax.numpy as jnp


def pseudo_selection(probs: jnp.ndarray, cutoff_top: float = 0.8,
                     cutoff_low: float = 0.6, ignore_label: int = -1) -> jnp.ndarray:
    """probs: (B, H, W, C) softmaxed. Returns (B, H, W) int32 hard labels."""
    assert probs.ndim == 4
    b, h, w, c = probs.shape
    p = probs.reshape(b, h * w, c)
    # per-(image, class) max over pixels, scaled, floored at cutoff_low
    class_max = p.max(axis=1, keepdims=True) * cutoff_top          # (B,1,C)
    class_thr = jnp.maximum(class_max, cutoff_low)                 # (B,1,C)
    passed = p > class_thr                                         # (B,HW,C)
    n_passed = passed.sum(axis=-1)                                 # (B,HW)
    hard = jnp.argmax(passed, axis=-1).astype(jnp.int32)           # (B,HW)
    hard = jnp.where(n_passed == 1, hard, ignore_label)
    return hard.reshape(b, h, w)


def pseudo_selection1(probs: jnp.ndarray, cutoff_top: float = 0.8,
                      cutoff_low: float = 0.6,
                      ignore_label: int = -1) -> jnp.ndarray:
    """Argmax-class variant (reference pseudo_generation.py:24-56): take the
    per-pixel max class, then drop pixels whose top probability is below
    that class's threshold max(class_max * cutoff_top, cutoff_low).

    probs: (B, H, W, C) softmaxed. Returns (B, H, W) int32 hard labels.
    """
    assert probs.ndim == 4
    b, h, w, c = probs.shape
    p = probs.reshape(b, h * w, c)
    class_thr = jnp.maximum(p.max(axis=1, keepdims=True) * cutoff_top,
                            cutoff_low)                             # (B,1,C)
    top = p.max(axis=-1)                                            # (B,HW)
    hard = p.argmax(axis=-1).astype(jnp.int32)                      # (B,HW)
    pix_thr = jnp.take_along_axis(
        jnp.broadcast_to(class_thr, (b, h * w, c)), hard[..., None],
        axis=-1)[..., 0]
    hard = jnp.where(top < pix_thr, ignore_label, hard)
    return hard.reshape(b, h, w)
