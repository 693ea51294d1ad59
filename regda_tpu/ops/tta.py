"""Dihedral test-time augmentation inside jit.

Parity target: regda/utils/tools.py:132-152 (`tta_predict` with ttach
HorizontalFlip x Rotate90[0,90,180,270] = the 8-element dihedral group),
averaging the de-augmented probability maps.

TPU-first: instead of 8 sequential model calls, the 8 variants are stacked
into the batch dimension so the model runs once at 8x batch (keeps the MXU
busy; flips/rots are free layout ops fused by XLA).
"""

from __future__ import annotations

import jax.numpy as jnp

# (hflip, k-rot90) for the 8 dihedral elements
_DIHEDRAL = [(False, 0), (False, 1), (False, 2), (False, 3),
             (True, 0), (True, 1), (True, 2), (True, 3)]


def _aug(x: jnp.ndarray, hflip: bool, k: int) -> jnp.ndarray:
    if hflip:
        x = jnp.flip(x, axis=2)
    if k:
        x = jnp.rot90(x, k=k, axes=(1, 2))
    return x


def _deaug(x: jnp.ndarray, hflip: bool, k: int) -> jnp.ndarray:
    if k:
        x = jnp.rot90(x, k=-k, axes=(1, 2))
    if hflip:
        x = jnp.flip(x, axis=2)
    return x


def tta_apply(apply_fn, image: jnp.ndarray) -> jnp.ndarray:
    """apply_fn: (N,H,W,3) -> (N,H,W,C) probs. Returns TTA-averaged probs."""
    b = image.shape[0]
    variants = jnp.concatenate([_aug(image, f, k) for f, k in _DIHEDRAL], axis=0)
    probs = apply_fn(variants)
    outs = [
        _deaug(probs[i * b:(i + 1) * b], f, k)
        for i, (f, k) in enumerate(_DIHEDRAL)
    ]
    return sum(outs) / len(outs)
