"""Bilinear resize with PyTorch `align_corners=True` semantics, as matmuls.

The reference up/down-samples logits and similarity maps with
`F.interpolate(..., mode='bilinear', align_corners=True)` everywhere
(e.g. regda/models/Encoder.py:153-155, regda/gast/alignment.py:219-233,
regda/utils/tools.py:250). `jax.image.resize` only implements half-pixel
(align_corners=False) sampling, so we build the exact separable
interpolation matrices at trace time and apply them with two einsums —
which XLA maps straight onto the MXU (a 512x32 dense matmul per axis beats
a gather-based resize on TPU by a wide margin).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=128)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix for 1-D align-corners linear interp."""
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    if n_out == 1:
        m = np.zeros((1, n_in), dtype=np.float32)
        m[0, 0] = 1.0  # align_corners: output grid point 0 maps to input 0
        return m
    scale = (n_in - 1) / (n_out - 1)
    pos = np.arange(n_out, dtype=np.float64) * scale
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = pos - lo
    m = np.zeros((n_out, n_in), dtype=np.float32)
    m[np.arange(n_out), lo] = (1.0 - frac).astype(np.float32)
    m[np.arange(n_out), lo + 1] = frac.astype(np.float32)
    return m


@functools.lru_cache(maxsize=128)
def _interp_matrix_half_pixel(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) matrix for 1-D linear interp with half-pixel centers
    (PyTorch align_corners=False), edge-clamped."""
    if n_in == n_out:
        return np.eye(n_out, dtype=np.float32)
    scale = n_in / n_out
    pos = (np.arange(n_out, dtype=np.float64) + 0.5) * scale - 0.5
    pos = np.clip(pos, 0.0, n_in - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.clip(lo, 0, max(n_in - 2, 0))
    hi = np.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    m = np.zeros((n_out, n_in), dtype=np.float32)
    np.add.at(m, (np.arange(n_out), lo), (1.0 - frac).astype(np.float32))
    np.add.at(m, (np.arange(n_out), hi), frac.astype(np.float32))
    return m


@functools.lru_cache(maxsize=128)
def _adaptive_pool_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix reproducing torch AdaptiveAvgPool1d:
    window i averages input[floor(i*n/s) : ceil((i+1)*n/s)]."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    for i in range(n_out):
        lo = (i * n_in) // n_out
        hi = -(-((i + 1) * n_in) // n_out)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def _apply_separable(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = jnp.einsum('Hh,...hwc->...Hwc', jnp.asarray(wh), x, precision='highest')
    x = jnp.einsum('Ww,...hwc->...hWc', jnp.asarray(ww), x, precision='highest')
    return x.astype(dt)


def resize_bilinear_half_pixel(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) on (...,H,W,C)."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == tuple(out_hw):
        return x
    return _apply_separable(x, _interp_matrix_half_pixel(h_in, out_hw[0]),
                            _interp_matrix_half_pixel(w_in, out_hw[1]))


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d on channel-last (..., H, W, C), as matmuls."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    return _apply_separable(x, _adaptive_pool_matrix(h_in, out_hw[0]),
                            _adaptive_pool_matrix(w_in, out_hw[1]))


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Resize (..., H, W, C) channel-last array to (..., H', W', C).

    Exactly matches torch.nn.functional.interpolate(mode='bilinear',
    align_corners=True) on the H and W axes.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = jnp.asarray(_interp_matrix(h_in, h_out))
    ww = jnp.asarray(_interp_matrix(w_in, w_out))
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = jnp.einsum('Hh,...hwc->...Hwc', wh, x, precision='highest')
    x = jnp.einsum('Ww,...hwc->...hWc', ww, x, precision='highest')
    return x.astype(dt)
