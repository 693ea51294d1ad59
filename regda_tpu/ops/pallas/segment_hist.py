"""Pallas TPU kernel: per-region class histograms (the LRH hot op).

Replaces the reference's torch_scatter CUDA scatter-sum
(regda/utils/local_region_homog.py:140) with an MXU formulation: a scatter
over ragged region ids is rewritten as one-hot contractions — for each row
of 1024 pixels,

    histᵀ += onehot(labels) (C8 x 1024)  ·  onehot(regions) (R x 1024)
             contracted over the 1024-pixel lane dimension -> (C8, R)

Both one-hots are built in-register from broadcasted-iota compares (VPU),
and the contraction runs on the MXU. The histogram is accumulated
*transposed* as (C8, R) — classes padded only to the 8-sublane — so the
MXU isn't wasted padding 6 classes to a 128 lane width. The accumulator
block stays in VMEM across the pixel-chunk grid dimension (revisited
output block), so HBM traffic is one read of the ids + one histogram write.

Shapes are static: R regions (SAM emits well under 1024 regions/tile; ids
pre-clamped), pixel count padded to a multiple of 8192 with ignored labels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 8          # sublane rows per tile
COLS = 1024       # lane-aligned pixels per row
TILE = ROWS * COLS


def _hist_kernel(labels_ref, regions_ref, out_ref, *, num_regions, c_pad):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    hist = jnp.zeros((c_pad, num_regions), jnp.float32)
    for k in range(ROWS):
        row_lbl = labels_ref[0, 0, k:k + 1, :]                  # (1, COLS)
        row_reg = regions_ref[0, 0, k:k + 1, :]                 # (1, COLS)
        cls_iota = jax.lax.broadcasted_iota(jnp.int32, (c_pad, COLS), 0)
        reg_iota = jax.lax.broadcasted_iota(jnp.int32,
                                            (num_regions, COLS), 0)
        onehot_cls = (cls_iota == row_lbl).astype(jnp.float32)  # (C8, COLS)
        onehot_reg = (reg_iota == row_reg).astype(jnp.float32)  # (R, COLS)
        hist = hist + jax.lax.dot_general(
            onehot_cls, onehot_reg,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (C8, R)
    out_ref[0, :, :] += hist


@functools.partial(jax.jit, static_argnames=('num_regions', 'num_classes',
                                             'interpret'))
def segment_hist_labels_pallas(labels: jnp.ndarray, regions: jnp.ndarray,
                               num_regions: int, num_classes: int,
                               interpret: bool | None = None) -> jnp.ndarray:
    """labels (B, N) int32 (ignore < 0), regions (B, N) int32 in [0, R).

    Returns (B, R, C) float32 histogram.
    """
    b, n = labels.shape
    pad = (-n) % TILE
    if pad:
        labels = jnp.pad(labels, ((0, 0), (0, pad)), constant_values=-1)
        # padded pixels carry an ignored label so they never count
        regions = jnp.pad(regions, ((0, 0), (0, pad)))
        n += pad
    nc = n // TILE
    labels4 = labels.reshape(b, nc, ROWS, COLS)
    regions4 = regions.reshape(b, nc, ROWS, COLS)
    c_pad = ((num_classes + ROWS - 1) // ROWS) * ROWS
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'

    out = pl.pallas_call(
        functools.partial(_hist_kernel, num_regions=num_regions, c_pad=c_pad),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, ROWS, COLS), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ROWS, COLS), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_pad, num_regions),
                               lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c_pad, num_regions), jnp.float32),
        interpret=interpret,
    )(labels4, regions4)
    return out[:, :num_classes, :].transpose(0, 2, 1)           # (B, R, C)


def segment_hist_pallas(label_onehot: jnp.ndarray, regions: jnp.ndarray,
                        num_regions: int) -> jnp.ndarray:
    """Adapter matching region_histogram's (B, N, C) one-hot interface."""
    labels = jnp.where(label_onehot.sum(-1) > 0,
                       jnp.argmax(label_onehot, -1), -1).astype(jnp.int32)
    return segment_hist_labels_pallas(labels, regions.astype(jnp.int32),
                                      num_regions, label_onehot.shape[-1])
