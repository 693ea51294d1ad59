"""Pallas TPU kernel: fused mask statistics (upscale + threshold + pack + box).

After decoding, every budgeted low-res mask logit (S x S, S=256 for SAM)
must be upscaled to the 1024 model frame, thresholded, bit-packed for the
(slow-link) canvas paint, and reduced to box/area scalars for NMS and the
area filter (upstream postprocess_masks + MaskData bookkeeping;
capability parity target regda/utils/local_region_homog.py:41-64). The
XLA path materializes the (budget, 1024, 1024) f32 resized logits plus
boolean copies in HBM — ~100 ms/tile of almost pure memory traffic at
the reference's crop_n_layers=1 (5 crop positions x 256-mask budget,
PERF.md round 2).

This kernel runs one program per mask: the two separable half-pixel
interpolation matmuls, the >0 threshold, the 8-bit packing (a 0/1 x
power-of-two matmul), the interior-validity mask, and the box/area
reductions all happen on a VMEM-resident (1024, 1024) block; only the
packed uint8 mask (128 KB) and one 128-lane scalar row leave the chip's
core. Upscale matmuls run in f32 (matching ops/resize.py's 'highest'
einsums, so thresholding decisions agree with the XLA twin).

Not differentiable by design — thresholding/counting has no useful
gradient, exactly like the reference's mask postprocessing.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(active_ref, logit_ref, uh_ref, uwt_ref, packw_ref,
            packed_ref, stats_ref, *, nh: int, nw: int):
    # budget slots beyond the number of threshold-passing masks carry no
    # information (ok=False downstream masks every consumer: NMS only
    # assigns paint ids to ok candidates, and the box/area filter is
    # ANDed with ok) — skip their ~27 us of 1024^2 work entirely. The
    # tiny logit-block DMA still happens; compute and output writes don't.
    # active arrives as a (1, 1, 128) VMEM row per program: the only
    # flag layout that passes Mosaic's block rules BOTH unbatched and
    # under vmap (SMEM/sub-(8,128) blocked specs are rejected, and vmap
    # prepends a Squeezed dim that breaks 1-D full-array SMEM specs).
    @pl.when(active_ref[0, 0, 0] != 0)
    def _():
        _stats_body(logit_ref, uh_ref, uwt_ref, packw_ref,
                    packed_ref, stats_ref, nh=nh, nw=nw)


def _stats_body(logit_ref, uh_ref, uwt_ref, packw_ref,
                packed_ref, stats_ref, *, nh: int, nw: int):
    f32 = jnp.float32
    x = logit_ref[0].astype(f32)                              # (S, S)
    # HIGHEST precision: the result is thresholded at 0, and the XLA twin
    # (ops/resize.py) computes at 'highest' — default-precision bf16 MXU
    # passes flip near-zero pixels, making the kernel and XLA region maps
    # diverge on TPU
    hi = jax.lax.Precision.HIGHEST
    y1 = jnp.dot(uh_ref[...], x, preferred_element_type=f32,
                 precision=hi)                                # (SIZE, S)
    y = jnp.dot(y1, uwt_ref[...], preferred_element_type=f32,
                precision=hi)                                 # (SIZE, SIZE)
    size = y.shape[0]
    bits = (y > 0.0).astype(f32)

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    valid = ((rows_i < nh) & (cols_i < nw)).astype(f32)
    mv = bits * valid
    area = jnp.sum(mv, keepdims=False)
    rows_any = jnp.max(mv, axis=1, keepdims=True)             # (SIZE, 1)
    cols_any = jnp.max(mv, axis=0, keepdims=True)             # (1, SIZE)
    ri = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0).astype(f32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1).astype(f32)
    y0 = jnp.min(jnp.where(rows_any > 0, ri, float(nh)))
    y1b = jnp.max(jnp.where(rows_any > 0, ri, -1.0)) + 1.0
    x0 = jnp.min(jnp.where(cols_any > 0, ci, float(nw)))
    x1b = jnp.max(jnp.where(cols_any > 0, ci, -1.0)) + 1.0

    packed = jnp.dot(bits.astype(jnp.bfloat16), packw_ref[...],
                     preferred_element_type=f32)              # (SIZE, SIZE/8)
    # Mosaic has no f32->uint8 cast; emit int32, the wrapper narrows
    packed_ref[0] = packed.astype(jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.full((1, 128), 0.0, f32)
    row = jnp.where(lane == 0, y0, row)
    row = jnp.where(lane == 1, y1b, row)
    row = jnp.where(lane == 2, x0, row)
    row = jnp.where(lane == 3, x1b, row)
    row = jnp.where(lane == 4, area, row)
    stats_ref[0] = row


@functools.partial(jax.jit,
                   static_argnames=('size', 'nh', 'nw', 'interpret'))
def mask_stats_fused(logits, size: int, nh: int, nw: int,
                     interpret: bool | None = None, active=None):
    """(M, S, S) low-res mask logits -> (packed (M, size, size//8) uint8,
    boxes_px (M, 4) f32 [x0, y0, x1, y1] in the (nh, nw) frame,
    areas_px (M,) f32 pixel counts in the (nh, nw) frame).

    Callers scale boxes/areas to the crop pixel frame (ch/nh, cw/nw)
    exactly as the XLA twin does.

    active: optional (M,) bool/int — slots with active=False are SKIPPED
    (their outputs are unwritten garbage; callers must mask every
    consumer with the same flag, as the region pipeline does with `ok`).
    The budget is sized for the worst case, but most tiles pass far
    fewer masks than `mask_budget`, so this turns a fixed per-budget cost
    into a per-real-mask cost.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    from regda_tpu.ops.resize import _interp_matrix_half_pixel
    m, s, _ = logits.shape
    if active is None:
        active = jnp.ones((m,), jnp.int32)
    active = active.astype(jnp.int32)
    uh = jnp.asarray(_interp_matrix_half_pixel(s, size))       # (size, s)
    uwt = jnp.asarray(_interp_matrix_half_pixel(s, size).T)    # (s, size)
    packw = np.zeros((size, size // 8), np.float32)
    for k in range(8):
        packw[np.arange(k, size, 8), np.arange(size // 8)] = float(
            2 ** (7 - k))
    packw = jnp.asarray(packw, jnp.bfloat16)

    def const(shape, space=pltpu.VMEM):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=space)

    packed, stats = pl.pallas_call(
        functools.partial(_kernel, nh=nh, nw=nw),
        out_shape=[jax.ShapeDtypeStruct((m, size, size // 8), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1, 128), jnp.float32)],
        grid=(m,),
        in_specs=[pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, s, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  const((size, s)), const((s, size)),
                  const((size, size // 8))],
        out_specs=[pl.BlockSpec((1, size, size // 8), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.broadcast_to(active[:, None, None], (m, 1, 128)),
      logits, uh, uwt, packw)
    st = stats[:, 0, :]
    boxes = jnp.stack([st[:, 2], st[:, 0], st[:, 3], st[:, 1]], axis=1)
    return packed.astype(jnp.uint8), boxes, st[:, 4]
