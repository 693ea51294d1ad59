"""Pallas TPU kernel: fused mask statistics (resize + threshold + pack + box).

After decoding, every budgeted low-res mask logit (S x S, S=256 for SAM)
must be resized to CROP resolution, thresholded, bit-packed for the
(slow-link) canvas paint, and reduced to box/area scalars for NMS and the
area filter (upstream postprocess_masks + MaskData bookkeeping;
capability parity target regda/utils/local_region_homog.py:41-64). The
XLA path materializes the (budget, size, size) f32 resized logits plus
boolean copies in HBM — ~100 ms/tile of almost pure memory traffic at
the reference's crop_n_layers=1 (5 crop positions x 256-mask budget,
PERF.md round 2).

Round-4 parity/perf change: the kernel consumes the COMPOSED resize
matrices (low-res -> model frame -> unpad -> crop size, the same
auto._exact_stability_matrices chain the exact stability scorer uses), so
masks are binarized on crop-resolution logits EXACTLY like upstream
postprocess_masks (previously: binarize at the 1024 model frame, then
nearest-resize at paint — boundary pixels diverged), boxes come out in
upstream's INCLUSIVE max-index convention (amg.batched_mask_to_box), and
the per-mask block shrinks from 1024^2 to crop^2 (<= 512^2 for the
reference tiles — ~4x less work for crop0).

This kernel runs one program per mask: two separable composed-resize
matmuls, the >0 threshold, the 8-bit packing (a 0/1 x power-of-two
matmul), the frame-validity mask, and the box/area reductions all happen
on a VMEM-resident (crop, crop) block; only the packed uint8 mask and one
128-lane scalar row leave the chip's core. Resize matmuls run in f32
HIGHEST (matching ops/resize.py's einsums, so thresholding decisions
agree with the XLA twin).

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


def _kernel(active_ref, logit_ref, mh_ref, mwt_ref, packw_ref,
            packed_ref, stats_ref, *, ch: int, cw: int):
    # budget slots beyond the number of threshold-passing masks carry no
    # information (ok=False downstream masks every consumer: NMS only
    # assigns paint ids to ok candidates, and the box/area filter is
    # ANDed with ok) — skip their crop^2 work entirely. The tiny
    # logit-block DMA still happens; compute and output writes don't.
    # active arrives as a (1, 1, 128) VMEM row per program: the only
    # flag layout that passes Mosaic's block rules BOTH unbatched and
    # under vmap (SMEM/sub-(8,128) blocked specs are rejected, and vmap
    # prepends a Squeezed dim that breaks 1-D full-array SMEM specs).
    @pl.when(active_ref[0, 0, 0] != 0)
    def _():
        _stats_body(logit_ref, mh_ref, mwt_ref, packw_ref,
                    packed_ref, stats_ref, ch=ch, cw=cw)


def _stats_body(logit_ref, mh_ref, mwt_ref, packw_ref,
                packed_ref, stats_ref, *, ch: int, cw: int):
    f32 = jnp.float32
    x = logit_ref[0].astype(f32)                              # (S, S)
    # HIGHEST precision: the result is thresholded at 0, and the XLA twin
    # computes at 'highest' — default-precision bf16 MXU passes flip
    # near-zero pixels, making the kernel and XLA region maps diverge
    hi = jax.lax.Precision.HIGHEST
    y1 = jnp.dot(mh_ref[...], x, preferred_element_type=f32,
                 precision=hi)                                # (CHP, S)
    y = jnp.dot(y1, mwt_ref[...], preferred_element_type=f32,
                precision=hi)                                 # (CHP, CWP)
    chp, cwp = y.shape
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (chp, cwp), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (chp, cwp), 1)
    valid = ((rows_i < ch) & (cols_i < cw)).astype(f32)
    bits = (y > 0.0).astype(f32) * valid
    area = jnp.sum(bits, keepdims=False)
    rows_any = jnp.max(bits, axis=1, keepdims=True)           # (CHP, 1)
    cols_any = jnp.max(bits, axis=0, keepdims=True)           # (1, CWP)
    ri = jax.lax.broadcasted_iota(jnp.int32, (chp, 1), 0).astype(f32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, cwp), 1).astype(f32)
    # upstream batched_mask_to_box: INCLUSIVE max indices; empty masks
    # produce sentinel y0 > y1, zeroed to [0,0,0,0] by the wrapper
    y0 = jnp.min(jnp.where(rows_any > 0, ri, float(ch)))
    y1b = jnp.max(jnp.where(rows_any > 0, ri, -1.0))
    x0 = jnp.min(jnp.where(cols_any > 0, ci, float(cw)))
    x1b = jnp.max(jnp.where(cols_any > 0, ci, -1.0))

    packed = jnp.dot(bits.astype(jnp.bfloat16), packw_ref[...],
                     preferred_element_type=f32)              # (CHP, CWP/8)
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


@functools.partial(jax.jit, static_argnames=('ch', 'cw', 'interpret'))
def mask_stats_fused(logits, m_h, m_wt, ch: int, cw: int,
                     interpret: bool | None = None, active=None):
    """(M, S, S) low-res mask logits + composed resize matrices
    m_h (ch, S), m_wt (S, cw) -> (packed (M, CHP, CWP//8) uint8 crop-res
    mask bits, boxes (M, 4) f32 [x0, y0, x1, y1] INCLUSIVE max-index
    convention in the (ch, cw) crop frame ([0,0,0,0] for empty masks),
    areas (M,) f32 crop-frame pixel counts).

    CHP/CWP are ch/cw padded to the (8, 128) tile grid; padded bits are
    zero. Unpack with np.unpackbits(...)[..., :ch, :cw].

    active: optional (M,) bool/int — slots with active=False are SKIPPED
    (their outputs are unwritten garbage; callers must mask every
    consumer with the same flag, as the region pipeline does with `ok`).
    The budget is sized for the worst case, but most tiles pass far
    fewer masks than `mask_budget`, so this turns a fixed per-budget cost
    into a per-real-mask cost.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    m, s, _ = logits.shape
    assert m_h.shape == (ch, s) and m_wt.shape == (s, cw), (
        m_h.shape, m_wt.shape, ch, cw, s)
    if active is None:
        active = jnp.ones((m,), jnp.int32)
    active = active.astype(jnp.int32)
    chp = -(-ch // 8) * 8
    cwp = -(-cw // 128) * 128
    mh = jnp.pad(m_h.astype(jnp.float32), ((0, chp - ch), (0, 0)))
    mwt = jnp.pad(m_wt.astype(jnp.float32), ((0, 0), (0, cwp - cw)))
    packw = np.zeros((cwp, cwp // 8), np.float32)
    for k in range(8):
        packw[np.arange(k, cwp, 8), np.arange(cwp // 8)] = float(
            2 ** (7 - k))
    packw = jnp.asarray(packw, jnp.bfloat16)

    def const(shape, space=pltpu.VMEM):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=space)

    packed, stats = pl.pallas_call(
        functools.partial(_kernel, ch=ch, cw=cw),
        out_shape=[jax.ShapeDtypeStruct((m, chp, cwp // 8), jnp.int32),
                   jax.ShapeDtypeStruct((m, 1, 128), jnp.float32)],
        grid=(m,),
        in_specs=[pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, s, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  const((chp, s)), const((s, cwp)),
                  const((cwp, cwp // 8))],
        out_specs=[pl.BlockSpec((1, chp, cwp // 8), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.broadcast_to(active[:, None, None], (m, 1, 128)),
      logits, mh, mwt, packw)
    st = stats[:, 0, :]
    boxes = jnp.stack([st[:, 2], st[:, 0], st[:, 3], st[:, 1]], axis=1)
    # empty masks: upstream batched_mask_to_box zeroes the sentinel box
    empty = (st[:, 1] < st[:, 0]) | (st[:, 3] < st[:, 2])
    boxes = jnp.where(empty[:, None], 0.0, boxes)
    return packed.astype(jnp.uint8), boxes, st[:, 4]
