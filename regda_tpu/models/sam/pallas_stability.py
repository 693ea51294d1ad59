"""Pallas TPU kernel: fused exact-parity stability scoring.

Upstream segment-anything computes each candidate's stability score on the
mask logits POSTPROCESSED to crop resolution (256 -> model frame ->
unpad -> crop size, bilinear) and counts pixels above +-offset (the
configuration the reference drives at regda/utils/local_region_homog.py:
32-39; see auto.py's module docstring). With the exact mode as the
default, the XLA lowering scans einsum pairs that round-trip the
(group, crop_h, 256) and (group, crop_h, crop_w) intermediates through
HBM for EVERY candidate (points_per_batch * 3 per decode chunk, ~15k per
tile at crop_n_layers=1) — measured ~25% of end-to-end everything-mode
time on v5e.

This kernel runs one program per GROUP of candidates (default 8 — one
candidate per program spends more on grid/DMA-issue overhead than on its
~8 us of matmul work): both separable resize matmuls
(the composed (crop, 256) matrix per axis, auto.py
_exact_stability_matrices) execute on the MXU against a VMEM-resident
block, and the two threshold counts reduce in-register — only a 128-lane
scalar row per candidate leaves the core. Matmuls run in the caller's
compute dtype with f32 accumulation, the same precision contract as the
XLA exact path it replaces (auto.py _decode_fn), so scores agree to bf16
rounding of the resized logits; the XLA scan path remains as the
non-TPU/`REGDA_NO_PALLAS` twin and parity is asserted in
tools/check_kernels.py and tests/test_sam.py.

Per-candidate active gating (`active`): candidates the everything-mode
filter is about to drop by pred_iou_thresh skip their resize work
entirely; their output lanes are unwritten garbage and the caller must
AND every consumer with the same flag (the filter's iou_pass &
stability_pass does exactly that). Not differentiable by design —
counting has no useful gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(active_ref, logit_ref, mh_ref, mwt_ref, out_ref, *,
            group: int, ch: int, cw: int, offset: float, dense: bool):
    """One program = `group` candidates: per-candidate programs spend
    more time on grid/DMA-issue overhead than on the matmuls (~17 us vs
    ~8 us of MXU work per candidate measured on v5e), so amortize the
    fixed costs over a G-candidate block. mh/mwt casts, the iota frame
    mask, and the output-lane selectors hoist out of the per-candidate
    loop; a group whose candidates are ALL gated off skips everything.

    dense=True drops the per-candidate pl.when (group-level gate only):
    at everything-mode pass rates most candidates are active, and the
    per-candidate branches cost scheduler overlap."""
    f32 = jnp.float32
    dt = logit_ref.dtype
    any_active = jnp.max(active_ref[:, 0, 0])

    @pl.when(any_active != 0)
    def _():
        # same dtype contract as the XLA exact path: resize matmuls in
        # the compute dtype with f32 accumulation, second matmul consumes
        # the f32 intermediate re-rounded to the compute dtype
        mh = mh_ref[...].astype(dt)
        mwt = mwt_ref[...].astype(dt)
        shape = (mh.shape[0], mwt.shape[1])
        rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        # CH/CW are padded up to the (8, 128) tile grid; padding rows/cols
        # of the resize matrices are zero, and 0 > -offset would pollute
        # the union count, so mask to the true (ch, cw) frame
        valid = (rows_i < ch) & (cols_i < cw)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def one(g):
            x = logit_ref[g]                         # (S, S) compute dt
            y1 = jnp.dot(mh, x, preferred_element_type=f32)  # (CH, S)
            y = jnp.dot(y1.astype(dt), mwt,
                        preferred_element_type=f32)          # (CH, CW)
            inter = jnp.sum(jnp.where(valid & (y > offset), 1.0, 0.0),
                            dtype=f32)
            union = jnp.sum(jnp.where(valid & (y > -offset), 1.0, 0.0),
                            dtype=f32)
            row = jnp.where(lane == 0, inter, 0.0)
            row = jnp.where(lane == 1, union, row)
            out_ref[g] = row.astype(f32)

        for g in range(group):
            if dense:
                one(g)
            else:
                pl.when(active_ref[g, 0, 0] != 0)(lambda g=g: one(g))


@functools.partial(jax.jit,
                   static_argnames=('offset', 'interpret', 'group',
                                    'dense'))
def stability_counts_fused(logits, m_h, m_wt, offset: float = 1.0,
                           active=None, interpret: bool | None = None,
                           group: int = 8, dense: bool = False):
    """(M, S, S) low-res mask logits + composed resize matrices
    m_h (ch, S), m_wt (S, cw) -> (inter (M,), union (M,)) f32 pixel counts
    of resize(logits) > +-offset over the (ch, cw) crop frame.

    stability = inter / max(union, 1) is computed by the caller. `active`:
    optional (M,) bool/int; inactive slots skip all work and return
    garbage counts the caller must mask (AND with the same flag).
    `group`: candidates per kernel program (M is padded to a multiple;
    padding slots run inactive)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    m, s, _ = logits.shape
    ch = m_h.shape[0]
    cw = m_wt.shape[1]
    if active is None:
        active = jnp.ones((m,), jnp.int32)
    active = active.astype(jnp.int32)
    group = max(1, min(group, m))
    mp = -(-m // group) * group
    if mp != m:
        logits = jnp.pad(logits, ((0, mp - m), (0, 0), (0, 0)))
        active = jnp.pad(active, (0, mp - m))
    chp = -(-ch // 8) * 8
    cwp = -(-cw // 128) * 128
    m_h = jnp.pad(m_h.astype(jnp.float32), ((0, chp - ch), (0, 0)))
    m_wt = jnp.pad(m_wt.astype(jnp.float32), ((0, 0), (0, cwp - cw)))

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, group=group, ch=ch, cw=cw,
                          offset=float(offset), dense=dense),
        out_shape=jax.ShapeDtypeStruct((mp, 1, 128), jnp.float32),
        grid=(mp // group,),
        in_specs=[pl.BlockSpec((group, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((group, s, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  const((chp, s)), const((s, cwp))],
        out_specs=pl.BlockSpec((group, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.broadcast_to(active[:, None, None], (mp, 1, 128)),
      logits, m_h, m_wt)
    return out[:m, 0, 0], out[:m, 0, 1]


def stability_counts_xla(logits, m_h, m_wt, offset: float = 1.0,
                         group: int = 24):
    """XLA twin of stability_counts_fused (the pre-kernel exact path):
    group-scanned einsum pairs so only `group` candidates are ever
    resident at crop resolution."""
    m, s, _ = logits.shape
    dt = logits.dtype
    m_h = m_h.astype(dt)
    m_wt = m_wt.astype(dt)
    padg = (-m) % group
    flat = jnp.pad(logits, ((0, padg), (0, 0), (0, 0)))
    grps = flat.reshape(-1, group, s, s)

    def body(carry, grp):
        y = jnp.einsum('hs,gsw->ghw', m_h, grp,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum('ghw,wc->ghc', y.astype(dt), m_wt,
                       preferred_element_type=jnp.float32)
        i = (y > offset).sum(axis=(-2, -1), dtype=jnp.float32)
        u = (y > -offset).sum(axis=(-2, -1), dtype=jnp.float32)
        return carry, (i, u)

    _, (inter, union) = jax.lax.scan(body, 0, grps)
    return inter.reshape(-1)[:m], union.reshape(-1)[:m]


# --------------------------- blocked-layout variant -------------------------
# The fused upscale kernel (pallas_upscale.py) can emit candidate-major
# BLOCKED masks (M*16, HW): row m*16 + (dy*8 + dx*4 + gy*2 + gx), col
# y*w + x holds full-res pixel (4y + 2dy + gy, 4x + 2dx + gx). Scoring
# stability directly in that layout removes the per-candidate
# depth-to-space HBM relayout (profiled ~84 ms/tile of the reference
# crop_n_layers=1 configuration on v5e). The separable resize
#   Y = M_h X M_w^T
# decomposes over the 16 subpixel planes: with s = dy*2+gy, t = dx*2+gx,
#   Y = sum_t (sum_s A_s X_{s,t}) B_t^T,
# where X_{s,t} (h, w) is subpixel plane (s, t) — a contiguous SUBLANE
# slice of the (16h, w) candidate block — and A_s/B_t are stride-4 column
# slices of the composed resize matrices (host-side, blocked_resize_
# factors). Every step is a plain GEMM on VMEM-resident data; total FLOPs
# match the interleaved kernel exactly.

# c = dy*8 + dx*4 + gy*2 + gx  ->  subpixel row s, subpixel col t
_SMAP = tuple((c >> 3) * 2 + ((c >> 1) & 1) for c in range(16))
_TMAP = tuple(((c >> 2) & 1) * 2 + (c & 1) for c in range(16))


def blocked_resize_factors(m_h, m_w):
    """Composed resize matrices m_h (ch, S), m_w (cw, S) -> stride-4
    factors A (4, ch, S//4), B (4, cw, S//4): A[s][u, hb] = m_h[u, hb*4+s]
    (subpixel row s of source row-block hb), likewise B over columns."""
    ch, s4 = m_h.shape
    cw = m_w.shape[0]
    a = m_h.reshape(ch, s4 // 4, 4).transpose(2, 0, 1)
    b = m_w.reshape(cw, s4 // 4, 4).transpose(2, 0, 1)
    return a, b


def _kernel_blocked(active_ref, blk_ref, a_ref, b_ref, out_ref, *,
                    group: int, h: int, w: int, ch: int, cw: int,
                    offset: float, dense: bool):
    f32 = jnp.float32
    dt = blk_ref.dtype
    any_active = jnp.max(active_ref[:, 0, 0])

    @pl.when(any_active != 0)
    def _():
        a = a_ref[...].astype(dt)                        # (4, CHP, h)
        b = b_ref[...].astype(dt)                        # (4, CWP, w)
        shape = (a.shape[1], b.shape[1])
        rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        valid = (rows_i < ch) & (cols_i < cw)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        def one(g):
            x = blk_ref[g]                           # (16h, w)
            # row-resize per subpixel column t, accumulating the four
            # subpixel-row planes s into R_t in f32
            r = [jnp.zeros((a.shape[1], w), f32) for _ in range(4)]
            for c in range(16):
                xc = x[c * h:(c + 1) * h, :]         # (h, w) plane
                r[_TMAP[c]] += jnp.dot(a[_SMAP[c]], xc,
                                       preferred_element_type=f32)
            # column-resize: Y += R_t B_t^T (A @ B^T dot_general)
            y = jnp.zeros(shape, f32)
            for t in range(4):
                y += jax.lax.dot_general(
                    r[t].astype(dt), b[t],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            inter = jnp.sum(jnp.where(valid & (y > offset), 1.0, 0.0),
                            dtype=f32)
            union = jnp.sum(jnp.where(valid & (y > -offset), 1.0, 0.0),
                            dtype=f32)
            row = jnp.where(lane == 0, inter, 0.0)
            row = jnp.where(lane == 1, union, row)
            out_ref[g] = row.astype(f32)

        for g in range(group):
            if dense:
                one(g)
            else:
                pl.when(active_ref[g, 0, 0] != 0)(lambda g=g: one(g))


@functools.partial(jax.jit,
                   static_argnames=('h', 'w', 'offset', 'interpret',
                                    'group', 'dense'))
def stability_counts_blocked(blk, m_h, m_w, h: int, w: int,
                             offset: float = 1.0, active=None,
                             interpret: bool | None = None,
                             group: int = 4, dense: bool = False):
    """(M, 16h, w) candidate-major blocked mask logits (see module note;
    reshape the upscale kernel's (B, M*16, h*w) output to (B*M, 16h, w) —
    row-major, so it is a free bitcast) + composed resize matrices
    m_h (ch, 4h), m_w (cw, 4w) -> (inter (M,), union (M,)) f32 counts of
    resize(masks) > +-offset over the (ch, cw) crop frame.

    Same contract as stability_counts_fused otherwise (active gating,
    caller computes inter / max(union, 1))."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    m = blk.shape[0]
    assert blk.shape[1] == 16 * h and blk.shape[2] == w, blk.shape
    ch = m_h.shape[0]
    cw = m_w.shape[0]
    if active is None:
        active = jnp.ones((m,), jnp.int32)
    active = active.astype(jnp.int32)
    group = max(1, min(group, m))
    mp = -(-m // group) * group
    if mp != m:
        blk = jnp.pad(blk, ((0, mp - m), (0, 0), (0, 0)))
        active = jnp.pad(active, (0, mp - m))
    a, b = blocked_resize_factors(m_h.astype(jnp.float32),
                                  m_w.astype(jnp.float32))
    # ch pads to the sublane tile, cw to the lane tile (cw is the lane
    # axis of the (CHP, CWP) resized frame); padded rows of a/b are zero,
    # so padded frame cells hold 0 and the valid mask drops them anyway
    chp = -(-ch // 8) * 8
    cwp = -(-cw // 128) * 128
    a = jnp.pad(a, ((0, 0), (0, chp - ch), (0, 0)))
    b = jnp.pad(b, ((0, 0), (0, cwp - cw), (0, 0)))

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_blocked, group=group, h=h, w=w, ch=ch,
                          cw=cw, offset=float(offset), dense=dense),
        out_shape=jax.ShapeDtypeStruct((mp, 1, 128), jnp.float32),
        grid=(mp // group,),
        in_specs=[pl.BlockSpec((group, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((group, 16 * h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  const((4, chp, h)), const((4, cwp, w))],
        out_specs=pl.BlockSpec((group, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.broadcast_to(active[:, None, None], (mp, 1, 128)),
      blk, a, b)
    return out[:m, 0, 0], out[:m, 0, 1]


def _kernel_blocked_v2(active_ref, blk_ref, a_ref, bcat_ref, out_ref, *,
                       group: int, h: int, w: int, ch: int, cw: int,
                       offset: float):
    """Restructured blocked kernel: instead of 16 (CH, h)x(h, w) + 4
    (CH, w)x(CW, w)^T GEMMs PER CANDIDATE (N=w lanes — half the MXU at
    w=64 — and a per-candidate pl.when chain), gather every candidate's
    subpixel planes into a column-concat layout and run
      4 GEMMs (CH, h) @ (h, G*4w)   [row resize, all candidates at once]
      G GEMMs (CH, 4w) @ (4w, CW)   [column resize, full-width N]
    Dense within the group: per-candidate gating is dropped (group-level
    gate only) — at everything-mode pass rates most candidates are
    active and the branches cost scheduler overlap. Inactive candidates
    return REAL counts, within the garbage-tolerant contract."""
    f32 = jnp.float32
    dt = blk_ref.dtype
    any_active = jnp.max(active_ref[:, 0, 0])

    @pl.when(any_active != 0)
    def _():
        a = a_ref[...].astype(dt)                        # (4, CHP, h)
        bcat = bcat_ref[...].astype(dt)                  # (4w, CWP)
        shape = (a.shape[1], bcat.shape[1])
        rows_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        valid = (rows_i < ch) & (cols_i < cw)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        # column-concat of subpixel planes, candidate-major bands:
        # xcat[s][:, (g*4 + t)*w : +w] = plane (s, t) of candidate g
        r = None
        for s in range(4):
            xcat = jnp.concatenate(
                [blk_ref[g,
                         ((s >> 1) * 8 + (t >> 1) * 4 + (s & 1) * 2
                          + (t & 1)) * h:
                         ((s >> 1) * 8 + (t >> 1) * 4 + (s & 1) * 2
                          + (t & 1)) * h + h, :]
                 for g in range(group) for t in range(4)], axis=1)
            part = jnp.dot(a[s], xcat, preferred_element_type=f32)
            r = part if r is None else r + part          # (CHP, G*4w) f32
        rb = r.astype(dt)
        for g in range(group):
            y = jnp.dot(rb[:, g * 4 * w:(g + 1) * 4 * w], bcat,
                        preferred_element_type=f32)      # (CHP, CWP)
            inter = jnp.sum(jnp.where(valid & (y > offset), 1.0, 0.0),
                            dtype=f32)
            union = jnp.sum(jnp.where(valid & (y > -offset), 1.0, 0.0),
                            dtype=f32)
            row = jnp.where(lane == 0, inter, 0.0)
            row = jnp.where(lane == 1, union, row)
            out_ref[g] = row.astype(f32)


@functools.partial(jax.jit,
                   static_argnames=('h', 'w', 'offset', 'interpret',
                                    'group'))
def stability_counts_blocked_v2(blk, m_h, m_w, h: int, w: int,
                                offset: float = 1.0, active=None,
                                interpret: bool | None = None,
                                group: int = 8):
    """Same contract as stability_counts_blocked; restructured GEMMs
    (see _kernel_blocked_v2). Counts agree with the twin to compute-dtype
    rounding of the resized logits (the row-resize accumulates the four
    subpixel-row planes inside one f32 GEMM chain instead of four
    separate f32 adds — same math, different summation order)."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    m = blk.shape[0]
    assert blk.shape[1] == 16 * h and blk.shape[2] == w, blk.shape
    ch = m_h.shape[0]
    cw = m_w.shape[0]
    if active is None:
        active = jnp.ones((m,), jnp.int32)
    active = active.astype(jnp.int32)
    group = max(1, min(group, m))
    mp = -(-m // group) * group
    if mp != m:
        blk = jnp.pad(blk, ((0, mp - m), (0, 0), (0, 0)))
        active = jnp.pad(active, (0, mp - m))
    a, b = blocked_resize_factors(m_h.astype(jnp.float32),
                                  m_w.astype(jnp.float32))
    chp = -(-ch // 8) * 8
    cwp = -(-cw // 128) * 128
    a = jnp.pad(a, ((0, 0), (0, chp - ch), (0, 0)))
    # bcat (4w, CWP) = vstack_t B_t^T, the block-row form of
    # Y = sum_t R_t B_t^T
    bcat = jnp.pad(jnp.concatenate([b[t].T for t in range(4)], axis=0),
                   ((0, 0), (0, cwp - cw)))

    def const(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_blocked_v2, group=group, h=h, w=w,
                          ch=ch, cw=cw, offset=float(offset)),
        out_shape=jax.ShapeDtypeStruct((mp, 1, 128), jnp.float32),
        grid=(mp // group,),
        in_specs=[pl.BlockSpec((group, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((group, 16 * h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  const((4, chp, h)), const((4 * w, cwp))],
        out_specs=pl.BlockSpec((group, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.broadcast_to(active[:, None, None], (mp, 1, 128)),
      blk, a, bcat)
    return out[:m, 0, 0], out[:m, 0, 1]


def block_masks(x, h: int, w: int):
    """(M, 4h, 4w) interleaved logits -> (M, 16h, w) blocked candidate
    layout (inverse of unblock_masks; twin/bench helper)."""
    m = x.shape[0]
    y = x.reshape(m, h, 2, 2, w, 2, 2)         # (m, h, dy, gy, w, dx, gx)
    y = y.transpose(0, 2, 5, 3, 6, 1, 4)       # (m, dy, dx, gy, gx, h, w)
    return y.reshape(m, 16 * h, w)


def unblock_masks(blk, h: int, w: int):
    """(M, 16h, w) blocked candidate logits -> (M, 4h, 4w) interleaved
    (the XLA depth-to-space the blocked path avoids; twin/test helper)."""
    m = blk.shape[0]
    x = blk.reshape(m, 2, 2, 2, 2, h, w)       # (m, dy, dx, gy, gx, h, w)
    x = x.transpose(0, 5, 1, 3, 6, 2, 4)       # (m, h, dy, gy, w, dx, gx)
    return x.reshape(m, 4 * h, 4 * w)
