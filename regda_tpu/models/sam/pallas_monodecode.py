"""Pallas TPU kernel: monolithic SAM decode — two-way transformer +
hypernetwork MLPs + mask head fused per prompt.

Everything-mode's per-chunk decode previously ran as TWO 128-program
kernels with an HBM round-trip between them: the prompt-resident two-way
kernel (pallas_twoway.py) writes each prompt's final (4096, 256) key
state (268 MB per 128-prompt chunk), XLA computes the tiny hypernetwork
MLPs from the output tokens, and the fused mask head (pallas_upscale.py)
reads the key states back. But the mask head's source IS the key state
the two-way program already holds in VMEM — so this kernel runs the whole
chain per prompt without ever materializing keys2:

    keys2, qfin = two-way core            (pallas_twoway._twoway_body)
    hyper_m     = MLP_m(qfin[1+m])        m in {1,2,3}; tiny (1, C) GEMMs
    W           = block-diag embed of hyper rows, built IN-kernel from
                  iota masks (no (B, 16*c8, M*16) host-side tensor)
    masks       = mask head (ConvT1 -> LN -> gelu -> ConvT2 -> gelu -> W)
                  streamed over row blocks of keys2 (same GEMM forms as
                  pallas_upscale; depth-to-space stays outside)

Per chunk this removes the 2x268 MB keys2 write+read, a second kernel
launch, and the XLA glue between them; the only outputs are the blocked
masks (B, T, M*16 — 50 MB/chunk) and the 7-token query state.

Equality: composition of the two kernels' math (tests compare against the
two-step fused path and the stock twin). Differentiable: backward is the
VJP of the composed stock twin (_mono_stock), like every kernel here.

Capability parity target: segment-anything's MaskDecoder as driven by the
reference's everything mode (regda/utils/local_region_homog.py:30-39);
built TPU-first rather than ported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from regda_tpu.models.sam.pallas_twoway import (NP, WKEYS, _twoway_body,
                                                _twoway_stock)
from regda_tpu.models.sam.pallas_upscale import (_gelu_exact, _interleave,
                                                 _upscale_stock)

M_SEL = 3          # multimask: masks 1..3 (mask 0 is never returned)
PIX = 1024         # mask-head row-block size (bounds VMEM)


def _kernel(*refs, num_heads: int, head_dim: int, ln_dt: bool,
            c4: int, c8: int, pp: int = 1, iou_thresh=None,
            blocked: bool = False):
    (ktok0_ref, vtok0_ref, q1_ref, qpe_ref,
     keys0_ref, pe_ref, qimg0_ref,
     colmask_ref, rowmask_ref, maskb_ref) = refs[:10]
    wrefs = refs[10:10 + len(WKEYS)]
    n_mask_ops = 13
    lo = 10 + len(WKEYS)
    (k1_ref, b1_ref, pool_ref, lnw_ref, lnb_ref, k2bd_ref, b2t_ref,
     hybd0_ref, hyb0_ref, hybd1_ref, hyb1_ref, hybd2_ref, hyb2_ref) = \
        refs[lo:lo + n_mask_ops]
    if iou_thresh is not None:
        iou_refs = refs[lo + n_mask_ops:-3]
        masks_out_ref, qout_ref, iou_out_ref = refs[-3:]
    else:
        iou_refs = None
        iou_out_ref = None
        masks_out_ref, qout_ref = refs[-2:]

    # pp prompts per program: their chains are fully independent, so the
    # scheduler can overlap one prompt's VPU passes (LN/softmax/gelu)
    # with another's MXU matmuls — the per-prompt chain alone leaves each
    # unit idle while the other works (measured ~26% MXU single-prompt)
    for j in range(pp):
        _mono_one(j, ktok0_ref, vtok0_ref, q1_ref, qpe_ref, keys0_ref,
                  pe_ref, qimg0_ref, colmask_ref, rowmask_ref, maskb_ref,
                  wrefs, k1_ref, b1_ref, pool_ref, lnw_ref, lnb_ref,
                  k2bd_ref, b2t_ref, hybd0_ref, hyb0_ref, hybd1_ref,
                  hyb1_ref, hybd2_ref, hyb2_ref, masks_out_ref, qout_ref,
                  num_heads=num_heads, head_dim=head_dim, ln_dt=ln_dt,
                  c4=c4, c8=c8, iou_refs=iou_refs, iou_thresh=iou_thresh,
                  iou_out_ref=iou_out_ref, blocked=blocked)


def _mono_one(j, ktok0_ref, vtok0_ref, q1_ref, qpe_ref, keys0_ref,
              pe_ref, qimg0_ref, colmask_ref, rowmask_ref, maskb_ref,
              wrefs, k1_ref, b1_ref, pool_ref, lnw_ref, lnb_ref,
              k2bd_ref, b2t_ref, hybd0_ref, hyb0_ref, hybd1_ref,
              hyb1_ref, hybd2_ref, hyb2_ref, masks_out_ref, qout_ref,
              *, num_heads: int, head_dim: int, ln_dt: bool,
              c4: int, c8: int, iou_refs=None, iou_thresh=None,
              iou_out_ref=None, blocked: bool = False):
    f32 = jnp.float32
    dt = keys0_ref.dtype
    keys2, qfin = _twoway_body(
        ktok0_ref, vtok0_ref, q1_ref, qpe_ref, keys0_ref, pe_ref,
        qimg0_ref, colmask_ref, rowmask_ref, maskb_ref, wrefs,
        num_heads=num_heads, head_dim=head_dim, ln_dt=ln_dt, row=j)
    qout_ref[j] = qfin.astype(dt)

    if iou_thresh is not None:
        # ---- in-kernel IoU gate: everything-mode drops every candidate
        # whose predicted IoU fails pred_iou_thresh BEFORE stability is
        # even consulted (upstream SamAutomaticMaskGenerator order, the
        # caller's filter at auto.py _decode_all_fn), so the mask head —
        # the (T, C) GEMM chain below — is dead work for those prompts.
        # Run the tiny iou head here on the iou token (qfin row 0), EMIT
        # it as the canonical iou prediction (iou_out_ref; the caller must
        # filter on this array, not a recompute from the dt-rounded qout),
        # and skip the chain when ALL THREE returned masks fail. Because
        # the gate and the caller's filter decide from the SAME numbers,
        # a zeroed block can never belong to a kept mask — no margin
        # needed (stability reads 0/0 -> 0 and area 0 for skipped rows).
        (iw0_ref, ib0_ref, iw1_ref, ib1_ref, iw2_ref, ib2_ref) = iou_refs
        row_iota0 = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)
        sel0 = (row_iota0 == 0).astype(dt)
        xq = jnp.dot(sel0, qfin.astype(dt),
                     preferred_element_type=f32)            # (1, C)
        xq = jax.nn.relu(jnp.dot(xq.astype(dt), iw0_ref[...],
                                 preferred_element_type=f32)
                         + ib0_ref[0][None, :])
        xq = jax.nn.relu(jnp.dot(xq.astype(dt), iw1_ref[...],
                                 preferred_element_type=f32)
                         + ib1_ref[0][None, :])
        xq = (jnp.dot(xq.astype(dt), iw2_ref[...],
                      preferred_element_type=f32)
              + ib2_ref[0][None, :])                        # (1, 128 pad)
        iou_out_ref[j] = xq.astype(iou_out_ref.dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, xq.shape, 1)
        # multimask returns masks 1..3 (iou-head lanes 1..3)
        iou3 = jnp.where((lane >= 1) & (lane <= M_SEL), xq, -1e30)
        gate = jnp.max(iou3) > iou_thresh

        @pl.when(gate)
        def _run_head():
            _mask_head(j, keys2, qfin, k1_ref, b1_ref, pool_ref, lnw_ref,
                       lnb_ref, k2bd_ref, b2t_ref, hybd0_ref, hyb0_ref,
                       hybd1_ref, hyb1_ref, hybd2_ref, hyb2_ref,
                       masks_out_ref, c4=c4, c8=c8, blocked=blocked)

        @pl.when(jnp.logical_not(gate))
        def _zero_out():
            masks_out_ref[j] = jnp.zeros(masks_out_ref.shape[1:],
                                         masks_out_ref.dtype)
        return

    _mask_head(j, keys2, qfin, k1_ref, b1_ref, pool_ref, lnw_ref, lnb_ref,
               k2bd_ref, b2t_ref, hybd0_ref, hyb0_ref, hybd1_ref, hyb1_ref,
               hybd2_ref, hyb2_ref, masks_out_ref, c4=c4, c8=c8,
               blocked=blocked)


def _mask_head(j, keys2, qfin, k1_ref, b1_ref, pool_ref, lnw_ref, lnb_ref,
               k2bd_ref, b2t_ref, hybd0_ref, hyb0_ref, hybd1_ref, hyb1_ref,
               hybd2_ref, hyb2_ref, masks_out_ref, *, c4: int, c8: int,
               blocked: bool = False):
    f32 = jnp.float32
    dt = keys2.dtype

    # ---- hypernetwork MLPs on the mask tokens (rows 2..4 of qfin: row 0
    # is the iou token, rows 1..4 the mask tokens, and multimask returns
    # masks 1..3 — mask m pairs token 1+m with hyper_mlp{m}) -------------
    # The three per-mask MLPs run as ONE row through block-diagonal
    # (3C, 3C) weights: x = [q1 | q2 | q3] (1, 3C) built by three
    # lane-blocked dots from qfin (Mosaic-friendly: no cross-lane
    # reshape). Numerics match factored_decoder._mlp's bf16 chain.
    c = qfin.shape[-1]
    sel_rows = []
    for m in range(M_SEL):
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NP), 1)
        onehot = (row_iota == (2 + m)).astype(dt)        # (1, NP)
        sel_rows.append(jnp.dot(onehot, qfin.astype(dt),
                                preferred_element_type=f32))  # (1, C)
    # place each (1, C) into its 128-aligned lane block of (1, 3C)
    x3 = jnp.concatenate(sel_rows, axis=-1).astype(dt)   # (1, 3C)
    h = jnp.dot(x3, hybd0_ref[...], preferred_element_type=f32)
    h = jax.nn.relu((h.astype(dt) + hyb0_ref[0][None, :].astype(dt)))
    h = jnp.dot(h.astype(dt), hybd1_ref[...], preferred_element_type=f32)
    h = jax.nn.relu((h.astype(dt) + hyb1_ref[0][None, :].astype(dt)))
    h = jnp.dot(h.astype(dt), hybd2_ref[...], preferred_element_type=f32)
    hcat = (h.astype(dt) + hyb2_ref[0][None, :].astype(dt)).astype(f32)
    # hcat: (1, 3*c8) — hyper rows for masks 1..3, lane blocks of c8

    # ---- build the hypernetwork GEMM W (16*c8, M*16) in-kernel --------
    #   W[blk*c8 + ch, m*16 + blk'] = hyper[m][ch] * (blk == blk')
    # via iota masks: P2[r, j] = hcat[0, (j//16)*c8 + (r % c8)]
    r16 = 16 * c8
    cols = M_SEL * 16
    if blocked:
        # candidate-major output: build W PRE-TRANSPOSED (M*16, 16*c8) so
        # the A @ B^T dot emits (M*16, PIX) blocks directly and the caller
        # never pays the pixel-major -> candidate-major HBM relayout (the
        # round-2 A/B showed that relayout inverting the mono kernel's
        # win under exact stability).
        #   Wt[jc, r] = hcat[0, (jc//16)*c8 + (r % c8)] * ((r//c8) == jc%16)
        jq = jax.lax.broadcasted_iota(jnp.int32, (cols, M_SEL * c8), 0)
        qq_t = jax.lax.broadcasted_iota(jnp.int32, (cols, M_SEL * c8), 1)
        # A[jc, q] = (q // c8 == jc // 16): mask m's hyper lanes -> its
        # 16-column block; * hcat broadcasts the values in
        a_sel = ((qq_t // c8) == (jq // 16)).astype(f32) * hcat
        qs = jax.lax.broadcasted_iota(jnp.int32, (M_SEL * c8, r16), 0)
        rs = jax.lax.broadcasted_iota(jnp.int32, (M_SEL * c8, r16), 1)
        s_qr = ((qs % c8) == (rs % c8)).astype(f32)      # lane spread
        p2t = jnp.dot(a_sel, s_qr, preferred_element_type=f32)
        ji = jax.lax.broadcasted_iota(jnp.int32, (cols, r16), 0)
        ri_t = jax.lax.broadcasted_iota(jnp.int32, (cols, r16), 1)
        p1t = ((ri_t // c8) == (ji % 16)).astype(f32)
        w_hyper_t = (p1t * p2t).astype(dt)               # (M*16, 16*c8)
    else:
        rr = jax.lax.broadcasted_iota(jnp.int32, (r16, M_SEL * c8), 0)
        qq = jax.lax.broadcasted_iota(jnp.int32, (r16, M_SEL * c8), 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (M_SEL * c8, cols), 1)
        mq = jax.lax.broadcasted_iota(jnp.int32, (M_SEL * c8, cols), 0)
        # sel_q2j[q, j] = (q // c8 == j // 16): routes hyper lane block m
        # to output column block m
        sel_q2j = ((mq // c8) == (jj // 16)).astype(f32)
        # rsel[r, q] = (q % c8 == r % c8); scaling its columns by the
        # hyper row (a plain lane broadcast) folds the values in without
        # any transpose, and the 0/1 selector keeps the product exact
        rsel = ((qq % c8) == (rr % c8)).astype(f32)
        p2 = jnp.dot(rsel * hcat, sel_q2j, preferred_element_type=f32)
        ri = jax.lax.broadcasted_iota(jnp.int32, (r16, cols), 0)
        ci = jax.lax.broadcasted_iota(jnp.int32, (r16, cols), 1)
        p1 = ((ri // c8) == (ci % 16)).astype(f32)
        w_hyper = (p1 * p2).astype(dt)                   # (16*c8, M*16)

    # ---- mask head: stream keys2 row blocks through the GEMM chain ----
    t = keys2.shape[0]
    pix = min(PIX, t)
    for blk in range(t // pix):
        x = jax.lax.slice(keys2, (blk * pix, 0), ((blk + 1) * pix,
                                                  keys2.shape[1]))
        t1 = jnp.dot(x, k1_ref[...], preferred_element_type=f32)
        t1 = t1 + b1_ref[0][None, :]                     # (PIX, 4*c4) f32
        t1c = t1.astype(dt)
        mu = jnp.dot(t1c, pool_ref[...], preferred_element_type=f32)
        cen = t1 - mu
        var = jnp.dot((cen * cen).astype(dt), pool_ref[...],
                      preferred_element_type=f32)
        y = cen * jax.lax.rsqrt(var + 1e-6)
        y = (y * lnw_ref[0][None, :] + lnb_ref[0][None, :]).astype(dt)
        y = _gelu_exact(y)
        half = y.shape[-1] // 2
        k2bd = k2bd_ref[...]
        t2 = jnp.concatenate(
            [jnp.dot(y[:, :half].astype(dt), k2bd,
                     preferred_element_type=f32),
             jnp.dot(y[:, half:].astype(dt), k2bd,
                     preferred_element_type=f32)], axis=-1)
        t2 = (t2 + b2t_ref[0][None, :]).astype(dt)       # (PIX, 16*c8)
        t2 = _gelu_exact(t2)
        if blocked:
            out = jax.lax.dot_general(
                w_hyper_t, t2.astype(dt), (((1,), (1,)), ((), ())),
                preferred_element_type=f32)              # (M*16, PIX)
            masks_out_ref[j, :, blk * pix:(blk + 1) * pix] = out.astype(
                masks_out_ref.dtype)
        else:
            out = jnp.dot(t2.astype(dt), w_hyper,
                          preferred_element_type=f32)
            masks_out_ref[j, blk * pix:(blk + 1) * pix] = out.astype(
                masks_out_ref.dtype)


def _hyper_blockdiag(hyper_w, dtype):
    """Stack the 3 mask-token MLPs as block-diagonal weights so the kernel
    runs them as ONE (1, 3C) row: returns per-layer (3*in, 3*out) kernels
    + (1, 3*out) biases."""
    outs = []
    for li in range(3):
        ks = [hw[2 * li] for hw in hyper_w]
        bs = [hw[2 * li + 1] for hw in hyper_w]
        n_in, n_out = ks[0].shape
        wbd = jnp.zeros((3 * n_in, 3 * n_out), dtype)
        for m, k in enumerate(ks):
            wbd = wbd.at[m * n_in:(m + 1) * n_in,
                         m * n_out:(m + 1) * n_out].set(k.astype(dtype))
        bbd = jnp.concatenate([b.astype(jnp.float32) for b in bs])[None]
        outs.append((wbd, bbd))
    return outs


def _mono_stock(allops, num_heads, out_dtype):
    """XLA twin: two-way stock + hypernetwork MLPs + upscale stock."""
    operands, hyper_w, up_w = allops
    keys2, qout = _twoway_stock(operands, num_heads)
    dt = keys2.dtype
    b, t, c = keys2.shape
    h = w = int(round(t ** 0.5))
    hyper = []
    for m in range(M_SEL):
        x = qout[:, 2 + m]       # mask m+1's token (row 0 = iou token)
        w0, b0, w1, b1, w2, b2 = hyper_w[m]
        x = jax.nn.relu(x.astype(dt) @ w0.astype(dt) + b0.astype(dt))
        x = jax.nn.relu(x.astype(dt) @ w1.astype(dt) + b1.astype(dt))
        hyper.append(x.astype(dt) @ w2.astype(dt) + b2.astype(dt))
    hyper_in = jnp.stack(hyper, axis=1)                  # (B, 3, c8)
    k1, b1u, lnw, lnb, k2, b2u = up_w
    masks = _upscale_stock(keys2.reshape(b, h, w, c), hyper_in,
                           k1, b1u, lnw, lnb, k2, b2u, out_dtype)
    return masks, qout


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _mono_cvjp(allops, num_heads, out_dtype, interpret, pp, ln_dt):
    return _mono_fwd_impl(allops, num_heads, out_dtype, interpret,
                          pp=pp, ln_dt=ln_dt)


def _mono_fwd(allops, num_heads, out_dtype, interpret, pp, ln_dt):
    return _mono_fwd_impl(allops, num_heads, out_dtype, interpret,
                          pp=pp, ln_dt=ln_dt), allops


def _mono_bwd(num_heads, out_dtype, interpret, pp, ln_dt, res, g):
    _, vjp = jax.vjp(lambda ops: _mono_stock(ops, num_heads, out_dtype),
                     res)
    return vjp(g)


_mono_cvjp.defvjp(_mono_fwd, _mono_bwd)


@functools.partial(jax.jit,
                   static_argnames=('num_heads', 'out_dtype', 'interpret',
                                    'iou_thresh', 'pp', 'ln_dt', 'blocked'))
def _mono_fwd_impl(allops, num_heads: int = 8, out_dtype=jnp.float32,
                   interpret: bool | None = None, iou_w=None,
                   iou_thresh: float | None = None, pp: int = 2,
                   ln_dt: bool = False, blocked: bool = False):
    operands, hyper_w, up_w = allops
    (ktok0, vtok0, q1, qpe, keys0, pe, qimg0, maskb, w) = operands
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b = ktok0.shape[0]
    t, c = keys0.shape
    d = ktok0.shape[-1]
    hd = d // num_heads
    dt = keys0.dtype
    f32 = jnp.float32

    import numpy as np
    colmask = np.zeros((d, num_heads * NP), np.float32)
    rowmask = np.zeros((num_heads * NP, d), np.float32)
    for hh in range(num_heads):
        colmask[hh * hd:(hh + 1) * hd, hh * NP:(hh + 1) * NP] = 1.0
        rowmask[hh * NP:(hh + 1) * NP, hh * hd:(hh + 1) * hd] = 1.0
    colmask = jnp.asarray(colmask, dt)
    rowmask = jnp.asarray(rowmask, dt)

    # prompts per program (see _kernel): default 2 on even batches —
    # interleaving two independent chains overlaps VPU and MXU phases
    while pp > 1 and b % pp:
        pp -= 1

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    def per_prompt(shape):
        return pl.BlockSpec((pp,) + shape, lambda i: (i,) + tuple(
            0 for _ in shape), memory_space=pltpu.VMEM)

    weight_ops, weight_specs = [], []
    for k in WKEYS:
        arr = w[k]
        if arr.ndim == 1:
            arr = arr.astype(f32)[None]
        else:
            arr = arr.astype(dt)
        weight_ops.append(arr)
        weight_specs.append(const(arr.shape))

    # mask-head constants (same prep as pallas_upscale._upscale_fwd_impl)
    k1, b1u, lnw, lnb, k2, b2u = up_w
    c4 = k1.shape[1] // 4
    c8 = k2.shape[1] // 4
    blocks = jnp.arange(4 * c4) // c4
    pool_m = (blocks[:, None] == blocks[None, :]).astype(dt) / c4
    lnw_t = jnp.tile(lnw[0], 4)[None].astype(f32)
    lnb_t = jnp.tile(lnb[0], 4)[None].astype(f32)
    k2bd = jnp.kron(jnp.eye(2, dtype=dt), k2.astype(dt))
    b2_t = jnp.tile(b2u[0], 4)[None].astype(f32)
    mask_ops = [k1.astype(dt), b1u.astype(f32), pool_m, lnw_t, lnb_t,
                k2bd, b2_t]
    for wbd, bbd in _hyper_blockdiag(hyper_w, dt):
        mask_ops += [wbd, bbd]
    if iou_thresh is not None:
        # iou head (lin0/lin1 (C, C), lin2 (C, 4)): lin2 lane-padded to
        # 128 so the (1, C) x (C, 4) tail tiles cleanly; the gate only
        # reads lanes 1..3
        iw0, ib0, iw1, ib1, iw2, ib2 = iou_w
        pad = 128 - iw2.shape[1]
        iw2p = jnp.pad(iw2.astype(dt), ((0, 0), (0, pad)))
        ib2p = jnp.pad(ib2.astype(f32), (0, pad))[None]
        mask_ops += [iw0.astype(dt), ib0.astype(f32)[None],
                     iw1.astype(dt), ib1.astype(f32)[None], iw2p, ib2p]
    mask_specs = [const(x.shape) for x in mask_ops]

    operands_flat = ([ktok0.astype(dt), vtok0.astype(dt), q1.astype(dt),
                      qpe.astype(dt), keys0.astype(dt), pe.astype(dt),
                      qimg0.astype(dt), colmask, rowmask,
                      maskb.astype(f32)] + weight_ops + mask_ops)
    in_specs = ([per_prompt((NP, d)), per_prompt((NP, d)),
                 per_prompt((NP, c)), per_prompt((NP, c)),
                 const((t, c)), const((t, c)), const((t, d)),
                 const(colmask.shape), const(rowmask.shape),
                 const((1, NP))] + weight_specs + mask_specs)

    if blocked:
        # candidate-major blocked masks (B, M*16, T) — the upscale
        # kernel's blocked contract, consumed relayout-free by
        # stability_counts_blocked and the budget selection
        out_shapes = [jax.ShapeDtypeStruct((b, M_SEL * 16, t), out_dtype),
                      jax.ShapeDtypeStruct((b, NP, c), dt)]
        out_specs = [pl.BlockSpec((pp, M_SEL * 16, t), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((pp, NP, c), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
    else:
        out_shapes = [jax.ShapeDtypeStruct((b, t, M_SEL * 16), out_dtype),
                      jax.ShapeDtypeStruct((b, NP, c), dt)]
        out_specs = [pl.BlockSpec((pp, t, M_SEL * 16), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((pp, NP, c), lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)]
    if iou_thresh is not None:
        # the in-kernel iou head's output lanes (128-padded; lanes 1..3
        # are the returned masks' predictions) — the CANONICAL iou the
        # caller must filter on so gate and filter agree exactly
        out_shapes.append(jax.ShapeDtypeStruct((b, 1, 128), f32))
        out_specs.append(pl.BlockSpec((pp, 1, 128), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, head_dim=hd,
                          ln_dt=ln_dt, c4=c4, c8=c8, pp=pp,
                          iou_thresh=iou_thresh, blocked=blocked),
        out_shape=out_shapes,
        grid=(b // pp,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*operands_flat)
    raw, qout = outs[0], outs[1]
    if blocked:
        masks = raw                                      # (B, M*16, T)
    else:
        h = w_hw = int(round(t ** 0.5))
        masks = _interleave(raw, b, h, w_hw, M_SEL)
    if iou_thresh is not None:
        return masks, qout, outs[2][:, 0, 1:1 + M_SEL]
    return masks, qout


def mono_decode(operands, hyper_w, up_w, num_heads: int = 8,
                out_dtype=jnp.float32, interpret: bool | None = None,
                iou_w=None, iou_thresh: float | None = None,
                blocked: bool = False):
    """Monolithic per-prompt SAM decode.

    operands: the two_way_fused tuple (ktok0, vtok0, q1, qpe, keys0, pe,
    qimg0, maskb, weights-dict). hyper_w: 3 tuples (w0, b0, w1, b1, w2,
    b2) — the hyper_mlp{1,2,3} parameters. up_w: flattened upscale params
    (upscale_params_from_decoder format). Returns (masks (B, 3, 4H, 4W)
    out_dtype, queries_out (B, NP, C)). Differentiable via the VJP of the
    composed stock twin.

    iou_w + iou_thresh (the iou_prediction_head lin0..lin2 params and
    pred_iou_thresh) enable the in-kernel IoU gate: prompts whose best
    predicted mask IoU falls at or below iou_thresh skip the mask head
    and return ZERO mask blocks, and the return grows a third element —
    the in-kernel iou predictions (B, 3) f32, which the caller MUST use
    as its filter array (same numbers decide the gate and the filter, so
    a zeroed block can never belong to a kept mask). Output-identical for
    everything-mode consumers (those candidates are discarded by the iou
    filter before stability matters — auto.py _decode_all_fn / upstream
    SamAutomaticMaskGenerator order), but NOT the full stock function, so
    the gated path is inference-only (no custom VJP).

    The REGDA_MONO_PP / REGDA_TWOWAY_LN_DT knobs are read HERE (eager
    entry), not inside the jitted impl, so they land in the jit cache key
    — toggling them between calls at the same shapes re-traces instead of
    silently reusing the old kernel (a caller that jits around mono_decode
    still bakes the values at its own trace time)."""
    import os
    pp = int(os.environ.get('REGDA_MONO_PP', '2'))
    ln_dt = os.environ.get('REGDA_TWOWAY_LN_DT', '0') == '1'
    if iou_thresh is not None or blocked:
        # blocked output (candidate-major (B, M*16, T), the upscale
        # kernel's blocked contract) is inference-only, like the gated
        # path and the upscale kernel's own blocked mode
        return _mono_fwd_impl((operands, hyper_w, up_w), num_heads,
                              out_dtype, interpret, iou_w=iou_w,
                              iou_thresh=(float(iou_thresh)
                                          if iou_thresh is not None
                                          else None),
                              pp=pp, ln_dt=ln_dt, blocked=blocked)
    return _mono_cvjp((operands, hyper_w, up_w), num_heads, out_dtype,
                      interpret, pp, ln_dt)
