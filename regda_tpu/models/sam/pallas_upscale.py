"""Pallas TPU kernel: SAM mask-decoder upscaling + hypernetwork fused.

The decoder's mask head is

    masks = hyper_in . gelu(ConvT2(gelu(LN(ConvT1(src)))))          (1)

with ConvT1/ConvT2 2x2-stride-2 transposed convs (256->64->32 channels) and
hyper_in a per-prompt (4, 32) hypernetwork. Everything-mode runs (1) for
B=128 prompts per chunk: the interleaved (B, 256, 256, 32) activation is
~536 MB of HBM traffic per step, and XLA's lowerings pick batch-minor
layouts and full-tensor copies around it (profiled 120-470 GiB/s and
~15 ms of a ~24 ms decode chunk on v5e; see PERF.md).

Because a k=s=2 ConvTranspose is a per-pixel linear map, chain (1) is
pointwise in the 64x64 source grid. This kernel streams src pixel-blocks
through VMEM and keeps the subpixel axes folded into the channel (lane)
dimension the whole way — every step is a plain GEMM, so nothing needs a
Mosaic-unsupported relayout:

    t1    = src (P, 256) @ K1 (256, 4*64)           ConvT1, blocks (d, f)
    stats = t1 @ M (block-average matrix)           per-64-block LN moments
    t2    = gelu(LN) halves @ kron(I2, K2)          ConvT2, blocks (d, g, c)
    out   = gelu(t2) (P, 512) @ Hbd_b (512, 64)     hyper, cols (m, d, g)

HBM traffic is one src read + one (B, HW, 64) blocked-masks write
(~320 MB/chunk vs ~2.6 GB); the depth-to-space interleave happens outside
the kernel on the 16x-smaller masks tensor.

Equality: same math as decoder.MaskDecoder's UpscaleLinear path
(tests/test_sam.py compares against it; gelu uses an erf approximation
with |err| <= 1.5e-7 — Pallas TPU has no erf/erfc lowering — which is ~2
decades below the bf16 rounding the stock path already carries).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """erf as the odd rational x * A(x^2)/B(x^2) on |x| <= 4 (erf
    saturates to +-1 beyond, f32-exactly) — XLA's own f32 ErfImpl
    approximation (|err| <= ~7e-7 vs true erf, well under every
    downstream tolerance). Replaces the A&S 7.1.26 form, whose exp +
    divide chain cost ~2.5 ms per 128-prompt mask-head chunk on v5e
    (XProf/phase-bench, PERF.md round 4); this form has ONE divide and
    no transcendental."""
    x = jnp.clip(x, -4.0, 4.0)
    z = x * x
    alpha = (0.00022905065861350646, 0.0034082910107109506,
             0.050955695062380861, 0.18520832239976145, 1.128379143519084)
    beta = (-1.1791602954361697e-7, 0.000023547966471313185,
            0.0010179625278914885, 0.014070470171167667,
            0.11098505178285362, 0.49746925110067538, 1.0)
    a = jnp.full_like(z, alpha[0])
    for c in alpha[1:]:
        a = a * z + c
    b = jnp.full_like(z, beta[0])
    for c in beta[1:]:
        b = b * z + c
    # the full-precision divide dominated this erf's VPU cost; hardware
    # approximate reciprocal + ONE Newton step gives ~2^-24 relative
    # error on b in [1, ~5.4] — far below the approximation's own 7e-7
    try:
        r = pl.reciprocal(b, approx=True)
        r = r * (2.0 - b * r)
    except Exception:
        r = 1.0 / b
    return x * a * r


def _gelu_exact(x):
    """gelu in its erf form: 0.5*x*(1+erf(x/sqrt(2))). Internals in f32
    (Mosaic rejects bf16 compares; the rational wants f32 anyway)."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * (2.0 ** -0.5)))).astype(x.dtype)


def _kernel(active_ref, src_ref, k1_ref, b1_ref, m_ref, lnw_ref, lnb_ref,
            k2bd_ref, b2_ref, hbd_ref, out_ref, *, blocked: bool = False):
    # per-prompt gate (everything-mode IoU prefilter): skipped prompts
    # write ZERO blocks — the caller's candidate selection runs a one-hot
    # matmul over ALL rows, so garbage (unlike the stats kernel's) would
    # propagate through the 0-weighted lanes if it held NaN. active
    # arrives as a (1, 1, 128) VMEM row per program — the only flag
    # layout that passes Mosaic's block rules BOTH unbatched and under
    # vmap (SMEM/sub-(8,128) blocked specs are rejected, and vmap
    # prepends a Squeezed dim that breaks 1-D full-array SMEM specs).
    # (A REGDA_UPSCALE_SPLIT sub-chain interleave knob lived here through
    # round 5 — measured a loser at every split, removed.)
    flag = active_ref[0, 0, 0]

    @pl.when(flag != 0)
    def _():
        _upscale_rows(src_ref, k1_ref, b1_ref, m_ref, lnw_ref, lnb_ref,
                      k2bd_ref, b2_ref, hbd_ref, out_ref, blocked=blocked)

    @pl.when(flag == 0)
    def _():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)


def _upscale_rows(src_ref, k1_ref, b1_ref, m_ref, lnw_ref, lnb_ref,
                  k2bd_ref, b2_ref, hbd_ref, out_ref, *,
                  blocked: bool = False):
    f32 = jnp.float32
    dt = k1_ref.dtype
    x = src_ref[0]                                       # (P, C)
    t1 = jnp.dot(x, k1_ref[...], preferred_element_type=f32)
    t1 = t1 + b1_ref[0][None, :]                         # (P, 4*c4)
    # LN per 64-lane block, moments via ONE block-average GEMM each (the
    # pool+broadcast-back matrix pair costs 2x; lane-splitting reshapes
    # don't lower and lane-slice VPU reductions measured ~30% slower)
    t1c = t1.astype(dt)
    mu = jnp.dot(t1c, m_ref[...], preferred_element_type=f32)
    cen = t1 - mu
    var = jnp.dot((cen * cen).astype(dt), m_ref[...],
                  preferred_element_type=f32)
    y = cen * jax.lax.rsqrt(var + 1e-6)
    y = (y * lnw_ref[0][None, :] + lnb_ref[0][None, :]).astype(dt)
    y = _gelu_exact(y)
    # ConvT2 as TWO half-width block-diagonal GEMMs on 128-lane-aligned
    # slices of y (blocks (dy=0,dx=*) and (dy=1,dx=*)): kron(I2, k2)
    # carries 2x flop padding vs the old kron(I4, k2)'s 4x, and both dots
    # keep full K=128/N=256 MXU shapes
    half = y.shape[-1] // 2
    k2bd = k2bd_ref[...]
    t2 = jnp.concatenate(
        [jnp.dot(y[:, :half].astype(dt), k2bd, preferred_element_type=f32),
         jnp.dot(y[:, half:].astype(dt), k2bd, preferred_element_type=f32)],
        axis=-1)
    t2 = (t2 + b2_ref[0][None, :]).astype(dt)            # (P, 16*c8)
    t2 = _gelu_exact(t2)
    if blocked:
        # hbd arrives pre-transposed (M*16, 16*c8); the A @ B^T
        # dot_general emits the candidate-major (M*16, P) block directly,
        # so the caller never pays an HBM relayout to regroup masks
        out = jax.lax.dot_general(
            hbd_ref[0], t2.astype(dt),
            (((1,), (1,)), ((), ())), preferred_element_type=f32)
        out_ref[0] = out.astype(out_ref.dtype)           # (M*16, P)
    else:
        out = jnp.dot(t2.astype(dt), hbd_ref[0],
                      preferred_element_type=f32)
        out_ref[0] = out.astype(out_ref.dtype)           # (P, M*16)


def _interleave(out, b, h, w, m):
    """(B, HW, M*16) blocked masks -> (B, M, 4H, 4W); col = (m,dy,dx,gy,gx)."""
    masks = out.reshape(b, h, w, m, 2, 2, 2, 2)
    masks = masks.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return masks.reshape(b, m, 4 * h, 4 * w)


def masks_from_blocked(out_t, h, w):
    """Candidate-major blocked masks (B, M*16, HW) -> (B, M, 4H, 4W).

    Row index = m*16 + (dy, dx, gy, gx); full-res pixel (4y+2dy+gy,
    4x+2dx+gx) of mask m lives at [b, m*16 + dy*8+dx*4+gy*2+gx, y*w + x].
    This is the ONLY place the depth-to-space relayout happens on the
    blocked decode path — callers apply it to the budget-selected masks
    (16x fewer than the candidate stream the old path interleaved)."""
    b = out_t.shape[0]
    m = out_t.shape[1] // 16
    x = out_t.reshape(b, m, 2, 2, 2, 2, h, w)    # (b, m, dy, dx, gy, gx, ...)
    x = x.transpose(0, 1, 6, 2, 4, 7, 3, 5)      # (b, m, h, dy, gy, w, dx, gx)
    return x.reshape(b, m, 4 * h, 4 * w)


def _upscale_stock(src, hyper_in, k1, b1, lnw, lnb, k2, b2, out_dtype):
    """Pure-XLA twin of the fused kernel (exact gelu); the VJP rule."""
    f32 = jnp.float32
    b, h, w, c = src.shape
    m, c8 = hyper_in.shape[1:]
    c4 = k1.shape[1] // 4
    dt = k1.dtype
    x = src.reshape(b, h * w, c).astype(dt)
    t1 = jnp.einsum('bpc,cf->bpf', x, k1,
                    preferred_element_type=f32) + b1[0][None, None]
    t1 = t1.reshape(b, h * w, 4, c4)
    mu = t1.mean(-1, keepdims=True)
    var = ((t1 - mu) ** 2).mean(-1, keepdims=True)
    y = (t1 - mu) * jax.lax.rsqrt(var + 1e-6)
    y = (y * lnw[0].astype(f32) + lnb[0].astype(f32)).astype(dt)
    y = jax.nn.gelu(y, approximate=False)
    t2 = jnp.einsum('bpkc,cf->bpkf', y.astype(dt), k2,
                    preferred_element_type=f32)
    t2 = (t2 + b2[0][None, None, None]).astype(dt)   # (B, HW, 4, 4*c8)
    t2 = jax.nn.gelu(t2, approximate=False)
    g = t2.reshape(b, h * w, 16, c8)
    out = jnp.einsum('bpkc,bmc->bpmk', g.astype(dt), hyper_in.astype(dt),
                     preferred_element_type=f32)
    out = out.reshape(b, h * w, m * 16).astype(out_dtype)
    return _interleave(out, b, h, w, m)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _upscale_cvjp(src, hyper_in, k1, b1, lnw, lnb, k2, b2, out_dtype,
                  interpret):
    return _upscale_fwd_impl(src, hyper_in, k1, b1, lnw, lnb, k2, b2,
                             out_dtype, interpret)


def _upscale_fwd(src, hyper_in, k1, b1, lnw, lnb, k2, b2, out_dtype,
                 interpret):
    return (_upscale_fwd_impl(src, hyper_in, k1, b1, lnw, lnb, k2, b2,
                              out_dtype, interpret),
            (src, hyper_in, k1, b1, lnw, lnb, k2, b2))


def _upscale_bwd(out_dtype, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: _upscale_stock(*a, out_dtype), *res)
    return vjp(g)


_upscale_cvjp.defvjp(_upscale_fwd, _upscale_bwd)


def upscale_hyper_masks(src, hyper_in, k1, b1, lnw, lnb, k2, b2,
                        out_dtype=jnp.float32,
                        interpret: bool | None = None, active=None,
                        blocked: bool = False):
    """Fused mask head: src (B, H, W, C) + hyper_in (B, M, C//8) ->
    masks (B, M, 4H, 4W).

    k1 (C, 4*(C//4)) / k2 (C//4, 4*(C//8)): pre-flattened UpscaleLinear
    kernels (block order (dy, dx, f)); b1/b2 the 4x-tiled biases; lnw/lnb
    the LayerNorm2d affine over C//4. Differentiable: backward is the VJP
    of the exact-gelu stock twin (_upscale_stock).

    active: optional (B,) bool/int — prompts with active=False skip the
    GEMM chain and return ZERO masks (the everything-mode IoU gate: those
    candidates are dropped by the caller's own iou filter regardless of
    mask content). The gated path is inference-only (bypasses the
    custom VJP).

    blocked: return candidate-major blocked masks (B, M*16, HW) instead
    of interleaved (B, M, 4H, 4W) — the everything-mode decode keeps this
    layout end to end (stability counts + budget selection are layout-
    independent) and interleaves only the selected masks, skipping the
    per-candidate depth-to-space HBM relayout (~84 ms/tile of the
    crop_n_layers=1 budget on v5e). Inference-only (no VJP).
    """
    if blocked:
        return _upscale_fwd_impl(src, hyper_in, k1, b1, lnw, lnb, k2, b2,
                                 out_dtype, interpret, active=active,
                                 blocked=True)
    if active is not None:
        return _upscale_fwd_impl(src, hyper_in, k1, b1, lnw, lnb, k2, b2,
                                 out_dtype, interpret, active=active)
    return _upscale_cvjp(src, hyper_in, k1, b1, lnw, lnb, k2, b2,
                         out_dtype, interpret)


@functools.partial(jax.jit,
                   static_argnames=('out_dtype', 'interpret', 'blocked'))
def _upscale_fwd_impl(src, hyper_in, k1, b1, lnw, lnb, k2, b2,
                      out_dtype=jnp.float32,
                      interpret: bool | None = None, active=None,
                      blocked: bool = False):
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, h, w, c = src.shape
    if active is None:
        active = jnp.ones((b,), jnp.int32)
    active = active.astype(jnp.int32)
    m, c8 = hyper_in.shape[1:]
    c4 = k1.shape[1] // 4
    dt = k1.dtype
    f32 = jnp.float32

    # per-64-block averaging as one (4*c4, 4*c4) block-diagonal matrix:
    # mu_bcast = t1 @ M with M[c', c] = [block(c') == block(c)] / c4
    blocks = jnp.arange(4 * c4) // c4
    pool_m = (blocks[:, None] == blocks[None, :]).astype(dt) / c4
    lnw_t = jnp.tile(lnw[0], 4)[None].astype(f32)        # (1, 4*c4)
    lnb_t = jnp.tile(lnb[0], 4)[None].astype(f32)
    # ConvT2 on 2 of the 4 (dy, dx) blocks at once: block-diagonal GEMM
    # applied to each 128-lane half of t1 inside the kernel
    k2bd = jnp.kron(jnp.eye(2, dtype=dt), k2)            # (2*c4, 8*c8)
    b2_t = jnp.tile(b2[0], 4)[None].astype(f32)
    # per-prompt hypernetwork as a block-diagonal (16*c8, M*16) matrix:
    # Hbd[b, blk*c8 + ch, m*16 + blk'] = hyper[b, m, ch] * (blk == blk')
    # (blocked mode keeps it pre-transposed so the kernel's A @ B^T dot
    # emits the candidate-major block directly)
    if blocked:
        hbd = jnp.einsum('dg,bmc->bmgdc', jnp.eye(16, dtype=dt),
                         hyper_in.astype(dt)).reshape(b, m * 16, 16 * c8)
    else:
        hbd = jnp.einsum('dg,bmc->bdcmg', jnp.eye(16, dtype=dt),
                         hyper_in.astype(dt)).reshape(b, 16 * c8, m * 16)

    src_flat = src.reshape(b, h * w, c).astype(dt)
    pix = min(1024, h * w)
    grid = (b, (h * w) // pix)
    if blocked:
        out_shape = jax.ShapeDtypeStruct((b, m * 16, h * w), out_dtype)
        out_specs = pl.BlockSpec((1, m * 16, pix), lambda i, r: (i, 0, r),
                                 memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((b, h * w, m * 16), out_dtype)
        out_specs = pl.BlockSpec((1, pix, m * 16), lambda i, r: (i, r, 0),
                                 memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, blocked=blocked),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pix, c), lambda i, r: (i, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(k1.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b1.shape[1]), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pool_m.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lnw_t.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lnb_t.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(k2bd.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2_t.shape, lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + hbd.shape[1:], lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(jnp.broadcast_to(active[:, None, None], (b, 1, 128)),
      src_flat, k1, b1.astype(f32), pool_m, lnw_t,
      lnb_t, k2bd, b2_t, hbd)
    if blocked:
        return out                               # (B, M*16, HW)
    # depth-to-space on the blocked masks: col = (m, dy, dx, gy, gx)
    return _interleave(out, b, h, w, m)


def upscale_params_from_decoder(params, dtype):
    """Flatten a MaskDecoder param tree's upscale weights for the kernel.

    Same transformations as decoder.UpscaleLinear(flatten=True): kernels
    spatially flipped (lax ConvTranspose convention), reshaped to
    (C_in, 4*C_out) with block order (dy, dx, f); biases tiled 4x.
    """
    from regda_tpu.models.sam.decoder import flatten_convt_kernel

    def flat_kernel(kernel):
        return flatten_convt_kernel(kernel, dtype)

    k1 = flat_kernel(params['upscale_conv1']['kernel'])
    b1 = jnp.tile(params['upscale_conv1']['bias'], 4).astype(
        jnp.float32)[None]
    k2 = flat_kernel(params['upscale_conv2']['kernel'])
    b2 = jnp.tile(params['upscale_conv2']['bias'], 4).astype(
        jnp.float32)[None]
    lnw = params['upscale_ln']['weight'].astype(jnp.float32)[None]
    lnb = params['upscale_ln']['bias'].astype(jnp.float32)[None]
    return k1, b1, lnw, lnb, k2, b2
