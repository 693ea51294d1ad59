"""Pallas TPU kernel: SAM ViT attention with fused decomposed rel-pos bias.

The encoder's four global-attention layers dominate its runtime in the XLA
lowering: logits are (heads, 4096, 4096) f32, and the decomposed rel-pos
add materializes TWO broadcast copies of that tensor plus two
layout-changing reshapes (to and from the 5-D (h, qh, qw, kh, kw) view) —
profiled at ~13-15 ms per layer on v5e, >60% of total encode time, all of
it HBM traffic on an 800 MB intermediate (see PERF.md).

This kernel keeps a q-block's logits entirely in VMEM:

    logits = (q_blk * scale) @ K^T  +  RH_blk @ EH  +  RW_blk @ EW
    out    = softmax(logits) @ V

where RH/RW are the q-contracted rel-pos tables (RH[q, kh] = q[q] .
rel_pos_h[qh(q)-kh+K-1] — computed OUTSIDE the kernel by the same einsum
the stock path uses) and EH/EW are constant 0/1 expansion matrices (Kh, N)
with EH[j, k] = [kh(k) == j]. The bias "broadcast" is thus an MXU matmul
fused into the logits block, and the (N, N) logits tensor never exists in
HBM.

Layout note (round 4): q/k/v are BlockSpec views of ONE (3, B, H, N, D)
tensor and the rel biases arrive in (B, H, N, K) order straight from
their einsums, so the only relayouts per block are the single qkv
transpose in and the head-merge transpose out. The previous interface
took three separate (B*H, N, D) tensors, whose slice+squeeze
materializations cost an extra ~1 ms/layer/5-crop-batch on v5e
(XProf-measured; see PERF.md round 4).

Exact math note: identical operations to the stock path (same einsum for
RH/RW, f32 logits, max-subtracted softmax); only association order differs,
so results agree to float rounding (asserted in tests/test_sam.py).

Capability parity target: segment-anything's ImageEncoderViT global
attention as used by the reference (regda/utils/local_region_homog.py:22);
built TPU-first rather than ported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(qkv_ref, rh_ref, rw_ref, eht_ref, ewt_ref, o_ref, *,
            scale: float, qb: int):
    f32 = jnp.float32
    # one (3, N, D) qkv block per (batch, head) — constant across the
    # q-block grid axis, so Pallas DMAs it once and q-blocks slice it.
    # qb == N (windowed layers, grid axis 2 is a single step) must read
    # the whole ref: a dynamic full-size slice trips Mosaic's aligned
    # vector loads when N is not sublane-divisible (e.g. 196)
    if qb == qkv_ref.shape[3]:
        q = qkv_ref[0, 0, 0]                               # (N, D)
        rh = rh_ref[0, 0]
        rw = rw_ref[0, 0]
    else:
        i = pl.program_id(2)
        q = qkv_ref[0, 0, 0, pl.ds(i * qb, qb), :]         # (QB, D)
        rh = rh_ref[0, 0]
        rw = rw_ref[0, 0]
    k = qkv_ref[1, 0, 0]                                   # (N, D)
    v = qkv_ref[2, 0, 0]
    # ONE K=(D+Kh+Kw) logits GEMM: [q*scale | rh | rw] @ [k | EH^T | EW^T]^T
    # — the same three contractions as separate dots, but the f32 (QB, N)
    # accumulator makes one pass through the MXU instead of three
    # (measured ~0.5 ms/layer per 5-crop batch on v5e)
    qcat = jnp.concatenate([(q.astype(f32) * scale).astype(q.dtype),
                            rh.astype(q.dtype), rw.astype(q.dtype)], axis=1)
    kcat = jnp.concatenate([k, eht_ref[...], ewt_ref[...]], axis=1)
    logits = jax.lax.dot_general(
        qcat, kcat, (((1,), (1,)), ((), ())),
        preferred_element_type=f32)                        # (QB, N)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=f32)
    o_ref[0, 0] = (out / s).astype(o_ref.dtype)


def _expanders(n, kh, kw, dt):
    cols = jnp.arange(n)
    eh = (cols[None, :] // kw == jnp.arange(kh)[:, None]).astype(dt)
    ew = (cols[None, :] % kw == jnp.arange(kw)[:, None]).astype(dt)
    return eh, ew


def _attn_stock(qkv, rh, rw, scale, kh, kw):
    """Pure-XLA twin of the kernel (same op order, same layouts); used as
    the VJP rule so the fused forward stays differentiable.

    qkv: (3, B, H, N, D); rh: (B, H, N, Kh); rw: (B, H, N, Kw).
    Returns (B, H, N, D)."""
    f32 = jnp.float32
    dt = qkv.dtype
    n = kh * kw
    q, k, v = qkv[0], qkv[1], qkv[2]                     # (B, H, N, D)
    eh, ew = _expanders(n, kh, kw, dt)
    logits = jnp.einsum('bhnd,bhmd->bhnm', (q.astype(f32) * scale).astype(dt),
                        k, preferred_element_type=f32)
    logits += jnp.einsum('bhnk,km->bhnm', rh.astype(dt), eh,
                         preferred_element_type=f32)
    logits += jnp.einsum('bhnk,km->bhnm', rw.astype(dt), ew,
                         preferred_element_type=f32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum('bhnm,bhmd->bhnd', p.astype(v.dtype), v,
                     preferred_element_type=f32)
    return (out / s).astype(qkv.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attn_cvjp(qkv, rh, rw, scale, kh, kw, interpret):
    return _attn_fwd_impl(qkv, rh, rw, scale, kh, kw, interpret)


def _attn_fwd(qkv, rh, rw, scale, kh, kw, interpret):
    return (_attn_fwd_impl(qkv, rh, rw, scale, kh, kw, interpret),
            (qkv, rh, rw))


def _attn_bwd(scale, kh, kw, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: _attn_stock(*a, scale, kh, kw), *res)
    return vjp(g)


_attn_cvjp.defvjp(_attn_fwd, _attn_bwd)


def attention_with_rel_bias(qkv, rh, rw, *, scale: float, kh: int,
                            kw: int, interpret: bool | None = None):
    """softmax((q*scale) @ k^T + expand(rh) + expand(rw)) @ v, fused.

    qkv: (3, B, H, N, D) with N = kh*kw tokens in row-major (h, w) order;
    rh: (B, H, N, kh) q-contracted height bias; rw: (B, H, N, kw).
    Returns (B, H, N, D) in qkv.dtype. The kernel reads q/k/v as
    BlockSpec views of the one qkv tensor — no per-head slices ever
    materialize. Differentiable: backward is the VJP of the identical
    stock formula (_attn_stock).
    """
    return _attn_cvjp(qkv, rh, rw, scale, kh, kw, interpret)


@functools.partial(jax.jit,
                   static_argnames=('scale', 'kh', 'kw', 'interpret'))
def _attn_fwd_impl(qkv, rh, rw, scale: float, kh: int,
                   kw: int, interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    three, b, h, n, d = qkv.shape
    assert three == 3 and n == kh * kw, (qkv.shape, kh, kw)
    # bias expansion dots run in the compute dtype: in f32 they cost as
    # much as the attention matmuls themselves (half-rate MXU); in bf16
    # the bias carries the same precision as the bf16 q/k products it
    # joins (f32 accumulation either way)
    dt = qkv.dtype
    eh, ew = _expanders(n, kh, kw, dt)
    eht, ewt = eh.T, ew.T                    # (N, Kh), (N, Kw) for kcat
    rh = rh.astype(dt)
    rw = rw.astype(dt)
    # qb=256 keeps the f32 logits block + its exp at 4 MB each — inside the
    # 16 MB scoped-VMEM budget with K/V and the expansion matrices (qb=512
    # OOMs the scoped allocator at N=4096)
    qb = n
    for cand in (256, 128):
        if n % cand == 0:
            qb = cand
            break
    grid = (b, h, n // qb)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, qb=qb),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, 1, 1, n, d), lambda bi, hi, i: (0, bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qb, kh), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, qb, kw), lambda bi, hi, i: (bi, hi, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, kh), lambda bi, hi, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, kw), lambda bi, hi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, qb, d),
                               lambda bi, hi, i: (bi, hi, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qkv, rh, rw, eht, ewt)
