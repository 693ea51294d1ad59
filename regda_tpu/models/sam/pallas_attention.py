"""Pallas TPU kernel: SAM ViT global attention with fused decomposed
rel-pos bias.

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
rel_pos_h[qh(q)-kh+K-1], shape (N, Kh) — computed OUTSIDE the kernel by the
same einsum the stock path uses, tiny at (heads, 4096, 64) f32) and EH/EW
are constant 0/1 expansion matrices (Kh, N) with EH[j, k] = [kh(k) == j].
The bias "broadcast" is thus an MXU matmul fused into the logits block, and
the (N, N) logits tensor never exists in HBM.

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


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, eh_ref, ew_ref, o_ref,
            *, scale: float):
    f32 = jnp.float32
    q = q_ref[0]                                           # (QB, D)
    k = k_ref[0]                                           # (N, D)
    v = v_ref[0]
    logits = jax.lax.dot_general(
        (q.astype(f32) * scale).astype(q.dtype), k,
        (((1,), (1,)), ((), ())), preferred_element_type=f32)  # (QB, N)
    logits += jnp.dot(rh_ref[0], eh_ref[...], preferred_element_type=f32)
    logits += jnp.dot(rw_ref[0], ew_ref[...], preferred_element_type=f32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=f32)
    o_ref[0] = (out / s).astype(o_ref.dtype)


def _expanders(n, kh, kw, dt):
    cols = jnp.arange(n)
    eh = (cols[None, :] // kw == jnp.arange(kh)[:, None]).astype(dt)
    ew = (cols[None, :] % kw == jnp.arange(kw)[:, None]).astype(dt)
    return eh, ew


def _attn_stock(q, k, v, rh, rw, scale, kh, kw):
    """Pure-XLA twin of the kernel (same op order); used as the VJP
    rule so the fused forward stays differentiable."""
    f32 = jnp.float32
    dt = q.dtype
    n = kh * kw
    eh, ew = _expanders(n, kh, kw, dt)
    logits = jnp.einsum('bnd,bmd->bnm', (q.astype(f32) * scale).astype(dt),
                        k, preferred_element_type=f32)
    logits += jnp.einsum('bnk,km->bnm', rh.astype(dt), eh,
                         preferred_element_type=f32)
    logits += jnp.einsum('bnk,km->bnm', rw.astype(dt), ew,
                         preferred_element_type=f32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.einsum('bnm,bmd->bnd', p.astype(v.dtype), v,
                     preferred_element_type=f32)
    return (out / s).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _attn_cvjp(q, k, v, rh, rw, scale, kh, kw, interpret):
    return _attn_fwd_impl(q, k, v, rh, rw, scale, kh, kw, interpret)


def _attn_fwd(q, k, v, rh, rw, scale, kh, kw, interpret):
    return (_attn_fwd_impl(q, k, v, rh, rw, scale, kh, kw, interpret),
            (q, k, v, rh, rw))


def _attn_bwd(scale, kh, kw, interpret, res, g):
    _, vjp = jax.vjp(
        lambda *a: _attn_stock(*a, scale, kh, kw), *res)
    return vjp(g)


_attn_cvjp.defvjp(_attn_fwd, _attn_bwd)


def attention_with_rel_bias(q, k, v, rh, rw, *, scale: float, kh: int,
                            kw: int, interpret: bool | None = None):
    """softmax((q*scale) @ k^T + expand(rh) + expand(rw)) @ v, fused.

    q/k/v: (BH, N, D) with N = kh*kw tokens in row-major (h, w) order;
    rh: (BH, N, kh) f32 q-contracted height bias; rw: (BH, N, kw) f32.
    Returns (BH, N, D) in q.dtype. Differentiable: backward is the VJP of
    the identical stock formula (_attn_stock).
    """
    return _attn_cvjp(q, k, v, rh, rw, scale, kh, kw, interpret)


@functools.partial(jax.jit,
                   static_argnames=('scale', 'kh', 'kw', 'interpret'))
def _attn_fwd_impl(q, k, v, rh, rw, scale: float, kh: int,
                   kw: int, interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    bh, n, d = q.shape
    assert n == kh * kw, (n, kh, kw)
    # bias expansion dots run in the compute dtype: in f32 they cost as
    # much as the attention matmuls themselves (half-rate MXU); in bf16
    # the bias carries the same precision as the bf16 q/k products it
    # joins (f32 accumulation either way)
    dt = q.dtype
    eh, ew = _expanders(n, kh, kw, dt)
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
    grid = (bh, n // qb)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, kh), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, kw), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, n), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, n), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, rh, rw, eh, ew)
