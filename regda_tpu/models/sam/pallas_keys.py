"""Pallas TPU kernel: SAM two-way decoder keys pipeline (LN + projections).

Everything-mode decodes B point prompts against one image embedding. After
each image-to-token update the per-prompt key state (B, T=4096, C=256) goes
through LayerNorm and then feeds several attention projections. XLA lowers
this as one fusion per consumer, so the 268 MB/chunk key tensor is re-read
for the LN moments, the norm4 materialization, and each of k/v/q — ~4.5 ms
per 128-prompt chunk of almost pure HBM re-reads on v5e (PERF.md).

This kernel makes one pass: it reconstructs the LN input from its ADDENDS
(shared image keys and/or the previous key state, plus the image-to-token
attention output still in its pre-out_proj (B, T, 128) form — half the
bytes of the materialized delta), applies out_proj + residual + LayerNorm
in VMEM, and emits the normalized keys together with every projection the
next stage needs:

    x     = [shared] + [prev] + delta_pre @ W_out + b_out
    keys  = LN(x) * w + b                     -> (B, T, C)   output
    out_i = (keys [+ pe]) @ W_i + b_i         -> (B, T, Dk)  outputs

Used twice per decode chunk: after layer-0's image-to-token update
(shared keys0 + delta -> keys1, k/v for layer-1 token-to-image, q for
layer-1 image-to-token) and after layer-1's (keys1 + delta -> keys2, k/v
for the final attention; keys2 is also the mask-upscaling source).

Same math as factored_decoder._two_way_block_dense (f32 LN moments,
eps 1e-5); equality asserted in
tests/test_sam.py::test_two_way_transformer_dense_fused_equals_stock.

Capability parity target: segment-anything's TwoWayTransformer as driven
by the reference's everything mode (regda/utils/local_region_homog.py:30-39);
built TPU-first rather than ported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, n_proj: int, has_shared: bool, has_prev: bool,
            add_pe: tuple, eps: float):
    it = iter(refs)
    f32 = jnp.float32
    delta_ref = next(it)
    shared_ref = next(it) if has_shared else None
    prev_ref = next(it) if has_prev else None
    pe_ref = next(it)
    wout_ref = next(it)
    bout_ref = next(it)
    lnw_ref = next(it)
    lnb_ref = next(it)
    proj_w = [next(it) for _ in range(n_proj)]
    proj_b = [next(it) for _ in range(n_proj)]
    keys_out_ref = next(it)
    proj_out = [next(it) for _ in range(n_proj)]

    dt = wout_ref.dtype
    x = jnp.dot(delta_ref[0], wout_ref[...], preferred_element_type=f32)
    x = x + bout_ref[0][None, :]
    if has_shared:
        x = x + shared_ref[...].astype(f32)
    if has_prev:
        x = x + prev_ref[0].astype(f32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * lnw_ref[0][None, :] + lnb_ref[0][None, :]
    keys = y.astype(dt)
    keys_out_ref[0] = keys
    pe = pe_ref[...].astype(dt)
    keys_pe = keys + pe
    for i in range(n_proj):
        src = keys_pe if add_pe[i] else keys
        out = jnp.dot(src, proj_w[i][...], preferred_element_type=f32)
        proj_out[i][0] = (out + proj_b[i][0][None, :]).astype(dt)


def _ln_project_stock(operands, add_pe, eps):
    """XLA twin of the kernel math; its VJP is the kernel's backward."""
    delta_pre, wout, bout, ln_w, ln_b, pe, projs, shared, prev = operands
    f32 = jnp.float32
    dt = wout.dtype
    x = jnp.einsum('btd,dc->btc', delta_pre.astype(dt), wout.astype(dt),
                   preferred_element_type=f32)
    x = x + bout.astype(f32)[None, None, :]
    if shared is not None:
        x = x + shared.astype(dt).astype(f32)[None]
    if prev is not None:
        x = x + prev.astype(dt).astype(f32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * ln_w.astype(f32) + ln_b.astype(f32)
    keys = y.astype(dt)
    keys_pe = keys + pe.astype(dt)[None]
    outs = []
    for i, (w, b) in enumerate(projs):
        src = keys_pe if add_pe[i] else keys
        o = jnp.einsum('btc,ck->btk', src, w.astype(dt),
                       preferred_element_type=f32)
        outs.append((o + b.astype(f32)[None, None, :]).astype(dt))
    return keys, tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _ln_project_cvjp(operands, add_pe, eps, block, interpret):
    return _ln_project_fwd_impl(operands, add_pe, eps, block, interpret)


def _ln_project_fwd(operands, add_pe, eps, block, interpret):
    return (_ln_project_fwd_impl(operands, add_pe, eps, block, interpret),
            operands)


def _ln_project_bwd(add_pe, eps, block, interpret, res, g):
    _, vjp = jax.vjp(lambda ops: _ln_project_stock(ops, add_pe, eps), res)
    return vjp(g)


_ln_project_cvjp.defvjp(_ln_project_fwd, _ln_project_bwd)


def ln_project(delta_pre, wout, bout, ln_w, ln_b, pe, projs,
               shared=None, prev=None, add_pe=(), eps: float = 1e-5,
               block: int = 1024, interpret: bool | None = None):
    """One-pass residual + LayerNorm + fan-out projections over key states.

    delta_pre: (B, T, Dp) pre-out_proj attention output; wout (Dp, C);
    shared: optional (T, C) broadcast addend; prev: optional (B, T, C);
    pe: (T, C) positional encoding; projs: sequence of (W (C, Dk), b (Dk,));
    add_pe: per-projection bool, True projects keys+pe instead of keys.
    Returns (keys (B, T, C), [proj_i (B, T, Dk)]).

    Differentiable: the backward pass is the VJP of the identical stock
    XLA formula (_ln_project_stock), same pattern as pallas_attention.
    """
    n_proj = len(projs)
    add_pe = tuple(bool(x) for x in add_pe) or (False,) * n_proj
    assert len(add_pe) == n_proj
    operands = (delta_pre, wout, bout, ln_w, ln_b, pe,
                tuple((w, b) for w, b in projs), shared, prev)
    keys, outs = _ln_project_cvjp(operands, add_pe, eps, block, interpret)
    return keys, list(outs)


@functools.partial(
    jax.jit, static_argnames=('add_pe', 'eps', 'block', 'interpret'))
def _ln_project_fwd_impl(operands, add_pe=(), eps: float = 1e-5,
                         block: int = 1024,
                         interpret: bool | None = None):
    delta_pre, wout, bout, ln_w, ln_b, pe, projs, shared, prev = operands
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, t, dp = delta_pre.shape
    c = wout.shape[1]
    dt = wout.dtype
    n_proj = len(projs)
    add_pe = tuple(bool(x) for x in add_pe) or (False,) * n_proj
    assert len(add_pe) == n_proj
    tb = block
    while t % tb:
        tb //= 2
    grid = (b, t // tb)

    operands = [delta_pre.astype(dt)]
    in_specs = [pl.BlockSpec((1, tb, dp), lambda i, r: (i, r, 0),
                             memory_space=pltpu.VMEM)]
    if shared is not None:
        operands.append(shared.astype(dt))
        in_specs.append(pl.BlockSpec((tb, c), lambda i, r: (r, 0),
                                     memory_space=pltpu.VMEM))
    if prev is not None:
        operands.append(prev.astype(dt))
        in_specs.append(pl.BlockSpec((1, tb, c), lambda i, r: (i, r, 0),
                                     memory_space=pltpu.VMEM))
    f32 = jnp.float32

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, r: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    operands.append(pe.astype(dt))
    in_specs.append(pl.BlockSpec((tb, c), lambda i, r: (r, 0),
                                 memory_space=pltpu.VMEM))
    operands += [wout.astype(dt), bout.astype(f32)[None],
                 ln_w.astype(f32)[None], ln_b.astype(f32)[None]]
    in_specs += [const_spec(wout.shape), const_spec((1, c)),
                 const_spec((1, c)), const_spec((1, c))]
    for w, _ in projs:
        operands.append(w.astype(dt))
        in_specs.append(const_spec(w.shape))
    for w, bias in projs:
        operands.append(bias.astype(f32)[None])
        in_specs.append(const_spec((1, w.shape[1])))

    out_shapes = [jax.ShapeDtypeStruct((b, t, c), dt)]
    out_specs = [pl.BlockSpec((1, tb, c), lambda i, r: (i, r, 0),
                              memory_space=pltpu.VMEM)]
    for w, _ in projs:
        out_shapes.append(jax.ShapeDtypeStruct((b, t, w.shape[1]), dt))
        out_specs.append(pl.BlockSpec((1, tb, w.shape[1]),
                                      lambda i, r: (i, r, 0),
                                      memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        functools.partial(_kernel, n_proj=n_proj,
                          has_shared=shared is not None,
                          has_prev=prev is not None,
                          add_pe=add_pe, eps=eps),
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*operands)
    # tuple (not list) so the output pytree structure matches
    # _ln_project_stock's for the custom-VJP cotangents
    return outs[0], tuple(outs[1:])
