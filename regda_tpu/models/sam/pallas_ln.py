"""Pallas TPU kernel: one-pass LayerNorm for the SAM ViT blocks.

XLA lowers each flax LayerNorm on the encoder's (1, 64, 64, 768) activations
as an f32-upcast reduce + normalize chain measured at ~235 us (54 GB/s
effective) on v5e — 24 of them cost ~5.6 ms of a ~31 ms ViT-B encode. This
kernel streams row blocks through VMEM once: f32 moments over the channel
lanes, normalize, affine, write back in the input dtype (~2 HBM passes at
full bandwidth).

Inference-path kernel (SAM's encoder is never trained in this framework);
REGDA_NO_PALLAS falls back to the stock flax op. Parameter names/shapes
match nn.LayerNorm ('scale'/'bias', (C,)), so checkpoint conversion is
unchanged; equality asserted in tests/test_sam.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    f32 = jnp.float32
    x = x_ref[...].astype(f32)                       # (RB, C)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * w_ref[0][None, :]
                  + b_ref[0][None, :]).astype(o_ref.dtype)


def _stock(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _layernorm_cvjp(x, scale, bias, eps, interpret):
    return _layernorm_fwd_impl(x, scale, bias, eps, interpret)


def _layernorm_fwd(x, scale, bias, eps, interpret):
    return _layernorm_fwd_impl(x, scale, bias, eps, interpret), \
        (x, scale, bias)


def _layernorm_bwd(eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda a, w, b: _stock(a, w, b, eps), x, scale, bias)
    return vjp(g)


_layernorm_cvjp.defvjp(_layernorm_fwd, _layernorm_bwd)


def layernorm(x, scale, bias, eps: float = 1e-6,
              interpret: bool | None = None):
    """LayerNorm over the last axis of x (any leading shape), f32 moments.

    Differentiable: the backward pass is the VJP of the identical stock
    XLA formula (the Pallas kernel only accelerates the forward)."""
    return _layernorm_cvjp(x, scale, bias, eps, interpret)


@functools.partial(jax.jit, static_argnames=('eps', 'interpret'))
def _layernorm_fwd_impl(x, scale, bias, eps: float = 1e-6,
                        interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    lead = x.shape[:-1]
    c = x.shape[-1]
    rows = 1
    for d in lead:
        rows *= d
    xf = x.reshape(rows, c)
    rb = None
    for cand in (512, 256, 128, 64):
        if rows % cand == 0:
            rb = cand
            break
    pad = 0
    if rb is None:
        # rows has no small power-of-two divisor (e.g. the 5-crop pyramid's
        # window-padded (5*70*70, 768) = 24500 rows): a single whole-array
        # block would need ~100 MB of VMEM. Pad to a block multiple instead
        # — LN is row-independent and zero rows normalize to bias (finite:
        # rsqrt(0 + eps)), then slice the pad off.
        rb = 256
        pad = (-rows) % rb
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    rows_p = rows + pad
    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows_p, c), x.dtype),
        grid=(rows_p // rb,),
        in_specs=[
            pl.BlockSpec((rb, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, scale.astype(f32)[None], bias.astype(f32)[None])
    if pad:
        out = out[:rows]
    return out.reshape(*lead, c)
