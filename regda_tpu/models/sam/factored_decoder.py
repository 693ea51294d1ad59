"""Factored SAM mask decoder: low-rank per-prompt key state.

Everything-mode decodes B point prompts (B = points_per_batch, typically
128) against ONE image embedding. The stock two-way transformer
(decoder.py) replicates the (T=4096, C=256) image-token state per prompt
the moment the first image-to-token update lands, and every subsequent
key-side op (adds, LayerNorms, q/k/v projections of layers 1 and the final
attention) streams those (B, T, C) tensors through HBM — profiled at 32%
bandwidth / 6% FLOPs utilization on v5e, the dominant cost of SAM region
generation (see PERF.md).

This module removes that traffic by an exact algebraic reformulation, not
an approximation. Each image-to-token attention update is

    delta_b = concat_h(attn_b[h] @ vh_b[h]) @ W_out + b_out,

and since attn_b[h] is (T, N) with N = 7 prompt tokens, delta_b has rank
<= 8*N + 1 per prompt. The per-prompt key state therefore stays in the
factored form

    keys_b = diag(a_b) @ K  +  P_b @ Q_b

with K a SHARED (T, C) matrix, a_b a per-token scale, P_b (T, r) and
Q_b (r, C) thin factors (r grows 57 -> 59 -> 118 through the two layers).
LayerNorm maps this form to itself: its per-token moments are computable
from shared row-moments of K plus thin cross terms,

    mu    = a * rowmean(K) + P @ rowmean(Q)
    E[x^2] = a^2 * rowmean(K^2) + 2a * rowsum(P * F) + rowsum((P@M) * P),
             F = (Q @ K^T / C)^T,  M = Q @ Q^T / C,

and q/k/v projections distribute over the factors, so attention logits and
outputs against the key state cost O(T * r) per prompt instead of
O(T * C) materializations. Dense (B, T, C) keys are materialized exactly
once, at the mask-upscaling input.

Mathematically identical to decoder.MaskDecoder (same parameter tree; the
equality is asserted in tests/test_sam.py); float ordering differs so
results agree to rounding, not bitwise.

Capability parity target: segment-anything's MaskDecoder/TwoWayTransformer
as driven by the reference's everything-mode (regda/utils/
local_region_homog.py:30-39); built TPU-first rather than ported.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FactoredKeys(NamedTuple):
    """Per-prompt key state  keys_b = diag(a_b) @ K + P_b @ Q_b.

    a: (B, T) f32, K: (T, C) shared, P: (B, T, R), Q: (B, R, C).

    R is a STATIC padded rank (default 128): unused columns of P / rows of
    Q are zero and contribute nothing to any contraction, so every op can
    run on the full lane-aligned R. The used rank grows 0 -> 57 -> 59 ->
    116 -> 118 through the two decoder layers; growth writes into the
    preallocated buffer at static offsets (`used` below) instead of
    concatenating — profiled on v5e, the concat form spent ~5 ms per
    128-prompt chunk relayouting odd-rank (B, 4096, 57..118) tensors.
    """
    a: jnp.ndarray
    K: jnp.ndarray
    P: jnp.ndarray
    Q: jnp.ndarray


#: padded static rank: >= 2 * (heads * tokens + 1) + 4 for SAM's 7 prompt
#: tokens / 8 heads; lane-width aligned
RANK_PAD = 128


def _dense(params, x, dtype):
    return x.astype(dtype) @ params['kernel'].astype(dtype) + params[
        'bias'].astype(dtype)


def _split_heads(x, num_heads):
    *lead, n, d = x.shape
    return x.reshape(*lead, n, num_heads, d // num_heads)


def fk_layernorm(fk: FactoredKeys, scale, bias, used: int,
                 eps=1e-5) -> FactoredKeys:
    """LayerNorm over channels of a factored key state, staying factored.

    Moments in f32; the used rank grows by 2 (columns for the -mu shift and
    the LN bias, written at static offset `used` into the padded buffers).
    """
    a, K, P, Q = fk
    c = K.shape[-1]
    Kf = K.astype(jnp.float32)
    Pf = P.astype(jnp.float32)
    Qf = Q.astype(jnp.float32)
    m_k = Kf.mean(-1)                                    # (T,)
    s_k = (Kf * Kf).mean(-1)                             # (T,)
    m_q = Qf.mean(-1)                                    # (B, R)
    mu = a * m_k[None] + jnp.einsum('btr,br->bt', Pf, m_q)
    # F[b,t,r] = (Q @ K^T)[b,r,t] / C ; M[b] = Q Q^T / C
    f = jnp.einsum('brc,tc->btr', Qf, Kf) / c
    m = jnp.einsum('brc,bsc->brs', Qf, Qf) / c
    ex2 = (a * a * s_k[None]
           + 2.0 * a * jnp.einsum('btr,btr->bt', Pf, f)
           + jnp.einsum('btr,brs,bts->bt', Pf, m, Pf))
    # E[x^2]-mu^2 by cancellation from bf16-stored factors can round
    # slightly below -eps; clamp so rsqrt stays finite on the bf16 path
    var = jnp.maximum(ex2 - mu * mu, 0.0)
    s = jax.lax.rsqrt(var + eps)                         # (B, T)
    w = scale.astype(jnp.float32)
    dt = P.dtype
    bsz, t, _ = P.shape
    new_cols = jnp.stack([(s * mu).astype(dt),
                          jnp.ones_like(mu, dtype=dt)], axis=-1)
    new_p = jax.lax.dynamic_update_slice(
        P * s[..., None].astype(dt), new_cols, (0, 0, used))
    new_rows = jnp.stack(
        [jnp.broadcast_to((-w).astype(dt)[None], (bsz, c)),
         jnp.broadcast_to(bias.astype(dt)[None], (bsz, c))], axis=1)
    new_q = jax.lax.dynamic_update_slice(
        Q * w.astype(dt)[None, None], new_rows, (0, used, 0))
    return FactoredKeys(a * s, K * w.astype(K.dtype), new_p, new_q)


def fk_attn_logits(fk: FactoredKeys, pe, k_params, qh, num_heads, dtype):
    """softmax logits of token->image attention against factored keys.

    qh: (B, H, N, d) projected queries. k-side = k_proj(keys + pe); the
    projection distributes over diag(a) K + P Q + pe + bias.
    Returns (B, H, N, T) f32 (scaled by 1/sqrt(d)).
    """
    a, K, P, Q = fk
    w = k_params['kernel'].astype(dtype)                 # (C, dim)
    b = k_params['bias'].astype(dtype)
    kw = _split_heads(K.astype(dtype) @ w, num_heads)    # (T, H, d) shared
    pw = _split_heads(pe.astype(dtype) @ w + b, num_heads)
    qw = _split_heads(jnp.einsum('brc,cd->brd', Q.astype(dtype), w),
                      num_heads)                         # (B, r, H, d)
    d = qh.shape[-1]
    f32 = jnp.float32
    t_k = jnp.einsum('bhnd,thd->bhnt', qh, kw,
                     preferred_element_type=f32) * a[:, None, None, :]
    t_pe = jnp.einsum('bhnd,thd->bhnt', qh, pw, preferred_element_type=f32)
    y = jnp.einsum('bhnd,brhd->bhnr', qh, qw, preferred_element_type=f32)
    t_p = jnp.einsum('bhnr,btr->bhnt', y.astype(dtype), P,
                     preferred_element_type=f32)
    return (t_k + t_pe + t_p) / (d ** 0.5)


def fk_attn_values(fk: FactoredKeys, attn, v_params, num_heads, dtype):
    """attn @ v_proj(keys) for factored keys (value side carries NO pe).

    attn: (B, H, N, T) probabilities (rows sum to 1, so the projection
    bias contributes exactly b_v). Returns (B, N, dim).
    """
    a, K, P, Q = fk
    w = v_params['kernel'].astype(dtype)
    b = v_params['bias'].astype(dtype)
    kw = _split_heads(K.astype(dtype) @ w, num_heads)    # (T, H, d) shared
    qw = _split_heads(jnp.einsum('brc,cd->brd', Q.astype(dtype), w),
                      num_heads)                         # (B, r, H, d)
    attn_a = (attn * a[:, None, None, :]).astype(dtype)
    out = jnp.einsum('bhnt,thd->bhnd', attn_a, kw)
    ap = jnp.einsum('bhnt,btr->bhnr', attn.astype(dtype), P)
    out = out + jnp.einsum('bhnr,brhd->bhnd', ap, qw)
    bsz, h, n, dd = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(bsz, n, h * dd)
    return out + b


def fk_query_side(fk: FactoredKeys, pe, q_params, num_heads, dtype):
    """Image-to-token attention: q_proj(keys + pe) contracted against the
    (tiny) token-side keys. Returns a function of kh (B, H, N, d) giving
    logits (B, H, T, N) f32."""
    a, K, P, Q = fk
    w = q_params['kernel'].astype(dtype)
    b = q_params['bias'].astype(dtype)
    kw = _split_heads(K.astype(dtype) @ w, num_heads)    # (T, H, d) shared
    pw = _split_heads(pe.astype(dtype) @ w + b, num_heads)
    qw = _split_heads(jnp.einsum('brc,cd->brd', Q.astype(dtype), w),
                      num_heads)                         # (B, r, H, d)

    def logits(kh):
        d = kh.shape[-1]
        f32 = jnp.float32
        t_k = jnp.einsum('thd,bhnd->bhtn', kw, kh,
                         preferred_element_type=f32) * a[:, None, :, None]
        t_pe = jnp.einsum('thd,bhnd->bhtn', pw, kh,
                          preferred_element_type=f32)
        y = jnp.einsum('brhd,bhnd->bhrn', qw, kh, preferred_element_type=f32)
        t_p = jnp.einsum('btr,bhrn->bhtn', P, y.astype(dtype),
                         preferred_element_type=f32)
        return (t_k + t_pe + t_p) / (d ** 0.5)

    return logits


def fk_append_update(fk: FactoredKeys, attn_img, vh, out_params, dtype,
                     used: int) -> FactoredKeys:
    """keys += out_proj(concat_h(attn_img[h] @ vh[h])): rank-(H*N+1) append
    written at static offset `used` into the padded buffers.

    attn_img: (B, H, T, N) probabilities; vh: (B, H, N, d) projected values.
    """
    a, K, P, Q = fk
    b_total, h, t, n = attn_img.shape
    d = vh.shape[-1]
    w_out = out_params['kernel'].astype(dtype)           # (H*d, C)
    b_out = out_params['bias'].astype(dtype)
    # row block h of the new Q factor: vh[h] @ W_out[h*d:(h+1)*d]
    w_blocks = w_out.reshape(h, d, -1)
    vq = jnp.einsum('bhnd,hdc->bhnc', vh, w_blocks)      # (B, H, N, C)
    new_p = attn_img.transpose(0, 2, 1, 3).reshape(b_total, t, h * n)
    ones = jnp.ones((b_total, t, 1), dtype)
    new_q = vq.reshape(b_total, h * n, -1)
    bias_row = jnp.broadcast_to(b_out[None, None], (b_total, 1, K.shape[-1]))
    return FactoredKeys(
        a,
        K,
        jax.lax.dynamic_update_slice(
            P, jnp.concatenate([new_p.astype(dtype), ones], axis=-1),
            (0, 0, used)),
        jax.lax.dynamic_update_slice(
            Q, jnp.concatenate([new_q.astype(dtype), bias_row], axis=1),
            (0, used, 0)))


def fk_materialize(fk: FactoredKeys, dtype):
    a, K, P, Q = fk
    return (a[..., None].astype(dtype) * K.astype(dtype)[None]
            + jnp.einsum('btr,brc->btc', P, Q))


def _layernorm(x, scale, bias, eps=1e-5):
    # NOTE: routing the big key-state LNs through the Pallas one-pass
    # kernel (pallas_ln.py) measured SLOWER end-to-end (5.26 vs 5.57
    # tiles/s): XLA already folds these LNs into each consuming projection
    # fusion, so a materialized LN output costs an extra full pass. The
    # kernel only wins where the LN output has a single consumer (the
    # encoder blocks).
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _attention_dense(params, q, k, v, num_heads, dtype):
    """Stock attention: mirrors decoder.AttentionDS. jnp.matmul broadcasting
    lets a batch-1 side (shared image tokens) pair with B-prompt tokens."""
    qp = _dense(params['q_proj'], q, dtype)
    kp = _dense(params['k_proj'], k, dtype)
    vp = _dense(params['v_proj'], v, dtype)
    d = qp.shape[-1] // num_heads

    def split(x):
        b, n, _ = x.shape
        return x.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = split(qp), split(kp), split(vp)
    attn = (qh @ kh.swapaxes(-1, -2)) / (d ** 0.5)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    out = attn.astype(vh.dtype) @ vh
    b, h, n, dd = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dd)
    return _dense(params['out_proj'], out, dtype)


def _proj_heads(params, x, num_heads, dtype):
    y = _dense(params, x, dtype)
    b, n, dim = y.shape
    return y.reshape(b, n, num_heads, dim // num_heads).transpose(0, 2, 1, 3)


def _cross_t2i(params, queries, query_pe, fk, key_pe, num_heads, dtype):
    """queries += Attn(q=queries+pe, k=keys+pe, v=keys) with factored keys."""
    q = queries + query_pe
    qh = _proj_heads(params['q_proj'], q, num_heads, dtype)
    logits = fk_attn_logits(fk, key_pe, params['k_proj'], qh, num_heads,
                            dtype)
    attn = jax.nn.softmax(logits, axis=-1)
    out = fk_attn_values(fk, attn, params['v_proj'], num_heads, dtype)
    return queries + _dense(params['out_proj'], out, dtype)


def _cross_i2t(params, queries, query_pe, fk, key_pe, num_heads, dtype,
               used: int) -> FactoredKeys:
    """keys += Attn(q=keys+pe, k=queries+pe, v=queries): factored append."""
    q = queries + query_pe
    kh = _proj_heads(params['k_proj'], q, num_heads, dtype)
    vh = _proj_heads(params['v_proj'], queries, num_heads, dtype)
    logits = fk_query_side(fk, key_pe, params['q_proj'], num_heads,
                           dtype)(kh)
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return fk_append_update(fk, attn, vh, params['out_proj'], dtype, used)


def _two_way_block(params, queries, fk, query_pe, key_pe,
                   skip_first_layer_pe, num_heads, dtype, used: int):
    if skip_first_layer_pe:
        queries = _attention_dense(params['self_attn'], queries, queries,
                                   queries, num_heads, dtype)
    else:
        q = queries + query_pe
        queries = queries + _attention_dense(params['self_attn'], q, q,
                                             queries, num_heads, dtype)
    queries = _layernorm(queries, params['norm1']['scale'],
                         params['norm1']['bias'])
    queries = _cross_t2i(params['cross_attn_token_to_image'], queries,
                         query_pe, fk, key_pe, num_heads, dtype)
    queries = _layernorm(queries, params['norm2']['scale'],
                         params['norm2']['bias'])
    mlp = _dense(params['mlp_lin1'], queries, dtype)
    mlp = jax.nn.relu(mlp)
    mlp = _dense(params['mlp_lin2'], mlp, dtype)
    queries = _layernorm(queries + mlp, params['norm3']['scale'],
                         params['norm3']['bias'])
    fk = _cross_i2t(params['cross_attn_image_to_token'], queries, query_pe,
                    fk, key_pe, num_heads, dtype, used)
    used += num_heads * queries.shape[1] + 1
    fk = fk_layernorm(fk, params['norm4']['scale'], params['norm4']['bias'],
                      used)
    used += 2
    return queries, fk, used


def _two_way_block_dense(params, queries, keys, query_pe, key_pe,
                         skip_first_layer_pe, num_heads, dtype):
    """Stock (materialized-keys) twin of decoder.TwoWayAttentionBlock as a
    pure function of the param tree; batch-1 keys broadcast to B prompts
    lazily through jnp.matmul."""
    if skip_first_layer_pe:
        queries = _attention_dense(params['self_attn'], queries, queries,
                                   queries, num_heads, dtype)
    else:
        q = queries + query_pe
        queries = queries + _attention_dense(params['self_attn'], q, q,
                                             queries, num_heads, dtype)
    queries = _layernorm(queries, params['norm1']['scale'],
                         params['norm1']['bias'])
    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _attention_dense(
        params['cross_attn_token_to_image'], q, k, keys, num_heads, dtype)
    queries = _layernorm(queries, params['norm2']['scale'],
                         params['norm2']['bias'])
    mlp = jax.nn.relu(_dense(params['mlp_lin1'], queries, dtype))
    mlp = _dense(params['mlp_lin2'], mlp, dtype)
    queries = _layernorm(queries + mlp, params['norm3']['scale'],
                         params['norm3']['bias'])
    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _attention_dense(
        params['cross_attn_image_to_token'], k, q, queries, num_heads, dtype)
    keys = _layernorm(keys, params['norm4']['scale'], params['norm4']['bias'])
    return queries, keys


def two_way_transformer_dense(params, image_embedding, image_pe,
                              point_embedding, num_heads=8,
                              dtype=jnp.float32):
    """Stock twin of decoder.TwoWayTransformer.__call__ as a pure function
    (image side batch-1, shared across prompts until the first
    image-to-token update — decoder.py's shared layer-0 fast path)."""
    b1, h, w, c = image_embedding.shape
    keys = image_embedding.reshape(b1, h * w, c).astype(dtype)
    key_pe = image_pe.reshape(-1, h * w, c).astype(dtype)
    queries = point_embedding.astype(dtype)
    for i in range(2):
        queries, keys = _two_way_block_dense(
            params[f'layer{i}'], queries, keys,
            point_embedding.astype(dtype), key_pe,
            skip_first_layer_pe=(i == 0), num_heads=num_heads, dtype=dtype)
    q = queries + point_embedding.astype(dtype)
    k = keys + key_pe
    queries = queries + _attention_dense(
        params['final_attn_token_to_image'], q, k, keys, num_heads, dtype)
    queries = _layernorm(queries, params['norm_final_attn']['scale'],
                         params['norm_final_attn']['bias'])
    return queries, keys


def _heads(x, num_heads):
    b, n, dim = x.shape
    return x.reshape(b, n, num_heads, dim // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _attn_tok2img(qp, k_img, v_img, num_heads):
    """Token-side queries against pre-projected image keys/values.

    qp (B, N, D), k_img/v_img (B or 1, T, D) -> (B, N, D). Same op order
    as _attention_dense after its projections."""
    qh, kh, vh = (_heads(x, num_heads) for x in (qp, k_img, v_img))
    d = qh.shape[-1]
    attn = (qh @ kh.swapaxes(-1, -2)) / (d ** 0.5)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    return _merge_heads(attn.astype(vh.dtype) @ vh)


def _attn_img2tok(q_img, k_tok, v_tok, num_heads):
    """Image-side queries against token keys/values, WITHOUT the output
    projection: q_img (B or 1, T, D), k_tok/v_tok (B, N, D) -> (B, T, D)
    pre-out_proj (ln_project folds the out_proj in)."""
    qh, kh, vh = (_heads(x, num_heads) for x in (q_img, k_tok, v_tok))
    d = qh.shape[-1]
    attn = (qh @ kh.swapaxes(-1, -2)) / (d ** 0.5)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    return _merge_heads(attn.astype(vh.dtype) @ vh)


def two_way_transformer_dense_fused(params, image_embedding, image_pe,
                                    point_embedding, num_heads=8,
                                    dtype=jnp.float32):
    """two_way_transformer_dense with the keys pipeline (residual + norm4 +
    key-side projections) fused into the Pallas ln_project kernel
    (pallas_keys.py) — one HBM pass per LN stage instead of one per
    consumer. Identical math; requires a batch-1 (shared) image embedding,
    which is exactly the everything-mode setting."""
    from regda_tpu.models.sam.pallas_keys import ln_project
    b1, h, w, c = image_embedding.shape
    assert b1 == 1, 'fused dense decoder requires a shared image embedding'
    t = h * w
    keys0 = image_embedding.reshape(1, t, c).astype(dtype)
    key_pe = image_pe.reshape(-1, t, c).astype(dtype)
    qpe = point_embedding.astype(dtype)
    queries = qpe
    l0, l1 = params['layer0'], params['layer1']

    # ---- layer 0: queries path on SHARED keys (batch-1 broadcasts) ----
    queries = _attention_dense(l0['self_attn'], queries, queries, queries,
                               num_heads, dtype)
    queries = _layernorm(queries, l0['norm1']['scale'], l0['norm1']['bias'])
    k = keys0 + key_pe
    queries = queries + _attention_dense(
        l0['cross_attn_token_to_image'], queries + qpe, k, keys0,
        num_heads, dtype)
    queries = _layernorm(queries, l0['norm2']['scale'], l0['norm2']['bias'])
    mlp = _dense(l0['mlp_lin2'], jax.nn.relu(
        _dense(l0['mlp_lin1'], queries, dtype)), dtype)
    queries = _layernorm(queries + mlp, l0['norm3']['scale'],
                         l0['norm3']['bias'])
    i2t0 = l0['cross_attn_image_to_token']
    q_img = _dense(i2t0['q_proj'], k, dtype)               # (1, T, D) shared
    delta0 = _attn_img2tok(q_img,
                           _dense(i2t0['k_proj'], queries + qpe, dtype),
                           _dense(i2t0['v_proj'], queries, dtype),
                           num_heads)                      # (B, T, D)

    t2i1 = l1['cross_attn_token_to_image']
    i2t1 = l1['cross_attn_image_to_token']
    keys1, (k1, v1, q1_img) = ln_project(
        delta0, i2t0['out_proj']['kernel'], i2t0['out_proj']['bias'],
        l0['norm4']['scale'], l0['norm4']['bias'], key_pe[0],
        projs=[(t2i1['k_proj']['kernel'], t2i1['k_proj']['bias']),
               (t2i1['v_proj']['kernel'], t2i1['v_proj']['bias']),
               (i2t1['q_proj']['kernel'], i2t1['q_proj']['bias'])],
        shared=keys0[0], add_pe=(True, False, True))

    # ---- layer 1: queries path against pre-projected keys ----
    q = queries + qpe
    queries = queries + _attention_dense(l1['self_attn'], q, q, queries,
                                         num_heads, dtype)
    queries = _layernorm(queries, l1['norm1']['scale'], l1['norm1']['bias'])
    out = _attn_tok2img(_dense(t2i1['q_proj'], queries + qpe, dtype),
                        k1, v1, num_heads)
    queries = queries + _dense(t2i1['out_proj'], out, dtype)
    queries = _layernorm(queries, l1['norm2']['scale'], l1['norm2']['bias'])
    mlp = _dense(l1['mlp_lin2'], jax.nn.relu(
        _dense(l1['mlp_lin1'], queries, dtype)), dtype)
    queries = _layernorm(queries + mlp, l1['norm3']['scale'],
                         l1['norm3']['bias'])
    delta1 = _attn_img2tok(q1_img,
                           _dense(i2t1['k_proj'], queries + qpe, dtype),
                           _dense(i2t1['v_proj'], queries, dtype),
                           num_heads)

    fat = params['final_attn_token_to_image']
    keys2, (kf, vf) = ln_project(
        delta1, i2t1['out_proj']['kernel'], i2t1['out_proj']['bias'],
        l1['norm4']['scale'], l1['norm4']['bias'], key_pe[0],
        projs=[(fat['k_proj']['kernel'], fat['k_proj']['bias']),
               (fat['v_proj']['kernel'], fat['v_proj']['bias'])],
        prev=keys1, add_pe=(True, False))

    out = _attn_tok2img(_dense(fat['q_proj'], queries + qpe, dtype),
                        kf, vf, num_heads)
    queries = queries + _dense(fat['out_proj'], out, dtype)
    queries = _layernorm(queries, params['norm_final_attn']['scale'],
                         params['norm_final_attn']['bias'])
    return queries, keys2


def _fused_prep(params, image_embedding, image_pe, point_embedding,
                num_heads, dtype):
    """Shared prep for the prompt-resident Pallas kernels: runs the
    token-local layer-0 query path + layer-1 self-attention in XLA and
    packs the kernel operand tuple (see pallas_twoway.two_way_fused)."""
    from regda_tpu.models.sam.pallas_twoway import NP
    b1, h, w, c = image_embedding.shape
    assert b1 == 1, 'fused two-way requires a shared image embedding'
    t = h * w
    keys0 = image_embedding.reshape(t, c).astype(dtype)
    key_pe = image_pe.reshape(-1, t, c)[0].astype(dtype)
    qpe = point_embedding.astype(dtype)
    queries = qpe
    l0, l1 = params['layer0'], params['layer1']

    # ---- layer 0 query path on SHARED keys (token-local + batch-1) ----
    queries = _attention_dense(l0['self_attn'], queries, queries, queries,
                               num_heads, dtype)
    queries = _layernorm(queries, l0['norm1']['scale'], l0['norm1']['bias'])
    k = (keys0 + key_pe)[None]
    queries = queries + _attention_dense(
        l0['cross_attn_token_to_image'], queries + qpe, k, keys0[None],
        num_heads, dtype)
    queries = _layernorm(queries, l0['norm2']['scale'], l0['norm2']['bias'])
    mlp = _dense(l0['mlp_lin2'], jax.nn.relu(
        _dense(l0['mlp_lin1'], queries, dtype)), dtype)
    queries = _layernorm(queries + mlp, l0['norm3']['scale'],
                         l0['norm3']['bias'])
    i2t0 = l0['cross_attn_image_to_token']
    ktok0 = _dense(i2t0['k_proj'], queries + qpe, dtype)    # (B, N, D)
    vtok0 = _dense(i2t0['v_proj'], queries, dtype)
    qimg0 = _dense(i2t0['q_proj'], keys0 + key_pe, dtype)   # (T, D)

    # ---- layer 1 self-attention + norm1 (token-local) -----------------
    q = queries + qpe
    queries1 = queries + _attention_dense(l1['self_attn'], q, q, queries,
                                          num_heads, dtype)
    queries1 = _layernorm(queries1, l1['norm1']['scale'],
                          l1['norm1']['bias'])

    bsz, n, _ = queries1.shape
    pad = NP - n
    assert pad >= 0, f'two_way_fused supports <= {NP} tokens, got {n}'
    padf = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    maskb = jnp.where(jnp.arange(NP) < n, 0.0, -1e9)[None].astype(
        jnp.float32)
    t2i1 = l1['cross_attn_token_to_image']
    i2t1 = l1['cross_attn_image_to_token']
    fat = params['final_attn_token_to_image']
    weights = {
        'wo0': i2t0['out_proj']['kernel'], 'bo0': i2t0['out_proj']['bias'],
        'n40w': l0['norm4']['scale'], 'n40b': l0['norm4']['bias'],
        'wqt': t2i1['q_proj']['kernel'], 'bqt': t2i1['q_proj']['bias'],
        'wkt': t2i1['k_proj']['kernel'], 'bkt': t2i1['k_proj']['bias'],
        'wvt': t2i1['v_proj']['kernel'], 'bvt': t2i1['v_proj']['bias'],
        'wot': t2i1['out_proj']['kernel'], 'bot': t2i1['out_proj']['bias'],
        'n2w': l1['norm2']['scale'], 'n2b': l1['norm2']['bias'],
        'w1': l1['mlp_lin1']['kernel'], 'b1': l1['mlp_lin1']['bias'],
        'w2': l1['mlp_lin2']['kernel'], 'b2': l1['mlp_lin2']['bias'],
        'n3w': l1['norm3']['scale'], 'n3b': l1['norm3']['bias'],
        'wqi': i2t1['q_proj']['kernel'], 'bqi': i2t1['q_proj']['bias'],
        'wki': i2t1['k_proj']['kernel'], 'bki': i2t1['k_proj']['bias'],
        'wvi': i2t1['v_proj']['kernel'], 'bvi': i2t1['v_proj']['bias'],
        'woi': i2t1['out_proj']['kernel'], 'boi': i2t1['out_proj']['bias'],
        'n41w': l1['norm4']['scale'], 'n41b': l1['norm4']['bias'],
        'wqf': fat['q_proj']['kernel'], 'bqf': fat['q_proj']['bias'],
        'wkf': fat['k_proj']['kernel'], 'bkf': fat['k_proj']['bias'],
        'wvf': fat['v_proj']['kernel'], 'bvf': fat['v_proj']['bias'],
        'wof': fat['out_proj']['kernel'], 'bof': fat['out_proj']['bias'],
        'nfw': params['norm_final_attn']['scale'],
        'nfb': params['norm_final_attn']['bias'],
    }
    operands = (padf(ktok0), padf(vtok0), padf(queries1), padf(qpe),
                keys0, key_pe, qimg0, maskb, weights)
    return operands, n


def two_way_transformer_fused2(params, image_embedding, image_pe,
                               point_embedding, num_heads=8,
                               dtype=jnp.float32, interpret=None):
    """two_way_transformer_dense with the whole prompt-resident core
    (layer-0 image-to-token through the final attention) in ONE Pallas
    kernel per prompt (pallas_twoway.py). The token-local layer-0 query
    path and layer-1 self-attention stay in XLA. Identical math; requires
    a batch-1 (shared) image embedding — the everything-mode setting."""
    from regda_tpu.models.sam.pallas_twoway import two_way_fused
    operands, n = _fused_prep(params, image_embedding, image_pe,
                              point_embedding, num_heads, dtype)
    keys2, qout = two_way_fused(operands, num_heads, interpret)
    return qout[:, :n], keys2


def mask_decoder_mono(params, image_embedding, image_pe, point_embedding,
                      num_heads=8, dtype=jnp.float32,
                      mask_dtype=jnp.float32, interpret=None,
                      iou_gate_thresh=None, blocked_masks=False):
    """Monolithic decode: two-way transformer + hypernetwork MLPs + mask
    head in ONE Pallas program per prompt (pallas_monodecode.py) — the
    per-prompt key state never leaves VMEM. Returns (queries (B, n, C),
    masks (B, 3, 4H, 4W), iou). params: the full MaskDecoder param tree.

    iou_gate_thresh: enable the in-kernel IoU gate (inference-only;
    see pallas_monodecode.mono_decode) at pred_iou_thresh. When enabled,
    iou is the kernel's (B, 3) f32 iou predictions — the CANONICAL filter
    array (the gate decided from these same numbers); otherwise None and
    the caller computes the iou head from the returned queries."""
    from regda_tpu.models.sam.pallas_monodecode import mono_decode
    from regda_tpu.models.sam.pallas_upscale import (
        upscale_params_from_decoder)
    operands, n = _fused_prep(params['transformer'], image_embedding,
                              image_pe, point_embedding, num_heads, dtype)
    hyper_w = tuple(
        (params[f'hyper_mlp{m}']['lin0']['kernel'],
         params[f'hyper_mlp{m}']['lin0']['bias'],
         params[f'hyper_mlp{m}']['lin1']['kernel'],
         params[f'hyper_mlp{m}']['lin1']['bias'],
         params[f'hyper_mlp{m}']['lin2']['kernel'],
         params[f'hyper_mlp{m}']['lin2']['bias']) for m in (1, 2, 3))
    up_w = upscale_params_from_decoder(params, dtype)
    iou_w = None
    if iou_gate_thresh is not None:
        ih = params['iou_prediction_head']
        iou_w = (ih['lin0']['kernel'], ih['lin0']['bias'],
                 ih['lin1']['kernel'], ih['lin1']['bias'],
                 ih['lin2']['kernel'], ih['lin2']['bias'])
    out = mono_decode(operands, hyper_w, up_w, num_heads,
                      out_dtype=mask_dtype, interpret=interpret,
                      iou_w=iou_w, iou_thresh=iou_gate_thresh,
                      blocked=blocked_masks)
    if iou_gate_thresh is not None:
        masks, qout, iou = out
        return qout[:, :n], masks, iou
    masks, qout = out
    return qout[:, :n], masks, None


def two_way_transformer_factored(params, image_embedding, image_pe,
                                 point_embedding, num_heads=8,
                                 dtype=jnp.float32):
    """Factored twin of decoder.TwoWayTransformer.__call__.

    image_embedding: (1, H, W, C) SHARED image tokens (batch must be 1 —
    the whole point is that the image side is common to all prompts);
    point_embedding: (B, N, C). Returns (queries (B, N, C),
    keys (B, T, C) materialized in `dtype`).
    """
    b1, h, w, c = image_embedding.shape
    assert b1 == 1, 'factored decoder requires a shared image embedding'
    t = h * w
    bsz = point_embedding.shape[0]
    n_tok = point_embedding.shape[1]
    rank_need = 2 * (num_heads * n_tok + 1 + 2)
    rank = RANK_PAD if rank_need <= RANK_PAD else rank_need
    keys0 = image_embedding.reshape(t, c)
    key_pe = image_pe.reshape(t, c)
    queries = point_embedding.astype(dtype)
    fk = FactoredKeys(
        a=jnp.ones((bsz, t), jnp.float32),
        K=keys0.astype(dtype),
        P=jnp.zeros((bsz, t, rank), dtype),
        Q=jnp.zeros((bsz, rank, c), dtype))
    used = 0
    for i in range(2):
        queries, fk, used = _two_way_block(
            params[f'layer{i}'], queries, fk, point_embedding.astype(dtype),
            key_pe, skip_first_layer_pe=(i == 0), num_heads=num_heads,
            dtype=dtype, used=used)
    queries = _cross_t2i(params['final_attn_token_to_image'], queries,
                         point_embedding.astype(dtype), fk, key_pe,
                         num_heads, dtype)
    queries = _layernorm(queries, params['norm_final_attn']['scale'],
                         params['norm_final_attn']['bias'])
    return queries, fk_materialize(fk, dtype)


def _upscale_linear_flat(params, x, dtype):
    """2x2/s2 ConvTranspose as a flat per-pixel GEMM, depth-to-space
    deferred: (..., C_in) -> (..., 4*features), channel blocks (dy, dx, f).
    Mirrors decoder.UpscaleLinear(flatten=True)."""
    from regda_tpu.models.sam.decoder import flatten_convt_kernel
    y = x.astype(dtype) @ flatten_convt_kernel(params['kernel'], dtype)
    return y + jnp.tile(params['bias'], 4).astype(dtype)


def _layernorm2d(params, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * params['weight'].astype(jnp.float32)
            + params['bias'].astype(jnp.float32)).astype(x.dtype)


def _mlp(params, x, num_layers, dtype, sigmoid_output=False):
    for i in range(num_layers - 1):
        x = jax.nn.relu(_dense(params[f'lin{i}'], x, dtype))
    x = _dense(params[f'lin{num_layers - 1}'], x, dtype)
    if sigmoid_output:
        x = jax.nn.sigmoid(x)
    return x


def mask_decoder_fast(params, image_embeddings, image_pe, sparse_prompt,
                      dense_prompt, multimask_output=True,
                      num_multimask_outputs=3, num_heads=8,
                      dtype=jnp.float32, factored=True,
                      fused_upscale=False, mask_dtype=None,
                      iou_gate_thresh=None, blocked_masks=False):
    """Pure-function twin of decoder.MaskDecoder.__call__ (same param tree)
    with selectable fast paths:

    - factored: low-rank per-prompt key state through the transformer
      (two_way_transformer_factored) vs the stock materialized form.
    - fused_upscale: the Pallas fused upscale+hypernetwork kernel
      (pallas_upscale.py) vs flat GEMMs.
    - iou_gate_thresh: per-prompt IoU gate — prompts whose every returned
      IoU fails pred_iou_thresh skip the mask head and return zero masks
      (output-identical for everything-mode consumers, which drop those
      candidates anyway; inference-only). Both paths gate and filter on
      the SAME iou array, so no margin is needed: the mono kernel runs
      the iou head in-kernel and returns it as the canonical iou_pred;
      the two-step fused path hoists the exact XLA iou head ahead of the
      mask head and feeds it to the upscale kernel's active flags.

    image_embeddings / dense_prompt must be batch-1 (shared across the B
    sparse prompts) — exactly the everything-mode point-prompt setting.

    blocked_masks: return masks in the candidate-major BLOCKED layout
    (B, M*16, HW) instead of interleaved (B, M, 4H, 4W) — see
    pallas_stability's module note; the everything-mode decode scores
    stability and selects the mask budget in this layout and interleaves
    only the survivors. The mono path emits the same layout straight from
    VMEM (pallas_monodecode blocked=True).
    """
    num_mask_tokens = num_multimask_outputs + 1
    b = sparse_prompt.shape[0]
    output_tokens = jnp.concatenate([params['iou_token'],
                                     params['mask_tokens']], axis=0)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens[None].astype(sparse_prompt.dtype),
                          (b, *output_tokens.shape)), sparse_prompt], axis=1)

    src_shared = image_embeddings + dense_prompt[:1]
    import os as _os
    pe4 = image_pe[None] if image_pe.ndim == 3 else image_pe
    mono_ok = (fused_upscale and not factored and multimask_output
               and num_multimask_outputs == 3)
    # opt-in until the on-chip A/B with the blocked layout decides the
    # default (the interleaved-output A/B measured mono ~even with the
    # two-step path; blocked output removes the relayout that inverted
    # its win under exact stability)
    if (mono_ok
            and (_os.environ.get('REGDA_MONO_DECODE')
                 and not _os.environ.get('REGDA_NO_MONO'))):
        # monolithic per-prompt decode (pallas_monodecode.py): the key
        # state never leaves VMEM between the transformer and mask head
        hs, masks, iou_k = mask_decoder_mono(
            params, src_shared, pe4, tokens, num_heads=num_heads,
            dtype=dtype, mask_dtype=mask_dtype or jnp.float32,
            iou_gate_thresh=iou_gate_thresh,
            blocked_masks=blocked_masks)
        if iou_k is not None:
            # gated: the kernel's iou IS the filter array (the gate
            # decided from it — see pallas_monodecode), computed from the
            # f32 qfin rather than the dt-rounded queries output
            return masks, iou_k
        iou_pred = _mlp(params['iou_prediction_head'], hs[:, 0], 3,
                        jnp.float32)
        return masks, iou_pred[:, 1:]
    if factored:
        transformer = two_way_transformer_factored
    elif fused_upscale and (
            _os.environ.get('REGDA_FUSED_TWOWAY')
            or (jax.default_backend() == 'tpu'
                and not _os.environ.get('REGDA_NO_TWOWAY'))):
        # prompt-resident fused two-way kernel (pallas_twoway.py):
        # 11.43 -> 6.57 ms per 128-prompt chunk on v5e (PERF.md round 2).
        # Default on TPU; interpret mode stays opt-in (REGDA_FUSED_TWOWAY)
        transformer = two_way_transformer_fused2
    elif fused_upscale and _os.environ.get('REGDA_FUSED_KEYS'):
        # opt-in: the ln_project kernel measured SLOWER end-to-end (3.70 vs
        # 5.00 tiles/s) than XLA's own LN+projection fusions, which already
        # fuse the moment reductions into each consumer — kept for further
        # kernel work, not as the default
        transformer = two_way_transformer_dense_fused
    else:
        transformer = two_way_transformer_dense
    hs, src = transformer(
        params['transformer'], src_shared,
        image_pe[None] if image_pe.ndim == 3 else image_pe, tokens,
        num_heads=num_heads, dtype=dtype)
    iou_token_out = hs[:, 0]
    mask_tokens_out = hs[:, 1:1 + num_mask_tokens]

    h, w = image_embeddings.shape[1:3]
    c = src.shape[-1]
    # only upscale/hyper the masks the caller keeps: multimask drops mask 0
    # (upstream returns masks[:, 1:]), so computing its hypernetwork row
    # and its (B, 4H, 4W) plane is 25% wasted mask-head work + HBM writes
    sel = (list(range(1, num_mask_tokens)) if multimask_output else [0])
    hyper_in = jnp.stack([
        _mlp(params[f'hyper_mlp{i}'], mask_tokens_out[:, i], 3, dtype)
        for i in sel], axis=1)
    src = jnp.broadcast_to(src, (b, *src.shape[1:])).reshape(b, h, w, c)
    mask_dtype = mask_dtype or jnp.float32
    # iou head depends only on the transformer output — computed BEFORE
    # the mask head so the IoU gate below can reuse the EXACT array the
    # caller filters on (the mono path achieves the same by returning its
    # in-kernel iou head output as the canonical prediction)
    iou_pred = _mlp(params['iou_prediction_head'], iou_token_out, 3,
                    jnp.float32)
    if fused_upscale:
        from regda_tpu.models.sam.pallas_upscale import (
            upscale_hyper_masks, upscale_params_from_decoder)
        k1, b1, lnw, lnb, k2, b2 = upscale_params_from_decoder(params, dtype)
        active = None
        if iou_gate_thresh is not None and multimask_output:
            # skip prompts whose EVERY returned mask fails pred_iou_thresh
            # — identical output set: the caller drops those candidates by
            # this same iou_pred before masks matter (auto.py
            # _decode_all_fn `iou > t_iou`); skipped prompts return zeros
            active = jnp.any(iou_pred[:, 1:] > iou_gate_thresh, axis=1)
        masks = upscale_hyper_masks(src, hyper_in, k1, b1, lnw, lnb, k2, b2,
                                    out_dtype=mask_dtype, active=active,
                                    blocked=blocked_masks)
    else:
        c4, c8 = c // 4, c // 8
        m_sel = len(sel)
        up = _upscale_linear_flat(params['upscale_conv1'],
                                  src.reshape(b, h * w, c), dtype)
        up = _layernorm2d(params['upscale_ln'], up.reshape(b, h * w * 4, c4))
        up = jax.nn.gelu(up, approximate=False)
        up = _upscale_linear_flat(params['upscale_conv2'], up, dtype)
        up = jax.nn.gelu(up, approximate=False)
        up = up.reshape(b, h * w * 16, c8)         # blocks (dy, dx, gy, gx)
        masks = jnp.einsum('bpc,bmc->bmp', up, hyper_in,
                           preferred_element_type=jnp.float32)
        if blocked_masks:
            # (b, m, hw, 16) -> candidate-major (b, m*16, hw), matching
            # the fused kernel's blocked output (row m*16 + subpixel c)
            masks = (masks.reshape(b, m_sel, h * w, 16)
                     .transpose(0, 1, 3, 2)
                     .reshape(b, m_sel * 16, h * w).astype(mask_dtype))
        else:
            masks = masks.reshape(b, m_sel, h, w, 2, 2, 2, 2)
            masks = masks.transpose(0, 1, 2, 4, 6, 3, 5, 7)
            masks = masks.reshape(b, m_sel, 4 * h, 4 * w)
            masks = masks.astype(mask_dtype)
    if multimask_output:
        return masks, iou_pred[:, 1:]
    return masks, iou_pred[:, :1]


def mask_decoder_factored(params, image_embeddings, image_pe, sparse_prompt,
                          dense_prompt, multimask_output=True,
                          num_multimask_outputs=3, num_heads=8,
                          dtype=jnp.float32):
    """Factored twin of decoder.MaskDecoder.__call__ (same param tree)."""
    return mask_decoder_fast(params, image_embeddings, image_pe,
                             sparse_prompt, dense_prompt, multimask_output,
                             num_multimask_outputs, num_heads, dtype,
                             factored=True, fused_upscale=False)
