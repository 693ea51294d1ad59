"""Fast SAM mask decoder: the canonical everything-mode decode path.

Everything-mode decodes B point prompts (B = points_per_batch, typically
128) against ONE shared image embedding. The stock two-way transformer
(decoder.py) replicates the (T=4096, C=256) image-token state per prompt
the moment the first image-to-token update lands, and every subsequent
key-side op streams those (B, T, C) tensors through HBM — profiled at 32%
bandwidth / 6% FLOPs utilization on v5e, the dominant cost of SAM region
generation (see PERF.md).

This module holds the ONE measured-winning decode path plus its pure-XLA
stock twin:

- `two_way_transformer_dense` — stock twin of decoder.TwoWayTransformer
  as a pure function of the param tree (batch-1 image side shared across
  prompts until the first image-to-token update). Off-TPU default and the
  VJP rule / parity oracle for the kernels.
- `two_way_transformer_fused2` — the prompt-resident Pallas kernel
  (pallas_twoway.py): one program per prompt holds the whole (4096, 256)
  key state in VMEM from layer-0's image-to-token update through the
  final attention. 11.43 -> 6.57 ms per 128-prompt chunk on v5e.
- `mask_decoder_fast` — pure-function twin of decoder.MaskDecoder
  (same param tree) wiring the transformer to the fused Pallas
  upscale+hypernetwork mask head (pallas_upscale.py), with the
  everything-mode IoU gate and the candidate-major blocked mask layout.

Pruned alternatives (round-4 decision, measured end-to-end at the
reference crop_n_layers=1 configuration): the low-rank factored key
state (4.28 vs 5.00 tiles/s), the ln_project partial fusion (3.70 vs
5.00), and the monolithic decode kernel (3.215/2.652 vs 3.337/3.434
tiles/s two-step) all lost to this path and were removed — see
PERF.md's round-4 section for the A/B table.

Capability parity target: segment-anything's MaskDecoder/TwoWayTransformer
as driven by the reference's everything-mode (regda/utils/
local_region_homog.py:30-39); built TPU-first rather than ported.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dense(params, x, dtype):
    return x.astype(dtype) @ params['kernel'].astype(dtype) + params[
        'bias'].astype(dtype)


def _layernorm(x, scale, bias, eps=1e-5):
    # NOTE: routing the big key-state LNs through a Pallas one-pass
    # kernel measured SLOWER end-to-end (5.26 vs 5.57 tiles/s): XLA
    # already folds these LNs into each consuming projection fusion, so a
    # materialized LN output costs an extra full pass. The kernel only
    # wins where the LN output has a single consumer (the encoder blocks).
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


def _fused_prep(params, image_embedding, image_pe, point_embedding,
                num_heads, dtype):
    """Shared prep for the prompt-resident Pallas kernel: runs the
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
                      dtype=jnp.float32, fused_upscale=True,
                      mask_dtype=None, iou_gate_thresh=None,
                      blocked_masks=False):
    """Pure-function twin of decoder.MaskDecoder.__call__ (same param tree)
    — the canonical everything-mode decode:

    - transformer: the prompt-resident Pallas two-way kernel on TPU
      (REGDA_NO_TWOWAY=1 or non-TPU backends fall back to the stock
      dense twin — identical math).
    - fused_upscale: the Pallas fused upscale+hypernetwork mask head
      (pallas_upscale.py) vs flat GEMMs (the stock twin).
    - iou_gate_thresh: per-prompt IoU gate — prompts whose every returned
      IoU fails pred_iou_thresh skip the mask head and return zero masks
      (output-identical for everything-mode consumers, which drop those
      candidates anyway; inference-only). The gate and the caller's
      filter decide from the SAME iou array (computed before the mask
      head), so no margin is needed.
    - blocked_masks: return masks in the candidate-major BLOCKED layout
      (B, M*16, HW) instead of interleaved (B, M, 4H, 4W) — see
      pallas_stability's module note; the everything-mode decode scores
      stability and selects the mask budget in this layout and
      interleaves only the survivors.

    image_embeddings / dense_prompt must be batch-1 (shared across the B
    sparse prompts) — exactly the everything-mode point-prompt setting.
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
    # trace-time read: callers that jit around mask_decoder_fast bake
    # this choice into their compiled fn — auto.py keys its decode jit
    # cache on these env values so toggling them re-traces (ADVICE r4)
    if fused_upscale and (
            _os.environ.get('REGDA_FUSED_TWOWAY')
            or (jax.default_backend() == 'tpu'
                and not _os.environ.get('REGDA_NO_TWOWAY'))):
        # prompt-resident fused two-way kernel (pallas_twoway.py):
        # 11.43 -> 6.57 ms per 128-prompt chunk on v5e (PERF.md round 2).
        # Default on TPU; interpret mode stays opt-in (REGDA_FUSED_TWOWAY)
        transformer = two_way_transformer_fused2
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
    # caller filters on
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
