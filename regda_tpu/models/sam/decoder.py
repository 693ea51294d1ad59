"""SAM mask decoder: two-way transformer + hypernetwork mask heads.

From-scratch JAX implementation of the published SAM decoder (2-layer
two-way transformer with downsampled attention, IoU token + 4 mask tokens,
2x2 transposed-conv upscaling, per-token hypernetwork MLPs, IoU MLP head).
Used in batched everything-mode: one call decodes a whole batch of point
prompts against a single image embedding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class AttentionDS(nn.Module):
    """Multi-head attention with optional internal downsampling."""
    embed_dim: int = 256
    num_heads: int = 8
    downsample_rate: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        dim = self.embed_dim // self.downsample_rate
        head_dim = dim // self.num_heads
        qp = nn.Dense(dim, dtype=self.dtype, name='q_proj')(q)
        kp = nn.Dense(dim, dtype=self.dtype, name='k_proj')(k)
        vp = nn.Dense(dim, dtype=self.dtype, name='v_proj')(v)

        def split(x):
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = (qh @ kh.transpose(0, 1, 3, 2)) / (head_dim ** 0.5)
        # softmax in f32 for stability regardless of compute dtype
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = attn.astype(vh.dtype) @ vh
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        name='out_proj')(out)


class TwoWayAttentionBlock(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = AttentionDS(self.embed_dim, self.num_heads,
                                  dtype=self.dtype,
                                  name='self_attn')(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + AttentionDS(self.embed_dim, self.num_heads,
                                            dtype=self.dtype,
                                            name='self_attn')(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name='norm1')(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + AttentionDS(self.embed_dim, self.num_heads, 2,
                                        dtype=self.dtype,
                                        name='cross_attn_token_to_image'
                                        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name='norm2')(queries)

        mlp = nn.Dense(self.mlp_dim, dtype=self.dtype,
                       name='mlp_lin1')(queries)
        mlp = nn.relu(mlp)
        mlp = nn.Dense(self.embed_dim, dtype=self.dtype,
                       name='mlp_lin2')(mlp)
        queries = nn.LayerNorm(epsilon=1e-5, name='norm3')(queries + mlp)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + AttentionDS(self.embed_dim, self.num_heads, 2,
                                  dtype=self.dtype,
                                  name='cross_attn_image_to_token'
                                  )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name='norm4')(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, H, W, C); point_embedding (B, N, C)."""
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = jnp.broadcast_to(image_pe.reshape(-1, h * w, c), keys.shape)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embed_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f'layer{i}')(
                    queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + AttentionDS(self.embed_dim, self.num_heads, 2,
                                        dtype=self.dtype,
                                        name='final_attn_token_to_image'
                                        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name='norm_final_attn')(queries)
        return queries, keys


class MLP(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    sigmoid_output: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f'lin{i}')(x))
        x = nn.Dense(self.output_dim, dtype=self.dtype,
                     name=f'lin{self.num_layers - 1}')(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


def flatten_convt_kernel(kernel, dtype):
    """(2, 2, Cin, Cout) ConvTranspose kernel -> (Cin, 4*Cout) GEMM matrix
    with block order (dy, dx, f). lax.conv_transpose applies the kernel
    spatially FLIPPED, hence the [::-1, ::-1]. Single home for the
    convention shared by SubpixelConvT / UpscaleLinear /
    fast_decoder._upscale_linear_flat / pallas_upscale."""
    c_in = kernel.shape[2]
    return (kernel[::-1, ::-1].astype(dtype).transpose(2, 0, 1, 3)
            .reshape(c_in, -1))


class SubpixelConvT(nn.Module):
    """2x2-stride-2 transposed conv expressed as one matmul + depth-to-space.

    Non-overlapping k=s=2 windows make ConvTranspose exactly a per-pixel
    linear map to 4 sub-pixels: out[2h+dy, 2w+dx, o] = x[h, w, :] @
    kernel[dy, dx, :, o] + bias (lax applies the kernel spatially flipped).
    Parameter names/shapes match nn.ConvTranspose, so the two are drop-in
    interchangeable per checkpoint. MaskDecoder now uses UpscaleLinear
    (below), which defers the depth-to-space interleave past the
    hypernetwork contraction; this module is the equality-tested
    IMMEDIATE-interleave form the deferred variants are derived from.
    """
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c_in = x.shape
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (2, 2, c_in, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        k = flatten_convt_kernel(kernel, self.dtype)   # (Cin, dy*dx*Cout)
        y = x.astype(self.dtype).reshape(b, h * w, c_in) @ k
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w,
                                                  self.features)
        return y + bias.astype(self.dtype)


class UpscaleLinear(nn.Module):
    """The per-pixel linear map of a 2x2-stride-2 ConvTranspose WITHOUT the
    depth-to-space interleave: (..., C_in) -> (..., 2, 2, features).

    Parameter names/shapes match nn.ConvTranspose (kernel (2,2,Cin,Cout) +
    bias), so checkpoints convert unchanged; the spatial flip matches lax's
    kernel convention (see SubpixelConvT, which is the equality-tested
    interleaved form). Deferring the interleave lets the consumer contract
    channels FIRST and interleave a 16x smaller tensor — profiled on v5e,
    XLA's ConvTranspose lowering of upscale_conv2 ran at 120 GiB/s plus a
    full-tensor layout copy (~8 ms of a ~20 ms decode chunk).

    flatten=True keeps the subpixel axes merged into the channel dim
    ((..., 4*features), block order (dy, dx, f)) so the op stays a plain
    2-D GEMM with a wide minor dimension — small trailing dims like
    (..., 2, 2, 32) push XLA into batch-minor layouts + full-tensor copies.
    """
    features: int
    flatten: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (2, 2, c_in, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        y = x.astype(self.dtype) @ flatten_convt_kernel(kernel, self.dtype)
        if self.flatten:
            return y + jnp.tile(bias, 4).astype(self.dtype)
        y = y.reshape(*x.shape[:-1], 2, 2, self.features)
        return y + bias.astype(self.dtype)


class MaskDecoder(nn.Module):
    embed_dim: int = 256
    num_multimask_outputs: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool = True):
        """image_embeddings: (1, H, W, C) single-image embedding;
        sparse_prompt: (B, Np, C) for B prompts; dense_prompt: (B, H, W, C).
        Returns (masks (B, M, 4H, 4W), iou_pred (B, M))."""
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param('iou_token', nn.initializers.normal(1.0),
                               (1, self.embed_dim))
        mask_tokens = self.param('mask_tokens', nn.initializers.normal(1.0),
                                 (num_mask_tokens, self.embed_dim))

        b = sparse_prompt.shape[0]
        output_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None],
                              (b, *output_tokens.shape)), sparse_prompt],
            axis=1)

        # keys keep dense_prompt's batch: with the (1, H, W, C) dense of
        # point-only prompting, layer-0's key-side projections compute ONCE
        # and broadcast against the B query prompts — keys pick up batch B
        # only at the first image-to-token update. Identical math, ~1/3
        # less decoder matmul+HBM work in everything-mode.
        src = image_embeddings + dense_prompt
        hs, src = TwoWayTransformer(dtype=self.dtype, name='transformer')(
            src, image_pe[None] if image_pe.ndim == 3 else image_pe, tokens)
        iou_token_out = hs[:, 0]
        mask_tokens_out = hs[:, 1:1 + num_mask_tokens]

        h, w = image_embeddings.shape[1:3]
        c4, c8 = self.embed_dim // 4, self.embed_dim // 8
        # 2x2/s2 ConvTransposes as flat 2-D GEMMs (wide channel minor dims:
        # 256 -> 4*64 -> 4*(4*32)) with the depth-to-space interleave
        # DEFERRED past the hypernetwork contraction: the (B, 4H, 4W, C/8)
        # activation never exists in interleaved layout; only the 16x
        # smaller (B, M, 4H, 4W) masks get reordered at the end. Identical
        # math to the ConvTranspose form (UpscaleLinear shares
        # SubpixelConvT's tested kernel convention).
        up = UpscaleLinear(c4, flatten=True, dtype=self.dtype,
                           name='upscale_conv1')(
                               src.reshape(b, h * w, self.embed_dim))
        up = up.reshape(b, h * w * 4, c4)            # blocks (dy, dx)
        up = LayerNorm2dDec(name='upscale_ln')(up)
        up = nn.gelu(up, approximate=False)
        up = UpscaleLinear(c8, flatten=True, dtype=self.dtype,
                           name='upscale_conv2')(up)  # (B, HW*4, 4*C/8)
        up = nn.gelu(up, approximate=False)
        up = up.reshape(b, h * w * 16, c8)            # blocks (dy,dx,gy,gx)

        hyper_in = jnp.stack([
            MLP(self.embed_dim, self.embed_dim // 8, dtype=self.dtype,
                name=f'hyper_mlp{i}')(mask_tokens_out[:, i])
            for i in range(num_mask_tokens)], axis=1)  # (B, M, C/8)
        masks = jnp.einsum('bpc,bmc->bmp', up, hyper_in,
                           preferred_element_type=jnp.float32)
        # p = (((h*W + w)*2 + dy)*2 + dx)*4 + (gy*2 + gx): interleave to
        # rows 4h + 2dy + gy, cols 4w + 2dx + gx
        masks = masks.reshape(b, num_mask_tokens, h, w, 2, 2, 2, 2)
        masks = masks.transpose(0, 1, 2, 4, 6, 3, 5, 7)
        masks = masks.reshape(b, num_mask_tokens, 4 * h, 4 * w)
        iou_pred = MLP(self.embed_dim, num_mask_tokens,
                       name='iou_prediction_head')(iou_token_out)

        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]


class LayerNorm2dDec(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        w = self.param('weight', nn.initializers.ones, (dim,))
        b = self.param('bias', nn.initializers.zeros, (dim,))
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * w + b
