"""SAM image encoder: ViT with windowed attention + decomposed relative
position embeddings, in Flax (NHWC).

Capability parity with the segment-anything dependency used by the
reference's region generator (regda/utils/local_region_homog.py:22,29-39).
This is a from-scratch JAX implementation of the published SAM ViT
architecture (Kirillov et al. 2023): patch-embed conv (16x16/s16), learned
absolute position embedding, transformer blocks with 14x14 window attention
except at the global-attention indices, per-axis decomposed relative
position biases, and a conv neck to 256 channels.

TPU-first notes: window partition is pure reshape/transpose (free for XLA);
attention is batched matmuls in bf16-friendly shapes; the rel-pos bias
tables are gathered once per block and added to logits before softmax.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

VIT_CONFIGS = {
    # tiny config for tests / smoke runs
    'vit_t': dict(embed_dim=64, depth=2, num_heads=2,
                  global_attn_indexes=(1,)),
    'vit_b': dict(embed_dim=768, depth=12, num_heads=12,
                  global_attn_indexes=(2, 5, 8, 11)),
    'vit_l': dict(embed_dim=1024, depth=24, num_heads=16,
                  global_attn_indexes=(5, 11, 17, 23)),
    'vit_h': dict(embed_dim=1280, depth=32, num_heads=16,
                  global_attn_indexes=(7, 15, 23, 31)),
}


class LayerNorm2d(nn.Module):
    """Channel-wise LayerNorm over the last axis of NHWC maps (SAM's
    LayerNorm2d normalizes over C only)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        w = self.param('weight', nn.initializers.ones, (dim,))
        b = self.param('bias', nn.initializers.zeros, (dim,))
        mean = x.mean(-1, keepdims=True)
        var = ((x - mean) ** 2).mean(-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * w + b


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Interpolate/gather the relative-position table to (q_size, k_size)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        # linear-resize the table (torch interpolate 'linear', align corners
        # semantics are immaterial here — tables are learned)
        t = jax.image.resize(rel_pos.astype(jnp.float32),
                             (max_rel_dist, rel_pos.shape[1]), 'linear')
    else:
        t = rel_pos
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return t[jnp.asarray(rel.astype(np.int64))]


def _add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w, q_hw, k_hw):
    """SAM's decomposed rel-pos bias: logits += qr_h + qr_w."""
    q_h, q_w = q_hw
    k_h, k_w = k_hw
    rh = _get_rel_pos(q_h, k_h, rel_pos_h)            # (q_h, k_h, hd)
    rw = _get_rel_pos(q_w, k_w, rel_pos_w)            # (q_w, k_w, hd)
    b, _, dim = q.shape
    r_q = q.reshape(b, q_h, q_w, dim)
    rel_h = jnp.einsum('bhwc,hkc->bhwk', r_q, rh)
    rel_w = jnp.einsum('bhwc,wkc->bhwk', r_q, rw)
    attn = attn.reshape(b, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(b, q_h * q_w, k_h * k_w)


class Attention(nn.Module):
    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: tuple[int, int] = (14, 14)
    dtype: jnp.dtype = jnp.float32
    # fuse the rel-pos bias + softmax into a Pallas kernel so the (N, N)
    # logits never reach HBM — the XLA lowering of the decomposed bias add
    # materializes two (heads, N, N) f32 broadcasts plus two layout-change
    # reshapes, ~15 ms per 4096-token layer on v5e (PERF.md). Enabled by
    # Block for global-attention layers; identical math, rounding-level
    # equality asserted in tests/test_sam.py.
    pallas_fused: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name='qkv')(x)
        # ONE relayout into (3, B, H, N, D); the fused kernel reads
        # q/k/v as BlockSpec views of this single tensor. The previous
        # form sliced it into three (B*H, N, D) tensors, whose
        # slice+squeeze materializations cost ~1 ms/layer per 5-crop
        # batch on v5e (XProf, PERF.md round 4).
        qkv = (qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
               .transpose(2, 0, 3, 1, 4))                 # (3, B, H, N, D)
        if self.use_rel_pos:
            rel_pos_h = self.param('rel_pos_h', nn.initializers.zeros,
                                   (2 * self.input_size[0] - 1, head_dim))
            rel_pos_w = self.param('rel_pos_w', nn.initializers.zeros,
                                   (2 * self.input_size[1] - 1, head_dim))
        if self.use_rel_pos and self.pallas_fused:
            from regda_tpu.models.sam.pallas_attention import (
                attention_with_rel_bias)
            rh = _get_rel_pos(h, h, rel_pos_h)             # (h, h, hd)
            rw = _get_rel_pos(w, w, rel_pos_w)
            # qkv[0] is a major-most slice (no relayout); einsums emit the
            # kernel's (B, H, N, K) order directly, f32 accumulation with
            # the output re-rounded to the compute dtype in the epilogue
            # (the kernel casts to it anyway)
            r_q = qkv[0].reshape(b, self.num_heads, h, w, head_dim)
            f32 = jnp.float32
            rel_h = jnp.einsum('bgxyc,xkc->bgxyk', r_q, rh,
                               preferred_element_type=f32).astype(qkv.dtype)
            rel_w = jnp.einsum('bgxyc,ykc->bgxyk', r_q, rw,
                               preferred_element_type=f32).astype(qkv.dtype)
            x = attention_with_rel_bias(
                qkv, rel_h.reshape(b, self.num_heads, h * w, h),
                rel_w.reshape(b, self.num_heads, h * w, w),
                scale=scale, kh=h, kw=w)                  # (B, H, N, D)
            x = x.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        else:
            qkv3 = qkv.reshape(3, b * self.num_heads, h * w, head_dim)
            q, k, v = qkv3[0], qkv3[1], qkv3[2]
            attn = (q * scale) @ k.transpose(0, 2, 1)
            if self.use_rel_pos:
                attn = _add_decomposed_rel_pos(attn, q, rel_pos_h, rel_pos_w,
                                               (h, w), (h, w))
            attn = jax.nn.softmax(attn, axis=-1)
            x = (attn @ v).reshape(b, self.num_heads, h * w, head_dim)
            x = x.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name='proj')(x)


class PatchEmbed(nn.Module):
    """Non-overlapping patch embedding as reshape + one GEMM.

    A 16x16/stride-16 conv with C_in=3 fills 3/128 of the MXU contraction
    dim through XLA's conv lowering (profiled 2.1 ms of a 31 ms ViT-B
    encode on v5e); flattening each patch to a 768-wide row makes it a
    full-width (N, 768) @ (768, D) matmul — identical math. Parameters
    keep nn.Conv's names/shapes ('kernel' (P, P, C, D) + 'bias'), so
    checkpoint conversion is unchanged.
    """
    features: int
    patch: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        p = self.patch
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (p, p, c, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        gh, gw = h // p, w // p
        xp = (x.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
              .reshape(n, gh, gw, p * p * c))
        k = kernel.reshape(p * p * c, self.features)
        y = xp.astype(self.dtype) @ k.astype(self.dtype)
        return y + bias.astype(self.dtype)


def window_partition(x, window: int):
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    win = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return win, (hp, wp)


def window_unpartition(win, window: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // window // window)
    x = win.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class BlockNorm(nn.Module):
    """nn.LayerNorm-compatible module backed by the one-pass Pallas kernel
    (pallas_ln.py) — XLA's lowering measured ~8x off bandwidth roofline on
    the encoder's activations. Same param tree ('scale'/'bias')."""
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os as _os
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        if _os.environ.get('REGDA_NO_PALLAS'):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(-1, keepdims=True)
            y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
            return (y * scale + bias).astype(self.dtype)
        from regda_tpu.models.sam.pallas_ln import layernorm
        return layernorm(x, scale, bias, eps=self.epsilon).astype(self.dtype)


def _window_pad_mask(grid_hw, window):
    """(n_windows, window, window) 0/1 mask of REAL (non-pad) positions."""
    import numpy as _np
    h, w = grid_hw
    hp = h + (window - h % window) % window
    wp = w + (window - w % window) % window
    m = _np.zeros((hp, wp), _np.float32)
    m[:h, :w] = 1.0
    m = (m.reshape(hp // window, window, wp // window, window)
         .transpose(0, 2, 1, 3).reshape(-1, window, window))
    return m


class Block(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 14
    input_size: tuple[int, int] = (64, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, windowed_in: bool = False,
                 windowed_out: bool = False):
        """windowed_in/out implement the PERSISTENT windowed layout: window
        partition is a token permutation and everything outside attention
        (LN, residual, MLP) is per-token, so consecutive windowed blocks
        can stay in (B*nw, ws, ws, C) layout — one partition per windowed
        RUN instead of a partition+unpartition per block. Exactness with
        the per-block path: the stock path re-pads ZEROS after every
        norm1 (window_partition pads the normalized tensor), so here the
        pad positions are re-zeroed by a (nw, ws, ws) mask instead — a
        cheap multiply replacing two full-tensor permutes. Pad tokens
        carry per-token junk between blocks; it is masked before every
        attention and dropped at unpartition, touching no real token."""
        ws = self.window_size
        shortcut = x
        y = BlockNorm(epsilon=1e-6, dtype=self.dtype, name='norm1')(x)
        if ws > 0:
            if windowed_in:
                gh, gw = self.input_size
                if gh % ws or gw % ws:      # re-zero pads (see docstring)
                    m = jnp.asarray(_window_pad_mask(self.input_size, ws),
                                    y.dtype)
                    nw = m.shape[0]
                    y = (y.reshape(-1, nw, ws, ws, y.shape[-1])
                         * m[None, :, :, :, None]
                         ).reshape(-1, ws, ws, y.shape[-1])
            else:
                y, _ = window_partition(y, ws)
            attn_size = (ws, ws)
        else:
            attn_size = self.input_size
        import os as _os
        # windowed layers benefit too: the decomposed-bias add on the
        # (windows*heads, 14, 14, 14, 14) f32 view costs ~0.6 ms/layer in
        # reshapes alone (the kernel runs each window as one tiny q-block)
        fused = not _os.environ.get('REGDA_NO_PALLAS')
        y = Attention(self.dim, self.num_heads, input_size=attn_size,
                      dtype=self.dtype, pallas_fused=fused, name='attn')(y)
        if ws > 0:
            gh, gw = self.input_size
            hp = gh + (ws - gh % ws) % ws
            wp = gw + (ws - gw % ws) % ws
            if windowed_in and not windowed_out:
                # leave attention output windowed for the residual, then
                # unpartition the whole block output at the end
                pass
            elif not windowed_in and windowed_out:
                shortcut, _ = window_partition(shortcut, ws)
            elif not windowed_in and not windowed_out:
                y = window_unpartition(y, ws, (hp, wp), (gh, gw))
        x = shortcut + y
        y = BlockNorm(epsilon=1e-6, dtype=self.dtype, name='norm2')(x)
        y = nn.Dense(self.dim * 4, dtype=self.dtype, name='mlp_lin1')(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name='mlp_lin2')(y)
        out = x + y
        if ws > 0 and windowed_in and not windowed_out:
            gh, gw = self.input_size
            hp = gh + (ws - gh % ws) % ws
            wp = gw + (ws - gw % ws) % ws
            out = window_unpartition(out, ws, (hp, wp), (gh, gw))
        return out


class ImageEncoderViT(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, img_size, img_size, 3) preprocessed -> (B, 64, 64, 256)."""
        grid = self.img_size // self.patch_size
        x = PatchEmbed(self.embed_dim, self.patch_size, dtype=self.dtype,
                       name='patch_embed')(x)
        pos = self.param('pos_embed', nn.initializers.zeros,
                         (1, grid, grid, self.embed_dim))
        # keep the residual stream in the COMPUTE dtype: the f32 pos_embed
        # param would otherwise promote this add and every block's residual
        # add after it to f32 — doubling residual-stream HBM traffic and
        # inserting a bf16->f32 convert after each attention/MLP (XProf:
        # ~14 ms/tile of convert_add fusions on the 5-crop pyramid encode).
        # In f32 mode this cast is a no-op; norms still reduce in f32.
        x = (x + pos.astype(self.dtype)).astype(self.dtype)
        windowed = [i not in self.global_attn_indexes
                    and self.window_size > 0 for i in range(self.depth)]
        # DEFAULT: partition+unpartition per windowed block. The
        # "persistent windowed layout" (one partition per windowed RUN,
        # kept between consecutive windowed blocks) measured SLOWER on
        # v5e both per-layer (2.12 vs 1.90 ms/crop/layer) and end-to-end
        # (3.337 vs 3.434 tiles/s at crop_n_layers=1, round-4 A/B): the
        # per-block permutes fuse into neighboring elementwise ops while
        # the persistent form's pad-remask + strided attention layout do
        # not. REGDA_VIT_WINDOW_PERSISTENT=1 restores the losing layout
        # for future A/Bs (trace-time switch).
        import os as _os
        persistent = bool(_os.environ.get('REGDA_VIT_WINDOW_PERSISTENT'))
        layout_windowed = False
        for i in range(self.depth):
            w_out = (persistent and windowed[i] and (i + 1 < self.depth)
                     and windowed[i + 1])
            x = Block(self.embed_dim, self.num_heads,
                      window_size=self.window_size if windowed[i] else 0,
                      input_size=(grid, grid), dtype=self.dtype,
                      name=f'block{i}')(
                x, windowed_in=layout_windowed, windowed_out=w_out)
            layout_windowed = w_out
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name='neck_conv1')(x)
        x = LayerNorm2d(name='neck_ln1')(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name='neck_conv2')(x)
        x = LayerNorm2d(name='neck_ln2')(x)
        return x
