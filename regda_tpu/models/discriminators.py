"""Patch discriminators for adversarial UDA.

Parity targets (unused by the regda main path, kept for inventory —
SURVEY.md §2.4): regda/models/Discriminator.py:4-28 (`FCDiscriminator`),
:31-57 (`FCDiscriminator_Local`), :60-78 (`PixelDiscriminator`).

Channel-last Flax conv stacks; strided 4x4 convs map directly onto XLA:TPU
convolutions. The Local variant's 32x bilinear upsample uses the separable
matmul resize so the whole module stays fused.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from regda_tpu.ops.resize import resize_bilinear_half_pixel


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class FCDiscriminator(nn.Module):
    """DCGAN-style patch discriminator over (B, H, W, num_classes) logits;
    five stride-2 4x4 convs -> (B, H/32, W/32, 1) realness map."""
    ndf: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        widths = (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8)
        for i, w in enumerate(widths):
            x = nn.Conv(w, (4, 4), strides=(2, 2), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'conv{i + 1}')(x)
            x = _lrelu(x)
        return nn.Conv(1, (4, 4), strides=(2, 2), padding=[(1, 1)] * 2,
                       dtype=self.dtype, name='classifier')(x)


class FCDiscriminatorLocal(nn.Module):
    """Local variant fed [logits, features] concat (C = classes + 2048);
    three stride-2 convs + 1-ch classifier, upsampled 32x back to input
    resolution (Discriminator.py:31-57)."""
    ndf: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, w in enumerate((self.ndf, self.ndf * 2, self.ndf * 4)):
            x = nn.Conv(w, (4, 4), strides=(2, 2), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f'conv{i + 1}')(x)
            x = _lrelu(x)
        x = nn.Conv(1, (4, 4), strides=(2, 2), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name='classifier')(x)
        h, w = x.shape[1:3]
        return resize_bilinear_half_pixel(x, (h * 32, w * 32))


class PixelDiscriminator(nn.Module):
    """Stride-1 per-pixel discriminator; returns concat of two class maps
    (source-head, target-head) along channels (Discriminator.py:60-78)."""
    ndf: int = 512
    num_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ndf, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name='d1')(x)
        x = _lrelu(x)
        x = nn.Conv(self.ndf // 2, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name='d2')(x)
        x = _lrelu(x)
        src = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                      dtype=self.dtype, name='cls1')(x)
        tgt = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1)] * 2,
                      dtype=self.dtype, name='cls2')(x)
        return jnp.concatenate([src, tgt], axis=-1)
