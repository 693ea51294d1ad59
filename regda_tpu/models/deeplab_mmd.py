"""Single-head DeepLabv2 variant with a GAP reduction branch for MMD.

Parity target: regda/models/Deeplabv2_MMD.py:8-56 (`ReductionLayer`,
`Deeplabv2_MMD`; unused by the regda tools, kept for inventory).

Train forward: full-resolution logits (single ASPP head, bilinear
align-corners upsample) + a (B, 256) reduced global feature for the MMD
loss (ops/losses.mmd_loss). Eval forward: softmax probabilities.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from regda_tpu.models.resnet import ResNetEncoder
from regda_tpu.models.heads import ASPPClassifier
from regda_tpu.ops.resize import resize_bilinear_align_corners


class ReductionLayer(nn.Module):
    """GAP -> 2048 -> 512 -> 256 MLP (Deeplabv2_MMD.py:8-24)."""
    inchannels: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        x = feat.mean(axis=(1, 2))                       # global average pool
        x = nn.relu(nn.Dense(self.inchannels // 4, dtype=self.dtype, name='l1')(x))
        x = nn.relu(nn.Dense(self.inchannels // 8, dtype=self.dtype, name='l2')(x))
        return x


class DeeplabV2MMD(nn.Module):
    resnet_type: str = 'resnet50'
    output_stride: int = 16
    num_classes: int = 7
    inchannels: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        feat = ResNetEncoder(self.resnet_type, self.output_stride,
                             dtype=self.dtype, name='encoder')(x, train=train)[-1]
        reduced = ReductionLayer(self.inchannels, dtype=self.dtype,
                                 name='reduction_layer')(feat)
        logits = ASPPClassifier(self.num_classes, dtype=self.dtype,
                                name='cls_pred')(feat, train=train)
        logits = resize_bilinear_align_corners(logits, (h, w))
        if train:
            return logits, reduced
        return nn.softmax(logits, axis=-1)
