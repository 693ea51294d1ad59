"""Segmentation heads: PSPNet pyramid pooling (PPM) and summed dilated-conv
ASPP classifier.

Parity targets: regda/models/Encoder.py:8-65 (`PPMBilinear`) and :68-84
(`Classifier_Module`). Adaptive average pooling and the bilinear upsample
back to feature resolution (align_corners=False, Encoder.py:48-51) are
expressed as separable dense matmuls (see ops/resize.py) so the whole head
is matmul+conv work for the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from regda_tpu.ops.resize import adaptive_avg_pool, resize_bilinear_half_pixel


class PPMBilinear(nn.Module):
    num_classes: int = 6
    fc_dim: int = 2048
    pool_scales: tuple[int, ...] = (1, 2, 3, 6)
    dropout_rate: float = 0.1
    folded: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conv_out, train: bool = False):
        from regda_tpu.models.resnet import _norm_factory
        h, w = conv_out.shape[1:3]
        norm = _norm_factory(self.folded, train, self.dtype)
        outs = [conv_out]
        for i, scale in enumerate(self.pool_scales):
            y = adaptive_avg_pool(conv_out, (scale, scale))
            y = nn.Conv(512, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f'ppm_{i}_conv')(y)
            y = norm(f'ppm_{i}_bn')(y)
            y = nn.relu(y)
            outs.append(resize_bilinear_half_pixel(y, (h, w)))
        x = jnp.concatenate(outs, axis=-1)
        x = nn.Conv(512, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name='conv_last_conv')(x)
        x = norm('conv_last_bn')(x)
        x = nn.relu(x)
        # torch Dropout2d zeroes whole channels -> broadcast over H, W
        x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2),
                       deterministic=not train)(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name='conv_last_out')(x)
        return x


class ASPPClassifier(nn.Module):
    """Summed parallel dilated 3x3 convs (Classifier_Module, d=6,12,18,24)."""
    num_classes: int = 6
    dilations: tuple[int, ...] = (6, 12, 18, 24)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = None
        for i, d in enumerate(self.dilations):
            y = nn.Conv(self.num_classes, (3, 3), padding=[(d, d)] * 2,
                        kernel_dilation=(d, d), use_bias=True,
                        kernel_init=nn.initializers.normal(0.01),
                        dtype=self.dtype, name=f'aspp_{i}')(x)
            out = y if out is None else out + y
        return out
