"""DeepLabv2 segmenter: dilated ResNet encoder + dual PPM heads.

Parity target: regda/models/Encoder.py:87-186 (`Deeplabv2`) with the config
used by every reference tool (tools/train_src.py:63-80): multi_layer=True,
cascade=False, use_ppm=True, is_ins_norm=True. Train forward returns
(pred1, pred2, feat) at stride 16; eval forward returns the average of the
two heads' softmaxes upsampled to input resolution (align_corners=True).

Everything is channel-last; the eval upsample is the separable-matmul
resize from ops/resize.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from regda_tpu.models.resnet import ResNetEncoder
from regda_tpu.models.heads import PPMBilinear, ASPPClassifier
from regda_tpu.ops.resize import resize_bilinear_align_corners


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm2d(affine=False): per-sample per-channel standardize.

    Note torch uses the biased variance here.
    """
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class DeeplabV2(nn.Module):
    resnet_type: str = 'resnet101'
    output_stride: int = 16
    num_classes: int = 6
    multi_layer: bool = True
    use_ppm: bool = True
    is_ins_norm: bool = True
    fc_dim: int = 2048
    remat: bool = False
    # inference-only: BN affines pre-folded into conv kernels
    # (models/fold_bn.py); use folded_model(model) + fold_batchnorm(vars)
    folded: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ResNetEncoder(self.resnet_type, self.output_stride,
                                     remat=self.remat, folded=self.folded,
                                     dtype=self.dtype, name='encoder')
        head = (lambda name: PPMBilinear(self.num_classes, self.fc_dim,
                                         folded=self.folded,
                                         dtype=self.dtype, name=name)
                ) if self.use_ppm else (
                lambda name: ASPPClassifier(self.num_classes, dtype=self.dtype,
                                            name=name))
        if self.multi_layer:
            self.layer5 = head('layer5')
            self.layer6 = head('layer6')
        else:
            self.cls_pred = head('cls_pred')

    def __call__(self, x, train: bool = False):
        """Train: (pred1, pred2, feat) at stride 16. Eval: (B,H,W,C) probs."""
        feat = self.encoder(x, train=train)[-1]
        if self.is_ins_norm:
            feat = instance_norm(feat)
        if self.multi_layer:
            x1 = self.layer5(feat, train=train)
            x2 = self.layer6(feat, train=train)
            if train:
                return x1, x2, feat
            hw = x.shape[1:3]
            # one fused full-res upsample for both heads: resize is a
            # channel-independent linear map, so upsampling the channel
            # concat is bit-equal to two separate upsamples (the softmaxes
            # stay per-head, preserving reference Encoder.py:153-155
            # upsample-then-softmax semantics) while halving the matmul
            # pipelines at the bandwidth-bound full resolution
            both = resize_bilinear_align_corners(
                jnp.concatenate([x1, x2], axis=-1), hw)
            x1 = both[..., :self.num_classes]
            x2 = both[..., self.num_classes:]
            return (jax.nn.softmax(x1, axis=-1) + jax.nn.softmax(x2, axis=-1)) / 2
        x1 = self.cls_pred(feat, train=train)
        if train:
            return x1, feat
        x1 = resize_bilinear_align_corners(x1, x.shape[1:3])
        return jax.nn.softmax(x1, axis=-1)


def build_deeplabv2(model_name: str, num_classes: int,
                    dtype=jnp.float32, **kw) -> DeeplabV2:
    """Model factory matching the reference tools' instantiation
    (tools/train_src.py:58-80: MODEL='ResNet' means resnet50)."""
    name = model_name.lower()
    if name == 'resnet':
        name = 'resnet50'
    kw.setdefault('fc_dim', 512 if name in ('resnet18', 'resnet34') else 2048)
    return DeeplabV2(resnet_type=name, num_classes=num_classes, dtype=dtype, **kw)
