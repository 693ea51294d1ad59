"""Dilated ResNet encoder in Flax (NHWC, TPU-native).

Capability parity with the reference's vendored torchvision ResNet +
`ResNetEncoder` wrapper (regda/_resnets.py:74-180, regda/resnet.py:44-207):
bottleneck ResNet-50/101 with the stride-2 3x3 convs of layer4 (OS=16) or
layer3+4 (OS=8) converted to stride-1 with dilation (resnet.py:192-207's
`_nostride_dilate`), optional BN freeze and stage freeze, returning
[c2, c3, c4, c5].

TPU-first: channel-last layout throughout (MXU-friendly), BatchNorm batch
stats computed over the (globally sharded) batch so data-parallel training
syncs stats for free under GSPMD. Optional gradient checkpointing
(`remat=True`, the reference's `with_cp` at resnet.py:140-168) wraps every
residual block in nn.remat, so the backward pass recomputes block
activations instead of storing them — per-block granularity bounds live
activations tighter than the reference's per-stage torch.utils.checkpoint
while computing identical gradients (asserted in tests/test_model.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from regda_tpu.models.fold_bn import FoldedBias


def _norm_factory(folded: bool, train: bool, dtype):
    """BatchNorm, or (folded inference) the bias-add remnant of a BN whose
    affine was folded into the preceding conv (models/fold_bn.py)."""
    if folded:
        assert not train, 'folded models are inference-only'
        return lambda name: FoldedBias(dtype=dtype, name=name)
    return lambda name: nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=dtype, name=name)


# layers per stage
RESNET_DEPTHS = {
    'resnet18': (2, 2, 2, 2),
    'resnet34': (3, 4, 6, 3),
    'resnet50': (3, 4, 6, 3),
    'resnet101': (3, 4, 23, 3),
    'resnet152': (3, 8, 36, 3),
}
BASIC_BLOCK_TYPES = ('resnet18', 'resnet34')


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride, dilation) -> 1x1 with projection shortcut."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_proj: bool = False
    folded: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _norm_factory(self.folded, train, self.dtype)
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(x)
        y = norm('bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(self.dilation, self.dilation)] * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name='conv2')(y)
        y = norm('bn2')(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv3')(y)
        y = norm('bn3')(y)
        if self.has_proj:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = norm('downsample_bn')(identity)
        return nn.relu(y + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_proj: bool = False
    folded: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _norm_factory(self.folded, train, self.dtype)
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=[(self.dilation, self.dilation)] * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype, name='conv1')(x)
        y = norm('bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name='conv2')(y)
        y = norm('bn2')(y)
        if self.has_proj:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name='downsample_conv')(x)
            identity = norm('downsample_bn')(identity)
        return nn.relu(y + identity)


def _stage_plan(output_stride: int) -> Sequence[tuple[int, int]]:
    """(stride, dilation) for layer1..layer4, per `_nostride_dilate`.

    OS=16: layer4 stride->1, first block's 3x3 keeps dilation 1 (dilate//2),
    subsequent blocks use dilation 2. OS=8: layer3 dilation 2, layer4
    dilation 4 (first blocks get dilate//2 = 1 and 2).
    """
    if output_stride == 32:
        return [(1, 1, 1), (2, 1, 1), (2, 1, 1), (2, 1, 1)]
    if output_stride == 16:
        return [(1, 1, 1), (2, 1, 1), (2, 1, 1), (1, 1, 2)]
    if output_stride == 8:
        return [(1, 1, 1), (2, 1, 1), (1, 1, 2), (1, 2, 4)]
    raise ValueError('output_stride must be 8, 16 or 32.')


class StemConv(nn.Module):
    """The 7x7/stride-2 stem conv, computed as a 4x4/stride-1 conv on
    2x2 space-to-depth input when the spatial dims are even.

    With C_in=3 the direct lowering fills 3/128 of the MXU's contraction
    dim (profiled 14 TF/s and 1.4 ms of a 22 ms ResNet-101 eval forward on
    v5e); packing each 2x2 pixel block into channels (C_in 3 -> 12) and
    regrouping the zero-padded 8x8 kernel by output-pixel parity computes
    the IDENTICAL convolution at 4x the contraction width. Same parameter
    ('conv1/kernel', (7, 7, C, 64)) so checkpoint conversion is unchanged;
    equality asserted in tests/test_model.py. Reference stem:
    regda/_resnets.py:121 (conv1 7x7/2, pad 3, no bias).
    """
    features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (7, 7, c, self.features))
        if h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (2, 2),
                [(3, 3)] * 2, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        # K8[2a+dy, 2b+dx] = K[2a+dy-1, 2b+dx-1] (zero row/col 0):
        # out[oh,ow] = sum_{a,b,dy,dx} x[2(oh+a-2)+dy, ...] K8[2a+dy, 2b+dx]
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        ksd = (k8.reshape(4, 2, 4, 2, c, self.features)
               .transpose(0, 2, 1, 3, 4, 5)
               .reshape(4, 4, 4 * c, self.features))
        xsd = (x.reshape(n, h // 2, 2, w // 2, 2, c)
               .transpose(0, 1, 3, 2, 4, 5)
               .reshape(n, h // 2, w // 2, 4 * c))
        return jax.lax.conv_general_dilated(
            xsd.astype(self.dtype), ksd.astype(self.dtype), (1, 1),
            ((2, 1), (2, 1)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class ResNetEncoder(nn.Module):
    """Returns [c2, c3, c4, c5] feature maps, channel-last."""
    resnet_type: str = 'resnet101'
    output_stride: int = 16
    remat: bool = False
    folded: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths = RESNET_DEPTHS[self.resnet_type]
        block_cls = BasicBlock if self.resnet_type in BASIC_BLOCK_TYPES else Bottleneck
        expansion = 1 if self.resnet_type in BASIC_BLOCK_TYPES else 4
        if self.remat:
            # arg 0 is the module instance under the lifted transform;
            # train (arg 2) is a Python bool and must stay static
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        x = StemConv(64, dtype=self.dtype, name='conv1')(x)
        x = _norm_factory(self.folded, train, self.dtype)('bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        feats = []
        plan = _stage_plan(self.output_stride)
        planes = 64
        in_ch = 64
        for stage_idx, (n_blocks, (stride, first_dil, rest_dil)) in enumerate(
                zip(depths, plan), start=1):
            for b in range(n_blocks):
                is_first = b == 0
                x = block_cls(
                    planes=planes,
                    stride=stride if is_first else 1,
                    dilation=first_dil if is_first else rest_dil,
                    has_proj=is_first and (stride != 1 or in_ch != planes * expansion),
                    folded=self.folded,
                    dtype=self.dtype,
                    name=f'layer{stage_idx}_{b}',
                )(x, train)  # positional: static_argnums under remat
                in_ch = planes * expansion
            planes *= 2
            feats.append(x)
        return feats
