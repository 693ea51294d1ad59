"""Fused dual-head PPM eval forward for the deployed inference graph.

Both PPM heads' 3x3 `conv_last` read the same 2048-channel feature half
of their 4096-d concat input (regda/models/Encoder.py:40-46 semantics);
conv-over-concat splits exactly into conv-over-halves, so the shared
half of BOTH heads fuses into ONE N=1024 conv:

    conv(concat[feat, ppm_i], k_i) = conv(feat, k_i[:, :, :fc])
                                   + conv(ppm_i, k_i[:, :, fc:])

Identical FLOPs, one fewer full pass over the PPM block's biggest input;
measured +0.8-1.1% seg-infer throughput on v5e at bench.py's
configuration (tools/bench_fused_ppm.py, round 5 — the "fused dual-head
PPM conv" idea PERF.md's roofline section left on the table). Numerics:
same math regrouped; equals the stock forward to bf16 rounding
(asserted in tests and by the A/B tool).

Applies to the deployed (BN-folded) eval graph of the reference model
configuration (multi_layer + use_ppm); anything else falls back to
`model.apply`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from regda_tpu.ops.resize import (adaptive_avg_pool,
                                  resize_bilinear_align_corners,
                                  resize_bilinear_half_pixel)

_SCALES = (1, 2, 3, 6)   # PPMBilinear.pool_scales (reference Encoder.py:12)


def supports_fused_heads(model) -> bool:
    """The fused forward covers the deployed reference configuration:
    dual PPM heads on a folded (inference) DeeplabV2."""
    return (getattr(model, 'folded', False)
            and getattr(model, 'multi_layer', False)
            and getattr(model, 'use_ppm', False))


def fused_dual_ppm_eval(model, variables, x):
    """Eval forward (probs, like model.apply(train=False)) with the two
    heads' shared-feature conv fused. `model` must satisfy
    supports_fused_heads; `variables` are the FOLDED variables."""
    from regda_tpu.models.deeplabv2 import instance_norm
    from regda_tpu.models.resnet import ResNetEncoder

    dt = model.dtype
    p = variables['params']
    enc = ResNetEncoder(model.resnet_type, model.output_stride,
                        folded=True, dtype=dt)
    feat = enc.apply({'params': p['encoder']}, x, train=False)[-1]
    if model.is_ins_norm:
        feat = instance_norm(feat)
    feat = feat.astype(dt)
    h, w = feat.shape[1:3]
    fc = feat.shape[-1]

    def conv3x3(xin, kernel):
        return jax.lax.conv_general_dilated(
            xin, kernel.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def head_pools(ph):
        outs = []
        for i, s in enumerate(_SCALES):
            y = adaptive_avg_pool(feat, (s, s))
            y = y @ ph[f'ppm_{i}_conv']['kernel'][0, 0].astype(dt)
            y = jax.nn.relu(y + ph[f'ppm_{i}_bn']['bias'].astype(dt))
            outs.append(resize_bilinear_half_pixel(y, (h, w)))
        return jnp.concatenate(outs, axis=-1)

    p5, p6 = p['layer5'], p['layer6']
    k5 = p5['conv_last_conv']['kernel']
    k6 = p6['conv_last_conv']['kernel']
    # ONE conv for both heads' shared-feature half (N = 2 * 512)...
    shared = conv3x3(feat, jnp.concatenate(
        [k5[:, :, :fc, :], k6[:, :, :fc, :]], axis=-1))
    half = k5.shape[-1]
    preds = []
    for i, (ph, kh) in enumerate(((p5, k5), (p6, k6))):
        # ...plus each head's own pooled-pyramid half
        y = shared[..., i * half:(i + 1) * half] + conv3x3(
            head_pools(ph), kh[:, :, fc:, :])
        y = jax.nn.relu(y + ph['conv_last_bn']['bias'].astype(dt))
        y = (y @ ph['conv_last_out']['kernel'][0, 0].astype(dt)
             + ph['conv_last_out']['bias'].astype(dt))
        preds.append(y)
    # same fused eval tail as DeeplabV2.__call__: one full-res upsample of
    # the channel concat (bit-equal per-channel), softmaxes stay per-head
    both = resize_bilinear_align_corners(
        jnp.concatenate(preds, axis=-1), x.shape[1:3])
    n = model.num_classes
    return (jax.nn.softmax(both[..., :n], axis=-1)
            + jax.nn.softmax(both[..., n:], axis=-1)) / 2


def eval_forward(model, variables, x):
    """The deployed eval forward: fused dual-head path when supported
    (REGDA_NO_FUSED_PPM=1 reverts), else model.apply."""
    import os
    if supports_fused_heads(model) and not os.environ.get(
            'REGDA_NO_FUSED_PPM'):
        return fused_dual_ppm_eval(model, variables, x)
    return model.apply(variables, x, train=False)
