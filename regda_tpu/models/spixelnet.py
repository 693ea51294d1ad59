"""SpixelNet: CNN superpixel network with alternating h/v deconvolutions.

Parity target: regda/gast/sin/spixel_deconv.py:13-121 (`SpixelNet`) and
sin/model_util.py:12-62 (conv/deconv/predict_mask helpers). Imported nowhere
in the reference's active path; kept for inventory (SURVEY.md §2.1).

Contract preserved: a 5-stage stride-2 conv encoder (16..256 channels,
LeakyReLU 0.1, optional BN) followed by an alternating horizontal/vertical
transposed-conv decoder that emits softmaxed 2-way assignment probabilities
after every half-upsample, coarse-to-fine:
(prob0_v, prob0_h, prob1_v, prob1_h, prob2_v, prob2_h, prob3_v, prob3_h),
where prob{k} maps have spatial stride 2^k relative to the input.

TPU-first deviation (documented): the reference's ConvTranspose2d(k=3, s=2,
p=1) produces odd (2n-1) output sizes, which forces ragged shapes down the
decoder. Here each deconv is a flax ConvTranspose with SAME padding giving
exact 2x (or 1x2 / 2x1) upsampling, so every level is a clean power-of-two
shape that XLA tiles cleanly. The 9-way `pred_mask` heads of the unused
full-deconv path are exposed via `assign_ch`.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class _ConvBlock(nn.Module):
    features: int
    stride: int = 1
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding='SAME', use_bias=not self.use_bn,
                    dtype=self.dtype)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        return _lrelu(x)


class SpixelNet(nn.Module):
    use_bn: bool = True
    assign_ch: int = 9
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        blk = lambda f, s: _ConvBlock(f, s, self.use_bn, self.dtype)
        # encoder: receptive fields 5,11,23,47,95 (spixel_deconv.py:81-85)
        out = blk(16, 1)(x, train)
        out = blk(16, 1)(out, train)
        for f in (32, 64, 128, 256):
            out = blk(f, 2)(out, train)
            out = blk(f, 1)(out, train)

        def up(v, feats, sh, sw, name):
            v = nn.ConvTranspose(feats, (3, 3), strides=(sh, sw),
                                 padding='SAME', dtype=self.dtype,
                                 name=name)(v)
            return _lrelu(v)

        def head(v, ch, name):
            m = nn.Conv(ch, (3, 3), padding='SAME', dtype=self.dtype,
                        name=name)(v)
            return nn.softmax(m, axis=-1)

        probs = []
        feats_per_level = (128, 64, 32, 16)
        for lvl, f in zip((3, 2, 1, 0), feats_per_level):
            out = up(out, f, 1, 2, f'deconv{lvl}_h')
            probs.append(head(out, 2, f'pred_mask{lvl}_h'))
            out = up(out, f, 2, 1, f'deconv{lvl}_v')
            probs.append(head(out, 2, f'pred_mask{lvl}_v'))
        # return fine-to-coarse, v before h, matching the reference tuple
        p3h, p3v, p2h, p2v, p1h, p1v, p0h, p0v = probs
        return p0v, p0h, p1v, p1h, p2v, p2h, p3v, p3h
