"""Inference-time BatchNorm folding for the segmenter eval forward.

At eval, BatchNorm with running stats is a per-channel affine
``y = x * s + t`` with ``s = scale / sqrt(var + eps)`` and
``t = bias - mean * s``. Because every BN in the model directly follows a
bias-free conv, ``s`` folds EXACTLY into the conv kernel's output channels
(conv is linear) and only the ``+ t`` bias survives at runtime — removing
the per-pixel normalize/scale VPU work from the hot eval path entirely
(the bias-add fuses into the conv epilogue). This is the standard
deploy-time transform the reference gets implicitly from torch's
``model.eval()`` + cuDNN fusion (parity target: the eval forwards driven
by regda/utils/tools.py:61-97 and regda/utils/eval.py:14-56); on TPU we do
it explicitly as a variables transform so XLA sees a pure conv+bias graph.

Usage:
    fmodel = folded_model(model)            # same module tree, BN -> bias
    fvars  = fold_batchnorm(variables)      # {'params', 'batch_stats'} ->
                                            # {'params'} with scaled kernels
    probs  = fmodel.apply(fvars, x, train=False)

Equivalence (same math regrouped; float rounding only) is asserted in
tests/test_model.py. Training always uses the unfolded model — folding is
for eval/inference/bench paths (SegInferencer applies it by default when
the checkpoint carries batch stats; REGDA_NO_FOLD_BN=1 disables).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

BN_EPS = 1e-5  # every BatchNorm in models/{resnet,heads}.py uses eps=1e-5


class FoldedBias(nn.Module):
    """Stand-in for an eval BatchNorm whose affine was folded into the
    preceding conv: a bare per-channel bias add (fuses into the conv
    epilogue). Parameter name 'bias' matches fold_batchnorm's output."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        bias = self.param('bias', nn.initializers.zeros, (x.shape[-1],))
        return x + bias.astype(x.dtype)


def _fold_level(params, stats, eps):
    params = dict(params)
    stats = stats or {}
    for k in list(params):
        sub = params[k]
        if not isinstance(sub, dict):
            continue
        st = stats.get(k)
        if st is not None and 'mean' in st and 'scale' in sub:
            # a BatchNorm module: its conv sibling follows the repo-wide
            # naming convention bnN <- convN, downsample_bn <-
            # downsample_conv, ppm_i_bn <- ppm_i_conv, conv_last_bn <-
            # conv_last_conv (models/resnet.py, models/heads.py)
            conv_k = k.replace('bn', 'conv')
            if conv_k not in params or 'kernel' not in params[conv_k]:
                raise ValueError(
                    f'BatchNorm {k!r} has no conv sibling {conv_k!r} to '
                    'fold into')
            s = (sub['scale'] /
                 jnp.sqrt(st['var'].astype(jnp.float32) + eps))
            t = sub['bias'] - st['mean'].astype(jnp.float32) * s
            conv = dict(params[conv_k])
            # kernels are (kh, kw, in, out) for both nn.Conv and StemConv;
            # s scales the OUT dim (last)
            conv['kernel'] = (conv['kernel'].astype(jnp.float32) * s
                              ).astype(params[conv_k]['kernel'].dtype)
            params[conv_k] = conv
            params[k] = {'bias': t}
        else:
            params[k] = _fold_level(sub, st, eps)
    return params


def fold_batchnorm(variables, eps: float = BN_EPS):
    """Fold every BatchNorm's eval affine into its preceding conv kernel.

    Returns variables for the `folded=True` model: the 'batch_stats'
    collection is consumed, each BN params entry {'scale','bias'} becomes
    {'bias': t}, and each paired conv kernel is scaled. Variables without
    'batch_stats' are returned unchanged (already folded / stat-free)."""
    if 'batch_stats' not in variables:
        return variables
    folded = _fold_level(variables['params'], variables['batch_stats'], eps)
    return {'params': folded,
            **{k: v for k, v in variables.items()
               if k not in ('params', 'batch_stats')}}


# jit the tree transform: eager execution would issue ~4 tiny dispatches
# per BN layer (hundreds for ResNet-101) through the ~10 ms-latency
# tunneled backend every time a training eval refreshes the weights
fold_batchnorm_jit = jax.jit(fold_batchnorm, static_argnames=('eps',))


def folded_model(model):
    """Clone a module tree with `folded=True` (BN layers become
    FoldedBias). The model must expose a `folded` attribute."""
    return model.clone(folded=True)
