"""TransNorm: two-domain batch normalization with channel-importance residual.

Parity target: regda/trans_norm.py:8-430 (`_TransNorm`, `TransNorm1d/2d/3d`;
available in the reference but not wired into the used model config).

Semantics (trans_norm.py:169-232): the batch is [source; target] halves.
Each half is batch-normalized with its OWN running statistics but SHARED
affine (gamma/beta). A per-channel importance alpha is computed from the
distance between the domains' standardized means, alpha = C * p / sum(p)
with p = 1 / (1 + |mu_s/sigma_s - mu_t/sigma_t|), and the output is
z * (1 + stop_gradient(alpha)). At eval time the TARGET statistics
normalize the whole batch.

TPU-first notes: the source/target split is a static axis-0 slice (batch
layout is fixed by the trainer), so everything jits with static shapes.
Running stats live in the standard flax `batch_stats` collection. Under
data parallelism pass `axis_name` so the per-domain batch statistics are
`lax.pmean`'d across the mesh — a cross-device sync the single-GPU
reference never had.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn


class TransNorm(nn.Module):
    """Rank-agnostic TransNorm over channel-last inputs.

    Works for (B, C) [TransNorm1d], (B, H, W, C) [TransNorm2d] and
    (B, D, H, W, C) [TransNorm3d]: statistics reduce over every axis but the
    last.
    """
    momentum: float = 0.1          # torch convention: new = (1-m)*old + m*cur
    epsilon: float = 1e-5
    use_affine: bool = True
    axis_name: str | None = None   # data-parallel mesh axis for stat psum

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        red = tuple(range(x.ndim - 1))

        init_zeros = lambda *_: jnp.zeros((c,), jnp.float32)
        init_ones = lambda *_: jnp.ones((c,), jnp.float32)
        mean_s = self.variable('batch_stats', 'mean_source', init_zeros)
        var_s = self.variable('batch_stats', 'var_source', init_ones)
        mean_t = self.variable('batch_stats', 'mean_target', init_zeros)
        var_t = self.variable('batch_stats', 'var_target', init_ones)
        if self.use_affine:
            scale = self.param('scale', nn.initializers.ones, (c,))
            bias = self.param('bias', nn.initializers.zeros, (c,))
        else:
            scale = jnp.ones((c,), x.dtype)
            bias = jnp.zeros((c,), x.dtype)

        def moments(v):
            mu = v.mean(axis=red)
            var = ((v - mu.reshape((1,) * (v.ndim - 1) + (c,))) ** 2).mean(axis=red)
            if self.axis_name is not None:
                mu = jax.lax.pmean(mu, self.axis_name)
                var = jax.lax.pmean(var, self.axis_name)
            return mu, var

        def standardize(v, mu, var):
            shape = (1,) * (v.ndim - 1) + (c,)
            inv = jax.lax.rsqrt(var + self.epsilon)
            return ((v - mu.reshape(shape)) * inv.reshape(shape)
                    * scale.reshape(shape) + bias.reshape(shape))

        def alpha_from(mu_s, va_s, mu_t, va_t):
            dis = jnp.abs(mu_s * jax.lax.rsqrt(va_s + self.epsilon)
                          - mu_t * jax.lax.rsqrt(va_t + self.epsilon))
            prob = 1.0 / (1.0 + dis)
            a = c * prob / prob.sum()
            return jax.lax.stop_gradient(a).reshape((1,) * (x.ndim - 1) + (c,))

        if train:
            half = x.shape[0] // 2
            xs, xt = x[:half], x[half:]
            mu_s, va_s = moments(xs)
            mu_t, va_t = moments(xt)
            n = max(math.prod(xs.shape[:-1]), 2)
            bessel = n / (n - 1)
            if not self.is_initializing():
                m = self.momentum
                mean_s.value = (1 - m) * mean_s.value + m * mu_s
                var_s.value = (1 - m) * var_s.value + m * va_s * bessel
                mean_t.value = (1 - m) * mean_t.value + m * mu_t
                var_t.value = (1 - m) * var_t.value + m * va_t * bessel
            z = jnp.concatenate([standardize(xs, mu_s, va_s),
                                 standardize(xt, mu_t, va_t)], axis=0)
            # alpha uses the *current* batch statistics (unbiased variance)
            return z * (1.0 + alpha_from(mu_s, va_s * bessel, mu_t, va_t * bessel))
        else:
            z = standardize(x, mean_t.value, var_t.value)
            return z * (1.0 + alpha_from(mean_s.value, var_s.value,
                                         mean_t.value, var_t.value))


# Rank-specific aliases mirroring the reference class names.
TransNorm1d = TransNorm
TransNorm2d = TransNorm
TransNorm3d = TransNorm
