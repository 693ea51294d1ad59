"""Class prototypes: Pearson distance, batch-local prototypes, EMA updates.

Parity targets (reference):
  - pearson_dist:          regda/gast/alignment.py:396-423
  - _compute_local_prototypes / update_prototype: alignment.py:300-327, 86-90
  - update_avg / init_avg (running-sum init):     alignment.py:107-126
  - _ema:                                         alignment.py:435-438

In the reference these live on a mutable GPU-resident `Aligner`; here the
prototype matrix (C, K) and the running (sum, cnt) accumulators are explicit
state arrays threaded through the jit'd train step (replicated across the
data-parallel mesh; local statistics are global reductions over the sharded
batch so GSPMD inserts the psum for free).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7


def ema(history: jnp.ndarray, curr: jnp.ndarray, decay: float) -> jnp.ndarray:
    return (1.0 - decay) * curr + decay * history


def pearson_dist(feat1: jnp.ndarray, feat2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Pearson distance in [0, 1]. feat1 (N, K), feat2 (M, K) -> (N, M).

    Matches the reference's Bessel-corrected covariance / (std_n * std_m)
    formulation (alignment.py:396-423), but computes the N x M covariance as
    one (N,K)@(K,M) matmul instead of a broadcasted elementwise product —
    this is the op that touches (B*H*W, 2048) features, so it must ride the MXU.
    """
    k = feat1.shape[-1]
    c1 = feat1 - feat1.mean(axis=-1, keepdims=True)
    c2 = feat2 - feat2.mean(axis=-1, keepdims=True)
    cov = jnp.matmul(c1, c2.T, precision='highest') / (k - 1 + EPS)                                  # (N, M)
    std1 = feat1.std(axis=-1, ddof=1)[:, None]                         # (N, 1)
    std2 = feat2.std(axis=-1, ddof=1)[None, :]                         # (1, M)
    return (-1.0 * cov / (std1 * std2 + EPS) + 1.0) * 0.5


def local_prototypes(feat: jnp.ndarray, label_onehot: jnp.ndarray,
                     fallback: jnp.ndarray) -> jnp.ndarray:
    """Per-class mean features within a batch.

    Args:
      feat: (N, K) features (flattened B*H*W at feature stride).
      label_onehot: (N, C) ignore-aware one-hot.
      fallback: (C, K) used for classes with zero samples (the global
        prototypes, so empty classes don't decay toward zero —
        alignment.py:319-322).
    Returns: (C, K)
    """
    sums = jnp.matmul(label_onehot.T, feat, precision='highest')       # (C, K)
    counts = label_onehot.sum(axis=0)[:, None]                         # (C, 1)
    local = sums / (counts + EPS)
    return jnp.where(counts < 1, fallback, local)


def prototype_update(prototypes: jnp.ndarray, feat: jnp.ndarray,
                     label_onehot: jnp.ndarray, decay: float = 0.996) -> jnp.ndarray:
    """EMA-update global prototypes from a batch (alignment.py:86-90,324-325)."""
    local = local_prototypes(feat, label_onehot, prototypes)
    return ema(prototypes, local, decay)


def prototype_accumulate(data_sum: jnp.ndarray, data_cnt: jnp.ndarray,
                         feat: jnp.ndarray, label_onehot: jnp.ndarray):
    """Running-sum accumulation for init_prototypes (alignment.py:107-119)."""
    data_sum = data_sum + jnp.matmul(label_onehot.T, feat, precision='highest')  # (C, K)
    data_cnt = data_cnt + label_onehot.sum(axis=0)[:, None]            # (C, 1)
    return data_sum, data_cnt


def prototype_finalize(data_sum: jnp.ndarray, data_cnt: jnp.ndarray) -> jnp.ndarray:
    """alignment.py:121-122."""
    return data_sum / (data_cnt + EPS)
