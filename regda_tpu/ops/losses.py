"""Loss zoo + class-balance EMA + domain-alignment criteria.

Parity targets (reference):
  - ClassBalance:              regda/gast/balance.py:15-78
  - CrossEntropy:              balance.py:81-101
  - OhemCrossEntropy:          balance.py:104-133
  - FocalLoss:                 balance.py:136-158
  - GHMLoss:                   balance.py:161-215
  - UPSLoss:                   balance.py:306-342
  - UVEMLoss:                  balance.py:345-434
  - loss_calc / loss_calc_uvem: regda/utils/tools.py:240-260, balance.py:437-457
  - PrototypeContrastiveLoss:  regda/loss.py:10-47
  - CoralLoss:                 regda/gast/coral.py:15-47
  - MMDLoss:                   regda/gast/mmd.py:15-58

Design: every loss is a pure function of (logits_nhwc, labels, ...) with an
optional per-pixel weight; losses that carry cross-step state (class-freq
EMA, GHM bin histogram) take and return that state explicitly so the whole
step stays one jit'd function. Logits are channel-last (B, H, W, C).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from regda_tpu.ops.labels import one_hot_ignore
from regda_tpu.ops.resize import resize_bilinear_align_corners

EPS = 1e-7


def _flatten(logits: jnp.ndarray, labels: jnp.ndarray):
    c = logits.shape[-1]
    return logits.reshape(-1, c), labels.reshape(-1)


def softmax_cross_entropy_ignore(logits: jnp.ndarray, labels: jnp.ndarray,
                                 ignore_label: int = -1) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel CE with ignore mask. Returns (loss (N,), valid (N,) bool)."""
    lg, lb = _flatten(logits, labels)
    valid = lb != ignore_label
    safe = jnp.where(valid, lb, 0)
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    return jnp.where(valid, nll, 0.0), valid


# ---------------------------------------------------------------- ClassBalance

class ClassBalanceState(NamedTuple):
    """EMA class-frequency tracker (balance.py:15-78)."""
    freq: jnp.ndarray  # (C,)

    @staticmethod
    def create(num_classes: int) -> "ClassBalanceState":
        return ClassBalanceState(jnp.ones((num_classes,), jnp.float32) / num_classes)


def class_balance_weights(state: ClassBalanceState, labels: jnp.ndarray,
                          num_classes: int, ignore_label: int = -1,
                          decay: float = 0.99, temperature: float = 2.0
                          ) -> tuple[jnp.ndarray, ClassBalanceState]:
    """Per-pixel weights from EMA class frequency; updates the EMA.

    Matches ClassBalance.get_class_weight_4pixel (balance.py:27-43):
    weight_c = softmax((1-freq)/T) / max(...); ignored pixels weigh 0.
    """
    lb = labels.reshape(-1)
    onehot = one_hot_ignore(lb, num_classes, ignore_label)            # (N, C)
    local_cnt = (lb != ignore_label).sum().astype(jnp.float32)
    class_freq = onehot.sum(axis=0) / (local_cnt + EPS)
    freq = (1.0 - decay) * class_freq + decay * state.freq
    prob = jax.nn.softmax((1.0 - freq) / temperature)
    prob = prob / (prob.max() + EPS)
    weight = jnp.matmul(onehot, prob, precision='highest')            # (N,)
    return weight, ClassBalanceState(freq)


# ---------------------------------------------------------------- basic losses

def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       ignore_label: int = -1,
                       pixel_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CE over *all* pixels (reference uses reduction-none + mean over
    every element, with ignored entries contributing 0 — balance.py:97-101)."""
    nll, _ = softmax_cross_entropy_ignore(logits, labels, ignore_label)
    if pixel_weight is not None:
        nll = nll * pixel_weight
    return nll.mean()


def ohem_cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                            ignore_label: int = -1, thresh: float = 0.7,
                            pixel_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Online hard example mining CE (balance.py:104-133).

    Keeps losses above -log(thresh); if fewer than n_valid/5 such pixels,
    keeps the top n_valid/5 instead. n_min is data-dependent, so instead of a
    dynamic top-k we sort once and read the k-th value with a traced gather
    (identical result up to ties at the cutoff).
    """
    nll, valid = softmax_cross_entropy_ignore(logits, labels, ignore_label)
    if pixel_weight is not None:
        nll = nll * pixel_weight
    loss_thresh = -jnp.log(jnp.asarray(thresh, jnp.float32))
    n_min = valid.sum() // 5
    sorted_desc = jnp.sort(nll)[::-1]
    kth = sorted_desc[jnp.clip(n_min - 1, 0, nll.shape[0] - 1)]
    n_hard = (nll > loss_thresh).sum()
    # hard set is {nll > thresh} when big enough, else the top-n_min set
    keep = jnp.where(n_hard >= n_min, nll > loss_thresh, nll >= kth)
    kept = jnp.where(keep, nll, 0.0)
    return kept.sum() / (keep.sum() + EPS)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray, gamma: float = 2.0,
               ignore_label: int = -1) -> jnp.ndarray:
    """balance.py:136-158 (mean over all pixels; ignored contribute 0)."""
    nll, _ = softmax_cross_entropy_ignore(logits, labels, ignore_label)
    pt = jnp.exp(-nll)
    return ((1.0 - pt) ** gamma * nll).mean()


# ---------------------------------------------------------------- GHM

class GHMState(NamedTuple):
    """30-bin gradient-density histogram EMA (balance.py:161-215)."""
    acc_sum: jnp.ndarray  # (bins,)

    @staticmethod
    def create(bins: int = 30) -> "GHMState":
        return GHMState(jnp.zeros((bins,), jnp.float32))


def ghm_loss(state: GHMState, logits: jnp.ndarray, labels: jnp.ndarray,
             bins: int = 30, momentum: float = 0.99, ignore_label: int = -1
             ) -> tuple[jnp.ndarray, GHMState]:
    lg, lb = _flatten(logits, labels)
    valid = lb != ignore_label
    probs = jax.nn.softmax(lg, axis=-1)
    onehot = one_hot_ignore(lb, lg.shape[-1], ignore_label)
    prob_y = (probs * onehot).sum(axis=-1)
    gradient = jnp.abs(prob_y - 1.0)
    gradient = jnp.where(valid, gradient, -1.0)  # invalid -> below all bins

    edges = jnp.concatenate([
        jnp.arange(bins, dtype=jnp.float32) / bins,
        jnp.asarray([1.0 + 1e-3], jnp.float32),
    ])
    # histc over [0,1] (out-of-range excluded) + right-continuous bucketize
    in_range = (gradient >= 0.0) & (gradient <= 1.0)
    idx = jnp.clip((gradient * bins).astype(jnp.int32), 0, bins - 1)
    # histc puts g==1.0 into the last bin
    hist = jax.ops.segment_sum(in_range.astype(jnp.float32), idx, num_segments=bins)
    inds = jnp.searchsorted(edges, gradient, side='left')  # torch.bucketize default
    acc = momentum * state.acc_sum + (1.0 - momentum) * hist if momentum > 0 else hist

    w = jnp.where((inds > 0) & (inds <= bins),
                  1.0 / acc[jnp.clip(inds - 1, 0, bins - 1)], 0.0)
    nll, _ = softmax_cross_entropy_ignore(logits, labels, ignore_label)
    loss = (nll * w).sum() / (valid.sum() + EPS)
    return loss, GHMState(acc)


# ---------------------------------------------------------------- UPS / UVEM

def _soft_entropy(label_soft_flat: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(-label_soft_flat * jnp.log(label_soft_flat + 0.0), axis=-1)


def ups_loss(logits: jnp.ndarray, labels: jnp.ndarray, label_soft: jnp.ndarray,
             threshold: float = 0.7, ignore_label: int = -1,
             pixel_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Entropy-gated CE (balance.py:306-342). label_soft is softmaxed (B,H,W,C)."""
    nll, valid = softmax_cross_entropy_ignore(logits, labels, ignore_label)
    ls = label_soft.reshape(-1, label_soft.shape[-1])
    unc = _soft_entropy(ls)
    nll = jnp.where(unc > threshold, 0.0, nll)
    if pixel_weight is not None:
        nll = nll * pixel_weight
    valid_cnt = ((unc <= threshold) & valid).sum()
    return nll.sum() / (valid_cnt + EPS)


def uvem_weight(uncertainty: jnp.ndarray, m: float = 0.2, threshold: float = 0.7,
                gamma: float = 4.0) -> jnp.ndarray:
    """Piecewise-quadratic valuable-example weight (balance.py:396-423)."""
    u = uncertainty
    if m > 0:
        left = jnp.clip((-1.0 / m ** 2) * (u - m) ** 2 + 1.0, 0.0, 1.0) ** (1.0 / gamma)
    else:
        left = jnp.ones_like(u)
    if m < threshold:
        # outside (m, t] the reference evaluates the parabola at u=0
        u_right = jnp.where((u > m) & (u <= threshold), u, 0.0)
        right = jnp.clip((-1.0 / (threshold - m) ** 2) * (u_right - m) ** 2 + 1.0,
                         0.0, 1.0) ** (1.0 / gamma)
    else:
        right = jnp.zeros_like(u)
    w = jnp.where(u <= m, left, right)
    return jnp.where(u >= threshold, 0.0, w)


def uvem_loss(logits: jnp.ndarray, labels: jnp.ndarray, label_soft: jnp.ndarray,
              m: float = 0.2, threshold: float = 0.7, gamma: float = 4.0,
              ignore_label: int = -1,
              pixel_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Uncertainty-based valuable example mining (balance.py:345-394)."""
    nll, valid = softmax_cross_entropy_ignore(logits, labels, ignore_label)
    ls = label_soft.reshape(-1, label_soft.shape[-1])
    unc = _soft_entropy(ls)
    nll = jnp.where(unc > threshold, 0.0, nll)
    w = uvem_weight(unc, m, threshold, gamma)
    if pixel_weight is not None:
        w = w * pixel_weight
    valid_cnt = ((unc <= threshold) & valid).sum()
    return (w * nll).sum() / (valid_cnt + EPS)


# ---------------------------------------------------------------- PCL / CORAL / MMD

def prototype_contrastive_loss(prototypes: jnp.ndarray, feat: jnp.ndarray,
                               labels: jnp.ndarray, temperature: float = 8.0,
                               ignore_label: int = -1) -> jnp.ndarray:
    """regda/loss.py:10-47. feat (N, K) [or (B,H,W,K)], labels (N,) [or (B,H,W)].

    CE over cosine logits to *stop-gradient* prototypes; mean over valid
    pixels (ignored pixels masked out of both numerator and denominator).
    """
    if feat.ndim != 2:
        feat = feat.reshape(-1, feat.shape[-1])
    labels = labels.reshape(-1)
    protos = jax.lax.stop_gradient(prototypes)
    f = feat / (jnp.linalg.norm(feat, axis=-1, keepdims=True) + 1e-12)
    p = protos / (jnp.linalg.norm(protos, axis=-1, keepdims=True) + 1e-12)
    logits = jnp.matmul(f, p.T, precision='highest') / temperature     # (N, C)
    valid = labels != ignore_label
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / (valid.sum() + EPS)


def coral_loss(source: jnp.ndarray, target: jnp.ndarray, is_sqrt: bool = False) -> jnp.ndarray:
    """Deep CORAL eq.(1) (regda/gast/coral.py:15-47). source/target (N, K)."""
    d = source.shape[1]
    ns, nt = source.shape[0], target.shape[0]
    xm = source.mean(axis=0, keepdims=True) - source
    xc = jnp.matmul(xm.T, xm, precision='highest') / (ns - 1)
    xmt = target.mean(axis=0, keepdims=True) - target
    xct = jnp.matmul(xmt.T, xmt, precision='highest') / (nt - 1)
    loss = jnp.sum((xc - xct) * (xc - xct))
    loss = jnp.sqrt(loss) if is_sqrt else loss
    return loss / (4.0 * d * d)


def mmd_loss(source: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Linear-kernel MMD (regda/gast/mmd.py:15-58, kernel_type='linear')."""
    delta = source.mean(axis=0) - target.mean(axis=0)
    return jnp.dot(delta, delta)


# ---------------------------------------------------------------- multi-head wrappers

def multi_head_loss(preds: list[jnp.ndarray], labels: jnp.ndarray, loss_fn,
                    **kw) -> jnp.ndarray:
    """loss_calc (utils/tools.py:240-260): upsample each head to label res
    (bilinear align_corners=True) and average the per-head losses."""
    hw = labels.shape[-2:]
    total = 0.0
    for p in preds:
        if p.shape[1:3] != hw:
            p = resize_bilinear_align_corners(p, hw)
        total = total + loss_fn(p, labels, **kw)
    return total / len(preds)
