"""GDP loss and domain-balance weighting.

Parity targets:
  - GDPLoss (gradient-density pixel weighting with symmetric bins and
    EMA'd histogram): regda/gast/balance.py:218-303.
  - DomainBalance / examples_cnt / get_target_weight:
    regda/gast/domain_balance.py:15-70.

The reference's GDPLoss holds an EMA'd gradient histogram as module state;
here it is an explicit GDPState carried through the train step, like
GHMState in regda_tpu.ops.losses.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from regda_tpu.ops.labels import one_hot_ignore

EPS = 1e-7


class GDPState(NamedTuple):
    acc_sum: jnp.ndarray  # (bins,) EMA'd gradient histogram

    @staticmethod
    def create(bins: int = 30) -> "GDPState":
        return GDPState(acc_sum=jnp.zeros((bins,), jnp.float32))


def gdp_loss(state: GDPState, logits: jnp.ndarray, labels: jnp.ndarray,
             momentum: float = 0.99,
             extra_pixel_weight: jnp.ndarray | None = None,
             n_extra: int = 0) -> tuple[jnp.ndarray, GDPState]:
    """Gradient-density-weighted CE.

    Per-pixel gradient norm g = |p_y - 1|; histogram over 30 bins is
    symmetrized ((bins + flip(bins)) / 2), EMA'd, converted to a weight per
    bin w = norm(1 - bins/sum), and broadcast back to pixels. Ignored pixels
    get g = -1 which falls outside [0, 1] and takes weight 0.

    Args:
      logits: (B, H, W, C); labels: (B, H, W) ids (<0 = ignore).
      extra_pixel_weight: optional (B, H, W) additive weight (prototype or
        class-balance view); n_extra counts how many views were added so the
        normalizer matches the reference's (1 + refine + balance) divisor.
    Returns: (scalar loss, new state).
    """
    bins = state.acc_sum.shape[0]
    c = logits.shape[-1]
    flat = logits.reshape(-1, c)
    lab = labels.reshape(-1)
    valid = lab >= 0

    probs = jax.nn.softmax(flat, axis=-1)
    onehot = one_hot_ignore(lab, c).astype(probs.dtype)
    prob_y = (probs * onehot).sum(-1)
    gradient = jnp.where(valid, jnp.abs(prob_y - 1.0), -1.0)

    edges = jnp.arange(bins + 1, dtype=jnp.float32) / bins
    edges = edges.at[-1].add(1e-3)
    # torch.histc(min=0, max=1): only in-range values counted.
    in_range = (gradient >= 0.0) & (gradient <= 1.0)
    idx = jnp.clip((gradient * bins).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros((bins,), jnp.float32).at[idx].add(in_range.astype(jnp.float32))
    hist = (hist + jnp.flip(hist)) * 0.5
    acc = jnp.where(momentum > 0,
                    momentum * state.acc_sum + (1 - momentum) * hist, hist)

    cond = acc != 0
    w_bins = 1.0 - acc / (acc.sum() + EPS)
    w_bins = jnp.where(cond, w_bins, 0.0)
    w_bins = w_bins / (w_bins.max() + EPS)

    # bucketize against edges (right-closed like torch.bucketize default)
    inds = jnp.searchsorted(edges, gradient, side='left')
    pix_w = jnp.where((inds > 0) & (inds <= bins),
                      w_bins[jnp.clip(inds - 1, 0, bins - 1)], 0.0)
    pix_w = jax.lax.stop_gradient(pix_w)

    if extra_pixel_weight is not None:
        pix_w = pix_w + extra_pixel_weight.reshape(-1)

    logp = jax.nn.log_softmax(flat, axis=-1)
    ce = -(logp * onehot).sum(-1)
    loss = (ce * pix_w * valid).sum() / (valid.sum() + EPS) / (1.0 + n_extra)
    return loss, GDPState(acc_sum=acc)


# ---------------------------------------------------------------------------
# Domain balance (domain_balance.py:15-70)
# ---------------------------------------------------------------------------

def examples_cnt(label_batches, ignore_label: int = -1,
                 save_prob: bool = False,
                 channel_axis: int = 1) -> tuple[float, float]:
    """Count valid (non-ignored) pixels over an iterable of label arrays.

    Host-side utility (runs once over a loader). Each element is (B, H, W)
    ids, or probabilities when save_prob (channel dim at `channel_axis`;
    the reference's loader yields (B, C, H, W) — domain_balance.py:20-35).
    Returns (valid count, valid ratio).
    """
    import numpy as np
    cnt, cnt_all = 0.0, 0.0
    for lbl in label_batches:
        lbl = np.asarray(lbl)
        if save_prob:
            lbl = lbl.argmax(axis=channel_axis)
        cnt += float((lbl != ignore_label).sum())
        cnt_all += float(lbl.size)
    return cnt, cnt / max(cnt_all, 1.0)


def target_domain_weight(cnt_s: float, ratio_s: float,
                         cnt_t: float, ratio_t: float) -> float:
    """Loss weight for the target domain; clipped at 1
    (domain_balance.py:38-40)."""
    weight = cnt_t * ratio_s / (cnt_s * ratio_t + EPS)
    return 1.0 if weight >= 1.0 else float(weight)
