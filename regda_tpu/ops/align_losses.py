"""Prototype/instance alignment losses and whitening regularizers.

Parity targets (research ops from the reference's GAST lineage, kept in the
inventory — SURVEY.md §2.5 — though unused by the three regda training
tools):
  - class_align_loss / instance_align_loss: regda/gast/alignment.py:329-394
    (margin loss with hardest-negative mining over Pearson distances)
  - SAW (semantic-aware whitening): regda/gast/SAW.py:16-120
  - PixelContrastLoss: regda/gast/contrastive.py:27-163
  - TripletLoss: regda/gast/triple.py:13-56
  - MSCLoss: regda/gast/MSCLoss.py:14-125
  - CategoryAlign_Module / ICR / CCR / MSE_intra / MSE_cross:
    regda/dca_modules.py:14-189

TPU-first redesign notes:
  * The reference's per-class / per-batch Python loops become vmaps over
    stacked masks so XLA emits batched MXU matmuls.
  * PixelContrastLoss's data-dependent anchor sampling (dynamic counts,
    `.nonzero()`, Python branching) is re-expressed with STATIC (B*C, n_view)
    slots: per-slot pixels are chosen by top-k over a random priority that
    prefers hard anchors (pred==c, y!=c), and slots with too few pixels are
    masked out of the InfoNCE denominator — same estimator, jit-compatible.
  * MSCLoss's `.item()` host syncs and list buildups become pure top-k /
    one-hot-vote tensor ops.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from regda_tpu.ops.labels import one_hot_ignore
from regda_tpu.ops.prototypes import pearson_dist

EPS = 1e-7


# ---------------------------------------------------------------------------
# Margin alignment losses (alignment.py:329-394)
# ---------------------------------------------------------------------------

def class_align_loss(prototypes_1: jnp.ndarray, prototypes_2: jnp.ndarray,
                     margin: float = 0.3, hard_ratio: float = 0.3) -> jnp.ndarray:
    """Margin loss between two (C, K) local prototypes with hardest-negative
    mining over the Pearson-distance matrix."""
    c = prototypes_1.shape[0]
    dist = pearson_dist(prototypes_1, prototypes_2)                 # (C, C)
    hard_num = min(math.ceil(hard_ratio * c), c - 1)
    eye_neg = 1.0 - jnp.eye(c, dtype=dist.dtype)
    # k+1 smallest of dist*eye_neg: slot 0 is the zeroed diagonal, drop it.
    neg = -jax.lax.top_k(-(dist * eye_neg), hard_num + 1)[0][:, 1:]  # (C, hard)
    pos = jnp.diagonal(dist)[:, None]                                # (C, 1)
    return jnp.maximum(pos - neg + margin, 1e-6).mean()


def instance_align_loss(feat: jnp.ndarray, label: jnp.ndarray,
                        prototypes: jnp.ndarray,
                        margin: float = 0.3, hard_ratio: float = 0.3) -> jnp.ndarray:
    """Margin loss between per-pixel features and class prototypes.

    Args:
      feat: (B, h, w, K) features.  label: (B, h, w) ids (<0 = ignore).
      prototypes: (C, K).
    """
    c, k = prototypes.shape
    flat = feat.reshape(-1, k)
    lab = label.reshape(-1)
    valid = (lab >= 0).astype(flat.dtype)[:, None]                  # (N, 1)
    mask_pos = one_hot_ignore(lab, c).astype(flat.dtype)            # (N, C)
    dist = pearson_dist(flat, prototypes)                           # (N, C)
    hard_num = min(math.ceil(hard_ratio * c) + 1, c)
    neg = -jax.lax.top_k(-(dist * (1.0 - mask_pos)), hard_num)[0][:, 1:]
    pos = (dist * mask_pos).sum(axis=1, keepdims=True)              # (N, 1)
    loss = jnp.maximum(pos - neg + margin, 1e-6) * valid
    cnt = valid.sum() * (hard_num - 1)
    return loss.sum() / (cnt + EPS)


# ---------------------------------------------------------------------------
# SAW — semantic-aware whitening (SAW.py:16-120)
# ---------------------------------------------------------------------------

def saw_loss(feats: jnp.ndarray, classifier_weights: jnp.ndarray,
             selected_classes, relax_denom: float = 2.0) -> jnp.ndarray:
    """Group-whitening penalty on classifier-sorted channel groups.

    Args:
      feats: (B, H, W, K) features feeding the classifier head.
      classifier_weights: (C_cls, K) 1x1-conv classifier weight (squeezed).
      selected_classes: class rows used to pick/weight channels; len must be
        in {2,4,6,8,16} (reference asserts this).
    """
    sel = jnp.asarray(list(selected_classes))
    n_sel = int(sel.shape[0])
    assert n_sel in (2, 4, 6, 8, 16)
    b, h, w, k = feats.shape
    n_groups = k // n_sel

    w_abs = jnp.abs(classifier_weights)                              # (C, K)
    order = jnp.argsort(-w_abs, axis=1)                              # desc
    gate = jax.nn.sigmoid(w_abs)
    # group g, slot j: channel = order[sel[j], g], weight = gate[sel[j], channel]
    ch = order[sel, :n_groups]                                       # (n_sel, G)
    wg = jnp.take_along_axis(gate[sel], ch, axis=1)                  # (n_sel, G)
    x = feats.reshape(b, h * w, k)
    grouped = x[:, :, ch.T] * wg.T[None, None]                       # (B, HW, G, n_sel)
    grouped = grouped.transpose(2, 0, 3, 1)                          # (G, B, n_sel, HW)

    eye = jnp.eye(n_sel, dtype=feats.dtype)
    off_mask = jnp.triu(jnp.ones((n_sel, n_sel), feats.dtype), k=1)
    num_off = off_mask.sum()
    margin = jnp.floor(num_off / relax_denom) if relax_denom else 0.0

    def group_loss(g):                                               # g: (B, n_sel, HW)
        cov = jnp.einsum('bch,bdh->bcd', g, g) / (h * w - 1) + 1e-5 * eye
        off = jnp.abs(cov * off_mask).sum(axis=(1, 2)) - margin
        return jnp.maximum(off / num_off, 0.0).sum() / b

    return jax.vmap(group_loss)(grouped).sum()


# ---------------------------------------------------------------------------
# Pixel contrastive loss (contrastive.py:27-163), static-shape redesign
# ---------------------------------------------------------------------------

def pixel_contrast_loss(rng: jax.Array, feats: jnp.ndarray,
                        labels: jnp.ndarray, predict: jnp.ndarray,
                        num_classes: int, max_samples: int = 1024,
                        max_views: int = 100, temperature: float = 0.1,
                        base_temperature: float = 0.07) -> jnp.ndarray:
    """Supervised InfoNCE over hard-mined pixel anchors.

    Args:
      feats: (B, h, w, K) projected features.
      labels: (B, h, w) GT ids at feature resolution (<0 ignore) — the
        anchor-class source (reference's `y_hat` after its arg swap).
      predict: (B, h, w) predicted ids — hardness reference.

    Anchors: for each (image, class) slot with > max_views pixels of that
    label, draw n_view pixels favoring hard ones (predict != label).
    """
    b, h, w, k = feats.shape
    n_slots = b * num_classes
    n_view = min(max(max_samples // max(n_slots, 1), 1), max_views)

    flat_f = feats.reshape(b, h * w, k)
    flat_y = labels.reshape(b, h * w)
    flat_p = predict.reshape(b, h * w)

    cls_ids = jnp.arange(num_classes)
    is_cls = flat_y[:, None, :] == cls_ids[None, :, None]            # (B, C, HW)
    counts = is_cls.sum(-1)                                          # (B, C)
    slot_valid = counts > max_views                                  # (B, C)
    hard = is_cls & (flat_p[:, None, :] != cls_ids[None, :, None])

    # priority: eligible pixels ~U(0,1) (+1 if hard), others -inf
    u = jax.random.uniform(rng, (b, num_classes, h * w))
    prio = jnp.where(is_cls, u + hard.astype(u.dtype), -jnp.inf)
    _, idx = jax.lax.top_k(prio, n_view)                             # (B, C, n_view)
    anchors = jnp.take_along_axis(flat_f[:, None], idx[..., None], axis=2)
    anchors = anchors.reshape(n_slots, n_view, k)
    slot_y = jnp.broadcast_to(cls_ids[None], (b, num_classes)).reshape(n_slots)
    slot_valid = slot_valid.reshape(n_slots)

    # InfoNCE over all anchor views; invalid slots masked everywhere.
    cf = anchors.transpose(1, 0, 2).reshape(n_slots * n_view, k)     # unbind dim=1
    vy = jnp.tile(slot_y, n_view)
    vv = jnp.tile(slot_valid, n_view)
    logits = (cf @ cf.T) / temperature
    logits = logits - jax.lax.stop_gradient(logits.max(axis=1, keepdims=True))
    pos_mask = (vy[:, None] == vy[None, :]) & vv[:, None] & vv[None, :]
    pos_mask = pos_mask & ~jnp.eye(len(vy), dtype=bool)
    neg_mask = (vy[:, None] != vy[None, :]) & vv[:, None] & vv[None, :]
    neg_sum = (jnp.exp(logits) * neg_mask).sum(1, keepdims=True)
    log_prob = logits - jnp.log(jnp.exp(logits) + neg_sum + EPS)
    mean_log_prob_pos = (pos_mask * log_prob).sum(1) / (pos_mask.sum(1) + EPS)
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return (loss * vv).sum() / (vv.sum() + EPS)


# ---------------------------------------------------------------------------
# Triplet loss with hard mining (triple.py:13-56)
# ---------------------------------------------------------------------------

def triplet_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
                 margin: float = 0.3) -> jnp.ndarray:
    """Batch-hard triplet margin loss on (N, K) embeddings."""
    sq = (inputs ** 2).sum(axis=1)
    dist = sq[:, None] + sq[None, :] - 2.0 * inputs @ inputs.T
    dist = jnp.sqrt(jnp.clip(dist, 1e-12))
    same = targets[:, None] == targets[None, :]
    d_ap = jnp.where(same, dist, -jnp.inf).max(axis=1)
    d_an = jnp.where(same, jnp.inf, dist).min(axis=1)
    return jnp.maximum(margin + d_ap - d_an, 0.0).mean()


# ---------------------------------------------------------------------------
# MSC loss (MSCLoss.py:14-125), static top-k redesign
# ---------------------------------------------------------------------------

def msc_loss(src_features: jnp.ndarray, src_labels: jnp.ndarray,
             tgt_features: jnp.ndarray, num_classes: int,
             k: int = 3, m: int = 3, mu: int = 8) -> jnp.ndarray:
    """kNN-vote target pseudo-labels + sim-ratio confidence filtering +
    same/diff-class softmax contrast over inverse-distance similarities.

    Args:
      src_features: (Ns, K); src_labels: (Ns,); tgt_features: (Nt, K).
      k: kNN votes per target; m: top-r similarities in the ratio;
      mu: number of confident targets kept.
    """
    sim = 1.0 / (jnp.linalg.norm(
        src_features[:, None] - tgt_features[None], axis=-1) + 1.0)   # (Ns, Nt)

    # kNN vote: top-k most-similar sources per target, majority label.
    _, nn_idx = jax.lax.top_k(sim.T, k)                              # (Nt, k)
    votes = one_hot_ignore(src_labels[nn_idx], num_classes).sum(1)   # (Nt, C)
    tgt_labels = votes.argmax(-1)                                    # (Nt,)

    same_cls = src_labels[:, None] == tgt_labels[None, :]            # (Ns, Nt)
    nln = jnp.where(same_cls, sim, -jnp.inf)
    nun = jnp.where(same_cls, -jnp.inf, sim)
    nln_top = jax.lax.top_k(nln.T, m)[0]                             # (Nt, m)
    nun_top = jax.lax.top_k(nun.T, m)[0]
    nln_top = jnp.where(jnp.isfinite(nln_top), nln_top, 0.0)
    nun_top = jnp.where(jnp.isfinite(nun_top), nun_top, 0.0)
    conf = nln_top.sum(1) / (nun_top.sum(1) + EPS)                   # (Nt,)

    _, keep = jax.lax.top_k(conf, mu)                                # (mu,)
    f_sim = sim[:, keep]                                             # (Ns, mu)
    f_lab = tgt_labels[keep]                                         # (mu,)

    mask_sim = (src_labels[:, None] == f_lab[None, :]).astype(sim.dtype)
    has_same = mask_sim.sum(1) > 0
    has_diff = (1.0 - mask_sim).sum(1) > 0
    row_ok = has_same & has_diff
    scores = jax.nn.softmax(f_sim, axis=1)
    contrast = (scores * mask_sim).sum(1)
    logs = jnp.where(row_ok, jnp.log(jnp.clip(contrast, EPS)), 0.0)
    return -logs.sum() / (row_ok.sum() + EPS)


# ---------------------------------------------------------------------------
# Category-context alignment (dca_modules.py:14-189)
# ---------------------------------------------------------------------------

def category_context(preds: jnp.ndarray, feats: jnp.ndarray,
                     ignore_bg: bool = False) -> jnp.ndarray:
    """Soft per-class context vectors: prob-weighted feature means.

    Args: preds (B, h, w, C) probabilities; feats (B, h, w, K).
    Returns: (B, C[-1], K), L2-normalized over the class axis (reference's
    F.normalize(dim=1) — dca_modules.py:33).
    """
    num = jnp.einsum('bhwc,bhwk->bck', preds, feats)
    den = preds.sum(axis=(1, 2))[..., None] + EPS
    vectors = num / den
    if ignore_bg:
        vectors = vectors[:, 1:, :]
    return vectors / (jnp.linalg.norm(vectors, axis=1, keepdims=True) + 1e-12)


def _pearson_corr_mat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(n, K) x (n, K) -> (n, n) pairwise Pearson correlations."""
    ac = a - a.mean(axis=1, keepdims=True)
    bc = b - b.mean(axis=1, keepdims=True)
    ac = ac / (jnp.linalg.norm(ac, axis=1, keepdims=True) + 1e-12)
    bc = bc / (jnp.linalg.norm(bc, axis=1, keepdims=True) + 1e-12)
    return ac @ bc.T


def _regularize_cor(cor: jnp.ndarray) -> jnp.ndarray:
    n = cor.shape[0]
    pos = -jnp.log(jnp.clip(jnp.diagonal(cor), EPS)).mean()
    off = cor[~jnp.eye(n, dtype=bool)]
    neg = -jnp.log(1.0 - jnp.maximum(off, 1e-6)).mean()
    return pos + neg


def icr_loss(preds1: jnp.ndarray, preds2: jnp.ndarray, feats: jnp.ndarray,
             num_classes: int, ignore_bg: bool = True) -> jnp.ndarray:
    """Intra-domain covariance regularization: split the batch in half,
    correlate the halves' class contexts (dca_modules.py:80-106)."""
    probs = jax.lax.stop_gradient(
        (jax.nn.softmax(preds1, -1) + jax.nn.softmax(preds2, -1)) / 2)
    half = probs.shape[0] // 2
    c1 = category_context(probs[:half], feats[:half], ignore_bg).mean(0)
    c2 = category_context(probs[half:], feats[half:], ignore_bg).mean(0)
    return _regularize_cor(_pearson_corr_mat(c1, c2))


def ccr_loss(source, target, num_classes: int,
             ignore_bg: bool = True) -> jnp.ndarray:
    """Cross-domain covariance regularization; source side detached
    (dca_modules.py:109-134)."""
    s_p1, s_p2, s_f = source
    t_p1, t_p2, t_f = target
    s_prob = (jax.nn.softmax(s_p1, -1) + jax.nn.softmax(s_p2, -1)) / 2
    t_prob = (jax.nn.softmax(t_p1, -1) + jax.nn.softmax(t_p2, -1)) / 2
    c_s = category_context(jax.lax.stop_gradient(s_prob),
                           jax.lax.stop_gradient(s_f), ignore_bg).mean(0)
    c_t = category_context(t_prob, t_f, ignore_bg).mean(0)
    return _regularize_cor(_pearson_corr_mat(c_s, c_t))


def mse_context_loss(source, target, ignore_bg: bool = True) -> jnp.ndarray:
    """MSE alignment of class context vectors (dca_modules.py:137-189,
    cross-domain form; source detached)."""
    s_p1, s_p2, s_f = source
    t_p1, t_p2, t_f = target
    s_prob = (jax.nn.softmax(s_p1, -1) + jax.nn.softmax(s_p2, -1)) / 2
    t_prob = (jax.nn.softmax(t_p1, -1) + jax.nn.softmax(t_p2, -1)) / 2
    c_s = category_context(jax.lax.stop_gradient(s_prob),
                           jax.lax.stop_gradient(s_f), ignore_bg)
    c_t = category_context(t_prob, t_f, ignore_bg)
    return jnp.mean((c_s - c_t) ** 2)
