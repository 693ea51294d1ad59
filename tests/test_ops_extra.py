"""Tests for the research-op inventory: mixing, whitening, alignment losses,
GDP loss, and domain balance (SURVEY.md §2.3 / §2.5 leftovers).

Mirrors the reference's embedded smoke checks: the whitening golden value
12.4375 (regda/gast/class_ware_whiten.py:68-80), gradient-flow checks for the
alignment losses (regda/gast/alignment.py:484-606), and numpy oracles for the
histogram math in GDPLoss (regda/gast/balance.py:218-303).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regda_tpu.ops.align_losses import (ccr_loss, class_align_loss, icr_loss,
                                        instance_align_loss, mse_context_loss,
                                        msc_loss, pixel_contrast_loss,
                                        saw_loss, triplet_loss)
from regda_tpu.ops.losses_extra import (GDPState, gdp_loss, examples_cnt,
                                        target_domain_weight)
from regda_tpu.ops.mix import classmix, cutmix, cutmix2, mixup
from regda_tpu.ops.whiten import class_ware_whitening


# ---------------------------------------------------------------------------
# whitening
# ---------------------------------------------------------------------------

def test_whitening_reference_golden_value():
    # Reference embedded example (class_ware_whiten.py:68-80): 6 pixels with
    # 4-d features; class 1 has two pixels, class 2 none (=> identity, 0 loss).
    a = jnp.array([[2, 1, 3, 0],
                   [5, 6, 7, 8],
                   [1, 2, 3, 4],
                   [2, 3, 4, 5],
                   [0, 1, 0, 1],
                   [5, 1, 3, 1]], jnp.float32)
    feats = a.reshape(1, 1, 6, 4)               # NHWC: 1x1x6 pixels, K=4
    labels = jnp.array([1, 0, 0, 1, 0, 0]).reshape(1, 1, 6)
    loss = class_ware_whitening(feats, labels, class_ids=[1, 2], groups=1)
    np.testing.assert_allclose(float(loss), 12.4375, rtol=1e-6)


def test_whitening_groups_split():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (2, 4, 4)))
    full = class_ware_whitening(feats, labels, class_ids=[0, 1, 2], groups=2)
    # groups=2 over K=8 must equal the sum of whitening each 4-channel half.
    part = (class_ware_whitening(feats[..., :4], labels, [0, 1, 2], 1)
            + class_ware_whitening(feats[..., 4:], labels, [0, 1, 2], 1))
    np.testing.assert_allclose(float(full), float(part), rtol=1e-5)


# ---------------------------------------------------------------------------
# mixing
# ---------------------------------------------------------------------------

def _mix_batch(seed=0, b=2, h=8, w=8, c=3, classes=6):
    rng = np.random.RandomState(seed)
    img_s = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    img_t = jnp.asarray(rng.rand(b, h, w, c).astype(np.float32))
    lab_s = jnp.asarray(rng.randint(0, classes, (b, h, w)))
    lab_t = jnp.asarray(rng.randint(0, classes, (b, h, w)))
    return img_s, lab_s, img_t, lab_t


def test_classmix_pastes_only_chosen_classes():
    img_s, lab_s, img_t, lab_t = _mix_batch()
    key = jax.random.PRNGKey(3)
    _, _, img_m, lab_m = classmix(key, img_s, lab_s, img_t, lab_t,
                                  ratio=0.5, class_num=6)
    changed = np.asarray(lab_m != lab_t)
    # wherever the label changed it must now equal the source label & image
    np.testing.assert_array_equal(np.asarray(lab_m)[changed],
                                  np.asarray(lab_s)[changed])
    pasted = np.asarray(lab_m == lab_s)
    # pasted pixels define a union of source classes; count them
    src_classes_pasted = set(np.asarray(lab_s)[pasted].ravel().tolist())
    assert 0 < len(src_classes_pasted) <= 6
    # image pixels follow the label mask exactly
    mask = np.asarray(lab_m == lab_s) & changed
    np.testing.assert_allclose(np.asarray(img_m)[mask], np.asarray(img_s)[mask])


def test_cutmix_box_consistency():
    img_s, lab_s, img_t, lab_t = _mix_batch(seed=1)
    key = jax.random.PRNGKey(0)
    _, _, img_m, lab_m = cutmix(key, img_s, lab_s, img_t, lab_t)
    from_src = np.all(np.asarray(img_m) == np.asarray(img_s), axis=-1)
    from_tgt = np.all(np.asarray(img_m) == np.asarray(img_t), axis=-1)
    assert np.all(from_src | from_tgt)
    # label follows the same box
    np.testing.assert_array_equal(np.asarray(lab_m)[from_src & ~from_tgt],
                                  np.asarray(lab_s)[from_src & ~from_tgt])


def test_cutmix2_and_mixup_shapes():
    img_s, lab_s, img_t, lab_t = _mix_batch(seed=2)
    key = jax.random.PRNGKey(7)
    d, t = cutmix2(key, img_s, lab_s)
    assert d.shape == img_s.shape and t.shape == lab_s.shape
    ns_i, ns_l, nt_i, nt_l = mixup(key, img_s, lab_s, img_t, lab_t)
    assert ns_i.shape == img_s.shape and nt_l.shape == lab_t.shape
    # every output pixel comes from one of the two inputs
    pool = np.concatenate([np.asarray(img_s), np.asarray(img_t)], axis=0)
    assert np.all(np.isin(np.asarray(ns_i), pool))


# ---------------------------------------------------------------------------
# alignment losses
# ---------------------------------------------------------------------------

def test_class_align_loss_bounds_and_grad():
    rng = np.random.RandomState(0)
    p1 = jnp.asarray(rng.randn(6, 32).astype(np.float32))
    loss_same = class_align_loss(p1, p1, margin=0.3)
    # identical prototypes: pos diagonal distance ~ 0, so loss <= margin
    assert 0.0 < float(loss_same) <= 0.3 + 1e-5
    # with distinct prototypes the margin term is active -> nonzero grad
    p2 = jnp.asarray(rng.randn(6, 32).astype(np.float32))
    g = jax.grad(lambda a: class_align_loss(a, p2, margin=2.0))(p1)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_instance_align_loss_grad_and_ignore():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))
    proto = jnp.asarray(rng.randn(6, 16).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 6, (2, 4, 4)))
    loss = instance_align_loss(feat, lab, proto)
    assert np.isfinite(float(loss))
    # all-ignore labels -> zero valid count -> loss 0
    loss0 = instance_align_loss(feat, jnp.full((2, 4, 4), -1), proto)
    assert abs(float(loss0)) < 1e-5
    g = jax.grad(lambda f: instance_align_loss(f, lab, proto))(feat)
    assert np.isfinite(np.asarray(g)).all()


def test_triplet_loss_separable_is_zero():
    # two tight, far-apart clusters -> batch-hard triplet loss clamps to 0
    emb = jnp.concatenate([jnp.zeros((4, 8)), 100.0 + jnp.zeros((4, 8))])
    tgt = jnp.array([0] * 4 + [1] * 4)
    assert float(triplet_loss(emb, tgt, margin=0.3)) == 0.0
    rng = np.random.RandomState(2)
    emb2 = jnp.asarray(rng.randn(8, 8).astype(np.float32))
    assert float(triplet_loss(emb2, tgt)) > 0.0


def test_saw_loss_runs_and_nonnegative():
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    w_cls = jnp.asarray(rng.randn(6, 16).astype(np.float32))
    loss = saw_loss(feats, w_cls, selected_classes=[1, 2])
    assert np.isfinite(float(loss)) and float(loss) >= 0.0
    g = jax.grad(lambda f: saw_loss(f, w_cls, [1, 2]))(feats)
    assert np.isfinite(np.asarray(g)).all()


def test_pixel_contrast_loss_finite_and_grad():
    rng = np.random.RandomState(4)
    feats = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (2, 8, 8)))
    predict = jnp.asarray(rng.randint(0, 4, (2, 8, 8)))
    key = jax.random.PRNGKey(0)
    loss = pixel_contrast_loss(key, feats, labels, predict, num_classes=4,
                               max_views=8, max_samples=64)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda f: pixel_contrast_loss(key, f, labels, predict, 4,
                                               max_views=8, max_samples=64))(feats)
    assert np.isfinite(np.asarray(g)).all()


def test_msc_loss_finite():
    rng = np.random.RandomState(5)
    fs = jnp.asarray(rng.randn(32, 16).astype(np.float32))
    ls = jnp.asarray(rng.randint(0, 4, (32,)))
    ft = jnp.asarray(rng.randn(24, 16).astype(np.float32))
    loss = msc_loss(fs, ls, ft, num_classes=4)
    assert np.isfinite(float(loss))


def test_dca_context_losses():
    rng = np.random.RandomState(6)
    p1 = jnp.asarray(rng.randn(4, 8, 8, 6).astype(np.float32))
    p2 = jnp.asarray(rng.randn(4, 8, 8, 6).astype(np.float32))
    ft = jnp.asarray(rng.randn(4, 8, 8, 16).astype(np.float32))
    assert np.isfinite(float(icr_loss(p1, p2, ft, 6)))
    src = (p1, p2, ft)
    assert np.isfinite(float(ccr_loss(src, src, 6)))
    # identical source/target class contexts -> zero MSE
    assert abs(float(mse_context_loss(src, src))) < 1e-6


# ---------------------------------------------------------------------------
# GDP loss (numpy oracle for the histogram math) + domain balance
# ---------------------------------------------------------------------------

def _gdp_oracle(logits, labels, acc_sum, momentum=0.99, bins=30):
    n, c = logits.shape
    z = logits - logits.max(1, keepdims=True)
    probs = np.exp(z) / np.exp(z).sum(1, keepdims=True)
    valid = labels >= 0
    prob_y = probs[np.arange(n), np.clip(labels, 0, c - 1)]
    g = np.where(valid, np.abs(prob_y - 1.0), -1.0)
    hist = np.histogram(g[(g >= 0) & (g <= 1)], bins=bins, range=(0, 1))[0].astype(np.float64)
    hist = (hist + hist[::-1]) * 0.5
    acc = momentum * acc_sum + (1 - momentum) * hist
    w_bins = np.where(acc != 0, 1 - acc / (acc.sum() + 1e-7), 0.0)
    w_bins = w_bins / (w_bins.max() + 1e-7)
    edges = np.arange(bins + 1) / bins
    edges[-1] += 1e-3
    inds = np.searchsorted(edges, g, side='left')
    pix_w = np.where((inds > 0) & (inds <= bins), w_bins[np.clip(inds - 1, 0, bins - 1)], 0.0)
    ce = -np.log(np.clip(prob_y, 1e-30, None))
    loss = (ce * pix_w * valid).sum() / (valid.sum() + 1e-7)
    return loss, acc


def test_gdp_loss_matches_numpy_oracle():
    rng = np.random.RandomState(7)
    logits = rng.randn(1, 8, 8, 5).astype(np.float32) * 3
    labels = rng.randint(-1, 5, (1, 8, 8))
    state = GDPState.create(bins=30)
    # two steps so the EMA path is exercised
    for _ in range(2):
        loss, state = gdp_loss(state, jnp.asarray(logits), jnp.asarray(labels))
        oracle_loss, oracle_acc = _gdp_oracle(
            logits.reshape(-1, 5), labels.reshape(-1), np.zeros(30)
            if _ == 0 else oracle_acc)
        np.testing.assert_allclose(float(loss), oracle_loss, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(state.acc_sum), oracle_acc, rtol=1e-4)


def test_gdp_all_ignore_zero_loss():
    state = GDPState.create()
    loss, _ = gdp_loss(state, jnp.zeros((1, 4, 4, 3)), jnp.full((1, 4, 4), -1))
    assert abs(float(loss)) < 1e-6


def test_domain_balance():
    # examples_cnt over two id-label batches
    batches = [np.array([[[0, 1], [-1, 2]]]), np.array([[[-1, -1], [3, 4]]])]
    cnt, ratio = examples_cnt(batches)
    assert cnt == 5 and ratio == 5 / 8
    # prob-label path: argmax never yields -1 => all valid
    probs = [np.zeros((1, 3, 2, 2), np.float32)]
    cnt_p, ratio_p = examples_cnt(probs, save_prob=True)
    assert cnt_p == 4 and ratio_p == 1.0
    # weight formula + clip at 1
    assert target_domain_weight(100, 0.5, 50, 0.5) == pytest.approx(0.5)
    assert target_domain_weight(50, 0.5, 200, 0.5) == 1.0
