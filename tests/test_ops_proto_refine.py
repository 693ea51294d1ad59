"""Unit tests: prototypes, pearson distance, resize, refine, schedule."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tnf

import jax.numpy as jnp

from regda_tpu.ops.prototypes import (pearson_dist, local_prototypes,
                                      prototype_update, prototype_accumulate,
                                      prototype_finalize, ema)
from regda_tpu.ops.resize import resize_bilinear_align_corners
from regda_tpu.ops.refine import label_refine
from regda_tpu.ops.labels import one_hot_ignore
from regda_tpu.ops.schedule import poly_warmup_lr


def torch_pearson_oracle(f1, f2, eps=1e-7):
    """alignment.py:396-423."""
    f1, f2 = torch.from_numpy(f1), torch.from_numpy(f2)
    k = f1.shape[-1]
    c1 = f1 - f1.mean(dim=-1, keepdim=True)
    c2 = f2 - f2.mean(dim=-1, keepdim=True)
    cov = (c1.unsqueeze(1) * c2.unsqueeze(0)).sum(dim=-1) / (k - 1 + eps)
    s1 = f1.std(dim=-1).unsqueeze(1)
    s2 = f2.std(dim=-1).unsqueeze(0)
    return ((-1.0 * cov / (s1 * s2 + eps) + 1.0) * 0.5).numpy()


def test_pearson_dist_matches_torch():
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(10, 32)).astype(np.float32)
    f2 = rng.normal(size=(6, 32)).astype(np.float32)
    want = torch_pearson_oracle(f1, f2)
    got = np.asarray(pearson_dist(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_align_corners_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 8, 8)).astype(np.float32)
    want = tnf.interpolate(torch.from_numpy(x), size=(33, 17),
                           mode='bilinear', align_corners=True).numpy()
    got = np.asarray(resize_bilinear_align_corners(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (33, 17))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_downscale_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    want = tnf.interpolate(torch.from_numpy(x), size=(32, 32),
                           mode='bilinear', align_corners=True).numpy()
    got = np.asarray(resize_bilinear_align_corners(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (32, 32))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_local_prototypes_fallback_for_empty_class():
    feat = jnp.asarray(np.random.default_rng(3).normal(size=(20, 8)).astype(np.float32))
    labels = jnp.asarray(np.zeros((20,), np.int64))  # only class 0 present
    onehot = one_hot_ignore(labels, 3)
    fallback = jnp.ones((3, 8)) * 7.0
    local = np.asarray(local_prototypes(feat, onehot, fallback))
    np.testing.assert_allclose(local[0], np.asarray(feat).mean(0), rtol=2e-4)
    np.testing.assert_allclose(local[1], 7.0)
    np.testing.assert_allclose(local[2], 7.0)


def test_prototype_update_is_ema():
    protos = jnp.zeros((2, 4))
    feat = jnp.ones((10, 4))
    onehot = one_hot_ignore(jnp.zeros((10,), jnp.int32), 2)
    new = prototype_update(protos, feat, onehot, decay=0.9)
    np.testing.assert_allclose(np.asarray(new[0]), 0.1, rtol=2e-4)
    # class 1 empty -> fallback to old prototype -> ema(old, old) = old
    np.testing.assert_allclose(np.asarray(new[1]), 0.0, atol=1e-6)


def test_prototype_avg_init():
    rng = np.random.default_rng(4)
    feat = rng.normal(size=(30, 8)).astype(np.float32)
    labels = rng.integers(-1, 3, size=(30,))
    s = jnp.zeros((3, 8))
    c = jnp.zeros((3, 1))
    oh = one_hot_ignore(jnp.asarray(labels), 3)
    s, c = prototype_accumulate(s, c, jnp.asarray(feat), oh)
    protos = np.asarray(prototype_finalize(s, c))
    for cls in range(3):
        m = labels == cls
        if m.sum():
            np.testing.assert_allclose(protos[cls], feat[m].mean(0), rtol=1e-3, atol=1e-4)


def test_label_refine_matches_torch_oracle():
    """Full mode='all' refine vs a torch transcription of alignment.py:194-265."""
    rng = np.random.default_rng(5)
    b, hh, ww, k, c = 1, 4, 4, 16, 6
    H, W = 16, 16
    feat = rng.normal(size=(b, k, hh, ww)).astype(np.float32)
    protos = rng.normal(size=(c, k)).astype(np.float32)
    p1 = rng.normal(size=(b, c, hh, ww)).astype(np.float32)
    p2 = rng.normal(size=(b, c, hh, ww)).astype(np.float32)
    soft = rng.uniform(0.1, 1.0, size=(b, c, H, W)).astype(np.float32)
    soft /= soft.sum(1, keepdims=True)

    # torch oracle
    ft = torch.from_numpy(feat)
    eps = 1e-7
    feat_flat = ft.permute(0, 2, 3, 1).reshape(-1, k).numpy()
    simi = 1.0 / torch_pearson_oracle(feat_flat, protos)
    simi = torch.from_numpy(simi).view(b, hh, ww, c).permute(0, 3, 1, 2)
    simi = tnf.interpolate(simi, (H, W), mode='bilinear', align_corners=True)
    pw = torch.softmax(simi, dim=1)
    pw = pw / (torch.max(pw, dim=1, keepdim=True)[0] + eps)
    x1 = tnf.interpolate(torch.from_numpy(p1), (H, W), mode='bilinear', align_corners=True)
    x2 = tnf.interpolate(torch.from_numpy(p2), (H, W), mode='bilinear', align_corners=True)
    lw = (torch.softmax(x1 / 2.0, dim=1) + torch.softmax(x2 / 2.0, dim=1)) * 0.5
    lw = lw / (torch.max(lw, dim=1, keepdim=True)[0] + eps)
    w = pw + lw
    refined = w * torch.from_numpy(soft)
    want = (refined / (refined.sum(1, keepdim=True) + eps)).numpy()

    got = np.asarray(label_refine(
        jnp.asarray(feat.transpose(0, 2, 3, 1)),
        [jnp.asarray(p1.transpose(0, 2, 3, 1)), jnp.asarray(p2.transpose(0, 2, 3, 1))],
        jnp.asarray(soft.transpose(0, 2, 3, 1)),
        jnp.asarray(protos), mode='all', temp=2.0)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_poly_warmup_lr():
    # stop_steps=4000: preheat=200, num_steps=6000 (train_src.py:55-56)
    lr0 = float(poly_warmup_lr(0, 1e-2, 4000))
    lr100 = float(poly_warmup_lr(100, 1e-2, 4000))
    lr300 = float(poly_warmup_lr(300, 1e-2, 4000))
    assert lr0 == 0.0
    assert lr100 == pytest.approx(1e-2 * 100 / 200)
    assert lr300 == pytest.approx(1e-2 * (1 - 300 / 6000) ** 0.9, rel=1e-5)


def test_label_refine_superpixel_view():
    """Superpixel branch (alignment.py:239-258): within a superpixel every
    pixel gets the region's per-class max prob as its weight; the max-id
    region is exempt."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from regda_tpu.ops.refine import superpixel_weight, label_refine

    b, h, w, c = 1, 4, 4, 3
    rng = np.random.RandomState(0)
    soft = jax.nn.softmax(jnp.asarray(rng.randn(b, h, w, c), jnp.float32), -1)
    sup = np.zeros((b, h, w), np.int32)
    sup[0, :, 2:] = 1
    sup[0, 3, 3] = 2          # max id -> ignored pixel
    wgt, ignored = superpixel_weight(soft, jnp.asarray(sup), num_sup=3)
    # constant weight within superpixel 0
    w0 = np.asarray(wgt)[0][np.asarray(sup)[0] == 0]
    np.testing.assert_allclose(w0, np.broadcast_to(w0[0], w0.shape), rtol=1e-5)
    assert bool(np.asarray(ignored)[0, 3, 3, 0])
    # mode 's': ignored pixel keeps the raw label, others renormalized
    out = label_refine(None, None, soft, None, mode='s',
                       sup_ids=jnp.asarray(sup), num_sup=3)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)
