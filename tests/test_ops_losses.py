"""Unit tests: loss zoo vs torch oracles implementing reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tnf

import jax.numpy as jnp

from regda_tpu.ops import losses as L


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(np.float32)


def _labels(shape, seed=1, lo=-1, hi=6):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=shape).astype(np.int64)


def to_nhwc(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


class TestCrossEntropy:
    def test_matches_torch_mean_over_all(self):
        logits = _rand((2, 6, 16, 16))
        labels = _labels((2, 16, 16))
        # reference: reduction='none' CE w/ ignore -> mean over every element
        want = tnf.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels),
                                 ignore_index=-1, reduction='none').view(-1).mean().item()
        got = float(L.cross_entropy_loss(to_nhwc(logits), jnp.asarray(labels)))
        assert got == pytest.approx(want, rel=1e-5)


class TestOhem:
    def test_many_hard_pixels(self):
        logits = _rand((1, 6, 8, 8), seed=2) * 0.1  # low confidence => losses > -log(0.7)
        labels = _labels((1, 8, 8), seed=3)
        lt = torch.from_numpy(logits)
        lb = torch.from_numpy(labels)
        loss = tnf.cross_entropy(lt, lb, ignore_index=-1, reduction='none').view(-1)
        thresh = -torch.log(torch.tensor(0.7))
        n_min = lb[lb != -1].numel() // 5
        hard = loss[loss > thresh]
        want = (hard if hard.numel() >= n_min else loss.topk(n_min)[0]).mean().item()
        got = float(L.ohem_cross_entropy_loss(to_nhwc(logits), jnp.asarray(labels)))
        assert got == pytest.approx(want, rel=1e-5)

    def test_few_hard_pixels_topk_path(self):
        logits = _rand((1, 6, 8, 8), seed=4) * 8.0  # confident
        labels = np.argmax(logits, axis=1).astype(np.int64)  # correct labels -> tiny loss
        lt, lb = torch.from_numpy(logits), torch.from_numpy(labels)
        loss = tnf.cross_entropy(lt, lb, ignore_index=-1, reduction='none').view(-1)
        thresh = -torch.log(torch.tensor(0.7))
        n_min = lb[lb != -1].numel() // 5
        hard = loss[loss > thresh]
        want = (hard if hard.numel() >= n_min else loss.topk(n_min)[0]).mean().item()
        got = float(L.ohem_cross_entropy_loss(to_nhwc(logits), jnp.asarray(labels)))
        assert got == pytest.approx(want, rel=1e-4)


class TestFocal:
    def test_matches_torch(self):
        logits = _rand((2, 6, 8, 8), seed=5)
        labels = _labels((2, 8, 8), seed=6)
        ce = tnf.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels),
                               reduction='none', ignore_index=-1)
        pt = torch.exp(-ce)
        want = ((1 - pt) ** 2.0 * ce).mean().item()
        got = float(L.focal_loss(to_nhwc(logits), jnp.asarray(labels)))
        assert got == pytest.approx(want, rel=1e-5)


class TestUvemUps:
    def _soft(self, seed=7, shape=(2, 6, 8, 8)):
        x = _rand(shape, seed)
        e = np.exp(x)
        return (e / e.sum(1, keepdims=True)).astype(np.float32)

    def torch_uvem(self, logits, labels, soft, m, t, g):
        preds_ = torch.from_numpy(logits).permute(0, 2, 3, 1).reshape(-1, 6)
        targets_ = torch.from_numpy(labels).view(-1)
        lts_ = torch.from_numpy(soft).permute(0, 2, 3, 1).reshape(-1, 6)
        ce = tnf.cross_entropy(preds_, targets_, reduction='none', ignore_index=-1)
        unc = torch.sum(-lts_ * torch.log(lts_), dim=1)
        ce[unc > t] = 0
        u = unc.clone()
        wl = torch.where((u <= m) & (u >= 0), u, torch.ones_like(u))
        wl = (-1 / m**2) * (wl - m) ** 2 + 1
        wl = torch.clamp(wl, 0, 1) ** (1.0 / g)
        wr = torch.where((u > m) & (u <= t), u, torch.zeros_like(u))
        wr = (-1 / (t - m) ** 2) * (wr - m) ** 2 + 1
        wr = torch.clamp(wr, 0, 1) ** (1.0 / g)
        w = torch.where(u <= m, wl, wr)
        w = torch.where(u >= t, torch.zeros_like(u), w)
        valid = torch.sum((unc <= t) & (targets_ != -1))
        return ((w * ce).sum() / (valid + 1e-7)).item()

    def test_uvem_matches(self):
        logits = _rand((2, 6, 8, 8), seed=8)
        labels = _labels((2, 8, 8), seed=9)
        soft = self._soft()
        want = self.torch_uvem(logits, labels, soft, 0.2, 0.7, 4.0)
        got = float(L.uvem_loss(to_nhwc(logits), jnp.asarray(labels),
                                to_nhwc(soft), m=0.2, threshold=0.7, gamma=4.0))
        assert got == pytest.approx(want, rel=1e-4)

    def test_ups_matches(self):
        logits = _rand((2, 6, 8, 8), seed=10)
        labels = _labels((2, 8, 8), seed=11)
        soft = self._soft(seed=12)
        preds_ = torch.from_numpy(logits).permute(0, 2, 3, 1).reshape(-1, 6)
        targets_ = torch.from_numpy(labels).view(-1)
        lts_ = torch.from_numpy(soft).permute(0, 2, 3, 1).reshape(-1, 6)
        ce = tnf.cross_entropy(preds_, targets_, reduction='none', ignore_index=-1)
        unc = torch.sum(-lts_ * torch.log(lts_), dim=1)
        ce[unc > 0.7] = 0
        valid = torch.sum((unc <= 0.7) & (targets_ != -1))
        want = (ce.sum() / (valid + 1e-7)).item()
        got = float(L.ups_loss(to_nhwc(logits), jnp.asarray(labels), to_nhwc(soft)))
        assert got == pytest.approx(want, rel=1e-4)


class TestPCL:
    def test_matches_torch(self):
        feat = _rand((40, 16), seed=13)
        protos = _rand((6, 16), seed=14)
        labels = _labels((40,), seed=15)
        f = torch.from_numpy(feat)
        p = torch.from_numpy(protos)
        lb = torch.from_numpy(labels)
        mask = lb != -1
        fn = tnf.normalize(f[mask], p=2, dim=1)
        pn = tnf.normalize(p, p=2, dim=1)
        logits = fn.mm(pn.t()) / 8.0
        want = tnf.cross_entropy(logits, lb[mask]).item()
        got = float(L.prototype_contrastive_loss(jnp.asarray(protos),
                                                 jnp.asarray(feat),
                                                 jnp.asarray(labels)))
        assert got == pytest.approx(want, rel=1e-4)


class TestCoral:
    def test_matches_torch(self):
        s, t = _rand((50, 8), 16), _rand((60, 8), 17)
        st, tt = torch.from_numpy(s), torch.from_numpy(t)
        d = 8
        xm = st.mean(0, keepdim=True) - st
        xc = xm.t() @ xm / (50 - 1)
        xmt = tt.mean(0, keepdim=True) - tt
        xct = xmt.t() @ xmt / (60 - 1)
        want = (torch.sum((xc - xct) ** 2) / (4 * d * d)).item()
        got = float(L.coral_loss(jnp.asarray(s), jnp.asarray(t)))
        assert got == pytest.approx(want, rel=1e-4)


class TestClassBalance:
    def test_weights_and_ema(self):
        labels = np.array([[0, 0, 1, -1]], dtype=np.int64)
        st = L.ClassBalanceState.create(3)
        w, st2 = L.class_balance_weights(st, jnp.asarray(labels), 3,
                                         decay=0.99, temperature=2.0)
        # torch oracle (balance.py:27-53)
        freq0 = torch.ones(3) / 3
        local = torch.tensor([2 / 3, 1 / 3, 0.0])
        freq = 0.01 * local + 0.99 * freq0
        prob = torch.softmax((1 - freq) / 2.0, dim=0)
        prob = prob / (prob.max() + 1e-7)
        want_w = np.array([prob[0], prob[0], prob[1], 0.0])
        np.testing.assert_allclose(np.asarray(w), want_w, rtol=2e-5)
        np.testing.assert_allclose(np.asarray(st2.freq), freq.numpy(), rtol=1e-5)


class TestGHM:
    def test_matches_torch_single_step(self):
        logits = _rand((2, 6, 8, 8), seed=20)
        labels = _labels((2, 8, 8), seed=21)
        bins = 30
        # torch oracle (balance.py:173-212), momentum=0 single step
        preds = torch.from_numpy(logits).permute(0, 2, 3, 1).reshape(-1, 6)
        probs = torch.softmax(preds, dim=1)
        targets = torch.from_numpy(labels).view(-1)
        lab = targets.clone()
        lab[lab == -1] = 6
        onehot = tnf.one_hot(lab, num_classes=7)[:, :-1]
        prob_y = torch.sum(probs * onehot, dim=1)
        g = torch.abs(prob_y - 1.0)
        g[targets == -1] = -1
        edges = torch.tensor([x / bins for x in range(bins + 1)])
        edges[-1] += 1e-3
        hist = torch.histc(g, bins=bins, min=0, max=1)
        inds = torch.bucketize(g, edges)
        w = torch.zeros_like(g)
        w = torch.where((inds > 0) & (inds <= bins), 1.0 / hist[(inds - 1).clamp(0, bins - 1)], w)
        ce = tnf.cross_entropy(preds, targets, reduction='none', ignore_index=-1)
        want = ((ce * w).sum() / (torch.sum(targets != -1) + 1e-7)).item()

        st = L.GHMState.create(bins)
        got, st2 = L.ghm_loss(st, to_nhwc(logits), jnp.asarray(labels),
                              bins=bins, momentum=0.0)
        assert float(got) == pytest.approx(want, rel=1e-4)


class TestMultiHead:
    def test_upsamples_and_averages(self):
        logits = _rand((1, 6, 4, 4), seed=22)
        labels = _labels((1, 16, 16), seed=23)
        # torch oracle
        up = tnf.interpolate(torch.from_numpy(logits), size=(16, 16),
                             mode='bilinear', align_corners=True)
        want = tnf.cross_entropy(up, torch.from_numpy(labels), ignore_index=-1,
                                 reduction='none').view(-1).mean().item()
        got = float(L.multi_head_loss([to_nhwc(logits), to_nhwc(logits)],
                                      jnp.asarray(labels), L.cross_entropy_loss))
        assert got == pytest.approx(want, rel=1e-4)
