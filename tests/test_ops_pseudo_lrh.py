"""Unit tests: pseudo_selection and LRH homogenize vs reference oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from regda_tpu.ops.pseudo import pseudo_selection
from regda_tpu.ops.lrh import homogenize, region_histogram
from regda_tpu.ops.labels import one_hot_ignore


def torch_pseudo_selection_oracle(mask_bchw, cutoff_top, cutoff_low, ignore_label):
    """Reference pseudo_selection (pseudo_generation.py:59-93)."""
    import torch
    mask = torch.from_numpy(mask_bchw.copy())
    bs, c, h, w = mask.size()
    mask = mask.view(bs, c, -1)
    mask_max, _ = mask.max(-1, keepdim=True)
    mask_max *= cutoff_top
    lowest = torch.Tensor([cutoff_low]).type_as(mask_max)
    mask_max = mask_max.max(lowest)
    pseudo_gt = (mask > mask_max).type_as(mask)
    ambiguous = (pseudo_gt.sum(1, keepdim=True) != 1).type_as(mask)
    pseudo_gt = pseudo_gt.argmax(dim=1, keepdim=True)
    pseudo_gt[ambiguous == 1] = ignore_label
    return pseudo_gt.view(bs, h, w).numpy()


def numpy_homogenizer_oracle(pseudo, regions, percent, class_num, ignore_label):
    """Reference Homogenizer.forward (local_region_homog.py:125-152) in numpy."""
    b, h, w = pseudo.shape
    out = pseudo.copy()
    for bi in range(b):
        p = pseudo[bi].ravel()
        r = regions[bi].ravel()
        n_reg = int(r.max()) + 1
        hist = np.zeros((n_reg, class_num))
        for pi in range(p.size):
            if p[pi] != ignore_label:
                hist[r[pi], p[pi]] += 1
        px_cnt = hist.sum(axis=1)
        max_cls = hist.argmax(axis=1)
        max_cnt = hist.max(axis=1)
        frac = max_cnt / (px_cnt + 1e-5)
        reg_cls = np.where(frac < percent, ignore_label, max_cls)
        homog = reg_cls[r]
        homog = np.where(r == 0, ignore_label, homog)
        final = np.where(homog == ignore_label, p, homog)
        out[bi] = final.reshape(h, w)
    return out


@pytest.mark.parametrize("seed", [0, 3])
def test_pseudo_selection_matches_reference(seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(2, 6, 32, 32)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    want = torch_pseudo_selection_oracle(probs, 0.8, 0.6, -1)
    got = np.asarray(pseudo_selection(
        jnp.asarray(probs.transpose(0, 2, 3, 1)), 0.8, 0.6, -1))
    np.testing.assert_array_equal(got, want)


def test_homogenize_reference_3x3_case():
    """Mirror of the reference's embedded __main__ smoke case
    (local_region_homog.py:155-167): region 0 keeps original labels."""
    rng = np.random.default_rng(7)
    pseudo = rng.integers(0, 3, size=(2, 3, 3)).astype(np.int32)
    pseudo[0, 0, 0] = -1
    regions = np.zeros((2, 3, 3), dtype=np.int32)
    regions[:, 1:2, :] = 1
    regions[:, 2:3, :] = 2
    want = numpy_homogenizer_oracle(pseudo, regions, 0.5, 3, -1)
    got = np.asarray(homogenize(jnp.asarray(pseudo), jnp.asarray(regions),
                                percent=0.5, num_classes=3, num_regions=8))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("percent", [0.3, 0.5, 0.9])
def test_homogenize_random_matches_oracle(percent):
    rng = np.random.default_rng(42)
    pseudo = rng.integers(-1, 6, size=(2, 32, 32)).astype(np.int32)
    regions = rng.integers(0, 17, size=(2, 32, 32)).astype(np.int32)
    want = numpy_homogenizer_oracle(pseudo, regions, percent, 6, -1)
    got = np.asarray(homogenize(jnp.asarray(pseudo), jnp.asarray(regions),
                                percent=percent, num_classes=6, num_regions=32))
    np.testing.assert_array_equal(got, want)


def test_homogenize_region_budget_boundary():
    """Ids at/over the static budget must ABSTAIN (keep original labels),
    never merge into a shared bucket — the safe re-expression of the
    reference's max-id-sized scatter (local_region_homog.py:140)."""
    num_regions = 8
    pseudo = np.zeros((1, 4, 8), np.int32)
    regions = np.zeros((1, 4, 8), np.int32)
    # region 7 (= num_regions-1, in budget): all class 2 -> homogenized
    pseudo[0, 0] = 2
    regions[0, 0] = 7
    # region 8 (= num_regions, OVER budget): uniform class 3 -> pixels must
    # keep their ORIGINAL labels (here: mixed 3s and 1s stay mixed)
    pseudo[0, 1, :4] = 3
    pseudo[0, 1, 4:] = 1
    regions[0, 1] = 8
    # region 1000 (far over): same abstain behavior
    pseudo[0, 2] = 4
    regions[0, 2] = 1000
    got = np.asarray(homogenize(jnp.asarray(pseudo), jnp.asarray(regions),
                                percent=0.5, num_classes=6,
                                num_regions=num_regions))
    np.testing.assert_array_equal(got[0, 0], np.full(8, 2))   # in budget
    np.testing.assert_array_equal(got[0, 1], pseudo[0, 1])    # abstained
    np.testing.assert_array_equal(got[0, 2], pseudo[0, 2])    # abstained
    # over-budget ids must not pollute in-budget histograms: region 7's
    # histogram only sees its own 8 pixels
    oh = one_hot_ignore(jnp.asarray(pseudo.reshape(1, -1)), 6)
    hist = np.asarray(region_histogram(
        oh, jnp.asarray(regions.reshape(1, -1)), num_regions=num_regions))
    assert hist[0, 7].sum() == 8 and hist[0, 7, 2] == 8


def test_regions_from_anns_warns_over_budget():
    from regda_tpu.models.sam.auto import regions_from_anns
    import warnings as _w
    seg = np.zeros((64, 64), bool)
    seg[:32, :32] = True
    anns = [dict(area=int(seg.sum()), segmentation=seg)]
    with _w.catch_warnings():
        _w.simplefilter('error')  # in-budget: no warning
        m = regions_from_anns(anns, (64, 64), area_threshold=1)
    assert m.max() == 1
    big = [dict(area=0, segmentation=np.zeros((64, 64), bool))] * 1024 + anns
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter('always')
        m = regions_from_anns(big, (64, 64), area_threshold=1)
    assert any('MAX_REGIONS' in str(r.message) for r in rec)
    assert m.max() == 1025  # map itself keeps reference id semantics


def test_region_histogram_segment_sum():
    rng = np.random.default_rng(0)
    lbl = rng.integers(-1, 6, size=(2, 100)).astype(np.int32)
    reg = rng.integers(0, 9, size=(2, 100)).astype(np.int32)
    oh = one_hot_ignore(jnp.asarray(lbl), 6)
    hist = np.asarray(region_histogram(oh, jnp.asarray(reg), num_regions=16))
    for bi in range(2):
        for r in range(9):
            for c in range(6):
                assert hist[bi, r, c] == np.sum((reg[bi] == r) & (lbl[bi] == c))


def test_homogenize_denoises_region_consistent_labels():
    """The paper's mechanism (reference local_region_homog.py:125-152):
    when pseudo-label noise stays a minority within each SAM region,
    the region-majority vote restores the clean labels exactly.
    Deterministic demonstration of the LRH gain that PARITY.md's tiny
    synthetic training runs cannot resolve above seed noise."""
    rng = np.random.RandomState(0)
    h = w = 33
    n_classes = 5
    # regions 1..9 as a 3x3 block partition (0 would mean unassigned)
    blk = h // 3
    rr = (np.arange(h) // blk)[:, None] * 3 + (np.arange(w) // blk)[None, :]
    regions = (rr + 1).astype(np.int32)[None]
    clean = (rr % n_classes).astype(np.int32)[None]
    # corrupt 30% of pixels (< the 0.5 percent gate's complement) per tile
    noisy = clean.copy().ravel()
    idx = rng.choice(noisy.size, size=int(0.3 * noisy.size), replace=False)
    noisy[idx] = rng.randint(0, n_classes, idx.size)
    noisy = noisy.reshape(clean.shape)
    assert (noisy != clean).mean() > 0.2  # the corruption is real
    out = np.asarray(homogenize(jnp.asarray(noisy), jnp.asarray(regions),
                                percent=0.5, num_classes=n_classes,
                                num_regions=16))
    np.testing.assert_array_equal(out, clean)
