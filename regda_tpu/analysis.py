"""Offline pseudo-label quality diagnostics.

Parity targets: regda/gast/pseudo_generation.py:158-221
(`analysis_pseudo_labels`), :225-238 (`range_static`), and the plotting
helpers `show_tradeoff` / `plot_noise_rate` / `plot_cnt` (:241-300).

Semantics: bucket pixels of each tile by prediction entropy into
`range_cnt` bins spanning [0, log(C)); per bin accumulate (a) how many
selected pseudo-labels fall there and how many are correct, (b) the mean
difficulty 1 - p_gt. The reference loops the 100 bins per tile in Python
with full-tile masking each time (O(bins * H * W)); here each tile is one
vectorized jit pass: per-pixel bin index -> segment sums (O(H * W)).

Plots are written as PNGs next to the pseudo dir instead of plt.show().
"""

from __future__ import annotations

import glob
import math
import os
from functools import partial

import numpy as np
import imageio.v2 as iio

import jax
import jax.numpy as jnp

from regda_tpu.ops.labels import one_hot_ignore
from regda_tpu.ops.pseudo import pseudo_selection

EPS = 1e-7


@partial(jax.jit, static_argnames=('n_classes', 'range_cnt'))
def tile_bin_stats(probs: jnp.ndarray, gt: jnp.ndarray, n_classes: int,
                   range_cnt: int = 100, cutoff_top: float = 0.8,
                   cutoff_low: float = 0.6):
    """Per-entropy-bin statistics for one tile.

    Args:
      probs: (H, W, C) softmax probabilities (the saved .npy pseudo map).
      gt: (H, W) ground-truth ids (<0 = ignore).
    Returns dict of (range_cnt,) arrays: cnt_true, cnt_used, acc, diffi,
    plus scalar masks acc_valid/diffi_valid for the reference's conditional
    bin averaging (pseudo_generation.py:203-207).
    """
    step = math.log(n_classes) / range_cnt
    pseudo = pseudo_selection(probs[None], cutoff_top, cutoff_low)[0]  # (H, W)
    entropy = -(probs * jnp.log(jnp.clip(probs, EPS))).sum(-1)
    onehot = one_hot_ignore(gt, n_classes)
    difficulty = 1.0 - (probs * onehot).sum(-1)

    bins = jnp.clip((entropy / step).astype(jnp.int32), 0, range_cnt - 1)
    flat = bins.reshape(-1)
    used = (pseudo >= 0).reshape(-1).astype(jnp.float32)
    true = ((pseudo == gt) & (pseudo >= 0)).reshape(-1).astype(jnp.float32)
    seg = lambda v: jax.ops.segment_sum(v, flat, num_segments=range_cnt)
    cnt_used = seg(used)
    cnt_true = seg(true)
    in_bin = seg(jnp.ones_like(used))
    diffi_sum = seg(difficulty.reshape(-1))
    acc = cnt_true / (cnt_used + EPS)
    diffi = diffi_sum / (in_bin + EPS)
    return dict(cnt_true=cnt_true, cnt_used=cnt_used, acc=acc, diffi=diffi,
                acc_valid=(cnt_used > 0).astype(jnp.float32),
                diffi_valid=(diffi > 0).astype(jnp.float32))


def analysis_pseudo_labels(label_dir: str, pseudo_dir: str,
                           n_classes: int = 6, range_cnt: int = 100,
                           out_dir: str | None = None,
                           label_offset: int = 0) -> dict:
    """Sweep (gt tile, saved prob .npy) pairs and aggregate bin statistics;
    write tradeoff/noise-rate/count plots (pseudo_generation.py:158-221)."""
    labels = sorted(glob.glob(os.path.join(label_dir, '*.png')))
    pseudos = sorted(glob.glob(os.path.join(pseudo_dir, '*.npy')))
    assert len(labels) == len(pseudos), (len(labels), len(pseudos))
    agg = {k: np.zeros(range_cnt) for k in
           ('cnt_true', 'cnt_used', 'acc', 'diffi', 'acc_valid', 'diffi_valid')}
    for lbl_path, prob_path in zip(labels, pseudos):
        gt = iio.imread(lbl_path).astype(np.int32) + label_offset
        gt = np.where(gt >= n_classes, -1, gt)
        probs = np.load(prob_path)
        stats = tile_bin_stats(jnp.asarray(probs), jnp.asarray(gt), n_classes,
                               range_cnt)
        for k in agg:
            agg[k] += np.asarray(stats[k])
    acc = agg['acc'] / (agg['acc_valid'] + EPS)
    diffi = agg['diffi'] / (agg['diffi_valid'] + EPS)
    step = math.log(n_classes) / range_cnt
    x = np.arange(range_cnt) * step
    result = dict(x=x, acc=acc, diffi=diffi, cnt_true=agg['cnt_true'],
                  cnt_used=agg['cnt_used'])
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        half = range_cnt // 2
        show_tradeoff(x[:half], diffi[:half], agg['cnt_used'][:half],
                      os.path.join(out_dir, 'tradeoff.png'))
        plot_noise_rate(x, acc, diffi, os.path.join(out_dir, 'noise_rate.png'))
        plot_cnt(x, agg['cnt_true'], agg['cnt_used'],
                 os.path.join(out_dir, 'counts.png'))
    return result


def _plt():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def show_tradeoff(x, difficulty, cnt_used, save_path: str):
    """Difficulty vs usable-pixel-count twin-axis plot
    (pseudo_generation.py `show_tradeoff`)."""
    plt = _plt()
    fig, ax1 = plt.subplots()
    ax1.plot(x, difficulty, 'r-', label='difficulty')
    ax1.set_xlabel('entropy')
    ax1.set_ylabel('difficulty', color='r')
    ax2 = ax1.twinx()
    ax2.plot(x, cnt_used, 'b-', label='used pixels')
    ax2.set_ylabel('count', color='b')
    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)


def plot_noise_rate(x, acc, diffi, save_path: str):
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(x, 1.0 - np.asarray(acc), label='noise rate (1 - acc)')
    ax.plot(x, diffi, label='difficulty')
    ax.set_xlabel('entropy')
    ax.legend()
    fig.savefig(save_path)
    plt.close(fig)


def plot_cnt(x, cnt_true, cnt_used, save_path: str):
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(x, cnt_true, label='correct')
    ax.plot(x, cnt_used, label='used')
    ax.set_xlabel('entropy')
    ax.set_ylabel('pixels')
    ax.legend()
    fig.savefig(save_path)
    plt.close(fig)


# ---------------------------------------------------------------------------
# Class-distribution bars (regda/utils/classvis.py:24-98)
# ---------------------------------------------------------------------------

def class_distribution(mask_dir: str, class_num: int,
                       offset: int = 0) -> np.ndarray:
    """Mean per-class pixel ratio over a mask tree (classvis.py:24-37)."""
    rates = np.zeros(class_num, np.float64)
    paths = sorted(glob.glob(os.path.join(mask_dir, '*.png')))
    for p in paths:
        mask = iio.imread(p).astype(np.int64) + offset
        hist = np.bincount(mask[(mask >= 0) & (mask < class_num)].ravel(),
                           minlength=class_num)
        rates += hist / mask.size
    return (rates / max(rates.sum(), EPS)).astype(np.float32)


def da_class_bar(dir1: str, dir2: str, class_names, save_path: str,
                 names=('source', 'target'), offset: int = 0,
                 max_rate: float = 0.5):
    """Side-by-side horizontal class-frequency bars for two domains
    (classvis.py:40-98), saved to `save_path`."""
    c = len(class_names)
    v1 = class_distribution(dir1, c, offset)
    v2 = class_distribution(dir2, c, offset)
    plt = _plt()
    fig, ax = plt.subplots()
    y = np.arange(c)
    width = 0.4
    ax.barh(y, v1, height=width, label=names[0])
    ax.barh(y + width, v2, height=width, label=names[1])
    ax.set_yticks(y + width / 2, class_names)
    ax.set_xlim(0, max_rate)
    ax.set_xlabel('ratio')
    ax.set_ylabel('class')
    ax.legend()
    fig.tight_layout()
    fig.savefig(save_path)
    plt.close(fig)
    return v1, v2
