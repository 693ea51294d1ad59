"""Measure what LRH does to pseudo-label QUALITY, against ground truth.

The end-metric LRH ablation on the synthetic parity set is noisy and
slightly negative (PARITY.md): at 64px the model's within-region
pseudo-labels are already homogeneous, so region voting mostly FILLS
low-confidence (ignored) pixels — helpful when the region majority is
right, harmful early in training when it is wrong. That dynamic is
invisible in a single mIoU number, so this tool measures the mechanism
directly: run the stage-2 pseudo-label pipeline (dual-head soft label ->
optional prototype/pred refine -> pseudo_selection -> homogenize, exactly
the train_align_reg.py:166-182 order) on the target TRAIN tiles with a
trained checkpoint, and score each stage against the ground truth the
training loop never sees.

Reported per stage (before/after LRH): label coverage, accuracy on
labeled pixels; plus the transition split — pixels LRH filled
(ignore->class), flipped (class->class), or dropped (class->ignore) and
how accurate each group was before/after.

    python tools/lrh_mechanism.py \
        --ckpt-model  <stage1>/Vaihingen_best.ckpt \
        --ckpt-proto  <stage1>/prototypes_best.ckpt

Driven by tools/run_parity.py --mechanism, which appends the table to
PARITY.md. Capability parity note: the reference has no such tool; its
LRH evidence is end-metric only (reference tools/train_align_reg.py +
paper tables on real ISPRS data, unavailable on this box).
"""

import argparse
import json
import os

import _bootstrap  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from regda_tpu.datasets import get_meta, make_loader
from regda_tpu.models import build_deeplabv2
from regda_tpu.ops.lrh import homogenize
from regda_tpu.ops.pseudo import pseudo_selection
from regda_tpu.ops.refine import label_refine
from regda_tpu.ops.resize import resize_bilinear_align_corners
from regda_tpu.utils.checkpoint import load_prototypes, load_pytree
from regda_tpu.utils.tools import import_config

parser = argparse.ArgumentParser(description='LRH mechanism measurement.')
parser.add_argument('--config-path', type=str,
                    default='st.regda.parity_smoke')
parser.add_argument('--ckpt-model', type=str, required=True)
parser.add_argument('--ckpt-proto', type=str, required=True)
parser.add_argument('--refine-label', type=int, default=1)
parser.add_argument('--refine-temp', type=float, default=2.0)
parser.add_argument('--percent', type=float, default=0.5)
parser.add_argument('--json-out', type=str, default='')


def _stats(label, gt, ignore):
    lab = label != ignore
    n = gt.size
    cov = lab.mean()
    acc = float((label == gt)[lab].mean()) if lab.any() else 0.0
    return dict(coverage=float(cov), acc_labeled=acc,
                labeled=int(lab.sum()), total=int(n))


def main():
    args = parser.parse_args()
    cfg = import_config(args.config_path, create=False, copy=False)
    meta = get_meta(cfg.DATASETS)
    nc, ig = meta.num_classes, meta.ignore_label

    model = build_deeplabv2(cfg.MODEL, nc)
    variables = load_pytree(args.ckpt_model)
    protos = jnp.asarray(load_prototypes(args.ckpt_proto))

    # target TRAIN tiles with GT masks attached for scoring, plus the SAM
    # region maps LRH consumes; PSEUDO_DATA_CONFIG already pairs the target
    # train images with their GT under eval transforms (no random
    # geometry), keeping image/GT/regions aligned
    tcfg = dict(cfg.PSEUDO_DATA_CONFIG)
    tcfg['read_sup'] = True
    loader = make_loader(tcfg, cfg.DATASETS)

    @jax.jit
    def pseudo_pipeline(imgs, regs):
        # the stage-2 forward (steps.py make_stage2_step): train-mode
        # dual-head pass with a FIXED dropout rng -- what the online
        # pseudo-label actually sees mid-training
        (p1, p2, feat), _ = model.apply(
            variables, imgs, train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(0)})
        hw = imgs.shape[1:3]
        x1 = resize_bilinear_align_corners(p1, hw)
        x2 = resize_bilinear_align_corners(p2, hw)
        soft = (jax.nn.softmax(x1, -1) + jax.nn.softmax(x2, -1)) * 0.5
        if args.refine_label:
            soft = label_refine(feat, [p1, p2], soft, protos,
                                mode='all', temp=args.refine_temp)
        hard = pseudo_selection(soft, cfg.CUTOFF_TOP, cfg.CUTOFF_LOW, ig)
        refined = homogenize(hard, regs, args.percent, nc, ig)
        return hard, refined

    before, after, gts = [], [], []
    for batch in loader:
        hard, refined = pseudo_pipeline(
            jnp.asarray(batch['image']), jnp.asarray(batch['sup'],
                                                     jnp.int32))
        before.append(np.asarray(hard))
        after.append(np.asarray(refined))
        gts.append(np.asarray(batch['cls'], np.int32))
    b = np.concatenate(before)
    a = np.concatenate(after)
    gt = np.concatenate(gts)

    res = dict(before=_stats(b, gt, ig), after=_stats(a, gt, ig))
    filled = (b == ig) & (a != ig)
    flipped = (b != ig) & (a != ig) & (a != b)
    dropped = (b != ig) & (a == ig)
    res['transitions'] = dict(
        filled=dict(n=int(filled.sum()),
                    acc=float((a == gt)[filled].mean()) if filled.any()
                    else 0.0),
        flipped=dict(n=int(flipped.sum()),
                     acc_before=float((b == gt)[flipped].mean())
                     if flipped.any() else 0.0,
                     acc_after=float((a == gt)[flipped].mean())
                     if flipped.any() else 0.0),
        dropped=dict(n=int(dropped.sum()),
                     acc_before=float((b == gt)[dropped].mean())
                     if dropped.any() else 0.0),
    )
    print(json.dumps(res, indent=2))
    if args.json_out:
        with open(args.json_out, 'w') as f:
            json.dump(res, f, indent=2)


if __name__ == '__main__':
    main()
