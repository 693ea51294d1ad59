"""Offline pseudo-label generation over the target set.

Parity target: regda/gast/pseudo_generation.py:96-155 (`gener_target_pseudo`
with save_prob=True as used by train_ssl_reg.py:188): per target tile,
slide(+TTA) inference, bilinear resize (align_corners=True) to the dataset
tile SIZE, save the (H, W, C) probability map (float32 .npy instead of a
torch .pt), plus a palette PNG of the selected hard labels.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from regda_tpu.datasets import get_meta
from regda_tpu.ops.pseudo import pseudo_selection
from regda_tpu.ops.resize import resize_bilinear_align_corners
from regda_tpu.utils.viz import VisualizeSegmm


def gener_target_pseudo(cfg, inferencer, pseudo_loader, save_pseudo_label_path,
                        slide: bool = True, save_prob: bool = True,
                        size=None, ignore_label: int = -1, tta: bool = True,
                        logger=None):
    meta = get_meta(cfg.DATASETS)
    size = tuple(size or meta.size)
    os.makedirs(save_pseudo_label_path, exist_ok=True)
    color_path = save_pseudo_label_path + '_color'
    os.makedirs(color_path, exist_ok=True)
    viz_op = VisualizeSegmm(color_path, meta.palette)

    for i, batch in enumerate(pseudo_loader):
        probs = inferencer.predict_probs(batch['image'], slide=slide, tta=tta)
        if probs.shape[1:3] != size:
            probs = np.asarray(resize_bilinear_align_corners(
                jnp.asarray(probs), size))
        if save_prob:
            for fname, p in zip(batch['fname'], probs):
                np.save(os.path.join(save_pseudo_label_path, fname + '.npy'),
                        p.astype(np.float32))
            if cfg.SNAPSHOT_DIR is not None:
                hard = np.asarray(pseudo_selection(
                    jnp.asarray(probs), cfg.CUTOFF_TOP, cfg.CUTOFF_LOW,
                    ignore_label))
                for fname, pred in zip(batch['fname'], hard):
                    viz_op(pred, fname.replace('.tif', '.png')
                           if fname.endswith('.tif') else fname)
        else:
            hard = np.asarray(pseudo_selection(jnp.asarray(probs),
                                               ignore_label=ignore_label)
                              ) if getattr(cfg, 'PSEUDO_SELECT', True) \
                else probs.argmax(-1)
            from PIL import Image
            for fname, pred in zip(batch['fname'], hard):
                Image.fromarray((pred + 1).astype(np.uint8)).save(
                    os.path.join(save_pseudo_label_path, fname))
                if cfg.SNAPSHOT_DIR is not None:
                    viz_op(pred, fname.replace('.tif', '.png'))
        if logger is not None and (i + 1) % 100 == 0:
            logger.info(f'pseudo generation: {i + 1} tiles done')
