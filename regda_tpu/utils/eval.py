"""Evaluation harness: slide inference over the val/test split + metric table.

Parity target: regda/utils/eval.py:14-56 (`evaluate`): DALoader over
EVAL/TEST_DATA_CONFIG at batch 1, per-tile slide(+TTA) probabilities,
argmax, mask gt>=0, streaming PixelMetricIgnore (class 0 ignored for
IsprsDA), palette-PNG dump per tile, PrettyTable summary -> (table, mIoU).
"""

from __future__ import annotations

import os

import numpy as np

from regda_tpu.datasets import DALoader, get_meta, device_data_enabled
from regda_tpu.datasets.device_data import DeviceCacheTooLarge, get_eval_set
from regda_tpu.infer import SegInferencer
from regda_tpu.utils.metrics import PixelMetricIgnore
from regda_tpu.utils.viz import VisualizeSegmm
from regda_tpu.utils.checkpoint import load_pytree
from regda_tpu.utils.tools import count_model_parameters


def evaluate(model, variables, cfg, is_training: bool = False,
             ckpt_path: str | None = None, logger=None, slide: bool = True,
             tta: bool = False, test: bool = False, inferencer=None,
             save_viz: bool = True):
    meta = get_meta(cfg.DATASETS)
    ignore_labels = [0] if cfg.DATASETS == 'IsprsDA' else []
    os.makedirs(cfg.SNAPSHOT_DIR, exist_ok=True)

    if not is_training and ckpt_path is not None:
        variables = load_pytree(ckpt_path)
        if logger:
            logger.info('[Load params] from {}'.format(ckpt_path))
            count_model_parameters(variables.get('params', variables), logger)

    viz_op = None
    if save_viz and cfg.SNAPSHOT_DIR is not None and ckpt_path is not None:
        vis_dir = os.path.join(cfg.SNAPSHOT_DIR,
                               'vis-{}'.format(os.path.basename(ckpt_path)))
        viz_op = VisualizeSegmm(vis_dir, meta.palette)

    data_cfg = cfg.TEST_DATA_CONFIG if test else cfg.EVAL_DATA_CONFIG
    # On TPU the val split lives on device as uint8 and is normalized
    # on-chip (uploaded once per process, not once per eval — see
    # datasets/device_data.py on the tunneled-transfer cost/leak).
    if device_data_enabled(data_cfg):
        try:
            loader = get_eval_set(data_cfg, cfg.DATASETS)
        except (ValueError, AssertionError, DeviceCacheTooLarge) as e:
            if logger:
                logger.warning(f'device eval cache disabled ({e})')
            loader = DALoader(data_cfg, cfg.DATASETS)
    else:
        loader = DALoader(data_cfg, cfg.DATASETS)

    if inferencer is None:
        inferencer = SegInferencer(model, variables, meta.num_classes)
    else:
        inferencer.update_variables(variables)

    metric = PixelMetricIgnore(meta.num_classes, class_names=meta.class_names,
                               logdir=cfg.SNAPSHOT_DIR, logger=logger,
                               ignore_labels=ignore_labels)
    for batch in loader:
        cls = inferencer.predict_labels(batch['image'], slide=slide, tta=tta)
        gt = batch['cls'].astype(np.int32)
        mask = gt >= 0
        metric.forward(gt[mask].ravel(), cls[mask].ravel())
        if viz_op is not None:
            for fname, pred in zip(batch['fname'], cls):
                viz_op(pred, fname.replace('tif', 'png'))

    return metric.summary_all()
