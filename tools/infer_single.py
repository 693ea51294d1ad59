"""Single-image inference: predicted ids + palette PNG.

CLI parity with reference tools/infer_single.py:14-70:
  python tools/infer_single.py st.regda.2vaihingen <ckpt> <image> \
      [--save-dir ./demo] [--slide 1] [--tta 0] [--gt 0]
"""

import os
import warnings
from argparse import ArgumentParser

import numpy as np
from PIL import Image

import _bootstrap  # noqa: F401

from regda_tpu.datasets import get_meta
from regda_tpu.infer import SegInferencer
from regda_tpu.models import build_deeplabv2
from regda_tpu.utils.checkpoint import load_pytree
from regda_tpu.utils.tools import import_config, str2bool
from regda_tpu.utils.viz import VisualizeSegmm

if __name__ == '__main__':
    warnings.filterwarnings('ignore')
    parser = ArgumentParser(description='Run predict methods.')
    parser.add_argument('config_path', type=str)
    parser.add_argument('ckpt_path', type=str)
    parser.add_argument('image_path', type=str)
    parser.add_argument('--save-dir', type=str, default='./demo')
    parser.add_argument('--ins-norm', type=str2bool, default=True)
    parser.add_argument('--slide', type=str2bool, default=True)
    parser.add_argument('--tta', type=str2bool, default=False)
    parser.add_argument('--gt', type=str2bool, default=False)
    args = parser.parse_args()

    os.makedirs(args.save_dir, exist_ok=True)
    cfg = import_config(args.config_path, copy=False, create=False)
    meta = get_meta(cfg.DATASETS)

    model = build_deeplabv2(cfg.MODEL, meta.num_classes,
                            is_ins_norm=args.ins_norm)
    variables = load_pytree(args.ckpt_path)
    viz_op = VisualizeSegmm(args.save_dir, meta.palette)

    trans = cfg.TEST_DATA_CONFIG['transforms']
    img = np.asarray(Image.open(args.image_path)).astype(np.float32)
    sample = trans({'image': img}, np.random.default_rng(0))
    batch = sample['image'][None]  # (1, H, W, 3)

    inferencer = SegInferencer(model, variables, meta.num_classes)
    probs = inferencer.predict_probs(batch, slide=args.slide, tta=args.tta)
    cls = probs.argmax(axis=-1).squeeze().astype(np.uint8)

    Image.fromarray(cls).save(os.path.join(args.save_dir, 'prediction.png'))
    viz_op(cls, 'prediction_color.png')
    if args.gt:
        gt_path = str(args.image_path).replace('img_dir', 'ann_dir')
        if os.path.exists(gt_path):
            print(gt_path)
            viz_op(np.asarray(Image.open(gt_path)), 'gt.png')
