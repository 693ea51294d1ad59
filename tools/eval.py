"""Evaluate a checkpoint on the val/test split.

CLI parity with reference tools/eval.py:15-56:
  python tools/eval.py --config-path st.regda.2vaihingen \
      --ckpt-path log/regda/2vaihingen/ssl/Vaihingen_best.ckpt --test 1 [--tta 1]
Accepts reference .pth checkpoints transparently (converted on load).
"""

import os
from argparse import ArgumentParser

import _bootstrap  # noqa: F401

from regda_tpu.datasets import get_meta
from regda_tpu.models import build_deeplabv2
from regda_tpu.utils.eval import evaluate
from regda_tpu.utils.tools import (import_config, get_console_file_logger,
                                   str2bool, seed_all)

if __name__ == '__main__':
    seed_all(2333)
    parser = ArgumentParser(description='Run predict methods.')
    parser.add_argument('--config-path', type=str, default='st.regda.2vaihingen')
    parser.add_argument('--ckpt-path', type=str, required=True)
    parser.add_argument('--multi-layer', type=str2bool, default=True)
    parser.add_argument('--ins-norm', type=str2bool, default=True)
    parser.add_argument('--test', type=str2bool, default=False,
                        help='evaluate the test set?')
    parser.add_argument('--tta', type=str2bool, default=False)
    args = parser.parse_args()

    cfg = import_config(args.config_path, copy=False, create=False)
    cfg.SNAPSHOT_DIR = os.path.dirname(args.ckpt_path)
    logger = get_console_file_logger(name='Baseline', logdir=cfg.SNAPSHOT_DIR)

    meta = get_meta(cfg.DATASETS)
    model = build_deeplabv2(cfg.MODEL, meta.num_classes,
                            multi_layer=args.multi_layer,
                            is_ins_norm=args.ins_norm)
    evaluate(model, None, cfg, is_training=False, ckpt_path=args.ckpt_path,
             logger=logger, tta=args.tta, test=args.test)
