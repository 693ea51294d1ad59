"""Stage 1: source-supervised training (+ optional CORAL domain alignment).

CLI parity with reference tools/train_src.py:29-37:
  python tools/train_src.py --config-path st.regda.2vaihingen --align-domain 1
"""

import time

import _bootstrap  # noqa: F401

import argparse

import jax
import numpy as np

from regda_tpu.datasets import InfiniteIterator, get_meta, make_loader
from regda_tpu.models import build_deeplabv2
from regda_tpu.train import create_train_state, make_optimizer
from regda_tpu.train.loop import Trainer
from regda_tpu.train.steps import make_stage1_step
from regda_tpu.utils.tools import (default_seed,
                                   get_console_file_logger, import_config,
                                   logging_args, logging_cfg, seed_all,
                                   str2bool, count_model_parameters)

parser = argparse.ArgumentParser(description='Train in src.')
parser.add_argument('--config-path', type=str, default='st.regda.2vaihingen')
parser.add_argument('--auto-resume', type=str2bool, default=0,
                    help='restore the full train state from SNAPSHOT_DIR'
                         ' and continue (elastic recovery)')
parser.add_argument('--align-domain', type=str2bool, default=0)
parser.add_argument('--ls', type=str, default='CrossEntropy',
                    choices=['CrossEntropy', 'OhemCrossEntropy'])
parser.add_argument('--bcs', type=str2bool, default=0,
                    help='whether balance class for source')
parser.add_argument('--class-temp', type=float, default=2.0)
parser.add_argument('--pretrained-ckpt', type=str, default=None,
                    help='optional converted ImageNet/reference init (.pth/.ckpt)')
args = parser.parse_args()

cfg = import_config(args.config_path, create=True, copy=True, postfix='/src')


def main():
    time_from = time.time()
    logger = get_console_file_logger(name=args.config_path.split('.')[1],
                                     logdir=cfg.SNAPSHOT_DIR)
    logging_args(args, logger)
    logging_cfg(cfg, logger)

    meta = get_meta(cfg.DATASETS)
    stop_steps = cfg.STAGE1_STEPS

    model = build_deeplabv2(cfg.MODEL, meta.num_classes,
                            remat=getattr(cfg, 'REMAT', False))
    tx = make_optimizer(cfg.LEARNING_RATE, stop_steps,
                        momentum=cfg.MOMENTUM, weight_decay=cfg.WEIGHT_DECAY,
                        power=cfg.POWER)
    variables = None
    if args.pretrained_ckpt:
        from regda_tpu.utils.checkpoint import load_pytree
        variables = load_pytree(args.pretrained_ckpt)
        logger.info(f'loaded init from {args.pretrained_ckpt}')
    crop = getattr(cfg, 'CROP_SIZE', 512)
    size = meta.size if cfg.SOURCE_DATA_CONFIG.get('transforms') is None \
        else (crop, crop)
    state = create_train_state(model, tx, jax.random.PRNGKey(default_seed()),
                               input_shape=(1, *size, 3),
                               num_classes=meta.num_classes,
                               variables=variables)
    count_model_parameters(state.params, logger)

    step_fn = make_stage1_step(model, tx, align_domain=bool(args.align_domain),
                               ls=args.ls, bcs=bool(args.bcs),
                               class_temp=args.class_temp,
                               num_classes=meta.num_classes,
                               ignore_label=meta.ignore_label)
    trainer = Trainer(model, cfg, logger, state, step_fn)
    start_iter = trainer.try_resume() if args.auto_resume else 0

    sourceloader = make_loader(cfg.SOURCE_DATA_CONFIG, cfg.DATASETS,
                               logger=logger)
    targetloader = make_loader(cfg.TARGET_DATA_CONFIG, cfg.DATASETS,
                               logger=logger)
    source_iter = InfiniteIterator(sourceloader)
    target_iter = InfiniteIterator(targetloader)
    logger.info(f'batch num: source={len(sourceloader)}, '
                f'target={len(targetloader)}')
    logger.info('epochs ~= %.3f' % (stop_steps / len(sourceloader)))

    for i_iter in range(start_iter, stop_steps):
        bs = source_iter.next()
        bt = target_iter.next()
        metrics = trainer.run_step(
            i_iter=i_iter,
            images_s=bs['image'], label_s=bs['cls'].astype(np.int32),
            images_t=bt['image'])
        trainer.maybe_log(i_iter, metrics)
        trainer.maybe_eval(i_iter, stop_steps)

    trainer.join_saver()
    logger.info(f'>>>> Using {(time.time() - time_from) / 3600:.3f} hours.')


if __name__ == '__main__':
    seed_all()
    main()
