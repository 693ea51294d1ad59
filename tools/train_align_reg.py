"""Stage 2: prototype-contrastive alignment + online pseudo-labels + LRH.

CLI parity with reference tools/train_align_reg.py:35-61:
  python tools/train_align_reg.py --config-path st.regda.2vaihingen \
      --ckpt-model log/regda/2vaihingen/src/Vaihingen_best.ckpt \
      --ckpt-proto log/regda/2vaihingen/src/prototypes_best.npy \
      --align-domain 1 --refine-label 1 --sam-refine --percent 0.5
"""

import os
import time

import _bootstrap  # noqa: F401

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from regda_tpu.datasets import InfiniteIterator, get_meta, make_loader
from regda_tpu.models import build_deeplabv2
from regda_tpu.train import create_train_state, make_optimizer
from regda_tpu.train.loop import Trainer
from regda_tpu.train.steps import make_stage2_step
from regda_tpu.utils.checkpoint import load_prototypes, load_pytree
from regda_tpu.utils.tools import (default_seed,
                                   get_console_file_logger, import_config,
                                   logging_args, logging_cfg, seed_all,
                                   str2bool)

parser = argparse.ArgumentParser(description='Train align by pcl with uem.')
parser.add_argument('--config-path', type=str, default='st.regda.2vaihingen')
parser.add_argument('--auto-resume', type=str2bool, default=0,
                    help='restore the full train state from SNAPSHOT_DIR'
                         ' and continue (elastic recovery)')
parser.add_argument('--ckpt-model', type=str, required=True)
parser.add_argument('--ckpt-proto', type=str, required=True)
parser.add_argument('--gen', type=str2bool, default=1)
parser.add_argument('--align-domain', type=str2bool, default=0)
parser.add_argument('--refine-label', type=str2bool, default=1)
parser.add_argument('--refine-mode', type=str, default='all', choices=['all'])
parser.add_argument('--refine-temp', type=float, default=2.0)
parser.add_argument('--sam-refine', action='store_true', help='whether lrh')
parser.add_argument('--percent', type=float, default=0.5)
parser.add_argument('--ls', type=str, default='CrossEntropy',
                    choices=['CrossEntropy', 'OhemCrossEntropy'])
parser.add_argument('--bcs', type=str2bool, default=0)
parser.add_argument('--class-temp', type=float, default=2.0)
parser.add_argument('--pcl-temp', type=float, default=8.0)
args = parser.parse_args()

cfg = import_config(args.config_path, create=True, copy=True, postfix='/align')
print('args.sam_refine,', args.sam_refine)


def main():
    time_from = time.time()
    logger = get_console_file_logger(name=args.config_path.split('.')[1],
                                     logdir=cfg.SNAPSHOT_DIR)
    logging_args(args, logger)
    logging_cfg(cfg, logger)

    meta = get_meta(cfg.DATASETS)
    stop_steps = cfg.STAGE2_STEPS

    model = build_deeplabv2(cfg.MODEL, meta.num_classes,
                            remat=getattr(cfg, 'REMAT', False))
    tx = make_optimizer(cfg.LEARNING_RATE, stop_steps, momentum=cfg.MOMENTUM,
                        weight_decay=cfg.WEIGHT_DECAY, power=cfg.POWER)
    variables = load_pytree(args.ckpt_model)
    state = create_train_state(model, tx, jax.random.PRNGKey(default_seed()),
                               num_classes=meta.num_classes,
                               variables=variables)
    protos = jnp.asarray(load_prototypes(args.ckpt_proto))
    state = state.replace(prototypes=protos)
    logger.info(f'prototypes({protos.shape}) loaded from {args.ckpt_proto}')

    step_fn = make_stage2_step(
        model, tx, align_domain=bool(args.align_domain),
        refine_label=bool(args.refine_label), refine_mode=args.refine_mode,
        refine_temp=args.refine_temp, sam_refine=bool(args.sam_refine),
        percent=args.percent, ls=args.ls, bcs=bool(args.bcs),
        class_temp=args.class_temp, pcl_temp=args.pcl_temp,
        num_classes=meta.num_classes, ignore_label=meta.ignore_label,
        cutoff_top=cfg.CUTOFF_TOP, cutoff_low=cfg.CUTOFF_LOW)
    trainer = Trainer(model, cfg, logger, state, step_fn)
    start_iter = trainer.try_resume() if args.auto_resume else 0

    sourceloader = make_loader(cfg.SOURCE_DATA_CONFIG, cfg.DATASETS,
                               logger=logger)
    # stage 2 target loader: same id-label target dirs as stage 1 but with
    # SAM region maps (sup) attached (train_align_reg.py:161-163)
    target_config = dict(cfg.TARGET_DATA_CONFIG)
    target_config['label_type'] = 'id'
    target_config['mask_dir'] = None
    target_config['read_sup'] = True
    targetloader = make_loader(target_config, cfg.DATASETS,
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
            images_t=bt['image'], regs_t=bt['sup'].astype(np.int32))
        trainer.maybe_log(i_iter, metrics)
        trainer.maybe_eval(i_iter, stop_steps, eval_at_zero=True)

    trainer.join_saver()
    # final prototypes for stage 3
    from regda_tpu.utils.checkpoint import save_prototypes
    save_prototypes(os.path.join(cfg.SNAPSHOT_DIR, 'prototypes_best'),
                    jax.device_get(trainer.state.prototypes))
    logger.info(f'>>>> Using {(time.time() - time_from) / 3600:.3f} hours.')


if __name__ == '__main__':
    seed_all()
    main()
