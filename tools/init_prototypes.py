"""Average per-class 2048-d feature prototypes over the source set.

CLI parity with reference tools/init_prototypes.py:33-44:
  python tools/init_prototypes.py --config-path st.regda.2vaihingen \
      --ckpt-model log/regda/2vaihingen/src/Vaihingen_best.ckpt \
      --ckpt-proto log/regda/2vaihingen/src/prototypes_best
"""

import time

import _bootstrap  # noqa: F401

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from regda_tpu.datasets import get_meta, make_loader
from regda_tpu.models import build_deeplabv2
from regda_tpu.ops.prototypes import prototype_finalize
from regda_tpu.train.steps import make_proto_accum_step
from regda_tpu.utils.checkpoint import load_pytree, save_prototypes
from regda_tpu.utils.tools import (get_console_file_logger, import_config,
                                   logging_args, logging_cfg, seed_all)

parser = argparse.ArgumentParser(description='init proto')
parser.add_argument('--config-path', type=str, default='st.regda.2vaihingen')
parser.add_argument('--ckpt-model', type=str, required=True)
parser.add_argument('--ckpt-proto', type=str, required=True)
parser.add_argument('--stage', type=int, default=1)
args = parser.parse_args()

cfg = import_config(args.config_path, create=True, copy=False,
                    postfix='/src' if args.stage == 1 else '/align')


def main():
    time_from = time.time()
    logger = get_console_file_logger(name=args.config_path.split('.')[1],
                                     logdir=cfg.SNAPSHOT_DIR)
    logging_args(args, logger)
    logging_cfg(cfg, logger)

    meta = get_meta(cfg.DATASETS)
    model = build_deeplabv2(cfg.MODEL, meta.num_classes)
    variables = jax.device_put(load_pytree(args.ckpt_model))

    feat_dim = 512 if str(cfg.MODEL).lower() in ('resnet18', 'resnet34') else 2048
    accum = jax.jit(make_proto_accum_step(model), static_argnums=(5, 6))
    data_sum = jnp.zeros((meta.num_classes, feat_dim))
    data_cnt = jnp.zeros((meta.num_classes, 1))

    sourceloader = make_loader(cfg.SOURCE_DATA_CONFIG, cfg.DATASETS)
    for batch in sourceloader:
        data_sum, data_cnt = accum(variables, data_sum, data_cnt,
                                   jnp.asarray(batch['image']),
                                   jnp.asarray(batch['cls'].astype(np.int32)),
                                   meta.num_classes, meta.ignore_label)

    prototypes = prototype_finalize(data_sum, data_cnt)
    save_prototypes(args.ckpt_proto, prototypes)
    logger.info('finish init prototypes!')
    logger.info(f'examples cnt({data_cnt.shape})={np.asarray(data_cnt)}')
    logger.info(f'prototypes({prototypes.shape}) saved to {args.ckpt_proto}')
    logger.info(f'>>>> Using {(time.time() - time_from) / 3600:.3f} hours.')


if __name__ == '__main__':
    seed_all()
    main()
