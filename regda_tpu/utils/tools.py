"""CLI/config/logging plumbing.

Parity targets: regda/utils/tools.py:24-30 (str2bool), :173-181
(import_config: dotted-path module import + SNAPSHOT_DIR postfix + config
provenance copy), :221-237 (console+file logger), :33-46 (arg/cfg dumps),
:401-407 (parameter count).
"""

from __future__ import annotations

import argparse
import importlib
import logging
import os
import shutil
import time

import numpy as np


def str2bool(v: str) -> bool:
    if v.lower() in ('yes', 'true', 't', 'y', '1'):
        return True
    if v.lower() in ('no', 'false', 'f', 'n', '0'):
        return False
    raise argparse.ArgumentTypeError('Unsupported value encountered.')


def import_config(config_name: str, prefix: str = 'configs', copy: bool = True,
                  create: bool = True, postfix: str = ''):
    cfg_path = f'{prefix}.{config_name}'
    m = importlib.import_module(name=cfg_path)
    m.SNAPSHOT_DIR += postfix
    if create:
        os.makedirs(m.SNAPSHOT_DIR, exist_ok=True)
    if copy:
        src = cfg_path.replace('.', '/') + '.py'
        if os.path.exists(src):
            shutil.copy(src, os.path.join(m.SNAPSHOT_DIR, 'config.py'))
    return m


def get_console_file_logger(name: str, level=logging.INFO,
                            logdir: str = './baseline') -> logging.Logger:
    logger = logging.Logger(name)
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s, %(levelname)s:%(name)s:%(message)s",
                            '%Y-%m-%d %H:%M:%S')
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    ch.setLevel(level)
    logger.addHandler(ch)
    os.makedirs(logdir, exist_ok=True)
    fh = logging.FileHandler(os.path.join(logdir, str(time.time()) + '.log'))
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    return logger


def logging_args(args, logger):
    logger.info('>>>>>>>>>>>>>>>>>>>>> arguments logging begin:')
    for k, v in vars(args).items():
        logger.info(f'{k}={v}')
    logger.info('<<<<<<<<<<<<<<<<<<<<< arguments logging end!')


def logging_cfg(cfg, logger):
    logger.info('>>>>>>>>>>>>>>>>>>>>> config logging begin:')
    logger.info(cfg.__name__)
    for k, v in vars(cfg).items():
        if not str(k).startswith('__'):
            logger.info(f'{k}={v}')
    logger.info('<<<<<<<<<<<<<<<<<<<<< config logging end!')


def default_seed() -> int:
    """2333 (the reference's seed_torch(2333), tools/train_src.py:169-172)
    unless REGDA_SEED overrides it — the reference exposes no seed flag,
    so the override is env-only to keep the CLI surface identical. Used
    for seed variance studies (tools/run_parity.py --seeds)."""
    return int(os.environ.get('REGDA_SEED', '2333'))


def seed_all(seed: int = None):
    """Host-side seeding; device randomness is explicit jax PRNG keys."""
    import random
    seed = default_seed() if seed is None else seed
    random.seed(seed)
    os.environ['PYTHONHASHSEED'] = str(seed)
    np.random.seed(seed)


def count_model_parameters(params, logger=None) -> int:
    import jax
    cnt = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    if logger is not None:
        logger.info('#params: {}, {} M'.format(cnt, round(cnt / 1e6, 3)))
    return cnt


class AverageMeter:
    """Running average tracker (reference regda/utils/tools.py:432-451)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
