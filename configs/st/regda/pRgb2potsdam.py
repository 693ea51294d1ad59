"""Vaihingen -> Potsdam RGB variant (reference configs/st/regda/
pRgb2potsdam.py): the target is the RGB-channel Potsdam tree."""

from configs.ToPotsdam import (SOURCE_DATA_CONFIG, DATASETS)
from configs._base import IMAGENET_STATS
from configs.st.regda._experiment import experiment_attrs

TARGET_SET = 'Potsdam'
target_dir = dict(image_dir=['data/IsprsDA/Potsdam_rgb/img_dir/train'],
                  mask_dir=['data/IsprsDA/Potsdam_rgb/ann_dir/train'])
val_dir = dict(image_dir=['data/IsprsDA/Potsdam_rgb/img_dir/val'],
               mask_dir=['data/IsprsDA/Potsdam_rgb/ann_dir/val'])
test_dir = dict(image_dir=['data/IsprsDA/Potsdam_rgb/img_dir/test'],
                mask_dir=['data/IsprsDA/Potsdam_rgb/ann_dir/test'])

from configs._base import data_configs, VAIHINGEN_STATS
(_, TARGET_DATA_CONFIG_ID, PSEUDO_DATA_CONFIG,
 EVAL_DATA_CONFIG, TEST_DATA_CONFIG) = data_configs(
    target_dir, target_dir, val_dir, test_dir,
    VAIHINGEN_STATS, IMAGENET_STATS)

globals().update(experiment_attrs(
    model='ResNet101',
    snapshot_dir='./log/regda/pRgb2potsdam',
    target_dir=target_dir,
    target_stats=IMAGENET_STATS,
    clamp=True,
))
