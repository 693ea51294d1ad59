"""RegDA experiment config (reference configs/st/regda/2rural.py)."""

from configs.ToRURAL import (SOURCE_DATA_CONFIG, EVAL_DATA_CONFIG,
                        PSEUDO_DATA_CONFIG, TEST_DATA_CONFIG, TARGET_SET,
                        TARGET_STATS, target_dir, DATASETS)
from configs.st.regda._experiment import experiment_attrs

globals().update(experiment_attrs(
    model='ResNet',
    snapshot_dir='./log/regda/2rural',
    target_dir=target_dir,
    target_stats=TARGET_STATS,
    clamp=False,
))
