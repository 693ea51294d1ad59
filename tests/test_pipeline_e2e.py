"""End-to-end pipeline test on a synthetic dataset: stage-1 training ->
prototype init -> stage-2 (LRH) -> pseudo generation -> stage-3 (UVEM),
exercising the same library paths the CLI tools use."""

import os
import types

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from regda_tpu.aug import Compose, Normalize, RandomCrop
from regda_tpu.datasets import DALoader, InfiniteIterator
from regda_tpu.infer import SegInferencer
from regda_tpu.models import build_deeplabv2
from regda_tpu.pseudo import gener_target_pseudo
from regda_tpu.train import create_train_state, make_optimizer
from regda_tpu.train.loop import Trainer
from regda_tpu.train.steps import (make_stage1_step, make_stage2_step,
                                   make_stage3_step, make_proto_accum_step)
from regda_tpu.ops.prototypes import prototype_finalize

HW = 64
C = 6


@pytest.fixture(scope='module')
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('isprs')
    rng = np.random.default_rng(0)
    for split, n in (('train', 4), ('val', 2)):
        for domain in ('Src', 'Tgt'):
            img_dir = root / domain / 'img_dir' / split
            ann_dir = root / domain / 'ann_dir' / split
            reg_dir = root / domain / 'reg_dir' / split
            for d in (img_dir, ann_dir, reg_dir):
                d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                img = rng.integers(0, 255, size=(HW, HW, 3)).astype(np.uint8)
                block = rng.integers(0, C, size=(2, 2)).astype(np.uint8)
                lbl = np.kron(block, np.ones((HW // 2, HW // 2), np.uint8))
                reg = np.kron(rng.integers(0, 5, size=(4, 4)),
                              np.ones((HW // 4, HW // 4))).astype(np.int32)
                Image.fromarray(img).save(img_dir / f't{i}.png')
                Image.fromarray(lbl).save(ann_dir / f't{i}.png')
                Image.fromarray(reg, mode='I').save(reg_dir / f't{i}.tif')
    return root


def _cfg(root, tmp_path):
    norm = Normalize((120., 80., 80.), (50., 40., 40.))
    train_t = Compose([RandomCrop(HW), norm])
    eval_t = Compose([norm])
    def mk(dom, split, train, **kw):
        d = dict(image_dir=[str(root / dom / 'img_dir' / split)],
                 mask_dir=[str(root / dom / 'ann_dir' / split)],
                 transforms=train_t if train else eval_t,
                 training=train, batch_size=2, num_workers=0)
        d.update(kw)
        return d
    return types.SimpleNamespace(
        DATASETS='IsprsDA',
        TARGET_SET='Tgt',
        SNAPSHOT_DIR=str(tmp_path / 'log'),
        EVAL_EVERY=2,
        CUTOFF_TOP=0.8,
        CUTOFF_LOW=0.6,
        SOURCE_DATA_CONFIG=mk('Src', 'train', True),
        TARGET_DATA_CONFIG=mk('Tgt', 'train', True, read_sup=True),
        PSEUDO_DATA_CONFIG=dict(
            image_dir=[str(root / 'Tgt' / 'img_dir' / 'train')],
            mask_dir=[None], transforms=eval_t, training=False,
            batch_size=1, num_workers=0),
        EVAL_DATA_CONFIG=mk('Tgt', 'val', False, batch_size=1),
        TEST_DATA_CONFIG=None,
    )


def test_full_pipeline(data_root, tmp_path):
    cfg = _cfg(data_root, tmp_path)
    os.makedirs(cfg.SNAPSHOT_DIR, exist_ok=True)

    import logging
    logger = logging.getLogger('e2e')

    model = build_deeplabv2('resnet18', num_classes=C)
    tx = make_optimizer(1e-2, stop_steps=4)

    # ---- stage 1
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, HW, HW, 3), num_classes=C,
                               feat_dim=512)
    step1 = make_stage1_step(model, tx, align_domain=True, num_classes=C)
    trainer = Trainer(model, cfg, logger, state, step1)
    src_it = InfiniteIterator(DALoader(cfg.SOURCE_DATA_CONFIG, 'IsprsDA'))
    tgt_it = InfiniteIterator(DALoader(cfg.TARGET_DATA_CONFIG, 'IsprsDA'))
    for i in range(2):
        bs, bt = src_it.next(), tgt_it.next()
        m = trainer.run_step(images_s=bs['image'],
                             label_s=bs['cls'].astype(np.int32),
                             images_t=bt['image'])
        assert np.isfinite(float(m['total']))
    miou = trainer.maybe_eval(1, 4)
    assert miou is not None and 0 <= miou <= 1
    stage1_vars = trainer.variables

    # ---- init prototypes
    accum = jax.jit(make_proto_accum_step(model), static_argnums=(5, 6))
    s = jnp.zeros((C, 512))
    c = jnp.zeros((C, 1))
    for batch in DALoader(cfg.SOURCE_DATA_CONFIG, 'IsprsDA'):
        s, c = accum(stage1_vars, s, c, jnp.asarray(batch['image']),
                     jnp.asarray(batch['cls'].astype(np.int32)), C, -1)
    protos = np.asarray(prototype_finalize(s, c))  # host copy: device
    # arrays put into donated TrainStates are consumed by the step
    assert np.isfinite(protos).all()

    # ---- stage 2 (LRH on)
    state2 = create_train_state(model, tx, jax.random.PRNGKey(1),
                                num_classes=C, feat_dim=512,
                                variables=stage1_vars
                                ).replace(prototypes=jnp.asarray(protos))
    step2 = make_stage2_step(model, tx, num_classes=C, sam_refine=True,
                             align_domain=True)
    trainer2 = Trainer(model, cfg, logger, state2, step2)
    for i in range(2):
        bs, bt = src_it.next(), tgt_it.next()
        m = trainer2.run_step(images_s=bs['image'],
                              label_s=bs['cls'].astype(np.int32),
                              images_t=bt['image'],
                              regs_t=bt['sup'].astype(np.int32))
        assert np.isfinite(float(m['total']))
    stage2_vars = trainer2.variables

    # ---- pseudo generation
    pseudo_dir = str(tmp_path / 'pseudo_label')
    inferencer = SegInferencer(model, stage2_vars, C)
    gener_target_pseudo(cfg, inferencer,
                        DALoader(cfg.PSEUDO_DATA_CONFIG, 'IsprsDA'),
                        pseudo_dir, save_prob=True, slide=False, tta=True)
    npys = [f for f in os.listdir(pseudo_dir) if f.endswith('.npy')]
    assert len(npys) == 4
    prob = np.load(os.path.join(pseudo_dir, npys[0]))
    assert prob.shape == (512, 512, C)  # resized to meta.size
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-3)

    # ---- stage 3 (prob labels + UVEM + LRH)
    # note: meta.size resizing makes pseudo labels 512x512 while tiles are
    # 64x64 in this synthetic set; regenerate at tile size for the loader
    gener_target_pseudo(cfg, inferencer,
                        DALoader(cfg.PSEUDO_DATA_CONFIG, 'IsprsDA'),
                        pseudo_dir, save_prob=True, slide=False, tta=False,
                        size=(HW, HW))
    t3_cfg = dict(cfg.TARGET_DATA_CONFIG)
    t3_cfg['mask_dir'] = [pseudo_dir]
    t3_cfg['label_type'] = 'prob'
    state3 = create_train_state(model, tx, jax.random.PRNGKey(2),
                                num_classes=C, feat_dim=512,
                                variables=stage2_vars
                                ).replace(prototypes=jnp.asarray(protos))
    step3 = make_stage3_step(model, tx, num_classes=C, lt='uvem',
                             sam_refine=True)
    trainer3 = Trainer(model, cfg, logger, state3, step3)
    tgt3_it = InfiniteIterator(DALoader(t3_cfg, 'IsprsDA'))
    for i in range(2):
        bs, bt = src_it.next(), tgt3_it.next()
        m = trainer3.run_step(images_s=bs['image'],
                              label_s=bs['cls'].astype(np.int32),
                              images_t=bt['image'],
                              label_t_prob=bt['cls'].astype(np.float32),
                              regs_t=bt['sup'].astype(np.int32))
        assert np.isfinite(float(m['total']))


def test_daloader_cross_validation_folds(data_root, tmp_path):
    """CV={'k': 2, 'i': j}: train/eval loaders partition the dataset into
    complementary folds (reference: ever CrossValSamplerGenerator via
    daLoader.py:36-47; all shipped configs disable it with i=-1)."""
    cfg = _cfg(data_root, tmp_path)
    base = dict(cfg.SOURCE_DATA_CONFIG)
    base['batch_size'] = 1
    seen = {}
    for role, train in (('train', True), ('eval', False)):
        fold_files = []
        for i in range(2):
            c = dict(base, training=train, CV=dict(k=2, i=i))
            loader = DALoader(c, 'IsprsDA')
            files = sorted(f for b in loader for f in b['fname'])
            fold_files.append(files)
        seen[role] = fold_files
    n = 4  # tiles in Src/train
    for i in range(2):
        tr, ev = set(seen['train'][i]), set(seen['eval'][i])
        assert tr and ev and not (tr & ev)
        assert len(tr) + len(ev) == n
    # the two eval folds cover the dataset exactly once
    assert not (set(seen['eval'][0]) & set(seen['eval'][1]))
    assert len(set(seen['eval'][0]) | set(seen['eval'][1])) == n
    # i=-1 (default) keeps the full dataset
    full = DALoader(dict(base, CV=dict(k=2, i=-1)), 'IsprsDA')
    assert len(full) == n


def test_join_saver_surfaces_async_failure():
    """A failed background checkpoint chain must not masquerade as a
    successful save: join_saver re-raises the thread's exception (once),
    so --auto-resume can never silently restore a stale/missing state."""
    import threading

    import pytest

    t = Trainer.__new__(Trainer)
    t._saver_exc = None

    def boom():
        t._saver_exc = OSError('disk full')

    t._saver = threading.Thread(target=boom)
    t._saver.start()
    with pytest.raises(RuntimeError, match='async checkpoint'):
        t.join_saver()
    # the exception is consumed; subsequent joins are clean no-ops
    t.join_saver()
