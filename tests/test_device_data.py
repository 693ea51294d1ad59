"""Device-resident data path (datasets/device_data.py): aug-spec parsing,
on-device geometric ops vs the host aug implementations, DeviceLoader
iteration protocol vs DALoader, and the device eval cache."""

import numpy as np
import pytest

from configs._base import (eval_transforms, prob_target_transforms,
                           train_transforms)
from regda_tpu.datasets.device_data import (DeviceEvalSet, DeviceLoader,
                                            _apply_indep, _geo_switch,
                                            make_batch_fn, parse_aug_spec)

MEAN, STD = (10.0, 20.0, 30.0), (2.0, 3.0, 4.0)


def test_parse_specs():
    s = parse_aug_spec(train_transforms(MEAN, STD, crop=64))
    assert s['kind'] == 'oneof' and s['crop'] == 64 and s['p'] == 0.75
    assert not s['clamp']
    s = parse_aug_spec(prob_target_transforms(MEAN, STD, crop=32))
    assert s['kind'] == 'indep' and s['crop'] == 32 and s['clamp']
    assert s['hflip_p'] == 0.5 and s['rot_p'] == 0.5
    s = parse_aug_spec(eval_transforms(MEAN, STD))
    assert s['kind'] == 'none' and s['crop'] is None
    # unknown stack -> None (host fallback)
    from regda_tpu.aug import Compose, RandomCrop
    assert parse_aug_spec(Compose([RandomCrop(8)])) is None
    # OneOf whose inner transforms are NOT always-apply would diverge from
    # the host path (_draw_ops applies the chosen op unconditionally) ->
    # must be rejected, not silently accepted
    from regda_tpu.aug import (Normalize, OneOf, RandomHorizontalFlip,
                               RandomRotate90, RandomVerticalFlip)
    bad = Compose([RandomCrop(64),
                   OneOf([RandomHorizontalFlip(),
                          RandomVerticalFlip(),
                          RandomRotate90()], p=0.75),
                   Normalize(MEAN, STD)])
    assert parse_aug_spec(bad) is None


def test_geo_switch_matches_host_ops():
    import jax
    x = np.arange(5 * 5 * 3, dtype=np.uint8).reshape(5, 5, 3)
    expect = [x, x[:, ::-1], x[::-1], x,
              np.rot90(x, 1), np.rot90(x, 2), np.rot90(x, 3)]
    for op, e in enumerate(expect):
        got = np.asarray(jax.jit(_geo_switch)(x, op))
        np.testing.assert_array_equal(got, e, err_msg=f'op={op}')


def test_apply_indep_matches_sequential_host():
    import jax
    x = np.arange(4 * 4, dtype=np.int32).reshape(4, 4)
    for h in (0, 1):
        for v in (0, 1):
            for r in (0, 1):
                e = x
                if h:
                    e = e[:, ::-1]
                if v:
                    e = e[::-1]
                if r:
                    e = np.rot90(e, 1)
                got = np.asarray(jax.jit(_apply_indep)(
                    x, np.array([h, v, r], bool)))
                np.testing.assert_array_equal(got, e)


def _mini_tree(tmp_path, n=6, hw=32, n_cls=6):
    from PIL import Image
    rng = np.random.default_rng(0)
    img_dir = tmp_path / 'img_dir' / 'train'
    ann_dir = tmp_path / 'ann_dir' / 'train'
    reg_dir = tmp_path / 'reg_dir' / 'train'
    for d in (img_dir, ann_dir, reg_dir):
        d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 255, (hw, hw, 3), dtype=np.uint8)
        lbl = rng.integers(0, n_cls + 1, (hw, hw)).astype(np.uint8)
        reg = rng.integers(0, 9, (hw, hw)).astype(np.int32)
        Image.fromarray(img).save(img_dir / f't{i}.png')
        Image.fromarray(lbl).save(ann_dir / f't{i}.png')
        Image.fromarray(reg, mode='I').save(reg_dir / f't{i}.tif')
    return str(img_dir), str(ann_dir)


def test_device_loader_batches(tmp_path):
    img_dir, ann_dir = _mini_tree(tmp_path)
    cfg = dict(image_dir=[img_dir], mask_dir=[ann_dir],
               transforms=train_transforms(MEAN, STD, crop=16),
               training=True, batch_size=2, read_sup=True)
    dl = DeviceLoader(cfg, 'IsprsDA', seed=7)
    assert len(dl) == 3
    batches = list(dl)
    assert len(batches) == 3
    b = batches[0]
    assert b['image'].shape == (2, 16, 16, 3)
    assert str(b['image'].dtype) == 'float32'
    assert b['cls'].shape == (2, 16, 16)
    assert str(b['cls'].dtype) == 'int32'
    assert b['sup'].shape == (2, 16, 16)
    assert len(b['fname']) == 2
    cls = np.asarray(b['cls'])
    # ids >= num_classes were remapped to ignore at cache build
    assert cls.max() < 6 and cls.min() >= -1 and (cls == -1).any()
    # image values are normalized: range far from 0-255
    img = np.asarray(b['image'])
    assert abs(img.mean()) < 40
    # two epochs shuffle differently
    b2 = list(dl)[0]
    assert not np.array_equal(np.asarray(b2['image']), np.asarray(b['image']))


def test_device_loader_matches_host_when_no_aug_randomness(tmp_path):
    """With crop == tile size and OneOf p=0, the device batch must equal the
    host DALoader batch exactly (same tiles, same normalize math)."""
    from regda_tpu.aug import Compose, Normalize, RandomCrop
    from regda_tpu.datasets.loader import DALoader
    img_dir, ann_dir = _mini_tree(tmp_path, hw=24)
    tf = Compose([RandomCrop(24), Normalize(mean=MEAN, std=STD)])
    cfg = dict(image_dir=[img_dir], mask_dir=[ann_dir], transforms=tf,
               training=False, batch_size=3, num_workers=0, native=False)
    host = next(iter(DALoader(cfg, 'IsprsDA', seed=3)))
    spec = parse_aug_spec(tf)
    assert spec is not None and spec['kind'] == 'none'
    dev = DeviceLoader(cfg, 'IsprsDA', seed=3)
    got = next(iter(dev))
    np.testing.assert_allclose(np.asarray(got['image']), host['image'],
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got['cls']), host['cls'])


def test_prob_label_batch(tmp_path):
    img_dir, ann_dir = _mini_tree(tmp_path, hw=16)
    # prob pseudo-labels alongside: <ann>/<fname>.npy like gener_target_pseudo
    import glob
    import os
    rng = np.random.default_rng(1)
    for p in glob.glob(os.path.join(ann_dir, '*.png')):
        np.save(p + '.npy', rng.random((16, 16, 6)).astype(np.float32))
    cfg = dict(image_dir=[img_dir], mask_dir=[ann_dir],
               transforms=prob_target_transforms(MEAN, STD, crop=8),
               training=True, batch_size=2, label_type='prob',
               read_sup=True)
    dl = DeviceLoader(cfg, 'IsprsDA', seed=1)
    b = next(iter(dl))
    assert b['cls'].shape == (2, 8, 8, 6)
    assert str(b['cls'].dtype) == 'float32'
    # clamp applied
    assert np.asarray(b['image']).max() <= 1.0 + 1e-6


def test_device_eval_set(tmp_path):
    img_dir, ann_dir = _mini_tree(tmp_path, hw=20)
    cfg = dict(image_dir=[img_dir], mask_dir=[ann_dir],
               transforms=eval_transforms(MEAN, STD), batch_size=1)
    es = DeviceEvalSet(cfg, 'IsprsDA')
    tiles = list(es)
    assert len(tiles) == len(es) == 6
    t = tiles[0]
    assert t['image'].shape == (1, 20, 20, 3)
    assert t['cls'].shape == (1, 20, 20)
    # normalize matches the host Normalize exactly
    from regda_tpu.datasets.basedata import TileDataset
    ds = TileDataset('IsprsDA', image_dir=[img_dir], mask_dir=[ann_dir],
                     transforms=eval_transforms(MEAN, STD))
    host = ds[0]
    np.testing.assert_allclose(np.asarray(t['image'][0]), host['image'],
                               rtol=0, atol=1e-5)


def test_budget_guard(tmp_path):
    from regda_tpu.datasets.device_data import DeviceCacheTooLarge
    img_dir, ann_dir = _mini_tree(tmp_path, hw=16)
    cfg = dict(image_dir=[img_dir], mask_dir=[ann_dir],
               transforms=train_transforms(MEAN, STD, crop=8),
               training=True, batch_size=2)
    with pytest.raises(DeviceCacheTooLarge):
        DeviceLoader(cfg, 'IsprsDA', budget_bytes=16)


def test_oneof_distribution():
    """Op-code draw matches the host OneOf probabilities: P(identity) ~
    0.25 + 0.75 * (1/3) * (1/4) (rot can draw k=0)."""
    import jax
    from regda_tpu.datasets.device_data import _draw_ops
    spec = dict(kind='oneof', p=0.75)
    ops = np.asarray(_draw_ops(spec, jax.random.PRNGKey(0), 20000))
    p_ident = np.mean((ops == 0) | (ops == 3))
    assert abs(p_ident - (0.25 + 0.75 / 12)) < 0.02
    p_h = np.mean(ops == 1)
    assert abs(p_h - 0.25) < 0.02


def test_eval_cache_keys_on_normalization(tmp_path):
    """get_eval_set must NOT hand a cached split normalized with different
    stats to a second config that shares the same directories."""
    from regda_tpu.datasets.device_data import get_eval_set

    img_dir, ann_dir = _mini_tree(tmp_path, hw=12)
    cfg_a = dict(image_dir=[img_dir], mask_dir=[ann_dir],
                 transforms=eval_transforms(MEAN, STD), batch_size=1)
    cfg_b = dict(image_dir=[img_dir], mask_dir=[ann_dir],
                 transforms=eval_transforms((0.0, 0.0, 0.0),
                                            (1.0, 1.0, 1.0)),
                 batch_size=1)
    ea, eb = get_eval_set(cfg_a, 'IsprsDA'), get_eval_set(cfg_b, 'IsprsDA')
    assert ea is not eb
    ta, tb = next(iter(ea))['image'], next(iter(eb))['image']
    assert not np.allclose(np.asarray(ta), np.asarray(tb))
    # same config -> same cached instance
    assert get_eval_set(dict(cfg_a), 'IsprsDA') is ea


def test_eval_set_honors_cv_fold(tmp_path):
    """DeviceEvalSet must select the same CV fold DALoader would
    (regda/datasets/daLoader.py fold semantics), and the cache must key
    on the fold."""
    from regda_tpu.datasets.device_data import get_eval_set
    from regda_tpu.datasets.loader import DALoader

    img_dir, ann_dir = _mini_tree(tmp_path, n=6, hw=12)
    base = dict(image_dir=[img_dir], mask_dir=[ann_dir],
                transforms=eval_transforms(MEAN, STD), batch_size=1,
                num_workers=0, native=False)
    cfg_fold = dict(base, CV=dict(k=3, i=1))
    host = DALoader(cfg_fold, 'IsprsDA', seed=2333)
    dev = get_eval_set(cfg_fold, 'IsprsDA')
    assert len(dev) == len(host) == 2
    host_names = [b['fname'][0] for b in host]
    dev_names = [n for b in dev for n in b['fname']]
    assert sorted(dev_names) == sorted(host_names)
    # full split (i=-1) is a different cache entry with all tiles
    full = get_eval_set(dict(base, CV=dict(k=3, i=-1)), 'IsprsDA')
    assert full is not dev and len(full) == 6


def test_eval_set_budget_guard(tmp_path, monkeypatch):
    """An over-budget eval split raises DeviceCacheTooLarge (so evaluate()
    falls back to the host loader) instead of dying in the allocator."""
    from regda_tpu.datasets.device_data import DeviceCacheTooLarge

    img_dir, ann_dir = _mini_tree(tmp_path, n=2, hw=12)
    monkeypatch.setenv('REGDA_DEVICE_DATA_BUDGET', '64')
    cfg = dict(image_dir=[img_dir], mask_dir=[ann_dir],
               transforms=eval_transforms(MEAN, STD), batch_size=1)
    with pytest.raises(DeviceCacheTooLarge):
        DeviceEvalSet(cfg, 'IsprsDA')


def test_device_loader_rejects_oversized_crop(tmp_path):
    """crop > cached tile size is a misconfiguration the host RandomCrop
    raises on; the device path must surface it, not silently train
    uncropped."""
    img_dir, ann_dir = _mini_tree(tmp_path, hw=16)
    cfg = dict(image_dir=[img_dir], mask_dir=[ann_dir],
               transforms=train_transforms(MEAN, STD, crop=32),
               training=True, batch_size=2)
    with pytest.raises(ValueError, match='exceeds cached tile'):
        DeviceLoader(cfg, 'IsprsDA')
