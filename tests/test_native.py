"""Native C++ pipeline tests: build, decode parity, and bit-identical
batches vs the pure-Python path (native/regda_native.cpp)."""

import os

import numpy as np
import pytest
from PIL import Image

from regda_tpu import native
from regda_tpu.aug import (Compose, Normalize, OneOf, RandomCrop,
                           RandomHorizontalFlip, RandomVerticalFlip,
                           RandomRotate90)
from regda_tpu.datasets import DALoader

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native toolchain unavailable')


@pytest.fixture(scope='module')
def tile_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp('tiles')
    rng = np.random.RandomState(0)
    img_dir = root / 'img_dir' / 'train'
    ann_dir = root / 'ann_dir' / 'train'
    reg_dir = root / 'reg_dir' / 'train'
    for d in (img_dir, ann_dir, reg_dir):
        d.mkdir(parents=True)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (96, 96, 3), np.uint8).astype(
            np.uint8)).save(img_dir / f't{i}.png')
        Image.fromarray(rng.randint(0, 8, (96, 96)).astype(np.uint8)).save(
            ann_dir / f't{i}.png')
        Image.fromarray(rng.randint(0, 50, (96, 96)).astype(np.int32),
                        mode='I').save(reg_dir / f't{i}.tif')
    return root


def test_decode_png_matches_pil(tile_tree):
    p = str(tile_tree / 'img_dir' / 'train' / 't0.png')
    np.testing.assert_array_equal(native.decode_png(p),
                                  np.asarray(Image.open(p)))
    m = str(tile_tree / 'ann_dir' / 'train' / 't0.png')
    np.testing.assert_array_equal(native.decode_png(m),
                                  np.asarray(Image.open(m)))


def _loader(tile_tree, transforms, native_on, read_sup=False, workers=0):
    cfg = dict(image_dir=[str(tile_tree / 'img_dir' / 'train')],
               mask_dir=[str(tile_tree / 'ann_dir' / 'train')],
               transforms=transforms, training=True, batch_size=2,
               num_workers=workers, native=native_on, read_sup=read_sup)
    return DALoader(cfg, 'IsprsDA', seed=7)


TRAIN_T = Compose([
    RandomCrop(64),
    OneOf([RandomHorizontalFlip(always=True), RandomVerticalFlip(always=True),
           RandomRotate90(always=True)], p=0.75),
    Normalize(mean=(120., 80., 80.), std=(50., 40., 40.)),
])


def test_native_batch_bit_identical(tile_tree):
    batches_py = list(_loader(tile_tree, TRAIN_T, native_on=False))
    batches_nat = list(_loader(tile_tree, TRAIN_T, native_on=True))
    assert len(batches_py) == len(batches_nat) == 2
    for bp, bn in zip(batches_py, batches_nat):
        assert bp['fname'] == bn['fname']
        np.testing.assert_array_equal(bp['image'], bn['image'])
        assert bp['image'].dtype == bn['image'].dtype == np.float32
        np.testing.assert_array_equal(bp['cls'], bn['cls'])


def test_native_batch_with_sup_and_prob_stack(tile_tree):
    # the prob-pipeline-shaped stack: crop -> hflip -> vflip -> rot90(k=1)
    t = Compose([RandomCrop(64), RandomHorizontalFlip(0.5),
                 RandomVerticalFlip(0.5), RandomRotate90(0.5, fixed_k=1),
                 Normalize((100., 100., 100.), (40., 40., 40.), clamp=True)])
    bp = next(iter(_loader(tile_tree, t, False, read_sup=True)))
    bn = next(iter(_loader(tile_tree, t, True, read_sup=True)))
    np.testing.assert_array_equal(bp['image'], bn['image'])
    np.testing.assert_array_equal(bp['cls'], bn['cls'])
    np.testing.assert_array_equal(bp['sup'], bn['sup'])
    assert bn['image'].max() <= 1.0          # clamp applied


def test_native_batch_threaded_loader(tile_tree):
    bp = next(iter(_loader(tile_tree, TRAIN_T, False, workers=2)))
    bn = next(iter(_loader(tile_tree, TRAIN_T, True, workers=2)))
    np.testing.assert_array_equal(bp['image'], bn['image'])


def test_unsupported_stack_falls_back(tile_tree):
    class Weird:
        def __call__(self, sample, rng):
            return sample
    t = Compose([RandomCrop(64), Weird(),
                 Normalize((0., 0., 0.), (1., 1., 1.))])
    # native path must decline (returns Python-path batches, no crash)
    b = next(iter(_loader(tile_tree, t, True)))
    assert b['image'].shape == (2, 64, 64, 3)


def test_mask_id_mapping(tile_tree):
    # mask values 0..7 with num_classes=6 -> ids >= 6 become ignore (-1)
    t = Compose([RandomCrop(64), Normalize((0., 0., 0.), (1., 1., 1.))])
    bn = next(iter(_loader(tile_tree, t, True)))
    assert bn['cls'].min() >= -1 and bn['cls'].max() <= 5
    assert (bn['cls'] == -1).any()


def test_mismatched_sup_declines_native(tile_tree, tmp_path):
    """A region map whose size differs from the tile must never reach the
    C++ kernel (out-of-bounds risk): try_native_batch declines and returns
    None so the (loud, Python-level) fallback handles the corrupt data."""
    import shutil
    from regda_tpu.datasets.basedata import TileDataset
    from regda_tpu.datasets.native_pipeline import try_native_batch
    root = tmp_path / 'bad'
    shutil.copytree(tile_tree, root)
    Image.fromarray(np.zeros((32, 32), np.int32), mode='I').save(
        root / 'reg_dir' / 'train' / 't0.tif')
    ds = TileDataset('IsprsDA', [str(root / 'img_dir' / 'train')],
                     [str(root / 'ann_dir' / 'train')], transforms=TRAIN_T,
                     read_sup=True)
    rngs = [np.random.default_rng(i) for i in range(4)]
    assert try_native_batch(ds, [0, 1, 2, 3], rngs) is None
