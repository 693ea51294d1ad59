"""Tests for offline data prep: ISPRS tilers (convert_datasets parity) and
the JAX SLIC superpixel kernel (SURVEY.md §2.1)."""

import os

import numpy as np
import imageio.v2 as iio
import pytest

import jax.numpy as jnp

from regda_tpu.data_prep.tiling import (ISPRS_PALETTE_RGB, TilerConfig,
                                        convert_potsdam_scene,
                                        convert_vaihingen_scene,
                                        rgb_label_to_ids, tile_boxes)
from regda_tpu.data_prep.superpixels import (boundary_vis,
                                             enforce_connectivity,
                                             get_superpixels, lda_slic)
from regda_tpu.ops.slic import (edge_shrink, lsc, slic, superpixel_stats,
                                adjacency)


# ---------------------------------------------------------------------------
# tile grid
# ---------------------------------------------------------------------------

def test_tile_boxes_cover_and_snap():
    boxes = tile_boxes(1000, 700, 512)
    assert (boxes[:, 2] - boxes[:, 0] == 512).all()
    assert (boxes[:, 3] - boxes[:, 1] == 512).all()
    # full coverage of the raster
    cover = np.zeros((1000, 700), bool)
    for x0, y0, x1, y1 in boxes:
        cover[y0:y1, x0:x1] = True
    assert cover.all()
    # edge-snapped starts present
    assert 488 in boxes[:, 1] and 188 in boxes[:, 0]


def test_tile_boxes_exact_fit_single():
    boxes = tile_boxes(512, 512, 512)
    assert boxes.shape == (1, 4) and tuple(boxes[0]) == (0, 0, 512, 512)


# ---------------------------------------------------------------------------
# color -> id
# ---------------------------------------------------------------------------

def test_rgb_label_to_ids_palette_and_clutter_merge():
    # one pixel of each palette color + one unmatched color
    colors = np.concatenate([ISPRS_PALETTE_RGB, [[12, 34, 56]]], 0)
    img = colors.reshape(1, 8, 3).astype(np.uint8)
    ids = rgb_label_to_ids(img, unmatched=0)
    # clutter (6) merged to 0; unmatched -> 0
    np.testing.assert_array_equal(ids[0], [0, 1, 2, 3, 4, 5, 0, 0])
    ids5 = rgb_label_to_ids(img, unmatched=5)
    assert ids5[0, 7] == 5


# ---------------------------------------------------------------------------
# scene converters (synthetic rasters)
# ---------------------------------------------------------------------------

def _write_scene(tmp, name, shape=(600, 600), channels=4, label=False):
    path = os.path.join(tmp, name)
    if label:
        rng = np.random.RandomState(0)
        pal = ISPRS_PALETTE_RGB[rng.randint(0, 7, shape)]
        iio.imwrite(path, pal.astype(np.uint8))
    else:
        rng = np.random.RandomState(1)
        iio.imwrite(path, rng.randint(0, 255, shape + (channels,), np.uint8))
    return path


def test_convert_potsdam_scene(tmp_path):
    tmp = str(tmp_path)
    img = _write_scene(tmp, 'top_potsdam_2_10_RGBIR.tif')
    lab = _write_scene(tmp, 'top_potsdam_2_10_label.tif', channels=3, label=True)
    cfg = TilerConfig(out_dir=os.path.join(tmp, 'out'), clip_size=512)
    n_img = convert_potsdam_scene(img, cfg)
    n_lab = convert_potsdam_scene(lab, cfg)
    assert n_img == n_lab == 4        # 600x600, clip 512 -> 2x2 snapped grid
    tiles = sorted(os.listdir(os.path.join(tmp, 'out/img_dir/train')))
    assert tiles[0] == '2_10_0_0_512_512.png'
    t = iio.imread(os.path.join(tmp, 'out/img_dir/train', tiles[0]))
    # IRRG: channel 0 of the tile == channel 3 (IR) of the source
    src = iio.imread(img)
    np.testing.assert_array_equal(t[..., 0], src[:512, :512, 3])
    np.testing.assert_array_equal(t[..., 1], src[:512, :512, 0])
    lab_tile = iio.imread(os.path.join(tmp, 'out/ann_dir/train', tiles[0]))
    assert lab_tile.max() <= 5        # clutter merged


def test_convert_potsdam_dropped_scene(tmp_path):
    tmp = str(tmp_path)
    img = _write_scene(tmp, 'top_potsdam_4_12_RGBIR.tif')
    cfg = TilerConfig(out_dir=os.path.join(tmp, 'out'))
    assert convert_potsdam_scene(img, cfg) == 0   # 4_12 is dropped


def test_convert_vaihingen_scene(tmp_path):
    tmp = str(tmp_path)
    img = _write_scene(tmp, 'top_mosaic_09cm_area11.tif', channels=3)
    cfg = TilerConfig(out_dir=os.path.join(tmp, 'out'))
    n = convert_vaihingen_scene(img, cfg, is_label=False)
    assert n == 4
    tiles = sorted(os.listdir(os.path.join(tmp, 'out/img_dir/val')))
    assert tiles[0] == 'area11_0_0_512_512.png'
    # image channels pass through unchanged
    t = iio.imread(os.path.join(tmp, 'out/img_dir/val', tiles[0]))
    np.testing.assert_array_equal(t, iio.imread(img)[:512, :512])


# ---------------------------------------------------------------------------
# SLIC kernel
# ---------------------------------------------------------------------------

def _blocky_image(h=64, w=64, s=16):
    """Image of uniform color blocks aligned to the superpixel grid."""
    rng = np.random.RandomState(3)
    base = rng.rand(h // s, w // s, 3).astype(np.float32)
    return np.repeat(np.repeat(base, s, 0), s, 1)


def test_slic_recovers_blocky_segments():
    img = _blocky_image()
    labels = np.asarray(slic(jnp.asarray(img), region_size=16, iterations=5))
    assert labels.shape == (64, 64)
    assert labels.min() >= 0 and labels.max() < 16
    # uniform color blocks should be single-label (grid-aligned optimum)
    for i in range(4):
        for j in range(4):
            blk = labels[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16]
            assert len(np.unique(blk)) == 1


def test_slic_label_count_and_locality():
    rng = np.random.RandomState(4)
    img = rng.rand(64, 64, 3).astype(np.float32)
    labels = np.asarray(slic(jnp.asarray(img), region_size=16, iterations=5))
    # every pixel's label must come from its 3x3 grid neighborhood
    gy, gx = np.mgrid[0:64, 0:64] // 16
    ly, lx = labels // 4, labels % 4
    assert (np.abs(ly - gy) <= 1).all() and (np.abs(lx - gx) <= 1).all()


def test_lsc_recovers_blocky_segments():
    # the reference's actual algorithm (cv2.ximgproc LSC, superpixels.py:67)
    rng = np.random.RandomState(0)
    base = rng.rand(2, 2, 3).astype(np.float32)
    img = np.repeat(np.repeat(base, 16, 0), 16, 1)
    labels = np.asarray(lsc(jnp.asarray(img), region_size=16, iterations=5))
    assert labels.shape == (32, 32)
    for i in range(2):
        for j in range(2):
            blk = labels[i * 16:(i + 1) * 16, j * 16:(j + 1) * 16]
            assert len(np.unique(blk)) == 1


def test_lsc_locality_and_determinism():
    rng = np.random.RandomState(4)
    img = rng.rand(64, 64, 3).astype(np.float32)
    a = np.asarray(lsc(jnp.asarray(img), region_size=16, iterations=5))
    b = np.asarray(lsc(jnp.asarray(img), region_size=16, iterations=5))
    assert (a == b).all()
    gy, gx = np.mgrid[0:64, 0:64] // 16
    ly, lx = a // 4, a % 4
    assert (np.abs(ly - gy) <= 1).all() and (np.abs(lx - gx) <= 1).all()


def test_lsc_boundary_adherence():
    # a color edge offset from the seed grid: LSC must bend labels to it
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 11:] = 0.9                       # edge at x=11, grid seam at 16
    labels = np.asarray(lsc(jnp.asarray(img), region_size=16, iterations=8))
    left, right = labels[:, :11], labels[:, 11:]
    assert not (np.isin(left, np.unique(right))).any()


def test_enforce_connectivity_splits_and_absorbs():
    m = np.zeros((20, 20), np.int32)
    m[2:5, 2:5] = 7
    m[12:18, 12:18] = 7                     # disconnected same-id blob
    m[0, 19] = 3                            # 1-pixel component
    out = enforce_connectivity(m, min_size=4)
    assert out[3, 3] != out[14, 14]         # split
    assert out[0, 19] in (out[0, 18], out[1, 19])   # absorbed
    # every surviving component >= min_size
    sizes = np.bincount(out.reshape(-1))
    assert (sizes[sizes > 0] >= 4).all()
    # dense relabel from 0
    assert sorted(np.unique(out)) == list(range(out.max() + 1))


def test_enforce_connectivity_mutual_small_pair():
    # two adjacent small components that can only absorb each other: the
    # 2-cycle must collapse (min id wins) and the merged comp survives
    m = np.zeros((8, 8), np.int32)
    m[0, 0:2] = 1
    m[0, 2:4] = 2
    out = enforce_connectivity(m, min_size=4)
    assert out[0, 0] == out[0, 3]


def test_edge_shrink_marks_boundaries():
    labels = np.zeros((16, 16), np.int32)
    labels[:, 8:] = 1
    out = np.asarray(edge_shrink(jnp.asarray(labels), win_size=2, fill=99))
    assert (out[:, 6:10] == 99).all()          # band around the boundary
    assert (out[:, :6] == 0).all() and (out[:, 10:] == 1).all()


def test_superpixel_stats_and_adjacency():
    labels = jnp.asarray(np.array([[0, 0], [1, 1]]))
    feats = jnp.asarray(np.array([[[1., 1.], [3., 3.]],
                                  [[5., 5.], [7., 7.]]]))
    s, cnts = superpixel_stats(labels, feats, n_segments=3)
    np.testing.assert_allclose(np.asarray(s[0]), [2., 2.])
    np.testing.assert_allclose(np.asarray(s[1]), [6., 6.])
    np.testing.assert_allclose(np.asarray(cnts), [2., 2., 0.])
    a = np.asarray(adjacency(s, sigma=10.0))
    assert a.shape == (3, 3) and np.allclose(np.diag(a), 1.0)


def test_get_superpixels_driver(tmp_path):
    d = str(tmp_path / 'img')
    os.makedirs(d)
    iio.imwrite(os.path.join(d, 't.png'),
                (_blocky_image(32, 32, 16) * 255).astype(np.uint8))
    out = str(tmp_path / 'sup_dir')
    n = get_superpixels(d, out, region_size=16, iterations=3)
    assert n == 1
    labels = iio.imread(os.path.join(out, 't.tif'))
    assert labels.shape == (32, 32) and labels.dtype == np.int32
    assert os.path.exists(os.path.join(out + '_vis', 't.png'))
    shrunk = iio.imread(os.path.join(out + '_shrink', 't.tif'))
    assert shrunk.max() <= 4                   # fill id = n_sup = 4


def test_lda_slic():
    rng = np.random.RandomState(5)
    img = rng.rand(32, 32, 3).astype(np.float32)
    labels = (img[..., 0] > 0.5).astype(np.int64)
    out = lda_slic(img, labels, n_components=2, region_size=16, iterations=2)
    assert out.shape == (32, 32) and out.max() < 4
