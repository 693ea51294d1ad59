"""ISPRS Potsdam/Vaihingen orthophoto tilers.

Parity targets: convert_datasets/convert_potsdam.py:35-178 (IRRG channel
select [1,0,3]), convert_potsdam_rgb.py:46 ([2,1,0]), and
convert_vaihingen.py:34-201. Behavioral quirks reproduced exactly:

  * The tile grid is NON-overlapping clip_size boxes on a (rows+1, cols+1)
    lattice whose out-of-range boxes snap back to the image edge, so edge
    tiles duplicate interior pixels and identical snapped boxes overwrite
    the same filename (convert_potsdam.py:62-77).
  * Potsdam label color->id uses the base-(2,3,4) dot-product trick over the
    palette; unmatched pixels fall to 0. Vaihingen's unmatched pixels fall
    to 5 (convert_vaihingen.py:84-88). Clutter (6) merges into 0 for both.
  * Potsdam scenes 6_7 and 4_12 are dropped (convert_potsdam.py:154-156);
    fixed train/val/test scene splits (:111-124, convert_vaihingen.py:102-114).
  * Output names: Potsdam `{i}_{j}_{x0}_{y0}_{x1}_{y1}.png`, Vaihingen
    `{area}_{x0}_{y0}_{x1}_{y1}.png`.

Implementation differences (deliberate): plain imageio instead of
mmcv/skimage; all color math is in natural RGB channel order (the
reference's BGR palettes are an artifact of cv2 reading); tiles are emitted
via a vectorized strided reshape instead of a Python box loop where the
grid is uniform.
"""

from __future__ import annotations

import glob
import math
import os
import tempfile
import zipfile
from dataclasses import dataclass

import numpy as np
import imageio.v2 as iio

# ISPRS semantic palette in RGB; index = class id after conversion.
# (ignore/clutter, impervious surface, building, low vegetation, tree, car)
ISPRS_PALETTE_RGB = np.array([
    [0, 0, 0],          # 0 ignore / background
    [255, 255, 255],    # 1 impervious surface
    [0, 0, 255],        # 2 building
    [0, 255, 255],      # 3 low vegetation
    [0, 255, 0],        # 4 tree
    [255, 255, 0],      # 5 car
    [255, 0, 0],        # 6 clutter -> merged into 0
], np.int64)

POTSDAM_SPLITS = {
    'train': ['2_10', '3_10', '3_11', '3_12', '4_11', '4_12', '5_10', '5_12',
              '6_10', '6_11', '6_12', '6_8', '6_9', '7_11', '7_12', '7_7', '7_9'],
    'val': ['2_11', '2_12', '4_10', '5_11', '6_7', '7_10', '7_8'],
    'test': ['5_15', '6_15', '6_13', '3_13', '4_14', '6_14', '5_14', '2_13',
             '4_15', '2_14', '5_13', '4_13', '3_14', '7_13'],
}
POTSDAM_DROPPED = ('6_7', '4_12')   # convert_potsdam.py:154-156

VAIHINGEN_SPLITS = {
    'train': ['area1', 'area13', 'area17', 'area21', 'area23', 'area26',
              'area3', 'area32', 'area37', 'area5', 'area7'],
    'val': ['area11', 'area15', 'area28', 'area30', 'area34'],
    'test': ['area6', 'area24', 'area35', 'area16', 'area14', 'area22',
             'area10', 'area4', 'area2', 'area20', 'area8', 'area31',
             'area33', 'area27', 'area38', 'area12', 'area29'],
}


def tile_boxes(h: int, w: int, clip: int) -> np.ndarray:
    """Edge-snapped non-overlapping boxes, (N, 4) [x0, y0, x1, y1].

    Reproduces the (rows+1, cols+1) lattice with edge snap-back of
    convert_potsdam.py:54-77; duplicate snapped boxes are deduped (the
    reference overwrites the same file instead).
    """
    rows = max(math.ceil((h - clip) / clip) + 1, 1) + 1
    cols = max(math.ceil((w - clip) / clip) + 1, 1) + 1
    xs, ys = np.meshgrid(np.arange(cols) * clip, np.arange(rows) * clip)
    x0 = xs.ravel()
    y0 = ys.ravel()
    x0 = np.where(x0 + clip > w, w - clip, x0)
    y0 = np.where(y0 + clip > h, h - clip, y0)
    boxes = np.stack([x0, y0, np.minimum(x0 + clip, w),
                      np.minimum(y0 + clip, h)], axis=1)
    return np.unique(boxes, axis=0)


def rgb_label_to_ids(label_rgb: np.ndarray, unmatched: int = 0) -> np.ndarray:
    """Palette RGB label raster -> uint8 class ids; clutter merged into 0.

    The (2,3,4) base-encoding gives each palette color a unique scalar key
    so the mapping is one dot product + table lookup (no per-class loop).
    """
    basis = np.array([2, 3, 4], np.int64)
    keys = label_rgb.astype(np.int64) @ basis                  # (H, W)
    out = np.full(keys.shape, unmatched, np.uint8)
    for idx, color in enumerate(ISPRS_PALETTE_RGB):
        out[keys == color @ basis] = idx
    out[out == 6] = 0                                          # merge clutter
    return out


def emit_tiles(raster: np.ndarray, clip: int, name_fn, save_dir: str,
               is_label: bool) -> int:
    os.makedirs(save_dir, exist_ok=True)
    n = 0
    for x0, y0, x1, y1 in tile_boxes(*raster.shape[:2], clip):
        tile = raster[y0:y1, x0:x1]
        iio.imwrite(os.path.join(save_dir, name_fn(x0, y0, x1, y1)),
                    tile.astype(np.uint8))
        n += 1
    return n


@dataclass
class TilerConfig:
    out_dir: str
    clip_size: int = 512
    rgb: bool = False       # Potsdam only: RGB channel select instead of IRRG


def _split_of(key: str, splits: dict) -> str:
    if key in splits['train']:
        return 'train'
    if key in splits['val']:
        return 'val'
    return 'test'


def convert_potsdam_scene(img_path: str, cfg: TilerConfig) -> int:
    """One Potsdam .tif (RGBIR image or RGB label)."""
    base = os.path.basename(img_path)
    idx_i, idx_j = base.split('_')[2:4]
    key = f'{idx_i}_{idx_j}'
    if key in POTSDAM_DROPPED:
        return 0
    split = _split_of(key, POTSDAM_SPLITS)
    name_fn = lambda x0, y0, x1, y1: f'{idx_i}_{idx_j}_{x0}_{y0}_{x1}_{y1}.png'
    if 'label' in base:
        ids = rgb_label_to_ids(iio.imread(img_path)[..., :3], unmatched=0)
        return emit_tiles(ids, cfg.clip_size,
                          name_fn, os.path.join(cfg.out_dir, 'ann_dir', split),
                          is_label=True)
    channels = [0, 1, 2] if cfg.rgb else [3, 0, 1]   # IRRG: IR-Red-Green
    img = iio.imread(img_path)[..., channels]
    return emit_tiles(img, cfg.clip_size, name_fn,
                      os.path.join(cfg.out_dir, 'img_dir', split),
                      is_label=False)


def convert_vaihingen_scene(img_path: str, cfg: TilerConfig,
                            is_label: bool) -> int:
    base = os.path.basename(img_path)
    area = base.split('_')[3].split('.')[0]           # top_mosaic_09cm_areaN
    split = _split_of(area, VAIHINGEN_SPLITS)
    name_fn = lambda x0, y0, x1, y1: f'{area}_{x0}_{y0}_{x1}_{y1}.png'
    if is_label:
        ids = rgb_label_to_ids(iio.imread(img_path)[..., :3], unmatched=5)
        return emit_tiles(ids, cfg.clip_size, name_fn,
                          os.path.join(cfg.out_dir, 'ann_dir', split), True)
    img = iio.imread(img_path)[..., :3]               # already IRRG on disk
    return emit_tiles(img, cfg.clip_size, name_fn,
                      os.path.join(cfg.out_dir, 'img_dir', split), False)


def iter_source_rasters(dataset_path: str, pattern: str = '*.tif'):
    """Yield raster paths from a directory of .tifs and/or .zips of .tifs."""
    for p in sorted(glob.glob(os.path.join(dataset_path, pattern))):
        yield p
    for z in sorted(glob.glob(os.path.join(dataset_path, '*.zip')),
                    reverse=True):
        with tempfile.TemporaryDirectory() as tmp:
            with zipfile.ZipFile(z) as zf:
                zf.extractall(tmp)
            found = glob.glob(os.path.join(tmp, pattern))
            if not found:
                sub = os.path.join(tmp, sorted(os.listdir(tmp))[0])
                found = glob.glob(os.path.join(sub, pattern))
            for p in sorted(found):
                yield p
