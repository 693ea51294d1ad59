"""Superpixel region-map generation for training tiles (legacy alternative
to SAM everything-mode regions).

Parity targets: regda/gast/superpixels.py:86-126 (`get_superpixels` driver:
per-tile label .tif + boundary visualization + edge-shrunk variant) and
regda/gast/slic/superpixel.py:160-207 (`LDA_SLIC`: LDA-project features
using labels, then superpixel the projection).

The segmentation itself is the JAX SLIC kernel (regda_tpu/ops/slic.py) run
batched on the accelerator; this module is the host-side IO driver.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import imageio.v2 as iio

import jax.numpy as jnp

from regda_tpu.ops.slic import slic, edge_shrink


def boundary_vis(image: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Paint superpixel boundaries green, like the reference's contour-mask
    overlay (superpixels.py:73-81)."""
    edge = np.zeros(labels.shape, bool)
    edge[:, 1:] |= labels[:, 1:] != labels[:, :-1]
    edge[1:, :] |= labels[1:, :] != labels[:-1, :]
    out = image.copy()
    out[edge] = (0, 255, 0)
    return out


def get_superpixels(dir_path: str, out_dir: str, postfix: str = 'png',
                    region_size: int = 16, compactness: float = 10.0,
                    iterations: int = 10, shrinking: bool = True,
                    win_size: int = 3) -> int:
    """Per-tile SLIC label maps -> `{out_dir}/*.tif` (+ `_vis`, `_shrink`,
    `_shrink_vis` siblings when enabled), mirroring the reference's output
    tree (superpixels.py:86-126)."""
    img_paths = sorted(glob.glob(os.path.join(dir_path, f'*.{postfix}')))
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(out_dir + '_vis', exist_ok=True)
    if shrinking:
        os.makedirs(out_dir + '_shrink', exist_ok=True)
        os.makedirs(out_dir + '_shrink_vis', exist_ok=True)

    for img_path in img_paths:
        img = iio.imread(img_path)[..., :3]
        labels = np.asarray(slic(jnp.asarray(img, jnp.float32) / 255.0,
                                 region_size=region_size,
                                 compactness=compactness,
                                 iterations=iterations))
        name = os.path.basename(img_path).replace(f'.{postfix}', '.tif')
        iio.imwrite(os.path.join(out_dir, name), labels.astype(np.int32))
        iio.imwrite(os.path.join(out_dir + '_vis', os.path.basename(img_path)),
                    boundary_vis(img, labels))
        if shrinking:
            n_sup = (img.shape[0] // region_size) * (img.shape[1] // region_size)
            shrunk = np.asarray(edge_shrink(jnp.asarray(labels),
                                            win_size=win_size, fill=n_sup))
            iio.imwrite(os.path.join(out_dir + '_shrink', name),
                        shrunk.astype(np.int32))
            iio.imwrite(os.path.join(out_dir + '_shrink_vis',
                                     os.path.basename(img_path)),
                        boundary_vis(img, shrunk))
    return len(img_paths)


def lda_project(data: np.ndarray, labels: np.ndarray,
                n_components: int) -> np.ndarray:
    """Fisher LDA projection (closed form), replacing the reference's
    sklearn LinearDiscriminantAnalysis (slic/superpixel.py:171-183; sklearn
    is not available in this image).

    Args:
      data: (N, D) pixel features. labels: (N,) int ids (< 0 ignored).
    Returns: (N, n_components) projected features, min-max scaled to [0, 1]
    like the reference's preprocessing.minmax_scale.
    """
    valid = labels >= 0
    x, y = data[valid].astype(np.float64), labels[valid]
    classes = np.unique(y)
    mean = x.mean(0)
    d = x.shape[1]
    sw = np.zeros((d, d))
    sb = np.zeros((d, d))
    for c in classes:
        xc = x[y == c]
        mc = xc.mean(0)
        sw += (xc - mc).T @ (xc - mc)
        diff = (mc - mean)[:, None]
        sb += len(xc) * (diff @ diff.T)
    evals, evecs = np.linalg.eig(np.linalg.pinv(sw) @ sb)
    order = np.argsort(-evals.real)
    w = evecs[:, order[:n_components]].real              # (D, k)
    proj = data.astype(np.float64) @ w
    lo, hi = proj.min(0), proj.max(0)
    return ((proj - lo) / np.maximum(hi - lo, 1e-12)).astype(np.float32)


def lda_slic(image: np.ndarray, labels: np.ndarray, n_components: int = 3,
             region_size: int = 16, compactness: float = 10.0,
             iterations: int = 10) -> np.ndarray:
    """LDA_SLIC.simple_superpixel equivalent (slic/superpixel.py:194-198):
    project pixels with LDA supervised by (pseudo-)labels, then SLIC the
    projection. Image (H, W, D) float, labels (H, W) int."""
    h, w = labels.shape
    proj = lda_project(image.reshape(h * w, -1), labels.reshape(-1),
                       n_components).reshape(h, w, n_components)
    if n_components < 3:   # slic kernel expects 3 channels; pad by repeat
        proj = np.concatenate([proj] * 3, axis=-1)[..., :3]
    return np.asarray(slic(jnp.asarray(proj), region_size=region_size,
                           compactness=compactness, iterations=iterations))
