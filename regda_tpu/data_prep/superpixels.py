"""Superpixel region-map generation for training tiles (legacy alternative
to SAM everything-mode regions).

Parity targets: regda/gast/superpixels.py:86-126 (`get_superpixels` driver:
per-tile label .tif + boundary visualization + edge-shrunk variant) and
regda/gast/slic/superpixel.py:160-207 (`LDA_SLIC`: LDA-project features
using labels, then superpixel the projection).

The segmentation itself is a JAX kernel (regda_tpu/ops/slic.py: `lsc` —
the reference's actual algorithm — or `slic`) run on the accelerator; this
module is the host-side IO driver plus the connectivity enforcement the
OpenCV pipeline applies (`enforceLabelConnectivity`).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import imageio.v2 as iio

import jax.numpy as jnp

from regda_tpu.ops.slic import slic, lsc, edge_shrink


def enforce_connectivity(labels: np.ndarray, min_size: int = 25) -> np.ndarray:
    """Relabel connected components; absorb components smaller than
    `min_size` into an adjacent component.

    Host-side analog of OpenCV's `enforceLabelConnectivity(min_element_size)`
    (reference: regda/gast/slic/superpixel.py:27; LSC's own `iterate` also
    runs one internally). One raster scan builds 4-connected components via
    union-find; a second pass unions any component below `min_size` into the
    last different-labelled neighbor seen, exactly once (OpenCV's absorb
    rule). Returns int32 labels renumbered densely from 0.
    """
    h, w = labels.shape
    n = h * w
    lab = np.ascontiguousarray(labels)

    # Connected components by min-index propagation + pointer jumping:
    # at the fixpoint every pixel holds the smallest flat index in its
    # 4-connected same-label component (converges in O(log diameter)
    # vectorized sweeps).
    comp = np.arange(n, dtype=np.int64).reshape(h, w)
    same_v = lab[1:, :] == lab[:-1, :]
    same_h = lab[:, 1:] == lab[:, :-1]
    while True:
        m = comp.copy()
        np.minimum(m[1:, :], np.where(same_v, comp[:-1, :], n), out=m[1:, :])
        np.minimum(m[:-1, :], np.where(same_v, comp[1:, :], n), out=m[:-1, :])
        np.minimum(m[:, 1:], np.where(same_h, comp[:, :-1], n), out=m[:, 1:])
        np.minimum(m[:, :-1], np.where(same_h, comp[:, 1:], n), out=m[:, :-1])
        m = np.minimum(m, comp.reshape(-1)[m])          # pointer jump
        if np.array_equal(m, comp):
            break
        comp = m

    # Densify component ids. Roots are each component's min flat index, so
    # sorted roots == scan order of the components' first pixels — the
    # order OpenCV's enforceLabelConnectivity visits them in.
    roots, dense = np.unique(comp, return_inverse=True)
    dense = dense.reshape(h, w)
    ncomp = len(roots)
    sizes = np.bincount(dense.reshape(-1), minlength=ncomp).astype(np.int64)

    # component adjacency (deduped boundary pairs, both directions)
    va, vb = dense[1:, :].reshape(-1), dense[:-1, :].reshape(-1)
    ha, hb = dense[:, 1:].reshape(-1), dense[:, :-1].reshape(-1)
    a = np.concatenate([va, vb, ha, hb])
    b = np.concatenate([vb, va, hb, ha])
    diff = a != b
    pair = np.unique(a[diff] * ncomp + b[diff])
    ea, eb = pair // ncomp, pair % ncomp
    nbrs: list[list[int]] = [[] for _ in range(ncomp)]
    for x, y in zip(ea.tolist(), eb.tolist()):
        nbrs[x].append(y)

    # progressive absorb: visit components in scan order; a component still
    # below min_size merges into an adjacent component, preferring the
    # earliest neighbor whose blob is itself still below min_size (falling
    # back to the earliest big one). Sizes accumulate, so on realistic LSC
    # output an isolated fragment joins its big neighbor exactly like
    # OpenCV's absorb, while degenerate all-tiny inputs coalesce into
    # ~min_size blobs instead of chaining into one giant label.
    parent = np.arange(ncomp, dtype=np.int64)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    # Repeat to a fixpoint: a union formed late in a pass may still be
    # below min_size with no later member left to re-trigger its merge.
    changed = True
    while changed:
        changed = False
        for c in range(ncomp):
            rc = find(c)
            if sizes[rc] >= min_size:
                continue
            target = -1
            for nb in nbrs[c]:
                rn = find(nb)
                if rn == rc:
                    continue
                if target < 0:
                    target = rn
                if sizes[rn] < min_size:
                    target = rn
                    break
            if target >= 0:
                parent[rc] = target
                sizes[target] += sizes[rc]
                changed = True

    merged = np.array([find(i) for i in range(ncomp)], dtype=np.int64)
    _, out = np.unique(merged[dense], return_inverse=True)
    return out.reshape(h, w).astype(np.int32)


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
                    win_size: int = 3, method: str = 'lsc',
                    ratio: float = 0.075, min_element_size: int = 25) -> int:
    """Per-tile superpixel label maps -> `{out_dir}/*.tif` (+ `_vis`,
    `_shrink`, `_shrink_vis` siblings when enabled), mirroring the
    reference's output tree (superpixels.py:86-126).

    `method='lsc'` (default) runs the same algorithm family the reference
    driver uses (`SuperPixelsLSC`, superpixels.py:106: region_size=16,
    ratio=0.075) via the jit LSC kernel plus host connectivity enforcement;
    `method='slic'` selects the SLIC kernel with `compactness`.
    """
    img_paths = sorted(glob.glob(os.path.join(dir_path, f'*.{postfix}')))
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(out_dir + '_vis', exist_ok=True)
    if shrinking:
        os.makedirs(out_dir + '_shrink', exist_ok=True)
        os.makedirs(out_dir + '_shrink_vis', exist_ok=True)

    for img_path in img_paths:
        img = iio.imread(img_path)[..., :3]
        if method == 'lsc':
            labels = np.asarray(lsc(jnp.asarray(img, jnp.float32) / 255.0,
                                    region_size=region_size, ratio=ratio,
                                    iterations=iterations))
            labels = enforce_connectivity(labels, min_element_size)
        else:
            labels = np.asarray(slic(jnp.asarray(img, jnp.float32) / 255.0,
                                     region_size=region_size,
                                     compactness=compactness,
                                     iterations=iterations))
        name = os.path.basename(img_path).replace(f'.{postfix}', '.tif')
        iio.imwrite(os.path.join(out_dir, name), labels.astype(np.int32))
        iio.imwrite(os.path.join(out_dir + '_vis', os.path.basename(img_path)),
                    boundary_vis(img, labels))
        if shrinking:
            # reference fill value is the superpixel count (cnt_sup):
            # grid count for SLIC, actual post-connectivity count for LSC
            n_sup = (int(labels.max()) + 1 if method == 'lsc' else
                     (img.shape[0] // region_size)
                     * (img.shape[1] // region_size))
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
