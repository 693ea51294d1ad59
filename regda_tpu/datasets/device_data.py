"""Device-resident dataset cache + on-device augmentation.

TPU-native replacement for the per-step host->device batch upload. The
reference re-uploads every batch (`.cuda()` in the hot loop,
tools/train_src.py:113-115; SURVEY.md §3.1 "host->device boundary") — on
this machine's tunneled TPU backend that is doubly fatal: the link is slow
AND the plugin pins every transferred host buffer (measured ~56 MB of host
RSS leaked per 58 MB step; see FULLRUN.md).

Here the whole split is uploaded ONCE as compact integers (uint8 images,
int8 id-labels, int16 region maps, bf16 prob-labels) and every batch is
assembled *on device* inside one jitted function: index gather -> random
crop -> flip/rot90 -> normalize. Per-step host->device traffic drops to a
handful of bytes (batch indices + an RNG counter), and augmentation rides
the VPU instead of host numpy.

Randomness is jax.random (counter-folded), so the decision *stream* differs
from the host DALoader's numpy stream, but each decision's distribution
matches the host stacks exactly (configs/_base.py:15-40):

  - train stack:  RandomCrop(c); OneOf([hflip, vflip, rot90 k~U{0..3}],
                  p=0.75); Normalize            (albumentations semantics,
                  reference configs/ToVaihingen.py:44-55)
  - prob stack:   RandomCrop(c); hflip(.5); vflip(.5); rot90(k=1, .5);
                  Normalize(clamp)              (reference
                  regda/aug/augmentation.py:150-157)
  - eval stack:   Normalize only

The geometric ops themselves are bit-identical to the host implementations
(tests/test_device_data.py checks each against regda_tpu.aug with forced
decisions).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import numpy as np

from regda_tpu.aug.augmentation import (Compose, Normalize, OneOf,
                                        RandomCrop, RandomHorizontalFlip,
                                        RandomRotate90, RandomVerticalFlip)
from regda_tpu.datasets.basedata import TileDataset, read_image


def device_data_enabled(config: dict) -> bool:
    """Device-resident data is the default on TPU (where per-batch upload
    is the bottleneck), opt-in elsewhere; REGDA_DEVICE_DATA=0/1 overrides,
    then config['device_data']."""
    env = os.environ.get('REGDA_DEVICE_DATA')
    if env is not None:
        return env not in ('0', 'false', 'False')
    if 'device_data' in config:
        return bool(config['device_data'])
    import jax
    return jax.default_backend() == 'tpu'


# --------------------------------------------------------------- aug parsing

def parse_aug_spec(transforms) -> Optional[dict]:
    """Recognize the three shipped stacks; None -> not device-expressible
    (caller falls back to the host DALoader)."""
    if transforms is None:
        return dict(kind='none', crop=None, mean=None, std=None, clamp=False)
    if not isinstance(transforms, Compose):
        return None
    ts = list(transforms.transforms)
    spec = dict(kind='none', crop=None, mean=None, std=None, clamp=False)
    if ts and isinstance(ts[0], RandomCrop):
        th, tw = ts[0].size
        if th != tw:
            return None
        spec['crop'] = th
        ts = ts[1:]
    if not ts or not isinstance(ts[-1], Normalize):
        return None
    norm = ts[-1]
    spec['mean'] = np.asarray(norm.mean, np.float32)
    spec['std'] = np.asarray(norm.std, np.float32)
    spec['clamp'] = bool(norm.clamp)
    ts = ts[:-1]
    if not ts:
        return spec
    if (len(ts) == 1 and isinstance(ts[0], OneOf)
            and len(ts[0].transforms) == 3
            and isinstance(ts[0].transforms[0], RandomHorizontalFlip)
            and isinstance(ts[0].transforms[1], RandomVerticalFlip)
            and isinstance(ts[0].transforms[2], RandomRotate90)
            and ts[0].transforms[2].fixed_k is None
            # _draw_ops applies the chosen transform unconditionally, which
            # matches the host path only when every inner prob is 1
            # (always=True, as the shipped configs build them); anything
            # else must fall back to the host loader.
            and all(t.prob == 1.0 for t in ts[0].transforms)):
        spec.update(kind='oneof', p=float(ts[0].p))
        return spec
    if (len(ts) == 3 and isinstance(ts[0], RandomHorizontalFlip)
            and isinstance(ts[1], RandomVerticalFlip)
            and isinstance(ts[2], RandomRotate90)
            and ts[2].fixed_k == 1):
        spec.update(kind='indep', hflip_p=float(ts[0].prob),
                    vflip_p=float(ts[1].prob), rot_p=float(ts[2].prob))
        return spec
    return None


# ---------------------------------------------------------------- device ops

def _geo_switch(x, op):
    """op: 0 identity, 1 hflip (W), 2 vflip (H), 3+k rot90(k) for k in 0..3.
    x is (H, W) or (H, W, C) with H == W (post-crop)."""
    import jax
    import jax.numpy as jnp
    branches = [
        lambda a: a,
        lambda a: a[:, ::-1],
        lambda a: a[::-1],
        lambda a: a,
        lambda a: jnp.rot90(a, 1, axes=(0, 1)),
        lambda a: jnp.rot90(a, 2, axes=(0, 1)),
        lambda a: jnp.rot90(a, 3, axes=(0, 1)),
    ]
    return jax.lax.switch(op, branches, x)


def _draw_ops(spec: dict, key, batch: int):
    """Per-sample geometric op codes for _geo_switch, mirroring the host
    stacks' decision distributions."""
    import jax
    import jax.numpy as jnp
    kind = spec['kind']
    if kind == 'oneof':
        ku, kt, kk = jax.random.split(key, 3)
        u = jax.random.uniform(ku, (batch,))
        t = jax.random.randint(kt, (batch,), 0, 3)
        k4 = jax.random.randint(kk, (batch,), 0, 4)
        # t: 0 hflip -> op 1, 1 vflip -> op 2, 2 rot90(k~U{0..3}) -> 3+k
        op = jnp.where(t == 2, 3 + k4, 1 + t)
        return jnp.where(u < spec['p'], op, 0)
    if kind == 'indep':
        kh, kv, kr = jax.random.split(key, 3)
        h = jax.random.uniform(kh, (batch,)) < spec['hflip_p']
        v = jax.random.uniform(kv, (batch,)) < spec['vflip_p']
        r = jax.random.uniform(kr, (batch,)) < spec['rot_p']
        return jnp.stack([h, v, r], axis=-1)
    return None


def _apply_indep(x, hvr):
    import jax.numpy as jnp
    x = jnp.where(hvr[0], x[:, ::-1], x)
    x = jnp.where(hvr[1], x[::-1], x)
    return jnp.where(hvr[2], jnp.rot90(x, 1, axes=(0, 1)), x)


def make_batch_fn(spec: dict, tile_hw: tuple, has_cls: bool,
                  prob_label: bool, has_sup: bool):
    """Build the jitted (cache arrays, idx, key) -> batch sampler."""
    import jax
    import jax.numpy as jnp

    crop = spec['crop']
    h, w = tile_hw
    kind = spec['kind']
    mean = spec['mean']
    std = spec['std']

    def fn(images, cls, sup, idx, key):
        b = idx.shape[0]
        imgs = images[idx]
        cl = cls[idx] if has_cls else None
        sp = sup[idx] if has_sup else None

        kc, ko = jax.random.split(key)
        if crop is not None and (crop < h or crop < w):
            kyx = jax.random.split(kc, b)

            def crop_one(img, c, s, k):
                ky, kx = jax.random.split(k)
                y = jax.random.randint(ky, (), 0, h - crop + 1)
                x = jax.random.randint(kx, (), 0, w - crop + 1)
                img = jax.lax.dynamic_slice(img, (y, x, 0), (crop, crop, 3))
                if c is not None:
                    c = (jax.lax.dynamic_slice(c, (y, x, 0),
                                               (crop, crop, c.shape[-1]))
                         if c.ndim == 3 else
                         jax.lax.dynamic_slice(c, (y, x), (crop, crop)))
                if s is not None:
                    s = jax.lax.dynamic_slice(s, (y, x), (crop, crop))
                return img, c, s

            imgs, cl, sp = jax.vmap(
                lambda i, c, s, k: crop_one(i, c, s, k),
                in_axes=(0, 0 if has_cls else None,
                         0 if has_sup else None, 0)
            )(imgs, cl, sp, kyx)

        if kind in ('oneof', 'indep'):
            ops = _draw_ops(spec, ko, b)
            geo = _apply_indep if kind == 'indep' else _geo_switch
            imgs = jax.vmap(geo)(imgs, ops)
            if has_cls:
                cl = jax.vmap(geo)(cl, ops)
            if has_sup:
                sp = jax.vmap(geo)(sp, ops)

        x = imgs.astype(jnp.float32)
        if mean is not None:
            x = (x - mean) / std
            if spec['clamp']:
                x = jnp.minimum(x, 1.0)
        out = {'image': x}
        if has_cls:
            out['cls'] = (cl.astype(jnp.float32) if prob_label
                          else cl.astype(jnp.int32))
        if has_sup:
            out['sup'] = sp.astype(jnp.int32)
        return out

    return jax.jit(fn)


# -------------------------------------------------------------------- loader

class DeviceCacheTooLarge(Exception):
    pass


class DeviceLoader:
    """Drop-in for DALoader on training splits: same iteration protocol
    (per-epoch shuffle, drop_last, CV subsets — regda/datasets/daLoader.py
    semantics), but batches are device arrays assembled on-chip."""

    def __init__(self, config: dict, dataset_name: str, seed: int = 2333,
                 budget_bytes: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        self.dataset = TileDataset(
            dataset_name,
            image_dir=config['image_dir'],
            mask_dir=config.get('mask_dir'),
            transforms=None,
            label_type=config.get('label_type', 'id'),
            read_sup=config.get('read_sup', False),
        )
        spec = parse_aug_spec(config.get('transforms'))
        if spec is None:
            raise ValueError('transforms not device-expressible')
        self.spec = spec
        self.batch_size = config.get('batch_size', 1)
        self.training = config.get('training', False)
        self.drop_last = True if self.training else False
        self.seed = seed
        self._epoch = 0
        from regda_tpu.datasets.loader import DALoader
        self._cv_subset = DALoader.compute_cv_subset(
            len(self.dataset), config.get('CV'), self.training, seed)

        meta = self.dataset.meta
        prob = self.dataset.label_type == 'prob'
        n = len(self.dataset)
        imgs, clss, sups, fnames = [], [], [], []
        for i in range(n):
            s = self.dataset.read_raw(i)
            fnames.append(s['fname'])
            imgs.append(s['image'])
            if 'cls' in s:
                clss.append(s['cls'].astype(np.float16) if prob
                            else s['cls'].astype(np.int8))
            if 'sup' in s:
                sup = s['sup']
                assert sup.max() < 32767, 'region id exceeds int16 cache'
                sups.append(sup.astype(np.int16))
        imgs = np.stack(imgs)
        assert imgs.dtype == np.uint8, imgs.dtype
        self.fnames = fnames
        self.tile_hw = imgs.shape[1:3]
        if spec['crop'] is not None and (spec['crop'] > self.tile_hw[0]
                                         or spec['crop'] > self.tile_hw[1]):
            # the host RandomCrop raises on this config (negative randint
            # bound); surface the misconfiguration instead of silently
            # training uncropped at the cached tile size
            raise ValueError(
                f"crop {spec['crop']} exceeds cached tile {self.tile_hw}")

        budget = budget_bytes if budget_bytes is not None else int(
            os.environ.get('REGDA_DEVICE_DATA_BUDGET', 8 << 30))
        total = imgs.nbytes + sum(a.nbytes for a in clss) \
            + sum(a.nbytes for a in sups)
        if total > budget:
            raise DeviceCacheTooLarge(f'{total} > {budget} bytes')

        self._images = jax.device_put(imgs)
        self._cls = (jax.device_put(
            np.stack(clss).astype(np.float16)).astype(jnp.bfloat16)
            if prob and clss else
            jax.device_put(np.stack(clss)) if clss else None)
        self._sup = jax.device_put(np.stack(sups)) if sups else None
        self._fn = make_batch_fn(spec, self.tile_hw,
                                 has_cls=self._cls is not None,
                                 prob_label=prob,
                                 has_sup=self._sup is not None)
        self._key = jax.random.PRNGKey(seed)
        self._counter = 0
        self._meta = meta

    # -- DALoader-compatible sizing/iteration ------------------------------
    def _base_indices(self) -> np.ndarray:
        if self._cv_subset is not None:
            return self._cv_subset.copy()
        return np.arange(len(self.dataset))

    def __len__(self):
        n = len(self._base_indices())
        return (n // self.batch_size if self.drop_last
                else -(-n // self.batch_size))

    def _epoch_indices(self) -> np.ndarray:
        idx = self._base_indices()
        if self.training:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        self._epoch += 1
        return idx

    def sample(self, idx: np.ndarray) -> dict:
        import jax
        self._counter += 1
        key = jax.random.fold_in(self._key, self._counter)
        out = dict(self._fn(self._images, self._cls, self._sup,
                            np.asarray(idx, np.int32), key))
        out['fname'] = [self.fnames[int(i)] for i in idx]
        return out

    def __iter__(self):
        idx = self._epoch_indices()
        for b in range(len(self)):
            lo = b * self.batch_size
            yield self.sample(idx[lo:lo + self.batch_size])


# --------------------------------------------------------------- eval cache

_EVAL_CACHE: dict = {}


class DeviceEvalSet:
    """Sequential batch-1 eval split resident on device as uint8; each tile
    is normalized on-chip. Labels stay host-side numpy (the confusion-matrix
    metric is a host op) and are read from disk once, then served from a
    host cache across evals. Cached per directory set so repeated evals
    during training upload the split exactly once (entries live for the
    process — a stage tool touches at most its val + test splits).

    Honors the same CV fold selection as DALoader (folds[i] when
    CV=dict(k, i>=0) — regda/datasets/daLoader.py semantics) and the same
    REGDA_DEVICE_DATA_BUDGET HBM cap as DeviceLoader; over-budget splits
    raise DeviceCacheTooLarge so the caller can fall back to the host
    loader instead of dying in the backend allocator."""

    def __init__(self, config: dict, dataset_name: str, seed: int = 2333):
        import jax
        import jax.numpy as jnp

        ds = TileDataset(dataset_name,
                         image_dir=config['image_dir'],
                         mask_dir=config.get('mask_dir'),
                         transforms=None,
                         label_type='id',
                         read_sup=config.get('read_sup', False))
        spec = parse_aug_spec(config.get('transforms'))
        if spec is None or spec['kind'] != 'none' or spec['crop'] is not None:
            raise ValueError('eval transforms must be Normalize-only')
        self.ds = ds
        from regda_tpu.datasets.loader import DALoader
        subset = DALoader.compute_cv_subset(
            len(ds), config.get('CV'), bool(config.get('training', False)),
            seed)
        self._indices = (np.sort(subset) if subset is not None
                         else np.arange(len(ds)))
        imgs = np.stack([read_image(ds.rgb_paths[i]) for i in self._indices])
        assert imgs.dtype == np.uint8
        budget = int(os.environ.get('REGDA_DEVICE_DATA_BUDGET', 8 << 30))
        if imgs.nbytes > budget:
            raise DeviceCacheTooLarge(f'{imgs.nbytes} > {budget} bytes')
        self._images = jax.device_put(imgs)
        mean, std = spec['mean'], spec['std']

        @jax.jit
        def norm(u8):
            x = u8.astype(jnp.float32)
            x = (x - mean) / std
            return jnp.minimum(x, 1.0) if spec['clamp'] else x

        self._norm = norm
        self.batch_size = config.get('batch_size', 1)
        self._cls_cache: Optional[list] = None

    def _cls(self, i: int) -> np.ndarray:
        if self._cls_cache is None:
            self._cls_cache = [self.ds.read_raw(int(j))['cls']
                               for j in self._indices]
        return self._cls_cache[i]

    def __iter__(self):
        n = len(self._indices)
        bs = self.batch_size
        for lo in range(0, n, bs):
            sel = range(lo, min(lo + bs, n))
            out = {'image': self._norm(self._images[np.asarray(sel)]),
                   'fname': [os.path.basename(
                       self.ds.rgb_paths[int(self._indices[i])])
                       for i in sel]}
            if self.ds.cls_paths:
                out['cls'] = np.stack([self._cls(i) for i in sel])
            yield out

    def __len__(self):
        return -(-len(self._indices) // self.batch_size)


def get_eval_set(config: dict, dataset_name: str) -> DeviceEvalSet:
    # The key must cover everything DeviceEvalSet bakes in — normalize
    # stats/clamp and batch size included — or two configs sharing a
    # directory would silently reuse each other's normalization.
    spec = parse_aug_spec(config.get('transforms'))
    norm_key = (None if spec is None or spec['mean'] is None else
                (tuple(np.ravel(spec['mean']).tolist()),
                 tuple(np.ravel(spec['std']).tolist()), spec['clamp']))
    cv = config.get('CV') or {}
    key = (tuple(config['image_dir']),
           tuple(config.get('mask_dir') or ()), dataset_name,
           bool(config.get('read_sup', False)),
           config.get('batch_size', 1), norm_key,
           (int(cv.get('k', 10) or 10), int(cv.get('i', -1)),
            bool(config.get('training', False))))
    if key not in _EVAL_CACHE:
        _EVAL_CACHE[key] = DeviceEvalSet(config, dataset_name)
    return _EVAL_CACHE[key]


def make_loader(config: dict, dataset_name: str, seed: int = 2333,
                logger=None):
    """DALoader or DeviceLoader, by platform/config (training splits)."""
    from regda_tpu.datasets.loader import DALoader
    if device_data_enabled(config):
        try:
            loader = DeviceLoader(config, dataset_name, seed=seed)
            if logger:
                logger.info(
                    f'device-resident data: {len(loader.dataset)} tiles '
                    f'cached on {loader._images.device}')
            return loader
        except (ValueError, DeviceCacheTooLarge, AssertionError) as e:
            if logger:
                logger.warning(f'device data disabled ({e}); '
                               'falling back to host loader')
    return DALoader(config, dataset_name, seed=seed)
