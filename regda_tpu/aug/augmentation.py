"""Joint RNG-explicit augmentations on numpy samples.

The reference carries two transform stacks — albumentations for id-label
loaders (configs/ToVaihingen.py:44-55) and a torch-tensor Compose for
prob-label loaders (regda/aug/augmentation.py:20-157). Here both collapse
into one numpy implementation: a sample dict {image HWC float32,
cls HW int | HWC float prob, sup HW int} is transformed jointly with an
explicit np.random.Generator (no hidden global state, reproducible per
worker).

Geometric keys: image/cls/sup all share crops/flips/rotations; Normalize
touches only the image. Stats are in 0-255 units with max_pixel_value=1
(i.e. NO 0-1 prescaling), matching the reference configs.
"""

from __future__ import annotations

import numpy as np

_GEO_KEYS = ('image', 'cls', 'sup')


def _apply_geo(sample: dict, fn) -> dict:
    out = dict(sample)
    for k in _GEO_KEYS:
        if k in out and isinstance(out[k], np.ndarray):
            out[k] = fn(out[k])
    return out


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample: dict, rng: np.random.Generator) -> dict:
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


class OneOf:
    """Apply one of `transforms` (uniformly chosen) with probability p
    (albumentations semantics; the chosen transform always applies)."""

    def __init__(self, transforms, p: float = 0.75):
        self.transforms = list(transforms)
        self.p = p

    def __call__(self, sample, rng):
        if rng.random() < self.p:
            t = self.transforms[rng.integers(len(self.transforms))]
            sample = t(sample, rng)
        return sample


class RandomCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, sample, rng):
        h, w = sample['image'].shape[:2]
        th, tw = self.size
        y = int(rng.integers(0, h - th + 1))
        x = int(rng.integers(0, w - tw + 1))
        return _apply_geo(sample, lambda a: a[y:y + th, x:x + tw])


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, sample, rng):
        h, w = sample['image'].shape[:2]
        th, tw = self.size
        y, x = (h - th) // 2, (w - tw) // 2
        return _apply_geo(sample, lambda a: a[y:y + th, x:x + tw])


class RandomHorizontalFlip:
    def __init__(self, prob: float = 0.5, always: bool = False):
        self.prob = 1.0 if always else prob

    def __call__(self, sample, rng):
        if rng.random() < self.prob:
            sample = _apply_geo(sample, lambda a: a[:, ::-1].copy())
        return sample


class RandomVerticalFlip:
    def __init__(self, prob: float = 0.5, always: bool = False):
        self.prob = 1.0 if always else prob

    def __call__(self, sample, rng):
        if rng.random() < self.prob:
            sample = _apply_geo(sample, lambda a: a[::-1].copy())
        return sample


class RandomRotate90:
    """fixed_k=None -> k drawn from 0..3 (albumentations semantics, used by
    the source OneOf stack); fixed_k=1 -> single 90-degree rotation with
    probability `prob` (the torch-tensor stack, regda/aug/augmentation.py:61-72)."""

    def __init__(self, prob: float = 0.5, always: bool = False, fixed_k=None):
        self.prob = 1.0 if always else prob
        self.fixed_k = fixed_k

    def __call__(self, sample, rng):
        if rng.random() < self.prob:
            k = int(rng.integers(0, 4)) if self.fixed_k is None else self.fixed_k
            if k:
                sample = _apply_geo(sample,
                                    lambda a: np.rot90(a, k=k, axes=(0, 1)).copy())
        return sample


class Normalize:
    """(img - mean) / std in 0-255 units (max_pixel_value=1); optional
    clamp(max=1.0) used by the prob-label stack (configs/st/regda/*.py)."""

    def __init__(self, mean, std, clamp: bool = False):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.clamp = clamp

    def __call__(self, sample, rng):
        out = dict(sample)
        img = (out['image'] - self.mean) / self.std
        if self.clamp:
            img = np.minimum(img, 1.0)
        out['image'] = img.astype(np.float32)
        return out
