"""Palette-PNG prediction dumps (parity: regda/viz.py:11-28)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


class VisualizeSegmm:
    def __init__(self, out_dir: str, palette):
        self.out_dir = out_dir
        self.palette = list(palette)
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, y_pred: np.ndarray, filename: str):
        y = np.asarray(y_pred).astype(np.uint8).squeeze()
        img = Image.fromarray(y, mode='P')
        img.putpalette(self.palette)
        img.save(os.path.join(self.out_dir, filename))
