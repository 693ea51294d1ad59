"""Jit-compiled segmentation inference engine (whole-tile / slide / TTA).

This is the single inference path shared by evaluation (tools/eval.py),
single-image prediction (tools/infer_single.py) and offline pseudo-label
generation (regda/gast/pseudo_generation.py:96-155 equivalent). Jitted
functions are cached per (input shape, slide, tta) so repeated tiles of the
same geometry reuse the compiled executable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from regda_tpu.ops.slide import slide_inference
from regda_tpu.ops.tta import tta_apply


class SegInferencer:
    def __init__(self, model, variables, num_classes: int,
                 tile: int = 512, stride: int = 256,
                 compute_dtype: Optional[jnp.dtype] = None,
                 mesh=None, fold_bn: Optional[bool] = None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis. When given,
        model variables are replicated across it and prediction batches are
        sharded over 'data' (GSPMD inserts the gathers) — multi-chip eval /
        pseudo-generation, a capability the single-GPU reference lacks
        (SURVEY.md §2.7). The batch must divide the 'data' axis size.

        fold_bn: fold every BatchNorm's eval affine into the preceding
        conv kernel (models/fold_bn.py) — same math regrouped, removes the
        per-pixel BN work from the hot path. Default: on for models that
        support it (REGDA_NO_FOLD_BN=1 disables)."""
        import os as _os
        if fold_bn is None:
            fold_bn = (_os.environ.get('REGDA_NO_FOLD_BN') != '1'
                       and getattr(model, 'folded', None) is False)
        self.fold_bn = fold_bn
        if fold_bn:
            from regda_tpu.models.fold_bn import folded_model
            model = folded_model(model)
        self.model = model
        self.mesh = mesh
        self.num_classes = num_classes
        self.tile = tile
        self.stride = stride
        self.compute_dtype = compute_dtype
        self._cache: dict = {}
        self.update_variables(variables)

    def _make_fn(self, shape, slide: bool, tta: bool,
                 labels: bool = False):
        def apply_probs(variables, x):
            if self.compute_dtype is not None:
                x = x.astype(self.compute_dtype)
            # deployed-graph eval: the fused dual-head PPM forward when the
            # model supports it (models/fused_eval.py, +~1% on v5e;
            # REGDA_NO_FUSED_PPM=1 reverts), else stock apply
            from regda_tpu.models.fused_eval import eval_forward
            out = eval_forward(self.model, variables, x)
            return out.astype(jnp.float32)

        def fn(variables, image):
            if slide:
                out = slide_inference(
                    lambda t: apply_probs(variables, t), image,
                    self.num_classes, self.tile, self.stride, tta)
            elif tta:
                out = tta_apply(lambda t: apply_probs(variables, t), image)
            else:
                out = apply_probs(variables, image)
            # argmax on device: evaluation only needs the class map, so
            # ship H*W uint8 instead of H*W*C float probs over the (slow,
            # leak-prone for h2d) host link
            return jnp.argmax(out, -1).astype(jnp.uint8) if labels else out

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data = NamedSharding(self.mesh, P('data'))
            repl = NamedSharding(self.mesh, P())
            return jax.jit(fn, in_shardings=(repl, data), out_shardings=data)
        return jax.jit(fn)

    def predict_probs(self, images: np.ndarray, slide: bool = True,
                      tta: bool = False) -> np.ndarray:
        """images: (B, H, W, 3) normalized float32 -> (B, H, W, C) probs."""
        key = (images.shape, slide, tta)
        if key not in self._cache:
            self._cache[key] = self._make_fn(images.shape, slide, tta)
        return np.asarray(self._cache[key](self.variables,
                                           jnp.asarray(images)))

    def predict_labels(self, images, slide: bool = True,
                       tta: bool = False) -> np.ndarray:
        """images: (B, H, W, 3) normalized float32 -> (B, H, W) int32 class
        map, argmaxed on device (same probs as predict_probs)."""
        key = (images.shape, slide, tta, 'labels')
        if key not in self._cache:
            self._cache[key] = self._make_fn(images.shape, slide, tta,
                                             labels=True)
        return np.asarray(self._cache[key](self.variables,
                                           jnp.asarray(images))
                          ).astype(np.int32)

    def update_variables(self, variables):
        if (self.fold_bn and variables is not None
                and 'batch_stats' in variables):
            from regda_tpu.models.fold_bn import fold_batchnorm_jit
            variables = fold_batchnorm_jit(variables)
        if self.mesh is not None and variables is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self.variables = jax.device_put(
                variables, NamedSharding(self.mesh, P()))
        else:
            self.variables = jax.device_put(variables)


    def predict_multiscale(self, images: np.ndarray,
                           scales=(0.75, 1.0, 1.25, 1.5, 1.75, 2.0),
                           tta: bool = False) -> np.ndarray:
        """Multi-scale whole-image inference: resize by each scale, predict,
        upsample probabilities back, average (reference
        regda/utils/tools.py:99-128 `predict_whole`/`predict_multiscale`,
        align_corners=True). Each scale is one cached jit call.

        images: (B, H, W, 3) normalized float32 -> (B, H, W, C) mean probs.
        """
        from regda_tpu.ops.resize import resize_bilinear_align_corners
        b, h, w, _ = images.shape
        x = jnp.asarray(images)
        total = None
        for scale in scales:
            sh, sw = int(round(h * scale)), int(round(w * scale))
            key = ('ms', b, h, w, sh, sw, tta)
            if key not in self._cache:
                def fn(variables, img, sh=sh, sw=sw):
                    scaled = resize_bilinear_align_corners(img, (sh, sw))
                    apply = lambda t: self.model.apply(variables, t,
                                                       train=False)
                    probs = tta_apply(apply, scaled) if tta else apply(scaled)
                    return resize_bilinear_align_corners(
                        probs.astype(jnp.float32), (h, w))
                self._cache[key] = jax.jit(fn)
            p = self._cache[key](self.variables, x)
            total = p if total is None else total + p
        return np.asarray(total / len(scales))
