"""SAM everything-mode automatic mask generation, TPU-batched.

Capability parity with segment-anything's `SamAutomaticMaskGenerator` as
configured by the reference (regda/utils/local_region_homog.py:32-39:
points_per_side=32, pred_iou_thresh=0.90, stability_score_thresh=0.95,
crop_n_layers=1, crop_n_points_downscale_factor=2).

TPU-first pipeline per crop:
  1. one jit'd ViT encoder pass on the 1024-resized crop;
  2. the 32x32 point grid decoded in jit'd batches (points stacked along the
     prompt dimension -> batched two-way transformer, MXU-dense);
  3. per-mask scalars (predicted IoU, stability score — by DEFAULT exact
     upstream parity, counted on the logits upscaled to crop resolution via
     composed resize matrices, fused as a Pallas kernel; area) computed on
     device; only scalars stream back to the host for filtering;
  4. surviving low-res logits are upscaled/thresholded in a second jit'd op
     (padded to a static mask budget) and transferred once;
  5. greedy box-NMS + region-id packing on host numpy (cheap, tiny data).

Note: by default, stability scores are computed exactly as upstream does —
on the logits upscaled to crop resolution (the resize chain is composed
into one (crop, 256) matrix per axis, so it costs one extra matmul pair
per candidate batch). Pass stability_on_upscaled=False (or set
REGDA_SAM_FAST_STABILITY=1) to score the 256x256 low-res logits directly —
scale-invariant to first order and cheaper, but a deviation from upstream;
the divergence is quantified by tools/check_sam_stability.py (PERF.md).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from regda_tpu.models.sam.vit import ImageEncoderViT, VIT_CONFIGS
from regda_tpu.models.sam.prompt import PromptEncoder
from regda_tpu.models.sam.decoder import MaskDecoder

SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def preprocess_shape(h: int, w: int, long_side: int):
    """Longest-side resize target (upstream ResizeLongestSide rounding).
    The SINGLE source of this rounding: the crop preprocessors and the
    point-grid/decode/stats jits must all agree on (nh, nw) or prompts
    land at shifted coordinates in the resized crop."""
    scale = long_side / max(h, w)
    return int(h * scale + 0.5), int(w * scale + 0.5)


class Sam(nn.Module):
    """Bundled SAM modules sharing one variable tree.

    `dtype` is the compute dtype threaded through encoder + decoder (params
    stay float32). Default bfloat16: the two-way decoder over per-prompt-
    replicated image tokens and the ViT encoder are both matmul-bound, and
    f32 ran them at <8% MXU on v5e. Pass dtype=jnp.float32 for strict
    reference-parity numerics.
    """
    vit_config: str = 'vit_b'
    img_size: int = 1024
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        cfg = VIT_CONFIGS[self.vit_config]
        self.image_encoder = ImageEncoderViT(
            img_size=self.img_size, dtype=self.dtype, name='image_encoder',
            **cfg)
        emb = self.img_size // 16
        self.prompt_encoder = PromptEncoder(
            image_embedding_size=(emb, emb),
            input_image_size=(self.img_size, self.img_size),
            name='prompt_encoder')
        self.mask_decoder = MaskDecoder(dtype=self.dtype,
                                        name='mask_decoder')

    def encode(self, image):
        return self.image_encoder(image)

    def decode_points(self, image_embedding, points, labels):
        """image_embedding (1, 64, 64, 256); points (P, 1, 2) input-res xy.

        Returns (low-res mask logits (P, 3, 256, 256), iou (P, 3))."""
        sparse, dense = self.prompt_encoder(points, labels)
        image_pe = self.prompt_encoder.get_dense_pe()
        # point prompts share the no-mask dense embedding: batch-1 dense
        # lets the decoder share layer-0 key projections across prompts
        masks, iou = self.mask_decoder(image_embedding, image_pe, sparse,
                                       dense[:1], multimask_output=True)
        return masks, iou

    def decode_points_fast(self, image_embedding, points, labels,
                           fused_upscale: bool = True,
                           mask_dtype=None, iou_gate_thresh=None,
                           blocked_masks: bool = False):
        """decode_points through the pure-function fast decoder (same
        parameters, same math — see fast_decoder.py): the prompt-resident
        two-way kernel + the Pallas fused upscale+hypernetwork mask head
        (pallas_upscale.py). iou_gate_thresh: everything-mode IoU gate
        (failing prompts skip the mask head and return zero masks)."""
        from regda_tpu.models.sam.fast_decoder import mask_decoder_fast
        sparse, dense = self.prompt_encoder(points, labels)
        image_pe = self.prompt_encoder.get_dense_pe()
        params = self.mask_decoder.variables['params']
        return mask_decoder_fast(params, image_embedding, image_pe,
                                 sparse, dense[:1], multimask_output=True,
                                 dtype=self.dtype,
                                 fused_upscale=fused_upscale,
                                 mask_dtype=mask_dtype,
                                 iou_gate_thresh=iou_gate_thresh,
                                 blocked_masks=blocked_masks)

    def __call__(self, image, points, labels):
        emb = self.encode(image)
        return self.decode_points(emb, points, labels)


def build_point_grid(n_per_side: int) -> np.ndarray:
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    xs, ys = np.meshgrid(pts, pts)
    return np.stack([xs.ravel(), ys.ravel()], axis=-1)  # (n^2, 2) in [0,1]


def generate_crop_boxes(im_size, n_layers: int, overlap_ratio: float):
    """Crop pyramid (x0, y0, x1, y1) boxes + layer indices."""
    crop_boxes = [[0, 0, im_size[1], im_size[0]]]
    layer_idxs = [0]
    short_side = min(im_size)

    def crop_len(orig_len, n_crops, overlap):
        return int(math.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

    for i_layer in range(n_layers):
        n_crops_per_side = 2 ** (i_layer + 1)
        overlap = int(overlap_ratio * short_side * (2 / n_crops_per_side))
        crop_w = crop_len(im_size[1], n_crops_per_side, overlap)
        crop_h = crop_len(im_size[0], n_crops_per_side, overlap)
        x0s = [int((crop_w - overlap) * i) for i in range(n_crops_per_side)]
        y0s = [int((crop_h - overlap) * i) for i in range(n_crops_per_side)]
        for x0 in x0s:
            for y0 in y0s:
                crop_boxes.append([x0, y0, min(x0 + crop_w, im_size[1]),
                                   min(y0 + crop_h, im_size[0])])
                layer_idxs.append(i_layer + 1)
    return crop_boxes, layer_idxs


def _box_iou(box, boxes):
    x0 = np.maximum(box[0], boxes[:, 0])
    y0 = np.maximum(box[1], boxes[:, 1])
    x1 = np.minimum(box[2], boxes[:, 2])
    y1 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x1 - x0, 0, None) * np.clip(y1 - y0, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a + b - inter, 1e-7)


def nms_boxes(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float):
    """Greedy box NMS, torchvision semantics (suppress iou > thresh,
    areas (x1-x0)*(y1-y0)) with a STABLE descending score sort — the
    cross-crop pass scores by 1/crop-area, so whole crops tie and the
    tie-break must be data order (see tests/sam_postproc_oracle.py's
    module note on upstream's unstable sort)."""
    order = np.argsort(-scores, kind='stable')
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        ious = _box_iou(boxes[i], boxes[order[1:]])
        order = order[1:][ious <= iou_thresh]
    return np.asarray(keep, np.int64)


def is_box_near_crop_edge(boxes, crop_box, orig_hw, atol: float = 20.0):
    """Upstream amg.is_box_near_crop_edge: True for boxes (image coords,
    XYXY) within atol of the crop boundary but NOT within atol of the
    image boundary — everything-mode drops these before per-crop NMS
    (they are expected to be re-found whole by an enclosing crop)."""
    boxes = np.asarray(boxes, np.float32)
    crop = np.asarray(crop_box, np.float32)
    orig = np.asarray([0, 0, orig_hw[1], orig_hw[0]], np.float32)
    near_crop = np.abs(boxes - crop[None]) <= atol
    near_image = np.abs(boxes - orig[None]) <= atol
    return np.any(near_crop & ~near_image, axis=1)


def _crop_nms_scores(crop_box) -> float:
    """Upstream cross-crop NMS score: 1 / area(source crop box) — masks
    from SMALLER crops win ties over the full-image crop; predicted IoU
    plays no role in the cross-crop pass."""
    x0, y0, x1, y1 = crop_box
    return 1.0 / float((x1 - x0) * (y1 - y0))


class SamAutomaticMaskGenerator:
    def __init__(self, model: Sam, variables, points_per_side: int = 32,
                 points_per_batch: int = 256, pred_iou_thresh: float = 0.88,
                 stability_score_thresh: float = 0.95,
                 stability_score_offset: float = 1.0,
                 box_nms_thresh: float = 0.7, crop_n_layers: int = 0,
                 crop_nms_thresh: float = 0.7,
                 crop_overlap_ratio: float = 512 / 1500,
                 crop_n_points_downscale_factor: int = 1,
                 mask_budget: int = 256,
                 compute_dtype=jnp.bfloat16,
                 stability_on_upscaled: Optional[bool] = None,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'data' axis. When given,
        SamRegionGenerator.generate_regions_batch shards the tile batch
        over it (one 1024-resized encode per chip — a single chip can't
        batch ViT-B encodes at 1024^2 in 16G HBM, a mesh CAN scale them
        out); variables are replicated. New first-class capability vs the
        single-GPU reference (SURVEY.md section 2.7)."""
        import os as _os
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            variables = jax.device_put(variables,
                                       NamedSharding(mesh, P()))
        # Pallas fused upscale+hypernetwork mask head (pallas_upscale.py);
        # same escape hatch as the LRH kernel
        self.fused_upscale = not _os.environ.get('REGDA_NO_PALLAS')
        self.model = model
        self.variables = (variables if mesh is not None
                          else jax.device_put(variables))
        self.points_per_side = points_per_side
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.crop_n_points_downscale_factor = crop_n_points_downscale_factor
        self.mask_budget = mask_budget
        self.compute_dtype = compute_dtype
        self.img_size = model.img_size
        if stability_on_upscaled is None:
            # parity by DEFAULT (same polarity as every other parity
            # switch in the repo): REGDA_SAM_FAST_STABILITY=1 opts into
            # the low-res fast path; the legacy REGDA_SAM_EXACT_STABILITY
            # spelling still forces exact.
            if _os.environ.get('REGDA_SAM_EXACT_STABILITY'):
                stability_on_upscaled = True
            else:
                stability_on_upscaled = not bool(
                    _os.environ.get('REGDA_SAM_FAST_STABILITY'))
        # exact-parity stability (the default): upstream segment-anything
        # computes the stability score on logits POSTPROCESSED to the
        # original crop resolution (256 -> 1024 -> unpad -> crop size,
        # bilinear), while the fast opt-in scores the 256x256 low-res
        # logits directly (scale-invariant to first order; divergence
        # quantified in tools/check_sam_stability.py / PERF.md). The exact
        # mode composes the resize chain into one (crop, 256) matrix per
        # axis and counts on the crop-resolution logits — upstream
        # behavior as pinned by /root/reference/requirement.txt:147 and
        # configured at local_region_homog.py:32-39.
        self.stability_on_upscaled = stability_on_upscaled
        self._jits: dict = {}

    # ------------------------------------------------------------ jit pieces
    def _encode_fn(self):
        if 'encode' not in self._jits:
            dt = self.compute_dtype

            def enc(variables, image):
                out = self.model.apply(variables, image.astype(dt),
                                       method=self.model.encode)
                return out.astype(jnp.float32)

            self._jits['encode'] = jax.jit(enc)
        return self._jits['encode']

    def _exact_stability_matrices(self, key_hw, low: int):
        """Compose upstream postprocess_masks' resize chain
        (low-res -> img_size bilinear, unpad to (nh, nw), -> (ch, cw)
        bilinear, all half-pixel) into ONE (crop_dim, low) matrix per
        axis."""
        from regda_tpu.ops.resize import _interp_matrix_half_pixel
        nh, nw, ch, cw = key_hw
        u_h = _interp_matrix_half_pixel(low, self.img_size)[:nh]
        u_w = _interp_matrix_half_pixel(low, self.img_size)[:nw]
        m_h = _interp_matrix_half_pixel(nh, ch) @ u_h        # (ch, low)
        m_w = _interp_matrix_half_pixel(nw, cw) @ u_w        # (cw, low)
        return m_h.astype(np.float32), m_w.astype(np.float32)

    def _blocked_masks(self) -> bool:
        """Everything-mode masks stay in the upscale kernel's candidate-
        major BLOCKED layout (B, M*16, HW) through stability + budget
        selection; only the selected masks are interleaved. Removes the
        per-candidate depth-to-space HBM relayout (~84 ms/tile at
        crop_n_layers=1 on v5e — see PERF.md). Follows the Pallas master
        switch: the blocked layout is the fused upscale kernel's output
        contract."""
        return self.fused_upscale

    def _decode_fn(self, key_hw=None):
        import os as _os
        exact = self.stability_on_upscaled and key_hw is not None
        # per-prompt IoU gate (DEFAULT ON; REGDA_SAM_NO_IOU_GATE=1 turns it
        # off): candidates the downstream filter is about to drop by
        # pred_iou_thresh skip their mask-head GEMMs, exact-stability
        # resizes, and stats: the exact XLA iou head (hoisted ahead of the
        # mask head) feeds the upscale kernel's per-prompt active flags
        # and the stability kernel's candidate flags. Output-identical by
        # construction — upstream everything-mode drops those candidates
        # at the pred_iou filter BEFORE stability/NMS
        # (segment_anything _process_batch as driven at
        # local_region_homog.py:32-39), and gate + filter decide from the
        # same canonical iou array. Read at every call and part of the
        # cache key, so toggling the env var between generate calls
        # re-traces instead of reusing the stale kernel.
        gate = (None if _os.environ.get('REGDA_SAM_NO_IOU_GATE')
                else float(self.pred_iou_thresh))
        # exact-parity stability runs as a fused Pallas kernel on TPU
        # (pallas_stability.py): both composed-resize matmuls stay in
        # VMEM and only two counts per candidate leave the core, vs the
        # XLA scan's HBM round-trips of every (group, crop, crop) block
        stab_env = (not _os.environ.get('REGDA_NO_PALLAS')
                    and not _os.environ.get('REGDA_NO_STAB_KERNEL'))
        stabk = exact and stab_env and jax.default_backend() == 'tpu'
        # the blocked kernel self-selects interpret mode off-TPU, so CPU
        # tests drive the same code path the chip runs
        stabk_blocked = exact and stab_env
        blocked = self._blocked_masks()
        # the two-way kernel choice and its LN-dtype knob are read at
        # TRACE time inside mask_decoder_fast / two_way_fused; key them
        # here too so toggling the env vars between generate() calls in
        # one process re-traces instead of silently reusing the stale
        # compiled decode (ADVICE r4: the gate/stabk flags already did
        # this, the two-way flags didn't)
        twoway_env = (_os.environ.get('REGDA_FUSED_TWOWAY', ''),
                      _os.environ.get('REGDA_NO_TWOWAY', ''),
                      _os.environ.get('REGDA_TWOWAY_LN_DT', ''))
        key = ('decode', key_hw if exact else None, gate, stabk, blocked,
               twoway_env)
        if key not in self._jits:
            off = self.stability_score_offset
            dt = self.compute_dtype
            fused = self.fused_upscale

            def dec(variables, embedding, points):
                """points: (P, 2) input-res xy -> per-mask scalars + logits.

                masks return interleaved (P, 3, S, S) or, when blocked,
                candidate-major (P, 48, (S//4)^2) — layout-free consumers
                only (stability counts, budget selection)."""
                pts = points[:, None, :]
                lbs = jnp.ones(pts.shape[:2], jnp.int32)
                # masks come back already in the compute dtype: halves the
                # mask head's output write, the scan-stacked
                # (n_pts*3, 256, 256) candidate tensor, and the selection
                # matmul (downstream thresholds only compare against 0,
                # insensitive to bf16 rounding)
                masks, iou = self.model.apply(
                    variables, embedding, pts, lbs, fused, dt,
                    iou_gate_thresh=gate, blocked_masks=blocked,
                    method=self.model.decode_points_fast)
                # (P, 3, 256, 256) [or (P, 48, HW) blocked], (P, 3)
                p, m3 = iou.shape
                if blocked:
                    hw = masks.shape[-1]
                    s = 4 * int(np.sqrt(hw))
                else:
                    s = masks.shape[-1]
                if exact:
                    # upstream parity: stability on crop-resolution logits
                    m_np = self._exact_stability_matrices(key_hw, s)
                    m_h = jnp.asarray(m_np[0])
                    m_w = jnp.asarray(m_np[1])
                    # with the IoU gate on, candidates the downstream
                    # filter drops by pred_iou_thresh skip their
                    # resize work; their garbage counts are ANDed out
                    # by the filter's `iou > t_iou` term (dec_all)
                    act = ((iou > gate).reshape(-1)
                           if gate is not None else None)
                    if blocked:
                        h = s // 4
                        flat = masks.reshape(p * m3, 16 * h, h)
                        if stabk_blocked:
                            # v2 (column-concat row resize, group=8) is
                            # the measured-fastest blocked variant on
                            # v5e: 3.35 vs 4.2 ms (v1 g4) per 384-cand
                            # chunk (round-4 sweep, PERF.md)
                            from regda_tpu.models.sam.pallas_stability \
                                import stability_counts_blocked_v2
                            inter, union = stability_counts_blocked_v2(
                                flat, m_h, m_w, h, h, offset=off,
                                active=act, group=8)
                        else:
                            from regda_tpu.models.sam.pallas_stability \
                                import stability_counts_xla, unblock_masks
                            inter, union = stability_counts_xla(
                                unblock_masks(flat, h, h), m_h, m_w.T,
                                offset=off)
                    elif stabk:
                        from regda_tpu.models.sam.pallas_stability import (
                            stability_counts_fused)
                        inter, union = stability_counts_fused(
                            masks.reshape(p * m3, s, s), m_h, m_w.T,
                            offset=off, active=act)
                    else:
                        from regda_tpu.models.sam.pallas_stability import (
                            stability_counts_xla)
                        inter, union = stability_counts_xla(
                            masks.reshape(p * m3, s, s), m_h, m_w.T,
                            offset=off)
                    inter = inter.reshape(p, m3)
                    union = union.reshape(p, m3)
                else:
                    # fast path: stability straight off the compute-dtype
                    # low-res logits — the off thresholds (+-1.0) are exact
                    # in bf16, and summing the boolean compares in f32
                    # avoids an f32 copy of the masks. Order-free, so the
                    # blocked layout needs no conversion
                    cand = masks.reshape(p, m3, -1)
                    inter = (cand > off).sum(axis=-1, dtype=jnp.float32)
                    union = (cand > -off).sum(axis=-1, dtype=jnp.float32)
                stability = inter / jnp.maximum(union, 1.0)
                return masks, iou, stability

            self._jits[key] = jax.jit(dec)
        return self._jits[key]

    def _decode_all_fn(self, n_pts: int, key_hw=None):
        """One jit over the whole point grid: scan decode chunks on device,
        filter by IoU/stability on device, keep the FIRST `mask_budget`
        passing masks (point order, matching the chunked host loop), and
        return only the selected low-res logits + scalars. One host
        transfer of (budget, 256, 256) instead of (P, 3, 256, 256) per-chunk
        streams — the dominant tunnel cost of everything-mode.

        key_hw: (nh, nw, ch, cw) crop frame, used only by the exact
        upstream-parity stability mode (stability_on_upscaled)."""
        exact = self.stability_on_upscaled and key_hw is not None
        # decode_chunk is captured at trace time, so its gate config (see
        # _decode_fn) must key this jit too
        decode_chunk = self._decode_fn(key_hw)
        blocked = self._blocked_masks()
        key = ('decode_all', n_pts, key_hw if exact else None, decode_chunk,
               blocked)
        if key not in self._jits:
            pb = self.points_per_batch
            budget = self.mask_budget
            t_iou, t_st = self.pred_iou_thresh, self.stability_score_thresh

            def dec_all(variables, embedding, points, valid_pts):
                """points: (n_pts, 2) padded; valid_pts: (n_pts,) bool."""
                pts = points.reshape(-1, pb, 2)

                def body(carry, chunk):
                    masks, iou, stab = decode_chunk(variables, embedding,
                                                    chunk)
                    return carry, (masks, iou, stab)

                _, (masks, iou, stab) = jax.lax.scan(body, 0, pts)
                n = n_pts * 3
                if blocked:
                    # (chunks, pb, 48, hw): splitting 48 -> (3, 16) and
                    # flattening to candidate rows keeps row-major order —
                    # free reshapes, no relayout of the candidate stream
                    hw = masks.shape[-1]
                    h = int(np.sqrt(hw))
                    masks = masks.reshape(n, 16 * hw)
                    out_hw = (4 * h, 4 * h)
                else:
                    out_hw = masks.shape[-2:]
                    masks = masks.reshape(n, out_hw[0] * out_hw[1])
                iou = iou.reshape(n)
                stab = stab.reshape(n)
                ok = (jnp.repeat(valid_pts, 3) & (iou > t_iou)
                      & (stab >= t_st))
                # first-`budget`-in-order selection via a rank score that
                # decreases with index; invalid entries rank last
                score = jnp.where(ok, jnp.arange(n, 0, -1, dtype=jnp.float32),
                                  0.0)
                _, sel = jax.lax.top_k(score, min(budget, n))  # asc. index
                # row-gather of the (n, 256, 256) logits as a one-hot matmul:
                # XLA's native gather of big rows through this path measured
                # ~150 ms/tile on v5e; the (budget, n) @ (n, 65536) matmul is
                # MXU work at ~2 ms for the same selection
                onehot = jax.nn.one_hot(sel, n, dtype=masks.dtype)
                sel_masks = onehot @ masks
                if blocked:
                    # interleave ONLY the budget survivors (16x fewer than
                    # the candidate stream the old path converted)
                    from regda_tpu.models.sam.pallas_stability import (
                        unblock_masks)
                    sel_masks = unblock_masks(
                        sel_masks.reshape(-1, 16 * h, h), h, h)
                else:
                    sel_masks = sel_masks.reshape(-1, *out_hw)
                return sel_masks, iou[sel], ok[sel]

            self._jits[key] = jax.jit(dec_all)
        return self._jits[key]

    def _crop_bits_fn(self, key_hw):
        """(M, 256, 256) low-res logits -> bit-packed CROP-resolution
        masks (M, ch, ceil(cw/8)*8 // 8) uint8 via the composed resize
        matrices — upstream postprocess_masks semantics (resample to crop
        size, THEN binarize; the old path binarized at the model frame and
        nearest-resized at paint, flipping boundary pixels vs upstream).
        Unpack with np.unpackbits(...)[:, :, :cw]."""
        key = ('crop_bits', key_hw)
        if key not in self._jits:
            nh, nw, ch, cw = key_hw
            m_np = self._exact_stability_matrices(key_hw, self.img_size // 4)
            m_h = jnp.asarray(m_np[0])                       # (ch, S)
            m_wt = jnp.asarray(m_np[1].T)                    # (S, cw)
            cw8 = -(-cw // 8) * 8
            hi = jax.lax.Precision.HIGHEST

            def ups(logits):
                x = logits.astype(jnp.float32)
                y = jnp.einsum('hs,msw->mhw', m_h, x,
                               preferred_element_type=jnp.float32,
                               precision=hi)
                y = jnp.einsum('mhw,wc->mhc', y, m_wt,
                               preferred_element_type=jnp.float32,
                               precision=hi)                 # (M, ch, cw)
                bits = jnp.pad((y > 0.0).astype(jnp.uint8),
                               ((0, 0), (0, 0), (0, cw8 - cw)))
                weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
                mm = bits.shape[0]
                return (bits.reshape(mm, ch, cw8 // 8, 8)
                        * weights).sum(-1).astype(jnp.uint8)

            self._jits[key] = jax.jit(ups)
        return self._jits[key]

    # ------------------------------------------------------------- pipeline
    def _preprocess(self, image_np: np.ndarray) -> np.ndarray:
        """uint8 HWC crop -> (1, 1024, 1024, 3) normalized float32.

        Resize is EXACT float half-pixel bilinear — the same math as the
        device preprocess (_preprocess_device_fn) and torch
        F.interpolate(align_corners=False), so every repo path sees
        identical encoder inputs. Upstream instead resizes through PIL
        (fixed-point coefficients + uint8 rounding of the resized image);
        the deviation is bounded by the uint8 quantum (<= 1/255 per pixel
        pre-normalization) and is this framework's documented
        preprocessing contract."""
        from regda_tpu.ops.resize import _interp_matrix_half_pixel
        h, w = image_np.shape[:2]
        nh, nw = preprocess_shape(h, w, self.img_size)
        x = image_np.astype(np.float32)
        if (nh, nw) != (h, w):
            r_h = _interp_matrix_half_pixel(h, nh).astype(np.float32)
            r_w = _interp_matrix_half_pixel(w, nw).astype(np.float32)
            x = np.einsum('Hh,hwc->Hwc', r_h, x)
            x = np.einsum('Ww,Hwc->HWc', r_w, x)
        img = (x - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
        out = np.zeros((self.img_size, self.img_size, 3), np.float32)
        out[:nh, :nw] = img
        return out[None], (nh, nw)

    def _process_crop(self, image_np: np.ndarray, crop_box, layer_idx: int):
        x0, y0, x1, y1 = crop_box
        crop = image_np[y0:y1, x0:x1]
        ch, cw = crop.shape[:2]
        batchable, (nh, nw) = self._preprocess(crop)
        embedding = self._encode_fn()(self.variables, jnp.asarray(batchable))

        n_side = self.points_per_side // (
            self.crop_n_points_downscale_factor ** layer_idx)
        grid = build_point_grid(n_side)  # [0,1] in crop frame
        # to 1024-resized-crop coordinates
        pts_input = grid * np.array([nw, nh], np.float32)

        pb = self.points_per_batch
        n_pts = pts_input.shape[0]
        pad = (-n_pts) % pb
        pts_padded = np.concatenate(
            [pts_input, np.zeros((pad, 2), np.float32)], axis=0)
        valid_pts = np.arange(len(pts_padded)) < n_pts
        # whole grid in ONE jit: decode + filter + first-budget selection on
        # device; only the selected logits/scalars come back
        sel_logits, sel_iou, sel_ok = self._decode_all_fn(
            len(pts_padded), (nh, nw, ch, cw))(
            self.variables, embedding, jnp.asarray(pts_padded),
            jnp.asarray(valid_pts))
        ok = np.asarray(sel_ok)
        if not ok.any():
            return []
        ious = np.asarray(sel_iou)[ok]

        # resample the selected logits to CROP resolution on device
        # (upstream postprocess_masks), transfer bit-packed, unpack
        packed = np.asarray(self._crop_bits_fn((nh, nw, ch, cw))(sel_logits))
        masks_crop = np.unpackbits(packed, axis=-1)[:, :, :cw].astype(bool)
        masks_crop = masks_crop[ok]

        # boxes in upstream's INCLUSIVE max-index convention (empty masks
        # -> [0,0,0,0], kept — amg.batched_mask_to_box)
        boxes = np.zeros((len(masks_crop), 4), np.float32)
        areas = np.zeros((len(masks_crop),), np.int64)
        for i, m in enumerate(masks_crop):
            ys, xs = np.nonzero(m)
            if ys.size:
                boxes[i] = [xs.min(), ys.min(), xs.max(), ys.max()]
                areas[i] = ys.size

        # drop masks whose box is near the crop edge but not the image
        # edge (upstream _process_batch, BEFORE per-crop NMS)
        keep = ~is_box_near_crop_edge(
            boxes + np.array([x0, y0, x0, y0], np.float32),
            crop_box, image_np.shape[:2])
        masks_crop, ious = masks_crop[keep], ious[keep]
        boxes, areas = boxes[keep], areas[keep]
        if not len(masks_crop):
            return []

        # per-crop NMS scored by predicted IoU (crop-frame boxes; NMS is
        # translation-invariant so uncropping after matches upstream)
        k = nms_boxes(boxes, ious, self.box_nms_thresh)
        anns = []
        for i in k:
            full = np.zeros(image_np.shape[:2], bool)
            full[y0:y1, x0:x1] = masks_crop[i]
            anns.append({'segmentation': full,
                         'area': int(areas[i]),
                         'bbox': (boxes[i] + [x0, y0, x0, y0]).tolist(),
                         'predicted_iou': float(ious[i]),
                         'crop_box': list(crop_box)})
        return anns

    def generate(self, image_np: np.ndarray) -> list[dict]:
        """image_np: uint8 (H, W, 3). Returns list of annotation dicts in
        upstream order (cross-crop NMS keep order — the order the
        reference's region-id packing consumes, local_region_homog.py:
        51-56)."""
        crop_boxes, layer_idxs = generate_crop_boxes(
            image_np.shape[:2], self.crop_n_layers, self.crop_overlap_ratio)
        all_anns = []
        for box, layer in zip(crop_boxes, layer_idxs):
            anns = self._process_crop(image_np, box, layer)
            for a in anns:
                a['crop_layer'] = layer
            all_anns += anns
        if not all_anns:
            return []
        if len(crop_boxes) > 1:
            # upstream cross-crop NMS: scores are 1/area(source crop box)
            # — smaller crops win; predicted IoU plays no role here
            boxes = np.asarray([a['bbox'] for a in all_anns], np.float32)
            scores = np.asarray([_crop_nms_scores(a['crop_box'])
                                 for a in all_anns], np.float32)
            keep = nms_boxes(boxes, scores, self.crop_nms_thresh)
            all_anns = [all_anns[i] for i in keep]
        return all_anns


def regions_from_anns(anns: list[dict], size, area_threshold: int = 1024
                      ) -> np.ndarray:
    """Pack annotations into an int32 region map (id = index + 1, 0 =
    unassigned) keeping only masks with area >= threshold
    (local_region_homog.py:51-56)."""
    mask = np.zeros(size, np.int32)
    max_id = 0
    for i, ann in enumerate(anns):
        if ann['area'] >= area_threshold:
            mask[ann['segmentation']] = i + 1
            max_id = i + 1
    if max_id >= _lrh_max_regions():
        import warnings
        warnings.warn(
            f'region map contains id {max_id} >= LRH MAX_REGIONS '
            f'({_lrh_max_regions()}); LRH will treat over-budget regions '
            'as unassigned (pixels keep their original pseudo-label)')
    return mask


def _lrh_max_regions() -> int:
    from regda_tpu.ops.lrh import MAX_REGIONS
    return MAX_REGIONS


class SamRegionGenerator(SamAutomaticMaskGenerator):
    """Device-resident everything-mode for region-map production.

    `generate()` above keeps API parity with segment-anything (ann dicts
    with full-res bool masks) but must download every mask — prohibitive
    when the accelerator sits behind a slow host link (measured ~5-15 MB/s
    on this machine's tunneled TPU). This subclass computes boxes/areas on
    device, runs the (tiny) greedy NMS on host scalars, then paints the
    int32 region map ON DEVICE and downloads only the final (H, W) map —
    per 512-tile: ~KBs of scalars + one ~1 MB map instead of ~0.25 GB of
    masks. Region contents match `generate()` + `regions_from_anns` up to
    mask-resize rounding; region ids come out in NMS score order (ids are
    arbitrary labels for LRH either way).
    """

    # --------------------------------------------------------- jit pieces
    def _preprocess_device_fn(self, crop_hw):
        """uint8 crop upload (~0.75 MB for a 512 tile) + resize/normalize on
        device — the host-side PIL path uploads the resized float32 1024
        square (12 MB), which costs ~0.16 s/crop on this machine's link.
        For upscales (every 512-tile) half-pixel bilinear matches PIL
        BILINEAR exactly."""
        key = ('preproc', crop_hw)
        if key not in self._jits:
            from regda_tpu.ops.resize import resize_bilinear_half_pixel
            ch, cw = crop_hw
            size = self.img_size
            nh, nw = preprocess_shape(ch, cw, size)
            mean = jnp.asarray(SAM_PIXEL_MEAN)
            std = jnp.asarray(SAM_PIXEL_STD)

            dt = self.compute_dtype

            def pre(crop_u8):
                x = crop_u8.astype(jnp.float32)
                x = x[None] if x.ndim == 3 else x     # (B, ch, cw, 3)
                x = resize_bilinear_half_pixel(x, (nh, nw))
                x = (x - mean) / std
                # emit the encoder's compute dtype: the patch embed casts
                # anyway, and a separate 12 MB f32->bf16 convert measured
                # 0.78 ms through XLA's layout assignment
                return jnp.pad(x, ((0, 0), (0, size - nh),
                                   (0, size - nw), (0, 0))).astype(dt)

            self._jits[key] = (jax.jit(pre), (nh, nw))
        return self._jits[key]

    def _pyramid_pre_fn(self, tile_hw, boxes):
        """uint8 TILE -> (len(boxes), 1024, 1024, 3) preprocessed crop
        pyramid in one jit: slice (static boxes), per-crop half-pixel
        resize, normalize, pad, concat. ONE ~0.75 MB tile upload replaces
        the per-crop host slices + uploads (the overlapping layer-1 crops
        re-ship ~4x the tile bytes over the slow link) and collapses the
        per-group preprocess dispatches."""
        key = ('pyramid_pre', tile_hw, boxes)
        if key not in self._jits:
            from regda_tpu.ops.resize import resize_bilinear_half_pixel
            size = self.img_size
            mean = jnp.asarray(SAM_PIXEL_MEAN)
            std = jnp.asarray(SAM_PIXEL_STD)
            dt = self.compute_dtype

            def pre(tile_u8):
                x = tile_u8.astype(jnp.float32)[None]
                outs = []
                for (bx0, by0, bx1, by1) in boxes:
                    c = x[:, by0:by1, bx0:bx1]
                    ch, cw = by1 - by0, bx1 - bx0
                    nh, nw = preprocess_shape(ch, cw, size)
                    r = resize_bilinear_half_pixel(c, (nh, nw))
                    r = (r - mean) / std
                    outs.append(jnp.pad(
                        r, ((0, 0), (0, size - nh),
                            (0, size - nw), (0, 0))).astype(dt))
                return jnp.concatenate(outs, axis=0)

            self._jits[key] = jax.jit(pre)
        return self._jits[key]

    def _mask_stats_fn(self, key_hw):
        """(budget, 256, 256) logits -> (masks (M, ch, cw) bool at CROP
        resolution via the composed resize chain — upstream
        postprocess_masks semantics — plus INCLUSIVE-convention boxes and
        exact pixel areas in the crop frame)."""
        key = ('mask_stats', key_hw)
        if key not in self._jits:
            nh, nw, ch, cw = key_hw
            m_np = self._exact_stability_matrices(key_hw, self.img_size // 4)
            m_h = jnp.asarray(m_np[0])                       # (ch, S)
            m_wt = jnp.asarray(m_np[1].T)                    # (S, cw)
            hi = jax.lax.Precision.HIGHEST

            def stats(logits):
                x = logits.astype(jnp.float32)
                y = jnp.einsum('hs,msw->mhw', m_h, x,
                               preferred_element_type=jnp.float32,
                               precision=hi)
                y = jnp.einsum('mhw,wc->mhc', y, m_wt,
                               preferred_element_type=jnp.float32,
                               precision=hi)
                m = y > 0.0                                   # (M, ch, cw)
                rows = m.any(axis=2)
                cols = m.any(axis=1)
                ys = jnp.arange(ch)
                xs = jnp.arange(cw)
                y0 = jnp.min(jnp.where(rows, ys, ch), axis=1)
                y1 = jnp.max(jnp.where(rows, ys, -1), axis=1)
                x0 = jnp.min(jnp.where(cols, xs, cw), axis=1)
                x1 = jnp.max(jnp.where(cols, xs, -1), axis=1)
                boxes = jnp.stack([x0, y0, x1, y1], 1).astype(jnp.float32)
                empty = (y1 < y0) | (x1 < x0)
                boxes = jnp.where(empty[:, None], 0.0, boxes)
                areas = m.sum(axis=(1, 2))
                return m, boxes, areas
            self._jits[key] = jax.jit(stats)
        return self._jits[key]

    def _paint_fn(self, paint_key):
        """Max-paint ids into the canvas region covered by one crop
        (masks already at crop resolution)."""
        key = ('paint', paint_key)
        if key not in self._jits:
            x0, y0, ch, cw = paint_key

            def paint(canvas, masks, ids):
                contrib = jnp.max(
                    masks * ids[:, None, None].astype(jnp.int32), axis=0)
                region = jax.lax.dynamic_slice(canvas, (y0, x0), (ch, cw))
                return jax.lax.dynamic_update_slice(
                    canvas, jnp.maximum(region, contrib), (y0, x0))
            self._jits[key] = jax.jit(paint)
        return self._jits[key]

    # ------------------------------------------------------------ pipeline
    def _crop_device(self, image_np, crop_box, layer_idx):
        """Everything-mode for one crop; masks stay on device."""
        x0, y0, x1, y1 = crop_box
        crop = np.ascontiguousarray(image_np[y0:y1, x0:x1])
        ch, cw = crop.shape[:2]
        pre, (nh, nw) = self._preprocess_device_fn((ch, cw))
        batchable = pre(jnp.asarray(crop))
        embedding = self._encode_fn()(self.variables, batchable)

        n_side = self.points_per_side // (
            self.crop_n_points_downscale_factor ** layer_idx)
        grid = build_point_grid(n_side)
        pts = grid * np.array([nw, nh], np.float32)
        pb = self.points_per_batch
        pad = (-len(pts)) % pb
        pts_padded = np.concatenate([pts, np.zeros((pad, 2), np.float32)])
        valid = np.arange(len(pts_padded)) < len(pts)
        sel_logits, sel_iou, sel_ok = self._decode_all_fn(
            len(pts_padded), (nh, nw, ch, cw))(
            self.variables, embedding, jnp.asarray(pts_padded),
            jnp.asarray(valid))
        masks, boxes, areas = self._mask_stats_fn((nh, nw, ch, cw))(sel_logits)
        # device arrays throughout — callers download the (tiny) scalars
        # when they need them, so batched callers can enqueue many crops
        # before the first blocking read
        return dict(masks=masks, nh=nh, nw=nw, ch=ch, cw=cw,
                    boxes=boxes, areas=areas, iou=sel_iou, ok=sel_ok)

    def generate_regions(self, image_np: np.ndarray,
                         area_threshold: int = 1024) -> np.ndarray:
        """uint8 (H, W, 3) -> int32 (H, W) region map (0 = unassigned)."""
        h, w = image_np.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            (h, w), self.crop_n_layers, self.crop_overlap_ratio)
        crops = []
        cand = []          # (crop_idx, mask_idx, box_img, area, crop_score)
        for ci, (box, layer) in enumerate(zip(crop_boxes, layer_idxs)):
            r = self._crop_device(image_np, box, layer)
            crops.append((r, box))
            ok, areas = np.asarray(r['ok']), np.asarray(r['areas'])
            b_all = np.asarray(r['boxes']) + np.array(
                [box[0], box[1], box[0], box[1]], np.float32)
            # upstream candidate set: iou/stability survivors minus boxes
            # near the crop edge (but not the image edge); the LRH area
            # threshold gates PAINTING only (small anns keep their id
            # slots and participate in NMS — local_region_homog.py:51-56)
            valid = ok & ~is_box_near_crop_edge(b_all, box, (h, w))
            idxs = np.nonzero(valid)[0]
            if not len(idxs):
                continue
            scores = np.asarray(r['iou'])[idxs]
            keep = nms_boxes(b_all[idxs], scores, self.box_nms_thresh)
            for k in keep:
                cand.append((ci, int(idxs[k]), b_all[idxs[k]],
                             float(areas[idxs[k]]), _crop_nms_scores(box)))
        if not cand:
            return np.zeros((h, w), np.int32)
        boxes = np.stack([c[2] for c in cand])
        scores = np.array([c[4] for c in cand])
        # cross-crop NMS scored by 1/crop-area (upstream); single-crop:
        # data order IS the per-crop NMS keep order
        order = (nms_boxes(boxes, scores, self.crop_nms_thresh)
                 if len(crop_boxes) > 1 else np.arange(len(cand)))
        if len(order) >= _lrh_max_regions():
            import warnings
            warnings.warn(
                f'{len(order)} regions survive NMS, >= LRH MAX_REGIONS '
                f'({_lrh_max_regions()}); keeping the first '
                f'{_lrh_max_regions() - 1} so ids stay within the LRH '
                'budget')
            order = order[:_lrh_max_regions() - 1]
        # assign global ids in keep order (max-paint => higher id wins,
        # matching the reference paint loop's sequential overwrite); anns
        # below the area threshold consume an id but are never painted
        per_crop_ids = {ci: np.zeros(int(crops[ci][0]['ok'].shape[0]),
                                     np.int32)
                        for ci in range(len(crop_boxes))}
        for gid, oi in enumerate(order):
            ci, mi, _, area, _ = cand[oi]
            if area >= area_threshold:
                per_crop_ids[ci][mi] = gid + 1
        canvas = jnp.zeros((h, w), jnp.int32)
        any_painted = False
        for ci, (r, box) in enumerate(crops):
            ids = per_crop_ids[ci]
            if not ids.any():
                continue
            any_painted = True
            paint = self._paint_fn((box[0], box[1], r['ch'], r['cw']))
            canvas = paint(canvas, r['masks'], jnp.asarray(ids))
        # host-known id range (see generate_regions_batch): skip the
        # slow-link download for empty maps, uint8 when ids fit
        if not any_painted:
            return np.zeros((h, w), np.int32)
        max_id = max((int(i.max()) for i in per_crop_ids.values()
                      if i.size), default=0)
        dl_dt = jnp.uint8 if max_id <= 255 else jnp.uint16
        return np.asarray(canvas.astype(dl_dt)).astype(np.int32)


    # ----------------------------------------------- batched (vmapped) jits
    def _decode_all_batch_fn(self, n_pts: int, key_hw=None,
                             skip: bool = True):
        import os as _os
        exact = self.stability_on_upscaled and key_hw is not None
        skip = skip and not _os.environ.get('REGDA_NO_BUDGET_SKIP')
        if not skip:
            # escape hatch / mesh path: vmap the single-sample body. Under
            # vmap a lax.cond lowers to select (both branches execute), so
            # the budget skip below would be dead weight here.
            single = self._decode_all_fn(n_pts, key_hw)
            key = ('decode_all_batch', n_pts, key_hw if exact else None,
                   single)
            if key not in self._jits:
                # embedding keeps its leading 1 so decode_points sees
                # (1, 64, 64, 256)

                def batched(variables, embs, points, valid):
                    return jax.vmap(lambda e: single(variables, e, points,
                                                     valid))(embs)

                self._jits[key] = jax.jit(batched)
            return self._jits[key]
        return self._decode_all_batch_skip_fn(n_pts, key_hw)

    def _decode_all_batch_skip_fn(self, n_pts: int, key_hw=None):
        """Batched decode_all with BUDGET SKIP: the scan over point chunks
        runs at the batch level (not under vmap), so once every position's
        first-`mask_budget`-in-order selection is full the remaining
        chunks take a real lax.cond branch and skip their decode +
        stability work entirely. Output-identical to the vmap path by
        construction: selection keeps the first `budget` candidates
        passing the IoU/stability filters in point order either way, and
        chunks past the fill point can never contribute to it (slots the
        filter rejects carry garbage/zero logits in both paths and every
        consumer ANDs with `ok`). At everything-mode pass rates the crop-0
        grid fills its budget within ~2 of 8 chunks, so most of the
        decode cost of the reference crop_n_layers=1 configuration
        (local_region_homog.py:32-39) is dead work this branch removes.

        The selection itself is folded INTO the scan as a per-chunk
        running-ordinal one-hot matmul, replacing the stacked
        (n_pts*3, HW) candidate tensor (~400 MB HBM at crop-1) + post-hoc
        top_k gather with a (budget, chunk) GEMM per step."""
        exact = self.stability_on_upscaled and key_hw is not None
        decode_chunk = self._decode_fn(key_hw)
        blocked = self._blocked_masks()
        key = ('decode_all_batch_skip', n_pts, key_hw if exact else None,
               decode_chunk, blocked)
        if key not in self._jits:
            pb = self.points_per_batch
            budget = self.mask_budget
            t_iou, t_st = self.pred_iou_thresh, self.stability_score_thresh

            def dec_all_b(variables, embs, points, valid_pts):
                b = embs.shape[0]
                pts = points.reshape(-1, pb, 2)              # (K, pb, 2)
                vld = valid_pts.reshape(-1, pb)              # (K, pb)
                d = pb * 3
                n = n_pts * 3
                bud = min(budget, n)

                def live_chunk(chunk):
                    return jax.vmap(
                        lambda e: decode_chunk(variables, e, chunk))(embs)

                out_struct = jax.eval_shape(live_chunk, pts[0])
                m_struct = out_struct[0]
                # candidate-major rows: (pb, 3, S, S) -> (pb*3, S*S);
                # blocked (pb, 48, hw) -> (pb*3, 16*hw) (48 = 3 cand x 16
                # subblocks, row-major, so the reshape is free)
                feat = int(np.prod(m_struct.shape[1:])) // d
                iou_dt = out_struct[1].dtype

                def body(carry, xs):
                    n_ok, sel_m, sel_iou, sel_ok = carry
                    chunk, v = xs
                    need = jnp.any(n_ok < bud)
                    masks, iou, stab = jax.lax.cond(
                        need,
                        lambda _: live_chunk(chunk),
                        lambda _: jax.tree.map(
                            lambda st: jnp.zeros(st.shape, st.dtype),
                            out_struct),
                        None)
                    # per-candidate pass flags; a skipped chunk's are
                    # forced false (its zero iou/stab would already fail
                    # the reference thresholds, but don't rely on that)
                    okc = (v[None, :, None] & (iou > t_iou)
                           & (stab >= t_st) & need)
                    okf = okc.reshape(b, d)
                    # running first-in-order ordinal per candidate; only
                    # ordinals < budget land a one-hot row
                    ordn = (n_ok[:, None]
                            + jnp.cumsum(okf.astype(jnp.int32), axis=1) - 1)
                    ordn = jnp.where(okf, ordn, -1)
                    oh = (ordn[:, None, :]
                          == jnp.arange(bud, dtype=jnp.int32)[None, :, None])
                    mf = masks.reshape(b, d, feat)
                    sel_m = sel_m + jnp.einsum(
                        'bkd,bdf->bkf', oh.astype(mf.dtype), mf)
                    sel_iou = sel_iou + jnp.einsum(
                        'bkd,bd->bk', oh.astype(iou_dt),
                        iou.reshape(b, d).astype(iou_dt))
                    sel_ok = sel_ok | (oh & okf[:, None, :]).any(-1)
                    return ((n_ok + okf.sum(1, dtype=jnp.int32),
                             sel_m, sel_iou, sel_ok), None)

                init = (jnp.zeros((b,), jnp.int32),
                        jnp.zeros((b, bud, feat), m_struct.dtype),
                        jnp.zeros((b, bud), iou_dt),
                        jnp.zeros((b, bud), jnp.bool_))
                (_, sel_m, sel_iou, sel_ok), _ = jax.lax.scan(
                    body, init, (pts, vld))
                if blocked:
                    from regda_tpu.models.sam.pallas_stability import (
                        unblock_masks)
                    hw = m_struct.shape[-1]
                    h = int(np.sqrt(hw))
                    sel_m = unblock_masks(
                        sel_m.reshape(b * bud, 16 * h, h), h, h
                    ).reshape(b, bud, 4 * h, 4 * h)
                else:
                    sel_m = sel_m.reshape(b, bud, *m_struct.shape[-2:])
                return sel_m, sel_iou, sel_ok

            self._jits[key] = jax.jit(dec_all_b)
        return self._jits[key]

    def _mask_stats_packed_fn(self, key_hw):
        """vmapped stats returning BIT-PACKED masks so a crop pyramid's
        worth of batched masks stays ~MBs/crop-position on device.

        On TPU the whole upscale+threshold+pack+box/area stage runs as the
        fused Pallas kernel (pallas_stats.py): the XLA lowering
        materializes (budget, 1024, 1024) f32 intermediates in HBM —
        ~100 ms/tile at crop_n_layers=1 — while the kernel keeps each
        mask's full-res block in VMEM."""
        key = ('mask_stats_packed', key_hw)
        if key not in self._jits:
            import os as _os
            nh, nw, ch, cw = key_hw
            m_np = self._exact_stability_matrices(key_hw, self.img_size // 4)
            m_h = jnp.asarray(m_np[0])                       # (ch, S)
            m_wt = jnp.asarray(m_np[1].T)                    # (S, cw)
            cw8 = -(-cw // 8) * 8
            weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)

            if (jax.default_backend() == 'tpu'
                    and not _os.environ.get('REGDA_NO_PALLAS')):
                from regda_tpu.models.sam.pallas_stats import mask_stats_fused

                def stats_one_fused(logits, ok):
                    # ok gates per-slot work in the kernel: budget slots
                    # past the real mask count skip their crop^2 pass
                    # (their outputs are garbage; every consumer is
                    # already ANDed with ok)
                    return mask_stats_fused(logits, m_h, m_wt, ch, cw,
                                            active=ok)

                self._jits[key] = jax.jit(jax.vmap(stats_one_fused))
                return self._jits[key]

            hi = jax.lax.Precision.HIGHEST

            def stats_one(logits, ok):
                del ok               # XLA twin computes every slot
                x = logits.astype(jnp.float32)
                y = jnp.einsum('hs,msw->mhw', m_h, x,
                               preferred_element_type=jnp.float32,
                               precision=hi)
                y = jnp.einsum('mhw,wc->mhc', y, m_wt,
                               preferred_element_type=jnp.float32,
                               precision=hi)
                m = y > 0.0                                   # (M, ch, cw)
                rows = m.any(axis=2)
                cols = m.any(axis=1)
                ys = jnp.arange(ch)
                xs = jnp.arange(cw)
                y0 = jnp.min(jnp.where(rows, ys, ch), axis=1)
                y1 = jnp.max(jnp.where(rows, ys, -1), axis=1)
                x0 = jnp.min(jnp.where(cols, xs, cw), axis=1)
                x1 = jnp.max(jnp.where(cols, xs, -1), axis=1)
                boxes = jnp.stack([x0, y0, x1, y1], 1).astype(jnp.float32)
                empty = (y1 < y0) | (x1 < x0)
                boxes = jnp.where(empty[:, None], 0.0, boxes)
                areas = m.sum(axis=(1, 2)).astype(jnp.float32)
                # pack to the kernel's padded layout ((8,128)-tiled rows)
                chp = -(-ch // 8) * 8
                cwp = -(-cw // 128) * 128
                bits = jnp.pad(m.astype(jnp.uint8),
                               ((0, 0), (0, chp - ch), (0, cwp - cw)))
                mm = bits.shape[0]
                packed = (bits.reshape(mm, chp, cwp // 8, 8)
                          * weights).sum(-1).astype(jnp.uint8)
                return packed, boxes, areas

            self._jits[key] = jax.jit(jax.vmap(stats_one))
        return self._jits[key]

    def _paint_packed_fn(self, paint_key):
        """Batched max-paint from bit-packed masks."""
        key = ('paint_packed', paint_key)
        if key not in self._jits:
            x0, y0, ch, cw = paint_key

            def paint_one(canvas, packed, ids):
                # packed bits are already at crop resolution (padded to
                # the kernel tile grid); unpack the (ch, cw) window
                xi = jnp.arange(cw)
                byts = packed[:, :ch, xi // 8]               # (M, ch, cw)
                bits = (byts >> (7 - (xi % 8)).astype(jnp.uint8)) & 1
                contrib = jnp.max(
                    bits.astype(jnp.int32) * ids[:, None, None], axis=0)
                region = jax.lax.dynamic_slice(canvas, (y0, x0), (ch, cw))
                return jax.lax.dynamic_update_slice(
                    canvas, jnp.maximum(region, contrib), (y0, x0))

            self._jits[key] = jax.jit(jax.vmap(paint_one))
        return self._jits[key]

    # ------------------------------------------------- mesh-sharded phase 1
    def _preprocess_batch_fn(self, crop_hw):
        key = ('preprocess_batch', crop_hw)
        if key not in self._jits:
            pre, sizes = self._preprocess_device_fn(crop_hw)
            self._jits[key] = (jax.jit(jax.vmap(pre)), sizes)
        return self._jits[key]

    def _encode_batch_fn(self):
        if 'encode_batch' not in self._jits:
            enc = self._encode_fn()
            self._jits['encode_batch'] = jax.jit(
                jax.vmap(enc, in_axes=(None, 0)))
        return self._jits['encode_batch']

    def _phase1_sharded(self, tiles, crop_boxes, layer_idxs):
        """Per-crop-position stats with the TILE axis sharded over
        self.mesh: every device encodes/decodes its own tiles, scaling
        throughput ~linearly with no change in results (single-chip batching
        exists too — _phase1_pyramid batches one tile's crop positions
        through one encode — but the decode's candidate tensors bound how
        many TILES a 16G chip can fly concurrently; a mesh lifts that)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = self.mesh
        axis = mesh.axis_names[0]
        n_dev = mesh.shape[axis]
        sh = NamedSharding(mesh, P(axis))
        n_tiles = len(tiles)
        pad = (-n_tiles) % n_dev
        tiles_p = list(tiles) + [tiles[-1]] * pad
        per_pos = []
        for box, layer in zip(crop_boxes, layer_idxs):
            x0, y0, x1, y1 = box
            ch, cw = y1 - y0, x1 - x0
            pre_b, (nh, nw) = self._preprocess_batch_fn((ch, cw))
            n_side = self.points_per_side // (
                self.crop_n_points_downscale_factor ** layer)
            grid = build_point_grid(n_side)
            pts = grid * np.array([nw, nh], np.float32)
            pb = self.points_per_batch
            padp = (-len(pts)) % pb
            pts_padded = jnp.asarray(np.concatenate(
                [pts, np.zeros((padp, 2), np.float32)]))
            valid = jnp.asarray(np.arange(pts_padded.shape[0]) < len(pts))
            # one tile per DEVICE per dispatch: each tile's decode keeps
            # its own candidate tensors live, so larger tile batches go
            # through as consecutive n_dev-wide sharded dispatches instead
            # of deeper per-device batching
            # skip=False: under GSPMD the budget-skip's scalar `need`
            # would psum across the sharded tile axis every chunk (and
            # skip only when EVERY device's tile is full) — keep the mesh
            # path branch-free
            decode_b = self._decode_all_batch_fn(int(pts_padded.shape[0]),
                                                 (nh, nw, ch, cw),
                                                 skip=False)
            stats_b = self._mask_stats_packed_fn((nh, nw, ch, cw))
            enc_b = self._encode_batch_fn()
            parts = []
            for lo in range(0, len(tiles_p), n_dev):
                crops = np.stack([np.ascontiguousarray(t[y0:y1, x0:x1])
                                  for t in tiles_p[lo:lo + n_dev]])
                xs = pre_b(jax.device_put(crops, sh))
                embs = enc_b(self.variables, xs)
                logits, iou, ok = decode_b(self.variables, embs,
                                           pts_padded, valid)
                packed, boxes, areas = stats_b(logits, ok)
                parts.append((packed, boxes, areas, iou, ok))
            cat = [jnp.concatenate(field)[:n_tiles]
                   for field in zip(*parts)]
            per_pos.append(dict(packed=cat[0], boxes=cat[1], areas=cat[2],
                                iou=cat[3], ok=cat[4],
                                nh=nh, nw=nw, ch=ch, cw=cw))
        return per_pos

    def generate_regions_batch(self, tiles: "list[np.ndarray]",
                               area_threshold: int = 1024
                               ) -> "list[np.ndarray]":
        """Batched region maps for same-sized tiles.

        Phase-structured to hide the host link's dispatch latency: ALL
        device work for every tile is enqueued before the first (tiny)
        stats download, so the accelerator pipeline never stalls on the
        host between tiles; then NMS runs per tile on scalars and the
        paints are enqueued back-to-back. With a mesh, phase 1 runs with
        the tile axis sharded over the devices instead (_phase1_sharded).
        """
        return self._phases23(*self._submit_batch(tiles, area_threshold))

    def _submit_batch(self, tiles, area_threshold):
        """Dispatch ALL of one batch's device work (phase 1) without any
        host read, then start async host copies of the scalar fields NMS
        will need — the state tuple feeds _phases23 (now or later)."""
        import time as _time
        self._t_gen_start = _time.perf_counter()
        h, w = tiles[0].shape[:2]
        assert all(t.shape[:2] == (h, w) for t in tiles)
        crop_boxes, layer_idxs = generate_crop_boxes(
            (h, w), self.crop_n_layers, self.crop_overlap_ratio)

        # phase 1: per crop POSITION x tile: pre+encode and decode stay
        # per-tile dispatches (a batch-8 ViT-B encode at 1024^2 overflows
        # the 16G HBM) but they pipeline back-to-back with no host reads;
        # packed stats are stacked on device so phase 2 downloads each
        # scalar field ONCE per position instead of once per tile
        if self.mesh is not None:
            per_pos = self._phase1_sharded(tiles, crop_boxes, layer_idxs)
        else:
            per_pos = self._phase1_pyramid(tiles, crop_boxes, layer_idxs)
        for p in per_pos:
            for f in ('boxes', 'areas', 'iou', 'ok'):
                try:
                    p[f].copy_to_host_async()
                except AttributeError:
                    pass        # non-jax array (sharded path numpy views)
        return (tiles, per_pos, crop_boxes, layer_idxs, h, w,
                area_threshold)

    def generate_regions_stream(self, batches, area_threshold: int = 1024,
                                depth: int = 3):
        """Pipelined region generation over an iterable of tile batches.

        generate_regions_batch leaves the accelerator idle during each
        batch's host tail (scalar download -> NMS -> paint -> canvas
        download — ~25% of everything-mode wall time through the tunneled
        host link, XProf-measured). This generator keeps `depth` batches
        in flight: batch k+1's (and k+2's) phase-1 device work is
        dispatched BEFORE batch k's host tail runs, so the device crunches
        the next batch while the host does NMS and drains canvases.
        Yields one list of region maps per input batch, in order; each
        batch's maps are bit-identical to generate_regions_batch's.
        depth=3 measured +2% over depth=2 at the crop-1 bench (v5e,
        round 5: 4.07/4.07/4.09 vs 3.94/3.98/4.04 tiles/s) — the third
        in-flight batch covers the host tail's variance; depth changes
        scheduling only, never outputs.

        Capability parity: the reference generates region maps for a whole
        split offline (regda/utils/local_region_homog.py:28-44 driven per
        tile); this is the batched/pipelined equivalent for that loop.
        """
        from collections import deque
        q = deque()
        for tiles in batches:
            q.append(self._submit_batch(tiles, area_threshold))
            if len(q) > max(depth, 1):
                yield self._phases23(*q.popleft())
        while q:
            yield self._phases23(*q.popleft())

    def _phase1_pyramid(self, tiles, crop_boxes, layer_idxs):
        """Single-chip phase 1 with the CROP PYRAMID batched per tile.

        The reference's crop_n_layers=1 configuration
        (local_region_homog.py:37) runs 5 independent 1024-res encodes per
        tile (full image + 4 layer-1 crops). Instead of one dispatch per
        crop position (the round-1 path), all positions of one tile are
        preprocessed to the common (1024, 1024, 3) frame and encoded in ONE
        batched ViT pass — better MXU occupancy and 5x fewer
        encode/preprocess dispatches — then decoded per position-GROUP
        (positions sharing crop size + point grid decode as one vmapped
        call: for crop_n_layers=1 that is 1 + 4)."""
        n_tiles = len(tiles)
        # group crop positions by (ch, cw, layer): same preprocess jit,
        # same point grid, same stats jit
        groups: dict = {}
        pos_meta = []
        for ci, (box, layer) in enumerate(zip(crop_boxes, layer_idxs)):
            x0, y0, x1, y1 = box
            key = (y1 - y0, x1 - x0, layer)
            groups.setdefault(key, []).append(ci)
            pos_meta.append((box, layer))

        group_plan = []
        for (ch, cw, layer), cis in groups.items():
            pre_b, (nh, nw) = self._preprocess_batch_fn((ch, cw))
            n_side = self.points_per_side // (
                self.crop_n_points_downscale_factor ** layer)
            grid = build_point_grid(n_side)
            pts = grid * np.array([nw, nh], np.float32)
            pb = self.points_per_batch
            padp = (-len(pts)) % pb
            pts_padded = jnp.asarray(np.concatenate(
                [pts, np.zeros((padp, 2), np.float32)]))
            valid = jnp.asarray(np.arange(pts_padded.shape[0]) < len(pts))
            group_plan.append(dict(
                cis=cis, ch=ch, cw=cw, nh=nh, nw=nw, pre=pre_b,
                pts=pts_padded, valid=valid,
                decode=self._decode_all_batch_fn(
                    int(pts_padded.shape[0]), (nh, nw, ch, cw)),
                stats=self._mask_stats_packed_fn((nh, nw, ch, cw))))

        # per tile: ONE uint8 tile upload + one fused slice/resize/pad jit
        # for the whole pyramid, ONE encode over all positions, then
        # per-group decode + stats. No host reads anywhere in phase 1:
        # everything queues behind the previous tile's device work.
        results = {ci: [] for ci in range(len(crop_boxes))}
        boxes_order = tuple(tuple(pos_meta[ci][0]) for g in group_plan
                            for ci in g['cis'])
        tile_hw = tiles[0].shape[:2]
        pyr_pre = self._pyramid_pre_fn(tile_hw, boxes_order)
        enc = self._concat_encode_fn((len(boxes_order),))
        for t in tiles:
            embs = enc(self.variables, pyr_pre(jnp.asarray(t)))
            off = 0
            for g in group_plan:
                n = len(g['cis'])
                # embeddings keep a leading 1 for decode_points
                logits, iou, ok = g['decode'](
                    self.variables, embs[off:off + n, None], g['pts'],
                    g['valid'])
                packed, boxes, areas = g['stats'](logits, ok)
                for k, ci in enumerate(g['cis']):
                    results[ci].append((packed[k], boxes[k], areas[k],
                                        iou[k], ok[k]))
                off += n

        per_pos = []
        for ci, (box, layer) in enumerate(zip(crop_boxes, layer_idxs)):
            g = next(g for g in group_plan if ci in g['cis'])
            fields = list(zip(*results[ci]))
            per_pos.append(dict(
                packed=jnp.stack(fields[0]), boxes=jnp.stack(fields[1]),
                areas=jnp.stack(fields[2]), iou=jnp.stack(fields[3]),
                ok=jnp.stack(fields[4]),
                nh=g['nh'], nw=g['nw'], ch=g['ch'], cw=g['cw']))
        return per_pos

    def _concat_encode_fn(self, sizes: tuple):
        """jit: concat preprocessed crop batches -> one batched encode."""
        key = ('concat_encode', sizes)
        if key not in self._jits:
            dt = self.compute_dtype

            def enc(variables, *xs):
                x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=0)
                out = self.model.apply(variables, x.astype(dt),
                                       method=self.model.encode)
                return out.astype(jnp.float32)

            self._jits[key] = jax.jit(enc)
        return self._jits[key]

    def _phases23(self, tiles, per_pos, crop_boxes, layer_idxs, h, w,
                  area_threshold):
        import os as _os
        import time as _time
        timing = _os.environ.get('REGDA_SAM_TIMING')
        t0 = _time.perf_counter()
        n_tiles = len(tiles)
        # phase 2: per-tile NMS on the (batched) scalars
        pos_np = [dict(boxes=np.asarray(p['boxes']),
                       areas=np.asarray(p['areas']),
                       iou=np.asarray(p['iou']), ok=np.asarray(p['ok']))
                  for p in per_pos]
        if timing:   # the scalar download above drains the phase-1 queue
            t1 = _time.perf_counter()
        all_ids = []            # per tile: per position id vectors
        for ti in range(n_tiles):
            cand = []   # (ci, mask_idx, box_img, area, crop_score)
            for ci, (p, box) in enumerate(zip(pos_np, crop_boxes)):
                b_all = p['boxes'][ti] + np.array(
                    [box[0], box[1], box[0], box[1]], np.float32)
                # upstream candidate set: iou/stability survivors minus
                # boxes near the crop edge (not the image edge); the LRH
                # area threshold gates PAINTING only — small anns keep
                # their id slots and participate in NMS
                valid = p['ok'][ti] & ~is_box_near_crop_edge(b_all, box,
                                                             (h, w))
                idxs = np.nonzero(valid)[0]
                if not len(idxs):
                    continue
                scores = p['iou'][ti][idxs]
                keep = nms_boxes(b_all[idxs], scores, self.box_nms_thresh)
                for k in keep:
                    cand.append((ci, int(idxs[k]), b_all[idxs[k]],
                                 float(p['areas'][ti][idxs[k]]),
                                 _crop_nms_scores(box)))
            ids = [np.zeros(pos_np[ci]['ok'].shape[1], np.int32)
                   for ci in range(len(crop_boxes))]
            if cand:
                boxes = np.stack([c[2] for c in cand])
                scores = np.array([c[4] for c in cand])
                # cross-crop NMS scored by 1/crop-area (upstream);
                # single-crop: data order IS the per-crop keep order
                order = (nms_boxes(boxes, scores, self.crop_nms_thresh)
                         if len(crop_boxes) > 1 else np.arange(len(cand)))
                if len(order) >= _lrh_max_regions():
                    import warnings
                    warnings.warn(
                        f'{len(order)} regions survive NMS, >= LRH '
                        f'MAX_REGIONS ({_lrh_max_regions()}); keeping the '
                        'first within budget')
                    order = order[:_lrh_max_regions() - 1]
                for gid, oi in enumerate(order):
                    ci, mi, _, area, _ = cand[oi]
                    if area >= area_threshold:
                        ids[ci][mi] = gid + 1
            all_ids.append(ids)

        if timing:
            t2 = _time.perf_counter()
        # phase 3: batched paint per crop position, one canvas download.
        # NMS already happened on host, so only the budget slots that got
        # a region id in SOME tile are gathered into the paint — the
        # unpack-and-max runs over ~assigned masks, not the whole budget
        # (slot counts bucketed to powers of two to bound recompiles)
        canvases = jnp.zeros((n_tiles, h, w), jnp.int32)
        any_painted = False
        for ci, (p, box) in enumerate(zip(per_pos, crop_boxes)):
            ids_ci = np.stack([all_ids[ti][ci] for ti in range(n_tiles)])
            used = np.nonzero(ids_ci.any(axis=0))[0]
            if not len(used):
                continue
            any_painted = True
            m_total = ids_ci.shape[1]
            k = 1
            while k < len(used):
                k *= 2
            k = min(k, m_total)
            # pad entries gather slot 0's packed bits, which may be an
            # inactive slot's UNWRITTEN garbage — safe only because their
            # ids stay 0 (the paint kernel takes max(bits * id, canvas),
            # so id-0 rows can never write). Keep both invariants together.
            sel = np.zeros(k, np.int64)
            sel[:len(used)] = used
            ids_sel = np.zeros((n_tiles, k), ids_ci.dtype)
            ids_sel[:, :len(used)] = ids_ci[:, used]
            paint = self._paint_packed_fn((box[0], box[1],
                                           p['ch'], p['cw']))
            canvases = paint(canvases, p['packed'][:, jnp.asarray(sel)],
                             jnp.asarray(ids_sel))
        # the canvas download rides the slow tunneled d2h link (~29 MB/s
        # measured round 5: 4.2 MB uint16 per 8-tile batch = ~145 ms, the
        # bench's run-to-run bimodality). Ids are assigned on HOST during
        # NMS, so the host knows the canvas contents' range before
        # downloading: all-empty batches (no mask painted any tile) skip
        # the transfer outright — the canvas is provably the zeros it was
        # initialized to — and otherwise uint8 ships whenever every id
        # fits, halving the transfer vs uint16
        if not any_painted:
            out = np.zeros((n_tiles, h, w), np.int32)
        else:
            max_id = max((int(i.max()) for ids in all_ids for i in ids
                          if i.size), default=0)
            dl_dt = jnp.uint8 if max_id <= 255 else jnp.uint16
            out = np.asarray(canvases.astype(dl_dt)).astype(np.int32)
        if timing:
            t3 = _time.perf_counter()
            disp = t0 - getattr(self, '_t_gen_start', t0)
            print(f'[sam-timing] n={n_tiles} dispatch={disp:.3f}s '
                  f'drain+scalars={t1 - t0:.3f}s '
                  f'nms={t2 - t1:.3f}s paint+dl={t3 - t2:.3f}s',
                  flush=True)
        return [out[i] for i in range(n_tiles)]
