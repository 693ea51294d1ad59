"""Upstream-faithful oracle for SAM everything-mode POST-PROCESSING.

Round 3 oracled the SAM *model* (tests/torch_sam_oracle.py: encoder /
prompt / decoder / converter). This module closes the remaining surface:
an independent numpy/torch port of `SamAutomaticMaskGenerator`'s
post-processing pipeline — the exact code path the reference drives at
/root/reference/regda/utils/local_region_homog.py:30-39 — so the repo's
batched/device-resident everything-mode (regda_tpu/models/sam/auto.py)
can be asserted equal END TO END, region map to region map.

Faithfully ported semantics (from the published segment-anything
library's automatic_mask_generator.py + utils/amg.py, pinned by the
reference at requirement.txt:147; re-implemented from the published
behavior, not vendored):

  _process_batch:  decode 3 masks/point -> flatten -> filter order
      pred_iou > thresh  ->  stability (computed on logits POSTPROCESSED
      to crop resolution; > offset / > -offset counts) >= thresh  ->
      binarize at mask_threshold 0.0  ->  boxes (batched_mask_to_box,
      INCLUSIVE max-index convention)  ->  drop boxes near the crop edge
      but not near the image edge (atol=20)  ->  uncrop masks (zero pad).
  _process_crop:   per-crop NMS on crop-frame boxes scored by predicted
      IoU  ->  uncrop boxes.
  _generate_masks: concat crops  ->  cross-crop NMS scored by
      1 / area(source crop box)  (smaller crops win — NOT by IoU).
  generate():      ann dicts in post-NMS (score-descending) order.
  SAM.get_local_regions (the reference wrapper): region id = ann index+1
      for anns with area >= threshold, painted sequentially (later anns
      overwrite earlier).

NMS note: torchvision's batched_nms sorts scores descending with an
UNSTABLE sort; ties (e.g. the constant per-crop scores of the cross-crop
pass) are implementation-defined there. This oracle uses a stable
descending sort (index ascending among ties), and the repo pipeline
matches that choice.

The oracle drives the repo's own jax SAM for raw low-res logits + IoU
predictions (model parity is covered by torch_sam_oracle.py); everything
downstream of the decoder runs here in numpy/torch.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


# --------------------------------------------------------------- amg ports

def build_point_grid(n_per_side: int) -> np.ndarray:
    offset = 1 / (2 * n_per_side)
    pts = np.linspace(offset, 1 - offset, n_per_side)
    xs, ys = np.meshgrid(pts, pts)
    return np.stack([xs.ravel(), ys.ravel()], axis=-1)


def build_all_layer_point_grids(n_per_side, n_layers, scale_per_layer):
    return [build_point_grid(int(n_per_side / (scale_per_layer ** i)))
            for i in range(n_layers + 1)]


def generate_crop_boxes(im_size, n_layers, overlap_ratio):
    crop_boxes = [[0, 0, im_size[1], im_size[0]]]
    layer_idxs = [0]
    short_side = min(im_size)

    def crop_len(orig_len, n_crops, overlap):
        return int(np.ceil((overlap * (n_crops - 1) + orig_len) / n_crops))

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


def calculate_stability_score(masks: torch.Tensor, mask_threshold: float,
                              offset: float) -> torch.Tensor:
    """(..., H, W) logits -> IoU between +offset and -offset cuts."""
    intersections = ((masks > (mask_threshold + offset))
                     .sum(-1, dtype=torch.int32)
                     .sum(-1, dtype=torch.int32))
    unions = ((masks > (mask_threshold - offset))
              .sum(-1, dtype=torch.int32).sum(-1, dtype=torch.int32))
    return intersections / unions


def batched_mask_to_box(masks: torch.Tensor) -> torch.Tensor:
    """Bool masks (..., H, W) -> XYXY boxes with INCLUSIVE max indices
    (upstream amg.batched_mask_to_box); empty masks -> [0,0,0,0]."""
    if torch.numel(masks) == 0:
        return torch.zeros(*masks.shape[:-2], 4, device=masks.device)
    shape = masks.shape
    h, w = shape[-2:]
    masks = masks.flatten(0, -3) if len(shape) > 2 else masks.unsqueeze(0)
    in_height, _ = torch.max(masks, dim=-1)
    in_height_coords = in_height * torch.arange(h)[None, :]
    bottom_edges, _ = torch.max(in_height_coords, dim=-1)
    in_height_coords = in_height_coords + h * (~in_height)
    top_edges, _ = torch.min(in_height_coords, dim=-1)
    in_width, _ = torch.max(masks, dim=-2)
    in_width_coords = in_width * torch.arange(w)[None, :]
    right_edges, _ = torch.max(in_width_coords, dim=-1)
    in_width_coords = in_width_coords + w * (~in_width)
    left_edges, _ = torch.min(in_width_coords, dim=-1)
    empty_filter = (right_edges < left_edges) | (bottom_edges < top_edges)
    out = torch.stack([left_edges, top_edges, right_edges, bottom_edges],
                      dim=-1)
    out = out * (~empty_filter).unsqueeze(-1)
    return out.reshape(*shape[:-2], 4) if len(shape) > 2 else out[0]


def uncrop_boxes_xyxy(boxes, crop_box):
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + torch.tensor([[x0, y0, x0, y0]], device=boxes.device)


def is_box_near_crop_edge(boxes, crop_box, orig_box, atol=20.0):
    crop_box_t = torch.as_tensor(crop_box, dtype=torch.float,
                                 device=boxes.device)
    orig_box_t = torch.as_tensor(orig_box, dtype=torch.float,
                                 device=boxes.device)
    boxes = uncrop_boxes_xyxy(boxes, crop_box).float()
    near_crop = torch.isclose(boxes, crop_box_t[None, :], atol=atol, rtol=0)
    near_image = torch.isclose(boxes, orig_box_t[None, :], atol=atol, rtol=0)
    near_crop = torch.logical_and(near_crop, ~near_image)
    return torch.any(near_crop, dim=1)


def uncrop_masks(masks, crop_box, orig_h, orig_w):
    x0, y0, x1, y1 = crop_box
    if x0 == 0 and y0 == 0 and x1 == orig_w and y1 == orig_h:
        return masks
    pad = (x0, orig_w - x1, y0, orig_h - y1)
    return F.pad(masks, pad, value=0)


def _box_iou_xyxy(boxes_a, boxes_b):
    """torchvision box_iou convention: area = (x1-x0)*(y1-y0)."""
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    lt = torch.max(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = torch.min(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter).clamp(min=1e-9)


def nms(boxes: torch.Tensor, scores: torch.Tensor, iou_threshold: float):
    """Greedy NMS (torchvision.ops.nms semantics: keep strictly-greater-IoU
    suppression, i.e. drop iou > threshold) with a STABLE descending sort
    (see module note on upstream's tie behavior)."""
    order = torch.from_numpy(
        np.argsort(-scores.numpy(), kind='stable').copy())
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        if len(boxes):
            ious = _box_iou_xyxy(boxes[idx:idx + 1], boxes)[0]
            suppressed |= ious > iou_threshold
            suppressed[idx] = True
    return torch.tensor(keep, dtype=torch.long)


# ------------------------------------------------------------ the pipeline

class MaskData(dict):
    def cat(self, other):
        for k, v in other.items():
            if k not in self or self[k] is None:
                self[k] = v
            elif isinstance(v, torch.Tensor):
                self[k] = torch.cat([self[k], v], dim=0)
            else:
                self[k] = self[k] + v

    def filter(self, keep):
        for k, v in list(self.items()):
            if isinstance(v, torch.Tensor):
                self[k] = v[keep]
            else:
                self[k] = [v[i] for i in keep.tolist()]


class OracleMaskGenerator:
    """Upstream-semantics everything-mode around the repo's jax SAM.

    model/variables: a regda_tpu Sam (use dtype=float32 for decision
    stability). The decode runs through the repo's stock decode_points
    (model parity is covered by torch_sam_oracle.py); EVERYTHING after
    the raw (low-res logits, iou) pairs is this module's numpy/torch
    port of upstream post-processing.
    """

    def __init__(self, model, variables, points_per_side=32,
                 points_per_batch=64, pred_iou_thresh=0.88,
                 stability_score_thresh=0.95, stability_score_offset=1.0,
                 mask_threshold=0.0, box_nms_thresh=0.7, crop_n_layers=0,
                 crop_nms_thresh=0.7, crop_overlap_ratio=512 / 1500,
                 crop_n_points_downscale_factor=1):
        self.model = model
        self.variables = variables
        self.img_size = model.img_size
        self.point_grids = build_all_layer_point_grids(
            points_per_side, crop_n_layers, crop_n_points_downscale_factor)
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.mask_threshold = mask_threshold
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio

    # -- predictor plumbing (upstream ResizeLongestSide + set_image) -------
    def _preprocess(self, crop_np):
        """uint8 crop -> (1, S, S, 3) normalized f32 + (nh, nw).

        Float half-pixel bilinear via torch F.interpolate
        (align_corners=False) — an INDEPENDENT implementation of the
        repo's preprocessing contract (auto.SamAutomaticMaskGenerator
        ._preprocess). Upstream resizes the uint8 image through PIL
        (fixed-point + uint8 rounding); the repo deviates by <= 1/255
        per pixel (documented there), and this oracle tests the
        POST-PROCESSING pipeline, so it adopts the repo contract."""
        from regda_tpu.models.sam.auto import (SAM_PIXEL_MEAN, SAM_PIXEL_STD,
                                               preprocess_shape)
        h, w = crop_np.shape[:2]
        nh, nw = preprocess_shape(h, w, self.img_size)
        x = torch.from_numpy(crop_np.astype(np.float32)).permute(2, 0, 1)
        x = F.interpolate(x[None], (nh, nw), mode='bilinear',
                          align_corners=False, antialias=False)[0]
        img = x.permute(1, 2, 0).numpy()
        img = (img - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
        out = np.zeros((self.img_size, self.img_size, 3), np.float32)
        out[:nh, :nw] = img
        return out[None], (nh, nw)

    def _decode_raw(self, embedding, points_input_frame):
        """points (P, 2) in the 1024-resized frame -> (low-res logits
        torch (P*3, s, s), iou torch (P*3,)) via the repo's stock decode."""
        import jax.numpy as jnp
        pts = jnp.asarray(points_input_frame, jnp.float32)[:, None, :]
        lbs = jnp.ones(pts.shape[:2], jnp.int32)
        masks, iou = self.model.apply(self.variables, embedding, pts, lbs,
                                      method=self.model.decode_points)
        m = np.asarray(masks, np.float32)        # (P, 3, s, s)
        i = np.asarray(iou, np.float32)          # (P, 3)
        return (torch.from_numpy(m.reshape(-1, *m.shape[-2:]).copy()),
                torch.from_numpy(i.reshape(-1).copy()))

    def _postprocess_masks(self, lowres, nh, nw, ch, cw):
        """Upstream SamPredictor postprocess: low-res -> img_size bilinear
        -> unpad -> crop-size bilinear (align_corners=False both)."""
        x = F.interpolate(lowres[:, None], (self.img_size, self.img_size),
                          mode='bilinear', align_corners=False)
        x = x[..., :nh, :nw]
        x = F.interpolate(x, (ch, cw), mode='bilinear', align_corners=False)
        return x[:, 0]

    # -- upstream _process_batch / _process_crop / _generate_masks ---------
    def _process_batch(self, embedding, points, nh, nw, ch, cw, crop_box,
                       orig_size):
        orig_h, orig_w = orig_size
        scale = np.array([nw / cw, nh / ch], np.float32)
        lowres, iou_preds = self._decode_raw(embedding,
                                             points * scale[None])
        masks = self._postprocess_masks(lowres, nh, nw, ch, cw)
        data = MaskData(masks=masks, iou_preds=iou_preds)
        if self.pred_iou_thresh > 0.0:
            keep = data['iou_preds'] > self.pred_iou_thresh
            data.filter(torch.nonzero(keep)[:, 0])
        data['stability_score'] = calculate_stability_score(
            data['masks'], self.mask_threshold, self.stability_score_offset)
        if self.stability_score_thresh > 0.0:
            keep = data['stability_score'] >= self.stability_score_thresh
            data.filter(torch.nonzero(keep)[:, 0])
        data['masks'] = data['masks'] > self.mask_threshold
        data['boxes'] = batched_mask_to_box(data['masks'])
        keep = ~is_box_near_crop_edge(data['boxes'], crop_box,
                                      [0, 0, orig_w, orig_h])
        if not torch.all(keep):
            data.filter(torch.nonzero(keep)[:, 0])
        data['masks'] = uncrop_masks(data['masks'], crop_box, orig_h, orig_w)
        return data

    def _process_crop(self, image, crop_box, layer_idx, orig_size):
        import jax.numpy as jnp
        x0, y0, x1, y1 = crop_box
        crop = image[y0:y1, x0:x1]
        ch, cw = crop.shape[:2]
        pre, (nh, nw) = self._preprocess(crop)
        embedding = self.model.apply(self.variables, jnp.asarray(pre),
                                     method=self.model.encode)
        grid = self.point_grids[layer_idx] * np.array([cw, ch], np.float32)

        data = MaskData()
        pb = self.points_per_batch
        for lo in range(0, len(grid), pb):
            data.cat(self._process_batch(embedding, grid[lo:lo + pb],
                                         nh, nw, ch, cw, crop_box,
                                         orig_size))
        if len(data.get('boxes', ())) :
            keep = nms(data['boxes'].float(), data['iou_preds'],
                       self.box_nms_thresh)
            data.filter(keep)
            data['boxes'] = uncrop_boxes_xyxy(data['boxes'], crop_box)
        data['crop_boxes'] = torch.tensor(
            [crop_box] * len(data.get('boxes', ())))
        return data

    def generate(self, image_np):
        orig_size = image_np.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio)
        data = MaskData()
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            data.cat(self._process_crop(image_np, crop_box, layer_idx,
                                        orig_size))
        if len(crop_boxes) > 1 and len(data.get('boxes', ())):
            scores = 1.0 / ((data['crop_boxes'][:, 2]
                             - data['crop_boxes'][:, 0]).float()
                            * (data['crop_boxes'][:, 3]
                               - data['crop_boxes'][:, 1]).float())
            keep = nms(data['boxes'].float(), scores, self.crop_nms_thresh)
            data.filter(keep)
        anns = []
        n = len(data.get('boxes', ()))
        for i in range(n):
            m = data['masks'][i].numpy()
            anns.append(dict(segmentation=m, area=int(m.sum()),
                             predicted_iou=float(data['iou_preds'][i]),
                             stability_score=float(
                                 data['stability_score'][i]),
                             bbox=data['boxes'][i].tolist()))
        return anns

    def regions(self, image_np, area_threshold=1024):
        """The reference's SAM.get_local_regions paint loop
        (local_region_homog.py:51-56): sequential overwrite, id = i+1."""
        anns = self.generate(image_np)
        mask = np.zeros(image_np.shape[:2], np.int32)
        for i, ann in enumerate(anns):
            if ann['area'] >= area_threshold:
                mask[ann['segmentation']] = i + 1
        return mask
