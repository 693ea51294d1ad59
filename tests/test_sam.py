"""SAM tests: module shapes, everything-mode pipeline mechanics, converter
key mapping, and region-map packing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regda_tpu.models.sam import Sam, SamAutomaticMaskGenerator
from regda_tpu.models.sam.auto import (build_point_grid, generate_crop_boxes,
                                       nms_boxes, regions_from_anns)
from regda_tpu.models.sam.vit import window_partition, window_unpartition


@pytest.fixture(scope='module')
def tiny_sam():
    model = Sam(vit_config='vit_t', img_size=128)
    variables = model.init(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32))
    return model, variables


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 30, 30, 8)))
    win, pad_hw = window_partition(x, 14)
    assert win.shape == (2 * 3 * 3, 14, 14, 8)
    back = window_unpartition(win, 14, pad_hw, (30, 30))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_encoder_decoder_shapes(tiny_sam):
    model, variables = tiny_sam
    emb = model.apply(variables, jnp.zeros((1, 128, 128, 3)),
                      method=model.encode)
    assert emb.shape == (1, 8, 8, 256)
    masks, iou = model.apply(variables, emb,
                             jnp.zeros((5, 1, 2)), jnp.ones((5, 1), jnp.int32),
                             method=model.decode_points)
    assert masks.shape == (5, 3, 32, 32)  # 4x the embedding grid
    assert iou.shape == (5, 3)


def test_point_grid_and_crops():
    grid = build_point_grid(4)
    assert grid.shape == (16, 2)
    assert 0 < grid.min() and grid.max() < 1
    boxes, layers = generate_crop_boxes((512, 512), 1, 512 / 1500)
    assert boxes[0] == [0, 0, 512, 512] and layers[0] == 0
    assert len(boxes) == 5 and set(layers[1:]) == {1}
    # crops tile the image
    for x0, y0, x1, y1 in boxes[1:]:
        assert 0 <= x0 < x1 <= 512 and 0 <= y0 < y1 <= 512


def test_nms_boxes():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_boxes(boxes, scores, 0.5)
    assert list(keep) == [0, 2]


def test_regions_from_anns_area_filter():
    seg1 = np.zeros((64, 64), bool)
    seg1[:40, :40] = True  # 1600 px >= 1024
    seg2 = np.zeros((64, 64), bool)
    seg2[50:60, 50:60] = True  # 100 px < 1024
    anns = [{'segmentation': seg1, 'area': 1600},
            {'segmentation': seg2, 'area': 100}]
    reg = regions_from_anns(anns, (64, 64), 1024)
    assert reg.dtype == np.int32
    assert reg[0, 0] == 1 and reg[55, 55] == 0


def test_everything_mode_runs(tiny_sam):
    model, variables = tiny_sam
    gen = SamAutomaticMaskGenerator(
        model, variables, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=-1e9, stability_score_thresh=0.0,
        crop_n_layers=0, compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    image = rng.integers(0, 255, size=(96, 96, 3)).astype(np.uint8)
    anns = gen.generate(image)
    # with no thresholds, NMS output must be non-empty and well-formed
    assert len(anns) >= 1
    for a in anns:
        assert a['segmentation'].shape == (96, 96)
        assert a['area'] == int(a['segmentation'].sum())
        assert len(a['bbox']) == 4


def test_everything_mode_with_crops(tiny_sam):
    model, variables = tiny_sam
    gen = SamAutomaticMaskGenerator(
        model, variables, points_per_side=4, points_per_batch=8,
        pred_iou_thresh=-1e9, stability_score_thresh=0.0,
        crop_n_layers=1, crop_n_points_downscale_factor=2,
        compute_dtype=jnp.float32)
    image = np.random.default_rng(2).integers(
        0, 255, size=(96, 96, 3)).astype(np.uint8)
    anns = gen.generate(image)
    assert isinstance(anns, list)


def test_converter_roundtrip_keys():
    """Converter output paths must exactly match the flax tree for vit_t."""
    from regda_tpu.models.sam.convert import convert_sam_checkpoint
    model = Sam(vit_config='vit_t', img_size=128)
    variables = model.init(
        {'params': jax.random.PRNGKey(0)},
        jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32))

    # build a fake torch-style state dict shaped like the official ckpt for
    # the tiny config
    def flatten(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from flatten(v, prefix + (k,))
            else:
                yield prefix + (k,), v

    flax_paths = {p for p, _ in flatten(variables['params'])}

    state = {}
    D, HD = 64, 32  # embed_dim, head_dim*heads... (vit_t: 64 dim, 2 heads)
    win, grid = 14, 8
    for n in range(2):
        w = 'image_encoder.blocks.%d' % n
        state[f'{w}.norm1.weight'] = np.ones(D)
        state[f'{w}.norm1.bias'] = np.zeros(D)
        state[f'{w}.norm2.weight'] = np.ones(D)
        state[f'{w}.norm2.bias'] = np.zeros(D)
        state[f'{w}.attn.qkv.weight'] = np.zeros((3 * D, D))
        state[f'{w}.attn.qkv.bias'] = np.zeros(3 * D)
        state[f'{w}.attn.proj.weight'] = np.zeros((D, D))
        state[f'{w}.attn.proj.bias'] = np.zeros(D)
        size = 2 * grid - 1 if n == 1 else 2 * win - 1
        state[f'{w}.attn.rel_pos_h'] = np.zeros((size, D // 2))
        state[f'{w}.attn.rel_pos_w'] = np.zeros((size, D // 2))
        state[f'{w}.mlp.lin1.weight'] = np.zeros((4 * D, D))
        state[f'{w}.mlp.lin1.bias'] = np.zeros(4 * D)
        state[f'{w}.mlp.lin2.weight'] = np.zeros((D, 4 * D))
        state[f'{w}.mlp.lin2.bias'] = np.zeros(D)
    state['image_encoder.patch_embed.proj.weight'] = np.zeros((D, 3, 16, 16))
    state['image_encoder.patch_embed.proj.bias'] = np.zeros(D)
    state['image_encoder.pos_embed'] = np.zeros((1, grid, grid, D))
    state['image_encoder.neck.0.weight'] = np.zeros((256, D, 1, 1))
    state['image_encoder.neck.1.weight'] = np.ones(256)
    state['image_encoder.neck.1.bias'] = np.zeros(256)
    state['image_encoder.neck.2.weight'] = np.zeros((256, 256, 3, 3))
    state['image_encoder.neck.3.weight'] = np.ones(256)
    state['image_encoder.neck.3.bias'] = np.zeros(256)
    state['prompt_encoder.pe_layer.positional_encoding_gaussian_matrix'] = \
        np.zeros((2, 128))
    for i in range(4):
        state[f'prompt_encoder.point_embeddings.{i}.weight'] = np.zeros((1, 256))
    state['prompt_encoder.not_a_point_embed.weight'] = np.zeros((1, 256))
    state['prompt_encoder.no_mask_embed.weight'] = np.zeros((1, 256))
    md = 'mask_decoder'
    state[f'{md}.iou_token.weight'] = np.zeros((1, 256))
    state[f'{md}.mask_tokens.weight'] = np.zeros((4, 256))
    for n in range(2):
        base = f'{md}.transformer.layers.{n}'
        for attn, dim in (('self_attn', 256),
                          ('cross_attn_token_to_image', 128),
                          ('cross_attn_image_to_token', 128)):
            for p in ('q_proj', 'k_proj', 'v_proj'):
                state[f'{base}.{attn}.{p}.weight'] = np.zeros((dim, 256))
                state[f'{base}.{attn}.{p}.bias'] = np.zeros(dim)
            state[f'{base}.{attn}.out_proj.weight'] = np.zeros((256, dim))
            state[f'{base}.{attn}.out_proj.bias'] = np.zeros(256)
        for i in range(1, 5):
            state[f'{base}.norm{i}.weight'] = np.ones(256)
            state[f'{base}.norm{i}.bias'] = np.zeros(256)
        state[f'{base}.mlp.lin1.weight'] = np.zeros((2048, 256))
        state[f'{base}.mlp.lin1.bias'] = np.zeros(2048)
        state[f'{base}.mlp.lin2.weight'] = np.zeros((256, 2048))
        state[f'{base}.mlp.lin2.bias'] = np.zeros(256)
    for p in ('q_proj', 'k_proj', 'v_proj'):
        state[f'{md}.transformer.final_attn_token_to_image.{p}.weight'] = \
            np.zeros((128, 256))
        state[f'{md}.transformer.final_attn_token_to_image.{p}.bias'] = \
            np.zeros(128)
    state[f'{md}.transformer.final_attn_token_to_image.out_proj.weight'] = \
        np.zeros((256, 128))
    state[f'{md}.transformer.final_attn_token_to_image.out_proj.bias'] = \
        np.zeros(256)
    state[f'{md}.transformer.norm_final_attn.weight'] = np.ones(256)
    state[f'{md}.transformer.norm_final_attn.bias'] = np.zeros(256)
    state[f'{md}.output_upscaling.0.weight'] = np.zeros((256, 64, 2, 2))
    state[f'{md}.output_upscaling.0.bias'] = np.zeros(64)
    state[f'{md}.output_upscaling.1.weight'] = np.ones(64)
    state[f'{md}.output_upscaling.1.bias'] = np.zeros(64)
    state[f'{md}.output_upscaling.3.weight'] = np.zeros((64, 32, 2, 2))
    state[f'{md}.output_upscaling.3.bias'] = np.zeros(32)
    for n in range(4):
        for m in range(3):
            i, o = (256, 256) if m < 2 else (256, 32)
            state[f'{md}.output_hypernetworks_mlps.{n}.layers.{m}.weight'] = \
                np.zeros((o, i))
            state[f'{md}.output_hypernetworks_mlps.{n}.layers.{m}.bias'] = \
                np.zeros(o)
    for m in range(3):
        i, o = (256, 256) if m < 2 else (256, 4)
        state[f'{md}.iou_prediction_head.layers.{m}.weight'] = np.zeros((o, i))
        state[f'{md}.iou_prediction_head.layers.{m}.bias'] = np.zeros(o)

    converted = convert_sam_checkpoint(state)
    conv_paths = {p for p, _ in flatten(converted['params'])}
    assert conv_paths == flax_paths, (
        sorted(flax_paths - conv_paths)[:5], sorted(conv_paths - flax_paths)[:5])
    # shape agreement
    flax_leaves = dict(flatten(variables['params']))
    for p, v in flatten(converted['params']):
        assert np.shape(v) == flax_leaves[p].shape, (p, np.shape(v),
                                                     flax_leaves[p].shape)


def test_region_generator_matches_parity_path(tiny_sam):
    """The device-painted region map must partition pixels like the
    ann-downloading path (ids may differ; grouping must agree)."""
    from regda_tpu.models.sam.auto import (SamRegionGenerator,
                                           regions_from_anns)
    model, variables = tiny_sam
    kwargs = dict(points_per_side=4, points_per_batch=8,
                  pred_iou_thresh=-1e9, stability_score_thresh=0.0,
                  crop_n_layers=0, mask_budget=16)
    gen_ref = SamAutomaticMaskGenerator(model, variables, **kwargs)
    gen_dev = SamRegionGenerator(model, variables, **kwargs)
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8).astype(np.uint8)

    anns = gen_ref.generate(img)
    ref = regions_from_anns(anns, (64, 64), area_threshold=16)
    dev = gen_dev.generate_regions(img, area_threshold=16)
    assert dev.shape == (64, 64) and dev.dtype == np.int32
    assert (dev > 0).any()
    # same number of regions
    assert len(np.unique(dev)) == len(np.unique(ref))
    # grouping agreement: majority-map dev ids onto ref ids; the remapped
    # map must agree on almost all pixels (resize rounding tolerance)
    agree = 0
    for d in np.unique(dev):
        sel = dev == d
        ref_ids, cnts = np.unique(ref[sel], return_counts=True)
        agree += cnts.max()
    # random-weight logits sit at the 0 threshold, so the two paths'
    # different (but individually correct) preprocessing — host PIL vs
    # device bilinear — flips noise-level boundary pixels; with trained
    # weights masks are confident and the paths coincide
    assert agree / dev.size > 0.85


def test_region_generator_with_crop_pyramid(tiny_sam):
    from regda_tpu.models.sam.auto import SamRegionGenerator
    model, variables = tiny_sam
    gen = SamRegionGenerator(model, variables, points_per_side=4,
                             points_per_batch=8, pred_iou_thresh=-1e9,
                             stability_score_thresh=0.0, crop_n_layers=1,
                             mask_budget=16)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8).astype(np.uint8)
    out = gen.generate_regions(img, area_threshold=4)
    assert out.shape == (64, 64)
    assert out.min() >= 0


def test_generate_regions_batch_matches_single(tiny_sam):
    from regda_tpu.models.sam.auto import SamRegionGenerator
    model, variables = tiny_sam
    gen = SamRegionGenerator(model, variables, points_per_side=4,
                             points_per_batch=8, pred_iou_thresh=-1e9,
                             stability_score_thresh=0.0, crop_n_layers=0,
                             mask_budget=16)
    rng = np.random.RandomState(2)
    tiles = [rng.randint(0, 255, (64, 64, 3), np.uint8).astype(np.uint8)
             for _ in range(3)]
    batched = gen.generate_regions_batch(tiles, area_threshold=16)
    singles = [gen.generate_regions(t, area_threshold=16) for t in tiles]
    for b, s in zip(batched, singles):
        np.testing.assert_array_equal(b, s)


def test_generate_regions_empty_skips_download(tiny_sam):
    """When no candidate survives the filters, the region maps are the
    all-zeros canvas — round 5 skips the (slow-link) canvas download for
    that case entirely, so the empty result must still come back with
    the right shape/dtype from BOTH the batch and single paths."""
    from regda_tpu.models.sam.auto import SamRegionGenerator
    model, variables = tiny_sam
    gen = SamRegionGenerator(model, variables, points_per_side=4,
                             points_per_batch=8, pred_iou_thresh=1e9,
                             stability_score_thresh=1.0, crop_n_layers=0,
                             mask_budget=16)
    rng = np.random.RandomState(4)
    tiles = [rng.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(2)]
    maps = gen.generate_regions_batch(tiles)
    assert len(maps) == 2
    for m in maps:
        assert m.shape == (64, 64) and m.dtype == np.int32
        assert not m.any()
    single = gen.generate_regions(tiles[0])
    assert single.shape == (64, 64) and single.dtype == np.int32
    assert not single.any()


def test_generate_regions_stream_matches_batch(tiny_sam):
    """The pipelined stream API (depth-3 in-flight batches since round 5)
    must yield bit-identical maps, in order, to per-batch
    generate_regions_batch — with 3 batches the default depth keeps the
    whole input in flight at once, the strongest-overlap case."""
    from regda_tpu.models.sam.auto import SamRegionGenerator
    model, variables = tiny_sam
    gen = SamRegionGenerator(model, variables, points_per_side=4,
                             points_per_batch=8, pred_iou_thresh=-1e9,
                             stability_score_thresh=0.0, crop_n_layers=0,
                             mask_budget=16)
    rng = np.random.RandomState(11)
    batches = [[rng.randint(0, 255, (64, 64, 3), np.uint8)
                for _ in range(2)] for _ in range(3)]
    streamed = list(gen.generate_regions_stream(iter(batches),
                                                area_threshold=16))
    assert len(streamed) == len(batches)
    for tiles, maps in zip(batches, streamed):
        ref = gen.generate_regions_batch(tiles, area_threshold=16)
        for a, b in zip(maps, ref):
            np.testing.assert_array_equal(a, b)


def test_generate_regions_batch_matches_single_crop_pyramid(tiny_sam):
    """The pyramid-BATCHED phase 1 (all crop positions of a tile encoded
    in one batched ViT pass) must reproduce the sequential per-crop path
    at the reference configuration crop_n_layers=1
    (local_region_homog.py:37)."""
    from regda_tpu.models.sam.auto import SamRegionGenerator
    model, variables = tiny_sam
    gen = SamRegionGenerator(model, variables, points_per_side=4,
                             points_per_batch=8, pred_iou_thresh=-1e9,
                             stability_score_thresh=0.0, crop_n_layers=1,
                             crop_n_points_downscale_factor=2,
                             mask_budget=16, compute_dtype=jnp.float32)
    rng = np.random.RandomState(7)
    tiles = [rng.randint(0, 255, (64, 64, 3), np.uint8).astype(np.uint8)
             for _ in range(2)]
    batched = gen.generate_regions_batch(tiles, area_threshold=4)
    singles = [gen.generate_regions(t, area_threshold=4) for t in tiles]
    for b, s in zip(batched, singles):
        np.testing.assert_array_equal(b, s)


def test_exact_stability_matrices_match_stepwise_chain(tiny_sam):
    """The composed (crop, low) matrices must reproduce upstream
    postprocess_masks' stepwise chain: low -> img_size bilinear, unpad to
    (nh, nw), -> (ch, cw) bilinear (all half-pixel)."""
    from regda_tpu.ops.resize import resize_bilinear_half_pixel
    from regda_tpu.models.sam.auto import SamAutomaticMaskGenerator
    model, variables = tiny_sam
    gen = SamAutomaticMaskGenerator(model, variables,
                                    stability_on_upscaled=True)
    low = 32
    nh, nw, ch, cw = gen.img_size, gen.img_size * 3 // 4, 96, 72
    m_h, m_w = gen._exact_stability_matrices((nh, nw, ch, cw), low)
    rng = np.random.RandomState(0)
    x = rng.randn(low, low).astype(np.float32)
    xj = jnp.asarray(x)[..., None]
    step = resize_bilinear_half_pixel(xj[None],
                                      (gen.img_size, gen.img_size))[0]
    step = step[:nh, :nw]
    step = resize_bilinear_half_pixel(step[None], (ch, cw))[0, ..., 0]
    fused = m_h @ x @ m_w.T
    np.testing.assert_allclose(fused, np.asarray(step), rtol=1e-4,
                               atol=1e-4)


def _stats_reference(logits_np, m_h, m_wt, ch, cw):
    """numpy reference for mask_stats_fused: composed resize -> binarize
    at crop res -> INCLUSIVE boxes ([0,0,0,0] empty) + areas + padded
    bit-pack."""
    y = np.einsum('hs,msw->mhw', m_h, logits_np.astype(np.float32))
    y = np.einsum('mhw,wc->mhc', y, m_wt)
    masks = y > 0.0
    chp, cwp = -(-ch // 8) * 8, -(-cw // 128) * 128
    bits = np.zeros((len(masks), chp, cwp), np.uint8)
    bits[:, :ch, :cw] = masks
    packed = np.packbits(bits, axis=-1)
    boxes, areas = [], []
    for mm in masks:
        ys, xs = np.nonzero(mm)
        boxes.append([xs.min(), ys.min(), xs.max(), ys.max()]
                     if ys.size else [0, 0, 0, 0])
        areas.append(ys.size)
    return (packed, np.asarray(boxes, np.float32),
            np.asarray(areas, np.float32), masks)


def test_mask_stats_fused_matches_xla_path():
    """pallas_stats.mask_stats_fused (interpret off-TPU) == the stepwise
    numpy reference: composed-matrix resize to CROP resolution ->
    threshold -> bit-pack + inclusive box/area reductions (upstream
    postprocess_masks + batched_mask_to_box semantics)."""
    from regda_tpu.models.sam.pallas_stats import mask_stats_fused
    from regda_tpu.ops.resize import _interp_matrix_half_pixel
    rng = np.random.RandomState(0)
    m, s = 5, 32
    ch, cw = 100, 96
    m_h = _interp_matrix_half_pixel(s, ch).astype(np.float32)
    m_wt = _interp_matrix_half_pixel(s, cw).T.astype(np.float32)
    logits = rng.randn(m, s, s).astype(np.float32)
    packed, boxes, areas = mask_stats_fused(
        jnp.asarray(logits), jnp.asarray(m_h), jnp.asarray(m_wt), ch, cw)
    wp, wb, wa, _ = _stats_reference(logits, m_h, m_wt, ch, cw)
    np.testing.assert_array_equal(np.asarray(packed), wp)
    np.testing.assert_allclose(np.asarray(boxes), wb)
    np.testing.assert_allclose(np.asarray(areas), wa)


def test_region_generator_exact_stability_runs(tiny_sam):
    """End-to-end region generation with the upstream-parity stability
    mode (stability_on_upscaled=True), single and batched, crop pyramid."""
    from regda_tpu.models.sam.auto import SamRegionGenerator
    model, variables = tiny_sam
    gen = SamRegionGenerator(model, variables, points_per_side=4,
                             points_per_batch=8, pred_iou_thresh=-1e9,
                             stability_score_thresh=0.0, crop_n_layers=1,
                             crop_n_points_downscale_factor=2,
                             mask_budget=16, compute_dtype=jnp.float32,
                             stability_on_upscaled=True)
    rng = np.random.RandomState(11)
    tiles = [rng.randint(0, 255, (64, 64, 3), np.uint8).astype(np.uint8)
             for _ in range(2)]
    batched = gen.generate_regions_batch(tiles, area_threshold=4)
    singles = [gen.generate_regions(t, area_threshold=4) for t in tiles]
    for b, s in zip(batched, singles):
        np.testing.assert_array_equal(b, s)


def test_region_generator_budget_exceeds_grid(tiny_sam):
    """mask_budget larger than the candidate count (grid*3) must not crash
    the paint path (id vectors are sized to the actual selection)."""
    from regda_tpu.models.sam.auto import SamRegionGenerator
    model, variables = tiny_sam
    gen = SamRegionGenerator(model, variables, points_per_side=2,
                             points_per_batch=4, pred_iou_thresh=-1e9,
                             stability_score_thresh=0.0, crop_n_layers=0,
                             mask_budget=256)
    img = np.random.RandomState(3).randint(0, 255, (64, 64, 3),
                                           np.uint8).astype(np.uint8)
    out = gen.generate_regions(img, area_threshold=4)
    assert out.shape == (64, 64)
    outs = gen.generate_regions_batch([img, img], area_threshold=4)
    np.testing.assert_array_equal(outs[0], out)


def test_budget_skip_matches_vmap_path(tiny_sam):
    """The budget-skip batched decode (lax.cond chunk skip + scan-folded
    selection) must produce region maps bit-identical to the branch-free
    vmap path (REGDA_NO_BUDGET_SKIP=1), in both regimes: budget fills
    early (permissive thresholds -> later chunks actually skip) and
    budget never fills (impossible thresholds -> every chunk live,
    nothing selected)."""
    import os
    from regda_tpu.models.sam.auto import SamRegionGenerator
    model, variables = tiny_sam
    rng = np.random.RandomState(21)
    tiles = [rng.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(2)]
    for thr_iou, thr_st in ((-1e9, 0.0), (2.0, 1.1)):
        gen = SamRegionGenerator(model, variables, points_per_side=4,
                                 points_per_batch=8,
                                 pred_iou_thresh=thr_iou,
                                 stability_score_thresh=thr_st,
                                 crop_n_layers=1,
                                 crop_n_points_downscale_factor=2,
                                 mask_budget=16)
        skip_on = gen.generate_regions_batch(tiles, area_threshold=4)
        os.environ['REGDA_NO_BUDGET_SKIP'] = '1'
        try:
            gen2 = SamRegionGenerator(model, variables, points_per_side=4,
                                      points_per_batch=8,
                                      pred_iou_thresh=thr_iou,
                                      stability_score_thresh=thr_st,
                                      crop_n_layers=1,
                                      crop_n_points_downscale_factor=2,
                                      mask_budget=16)
            skip_off = gen2.generate_regions_batch(tiles, area_threshold=4)
        finally:
            del os.environ['REGDA_NO_BUDGET_SKIP']
        for a, b in zip(skip_on, skip_off):
            np.testing.assert_array_equal(a, b)


def test_subpixel_convt_equals_conv_transpose():
    """SubpixelConvT must be numerically identical to ConvTranspose
    (2, 2)/s2 with the same kernel/bias params."""
    import flax.linen as nn
    from regda_tpu.models.sam.decoder import SubpixelConvT
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 7, 6).astype(np.float32))
    ref_mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    sub_mod = SubpixelConvT(4)
    v = ref_mod.init(jax.random.PRNGKey(0), x)
    ref = ref_mod.apply(v, x)
    got = sub_mod.apply(v, x)        # identical param tree
    assert got.shape == ref.shape == (2, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_decoder_shared_dense_batch_equivalent(tiny_sam):
    """Batch-1 dense prompt (shared-keys fast path) must produce the same
    masks/ious as the per-prompt broadcast dense."""
    model, variables = tiny_sam
    emb = model.apply(variables, jnp.zeros((1, 128, 128, 3)),
                      method=model.encode)
    pts = jnp.asarray(np.random.RandomState(0).rand(5, 1, 2) * 128,
                      jnp.float32)
    lbs = jnp.ones((5, 1), jnp.int32)

    def dec(dense_batch):
        def fn(mdl):
            sparse, dense = mdl.prompt_encoder(pts, lbs)
            pe = mdl.prompt_encoder.get_dense_pe()
            d = dense[:1] if dense_batch == 1 else dense
            return mdl.mask_decoder(emb, pe, sparse, d)
        return nn_apply(model, variables, fn)

    import flax.linen as nn_mod

    def nn_apply(mdl, vs, fn):
        return nn_mod.apply(fn, mdl)(vs)

    m1, i1 = dec(1)
    mb, ib = dec(5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(mb),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(ib),
                               rtol=1e-4, atol=1e-4)


def test_upscale_linear_matches_conv_transpose():
    """UpscaleLinear + manual depth-to-space == nn.ConvTranspose(2,2)/s2
    on the identical param tree."""
    import flax.linen as nn
    from regda_tpu.models.sam.decoder import UpscaleLinear
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 5, 7, 6).astype(np.float32))
    ref_mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    new_mod = UpscaleLinear(4)
    v = ref_mod.init(jax.random.PRNGKey(0), x)
    ref = ref_mod.apply(v, x)
    got = new_mod.apply(v, x)            # (2, 5, 7, 2, 2, 4)
    assert got.shape == (2, 5, 7, 2, 2, 4)
    inter = got.transpose(0, 1, 3, 2, 4, 5).reshape(2, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(inter), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('fused', [False, True])
def test_mask_decoder_fast_variants_equal_stock(fused):
    """mask_decoder_fast (GEMM and Pallas-fused upscale) equals the
    stock flax decoder in f32 (the Pallas kernel runs in interpreter
    mode off-TPU)."""
    from regda_tpu.models.sam.decoder import MaskDecoder
    from regda_tpu.models.sam.fast_decoder import mask_decoder_fast
    dec = MaskDecoder(dtype=jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 256))
    pe = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 256))
    sparse = jax.random.normal(jax.random.PRNGKey(3), (5, 2, 256))
    dense = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 256))
    variables = dec.init(jax.random.PRNGKey(0), emb, pe, sparse, dense)
    m0, i0 = dec.apply(variables, emb, pe, sparse, dense)
    m1, i1 = mask_decoder_fast(variables['params'], emb, pe, sparse, dense,
                               dtype=jnp.float32, fused_upscale=fused)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i0),
                               rtol=1e-4, atol=1e-4)


def test_attention_pallas_fused_equals_stock():
    """Global attention with the fused Pallas rel-bias kernel == the stock
    XLA path on the identical param tree (f32, interpret mode off-TPU)."""
    from regda_tpu.models.sam.vit import Attention
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
    stock = Attention(64, 2, input_size=(8, 8), dtype=jnp.float32)
    fused = Attention(64, 2, input_size=(8, 8), dtype=jnp.float32,
                      pallas_fused=True)
    v = stock.init(jax.random.PRNGKey(1), x)
    # zeros-init rel tables are degenerate; use random ones
    v = jax.tree.map(lambda a: jax.random.normal(
        jax.random.PRNGKey(int(np.prod(a.shape)) % 2**31), a.shape) * 0.1, v)
    ref = stock.apply(v, x)
    got = fused.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_region_generator_mesh_sharded_matches_single(tiny_sam):
    """generate_regions_batch over a 2-device data mesh == a 1-device mesh
    (sharding the tile axis must not change any tile's result; the
    unsharded path differs only by vmap-vs-single float association, which
    can permute score-ordered region ids)."""
    from jax.sharding import Mesh
    from regda_tpu.models.sam.auto import SamRegionGenerator
    model, variables = tiny_sam
    kwargs = dict(points_per_side=4, points_per_batch=8,
                  pred_iou_thresh=-1e9, stability_score_thresh=0.0,
                  crop_n_layers=0, compute_dtype=jnp.float32)
    rng = np.random.RandomState(7)
    tiles = [rng.randint(0, 255, (64, 64, 3), np.uint8).astype(np.uint8)
             for _ in range(4)]
    mesh1 = Mesh(np.array(jax.devices()[:1]), ('data',))
    ref = SamRegionGenerator(model, variables, mesh=mesh1,
                             **kwargs).generate_regions_batch(
                                 tiles, area_threshold=4)
    mesh2 = Mesh(np.array(jax.devices()[:2]), ('data',))
    got = SamRegionGenerator(model, variables, mesh=mesh2,
                             **kwargs).generate_regions_batch(
                                 tiles, area_threshold=4)
    for i, (g, r) in enumerate(zip(got, ref)):
        assert g.shape == r.shape and g.max() > 0
        np.testing.assert_array_equal(g, r, err_msg=f'tile {i}')


def test_pallas_layernorm_matches_stock():
    """pallas_ln.layernorm (interpret off-TPU) == the two-pass f32 LN on
    3-D inputs at both encoder and decoder shapes/eps."""
    from regda_tpu.models.sam.pallas_ln import layernorm
    rng = np.random.RandomState(0)
    for shape, eps in [((2, 4096, 256), 1e-5), ((1, 64, 64, 96), 1e-6)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        w = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
        b = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
        got = layernorm(x, w, b, eps=eps)
        xf = np.asarray(x, np.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        ref = (xf - mu) / np.sqrt(var + eps) * np.asarray(w) + np.asarray(b)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5,
                                   atol=2e-5)


def test_pallas_layernorm_nondivisible_rows():
    """Row counts with no small power-of-two divisor (the 5-crop pyramid's
    window-padded (5*70*70, C) = 24500 rows) must pad-and-slice instead of
    taking the whole array as ONE block — that block form OOM'd the 16 MB
    scoped VMEM on the real chip (103 MB at (24500, 768))."""
    from regda_tpu.models.sam.pallas_ln import layernorm, _stock
    rng = np.random.RandomState(1)
    for shape in [(5, 70, 70, 256), (3, 196, 128)]:
        rows = int(np.prod(shape[:-1]))
        assert all(rows % cand for cand in (512, 256, 128, 64))
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        w = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
        b = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
        got = layernorm(x, w, b)
        want = _stock(x, w, b, 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_sam_kernels_differentiable():
    """All three SAM Pallas kernels have custom VJPs: gradients through
    the fused forward == gradients of the stock XLA twin."""
    rng = np.random.RandomState(0)

    from regda_tpu.models.sam.pallas_ln import layernorm, _stock as ln_stock
    x = jnp.asarray(rng.randn(2, 64, 96).astype(np.float32))
    w = jnp.asarray(rng.randn(96).astype(np.float32))
    b = jnp.asarray(rng.randn(96).astype(np.float32))
    g1 = jax.grad(lambda a, s, c: jnp.sum(layernorm(a, s, c) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda a, s, c: jnp.sum(ln_stock(a, s, c, 1e-6) ** 2),
                  argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-4)

    from regda_tpu.models.sam.pallas_attention import (
        attention_with_rel_bias, _attn_stock)
    # kernel layouts: qkv (3, B, H, N, D), rel biases (B, H, N, K)
    qkv = jnp.asarray(rng.randn(3, 2, 2, 16, 32).astype(np.float32))
    rh = jnp.asarray(rng.randn(2, 2, 16, 4).astype(np.float32))
    rw = jnp.asarray(rng.randn(2, 2, 16, 4).astype(np.float32))
    fn = lambda *a: jnp.sum(attention_with_rel_bias(
        *a, scale=0.25, kh=4, kw=4) ** 2)
    fs = lambda *a: jnp.sum(_attn_stock(*a, 0.25, 4, 4) ** 2)
    g1 = jax.grad(fn, argnums=(0, 1, 2))(qkv, rh, rw)
    g2 = jax.grad(fs, argnums=(0, 1, 2))(qkv, rh, rw)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-3, atol=1e-3)

    from regda_tpu.models.sam.pallas_upscale import (
        upscale_hyper_masks, _upscale_stock)
    src = jnp.asarray(rng.randn(1, 8, 8, 64).astype(np.float32))
    hyper = jnp.asarray(rng.randn(1, 4, 8).astype(np.float32))
    k1 = jnp.asarray(rng.randn(64, 64).astype(np.float32))
    b1 = jnp.asarray(rng.randn(1, 64).astype(np.float32))
    lnw = jnp.asarray(rng.randn(1, 16).astype(np.float32))
    lnb = jnp.asarray(rng.randn(1, 16).astype(np.float32))
    k2 = jnp.asarray(rng.randn(16, 32).astype(np.float32))
    b2 = jnp.asarray(rng.randn(1, 32).astype(np.float32))
    args = (src, hyper, k1, b1, lnw, lnb, k2, b2)
    fn = lambda *a: jnp.sum(upscale_hyper_masks(*a) ** 2)
    fs = lambda *a: jnp.sum(_upscale_stock(*a, jnp.float32) ** 2)
    g1 = jax.grad(fn, argnums=tuple(range(8)))(*args)
    g2 = jax.grad(fs, argnums=tuple(range(8)))(*args)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-3, atol=1e-3)


def test_two_way_transformer_fused2_equals_stock():
    """The prompt-resident fused two-way kernel path (pallas_twoway.py,
    interpret mode off-TPU) == the stock dense transformer."""
    from regda_tpu.models.sam.decoder import MaskDecoder
    from regda_tpu.models.sam.fast_decoder import (
        two_way_transformer_dense, two_way_transformer_fused2)
    dec = MaskDecoder(dtype=jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 256))
    pe = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 256))
    sparse = jax.random.normal(jax.random.PRNGKey(3), (5, 2, 256))
    dense = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 256))
    variables = dec.init(jax.random.PRNGKey(0), emb, pe, sparse, dense)
    params = variables['params']['transformer']
    tokens = jax.random.normal(jax.random.PRNGKey(5), (5, 7, 256))
    q0, k0 = two_way_transformer_dense(params, emb, pe, tokens)
    q1, k1 = two_way_transformer_fused2(params, emb, pe, tokens)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k0),
                               rtol=1e-4, atol=1e-4)


def test_two_way_fused_kernel_differentiable():
    """pallas_twoway has a custom VJP: gradients through the fused kernel
    == gradients of the stock XLA twin."""
    from regda_tpu.models.sam.pallas_twoway import (
        NP, two_way_fused, _twoway_stock)
    rng = np.random.RandomState(0)
    b, t, c, d = 2, 64, 256, 128
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    ktok0, vtok0 = f(b, NP, d), f(b, NP, d)
    q1, qpe = f(b, NP, c), f(b, NP, c)
    keys0, pe = f(t, c), f(t, c)
    qimg0 = f(t, d)
    maskb = jnp.where(jnp.arange(NP) < 7, 0.0, -1e9)[None].astype(
        jnp.float32)
    wk = {'wo0': f(d, c), 'bo0': f(c), 'n40w': f(c), 'n40b': f(c),
          'wqt': f(c, d), 'bqt': f(d), 'wkt': f(c, d), 'bkt': f(d),
          'wvt': f(c, d), 'bvt': f(d), 'wot': f(d, c), 'bot': f(c),
          'n2w': f(c), 'n2b': f(c),
          'w1': f(c, 512), 'b1': f(512), 'w2': f(512, c), 'b2': f(c),
          'n3w': f(c), 'n3b': f(c),
          'wqi': f(c, d), 'bqi': f(d), 'wki': f(c, d), 'bki': f(d),
          'wvi': f(c, d), 'bvi': f(d), 'woi': f(d, c), 'boi': f(c),
          'n41w': f(c), 'n41b': f(c),
          'wqf': f(c, d), 'bqf': f(d), 'wkf': f(c, d), 'bkf': f(d),
          'wvf': f(c, d), 'bvf': f(d), 'wof': f(d, c), 'bof': f(c),
          'nfw': f(c), 'nfb': f(c)}
    ops = (ktok0, vtok0, q1, qpe, keys0, pe, qimg0, maskb, wk)

    # forward parity vs the stock twin
    k2a, qa = two_way_fused(ops)
    k2b, qb = _twoway_stock(ops, 8)
    np.testing.assert_allclose(np.asarray(k2a), np.asarray(k2b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(qa[:, :7]), np.asarray(qb[:, :7]),
                               rtol=1e-4, atol=1e-4)

    def loss_fused(ops):
        k2, q = two_way_fused(ops)
        return jnp.sum(k2 ** 2) + jnp.sum(q[:, :7] ** 2)

    def loss_stock(ops):
        k2, q = _twoway_stock(ops, 8)
        return jnp.sum(k2 ** 2) + jnp.sum(q[:, :7] ** 2)

    g1 = jax.grad(loss_fused)(ops)
    g2 = jax.grad(loss_stock)(ops)
    for a, ref in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


def test_persistent_windowed_layout_equals_per_block():
    """Two consecutive windowed Blocks in PERSISTENT layout (partition
    once, stay windowed, unpartition once — vit.py Block windowed_in/out)
    must equal the stock per-block partition/unpartition path, on a grid
    that needs padding (20 % 14 != 0) so the pad re-zeroing is exercised."""
    from regda_tpu.models.sam.vit import Block

    dim, heads, ws = 32, 2, 14
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 20, dim))
    b0 = Block(dim, heads, window_size=ws, input_size=(20, 20),
               dtype=jnp.float32)
    b1 = Block(dim, heads, window_size=ws, input_size=(20, 20),
               dtype=jnp.float32)
    v0 = b0.init(jax.random.PRNGKey(1), x)
    v1 = b1.init(jax.random.PRNGKey(2), x)

    # stock: each block partitions + unpartitions
    y_stock = b1.apply(v1, b0.apply(v0, x))
    # persistent: block 0 leaves the tensor windowed, block 1 consumes it
    y_pers = b1.apply(v1, b0.apply(v0, x, windowed_out=True),
                      windowed_in=True)
    assert y_pers.shape == y_stock.shape == x.shape
    np.testing.assert_allclose(np.asarray(y_pers), np.asarray(y_stock),
                               rtol=2e-5, atol=2e-5)


def test_encoder_persistent_layout_sequencing():
    """ImageEncoderViT's layout plan (partition once per windowed run)
    must reproduce per-block stock application of the SAME block params,
    at a padded grid (320/16 = 20 tokens, window 14)."""
    from regda_tpu.models.sam.vit import (Block, ImageEncoderViT, PatchEmbed,
                                          LayerNorm2d)
    import flax.linen as nn

    enc = ImageEncoderViT(img_size=320, patch_size=16, embed_dim=32,
                          depth=3, num_heads=2, out_chans=16,
                          window_size=14, global_attn_indexes=(2,),
                          dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 320, 320, 3))
    v = enc.init({'params': jax.random.PRNGKey(1)}, x)
    out = enc.apply(v, x)

    # manual: patch embed + pos, then stock per-block calls, then neck
    p = v['params']
    pe = PatchEmbed(32, 16, dtype=jnp.float32)
    y = pe.apply({'params': p['patch_embed']}, x) + p['pos_embed']
    for i, ws in enumerate([14, 14, 0]):
        blk = Block(32, 2, window_size=ws, input_size=(20, 20),
                    dtype=jnp.float32)
        y = blk.apply({'params': p[f'block{i}']}, y)
    y = nn.Conv(16, (1, 1), use_bias=False,
                dtype=jnp.float32).apply({'params': p['neck_conv1']}, y)
    y = LayerNorm2d().apply({'params': p['neck_ln1']}, y)
    y = nn.Conv(16, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                dtype=jnp.float32).apply({'params': p['neck_conv2']}, y)
    y = LayerNorm2d().apply({'params': p['neck_ln2']}, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y),
                               rtol=2e-5, atol=2e-5)


def test_mask_stats_fused_active_gating():
    """Slots with active=False are skipped (garbage out); active slots
    must be bit-identical to the all-active run."""
    from regda_tpu.models.sam.pallas_stats import mask_stats_fused
    from regda_tpu.ops.resize import _interp_matrix_half_pixel
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(6, 32, 32).astype(np.float32) * 3)
    m_h = jnp.asarray(_interp_matrix_half_pixel(32, 100), jnp.float32)
    m_wt = jnp.asarray(_interp_matrix_half_pixel(32, 96).T, jnp.float32)
    active = jnp.asarray(np.array([1, 0, 1, 1, 0, 1], np.int32))
    pf, bf, af = mask_stats_fused(logits, m_h, m_wt, 100, 96,
                                  interpret=True)
    pa, ba, aa = mask_stats_fused(logits, m_h, m_wt, 100, 96,
                                  interpret=True, active=active)
    idx = np.nonzero(np.asarray(active))[0]
    np.testing.assert_array_equal(np.asarray(pa)[idx], np.asarray(pf)[idx])
    np.testing.assert_array_equal(np.asarray(ba)[idx], np.asarray(bf)[idx])
    np.testing.assert_array_equal(np.asarray(aa)[idx], np.asarray(af)[idx])


def test_mask_stats_fused_active_vmapped():
    """The crop group vmaps the fused stats over positions with per-
    position active flags — interpret-mode parity vs per-position calls."""
    from regda_tpu.models.sam.pallas_stats import mask_stats_fused
    from regda_tpu.ops.resize import _interp_matrix_half_pixel
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(3, 4, 32, 32).astype(np.float32) * 3)
    m_h = jnp.asarray(_interp_matrix_half_pixel(32, 100), jnp.float32)
    m_wt = jnp.asarray(_interp_matrix_half_pixel(32, 96).T, jnp.float32)
    active = jnp.asarray((rng.rand(3, 4) > 0.4).astype(np.int32))
    fn = jax.vmap(lambda l, a: mask_stats_fused(l, m_h, m_wt, 100, 96,
                                                interpret=True, active=a))
    pv, bv, av = fn(logits, active)
    for p in range(3):
        pf, bf, af = mask_stats_fused(logits[p], m_h, m_wt, 100, 96,
                                      interpret=True)
        idx = np.nonzero(np.asarray(active[p]))[0]
        np.testing.assert_array_equal(np.asarray(pv[p])[idx],
                                      np.asarray(pf)[idx])
        np.testing.assert_array_equal(np.asarray(bv[p])[idx],
                                      np.asarray(bf)[idx])
        np.testing.assert_array_equal(np.asarray(av[p])[idx],
                                      np.asarray(af)[idx])


def test_twostep_upscale_iou_gate():
    """The two-step path's IoU gate (upscale kernel `active` flags,
    computed from the EXACT iou array the caller filters on): gated rows
    zero, surviving rows identical, iou untouched."""
    from regda_tpu.models.sam.decoder import MaskDecoder
    from regda_tpu.models.sam.fast_decoder import mask_decoder_fast

    dec = MaskDecoder(dtype=jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 256)) * 0.5
    pe = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 256)) * 0.5
    sparse = jax.random.normal(jax.random.PRNGKey(3), (6, 2, 256)) * 0.5
    dense = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 256)) * 0.5
    params = dec.init(jax.random.PRNGKey(0), emb, pe, sparse,
                      dense)['params']
    m0, i0 = mask_decoder_fast(params, emb, pe[0], sparse, dense,
                               fused_upscale=True)
    m0, i0 = np.asarray(m0), np.asarray(i0)
    thr = float(np.median(i0.max(1)))
    m1, i1 = mask_decoder_fast(params, emb, pe[0], sparse, dense,
                               fused_upscale=True, iou_gate_thresh=thr)
    m1 = np.asarray(m1)
    np.testing.assert_allclose(np.asarray(i1), i0, rtol=2e-5, atol=2e-5)
    n_zero = 0
    for r in range(m1.shape[0]):
        if i0[r].max() > thr:
            np.testing.assert_allclose(m1[r], m0[r], rtol=2e-5, atol=2e-5)
        else:
            # exact gate: the SAME iou array decides, so every failing
            # prompt is zeroed, no margin band
            assert np.abs(m1[r]).max() == 0.0
            n_zero += 1
    assert n_zero == int((i0.max(1) <= thr).sum()) and n_zero >= 1


def test_stability_counts_fused_matches_xla_twin():
    """pallas_stability.stability_counts_fused (interpret off-TPU) == the
    group-scanned einsum twin, including non-(8,128)-divisible crop frames
    and per-candidate active gating."""
    from regda_tpu.models.sam.pallas_stability import (
        stability_counts_fused, stability_counts_xla)
    from regda_tpu.ops.resize import _interp_matrix_half_pixel
    rng = np.random.RandomState(1)
    m, s, ch, cw = 7, 32, 51, 77
    m_h = jnp.asarray(_interp_matrix_half_pixel(s, ch), jnp.float32)
    m_wt = jnp.asarray(_interp_matrix_half_pixel(s, cw).T, jnp.float32)
    logits = jnp.asarray(rng.randn(m, s, s).astype(np.float32)) * 2.0

    i_g, u_g = stability_counts_fused(logits, m_h, m_wt, offset=1.0)
    i_w, u_w = stability_counts_xla(logits, m_h, m_wt, offset=1.0)
    np.testing.assert_allclose(np.asarray(i_g), np.asarray(i_w), atol=1)
    np.testing.assert_allclose(np.asarray(u_g), np.asarray(u_w), atol=1)
    # union ~ pixels above -1: must be well below the padded frame area
    # (zero-padded resize rows would each contribute cw to union)
    assert float(np.max(u_g)) <= ch * cw

    act = jnp.asarray((np.arange(m) % 2).astype(np.int32))
    i_a, u_a = stability_counts_fused(logits, m_h, m_wt, offset=1.0,
                                      active=act)
    keep = np.asarray(act, bool)
    np.testing.assert_allclose(np.asarray(i_a)[keep],
                               np.asarray(i_w)[keep], atol=1)
    np.testing.assert_allclose(np.asarray(u_a)[keep],
                               np.asarray(u_w)[keep], atol=1)

    # grouped programs: m=7 with group=4 pads to 8 (one inactive pad
    # slot), group=2 divides with a gated slot in every program
    for grp in (4, 2):
        i_g2, u_g2 = stability_counts_fused(logits, m_h, m_wt, offset=1.0,
                                            group=grp)
        np.testing.assert_allclose(np.asarray(i_g2), np.asarray(i_w),
                                   atol=1)
        np.testing.assert_allclose(np.asarray(u_g2), np.asarray(u_w),
                                   atol=1)
        i_a2, u_a2 = stability_counts_fused(logits, m_h, m_wt, offset=1.0,
                                            active=act, group=grp)
        np.testing.assert_allclose(np.asarray(i_a2)[keep],
                                   np.asarray(i_w)[keep], atol=1)
        np.testing.assert_allclose(np.asarray(u_a2)[keep],
                                   np.asarray(u_w)[keep], atol=1)


def test_stability_counts_blocked_matches_xla_twin():
    """The blocked-layout stability kernel (candidate-major (M, 16h, w)
    input, the fused upscale kernel's native layout) matches the einsum
    twin run on the unblocked masks, with gating and grouped programs."""
    from regda_tpu.models.sam.pallas_stability import (
        stability_counts_blocked, stability_counts_xla, unblock_masks)
    from regda_tpu.ops.resize import _interp_matrix_half_pixel
    rng = np.random.RandomState(2)
    m, h, ch, cw = 7, 8, 51, 77                 # low-res S = 4h = 32
    s = 4 * h
    m_h = jnp.asarray(_interp_matrix_half_pixel(s, ch), jnp.float32)
    m_w = jnp.asarray(_interp_matrix_half_pixel(s, cw), jnp.float32)
    blk = jnp.asarray(rng.randn(m, 16 * h, h).astype(np.float32)) * 2.0
    i_w, u_w = stability_counts_xla(unblock_masks(blk, h, h), m_h,
                                    jnp.asarray(np.asarray(m_w).T),
                                    offset=1.0)
    for grp in (1, 4):
        i_b, u_b = stability_counts_blocked(blk, m_h, m_w, h, h,
                                            offset=1.0, group=grp)
        np.testing.assert_allclose(np.asarray(i_b), np.asarray(i_w), atol=1)
        np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_w), atol=1)
    act = jnp.asarray((np.arange(m) % 2).astype(np.int32))
    i_a, u_a = stability_counts_blocked(blk, m_h, m_w, h, h, offset=1.0,
                                        active=act, group=4)
    keep = np.asarray(act, bool)
    np.testing.assert_allclose(np.asarray(i_a)[keep],
                               np.asarray(i_w)[keep], atol=1)
    np.testing.assert_allclose(np.asarray(u_a)[keep],
                               np.asarray(u_w)[keep], atol=1)


def test_stability_counts_blocked_v2_and_dense_match_twin():
    """The restructured blocked v2 kernel (column-concat GEMMs, dense
    group) and the dense=True variants of v1 match the einsum twin."""
    from regda_tpu.models.sam.pallas_stability import (
        stability_counts_blocked, stability_counts_blocked_v2,
        stability_counts_fused, stability_counts_xla, unblock_masks,
        block_masks)
    from regda_tpu.ops.resize import _interp_matrix_half_pixel
    rng = np.random.RandomState(5)
    m, h, ch, cw = 7, 8, 51, 77
    s = 4 * h
    m_h = jnp.asarray(_interp_matrix_half_pixel(s, ch), jnp.float32)
    m_w = jnp.asarray(_interp_matrix_half_pixel(s, cw), jnp.float32)
    blk = jnp.asarray(rng.randn(m, 16 * h, h).astype(np.float32)) * 2.0
    il = unblock_masks(blk, h, h)
    np.testing.assert_array_equal(np.asarray(block_masks(il, h, h)),
                                  np.asarray(blk))
    m_wt = jnp.asarray(np.asarray(m_w).T)
    i_w, u_w = stability_counts_xla(il, m_h, m_wt, offset=1.0)
    for grp in (2, 4, 8):
        i_v, u_v = stability_counts_blocked_v2(blk, m_h, m_w, h, h,
                                               offset=1.0, group=grp)
        np.testing.assert_allclose(np.asarray(i_v), np.asarray(i_w),
                                   atol=1)
        np.testing.assert_allclose(np.asarray(u_v), np.asarray(u_w),
                                   atol=1)
    # active gating: inactive slots still return REAL counts in v2's
    # dense groups (within the garbage-tolerant contract)
    act = jnp.asarray((np.arange(m) % 2).astype(np.int32))
    i_a, u_a = stability_counts_blocked_v2(blk, m_h, m_w, h, h,
                                           offset=1.0, active=act, group=4)
    keep = np.asarray(act, bool)
    np.testing.assert_allclose(np.asarray(i_a)[keep],
                               np.asarray(i_w)[keep], atol=1)
    # dense=True twins of the v1 kernels
    i_d, u_d = stability_counts_blocked(blk, m_h, m_w, h, h, offset=1.0,
                                        group=4, dense=True)
    np.testing.assert_allclose(np.asarray(i_d), np.asarray(i_w), atol=1)
    np.testing.assert_allclose(np.asarray(u_d), np.asarray(u_w), atol=1)
    i_f, u_f = stability_counts_fused(il, m_h, m_wt, offset=1.0,
                                      group=4, dense=True)
    np.testing.assert_allclose(np.asarray(i_f), np.asarray(i_w), atol=1)
    np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_w), atol=1)


def test_blocked_mask_layout_roundtrip():
    """masks_from_blocked / unblock_masks invert the fused kernel's
    candidate-major blocked layout exactly (vs _interleave of the
    pixel-major blocked form)."""
    from regda_tpu.models.sam.pallas_upscale import (_interleave,
                                                     masks_from_blocked)
    from regda_tpu.models.sam.pallas_stability import unblock_masks
    rng = np.random.RandomState(3)
    b, h, w, m = 2, 4, 4, 3
    out = jnp.asarray(rng.randn(b, h * w, m * 16).astype(np.float32))
    ref = _interleave(out, b, h, w, m)
    out_t = jnp.transpose(out, (0, 2, 1))
    np.testing.assert_array_equal(np.asarray(masks_from_blocked(out_t, h, w)),
                                  np.asarray(ref))
    blk = out_t.reshape(b * m, 16 * h, w)
    np.testing.assert_array_equal(
        np.asarray(unblock_masks(blk, h, w)),
        np.asarray(ref).reshape(b * m, 4 * h, 4 * w))


def test_decode_points_fast_blocked_matches_interleaved():
    """decode_points_fast(blocked_masks=True) returns the same masks as
    the interleaved path, re-laid-out — both through the fused upscale
    kernel (interpret) and the stock mask head."""
    from regda_tpu.models.sam.pallas_upscale import masks_from_blocked
    model = Sam(vit_config='vit_t', img_size=64)
    rng = jax.random.PRNGKey(11)
    variables = model.init({'params': rng}, jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32))
    emb = jax.random.normal(jax.random.PRNGKey(12), (1, 4, 4, 256))
    pts = jax.random.uniform(jax.random.PRNGKey(13), (5, 1, 2)) * 64
    lbs = jnp.ones((5, 1), jnp.int32)
    for fused in (True, False):
        masks_i, iou_i = model.apply(variables, emb, pts, lbs, fused,
                                     method=model.decode_points_fast)
        masks_b, iou_b = model.apply(variables, emb, pts, lbs, fused,
                                     blocked_masks=True,
                                     method=model.decode_points_fast)
        assert masks_b.shape == (5, 48, 16)
        np.testing.assert_allclose(np.asarray(iou_b), np.asarray(iou_i),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(masks_from_blocked(masks_b, 4, 4)),
            np.asarray(masks_i), rtol=1e-5, atol=1e-5)
