"""Quantify the SAM stability-score deviation: low-res vs exact.

The fast default scores mask stability on the 256x256 low-res logits;
upstream segment-anything (pinned by /root/reference/requirement.txt:147,
driven at regda/utils/local_region_homog.py:32-39) scores logits
postprocessed to crop resolution. regda_tpu supports both
(SamAutomaticMaskGenerator(stability_on_upscaled=True) /
REGDA_SAM_EXACT_STABILITY=1); this tool measures how much they diverge:

  1. per-candidate stability deltas + decision flips at the reference
     threshold (0.95), from the SAME decoded logits;
  2. region-map divergence between the two modes (region counts,
     assigned-pixel agreement, pairwise same-region consistency) at
     crop_n_layers 0 and 1.

Without --checkpoint the ViT runs with a seeded random init, so the
numbers characterize the mechanism on this box (no SAM weights are
vendored); pass a converted checkpoint for real-data rates.

Usage:
  python tools/check_sam_stability.py [--vit-config vit_b] [--tiles 4]
      [--size 512] [--checkpoint ckpt.npz] [--out PERF_stability.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--vit-config', default='vit_b')
    ap.add_argument('--img-size', type=int, default=1024)
    ap.add_argument('--tiles', type=int, default=4)
    ap.add_argument('--size', type=int, default=512)
    ap.add_argument('--points-per-side', type=int, default=32)
    ap.add_argument('--points-per-batch', type=int, default=128)
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--out', default=None)
    # with --checkpoint absent (random init) the reference thresholds kill
    # every candidate and the region comparison is vacuous; relax them so
    # the two modes' SELECTIONS can actually diverge where scores do
    ap.add_argument('--iou-thresh', type=float, default=0.90)
    ap.add_argument('--stability-thresh', type=float, default=0.95)
    ap.add_argument('--area-threshold', type=int, default=1024)
    ap.add_argument('--auto-thresh', action='store_true',
                    help='after measuring the score distributions, set the '
                         'region-pass thresholds at the pooled medians so '
                         'roughly half the candidates pass — makes the '
                         'region comparison non-vacuous on random init')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from regda_tpu.models.sam import Sam
    from regda_tpu.models.sam.auto import (SamRegionGenerator,
                                           build_point_grid)

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
    except Exception:
        pass

    model = Sam(vit_config=args.vit_config, img_size=args.img_size)
    if args.checkpoint:
        from regda_tpu.models.sam.convert import load_sam_checkpoint
        variables = load_sam_checkpoint(args.checkpoint)
    else:
        variables = model.init(
            {'params': jax.random.PRNGKey(args.seed)},
            jnp.zeros((1, args.img_size, args.img_size, 3)),
            jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32))

    kwargs = dict(points_per_side=args.points_per_side,
                  points_per_batch=args.points_per_batch,
                  pred_iou_thresh=args.iou_thresh,
                  stability_score_thresh=args.stability_thresh,
                  crop_n_points_downscale_factor=2)
    rng = np.random.RandomState(args.seed)
    tiles = [rng.randint(0, 255, (args.size, args.size, 3),
                         np.uint8).astype(np.uint8)
             for _ in range(args.tiles)]
    report = {}

    # ---- 1. per-candidate stability deltas from the SAME logits --------
    gen_fast = SamRegionGenerator(model, variables, crop_n_layers=0,
                                  stability_on_upscaled=False, **kwargs)
    gen_exact = SamRegionGenerator(model, variables, crop_n_layers=0,
                                   stability_on_upscaled=True, **kwargs)
    h = w = args.size
    pre, (nh, nw) = gen_fast._preprocess_device_fn((h, w))
    grid = build_point_grid(args.points_per_side)
    pts = (grid * np.array([nw, nh], np.float32)).astype(np.float32)
    pb = args.points_per_batch
    all_f, all_e, all_iou = [], [], []
    dec_fast = gen_fast._decode_fn()
    dec_exact = gen_exact._decode_fn((nh, nw, h, w))
    # pad the grid to a chunk multiple so the tail points are measured
    # too (and grids smaller than one chunk still work); padded entries
    # are sliced back off after each decode
    n_pts = len(pts)
    padp = (-n_pts) % pb
    pts_p = np.concatenate([pts, np.zeros((padp, 2), np.float32)])
    for t in tiles:
        emb = gen_fast._encode_fn()(gen_fast.variables,
                                    pre(jnp.asarray(t)))
        for lo in range(0, len(pts_p), pb):
            keep = 3 * (min(lo + pb, n_pts) - lo)   # 3 masks per point
            if keep <= 0:
                break
            chunk = jnp.asarray(pts_p[lo:lo + pb])
            _, iou_f, st_f = dec_fast(gen_fast.variables, emb, chunk)
            _, _, st_e = dec_exact(gen_exact.variables, emb, chunk)
            all_f.append(np.asarray(st_f).ravel()[:keep])
            all_e.append(np.asarray(st_e).ravel()[:keep])
            all_iou.append(np.asarray(iou_f).ravel()[:keep])
    st_f = np.concatenate(all_f)
    st_e = np.concatenate(all_e)
    iou_f = np.concatenate(all_iou)
    deltas = st_f - st_e
    n_cand = int(st_f.size)
    thr = args.stability_thresh
    flips = int(((st_f >= thr) != (st_e >= thr)).sum())
    med = float(np.median(st_f))
    flips_med = int(((st_f >= med) != (st_e >= med)).sum())
    pct = lambda a: {f'p{q}': float(np.percentile(a, q))
                     for q in (5, 25, 50, 75, 95)}
    report['stability_delta'] = {
        'n_candidates': n_cand,
        'mean_abs': float(np.abs(deltas).mean()),
        'p95_abs': float(np.percentile(np.abs(deltas), 95)),
        'max_abs': float(np.abs(deltas).max()),
        f'decision_flips_at_{thr}': flips,
        'flip_rate': float(flips / max(n_cand, 1)),
        'decision_flips_at_median': flips_med,
        'flip_rate_at_median': float(flips_med / max(n_cand, 1)),
        'score_dist_fast': pct(st_f),
        'score_dist_exact': pct(st_e),
        'iou_dist': pct(iou_f),
    }
    if args.auto_thresh:
        args.stability_thresh = med
        args.iou_thresh = float(np.median(iou_f))
        report['auto_thresholds'] = {'iou': args.iou_thresh,
                                     'stability': args.stability_thresh}
        kwargs['pred_iou_thresh'] = args.iou_thresh
        kwargs['stability_score_thresh'] = args.stability_thresh

    # ---- 2. region-map divergence, crop 0 and 1 ------------------------
    for layers in (0, 1):
        gf = SamRegionGenerator(model, variables, crop_n_layers=layers,
                                stability_on_upscaled=False, **kwargs)
        ge = SamRegionGenerator(model, variables, crop_n_layers=layers,
                                stability_on_upscaled=True, **kwargs)
        rf = gf.generate_regions_batch(tiles, area_threshold=args.area_threshold)
        re_ = ge.generate_regions_batch(tiles, area_threshold=args.area_threshold)
        counts_f = [int(len(np.unique(r)) - 1) for r in rf]
        counts_e = [int(len(np.unique(r)) - 1) for r in re_]
        assigned_agree, pair_agree = [], []
        prng = np.random.RandomState(1)
        for a, b in zip(rf, re_):
            assigned_agree.append(float(((a > 0) == (b > 0)).mean()))
            idx = prng.randint(0, a.size, size=(2000, 2))
            fa, fb = a.ravel(), b.ravel()
            same_a = fa[idx[:, 0]] == fa[idx[:, 1]]
            same_b = fb[idx[:, 0]] == fb[idx[:, 1]]
            pair_agree.append(float((same_a == same_b).mean()))
        report[f'regions_crop{layers}'] = {
            'region_counts_fast': counts_f,
            'region_counts_exact': counts_e,
            'assigned_pixel_agreement': float(np.mean(assigned_agree)),
            'pairwise_same_region_agreement': float(np.mean(pair_agree)),
        }

    report['config'] = {'vit_config': args.vit_config, 'tiles': args.tiles,
                        'size': args.size, 'seed': args.seed,
                        'checkpoint': args.checkpoint or 'random-init'}
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(report, f, indent=2)


if __name__ == '__main__':
    main()
