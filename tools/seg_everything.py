"""Generate SAM everything-mode local-region maps for target-domain tiles.

CLI parity with reference tools/seg_everything.py:16-24 +
regda/utils/local_region_homog.py:27-96: sweeps img_dir(s), writes int32
region maps (region id = kept-mask index + 1, area >= 1024 px, 0 =
unassigned) to the sibling reg_dir as .tif.

  python tools/seg_everything.py --img-dirs data/IsprsDA/Vaihingen/img_dir/train \
      [--checkpoint ckpts/sam_vit_b_01ec64.pth] [--model-type vit_b]

Without --checkpoint the encoder runs with random weights (the official SAM
checkpoint is not vendored; pass a .pth to reproduce reference regions).
"""

import os
import time
from argparse import ArgumentParser

import numpy as np
from PIL import Image

import _bootstrap  # noqa: F401

import jax

from regda_tpu.models.sam import (Sam, SamAutomaticMaskGenerator,
                                  SamRegionGenerator)
from regda_tpu.models.sam.auto import regions_from_anns

if __name__ == '__main__':
    parser = ArgumentParser(description='SAM everything-mode region maps.')
    parser.add_argument('--img-dirs', type=str, nargs='+',
                        default=['data/IsprsDA/Vaihingen/img_dir/train',
                                 'data/IsprsDA/Potsdam/img_dir/train'])
    parser.add_argument('--checkpoint', type=str, default=None)
    parser.add_argument('--model-type', type=str, default='vit_b',
                        choices=['vit_b', 'vit_l', 'vit_h', 'vit_t'],
                        help='vit_t is a tiny random-weight config for '
                             'smoke runs')
    parser.add_argument('--img-size', type=int, default=1024,
                        help='SAM input resolution (lower for smoke runs)')
    parser.add_argument('--area-threshold', type=int, default=1024)
    parser.add_argument('--points-per-side', type=int, default=32)
    parser.add_argument('--pred-iou-thresh', type=float, default=0.90)
    parser.add_argument('--stability-thresh', type=float, default=0.95)
    parser.add_argument('--crop-n-layers', type=int, default=1)
    parser.add_argument('--batch-tiles', type=int, default=8,
                        help='tiles per device dispatch batch (fast path)')
    parser.add_argument('--fast', type=int, default=1,
                        help='device-painted region maps (1, default) or the\n'
                             'mask-downloading parity path (0)')
    parser.add_argument('--data-mesh', type=int, default=0,
                        help='shard each tile batch over this many devices\n'
                             '(0 = single device; requires --fast)')
    args = parser.parse_args()

    model = Sam(vit_config=args.model_type, img_size=args.img_size)
    if args.checkpoint:
        from regda_tpu.models.sam.convert import load_sam_checkpoint
        variables = load_sam_checkpoint(args.checkpoint)
        print(f'loaded SAM weights from {args.checkpoint}')
    else:
        import jax.numpy as jnp
        print('WARNING: no --checkpoint given; using random SAM weights '
              '(region maps will not match reference SAM regions)')
        variables = model.init(
            {'params': jax.random.PRNGKey(0)},
            jnp.zeros((1, args.img_size, args.img_size, 3)),
            jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32))

    mesh = None
    if args.data_mesh:
        import jax
        from jax.sharding import Mesh
        assert args.fast, '--data-mesh requires --fast 1'
        devs = np.array(jax.devices()[:args.data_mesh])
        mesh = Mesh(devs, ('data',))
        print(f'sharding tile batches over {len(devs)} devices')

    gen_cls = SamRegionGenerator if args.fast else SamAutomaticMaskGenerator
    gen = gen_cls(
        model, variables,
        points_per_side=args.points_per_side,
        pred_iou_thresh=args.pred_iou_thresh,
        stability_score_thresh=args.stability_thresh,
        crop_n_layers=args.crop_n_layers,
        crop_n_points_downscale_factor=2,
        mesh=mesh,
    )

    for img_dir in args.img_dirs:
        files = sorted(f for f in os.listdir(img_dir) if f.endswith('.png'))
        out_dir = img_dir.replace('img_dir', 'reg_dir')
        os.makedirs(out_dir, exist_ok=True)
        t0 = time.time()
        bt = max(args.batch_tiles, 1) if args.fast else 1
        chunks = [files[lo:lo + bt] for lo in range(0, len(files), bt)]

        def _load(chunk):
            return [np.asarray(Image.open(os.path.join(img_dir, f))
                               .convert('RGB')) for f in chunk]

        if args.fast:
            # pipelined: batch k+1's device work dispatches before batch
            # k's host tail (NMS + canvas download) — the device never
            # idles on the host between batches
            maps_iter = gen.generate_regions_stream(
                (_load(c) for c in chunks), args.area_threshold)
        else:
            def _slow():
                for chunk in chunks:
                    maps = []
                    for image in _load(chunk):
                        anns = gen.generate(image)
                        maps.append(regions_from_anns(
                            anns, image.shape[:2], args.area_threshold))
                    yield maps

            maps_iter = _slow()
        done = 0
        for chunk, region_maps in zip(chunks, maps_iter):
            for fname, regions in zip(chunk, region_maps):
                Image.fromarray(regions, mode='I').save(
                    os.path.join(out_dir, fname.replace('.png', '.tif')))
            done += len(chunk)
            rate = done / (time.time() - t0)
            print(f'{img_dir}: {done}/{len(files)} tiles '
                  f'({rate:.2f} tiles/s)')
        print(f'{img_dir}: done ({len(files)} tiles)')
