"""Tile raw ISPRS Vaihingen orthophotos into 512x512 training crops.

CLI parity with reference convert_datasets/convert_vaihingen.py:34-201:
images are already IRRG on disk and pass through unchanged; labels convert
palette colors to ids with unmatched pixels falling to 5 and clutter merged
into class 0; fixed area splits; tiles named `{area}_{x0}_{y0}_{x1}_{y1}.png`.

Raw Vaihingen ships images and labels in separate archives/dirs, so both
roots are explicit flags:

  python tools/convert_vaihingen.py --image-dir raw/top --label-dir \
      raw/gts_for_participants -o data/IsprsDA/Vaihingen
"""

from argparse import ArgumentParser

import _bootstrap  # noqa: F401

from regda_tpu.data_prep.tiling import (TilerConfig, convert_vaihingen_scene,
                                        iter_source_rasters)

if __name__ == '__main__':
    parser = ArgumentParser(description='Convert ISPRS Vaihingen to tile trees.')
    parser.add_argument('--image-dir', required=True,
                        help='dir of raw image .tif/.zip (top_mosaic_*)')
    parser.add_argument('--label-dir', default=None,
                        help='dir of ground-truth .tif/.zip')
    parser.add_argument('-o', '--out_dir', default='data/IsprsDA/Vaihingen')
    parser.add_argument('--clip_size', type=int, default=512)
    args = parser.parse_args()

    cfg = TilerConfig(out_dir=args.out_dir, clip_size=args.clip_size)
    total = 0
    for path in iter_source_rasters(args.image_dir):
        n = convert_vaihingen_scene(path, cfg, is_label=False)
        total += n
        print(f'{path}: {n} image tiles')
    if args.label_dir:
        for path in iter_source_rasters(args.label_dir):
            n = convert_vaihingen_scene(path, cfg, is_label=True)
            total += n
            print(f'{path}: {n} label tiles')
    print(f'Done: {total} tiles -> {args.out_dir}')
