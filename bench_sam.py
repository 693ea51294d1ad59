"""Secondary benchmark: SAM everything-mode region-map throughput
(512x512 tiles/sec/chip) — the other half of the BASELINE.md north-star.

Prints one JSON line like bench.py. Uses the device-resident region path
(SamRegionGenerator.generate_regions_batch) with ViT-B, 32x32 points, the
reference's thresholds AND crop pyramid (local_region_homog.py:32-39:
crop_n_layers=1, crop_n_points_downscale_factor=2 — the reference-parity
configuration, now the default here; set BENCH_SAM_CROPS=0 for the
single-crop variant).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from regda_tpu.models.sam import Sam, SamRegionGenerator

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
    except Exception:
        pass

    crop_layers = int(os.environ.get('BENCH_SAM_CROPS', '1'))
    batch = int(os.environ.get('BENCH_SAM_BATCH', '8'))
    model = Sam(vit_config='vit_b')
    variables = model.init({'params': jax.random.PRNGKey(0)},
                           jnp.zeros((1, 1024, 1024, 3)),
                           jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32))
    # 256-prompt chunks measured 3.75 vs 3.64 tiles/s at 128 on v5e
    # (round-4 A/B): larger chunks amortize kernel launches + XLA glue
    pb = int(os.environ.get('BENCH_SAM_PB', '256'))
    gen = SamRegionGenerator(model, variables, points_per_side=32,
                             points_per_batch=pb,
                             pred_iou_thresh=0.90,
                             stability_score_thresh=0.95,
                             crop_n_layers=crop_layers,
                             crop_n_points_downscale_factor=2)
    rng = np.random.RandomState(0)
    tiles = [rng.randint(0, 255, (512, 512, 3), np.uint8).astype(np.uint8)
             for _ in range(batch)]
    gen.generate_regions_batch(tiles)              # compile
    iters = int(os.environ.get('BENCH_SAM_ITERS', '3'))
    t0 = time.perf_counter()
    if os.environ.get('BENCH_SAM_NO_STREAM'):
        # unpipelined A/B floor: each batch's host tail (NMS + canvas
        # download) serializes against the next batch's device work
        for _ in range(iters):
            gen.generate_regions_batch(tiles)
    else:
        depth = int(os.environ.get('BENCH_SAM_DEPTH', '2'))
        for _ in gen.generate_regions_stream(
                (tiles for _ in range(iters)), depth=depth):
            pass
    dt = time.perf_counter() - t0
    tps = iters * batch / dt
    line = {'metric': 'sam_region_gen_tiles_per_sec_per_chip',
            'value': round(tps, 3), 'unit': 'tiles/s',
            'crop_n_layers': crop_layers}
    print(json.dumps(line))
    # per-round machine-readable artifact (VERDICT r4 item 7): append this
    # run to BENCH_SAM_OUT (e.g. runs/bench_sam_r5.json) with the flag
    # set, so the crop-1 trajectory is a committed record, not prose
    out = os.environ.get('BENCH_SAM_OUT')
    if out:
        import datetime
        rec = dict(line, points_per_batch=pb, tile_batch=batch,
                   iters=iters, exact_stability=True, iou_gate=True,
                   date=datetime.datetime.now().strftime('%Y-%m-%d'))
        runs = []
        if os.path.exists(out):
            with open(out) as f:
                data = json.load(f)
            runs = data.get('runs', [])
        runs.append(rec)
        vals = [r['value'] for r in runs]
        with open(out, 'w') as f:
            json.dump({'metric': line['metric'], 'unit': 'tiles/s',
                       'runs': runs,
                       'mean': round(sum(vals) / len(vals), 3),
                       'n': len(vals)}, f, indent=1)


if __name__ == '__main__':
    main()
