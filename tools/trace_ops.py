"""Capture a jax.profiler trace of one SAM phase and print per-op self
times (the XProf op-stats table, parsed headlessly).

PERF.md's encoder/decode budgets cite XProf numbers; this tool makes that
measurement reproducible from the CLI instead of a notebook: it traces N
steady-state iterations of one phase (encode pyramid / decode chunk /
stability / seg-infer forward), converts the xplane protobuf with
tensorboard_plugin_profile, and prints the top ops by device self-time
plus a matmul-vs-other rollup — the "non-matmul overhead" number VERDICT
tracks.

Usage:
  python tools/trace_ops.py --what encode [--iters 5] [--top 30]
  python tools/trace_ops.py --what decode
"""

import argparse
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(what: str, iters: int):
    """Returns (fn, args) where fn(*args) enqueues one traced iteration."""
    import jax
    import jax.numpy as jnp
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    if what == 'encode':
        from regda_tpu.models.sam.vit import ImageEncoderViT, VIT_CONFIGS
        enc = ImageEncoderViT(**VIT_CONFIGS['vit_b'], dtype=dt)
        x = jax.random.normal(key, (5, 1024, 1024, 3), dt)
        ev = enc.init({'params': key}, x[:1])

        @jax.jit
        def fn(ev, x, s):
            out = enc.apply(ev, x + s.astype(dt))
            return jnp.float32(jnp.sum(out[0, 0, 0, :2]))

        return fn, (ev, x)
    if what == 'decode':
        # one everything-mode decode chunk at bench shapes: 128 prompts,
        # exact stability on the crop0 frame, blocked masks, iou gate
        from regda_tpu.models.sam.auto import Sam, SamAutomaticMaskGenerator
        model = Sam(vit_config='vit_b')
        variables = model.init(
            {'params': key}, jnp.zeros((1, 1024, 1024, 3)),
            jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32))
        gen = SamAutomaticMaskGenerator(
            model, variables, points_per_side=32, points_per_batch=256,
            pred_iou_thresh=0.90, stability_score_thresh=0.95)
        dec = gen._decode_fn((512, 512, 512, 512))
        emb = jax.random.normal(key, (1, 64, 64, 256), jnp.float32)
        pts = jax.random.uniform(key, (256, 2), jnp.float32) * 512

        @jax.jit
        def fn(variables, emb, pts, s):
            masks, iou, stab = dec(variables, emb, pts + s)
            return jnp.float32(jnp.sum(iou) + jnp.sum(stab))

        return fn, (gen.variables, emb, pts)
    if what == 'seg':
        # the bench.py configuration: ResNet-101 DeepLabv2 eval forward,
        # BN pre-folded (the deployed SegInferencer graph), batch 16
        from regda_tpu.models import build_deeplabv2
        from regda_tpu.models.fold_bn import fold_batchnorm_jit, folded_model
        model = build_deeplabv2('ResNet101', num_classes=6, dtype=dt)
        x = jax.random.normal(key, (16, 512, 512, 3), dt)
        v = model.init({'params': key}, jnp.zeros((1, 512, 512, 3)),
                       train=False)
        model = folded_model(model)
        v = fold_batchnorm_jit(v)

        @jax.jit
        def fn(v, x, s):
            out = model.apply(v, x + s.astype(dt), train=False)
            return jnp.float32(jnp.sum(out[0, 0, 0, :2]))

        return fn, (v, x)
    if what == 'everything':
        # the FULL bench_sam.py path (generate_regions_batch at default
        # flags: crop_n_layers=1, exact stability, gate on, pb=256): one
        # host-driven batch per "iteration" traced end-to-end, so the op
        # rollup shows how the real per-tile device budget splits across
        # encode / two-way / mask head / stability / stats / paint —
        # including the budget-skip's actual effect, which the isolated
        # phase benches can't see
        from regda_tpu.models.sam import Sam, SamRegionGenerator
        model = Sam(vit_config='vit_b')
        variables = model.init(
            {'params': key}, jnp.zeros((1, 1024, 1024, 3)),
            jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32))
        gen = SamRegionGenerator(
            model, variables, points_per_side=32, points_per_batch=256,
            pred_iou_thresh=0.90, stability_score_thresh=0.95,
            crop_n_layers=1, crop_n_points_downscale_factor=2)
        rng = np.random.RandomState(0)
        tiles = [rng.randint(0, 255, (512, 512, 3), np.uint8)
                 for _ in range(8)]

        def fn(_tiles, s):
            gen.generate_regions_batch(_tiles)
            return s

        return fn, (tiles,)
    raise SystemExit(f'unknown --what {what}')


def _op_table(logdir: str):
    """Parse the captured xplane into (op_name, category, self_us) rows."""
    # the pre-built protobuf stubs in this image predate protobuf 4's
    # generated-code check; the pure-python implementation sidesteps it
    os.environ.setdefault('PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION',
                          'python')
    try:
        from xprof.convert import raw_to_tool_data as rttd
    except ImportError:
        from tensorboard_plugin_profile.convert import (
            raw_to_tool_data as rttd)
    paths = glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                      recursive=True)
    assert paths, f'no xplane.pb under {logdir}'
    data, _ = rttd.xspace_to_tool_data(paths, 'framework_op_stats', {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode('utf-8', 'replace')
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--what', default='encode',
                    choices=('encode', 'decode', 'seg', 'everything'))
    ap.add_argument('--iters', type=int, default=5)
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--logdir', default='/tmp/regda_trace')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
    except Exception:
        pass

    fn, fargs = _build(args.what, args.iters)
    s = jnp.zeros((), jnp.float32)
    s = fn(*fargs, s)                          # compile
    np.asarray(s)
    logdir = os.path.join(args.logdir, args.what)
    os.makedirs(logdir, exist_ok=True)
    for f in glob.glob(os.path.join(logdir, '**', '*.xplane.pb'),
                       recursive=True):
        os.remove(f)
    jax.profiler.start_trace(logdir)
    s = jnp.zeros((), jnp.float32)
    for _ in range(args.iters):
        s = fn(*fargs, s)
    np.asarray(s)
    jax.profiler.stop_trace()

    raw = _op_table(logdir)
    try:
        table = json.loads(raw)
    except json.JSONDecodeError:
        print(raw[:4000])
        return
    # tensorboard DataTable JSON: first entry is the op table; keep
    # Device rows only
    dev = table[0] if isinstance(table, list) else table
    cols = [c['label'] for c in dev['cols']]
    rows = [[c.get('v') for c in r['c']] for r in dev['rows']]
    i_name = cols.index('Operation Name')
    i_cat = cols.index('Operation Type')
    i_self = cols.index('Total self-time (us)')
    i_hd = cols.index('Host/device')
    i_occ = cols.index('#Occurrences')
    rows = [r for r in rows if r[i_hd] == 'Device']
    rows.sort(key=lambda r: -(r[i_self] or 0))
    total = sum(r[i_self] or 0 for r in rows)
    print(f'total device self-time: {total / 1e3:.3f} ms '
          f'({total / 1e3 / args.iters:.3f} ms/iter)')
    agg = {}
    for r in rows:
        agg.setdefault(r[i_cat], [0, 0])
        agg[r[i_cat]][0] += r[i_self] or 0
        agg[r[i_cat]][1] += int(r[i_occ] or 0)
    print('--- by op type (ms/iter) ---')
    for t, (s_us, occ) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f'{s_us / 1e3 / args.iters:8.3f}  {s_us / total * 100:5.1f}%'
              f'  x{occ:5d}  {t}')
    print(f'--- top ops ---')
    for r in rows[:args.top]:
        st = (r[i_self] or 0) / 1e3 / args.iters
        pct = (r[i_self] or 0) / max(total, 1e-9) * 100
        print(f'{st:8.3f}  {pct:5.1f}%  [{r[i_cat]}] '
              f'{str(r[i_name])[:95]}')


if __name__ == '__main__':
    main()
