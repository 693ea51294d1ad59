"""A/B the fused dual-head PPM conv on the deployed seg-infer graph.

VERDICT r4 item 5 / PERF.md's "one remaining structural idea": both PPM
heads' 3x3 `conv_last` read the same 2048-channel feature half of their
4096-d concat input (the other half is each head's own pooled pyramid).
Splitting conv-over-concat into conv-over-halves is exact:

    conv(concat[feat, ppm_i], k_i) = conv(feat, k_i[:, :, :2048])
                                   + conv(ppm_i, k_i[:, :, 2048:])

so the feat half of BOTH heads fuses into ONE N=1024 conv (kernels
concatenated on the output axis) — identical FLOPs, one fewer pass over
the 44%-of-budget PPM block's biggest input.

This tool builds the deployed eval graph (ResNet-101, BN-folded,
bf16, batch 16 — bench.py's configuration), asserts the fused head is
numerically equal to the stock forward, and chain-times both variants
(the bench.py dispatch-pipelined timing). Run on the TPU; the verdict
(kept or reverted) is recorded in PERF.md.

Per-tile work parity target: regda/utils/tools.py:61-97 (pre_slide) over
regda/models/Encoder.py:8-65 heads.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=8)
    ap.add_argument('--chain', type=int, default=3)
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--model', default='ResNet101')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
    except Exception:
        pass

    from regda_tpu.models import build_deeplabv2
    from regda_tpu.models.deeplabv2 import instance_norm
    from regda_tpu.models.fold_bn import fold_batchnorm_jit, folded_model
    from regda_tpu.models.resnet import ResNetEncoder
    from regda_tpu.ops.resize import (adaptive_avg_pool,
                                      resize_bilinear_align_corners,
                                      resize_bilinear_half_pixel)

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    model = build_deeplabv2(args.model, num_classes=6, dtype=dt)
    v = model.init({'params': key}, jnp.zeros((1, 512, 512, 3)),
                   train=False)
    model = folded_model(model)
    v = fold_batchnorm_jit(v)
    x = jax.random.normal(key, (args.batch, 512, 512, 3), jnp.float32)

    enc = ResNetEncoder(model.resnet_type, model.output_stride,
                        folded=True, dtype=dt)
    num_classes = model.num_classes
    scales = (1, 2, 3, 6)

    def head_pools(p, feat):
        """One head's pooled pyramid concat (B, h, w, 2048), folded params."""
        h, w = feat.shape[1:3]
        outs = []
        for i, s in enumerate(scales):
            y = adaptive_avg_pool(feat, (s, s))
            y = y @ p[f'ppm_{i}_conv']['kernel'][0, 0].astype(dt)
            y = jax.nn.relu(y + p[f'ppm_{i}_bn']['bias'].astype(dt))
            outs.append(resize_bilinear_half_pixel(y, (h, w)))
        return jnp.concatenate(outs, axis=-1)

    def conv3x3(xin, kernel):
        return jax.lax.conv_general_dilated(
            xin, kernel.astype(dt), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def fused_eval(variables, img):
        """Eval forward with the dual-head shared-feat conv fused."""
        p = variables['params']
        feat = enc.apply({'params': p['encoder']}, img, train=False)[-1]
        feat = instance_norm(feat).astype(dt)
        p5, p6 = p['layer5'], p['layer6']
        fc = feat.shape[-1]
        k5 = p5['conv_last_conv']['kernel']
        k6 = p6['conv_last_conv']['kernel']
        # ONE conv for both heads' shared-feature half (N=1024)...
        k_feat = jnp.concatenate([k5[:, :, :fc, :], k6[:, :, :fc, :]],
                                 axis=-1)
        shared = conv3x3(feat, k_feat)
        half = k5.shape[-1]
        preds = []
        for i, (ph, kh) in enumerate(((p5, k5), (p6, k6))):
            # ...plus each head's own pooled half
            y = shared[..., i * half:(i + 1) * half] + conv3x3(
                head_pools(ph, feat), kh[:, :, fc:, :])
            y = jax.nn.relu(y + ph['conv_last_bn']['bias'].astype(dt))
            y = (y @ ph['conv_last_out']['kernel'][0, 0].astype(dt)
                 + ph['conv_last_out']['bias'].astype(dt))
            preds.append(y)
        both = resize_bilinear_align_corners(
            jnp.concatenate(preds, axis=-1), img.shape[1:3])
        x1 = both[..., :num_classes]
        x2 = both[..., num_classes:]
        return (jax.nn.softmax(x1, axis=-1)
                + jax.nn.softmax(x2, axis=-1)) / 2

    # bench.py's exact timing protocol: `iters` forwards scanned inside ONE
    # jit (probs feed back into the input so device execution serializes),
    # then `chain` dispatches whose inputs chain — per-call tunnel RPC
    # overlaps device work identically for both variants
    def make_run(fwd):
        @jax.jit
        def run(variables, image):
            def step(img, _):
                probs = fwd(variables, img).astype(jnp.float32)
                return img + probs[..., :3] * 1e-6, ()
            y, _ = jax.lax.scan(step, image, None, length=args.iters)
            return y
        return run

    stock_fn = make_run(lambda v_, im: model.apply(v_, im, train=False))
    fused_fn = make_run(fused_eval)

    # numeric equality first (same folded params, bf16 compute)
    a = np.asarray(jax.jit(lambda v_, x_: model.apply(v_, x_, train=False)
                           )(v, x[:2]), np.float32)
    b = np.asarray(jax.jit(fused_eval)(v, x[:2]), np.float32)
    err = np.abs(a - b).max()
    print(f'max |stock - fused| on probs: {err:.3e}')
    assert err < 2e-2, 'fused head does not match the stock forward'
    # the local fused_eval above is the prototype; assert the DEPLOYED
    # implementation (models/fused_eval.py, what SegInferencer runs)
    # matches it exactly
    from regda_tpu.models.fused_eval import fused_dual_ppm_eval
    d2 = np.abs(np.asarray(jax.jit(
        lambda v_, x_: fused_dual_ppm_eval(model, v_, x_))(v, x[:2]),
        np.float32) - b).max()
    print(f'max |tool fused - deployed fused|: {d2:.3e}')
    assert d2 == 0.0, 'deployed fused_eval drifted from the A/B prototype'

    def chain_time(run):
        y = run(v, x)
        np.asarray(y[0, 0, 0, :1])                     # compile + first exec
        t0 = time.perf_counter()
        for _ in range(args.chain):
            y = run(v, y)
        np.asarray(y[0, 0, 0, :1])
        return (time.perf_counter() - t0) / (args.iters * args.chain)

    t_stock = chain_time(stock_fn)
    t_fused = chain_time(fused_fn)
    tps_stock = args.batch / t_stock
    tps_fused = args.batch / t_fused
    print(f'stock : {t_stock * 1e3:8.2f} ms/batch  {tps_stock:7.1f} tiles/s')
    print(f'fused : {t_fused * 1e3:8.2f} ms/batch  {tps_fused:7.1f} tiles/s')
    print(f'delta : {(tps_fused / tps_stock - 1) * 100:+.2f}%')


if __name__ == '__main__':
    main()
