"""Per-phase microbenchmark for the SAM everything-mode pipeline on TPU.

Times each device phase of the crop_n_layers=1 region-generation budget in
isolation (PERF.md breaks the ~400 ms/tile budget into 5x encode, 16x
128-prompt decode chunks, fused stats, paints): ViT-B encode per 1024-crop,
prompt-resident two-way kernel per 128-prompt chunk, fused mask-head per
chunk, fused mask-stats per 256-mask budget. Use for quick A/B of kernel
changes (e.g. REGDA_TWOWAY_LN_DT=1) without driving the full generator.

Timing note: on this box's tunneled backend block_until_ready returns
before execution finishes, so each phase is timed as a CHAIN of iters
data-dependent calls (a scalar from call i feeds call i+1) with one host
read at the end — device time serializes, dispatch RPC overlaps.

Usage: python tools/bench_sam_phases.py [--iters 20] [--prompts 128]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, x0, iters):
    """fn: (x, eps_scalar) -> (out, scalar). Chains via the scalar."""
    import jax.numpy as jnp
    s = jnp.zeros((), jnp.float32)
    out, s = fn(x0, s)                    # warm compile
    np.asarray(s)
    t0 = time.perf_counter()
    s = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        out, s = fn(x0, s)
    np.asarray(s)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--prompts', type=int, default=128)
    ap.add_argument('--crops', type=int, default=5)
    ap.add_argument('--skip-encode', action='store_true')
    ap.add_argument('--encode-layers', action='store_true',
                    help='time encoder sub-layers (patch embed, windowed/'
                         'global blocks, neck) instead of the phase suite')
    ap.add_argument('--stability', action='store_true',
                    help='sweep the exact-stability kernels (interleaved + '
                         'blocked x group sizes x crop frames) instead of '
                         'the phase suite')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
    except Exception:
        pass

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    results = {}

    # ---------------- encoder sub-layer breakdown --------------------------
    if args.encode_layers:
        from regda_tpu.models.sam.vit import (Block, PatchEmbed,
                                              ImageEncoderViT, VIT_CONFIGS)
        import flax.linen as nn
        B5, grid, dim = args.crops, 64, 768
        xt = jax.random.normal(key, (B5, grid, grid, dim), dt)
        # persistent-windowed layout: 64 -> pad 70 -> 5x5 windows of 14
        xw = jax.random.normal(key, (B5 * 25, 14, 14, dim), dt)

        blk_w = Block(dim, 12, window_size=14, input_size=(grid, grid),
                      dtype=dt)
        vw = blk_w.init({'params': key}, xw, True, True)

        @jax.jit
        def f_w(v, x, s):
            out = blk_w.apply(v, x + s.astype(dt), True, True)
            return out, jnp.float32(jnp.sum(out[0, 0, 0, :2]))

        per = chain_time(lambda x, s: f_w(vw, x, s), xw, args.iters)
        results['enc_windowed_block_ms'] = per * 1000 / B5
        print(f'windowed block (persistent layout): {per*1000/B5:.3f} '
              f'ms/crop/layer')

        blk_g = Block(dim, 12, window_size=0, input_size=(grid, grid),
                      dtype=dt)
        vg = blk_g.init({'params': key}, xt, False, False)

        @jax.jit
        def f_g(v, x, s):
            out = blk_g.apply(v, x + s.astype(dt), False, False)
            return out, jnp.float32(jnp.sum(out[0, 0, 0, :2]))

        per = chain_time(lambda x, s: f_g(vg, x, s), xt, args.iters)
        results['enc_global_block_ms'] = per * 1000 / B5
        print(f'global block: {per*1000/B5:.3f} ms/crop/layer')

        # windowed block with layout transitions (unpartitioned in/out),
        # as run before/after each global block
        vt = blk_w.init({'params': key}, xt, False, False)

        @jax.jit
        def f_t(v, x, s):
            out = blk_w.apply(v, x + s.astype(dt), False, False)
            return out, jnp.float32(jnp.sum(out[0, 0, 0, :2]))

        per = chain_time(lambda x, s: f_t(vt, x, s), xt, args.iters)
        results['enc_windowed_block_transition_ms'] = per * 1000 / B5
        print(f'windowed block (partition+unpartition): {per*1000/B5:.3f} '
              f'ms/crop/layer')

        pe = PatchEmbed(dim, 16, dtype=dt)
        xi = jax.random.normal(key, (B5, 1024, 1024, 3), dt)
        vp = pe.init({'params': key}, xi)

        @jax.jit
        def f_p(v, x, s):
            out = pe.apply(v, x + s.astype(dt))
            return out, jnp.float32(jnp.sum(out[0, 0, 0, :2]))

        per = chain_time(lambda x, s: f_p(vp, x, s), xi, args.iters)
        results['enc_patch_embed_ms'] = per * 1000 / B5
        print(f'patch embed: {per*1000/B5:.3f} ms/crop')

        class Neck(nn.Module):
            @nn.compact
            def __call__(self, x):
                from regda_tpu.models.sam.vit import LayerNorm2d
                x = nn.Conv(256, (1, 1), use_bias=False, dtype=dt,
                            name='neck_conv1')(x)
                x = LayerNorm2d(name='neck_ln1')(x)
                x = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2,
                            use_bias=False, dtype=dt, name='neck_conv2')(x)
                x = LayerNorm2d(name='neck_ln2')(x)
                return x

        neck = Neck()
        vn = neck.init({'params': key}, xt)

        @jax.jit
        def f_n(v, x, s):
            out = neck.apply(v, x + s.astype(dt))
            return out, jnp.float32(jnp.sum(out[0, 0, 0, :2]))

        per = chain_time(lambda x, s: f_n(vn, x, s), xt, args.iters)
        results['enc_neck_ms'] = per * 1000 / B5
        print(f'neck: {per*1000/B5:.3f} ms/crop')
        w_l = results['enc_windowed_block_ms']
        g_l = results['enc_global_block_ms']
        print(f'sum(8 windowed + 4 global + patch + neck): '
              f'{8*w_l + 4*g_l + results["enc_patch_embed_ms"] + results["enc_neck_ms"]:.2f} ms/crop')
        print(json.dumps(results))
        return

    # ---------------- exact-stability kernel sweep -------------------------
    if args.stability:
        from regda_tpu.models.sam.pallas_stability import (
            stability_counts_fused, stability_counts_blocked,
            stability_counts_blocked_v2, block_masks)
        from regda_tpu.ops.resize import _interp_matrix_half_pixel
        mcand = args.prompts * 3
        s_low = 256
        h = s_low // 4
        ks = jax.random.split(key, 50)
        # crop frames of the reference crop_n_layers=1 configuration on a
        # 512 tile: crop0 (nh=nw=1024 -> 512x512) and the 4 sub-crops
        # (307x307 resized to the 1024 frame -> back to 307)
        frames = {}
        for label, (nhw, chw) in (('crop0', (1024, 512)),
                                  ('subcrop', (1024, 307))):
            u = _interp_matrix_half_pixel(s_low, 1024)[:nhw]
            m = (_interp_matrix_half_pixel(nhw, chw) @ u).astype(np.float32)
            frames[label] = m
        il = jax.random.normal(ks[30], (mcand, s_low, s_low), dt) * 4
        # blocked-layout twin of the same logits
        blk = jax.jit(block_masks, static_argnums=(1, 2))(il, h, h)
        for label, m in frames.items():
            m_h = jnp.asarray(m)
            m_wt = jnp.asarray(m.T)
            for g in (8, 16):
                for dense in (False, True):
                    @jax.jit
                    def fn(x, s, g=g, dense=dense, m_h=m_h, m_wt=m_wt):
                        i, un = stability_counts_fused(
                            x + s.astype(x.dtype), m_h, m_wt, group=g,
                            dense=dense)
                        return i, jnp.float32(jnp.sum(i[:2])
                                              + jnp.sum(un[:2]))

                    per = chain_time(fn, il, args.iters)
                    tag = f'stab_interleaved_{label}_g{g}_d{int(dense)}'
                    results[tag + '_ms'] = per * 1000
                    print(f'interleaved {label} group={g} dense={dense}: '
                          f'{per*1000:.2f} ms / {mcand}-cand chunk')
            mb = jnp.asarray(m)
            for g in (4, 8):
                for dense in (False, True):
                    @jax.jit
                    def fnb(x, s, g=g, dense=dense, mb=mb):
                        i, un = stability_counts_blocked(
                            x + s.astype(x.dtype), mb, mb, h, h, group=g,
                            dense=dense)
                        return i, jnp.float32(jnp.sum(i[:2])
                                              + jnp.sum(un[:2]))

                    per = chain_time(fnb, blk, args.iters)
                    tag = f'stab_blocked_{label}_g{g}_d{int(dense)}'
                    results[tag + '_ms'] = per * 1000
                    print(f'blocked {label} group={g} dense={dense}: '
                          f'{per*1000:.2f} ms / {mcand}-cand chunk')
            for g in (4, 8, 16):
                @jax.jit
                def fnv2(x, s, g=g, mb=mb):
                    i, un = stability_counts_blocked_v2(
                        x + s.astype(x.dtype), mb, mb, h, h, group=g)
                    return i, jnp.float32(jnp.sum(i[:2])
                                          + jnp.sum(un[:2]))

                per = chain_time(fnv2, blk, args.iters)
                results[f'stab_blocked_v2_{label}_g{g}_ms'] = per * 1000
                print(f'blocked v2 {label} group={g}: {per*1000:.2f} ms '
                      f'/ {mcand}-cand chunk')
        print(json.dumps(results))
        return

    # ---------------- ViT-B encode, batch = crop pyramid ------------------
    if not args.skip_encode:
        from regda_tpu.models.sam.vit import ImageEncoderViT, VIT_CONFIGS
        enc = ImageEncoderViT(**VIT_CONFIGS['vit_b'], dtype=dt)
        x = jax.random.normal(key, (args.crops, 1024, 1024, 3), dt)
        ev = enc.init({'params': key}, x[:1])

        # weights go in as an ARGUMENT: capturing them bakes ~360 MB of
        # constants into the HLO, which the tunnel's remote_compile
        # endpoint rejects (HTTP 413)
        @jax.jit
        def enc_fn_v(ev, x, s):
            out = enc.apply(ev, x + s.astype(dt))
            return out, jnp.float32(jnp.sum(out[0, 0, 0, :2]))

        per = chain_time(lambda x, s: enc_fn_v(ev, x, s), x,
                         max(2, args.iters // 4))
        results['encode_ms_per_crop'] = per * 1000 / args.crops
        print(f'encode: {per*1000:.2f} ms / {args.crops}-crop batch '
              f'({per*1000/args.crops:.2f} ms/crop)')

    # ---------------- prompt-resident two-way kernel ----------------------
    from regda_tpu.models.sam.pallas_twoway import NP, two_way_fused
    B, T, C, D = args.prompts, 4096, 256, 128
    ks = jax.random.split(key, 50)
    mk = lambda i, *s: (jax.random.normal(ks[i], s, jnp.float32) * 0.1)
    weights = {}
    spec = {'wo0': (D, C), 'bo0': (C,), 'n40w': (C,), 'n40b': (C,),
            'wqt': (C, D), 'bqt': (D,), 'wkt': (C, D), 'bkt': (D,),
            'wvt': (C, D), 'bvt': (D,), 'wot': (D, C), 'bot': (C,),
            'n2w': (C,), 'n2b': (C,),
            'w1': (C, 2048), 'b1': (2048,), 'w2': (2048, C), 'b2': (C,),
            'n3w': (C,), 'n3b': (C,),
            'wqi': (C, D), 'bqi': (D,), 'wki': (C, D), 'bki': (D,),
            'wvi': (C, D), 'bvi': (D,), 'woi': (D, C), 'boi': (C,),
            'n41w': (C,), 'n41b': (C,),
            'wqf': (C, D), 'bqf': (D,), 'wkf': (C, D), 'bkf': (D,),
            'wvf': (C, D), 'bvf': (D,), 'wof': (D, C), 'bof': (C,),
            'nfw': (C,), 'nfb': (C,)}
    for i, (k2, s) in enumerate(spec.items()):
        weights[k2] = mk(i, *s) + (1.0 if k2 in ('n40w', 'n2w', 'n3w',
                                                 'n41w', 'nfw') else 0.0)
    ktok0 = jax.random.normal(ks[40], (B, NP, D), dt)
    vtok0 = jax.random.normal(ks[41], (B, NP, D), dt)
    q1 = jax.random.normal(ks[42], (B, NP, C), dt)
    qpe = jax.random.normal(ks[43], (B, NP, C), dt)
    keys0 = jax.random.normal(ks[44], (T, C), dt)
    pe = jax.random.normal(ks[45], (T, C), dt)
    qimg0 = jax.random.normal(ks[46], (T, D), dt)
    maskb = jnp.where(jnp.arange(NP) < 7, 0.0, -1e9)[None].astype(
        jnp.float32)

    @jax.jit
    def tw_fn(keys0, s):
        k2o, qo = two_way_fused((ktok0, vtok0, q1, qpe,
                                 keys0 + s.astype(dt), pe, qimg0,
                                 maskb, weights))
        return k2o, jnp.float32(jnp.sum(qo[0, 0, :2]))

    per = chain_time(lambda x, s: tw_fn(x, s), keys0, args.iters)
    results['twoway_ms_per_chunk'] = per * 1000
    print(f'two-way kernel: {per*1000:.2f} ms / {B}-prompt chunk '
          f'(ln_dt={os.environ.get("REGDA_TWOWAY_LN_DT", "0")})')

    # ---------------- fused mask head (upscale + hyper) -------------------
    from regda_tpu.models.sam.pallas_upscale import upscale_hyper_masks
    c4, c8, M = C // 4, C // 8, 3   # multimask: mask 0 never upscaled
    src = jax.random.normal(ks[47], (B, 64, 64, C), dt)
    hyper = jax.random.normal(ks[48], (B, M, c8), dt)
    k1 = jax.random.normal(ks[10], (C, 4 * c4), dt) * 0.1
    b1 = jnp.zeros((1, 4 * c4), jnp.float32)
    lnw = jnp.ones((1, c4), jnp.float32)
    lnb = jnp.zeros((1, c4), jnp.float32)
    k2 = jax.random.normal(ks[11], (c4, 4 * c8), dt) * 0.1
    b2 = jnp.zeros((1, 4 * c8), jnp.float32)

    @jax.jit
    def mh_fn(src, s):
        masks = upscale_hyper_masks(src + s.astype(dt), hyper, k1, b1,
                                    lnw, lnb, k2, b2, out_dtype=dt)
        return masks, jnp.float32(jnp.sum(masks[0, 0, 0, :2]))

    per = chain_time(mh_fn, src, args.iters)
    results['mask_head_ms_per_chunk'] = per * 1000
    print(f'mask head: {per*1000:.2f} ms / {B}-prompt chunk')

    # ---------------- exact-stability scoring ------------------------------
    # real chunk shape: points_per_batch prompts x 3 candidate masks, crop0
    # frame of a 512 tile (nh=nw=1024 model frame -> 512x512 crop)
    from regda_tpu.models.sam.pallas_stability import (
        stability_counts_fused, stability_counts_xla)
    from regda_tpu.ops.resize import _interp_matrix_half_pixel
    mcand = args.prompts * 3
    s_low = 256
    u = _interp_matrix_half_pixel(s_low, 1024)[:1024]
    m_h = (_interp_matrix_half_pixel(1024, 512) @ u).astype(np.float32)
    m_wt = jnp.asarray(m_h.T)
    m_h = jnp.asarray(m_h)
    stab_logits = jax.random.normal(ks[30], (mcand, s_low, s_low), dt) * 4

    @jax.jit
    def stab_fused_fn(x, s):
        i, un = stability_counts_fused(x + s.astype(x.dtype), m_h, m_wt)
        return i, jnp.float32(jnp.sum(i[:2]) + jnp.sum(un[:2]))

    per = chain_time(stab_fused_fn, stab_logits, args.iters)
    results['stability_fused_ms_per_chunk'] = per * 1000
    print(f'stability fused kernel: {per*1000:.2f} ms / {mcand}-cand chunk')

    @jax.jit
    def stab_xla_fn(x, s):
        i, un = stability_counts_xla(x + s.astype(x.dtype), m_h, m_wt)
        return i, jnp.float32(jnp.sum(i[:2]) + jnp.sum(un[:2]))

    per = chain_time(stab_xla_fn, stab_logits, max(2, args.iters // 2))
    results['stability_xla_scan_ms_per_chunk'] = per * 1000
    print(f'stability XLA scan: {per*1000:.2f} ms / {mcand}-cand chunk')

    @jax.jit
    def stab_big_fn(x, s):
        x = x + s.astype(x.dtype)
        y1 = jnp.einsum('hs,msw->mhw', m_h.astype(x.dtype), x,
                        preferred_element_type=jnp.float32)
        y = jnp.einsum('mhw,wc->mhc', y1.astype(x.dtype),
                       m_wt.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        i = (y > 1.0).sum(axis=(-2, -1), dtype=jnp.float32)
        un = (y > -1.0).sum(axis=(-2, -1), dtype=jnp.float32)
        return i, jnp.float32(jnp.sum(i[:2]) + jnp.sum(un[:2]))

    per = chain_time(stab_big_fn, stab_logits, max(2, args.iters // 2))
    results['stability_one_shot_einsum_ms_per_chunk'] = per * 1000
    print(f'stability one-shot einsum: {per*1000:.2f} ms / {mcand}-cand '
          'chunk')

    # ---------------- fused mask stats ------------------------------------
    # crop0 frame of a 512 tile: composed (512, 256) resize matrices
    from regda_tpu.models.sam.pallas_stats import mask_stats_fused
    logits = jax.random.normal(ks[49], (256, 256, 256), dt) * 4
    u_st = _interp_matrix_half_pixel(256, 1024)[:1024]
    mh_st = jnp.asarray((_interp_matrix_half_pixel(1024, 512) @ u_st
                         ).astype(np.float32))
    mwt_st = jnp.asarray(np.asarray(mh_st).T)

    @jax.jit
    def st_fn(logits, s):
        packed, boxes, areas = mask_stats_fused(
            logits + s.astype(logits.dtype), mh_st, mwt_st, 512, 512)
        return packed, jnp.float32(jnp.sum(boxes[0]) + jnp.sum(areas[:2]))

    per = chain_time(st_fn, logits, max(2, args.iters // 2))
    results['stats_ms_per_256masks'] = per * 1000
    print(f'mask stats: {per*1000:.2f} ms / 256-mask budget')

    print(json.dumps(results))


if __name__ == '__main__':
    main()
