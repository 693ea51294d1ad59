"""Child process for the sharded stage-1/stage-3 mesh tests.

Run as `python tests/sharded_stages_child.py <n_devices>`: builds a
(data x spatial) CPU mesh and runs ONE sharded step of
  - stage 1 (CE x2 + CORAL),
  - stage 3 with UVEM + class-balance EMA on BOTH domains (bcs/bct),
  - stage 3 with GHM (the 30-bin gradient-harmonizing histogram state),
asserting per-step metrics are finite, the cross-step mutable state
(prototypes, class-freq EMAs, GHM bins) stays bit-identical across every
device shard (SURVEY.md §2.7's replicated-mutable-state contract), and the
stage-3 UVEM state matches an UNSHARDED run of the same step on the same
data (the GSPMD collectives compute the same math as one device).

Runs in a subprocess for the same reason as __graft_entry__.dryrun_multichip:
XLA CPU's in-process collectives can abort the whole process on this
single-core box; the parent test retries only that flake signature.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_devices: int) -> None:
    flags = os.environ.get('XLA_FLAGS', '')
    if 'host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (
            flags + f' --xla_force_host_platform_device_count={n_devices}'
        ).strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
    try:
        jax.config.update('jax_compilation_cache_dir', os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            '.jax_cache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import numpy as np
    import jax.numpy as jnp

    from regda_tpu.models import build_deeplabv2
    from regda_tpu.parallel import (batch_sharding, make_mesh,
                                    replicated_sharding, shard_batch)

    def batch_sharding_halo(mesh):
        return batch_sharding(mesh, spatial_axis=1)
    from regda_tpu.train import create_train_state, make_optimizer
    from regda_tpu.train.steps import (make_stage1_step, make_stage3_step)

    n_spatial = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    mesh = make_mesh(n_data=n_devices // n_spatial, n_spatial=n_spatial)

    C, HW = 6, 32
    model = build_deeplabv2('resnet18', num_classes=C)
    tx = make_optimizer(1e-2, stop_steps=100)
    state0 = create_train_state(model, tx, jax.random.PRNGKey(0),
                                input_shape=(1, HW, HW, 3), num_classes=C,
                                feat_dim=512)
    state = jax.device_put(state0, replicated_sharding(mesh))

    b = max(n_devices, mesh.shape['data'])
    rng = np.random.default_rng(0)
    block = rng.integers(0, C, size=(b, 2, 2)).astype(np.int32)
    # confidently-peaked prob labels so pseudo_selection keeps pixels
    # (uniformish probs all fall below CUTOFF_LOW=0.6 -> everything
    # ignored and the GHM histogram would never update)
    hard_t = rng.integers(0, C, size=(b, HW, HW))
    prob = np.full((b, HW, HW, C), 0.1 / (C - 1), np.float32)
    np.put_along_axis(prob, hard_t[..., None], 0.9, axis=-1)
    host = dict(
        images_s=rng.normal(size=(b, HW, HW, 3)).astype(np.float32),
        label_s=np.kron(block, np.ones((HW // 2, HW // 2), np.int32)),
        images_t=rng.normal(size=(b, HW, HW, 3)).astype(np.float32),
        regs_t=rng.integers(0, 16, size=(b, HW, HW)).astype(np.int32),
        label_t_prob=prob,
    )
    batch = shard_batch(mesh, host, spatial=True)

    def assert_replicated(arr, name):
        shards = [np.asarray(s.data) for s in arr.addressable_shards]
        base = shards[0]
        for s in shards[1:]:
            np.testing.assert_array_equal(s, base, err_msg=name)

    # ---- stage 1 sharded --------------------------------------------------
    step1 = jax.jit(make_stage1_step(model, tx, align_domain=True,
                                     num_classes=C, bcs=True))
    with mesh:
        s1, m1 = step1(state, batch['images_s'], batch['label_s'],
                       batch['images_t'])
    assert np.isfinite(float(m1['total'])), m1
    assert_replicated(s1.class_freq_s.freq, 'stage1 class_freq_s')
    print(f'stage1 sharded: loss={float(m1["total"]):.4f} OK', flush=True)

    # ---- stage 3 (UVEM + class balance both domains) sharded ---------------
    step3 = jax.jit(make_stage3_step(model, tx, num_classes=C, lt='uvem',
                                     sam_refine=True, bcs=True, bct=True))
    with mesh:
        s3, m3 = step3(state, batch['images_s'], batch['label_s'],
                       batch['images_t'], batch['label_t_prob'],
                       batch['regs_t'])
    assert np.isfinite(float(m3['total'])), m3
    for name in ('prototypes',):
        assert_replicated(getattr(s3, name), name)
    assert_replicated(s3.class_freq_s.freq, 'class_freq_s')
    assert_replicated(s3.class_freq_t.freq, 'class_freq_t')

    # ...and equals the UNSHARDED run of the same step on the same data
    s3u, m3u = jax.jit(make_stage3_step(
        model, tx, num_classes=C, lt='uvem', sam_refine=True, bcs=True,
        bct=True))(state0, *(jnp.asarray(host[k]) for k in (
            'images_s', 'label_s', 'images_t', 'label_t_prob', 'regs_t')))
    np.testing.assert_allclose(float(m3['total']), float(m3u['total']),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s3.prototypes),
                               np.asarray(s3u.prototypes),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s3.class_freq_t.freq),
                               np.asarray(s3u.class_freq_t.freq),
                               rtol=1e-5, atol=1e-7)
    print(f'stage3 uvem sharded: loss={float(m3["total"]):.4f} '
          f'(unsharded {float(m3u["total"]):.4f}) OK', flush=True)

    # ---- stage 3 (GHM histogram state) sharded ----------------------------
    step3g = jax.jit(make_stage3_step(model, tx, num_classes=C, lt='ghm',
                                      sam_refine=True))
    with mesh:
        s3g, m3g = step3g(state, batch['images_s'], batch['label_s'],
                          batch['images_t'], batch['label_t_prob'],
                          batch['regs_t'])
    assert np.isfinite(float(m3g['total'])), m3g
    ghm_leaves = jax.tree.leaves(s3g.ghm)
    assert ghm_leaves, 'GHM state is empty'
    for i, leaf in enumerate(ghm_leaves):
        assert_replicated(leaf, f'ghm[{i}]')
    # the step must actually have touched the GHM histogram
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.ghm), ghm_leaves))
    assert changed, 'GHM state unchanged by the ghm step'
    print(f'stage3 ghm sharded: loss={float(m3g["total"]):.4f} OK',
          flush=True)

    # ---- spatial-shard HALO correctness above toy size ---------------------
    # Every mesh test above runs 32 px (XLA-CPU compile budget); conv halo
    # exchange under the 'spatial' axis is only meaningfully exercised at
    # larger extents (VERDICT round-3 weak #5). One eval FORWARD at 128 px,
    # H sharded over spatial=2: the GSPMD halo exchanges for every 3x3/7x7
    # conv and the PPM pools must reproduce the unsharded forward.
    if mesh.shape['spatial'] > 1:
        HW2 = 128
        xh = rng.normal(size=(2, HW2, HW2, 3)).astype(np.float32)
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        want = np.asarray(fwd(state0.variables, jnp.asarray(xh)))
        xs = jax.device_put(jnp.asarray(xh), batch_sharding_halo(mesh))
        with mesh:
            got = np.asarray(fwd(state.variables, xs))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
        print(f'halo eval fwd @ {HW2}px spatial={mesh.shape["spatial"]}: '
              'sharded == unsharded OK', flush=True)

        # ...and the GRADIENT-side halo: one stage-1 TRAIN step at 128 px
        # with H sharded (spatial=2). The eval-forward check above can't
        # see the transposed-conv halo exchanges of the backward pass, and
        # the 32-px train steps don't exercise multi-tile halos; assert
        # loss AND the applied update (params delta norm, a pure function
        # of the gradients) match the unsharded step (VERDICT r4 weak #6).
        block2 = rng.integers(0, C, size=(2, 2, 2)).astype(np.int32)
        lh = np.kron(block2, np.ones((HW2 // 2, HW2 // 2), np.int32))
        # the poly-warmup schedule's LR is 0 at step 0, which would make
        # the update (and this check) vacuously zero — use a plain SGD tx
        # so the applied update is a nonzero pure function of the grads
        import optax
        tx_h = optax.chain(optax.clip_by_global_norm(32.0),
                           optax.sgd(1e-2))
        state0h = create_train_state(model, tx_h, jax.random.PRNGKey(0),
                                     input_shape=(1, HW, HW, 3),
                                     num_classes=C, feat_dim=512)
        stateh = jax.device_put(state0h, replicated_sharding(mesh))
        step1h = jax.jit(make_stage1_step(model, tx_h, num_classes=C))
        su, mu_ = step1h(state0h, jnp.asarray(xh), jnp.asarray(lh),
                         jnp.asarray(xh))
        hbatch = shard_batch(mesh, dict(x=xh, l=lh), spatial=True)
        with mesh:
            ss, ms_ = step1h(stateh, hbatch['x'], hbatch['l'], hbatch['x'])
        np.testing.assert_allclose(float(ms_['total']), float(mu_['total']),
                                   rtol=1e-4)

        def delta_norm(new_params, old_params):
            sq = jax.tree.map(
                lambda a, b: jnp.sum(
                    (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2),
                new_params, old_params)
            return float(jnp.sqrt(sum(jax.tree.leaves(sq))))

        dn_u = delta_norm(su.params, state0h.params)
        assert dn_u > 1e-6, 'halo train step applied a ZERO update'
        with mesh:
            dn_s = delta_norm(ss.params, stateh.params)
        np.testing.assert_allclose(dn_s, dn_u, rtol=1e-3)
        print(f'halo TRAIN step @ {HW2}px spatial={mesh.shape["spatial"]}: '
              f'loss {float(ms_["total"]):.4f} == {float(mu_["total"]):.4f}, '
              f'|dparams| {dn_s:.5f} == {dn_u:.5f} OK', flush=True)

    print(f'sharded_stages_child({n_devices}): mesh={dict(mesh.shape)} OK')


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
