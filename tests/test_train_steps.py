"""Train-step tests: all three stages run jitted, losses finite, params move,
and the step executes sharded over the 8-device CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regda_tpu.models import build_deeplabv2
from regda_tpu.parallel import make_mesh, shard_batch, replicated_sharding
from regda_tpu.train import TrainState, create_train_state, make_optimizer
from regda_tpu.train.steps import (make_stage1_step, make_stage2_step,
                                   make_stage3_step, make_proto_accum_step,
                                   jit_step)

C = 6
HW = 64


@pytest.fixture(scope='module')
def setup():
    model = build_deeplabv2('resnet18', num_classes=C)
    tx = make_optimizer(1e-2, stop_steps=100)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               input_shape=(1, HW, HW, 3), num_classes=C,
                               feat_dim=512)
    return model, tx, state


def _batch(seed=0, b=2):
    rng = np.random.default_rng(seed)
    images_s = jnp.asarray(rng.normal(size=(b, HW, HW, 3)).astype(np.float32))
    # homogeneous 32x32 blocks so downscale_label's 0.75-majority vote passes
    block = rng.integers(0, C, size=(b, 2, 2)).astype(np.int32)
    label_s = jnp.asarray(np.kron(block, np.ones((32, 32), np.int32)))
    images_t = jnp.asarray(rng.normal(size=(b, HW, HW, 3)).astype(np.float32))
    regs_t = jnp.asarray(rng.integers(0, 16, size=(b, HW, HW)).astype(np.int32))
    prob = rng.uniform(0.01, 1, size=(b, HW, HW, C)).astype(np.float32)
    prob /= prob.sum(-1, keepdims=True)
    return images_s, label_s, images_t, regs_t, jnp.asarray(prob)


def test_stage1_step(setup):
    model, tx, state = setup
    step = jit_step(make_stage1_step(model, tx, align_domain=True,
                                     num_classes=C), donate_state=False)
    images_s, label_s, images_t, _, _ = _batch()
    new_state, metrics = step(state, images_s, label_s, images_t)
    assert np.isfinite(float(metrics['total']))
    assert float(metrics['loss_domain']) >= 0
    assert int(new_state.step) == 1
    # warmup lr is 0 at step 0 (tools.py:195-196) -> params move on step 2
    new_state2, _ = step(new_state, images_s, label_s, images_t)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(new_state.params),
                        jax.tree.leaves(new_state2.params)))
    assert changed


def test_stage2_step_updates_prototypes(setup):
    model, tx, state = setup
    step = jit_step(make_stage2_step(model, tx, num_classes=C,
                                     sam_refine=True, align_domain=True),
                    donate_state=False)
    images_s, label_s, images_t, regs_t, _ = _batch(1)
    new_state, metrics = step(state, images_s, label_s, images_t, regs_t)
    for k in ('total', 'loss_seg', 'loss_align', 'loss_domain'):
        assert np.isfinite(float(metrics[k])), k
    assert not np.allclose(np.asarray(new_state.prototypes), 0.0)


def test_stage3_step_uvem(setup):
    model, tx, state = setup
    step = jit_step(make_stage3_step(model, tx, num_classes=C, lt='uvem',
                                     sam_refine=True), donate_state=False)
    images_s, label_s, images_t, regs_t, prob = _batch(2)
    new_state, metrics = step(state, images_s, label_s, images_t, prob, regs_t)
    assert np.isfinite(float(metrics['total']))
    assert np.isfinite(float(metrics['loss_target']))


@pytest.mark.parametrize('lt', ['ohem', 'focal', 'ghm', 'ups', 'none'])
def test_stage3_loss_variants(setup, lt):
    model, tx, state = setup
    step = jit_step(make_stage3_step(model, tx, num_classes=C, lt=lt,
                                     sam_refine=False), donate_state=False)
    images_s, label_s, images_t, regs_t, prob = _batch(3)
    _, metrics = step(state, images_s, label_s, images_t, prob, regs_t)
    assert np.isfinite(float(metrics['total'])), lt


def test_proto_accum_step(setup):
    model, tx, state = setup
    accum = jax.jit(make_proto_accum_step(model), static_argnums=(5, 6))
    images_s, label_s, *_ = _batch(4)
    s, c = accum(state.variables, jnp.zeros((C, 512)), jnp.zeros((C, 1)),
                 images_s, label_s, C, -1)
    assert float(c.sum()) > 0


def test_stage2_step_sharded_mesh():
    """Full stage-2 step over a (2 data x 2 spatial) CPU mesh, in a FRESH
    subprocess via the driver entry (`__graft_entry__.dryrun_multichip`).

    Running the 8-virtual-device collective program inside the long-lived
    suite process aborts intermittently from a C++ thread (XLA CPU
    collective runtime interacting with state accumulated by earlier jit
    executions — no Python-level error to catch); the exact same program
    passes reliably in a clean process, which is also precisely how the
    driver runs it.
    """
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import __graft_entry__ as entrymod
    # self-isolating: runs in a retried child process (see its docstring).
    # 4 devices (2 data x 2 spatial): same collectives, but half the
    # spinning participants — XLA CPU's rendezvous livelock odds on this
    # 1-core box grow steeply with thread count under load.
    entrymod.dryrun_multichip(4)


def test_stage1_and_stage3_sharded_mesh():
    """Stage-1 and stage-3 steps over the (2 data x 2 spatial) CPU mesh,
    with the cross-step mutable state (prototypes, class-freq EMAs, GHM
    bins) asserted bit-identical across device shards and — for the UVEM
    variant — equal to an unsharded run (SURVEY.md §2.7's
    replicated-mutable-state contract). Child process + flake retry for
    the same reason as test_stage2_step_sharded_mesh."""
    import subprocess
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(root, 'tests', 'sharded_stages_child.py')
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('PALLAS_AXON_POOL_IPS', None)
    flags = env.get('XLA_FLAGS', '')
    if 'host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = (
            flags + ' --xla_force_host_platform_device_count=4').strip()
    last = None
    for attempt in range(4):
        res = subprocess.run([sys.executable, child, '4'], env=env,
                             cwd=root, capture_output=True, text=True,
                             timeout=1500)
        if res.returncode == 0:
            assert 'OK' in res.stdout
            return
        last = res
        flake = (res.returncode < 0
                 or 'rendezvous' in res.stderr.lower()
                 or 'Terminating process' in res.stderr)
        if not flake:
            break
    raise AssertionError(
        f'sharded_stages_child failed (rc={last.returncode}):\n'
        f'{last.stdout}{last.stderr[-2000:]}')
