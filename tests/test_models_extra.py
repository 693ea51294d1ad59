"""Tests for the inventory model extras: TransNorm, discriminators,
DeeplabV2MMD, SpixelNet (SURVEY.md §2.1/§2.4 unused-but-inventoried)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from regda_tpu.models.transnorm import TransNorm
from regda_tpu.models.discriminators import (FCDiscriminator,
                                             FCDiscriminatorLocal,
                                             PixelDiscriminator)
from regda_tpu.models.deeplab_mmd import DeeplabV2MMD
from regda_tpu.models.spixelnet import SpixelNet


# ---------------------------------------------------------------------------
# TransNorm — numpy oracle of the reference math (trans_norm.py:169-232)
# ---------------------------------------------------------------------------

def _tn_oracle_train(x, eps=1e-5):
    """x: (B, H, W, C); returns z*(1+alpha) with per-half batch norm."""
    half = x.shape[0] // 2
    out = np.empty_like(x)
    stats = []
    for sl in (slice(0, half), slice(half, None)):
        v = x[sl].reshape(-1, x.shape[-1])
        mu, var = v.mean(0), v.var(0)
        out[sl] = (x[sl] - mu) / np.sqrt(var + eps)
        stats.append((mu, v.var(0, ddof=1)))
    (mu_s, var_s), (mu_t, var_t) = stats
    dis = np.abs(mu_s / np.sqrt(var_s + eps) - mu_t / np.sqrt(var_t + eps))
    prob = 1.0 / (1.0 + dis)
    alpha = x.shape[-1] * prob / prob.sum()
    return out * (1 + alpha)


def test_transnorm_train_matches_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 6, 6, 8).astype(np.float32) * 2 + 1
    tn = TransNorm()
    variables = tn.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    y, new_vars = tn.apply(variables, jnp.asarray(x), train=True,
                           mutable=['batch_stats'])
    np.testing.assert_allclose(np.asarray(y), _tn_oracle_train(x),
                               rtol=2e-4, atol=2e-4)
    # running stats moved toward batch stats (momentum 0.1)
    bs = new_vars['batch_stats']
    v = x[:2].reshape(-1, 8)
    np.testing.assert_allclose(np.asarray(bs['mean_source']),
                               0.1 * v.mean(0), rtol=1e-4, atol=1e-5)


def test_transnorm_eval_uses_target_stats():
    tn = TransNorm()
    x = jnp.ones((2, 4, 4, 3))
    variables = tn.init(jax.random.PRNGKey(0), x, train=True)
    # fresh stats: mean 0 / var 1 for both domains -> z = x, alpha = C/C = 1
    y = tn.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), 2.0 * np.ones((2, 4, 4, 3)),
                               rtol=1e-5)


def test_transnorm_rank2():
    tn = TransNorm()
    x = jnp.asarray(np.random.RandomState(1).randn(6, 5).astype(np.float32))
    variables = tn.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = tn.apply(variables, x, train=True, mutable=['batch_stats'])
    assert y.shape == (6, 5)


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------

def test_fc_discriminator_shapes_and_grad():
    d = FCDiscriminator(ndf=8)
    x = jnp.zeros((2, 64, 64, 6))
    variables = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    assert out.shape == (2, 2, 2, 1)   # five stride-2 convs: 64 / 32 = 2
    g = jax.grad(lambda v: d.apply(v, x).sum())(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_fc_discriminator_local_upsamples_back():
    d = FCDiscriminatorLocal(ndf=8)
    x = jnp.zeros((1, 64, 64, 6 + 32))
    variables = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    # four stride-2 convs (64 -> 4) then 32x upsample -> 128
    assert out.shape == (1, 128, 128, 1)


def test_pixel_discriminator_two_heads():
    d = PixelDiscriminator(ndf=16, num_classes=1)
    x = jnp.zeros((2, 16, 16, 8))
    variables = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(variables, x)
    assert out.shape == (2, 16, 16, 2)


# ---------------------------------------------------------------------------
# DeeplabV2MMD
# ---------------------------------------------------------------------------

def test_deeplab_mmd_forward():
    model = DeeplabV2MMD(resnet_type='resnet50', num_classes=7)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({'params': jax.random.PRNGKey(0)}, x, train=False)
    logits, feat = model.apply(variables, x, train=True,
                               mutable=['batch_stats'])[0]
    assert logits.shape == (1, 64, 64, 7)
    assert feat.shape == (1, 256)
    probs = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# SpixelNet
# ---------------------------------------------------------------------------

def test_spixelnet_pyramid_shapes():
    net = SpixelNet()
    x = jnp.zeros((1, 32, 32, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    outs = net.apply(variables, x, train=False)
    assert len(outs) == 8
    p0v, p0h, p1v, p1h, p2v, p2h, p3v, p3h = outs
    assert p0v.shape == (1, 32, 32, 2)       # full resolution after last v-up
    assert p0h.shape == (1, 16, 32, 2)       # h-up happens before v-up
    assert p1v.shape == (1, 16, 16, 2)
    assert p3v.shape == (1, 4, 4, 2)
    assert p3h.shape == (1, 2, 4, 2)
    for p in outs:                            # softmax over assignment dim
        np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-5)
