"""Model tests: shapes, jit, and numeric parity with the torch oracle via the
checkpoint converter."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from regda_tpu.models.deeplabv2 import build_deeplabv2
from regda_tpu.utils.torch_convert import torch_state_dict_to_variables
from tests.torch_oracle import Deeplabv2Oracle


@pytest.fixture(scope='module')
def small_model():
    model = build_deeplabv2('ResNet', num_classes=6)  # 'ResNet' -> resnet50
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({'params': jax.random.PRNGKey(0)}, x, train=False)
    return model, variables


def test_train_forward_shapes(small_model):
    model, variables = small_model
    x = jnp.zeros((2, 64, 64, 3))
    (p1, p2, feat), _ = model.apply(
        variables, x, train=True, mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(1)})
    assert p1.shape == (2, 4, 4, 6) and p2.shape == (2, 4, 4, 6)
    assert feat.shape == (2, 4, 4, 2048)


def test_eval_forward_is_softmax_avg(small_model):
    model, variables = small_model
    x = jnp.zeros((1, 64, 64, 3))
    probs = model.apply(variables, x, train=False)
    assert probs.shape == (1, 64, 64, 6)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)


def test_eval_forward_jits(small_model):
    model, variables = small_model
    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    out = fn(variables, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 6)


def test_converted_torch_checkpoint_matches_oracle():
    torch.manual_seed(0)
    oracle = Deeplabv2Oracle('resnet50', num_classes=6)
    oracle.eval()
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = torch_state_dict_to_variables(state)
    variables = jax.tree.map(jnp.asarray, variables)

    model = build_deeplabv2('resnet50', num_classes=6)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        want = oracle(torch.from_numpy(x)).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 train=False)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_stem_conv_space_to_depth_equals_direct():
    """StemConv's space-to-depth path == the direct 7x7/s2 conv on the
    same (7, 7, C, 64) parameter (even and odd spatial sizes)."""
    import flax.linen as nn
    from regda_tpu.models.resnet import StemConv
    rng = np.random.RandomState(0)
    for h, w in [(32, 48), (30, 34)]:
        x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
        ref_mod = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                          use_bias=False)
        new_mod = StemConv(64)
        v = ref_mod.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(new_mod.apply(v, x)),
            np.asarray(ref_mod.apply(v, x)), rtol=1e-4, atol=1e-4)


def test_pth_file_roundtrip(tmp_path):
    """The .pth FILE path tools/eval.py relies on: a torch.save'd
    state_dict (the reference's checkpoint format,
    tools/train_src.py:152-158) loads through
    utils/checkpoint.load_pytree and reproduces the oracle's outputs."""
    import torch

    from regda_tpu.utils.checkpoint import load_pytree
    from tests.torch_oracle import Deeplabv2Oracle

    torch.manual_seed(3)
    oracle = Deeplabv2Oracle('resnet50', num_classes=6)
    oracle.eval()
    path = str(tmp_path / 'Vaihingen_best.pth')
    torch.save(oracle.state_dict(), path)

    variables = jax.tree.map(jnp.asarray, load_pytree(path))
    model = build_deeplabv2('resnet50', num_classes=6)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_remat_grads_match_no_remat():
    """remat=True (the reference's with_cp, regda/resnet.py:140-168) must
    change memory scheduling only: identical forward outputs and identical
    parameter gradients vs the plain model."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                    jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 6, (2, 2, 2)))

    plain = build_deeplabv2('resnet18', num_classes=6, remat=False)
    ckpt = build_deeplabv2('resnet18', num_classes=6, remat=True)
    variables = plain.init({'params': jax.random.PRNGKey(0)}, x, train=False)

    def loss_fn(model):
        def f(params):
            (p1, p2, _), _ = model.apply(
                {'params': params,
                 'batch_stats': variables['batch_stats']},
                x, train=True, mutable=['batch_stats'],
                rngs={'dropout': jax.random.PRNGKey(7)})
            logits = (p1 + p2).reshape(-1, 6)
            onehot = jax.nn.one_hot(labels.reshape(-1), 6)
            return -(onehot * jax.nn.log_softmax(logits)).sum()
        return f

    loss_p, grads_p = jax.value_and_grad(loss_fn(plain))(variables['params'])
    loss_c, grads_c = jax.value_and_grad(loss_fn(ckpt))(variables['params'])
    np.testing.assert_allclose(float(loss_c), float(loss_p), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        grads_c, grads_p)


def test_fold_bn_matches_unfolded_eval():
    """models/fold_bn.py: the folded (BN-affine-into-conv) eval forward
    equals the stock eval forward up to float regrouping, with non-trivial
    running stats (a few train steps mutate batch_stats first), through
    both the encoder BNs and the PPM head BNs."""
    from regda_tpu.models.fold_bn import fold_batchnorm, folded_model

    model = build_deeplabv2('resnet18', num_classes=6)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init({'params': jax.random.PRNGKey(3)}, x0[:1],
                           train=False)
    for i in range(3):  # non-trivial running mean/var
        _, upd = model.apply(
            variables, x0 * (i + 1) + i, train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(i)})
        variables = {'params': variables['params'], **upd}

    want = np.asarray(model.apply(variables, x0, train=False))
    fvars = fold_batchnorm(variables)
    assert 'batch_stats' not in fvars
    got = np.asarray(folded_model(model).apply(fvars, x0, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_dual_ppm_eval_matches_stock():
    """models/fused_eval.py: the fused dual-head PPM forward (one N=1024
    conv for both heads' shared-feature half) equals the stock folded
    eval forward up to float regrouping."""
    from regda_tpu.models.fold_bn import fold_batchnorm, folded_model
    from regda_tpu.models.fused_eval import (fused_dual_ppm_eval,
                                             supports_fused_heads)

    model = build_deeplabv2('resnet18', num_classes=6)
    rng = np.random.default_rng(9)
    x0 = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init({'params': jax.random.PRNGKey(5)}, x0[:1],
                           train=False)
    _, upd = model.apply(
        variables, x0, train=True, mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(0)})
    variables = {'params': variables['params'], **upd}

    fmodel = folded_model(model)
    fvars = fold_batchnorm(variables)
    assert supports_fused_heads(fmodel)
    assert not supports_fused_heads(model)    # train/unfolded: stock path
    want = np.asarray(fmodel.apply(fvars, x0, train=False))
    got = np.asarray(jax.jit(
        lambda v, x: fused_dual_ppm_eval(fmodel, v, x))(fvars, x0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_seg_inferencer_folds_by_default():
    """SegInferencer applies BN folding by default and predicts the same
    probabilities as the unfolded model."""
    from regda_tpu.infer import SegInferencer

    model = build_deeplabv2('resnet18', num_classes=6)
    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    variables = model.init({'params': jax.random.PRNGKey(4)},
                           jnp.asarray(x), train=False)
    _, upd = model.apply(variables, jnp.asarray(x), train=True,
                         mutable=['batch_stats'],
                         rngs={'dropout': jax.random.PRNGKey(0)})
    variables = {'params': variables['params'], **upd}

    inf = SegInferencer(model, variables, 6)
    assert inf.fold_bn and inf.model.folded
    assert 'batch_stats' not in inf.variables
    probs = inf.predict_probs(x, slide=False)
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(probs, want, rtol=1e-4, atol=1e-5)
