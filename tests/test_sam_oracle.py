"""Independent numeric oracle for the SAM architecture: the JAX modules +
checkpoint converter vs an upstream-faithful torch re-implementation
(tests/torch_sam_oracle.py). The other SAM tests are self-consistent
(Pallas kernel == XLA twin, fast variant == stock JAX); this one would
catch a transcription error in the architecture itself (rel-pos
interpolation, LN placement/eps, attention scaling, upscaling/hypernetwork
plumbing) or in convert.py's key/layout mapping. Parity target: the
segment-anything dependency pinned at /root/reference/requirement.txt:147,
as driven by regda/utils/local_region_homog.py:29-39."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from regda_tpu.models.sam.auto import Sam
from regda_tpu.models.sam.convert import convert_sam_checkpoint


IMG = 128  # grid 8: windowed blocks pad 8->14, exercising the pad path


@pytest.fixture(scope='module')
def oracle_and_variables():
    from tests.torch_sam_oracle import SamOracle
    torch.manual_seed(0)
    oracle = SamOracle(img_size=IMG, embed_dim=64, depth=2, num_heads=2,
                       global_attn_indexes=(1,), window_size=14)
    # perturb every parameter so zero-init tables (pos_embed, rel_pos_*)
    # contribute and LN affines differ from identity
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for p in oracle.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))
    oracle.eval()
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_sam_checkpoint(state))
    return oracle, variables


@pytest.fixture(autouse=True)
def _stock_xla(monkeypatch):
    # compare the stock (non-Pallas) JAX path; kernel == XLA-twin equality
    # is asserted separately in test_sam.py / tools/check_kernels.py
    monkeypatch.setenv('REGDA_NO_PALLAS', '1')


def test_image_encoder_matches_upstream_torch(oracle_and_variables):
    oracle, variables = oracle_and_variables
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32)

    model = Sam(vit_config='vit_t', img_size=IMG, dtype=jnp.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(x),
                                 method=model.encode))
    with torch.no_grad():
        want = oracle.image_encoder(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_prompt_encoder_matches_upstream_torch(oracle_and_variables):
    oracle, variables = oracle_and_variables
    model = Sam(vit_config='vit_t', img_size=IMG, dtype=jnp.float32)
    points = np.array([[[17.0, 90.0]], [[64.0, 3.0]], [[100.5, 55.25]]],
                      np.float32)
    labels = np.ones((3, 1), np.float32)

    sparse_j, dense_j = model.apply(
        variables, jnp.asarray(points), jnp.asarray(labels),
        method=lambda m, p, l: m.prompt_encoder(p, l))
    pe_j = model.apply(variables,
                       method=lambda m: m.prompt_encoder.get_dense_pe())
    with torch.no_grad():
        sparse_t, dense_t = oracle.prompt_encoder(
            torch.from_numpy(points), torch.from_numpy(labels))
        pe_t = oracle.prompt_encoder.get_dense_pe()
    np.testing.assert_allclose(np.asarray(sparse_j), sparse_t.detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dense_j).transpose(0, 3, 1, 2),
                               dense_t.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pe_j).transpose(2, 0, 1),
                               pe_t[0].detach().numpy(), rtol=1e-5, atol=1e-6)


def test_full_sam_matches_upstream_torch(oracle_and_variables):
    """Encoder -> prompt encoder -> mask decoder end-to-end: low-res mask
    logits and IoU predictions agree with the torch oracle after
    convert.py's mapping of the (official-layout) state dict."""
    oracle, variables = oracle_and_variables
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32)
    points = np.array([[[17.0, 90.0]], [[64.0, 3.0]], [[100.5, 55.25]]],
                      np.float32)
    labels = np.ones((3, 1), np.float32)

    model = Sam(vit_config='vit_t', img_size=IMG, dtype=jnp.float32)
    masks_j, iou_j = model.apply(variables, jnp.asarray(x),
                                 jnp.asarray(points), jnp.asarray(labels))
    with torch.no_grad():
        masks_t, iou_t = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                                torch.from_numpy(points),
                                torch.from_numpy(labels))
    np.testing.assert_allclose(np.asarray(iou_j), iou_t.detach().numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(masks_j), masks_t.detach().numpy(),
                               rtol=1e-3, atol=1e-3)


def test_rel_pos_interpolation_matches_upstream_torch():
    """The checkpoint-resize path of the rel-pos tables (_get_rel_pos with
    a mismatched table, e.g. loading a 14-window table into a different
    attention extent) must match upstream's F.interpolate(mode='linear')
    semantics."""
    from regda_tpu.models.sam.vit import _get_rel_pos
    from tests.torch_sam_oracle import get_rel_pos
    rng = np.random.default_rng(4)
    table = rng.normal(size=(9, 8)).astype(np.float32)  # 8 wants 15 rows
    got = np.asarray(_get_rel_pos(8, 8, jnp.asarray(table)))
    with torch.no_grad():
        want = get_rel_pos(8, 8, torch.from_numpy(table)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
