"""Tests: TTA, slide inference, metrics, and the end-to-end eval harness on a
synthetic dataset."""

import os
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

from regda_tpu.ops.tta import tta_apply
from regda_tpu.ops.slide import slide_inference, tile_positions
from regda_tpu.utils.metrics import PixelMetricIgnore


def test_tta_identity_for_equivariant_fn():
    # an equivariant fn (elementwise) must be unchanged by TTA averaging
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    fn = lambda t: t * 2.0
    np.testing.assert_allclose(np.asarray(tta_apply(fn, x)),
                               np.asarray(fn(x)), rtol=1e-6)


def test_tta_averages_eight_variants():
    # fn returns a constant depending on the corner pixel -> detects aug set
    def fn(t):
        return jnp.broadcast_to(t[:, :1, :1, :1], t.shape[:3] + (1,))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 1)).astype(np.float32))
    out = np.asarray(tta_apply(fn, x))
    # oracle: mean over the 8 dihedral transforms applied to x
    xs = []
    xn = np.asarray(x)
    for f in (False, True):
        for k in range(4):
            v = xn[:, :, ::-1] if f else xn
            v = np.rot90(v, k, axes=(1, 2))
            c = np.broadcast_to(v[:, :1, :1, :1], v.shape)
            c = np.rot90(c, -k, axes=(1, 2))
            if f:
                c = c[:, :, ::-1]
            xs.append(c)
    np.testing.assert_allclose(out, np.mean(xs, axis=0), rtol=1e-6)


def test_tile_positions_1024():
    pos = tile_positions(1024, 1024, 512, 256)
    assert len(pos) == 9
    assert pos[0] == (0, 0) and pos[-1] == (512, 512)


def test_slide_matches_numpy_oracle():
    """Count-normalized accumulation vs reference pre_slide (tools.py:61-97)."""
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    C = 4

    def apply_np(t):  # deterministic fake model on numpy
        return np.stack([t.sum(-1) * (i + 1) for i in range(C)], axis=-1)

    def apply_jx(t):
        return jnp.stack([t.sum(-1) * (i + 1) for i in range(C)], axis=-1)

    got = np.asarray(slide_inference(apply_jx, jnp.asarray(img), C,
                                     tile=32, stride=16))
    # oracle
    full = np.zeros((1, 64, 64, C), np.float32)
    cnt = np.zeros((1, 64, 64, 1), np.float32)
    for y, x in tile_positions(64, 64, 32, 16):
        pred = apply_np(img[:, y:y + 32, x:x + 32])
        full[:, y:y + 32, x:x + 32] += pred
        cnt[:, y:y + 32, x:x + 32] += 1
    np.testing.assert_allclose(got, full / cnt, rtol=1e-5)


def test_slide_pads_small_images():
    def apply_jx(t):
        return jnp.ones(t.shape[:3] + (2,))
    out = slide_inference(apply_jx, jnp.zeros((1, 20, 20, 3)), 2, tile=32,
                          stride=16)
    assert out.shape == (1, 20, 20, 2)


class TestMetrics:
    def test_perfect_prediction(self):
        m = PixelMetricIgnore(3, class_names=['a', 'b', 'c'], ignore_labels=[0])
        y = np.array([0, 1, 2, 1, 2])
        m.forward(y, y)
        tb, miou = m.summary_all()
        assert miou == 1.0
        assert 'mean' in str(tb)

    def test_ignored_class_popped(self):
        m = PixelMetricIgnore(3, class_names=['bg', 'x', 'y'], ignore_labels=[0])
        y_true = np.array([0, 0, 1, 2])
        y_pred = np.array([1, 2, 1, 2])  # bg always wrong; x,y right
        m.forward(y_true, y_pred)
        tb, miou = m.summary_all()
        # bg popped; iou(x)=1/2 (fp from bg), iou(y)=1/2
        assert miou == pytest.approx(0.5)

    def test_negative_gt_excluded(self):
        m = PixelMetricIgnore(2)
        m.forward(np.array([-1, 0, 1]), np.array([0, 0, 1]))
        assert m.confusion_matrix.sum() == 2


@pytest.fixture(scope='module')
def synthetic_isprs(tmp_path_factory):
    """Tiny IsprsDA-like tree: 3 val tiles of 64x64."""
    root = tmp_path_factory.mktemp('data')
    img_dir = root / 'img_dir' / 'val'
    ann_dir = root / 'ann_dir' / 'val'
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(3):
        img = rng.integers(0, 255, size=(64, 64, 3)).astype(np.uint8)
        lbl = rng.integers(0, 6, size=(64, 64)).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f'tile_{i}.png')
        Image.fromarray(lbl).save(ann_dir / f'tile_{i}.png')
    return str(img_dir), str(ann_dir)


def test_evaluate_end_to_end(synthetic_isprs, tmp_path):
    from regda_tpu.models import build_deeplabv2
    from regda_tpu.utils.eval import evaluate
    from regda_tpu.aug import Compose, Normalize

    img_dir, ann_dir = synthetic_isprs
    cfg = types.SimpleNamespace(
        DATASETS='IsprsDA',
        SNAPSHOT_DIR=str(tmp_path / 'snap'),
        EVAL_DATA_CONFIG=dict(
            image_dir=[img_dir], mask_dir=[ann_dir],
            transforms=Compose([Normalize((120., 80., 80.), (50., 40., 40.))]),
            training=False, batch_size=1, num_workers=0),
        TEST_DATA_CONFIG=None,
    )
    model = build_deeplabv2('resnet18', num_classes=6)
    variables = model.init({'params': jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    tb, miou = evaluate(model, variables, cfg, is_training=True,
                        ckpt_path=str(tmp_path / 'fake.ckpt'), slide=False)
    assert 0.0 <= miou <= 1.0
    assert 'iou' in str(tb)
    # viz PNGs written
    vis = os.path.join(cfg.SNAPSHOT_DIR, 'vis-fake.ckpt')
    assert len(os.listdir(vis)) == 3


def test_pseudo_selection1_variant():
    """Argmax-class selection (pseudo_generation.py:24-56): pixels below the
    argmax class's threshold become ignore."""
    import numpy as np
    import jax.numpy as jnp
    from regda_tpu.ops.pseudo import pseudo_selection1
    probs = np.full((1, 2, 2, 3), 0.1, np.float32)
    probs[0, 0, 0] = [0.9, 0.05, 0.05]   # confident class 0
    probs[0, 0, 1] = [0.5, 0.3, 0.2]     # class 0 but 0.5 < 0.9*0.8 -> ignore
    probs[0, 1, 0] = [0.1, 0.65, 0.25]   # class 1: thr max(0.65*0.8, 0.6)=0.6
    probs[0, 1, 1] = [0.2, 0.2, 0.61]    # class 2: 0.61 > max(0.61*.8,.6)? yes
    out = np.asarray(pseudo_selection1(jnp.asarray(probs)))
    assert out[0, 0, 0] == 0 and out[0, 0, 1] == -1
    assert out[0, 1, 0] == 1 and out[0, 1, 1] == 2


def test_predict_multiscale():
    import numpy as np
    from regda_tpu.models import build_deeplabv2
    from regda_tpu.infer import SegInferencer
    model = build_deeplabv2('resnet18', num_classes=6)
    variables = model.init({'params': jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    inferencer = SegInferencer(model, variables, num_classes=6)
    images = np.random.default_rng(0).normal(
        size=(1, 64, 64, 3)).astype(np.float32)
    probs = inferencer.predict_multiscale(images, scales=(0.75, 1.0))
    assert probs.shape[:3] == images.shape[:3]
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_predict_multiscale_matches_reference_oracle():
    """predict_multiscale numerics == the reference's
    ndimage.zoom(order=1) -> predict_whole -> align-corners upsample ->
    average pipeline (regda/utils/tools.py:99-129), run through the torch
    oracle model with converter-matched weights."""
    import torch
    import torch.nn.functional as tnf
    from scipy import ndimage
    from regda_tpu.models import build_deeplabv2
    from regda_tpu.infer import SegInferencer
    from regda_tpu.utils.torch_convert import torch_state_dict_to_variables
    from tests.torch_oracle import Deeplabv2Oracle

    torch.manual_seed(0)
    oracle = Deeplabv2Oracle('resnet50', num_classes=6)
    oracle.eval()
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    variables = jax.tree.map(jnp.asarray,
                             torch_state_dict_to_variables(state))
    model = build_deeplabv2('resnet50', num_classes=6)

    rng = np.random.default_rng(5)
    h = w = 64
    img_nchw = rng.normal(size=(1, 3, h, w)).astype(np.float32)
    scales = (0.75, 1.0, 1.25)

    # reference predict_multiscale (utils/tools.py:108-129): zoom the
    # input (order-1 spline == align-corners bilinear), model eval forward
    # (already full-res avg softmax at the scaled size), upsample to tile
    # size with align_corners=True, accumulate, divide by len(scales)
    full = torch.zeros((1, 6, h, w))
    with torch.no_grad():
        for scale in scales:
            scaled = ndimage.zoom(img_nchw, (1.0, 1.0, scale, scale),
                                  order=1, prefilter=False)
            probs = oracle(torch.from_numpy(scaled))
            full += tnf.interpolate(probs, (h, w), mode='bilinear',
                                    align_corners=True)
    want = (full / len(scales)).numpy()

    inferencer = SegInferencer(model, variables, num_classes=6)
    got = inferencer.predict_multiscale(
        img_nchw.transpose(0, 2, 3, 1), scales=scales).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sharded_inferencer_matches_single_device():
    """Mesh-sharded batch inference (data parallelism over 8 virtual
    devices) must reproduce the single-device probabilities."""
    import numpy as np
    from regda_tpu.models import build_deeplabv2
    from regda_tpu.infer import SegInferencer
    from regda_tpu.parallel import make_mesh

    model = build_deeplabv2('resnet18', num_classes=6)
    variables = model.init({'params': jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    images = np.random.default_rng(1).normal(
        size=(8, 64, 64, 3)).astype(np.float32)
    single = SegInferencer(model, variables, 6).predict_probs(
        images, slide=False)
    mesh = make_mesh(n_data=8, n_spatial=1)
    sharded = SegInferencer(model, variables, 6, mesh=mesh).predict_probs(
        images, slide=False)
    np.testing.assert_allclose(sharded, single, atol=2e-5)


def test_predict_labels_is_device_argmax_of_probs():
    """predict_labels (the eval fast path: argmax on device, 1 byte/px
    shipped instead of C floats) must equal argmax(predict_probs) in every
    slide/tta combination."""
    import numpy as np
    from regda_tpu.models import build_deeplabv2
    from regda_tpu.infer import SegInferencer

    model = build_deeplabv2('resnet18', num_classes=6)
    variables = model.init({'params': jax.random.PRNGKey(0)},
                           jnp.zeros((1, 64, 64, 3)), train=False)
    inf = SegInferencer(model, variables, 6, tile=32, stride=16)
    images = np.random.default_rng(3).normal(
        size=(2, 64, 64, 3)).astype(np.float32)
    for slide in (False, True):
        for tta in (False, True):
            probs = inf.predict_probs(images, slide=slide, tta=tta)
            labels = inf.predict_labels(images, slide=slide, tta=tta)
            assert labels.dtype == np.int32 and labels.shape == (2, 64, 64)
            np.testing.assert_array_equal(labels,
                                          probs.argmax(-1).astype(np.int32))
