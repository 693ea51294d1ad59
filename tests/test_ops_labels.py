"""Unit tests: label helpers vs torch/numpy oracles (reference semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from regda_tpu.ops.labels import one_hot_ignore, downscale_label


def torch_downscale_oracle(label, scale, n_classes, ignore_label, min_ratio):
    """Reference DownscaleLabel (alignment.py:456-481) in torch."""
    import torch
    import torch.nn.functional as tnf
    label = torch.from_numpy(label.copy()).long()
    label[label == ignore_label] = n_classes
    out = tnf.one_hot(label, num_classes=n_classes + 1).permute(0, 3, 1, 2)
    out = tnf.avg_pool2d(out.float(), kernel_size=scale)
    max_ratio, out = torch.max(out, dim=1, keepdim=True)
    out[out == n_classes] = ignore_label
    out[max_ratio < min_ratio] = ignore_label
    return out.squeeze(1).numpy()


def test_one_hot_ignore_zero_rows():
    lbl = jnp.array([[0, 2, -1, 5]])
    oh = np.asarray(one_hot_ignore(lbl, 6))
    assert oh.shape == (1, 4, 6)
    assert oh[0, 0, 0] == 1 and oh[0, 1, 2] == 1 and oh[0, 3, 5] == 1
    assert oh[0, 2].sum() == 0  # ignored pixel -> all-zero row


@pytest.mark.parametrize("seed", [0, 1])
def test_downscale_label_matches_torch(seed):
    rng = np.random.default_rng(seed)
    lbl = rng.integers(-1, 6, size=(2, 64, 64)).astype(np.int64)
    # inject homogeneous areas so some windows pass min_ratio
    lbl[:, :32, :32] = 3
    got = np.asarray(downscale_label(jnp.asarray(lbl), 16, 6, -1, 0.75))
    want = torch_downscale_oracle(lbl, 16, 6, -1, 0.75)
    np.testing.assert_array_equal(got, want)


def test_downscale_pure_ignore_window():
    lbl = np.full((1, 16, 16), -1, dtype=np.int64)
    out = np.asarray(downscale_label(jnp.asarray(lbl), 16, 6))
    assert out.item() == -1


def test_aug_resize_and_pad():
    """Resize (bilinear img / nearest labels) and Pad transforms
    (reference regda/aug/augmentation.py:20-30,125-137)."""
    import numpy as np
    from regda_tpu.aug import Resize, Pad
    rng = np.random.default_rng(0)
    sample = {'image': rng.random((8, 8, 3)).astype(np.float32),
              'cls': rng.integers(0, 4, (8, 8)).astype(np.int32),
              'sup': rng.integers(0, 9, (8, 8)).astype(np.int32)}
    out = Resize(4)(sample, rng)
    assert out['image'].shape == (4, 4, 3)
    assert out['cls'].shape == (4, 4) and out['cls'].dtype == np.int32
    # nearest keeps original label values only
    assert set(np.unique(out['cls'])) <= set(np.unique(sample['cls']))
    # identity resize is exact
    same = Resize(8)(sample, rng)
    np.testing.assert_array_equal(same['image'], sample['image'])

    padded = Pad(2, padding_fill_value=0, padding_fill_target_value=-1)(
        sample, rng)
    assert padded['image'].shape == (12, 12, 3)
    assert padded['cls'].shape == (12, 12)
    assert (padded['cls'][:2] == -1).all() and (padded['image'][:2] == 0).all()
    np.testing.assert_array_equal(padded['cls'][2:-2, 2:-2], sample['cls'])
