"""Pallas segment-histogram kernel vs the XLA segment_sum reference path
(interpret mode on CPU; the same code compiles on TPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from regda_tpu.ops.labels import one_hot_ignore
from regda_tpu.ops.lrh import homogenize, region_histogram
from regda_tpu.ops.pallas.segment_hist import segment_hist_labels_pallas


@pytest.mark.parametrize('seed', [0, 1])
def test_pallas_hist_matches_segment_sum(seed):
    rng = np.random.default_rng(seed)
    b, n, R, C = 2, 2048, 64, 6
    labels = rng.integers(-1, C, size=(b, n)).astype(np.int32)
    regions = rng.integers(0, R, size=(b, n)).astype(np.int32)
    want = np.asarray(region_histogram(
        one_hot_ignore(jnp.asarray(labels), C), jnp.asarray(regions), R))
    got = np.asarray(segment_hist_labels_pallas(
        jnp.asarray(labels), jnp.asarray(regions), R, C))
    np.testing.assert_array_equal(got, want)


def test_pallas_hist_ragged_tail_padding():
    rng = np.random.default_rng(2)
    b, n, R, C = 1, 1000, 32, 6  # n not divisible by chunk
    labels = rng.integers(-1, C, size=(b, n)).astype(np.int32)
    regions = rng.integers(0, R, size=(b, n)).astype(np.int32)
    want = np.asarray(region_histogram(
        one_hot_ignore(jnp.asarray(labels), C), jnp.asarray(regions), R))
    got = np.asarray(segment_hist_labels_pallas(
        jnp.asarray(labels), jnp.asarray(regions), R, C))
    np.testing.assert_array_equal(got, want)


def test_homogenize_pallas_path_matches_xla():
    rng = np.random.default_rng(3)
    pseudo = rng.integers(-1, 6, size=(2, 64, 64)).astype(np.int32)
    regions = rng.integers(0, 17, size=(2, 64, 64)).astype(np.int32)
    a = np.asarray(homogenize(jnp.asarray(pseudo), jnp.asarray(regions),
                              percent=0.5, num_regions=32, use_pallas=False))
    b = np.asarray(homogenize(jnp.asarray(pseudo), jnp.asarray(regions),
                              percent=0.5, num_regions=32, use_pallas=True))
    np.testing.assert_array_equal(a, b)
