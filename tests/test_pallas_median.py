"""Pallas sliding-median kernel vs the XLA unfold+sort reference
(interpret mode on CPU; same code Mosaic-compiles on TPU)."""

import numpy as np
import pytest

from asr_ttl_mtl_tpu.ops.median import median_filter
from asr_ttl_mtl_tpu.ops.pallas_median import median_filter_pallas


@pytest.mark.parametrize("width", [3, 5, 7, 9, 13])
def test_parity_2d(width):
    rng = np.random.RandomState(width)
    x = rng.randn(10, 200).astype(np.float32)
    got = np.asarray(median_filter_pallas(x, width, interpret=True))
    want = np.asarray(median_filter(x, width))
    np.testing.assert_allclose(got, want, atol=0)


def test_parity_3d_and_row_padding():
    rng = np.random.RandomState(0)
    x = rng.randn(3, 7, 129).astype(np.float32)  # rows not a multiple of 8
    got = np.asarray(median_filter_pallas(x, 7, interpret=True))
    want = np.asarray(median_filter(x, 7))
    np.testing.assert_allclose(got, want, atol=0)


def test_short_input_passthrough():
    x = np.ones((2, 3), np.float32)
    got = np.asarray(median_filter_pallas(x, 7, interpret=True))
    np.testing.assert_allclose(got, x)
