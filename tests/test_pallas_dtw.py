"""Pallas wavefront DTW kernel vs the host numpy sweep (interpret mode).

Both must produce identical trace matrices (and therefore identical
alignment paths) for any cost matrix, including ties — the tie-break rule
mirrors reference whisper/timing.py:95-100.
"""

import numpy as np
import pytest

from asr_ttl_mtl_tpu.ops.dtw import backtrace, dtw_wavefront_numpy
from asr_ttl_mtl_tpu.ops.pallas_dtw import dtw_trace_pallas


def check(x):
    want = dtw_wavefront_numpy(x)
    got = dtw_trace_pallas(x, interpret=True)
    # compare only reachable DP cells (unreachable stay -1 in both)
    np.testing.assert_array_equal(got[1:, 1:], want[1:, 1:])
    # identical alignment paths end-to-end
    ti_w, fi_w = backtrace(want.copy())
    ti_g, fi_g = backtrace(got.copy())
    np.testing.assert_array_equal(ti_g, ti_w)
    np.testing.assert_array_equal(fi_g, fi_w)


class TestPallasDTW:
    def test_small_random(self):
        rng = np.random.RandomState(0)
        check(rng.rand(7, 13).astype(np.float32))

    def test_rectangular_tall(self):
        rng = np.random.RandomState(1)
        check(rng.rand(50, 9).astype(np.float32))

    def test_ties(self):
        # quantized values force many exact ties -> exercises tie-break order
        rng = np.random.RandomState(2)
        check((rng.randint(0, 3, size=(20, 30)) * 0.5).astype(np.float32))

    def test_whisper_like_shape(self):
        # a realistic alignment: ~40 tokens x 300 frames of -attention
        rng = np.random.RandomState(3)
        att = rng.rand(40, 300).astype(np.float32)
        check(-att)

    def test_single_token(self):
        rng = np.random.RandomState(4)
        check(rng.rand(1, 25).astype(np.float32))

    def test_vmem_budget_guard(self):
        with pytest.raises(ValueError):
            dtw_trace_pallas(np.zeros((448, 6000), np.float32), interpret=True)
