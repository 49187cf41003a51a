"""Dynamic time warping for cross-attention word alignment.

Equivalent of reference `whisper/timing.py:57-151` + `whisper/triton_ops.py:
13-40` (numba dtw_cpu / Triton wavefront dtw_kernel). The recurrence is
inherently sequential along anti-diagonals, so:

* `dtw_wavefront_numpy` — vectorized anti-diagonal sweep on host: O(N+M)
  numpy vector steps instead of the reference's O(N*M) scalar JIT loop.
* `dtw_pallas` — the same wavefront as a single-block Pallas TPU kernel
  (mirrors the Triton kernel's skewed layout) for on-device alignment; see
  ops/pallas_dtw.py.
* backtrace always runs on host (data-dependent walk, ~N+M steps).

Input convention matches the reference: x (N_text, M_frames) cost matrix
(callers pass -attention); returns (text_indices, time_indices).
"""

from __future__ import annotations

import numpy as np


def backtrace(trace: np.ndarray) -> np.ndarray:
    """Walk the traceback matrix from (N, M) to (0, 0)
    (reference timing.py:57-79)."""
    i = trace.shape[0] - 1
    j = trace.shape[1] - 1
    trace[0, :] = 2
    trace[:, 0] = 1

    result = []
    while i > 0 or j > 0:
        result.append((i - 1, j - 1))
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        elif t == 2:
            j -= 1
        else:
            raise ValueError("Unexpected trace[i, j]")
    return np.array(result)[::-1, :].T


def dtw_wavefront_numpy(x: np.ndarray) -> np.ndarray:
    """Anti-diagonal DTW: each sweep updates one diagonal of cost/trace with
    pure vector ops. Produces the same trace as the reference's cell-by-cell
    dtw_cpu (timing.py:82-105)."""
    N, M = x.shape
    x = x.astype(np.float64)
    cost = np.full((N + 1, M + 1), np.inf, dtype=np.float64)
    trace = -np.ones((N + 1, M + 1), dtype=np.float32)
    cost[0, 0] = 0.0

    # cells (i, j) with i in [1, N], j in [1, M]; diagonal d = i + j
    for d in range(2, N + M + 1):
        i_lo = max(1, d - M)
        i_hi = min(N, d - 1)
        if i_lo > i_hi:
            continue
        i = np.arange(i_lo, i_hi + 1)
        j = d - i
        c0 = cost[i - 1, j - 1]
        c1 = cost[i - 1, j]
        c2 = cost[i, j - 1]
        # tie-break identical to the reference comparisons (timing.py:95-100):
        # t=0 iff c0 strictly smallest, t=1 iff c1 strictly smaller than both,
        # else t=2
        t0 = (c0 < c1) & (c0 < c2)
        t1 = (c1 < c0) & (c1 < c2)
        c = np.where(t0, c0, np.where(t1, c1, c2))
        t = np.where(t0, 0.0, np.where(t1, 1.0, 2.0))
        cost[i, j] = x[i - 1, j - 1] + c
        trace[i, j] = t
    return trace


def dtw(x, use_device: bool = False) -> np.ndarray:
    """DTW alignment path of a cost matrix (reference timing.py:141-151).

    use_device=True routes the wavefront fill through the Pallas TPU kernel
    when a TPU is available, falling back to the host sweep otherwise.
    """
    x = np.asarray(x)
    if use_device:
        try:
            from .pallas_dtw import dtw_trace_pallas

            trace = dtw_trace_pallas(x)
            return backtrace(np.asarray(trace))
        except Exception:
            pass
    return backtrace(dtw_wavefront_numpy(x))
