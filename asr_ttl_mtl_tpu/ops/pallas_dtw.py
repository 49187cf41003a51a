"""Anti-diagonal wavefront DTW as a Pallas TPU kernel.

TPU-native equivalent of the reference's Triton `dtw_kernel`
(`whisper/triton_ops.py:13-40`): the DTW recurrence is sequential along
anti-diagonals, so the kernel sweeps one diagonal per loop step with pure
vector ops, exactly like the Triton kernel's `tl.debug_barrier` loop — but
in a *skewed layout* chosen for the TPU's (sublane, lane) tiling:

    C[d, i] = cost[i, d - i]        (d = anti-diagonal index, i = text index)

so each sweep reads two full rows (d-1, d-2), does lane-shifts for the
i-1 neighbors, and writes row d — all (1, N_pad) lane-vectors, no gathers.

The backtrace (data-dependent ~N+M walk) stays on host, as in the reference
(`whisper/timing.py:57-79` runs it on CPU even for the CUDA path).

Cost-matrix convention matches ops/dtw.py: x is (N_text, M_frames); callers
pass -attention. Tie-breaking is bit-identical to the reference comparisons
(timing.py:95-100): t=0 iff diag strictly smallest, t=1 iff upper strictly
smaller than both, else t=2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")


def _dtw_kernel(xs_ref, trace_ref, cost_ref, *, n: int, m: int, n_pad: int):
    """xs_ref: (D_pad, N_pad) skewed cost input, xs[d, i] = x[i-1, d-i-1].
    trace_ref: (D_pad, N_pad) output trace in the same skewed layout.
    cost_ref: (D_pad, N_pad) fp32 scratch holding the running DP table."""
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    # init: cost[0, 0] = 0, everything else +inf (cost[i>0, 0] and
    # cost[0, j>0] live on diagonals d=i and d=j and stay inf).
    # Mosaic forbids scalar stores to VMEM, so row 0 is written as a
    # masked lane-vector instead of cost_ref[0, 0] = 0.
    cost_ref[...] = jnp.full_like(cost_ref, _INF)
    trace_ref[...] = jnp.full_like(trace_ref, -1.0)
    cost_ref[0:1, :] = jnp.where(lanes_i == 0, 0.0, _INF)

    def sweep(d, _):
        prev1 = cost_ref[pl.ds(d - 1, 1), :]  # cost[i, d-1]   (1, N_pad)
        prev2 = cost_ref[pl.ds(d - 2, 1), :]  # cost[i, d-2]
        c2 = prev1  # cost[i,   j-1]
        c1 = pltpu.roll(prev1, shift=1, axis=1)  # cost[i-1, j  ]
        c0 = pltpu.roll(prev2, shift=1, axis=1)  # cost[i-1, j-1]

        t0 = (c0 < c1) & (c0 < c2)
        t1 = (c1 < c0) & (c1 < c2)
        c = jnp.where(t0, c0, jnp.where(t1, c1, c2))
        t = jnp.where(t0, 0.0, jnp.where(t1, 1.0, 2.0))

        j = d - lanes_i
        valid = (lanes_i >= 1) & (lanes_i <= n) & (j >= 1) & (j <= m)
        x = xs_ref[pl.ds(d, 1), :]
        cost_ref[pl.ds(d, 1), :] = jnp.where(valid, x + c, _INF)
        trace_ref[pl.ds(d, 1), :] = jnp.where(valid, t, -1.0)
        return 0

    jax.lax.fori_loop(2, n + m + 1, sweep, 0)


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dtw_trace_device(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """x: (N, M) fp32 cost matrix -> skewed trace (D_pad, N_pad) fp32."""
    n, m = x.shape
    n_pad = _round_up(n + 1, 128)
    d_pad = _round_up(n + m + 1, 8)

    # skew on-device with one gather: xs[d, i] = x[i-1, d-i-1]
    d_idx = jnp.arange(d_pad)[:, None]
    i_idx = jnp.arange(n_pad)[None, :]
    row = i_idx - 1
    col = d_idx - i_idx - 1
    inside = (row >= 0) & (row < n) & (col >= 0) & (col < m)
    xs = jnp.where(
        inside,
        x.astype(jnp.float32)[jnp.clip(row, 0, n - 1), jnp.clip(col, 0, m - 1)],
        0.0,
    )

    return pl.pallas_call(
        functools.partial(_dtw_kernel, n=n, m=m, n_pad=n_pad),
        out_shape=jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((d_pad, n_pad), jnp.float32)],
        interpret=interpret,
    )(xs)


def dtw_trace_pallas(x, interpret: bool = False) -> np.ndarray:
    """DP trace matrix (N+1, M+1) of cost matrix x (N, M), computed on device.

    Same contract as ops/dtw.py:dtw_wavefront_numpy; feed to backtrace().
    VMEM budget check: three (D_pad, N_pad) fp32 buffers must fit in ~16 MB.
    """
    x = np.asarray(x, dtype=np.float32)
    n, m = x.shape
    n_pad = _round_up(n + 1, 128)
    d_pad = _round_up(n + m + 1, 8)
    if 3 * d_pad * n_pad * 4 > 14 * 1024 * 1024:
        raise ValueError(f"DTW ({n}, {m}) exceeds the single-block VMEM budget")

    skewed = np.asarray(_dtw_trace_device(jnp.asarray(x), interpret=interpret))
    # unskew: trace[i, j] = skewed[i + j, i]
    i = np.arange(n + 1)[:, None]
    j = np.arange(m + 1)[None, :]
    return skewed[i + j, np.broadcast_to(i, (n + 1, m + 1))].astype(np.float32)


# ---------------------------------------------------------------------------
# batched DTW with per-row lengths + on-device backtrace
# ---------------------------------------------------------------------------
#
# The batched word-timestamp path (timing.find_alignment_batch) aligns tens
# of windows at once; fetching each row's (N, M) fp32 cost matrix to walk the
# DP on host dominated the mode (~1.2 MB/row over the tunnel plus an O(N*M)
# numpy sweep per row). Here the wavefront fill runs as ONE pallas_call with
# a grid over rows — per-row true (n, m) arrive via scalar prefetch, so every
# row shares a single compiled program at the (n_max, m) bucket — and the
# data-dependent backtrace runs in the same jitted program as a vmapped XLA
# while_loop over the trace (rows walk in lockstep, done-rows masked). The
# host receives only the (B, L) path index arrays (~90x less D2H than the
# matrices) and does O(N+M) python per row.


def _dtw_kernel_batch(nm_ref, xs_ref, trace_ref, cost_ref, *, n_pad: int):
    """Grid-over-rows variant of _dtw_kernel: identical recurrence and
    tie-breaking, bounds (n, m) read from the scalar-prefetch ref."""
    b = pl.program_id(0)
    n = nm_ref[b, 0]
    m = nm_ref[b, 1]
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    cost_ref[...] = jnp.full_like(cost_ref, _INF)
    trace_ref[...] = jnp.full_like(trace_ref, -1.0)
    cost_ref[0:1, :] = jnp.where(lanes_i == 0, 0.0, _INF)

    def sweep(d, _):
        prev1 = cost_ref[pl.ds(d - 1, 1), :]
        prev2 = cost_ref[pl.ds(d - 2, 1), :]
        c2 = prev1
        c1 = pltpu.roll(prev1, shift=1, axis=1)
        c0 = pltpu.roll(prev2, shift=1, axis=1)

        t0 = (c0 < c1) & (c0 < c2)
        t1 = (c1 < c0) & (c1 < c2)
        c = jnp.where(t0, c0, jnp.where(t1, c1, c2))
        t = jnp.where(t0, 0.0, jnp.where(t1, 1.0, 2.0))

        j = d - lanes_i
        valid = (lanes_i >= 1) & (lanes_i <= n) & (j >= 1) & (j <= m)
        x = xs_ref[pl.ds(d, 1), :]
        cost_ref[pl.ds(d, 1), :] = jnp.where(valid, x + c, _INF)
        trace_ref[pl.ds(d, 1), :] = jnp.where(valid, t, -1.0)
        return 0

    jax.lax.fori_loop(2, n + m + 1, sweep, 0)


def _backtrace_one(skewed, n, m, l_max: int):
    """Reference backtrace (timing.py:57-79) on the SKEWED trace
    (trace[i, j] = skewed[i + j, i]), emitted as fixed-size index arrays in
    reverse path order plus the true path length. Boundary behavior matches
    the host walk's trace[0, :] = 2 / trace[:, 0] = 1 priming."""

    def cond(c):
        i, j, k, ti, tj = c
        return (i > 0) | (j > 0)

    def body(c):
        i, j, k, ti, tj = c
        ti = ti.at[k].set(i - 1)
        tj = tj.at[k].set(j - 1)
        t = skewed[i + j, i]
        t = jnp.where(i == 0, 2.0, jnp.where(j == 0, 1.0, t))
        di = jnp.where(t != 2.0, 1, 0)
        dj = jnp.where(t != 1.0, 1, 0)
        return i - di, j - dj, k + 1, ti, tj

    init = (n, m, 0,
            jnp.zeros((l_max,), jnp.int32), jnp.zeros((l_max,), jnp.int32))
    _, _, k, ti, tj = jax.lax.while_loop(cond, body, init)
    return ti, tj, k


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dtw_paths_jit(x, nm, interpret: bool = False):
    b, n_max, m_max = x.shape
    n_pad = _round_up(n_max + 1, 128)
    d_pad = _round_up(n_max + m_max + 1, 8)

    # skew each row on device: xs[b, d, i] = x[b, i-1, d-i-1]
    d_idx = jnp.arange(d_pad)[:, None]
    i_idx = jnp.arange(n_pad)[None, :]
    row = i_idx - 1
    col = d_idx - i_idx - 1
    inside = (row >= 0) & (row < n_max) & (col >= 0) & (col < m_max)
    xs = jnp.where(
        inside[None],
        x.astype(jnp.float32)[
            :, jnp.clip(row, 0, n_max - 1), jnp.clip(col, 0, m_max - 1)
        ],
        0.0,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((None, d_pad, n_pad), lambda i, nm_ref: (i, 0, 0))],
        out_specs=pl.BlockSpec((None, d_pad, n_pad), lambda i, nm_ref: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((d_pad, n_pad), jnp.float32)],
    )
    traces = pl.pallas_call(
        functools.partial(_dtw_kernel_batch, n_pad=n_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(nm, xs)

    l_max = n_max + m_max
    ti, tj, lens = jax.vmap(
        functools.partial(_backtrace_one, l_max=l_max)
    )(traces, nm[:, 0], nm[:, 1])
    return ti, tj, lens


def dtw_paths_batch(x, n_arr, m_arr, interpret: bool = False):
    """Batched DTW paths fully on device.

    x: (B, N_max, M_max) cost matrices (callers pass -attention; rows/cols
    beyond each row's true (n, m) are ignored). Returns a list of
    (text_indices, time_indices) int arrays, one per row — identical to
    ``backtrace(dtw_wavefront_numpy(x[b, :n, :m]))`` per row.

    VMEM: three (d_pad, n_pad) fp32 buffers per grid step must fit; callers
    should catch ValueError and fall back to the host path.

    `x` may be a DEVICE array (jnp): it is consumed in place without a
    host round trip — the point of the batched path is that only the
    (B, L) index arrays ever cross the tunnel. Use `dtw_paths_dispatch` /
    `dtw_paths_collect` for a pipelined (async) version of the same call.
    """
    ti, tj, lens = dtw_paths_dispatch(x, n_arr, m_arr, interpret=interpret)
    return dtw_paths_collect((ti, tj, lens))


def dtw_paths_dispatch(x, n_arr, m_arr, interpret: bool = False):
    """Async half of dtw_paths_batch: dispatches the device work and returns
    un-fetched handles, so callers can overlap the fill+backtrace with other
    dispatches (e.g. the next chunk's alignment forward)."""
    if not isinstance(x, jnp.ndarray):
        x = jnp.asarray(np.asarray(x, np.float32))
    b, n_max, m_max = x.shape
    n_pad = _round_up(n_max + 1, 128)
    d_pad = _round_up(n_max + m_max + 1, 8)
    if 3 * d_pad * n_pad * 4 > 14 * 1024 * 1024:
        raise ValueError(f"batched DTW ({n_max}, {m_max}) exceeds the VMEM budget")
    nm = np.stack([np.asarray(n_arr, np.int32), np.asarray(m_arr, np.int32)], axis=1)
    return _dtw_paths_jit(x, jnp.asarray(nm), interpret=interpret)


def dtw_paths_collect(handles):
    ti, tj, lens = handles
    ti, tj, lens = np.asarray(ti), np.asarray(tj), np.asarray(lens)
    out = []
    for r in range(ti.shape[0]):
        k = int(lens[r])
        out.append((ti[r, :k][::-1].copy(), tj[r, :k][::-1].copy()))
    return out
