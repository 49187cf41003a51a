"""Sliding-window median as a Pallas TPU kernel.

Equivalent of the reference's *source-templated* Triton bubble-sort median
(`whisper/triton_ops.py:43-95`, whose kernel text is rewritten per width):
here the width is a Python int, so the sorting network unrolls naturally at
trace time — no string templating. Each program holds `width` shifted
(rows, T) vectors in VMEM and runs an odd-even transposition network of
min/max compare-swaps on the VPU, then emits the middle element. Unlike the
XLA unfold+sort fallback (ops/median.py), no (…, T, width) tensor is ever
materialized in HBM.

Used for odd widths (the reference CLI allows 3..13; default 7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _median_kernel(x_ref, o_ref, *, width: int, t_out: int):
    # x_ref: (block_r, t_out + width - 1) reflect-padded rows
    vals = [x_ref[:, i : i + t_out] for i in range(width)]
    # odd-even transposition sort network: after `width` rounds the list is
    # sorted elementwise (same comparisons the Triton kernel's generated
    # bubble-sort lines perform)
    for rnd in range(width):
        start = rnd % 2
        for i in range(start, width - 1, 2):
            lo = jnp.minimum(vals[i], vals[i + 1])
            hi = jnp.maximum(vals[i], vals[i + 1])
            vals[i], vals[i + 1] = lo, hi
    o_ref[...] = vals[width // 2]


@functools.partial(jax.jit, static_argnames=("filter_width", "interpret"))
def median_filter_pallas(x: jnp.ndarray, filter_width: int, interpret: bool = False):
    """Median of odd `filter_width` along the last axis, reflect-padded —
    same contract as ops/median.py:median_filter. x: any leading dims."""
    assert filter_width > 0 and filter_width % 2 == 1
    pad = filter_width // 2
    t = x.shape[-1]
    if t <= pad:
        return x

    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, t)
    padded = jnp.pad(x2, ((0, 0), (pad, pad)), mode="reflect")

    block_r = min(rows, 8)
    rows_pad = ((rows + block_r - 1) // block_r) * block_r
    if rows_pad != rows:
        padded = jnp.pad(padded, ((0, rows_pad - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_median_kernel, width=filter_width, t_out=t),
        grid=(rows_pad // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, t + 2 * pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, t), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, t), x.dtype),
        interpret=interpret,
    )(padded)
    return out[:rows].reshape(*lead, t)
