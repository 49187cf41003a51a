"""Exact small-k top-k as a single-pass Pallas TPU kernel.

XLA's `lax.top_k` over the beam loop's (B*K, ~52k) logprobs lowers to a
multi-pass routine measured at ~64 GB/s effective — 23 ms of a 291 ms
B=48 beam call (tpu_beam_profile, round 4). For small k the whole row fits
in VMEM, so one HBM pass suffices: each grid step loads an (8, V_pad) row
block and extracts the k largest by k unrolled (max, lowest-index-of-max,
mask-single-element) rounds — bit-identical results AND tie order to
lax.top_k (ties resolve to the lowest index; duplicated values are listed
as many times as they appear, exactly like top_k).

Padding: V pads to a lane multiple with -inf, rows to a sublane multiple —
padded lanes can never win a tie against a real -inf because the tie
breaks on the lower (real) index, and padded rows are sliced off.

Reference semantics being replaced: the per-beam top-(K+1) candidate pick
of `whisper/decoding.py:342`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 8


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int):
    x = x_ref[...]  # (rows, V_pad) f32
    n = x.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    # an explicit taken-mask (not value-masking) so already-extracted -inf
    # entries cannot be re-selected — a value mask has nothing below -inf
    taken = jnp.zeros(x.shape, jnp.bool_)
    for j in range(k):
        masked = jnp.where(taken, -jnp.inf, x)
        m = jnp.max(masked, axis=1, keepdims=True)  # (rows, 1)
        # lowest not-taken index attaining the max (lax.top_k's tie order;
        # duplicated values are re-listed on later rounds like top_k)
        sel = jnp.where((masked == m) & ~taken, iota, n)
        idx = jnp.min(sel, axis=1, keepdims=True)
        vals_ref[:, j : j + 1] = m
        idx_ref[:, j : j + 1] = idx
        taken = taken | (iota == idx)


def _topk_logprobs_kernel(x_ref, vals_ref, idx_ref, *, k: int, v_len: int):
    """top-k of log_softmax(x) without materializing the logprobs: ranking
    is monotone in the raw logits, and each selected value is finished as
    (x_sel - max) - log(sum(exp(x - max))) — the exact float-op order of
    jax.nn.log_softmax(x.astype(f32)) followed by lax.top_k, so results are
    bit-identical to that fallback."""
    x = x_ref[...].astype(jnp.float32)  # (rows, V_pad)
    n = x.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    pad = iota >= v_len
    x = jnp.where(pad, -jnp.inf, x)
    m = jnp.max(x, axis=1, keepdims=True)
    shifted = x - m
    log_denom = jnp.log(jnp.sum(jnp.exp(shifted), axis=1, keepdims=True))
    taken = pad
    for j in range(k):
        masked = jnp.where(taken, -jnp.inf, x)
        mj = jnp.max(masked, axis=1, keepdims=True)
        sel = jnp.where((masked == mj) & ~taken, iota, n)
        idx = jnp.min(sel, axis=1, keepdims=True)
        vals_ref[:, j : j + 1] = (mj - m) - log_denom
        idx_ref[:, j : j + 1] = idx
        taken = taken | (iota == idx)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def topk_logprobs_pallas(logits: jnp.ndarray, k: int, *, interpret: bool = False):
    """(values, indices) == lax.top_k(log_softmax(logits.astype(f32)), k),
    reading the (possibly bf16) logits ONCE — no (B, V) fp32 logprobs
    tensor in HBM (the beam loop's per-step candidate pick).

    Parity with the fallback: indices exact (ranking on the raw logits is
    monotone-identical to ranking on logprobs, ties included, up to the
    theoretical case of distinct logits rounding to one f32 logprob);
    values within ~1 ulp — the logsumexp reduction runs over the padded
    lane count, so the float sum order differs from XLA's unpadded
    reduction (same drift class as any cross-program reduction)."""
    b, v = logits.shape
    v_pad = -(-v // 128) * 128
    b_pad = -(-b // _ROW_BLOCK) * _ROW_BLOCK
    xp = logits
    if v_pad != v or b_pad != b:
        # pad value is irrelevant (the kernel masks lanes >= v by iota),
        # but keep it finite so bf16 pads don't make NaNs under -inf - -inf
        xp = jnp.pad(xp, ((0, b_pad - b), (0, v_pad - v)))

    vals, idx = pl.pallas_call(
        functools.partial(_topk_logprobs_kernel, k=k, v_len=v),
        grid=(b_pad // _ROW_BLOCK,),
        in_specs=[pl.BlockSpec((_ROW_BLOCK, v_pad), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((_ROW_BLOCK, k), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_BLOCK, k), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 * k + 4) * b_pad * v_pad,
            bytes_accessed=b_pad * v_pad * logits.dtype.itemsize,
            transcendentals=b_pad * v_pad,
        ),
        interpret=interpret,
    )(xp)
    return vals[:b], idx[:b]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def topk_pallas(x: jnp.ndarray, k: int, *, interpret: bool = False):
    """(values (B, k) descending, indices (B, k) int32) == lax.top_k(x, k).

    x: (B, V) float; designed for small k (the k rounds are unrolled) and V
    rows that fit VMEM (V <= ~300k fp32).
    """
    b, v = x.shape
    v_pad = -(-v // 128) * 128
    b_pad = -(-b // _ROW_BLOCK) * _ROW_BLOCK
    xp = x.astype(jnp.float32)
    if v_pad != v or b_pad != b:
        xp = jnp.pad(
            xp, ((0, b_pad - b), (0, v_pad - v)), constant_values=-jnp.inf
        )

    vals, idx = pl.pallas_call(
        functools.partial(_topk_kernel, k=k),
        grid=(b_pad // _ROW_BLOCK,),
        in_specs=[pl.BlockSpec((_ROW_BLOCK, v_pad), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((_ROW_BLOCK, k), lambda i: (i, 0)),
            pl.BlockSpec((_ROW_BLOCK, k), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * k * b_pad * v_pad,
            bytes_accessed=b_pad * v_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp)
    return vals[:b], idx[:b]
