"""Fused flash attention as a Pallas TPU kernel.

TPU-native replacement for the reference's torch SDPA path
(`whisper/model.py:16-22, 123-127`): instead of materializing the
(B, H, Tq, Tk) logits in HBM and re-reading them for the softmax (what a
naive XLA einsum+softmax+einsum lowers to at these sizes), the kernel
streams K/V blocks through VMEM with an online-softmax running (max, sum)
and a (block_q, d) fp32 accumulator, so HBM traffic is O(Tq*d + Tk*d)
instead of O(Tq*Tk).

Shapes it serves in this framework (all static):
  * encoder self-attention:   Tq = Tk = 1500 (padded to 1536), no mask
  * decoder/cross prefill:    Tq <= 448, Tk = 1500 or 448, optional causal
  * teacher-forced training:  Tq = Tk <= 448, causal

Grid layout: (batch*heads, q_blocks, k_blocks) with the k dimension
innermost — TPU executes the grid sequentially, so fp32 accumulators live
in VMEM scratch across k steps and the output block is written once on the
last k step (the canonical TPU flash pattern; contrast the reference's
single fused torch kernel call which cannot be blocked/tuned).

The q/k inputs are expected *pre-scaled* by d_head**-0.25 each (matching
reference model.py:114-122 numerics); the kernel adds no extra scaling.
Softmax statistics and the accumulator are fp32 regardless of input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(
    q_ref,  # (1, block_q, d)
    k_ref,  # (1, block_k, d)
    v_ref,  # (1, block_k, d)
    o_ref,  # (1, block_q, d)
    m_scratch,  # (block_q, 128) fp32   running max (lane-replicated)
    l_scratch,  # (block_q, 128) fp32   running sum (lane-replicated)
    acc_scratch,  # (block_q, d) fp32   output accumulator
    *,
    causal: bool,
    q_len: int,
    kv_len: int,
    block_q: int,
    block_k: int,
    q_offset: int,
    scale: float,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # absolute positions of this block's queries/keys
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    # a causal block is entirely masked iff its first key position exceeds
    # the last query's absolute position — skip the whole block then
    if causal:
        run_block = (ki * block_k) <= (q_offset + qi * block_q + block_q - 1)
    else:
        run_block = ki >= 0  # always true; keeps a single code path

    @pl.when(run_block)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        if scale != 1.0:
            # softmax scaling folded into the fp32 scores (exact, VMEM-resident)
            # instead of pre-scaling q/k in HBM
            s = s * scale

        mask = k_pos < kv_len  # padded-tail keys
        if causal:
            mask &= k_pos <= (q_offset + q_pos)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scratch[...][:, :1]  # (block_q, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)  # (block_q, block_k)
        # rows that have seen no valid key yet: m_new == -inf, exp(-inf - -inf)
        # would be NaN; with _NEG_INF finite sentinels p is exp(0)=1 on masked
        # lanes — zero them explicitly
        p = jnp.where(mask, p, 0.0)

        correction = jnp.exp(m_prev - m_new)  # (block_q, 1)
        l_new = correction * l_scratch[...][:, :1] + jnp.sum(p, axis=1, keepdims=True)

        acc_scratch[...] = acc_scratch[...] * correction + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scratch[...][:, :1]
        # fully-masked rows (padded queries) have l == 0 -> emit 0, not NaN
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[...] / safe).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _default_blocks(tq: int, tk: int, causal: bool) -> tuple:
    """Pick block sizes that keep the per-program work large (grid overhead
    dominates tiny programs) while the fp32 score tile stays well under VMEM.

    Non-causal long-kv (the encoder's 1500-key case): sweep the WHOLE key
    axis in one grid step (block_k = tk rounded up, capped at 2048) so each
    (bh, qi) program does one big MXU pass — with d=64, small blocks leave
    the grid overhead-bound. Causal: square-ish blocks so the skip-predicate
    removes ~half the work.
    """
    if causal:
        return 256, 512
    bk = min(_round_up(tk, 128), 2048)
    # score tile (block_q, bk) fp32 <= ~6MB
    bq = max(128, min(_round_up(tq, 128), (6 * 1024 * 1024 // 4) // bk // 128 * 128))
    return bq, bk


@functools.partial(
    jax.jit,
    static_argnames=("causal", "q_offset", "kv_valid_len", "scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,  # (BH, Tq, d)
    k: jnp.ndarray,  # (BH, Tk, d)
    v: jnp.ndarray,  # (BH, Tk, d)
    *,
    causal: bool = False,
    q_offset: int = 0,
    kv_valid_len: int | None = None,
    scale: float = 1.0,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(scale * q @ k^T + mask) @ v, fused, over flattened (batch*heads).

    `causal` masks key_pos > q_offset + query_pos (the KV-cache prefill rule
    of models/whisper.py:decoder_apply); `kv_valid_len` masks a padded key
    tail. Returns (BH, Tq, d) in v.dtype.
    """
    bh, tq, d = q.shape
    tk = k.shape[1]
    kv_len = kv_valid_len if kv_valid_len is not None else tk

    dbq, dbk = _default_blocks(tq, tk, causal)
    block_q = dbq if block_q is None else block_q
    block_k = dbk if block_k is None else block_k
    block_q = min(block_q, _round_up(tq, 128))
    block_k = min(block_k, _round_up(tk, 128))
    tq_pad = _round_up(tq, block_q)
    tk_pad = _round_up(tk, block_k)
    if tq_pad != tq:
        q = jnp.pad(q, ((0, 0), (0, tq_pad - tq), (0, 0)))
    if tk_pad != tk:
        k = jnp.pad(k, ((0, 0), (0, tk_pad - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tk_pad - tk), (0, 0)))

    grid = (bh, tq_pad // block_q, tk_pad // block_k)

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        q_len=tq,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        q_offset=q_offset,
        scale=scale,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq_pad * tk_pad * d,
            bytes_accessed=(bh * (tq_pad + 2 * tk_pad + tq_pad) * d) * q.dtype.itemsize,
            transcendentals=bh * tq_pad * tk_pad,
        ),
        interpret=interpret,
    )(q, k, v)

    return out[:, :tq] if tq_pad != tq else out


def flash_attention_bhtd(
    q: jnp.ndarray,  # (B, H, Tq, d)
    k: jnp.ndarray,  # (B, H, Tk, d)
    v: jnp.ndarray,
    **kwargs,
) -> jnp.ndarray:
    """Convenience wrapper over head-split (B, H, T, d) layout."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    out = flash_attention(
        q.reshape(b * h, tq, d), k.reshape(b * h, tk, d), v.reshape(b * h, tk, d),
        **kwargs,
    )
    return out.reshape(b, h, tq, d)


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward, recompute backward
# ---------------------------------------------------------------------------
#
# The backward pass recomputes the (Tq, Tk) attention matrix with plain XLA
# einsums — exact gradients, and the forward stays fused (the training hot
# loop is forward-dominated here: metrics decode + eval reuse the forward).
# A fully-blocked Pallas backward is a later optimization.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_vjp(q, k, v, causal=False, q_offset=0, kv_valid_len=None, scale=1.0):
    return flash_attention(
        q, k, v, causal=causal, q_offset=q_offset, kv_valid_len=kv_valid_len, scale=scale
    )


def _fa_fwd(q, k, v, causal, q_offset, kv_valid_len, scale):
    out = flash_attention(
        q, k, v, causal=causal, q_offset=q_offset, kv_valid_len=kv_valid_len, scale=scale
    )
    return out, (q, k, v)


def _fa_bwd(causal, q_offset, kv_valid_len, scale, res, g):
    q, k, v = res
    tq, tk = q.shape[1], k.shape[1]
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32) * scale
    mask = jnp.ones((tq, tk), bool)
    if kv_valid_len is not None:
        mask &= jnp.arange(tk)[None, :] < kv_valid_len
    if causal:
        mask &= jnp.arange(tk)[None, :] <= (q_offset + jnp.arange(tq))[:, None]
    s = jnp.where(mask[None], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)  # fp32 (BH, Tq, Tk)

    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bqk,bqd->bkd", p, g32).astype(v.dtype)
    dp = jnp.einsum("bqd,bkd->bqk", g32, v.astype(jnp.float32))
    # softmax jacobian: dS = P * (dP - rowsum(dP * P)); dS carries the scale
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq = jnp.einsum("bqk,bkd->bqd", ds, k.astype(jnp.float32)).astype(q.dtype)
    dk = jnp.einsum("bqk,bqd->bkd", ds, q.astype(jnp.float32)).astype(k.dtype)
    return dq, dk, dv


flash_attention_vjp.defvjp(_fa_fwd, _fa_bwd)
