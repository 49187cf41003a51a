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


def _flash_kernel_body(
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
    lse_ref=None,  # (1, block_q, 1) fp32: per-row logsumexp (bwd residual)
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    tk_pad = nk * block_k

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # a causal block is entirely masked iff its first key position exceeds
    # the last query's absolute position — skip the whole block then
    if causal:
        run_block = (ki * block_k) <= (q_offset + qi * block_q + block_q - 1)
    else:
        run_block = ki >= 0  # always true; keeps a single code path

    def _tile(full_mask: bool):
        """One online-softmax update. full_mask=False is the fast path: the
        only masking is a (1, block_k) additive bias row for the padded key
        tail (one broadcast-add per element) — the full (block_q, block_k)
        iota/compare/select chain costs ~6 VPU ops per score element and the
        encoder flash kernel is VPU-bound, not MXU-bound (HLO profile:
        68 vs 188 TF/s for clean matmuls). Masked lanes exp to 0 on their own
        because every query row meets valid keys in the first k block (the
        kv tail is a suffix), so its running max stays far above _NEG_INF.
        """
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        if scale != 1.0:
            # softmax scaling folded into the fp32 scores (exact, VMEM-resident)
            # instead of pre-scaling q/k in HBM
            s = s * scale

        if full_mask:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            mask = k_pos < kv_len
            if causal:
                mask &= k_pos <= (q_offset + q_pos)
            s = jnp.where(mask, s, _NEG_INF)
        elif kv_len < tk_pad:
            # kv-tail bias row: (1, block_k), broadcast over query rows
            k_col = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            s = s + jnp.where(k_col < kv_len, 0.0, _NEG_INF)

        m_prev = m_scratch[...][:, :1]  # (block_q, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)  # (block_q, block_k)
        if full_mask:
            # rows that have seen no valid key yet: m_new == -inf,
            # exp(-inf - -inf) would be NaN; with _NEG_INF finite sentinels p
            # is exp(0)=1 on masked lanes — zero them explicitly (a causal
            # diagonal block can have fully-masked rows)
            p = jnp.where(mask, p, 0.0)

        correction = jnp.exp(m_prev - m_new)  # (block_q, 1)
        l_new = correction * l_scratch[...][:, :1] + jnp.sum(p, axis=1, keepdims=True)

        acc_scratch[...] = acc_scratch[...] * correction + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scratch[...] = jnp.broadcast_to(m_new, m_scratch.shape)
        l_scratch[...] = jnp.broadcast_to(l_new, l_scratch.shape)

    if causal:
        # blocks crossing the diagonal need the per-row mask; blocks entirely
        # below it only need the kv-tail bias (fast path)
        crosses_diag = (ki * block_k + block_k - 1) > (q_offset + qi * block_q)

        @pl.when(run_block & crosses_diag)
        def _compute_masked():
            _tile(full_mask=True)

        @pl.when(run_block & ~crosses_diag)
        def _compute_fast():
            _tile(full_mask=False)

    else:

        @pl.when(run_block)
        def _compute():
            _tile(full_mask=False)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scratch[...][:, :1]
        # fully-masked rows (padded queries) have l == 0 -> emit 0, not NaN
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[...] / safe).astype(o_ref.dtype)
        if lse_ref is not None:
            m = m_scratch[...][:, :1]
            lse_ref[0] = jnp.where(l == 0.0, _NEG_INF, m + jnp.log(safe))


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, **kw):
    _flash_kernel_body(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, **kw)


def _flash_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, m_s, l_s, acc_s, **kw):
    _flash_kernel_body(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, lse_ref=lse_ref, **kw)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _default_blocks(tq: int, tk: int, causal: bool, itemsize: int = 2) -> tuple:
    """Pick block sizes that keep the per-program work large (grid overhead
    dominates tiny programs) while the fp32 score tile stays well under VMEM.

    Non-causal long-kv (the encoder's 1500-key case): sweep the WHOLE key
    axis in one grid step (block_k = tk rounded up, capped at 2048) so each
    (bh, qi) program does one big MXU pass — with d=64, small blocks leave
    the grid overhead-bound. Causal: square-ish blocks so the skip-predicate
    removes ~half the work. fp32 inputs (itemsize 4) double the double-
    buffered input blocks, so their caps halve — the bf16 sizes scoped-VMEM-
    OOM the backward kernels at T=1500 (measured: 18.1 MB > the 16 MB limit).
    """
    wide = itemsize <= 2
    if causal:
        return (256, 512) if wide else (256, 256)
    bk = min(_round_up(tk, 128), 2048 if wide else 1024)
    budget = (6 if wide else 3) * 1024 * 1024  # fp32 score tile bytes
    bq = max(128, min(_round_up(tq, 128), budget // 4 // bk // 128 * 128))
    # prefer the largest in-budget block that divides the 128-rounded query
    # length: a non-dividing block re-pads q/k/v to the block multiple in HBM
    # (e.g. tq=1536 with bq=1024 would copy everything out to 2048). Floor at
    # bq/2: for lengths with no large 128-multiple divisor (e.g. 13x128) a
    # tiny dividing block would make the kernel grid-overhead-bound — worse
    # than paying the one-time repad the divisor search exists to avoid
    for cand in range(bq, max(bq // 2, 128) - 1, -128):
        if _round_up(tq, 128) % cand == 0:
            return cand, bk
    return bq, bk


@functools.partial(
    jax.jit,
    static_argnames=("causal", "q_offset", "kv_valid_len", "scale", "block_q", "block_k", "interpret", "return_lse"),
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
    return_lse: bool = False,
):
    """softmax(scale * q @ k^T + mask) @ v, fused, over flattened (batch*heads).

    `causal` masks key_pos > q_offset + query_pos (the KV-cache prefill rule
    of models/whisper.py:decoder_apply); `kv_valid_len` masks a padded key
    tail. Returns (BH, Tq, d) in v.dtype — plus the per-row logsumexp
    (BH, Tq, 1) fp32 when return_lse is set (the backward-pass residual).
    """
    bh, tq, d = q.shape
    tk = k.shape[1]
    kv_len = kv_valid_len if kv_valid_len is not None else tk

    dbq, dbk = _default_blocks(tq, tk, causal, jnp.dtype(q.dtype).itemsize)
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

    kw = dict(
        causal=causal, q_len=tq, kv_len=kv_len, block_q=block_q,
        block_k=block_k, q_offset=q_offset, scale=scale,
    )
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
    ]
    o_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    scratch = [
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    cost = pl.CostEstimate(
        flops=4 * bh * tq_pad * tk_pad * d,
        bytes_accessed=(bh * (tq_pad + 2 * tk_pad + tq_pad) * d) * q.dtype.itemsize,
        transcendentals=bh * tq_pad * tk_pad,
    )

    if return_lse:
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel_lse, **kw),
            grid=grid,
            in_specs=in_specs,
            out_specs=(o_spec, pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0))),
            out_shape=(
                jax.ShapeDtypeStruct((bh, tq_pad, d), v.dtype),
                jax.ShapeDtypeStruct((bh, tq_pad, 1), jnp.float32),
            ),
            scratch_shapes=scratch,
            compiler_params=params,
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v)
        if tq_pad != tq:
            out, lse = out[:, :tq], lse[:, :tq]
        return out, lse

    out = pl.pallas_call(
        functools.partial(_flash_kernel, **kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), v.dtype),
        scratch_shapes=scratch,
        compiler_params=params,
        cost_estimate=cost,
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
# natural-layout multi-head forward kernel
# ---------------------------------------------------------------------------
#
# The head-split path above costs four full-tensor HBM relayout copies per
# attention call at encoder shapes: (B, T, H, 64) -> (B, H, T, 64) for q/k/v
# and back for the output (dh=64 is half the 128-lane tile, so XLA must
# physically copy). At the B=192 base headline that is ~39 ms of pure copies
# per program (HLO profile, round 2). This kernel instead consumes q/k/v in
# the natural (B, T, D) layout the projections emit, slices each head as a
# static 64-wide lane slice *inside* the kernel (VMEM-resident shuffles, not
# HBM copies), and — with the whole key range in one block — computes a plain
# two-dot softmax per head: no online-softmax correction passes, no (m, l)
# scratch round-trips, and a (B, q_blocks) grid instead of (B*H, q_blocks,
# k_blocks). Non-causal only (encoder self-attention, cross-attention
# prefill); restricted to D <= _MH_MAX_D so k/v double-buffer in VMEM.


_MH_MAX_D = 768  # k+v double-buffered: 2*2*Tk*D*2B <= ~9.5 MB at Tk=1536


def _flash_mh_kernel(
    q_ref,  # (1, block_q, D)
    k_ref,  # (1, tk_pad, D)
    v_ref,  # (1, tk_pad, D)
    o_ref,  # (1, block_q, D)
    *,
    n_head: int,
    kv_len: int,
    tk_pad: int,
    scale: float,
):
    d = q_ref.shape[-1]
    dh = d // n_head
    if kv_len < tk_pad:
        k_col = jax.lax.broadcasted_iota(jnp.int32, (1, tk_pad), 1)
        tail_bias = jnp.where(k_col < kv_len, 0.0, _NEG_INF)  # (1, tk_pad)
    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q_ref[0][:, sl], k_ref[0][:, sl],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, tk_pad)
        if scale != 1.0:
            s = s * scale
        if kv_len < tk_pad:
            s = s + tail_bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, sl],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, dh)
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)


def mh_flash_eligible(tq: int, tk: int, d: int, n_head: int, causal: bool) -> bool:
    """Shapes the natural-layout kernel serves: non-causal, 128-lane-friendly
    head width, and k/v small enough to hold the whole key range in VMEM."""
    return (
        not causal
        and d <= _MH_MAX_D
        and d % n_head == 0
        and (d // n_head) % 8 == 0
        and tq >= 16
        and tk <= 2048
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "kv_valid_len", "scale", "block_q", "interpret"),
)
def flash_attention_mh(
    q: jnp.ndarray,  # (B, Tq, D)
    k: jnp.ndarray,  # (B, Tk, D)
    v: jnp.ndarray,  # (B, Tk, D)
    *,
    n_head: int,
    kv_valid_len: int | None = None,
    scale: float = 1.0,
    block_q: int | None = None,
    interpret: bool = False,
):
    """softmax(scale * q_h @ k_h^T) @ v_h per head, natural (B, T, D) layout.

    Equivalent to flash_attention over head-split inputs, without the
    head-split/merge HBM relayouts. Non-causal; padded key tails are masked
    via `kv_valid_len` exactly as in flash_attention. (Training — where a
    logsumexp residual is needed — goes through the head-pair-sliced
    flash_attention_h2 kernels below instead.)
    """
    b, tq, d = q.shape
    tk = k.shape[1]
    kv_len = kv_valid_len if kv_valid_len is not None else tk

    tk_pad = _round_up(tk, 128)
    if block_q is None:
        # 128 is the VMEM-feasible width measured on v5e at base encoder
        # shapes (d=512): the whole key range stays resident per program
        # (k+v dominate the 16 MB scoped budget) and already at block_q=256
        # the fp32 score buffers overflow it (24.9 MB at 512). 128 ran the
        # B=192 base headline at 46 ms vs 55.6 ms for the head-split path.
        # At d=768 (small) block_q=128 overflows scoped VMEM by ~0.2 MB
        # (measured: 16.19 MB needed) — halve the q block for wide models.
        block_q = 128 if d <= 512 else 64
    tq_pad = _round_up(tq, block_q)
    if tq_pad != tq:
        q = jnp.pad(q, ((0, 0), (0, tq_pad - tq), (0, 0)))
    if tk_pad != tk:
        k = jnp.pad(k, ((0, 0), (0, tk_pad - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tk_pad - tk), (0, 0)))
        kv_len = min(kv_len, tk)

    kw = dict(n_head=n_head, kv_len=kv_len, tk_pad=tk_pad, scale=scale)
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0)),
        pl.BlockSpec((1, tk_pad, d), lambda b_, i: (b_, 0, 0)),
        pl.BlockSpec((1, tk_pad, d), lambda b_, i: (b_, 0, 0)),
    ]
    o_spec = pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0))
    params = pltpu.CompilerParams(dimension_semantics=("parallel", "parallel"))
    cost = pl.CostEstimate(
        flops=4 * b * tq_pad * tk_pad * d,
        bytes_accessed=b * (2 * tq_pad + 2 * tk_pad) * d * q.dtype.itemsize,
        transcendentals=b * tq_pad * tk_pad * n_head,
    )

    out = pl.pallas_call(
        functools.partial(_flash_mh_kernel, **kw),
        grid=(b, tq_pad // block_q),
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((b, tq_pad, d), v.dtype),
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v)

    return out[:, :tq] if tq_pad != tq else out


# ---------------------------------------------------------------------------
# head-pair-sliced training attention (natural layout, no relayouts)
# ---------------------------------------------------------------------------
#
# The training path needs a logsumexp residual and a backward pass. Head-
# splitting the (B, T, D) projections into (B*H, T, 64) gives fast kernels
# (few huge tiles per program, k/v tiny in VMEM) but costs eleven HBM
# relayout copies per attention call (dh=64 is half a lane tile, so XLA must
# physically copy) — 13.3% of the round-3 tiny bs=64 train step. The v1
# natural-layout alternative (per-head lane slices inside one program over
# the full D) removed the copies but measured 1.5x slower kernels: holding
# all H heads' k/v in VMEM forces small tiles and the per-head unrolled
# chains pipeline poorly.
#
# These kernels keep BOTH properties: grid over (batch, D//128 lane tiles,
# q blocks) where one 128-wide lane tile holds exactly 128//dh heads (2 for
# Whisper's dh=64). Block specs slice the lane tile straight out of the
# natural (B, T, D) array — an aligned tiled-layout DMA, not a copy — and
# each program sees only its pair of heads' k/v (tk x 128), recovering the
# head-split kernels' geometry (huge score tiles, many independent
# programs). Measured at tiny/base encoder training shapes this runs the
# backward at the head-split kernels' speed with zero relayout bytes.
#
# Non-causal only (encoder self-attention + cross-attention; the causal
# decoder self-attention at text-bucket lengths is ~30x smaller and keeps
# the head-split path). The lse/delta residuals live as (D//128, B, tq, hpb)
# fp32 so each program reads/writes its own (1, 1, block_q, hpb) block.


def h2_eligible(tq: int, tk: int, d: int, n_head: int) -> bool:
    """Shapes the head-pair kernels serve: non-causal handled by caller;
    lane tiles must hold a whole number of heads (dh divides 128) and D a
    whole number of lane tiles."""
    if n_head <= 0 or d % n_head:
        return False
    dh = d // n_head
    return (
        dh in (32, 64, 128)
        and d % 128 == 0
        and tq >= 16
        and tk <= 4096
    )


def _h2_fwd_kernel(
    q_ref,  # (1, block_q, 128)
    k_ref,  # (1, tk_pad, 128)
    v_ref,  # (1, tk_pad, 128)
    o_ref,  # (1, block_q, 128)
    lse_ref=None,  # (1, 1, block_q, hpb) fp32 (training residual; None = inference)
    *,
    hpb: int,
    kv_len: int,
    tk_pad: int,
    scale: float,
):
    dh = 128 // hpb
    if kv_len < tk_pad:
        k_col = jax.lax.broadcasted_iota(jnp.int32, (1, tk_pad), 1)
        tail_bias = jnp.where(k_col < kv_len, 0.0, _NEG_INF)
    for j in range(hpb):
        sl = slice(j * dh, (j + 1) * dh)
        s = jax.lax.dot_general(
            q_ref[0][:, sl], k_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, tk_pad)
        if scale != 1.0:
            s = s * scale
        if kv_len < tk_pad:
            s = s + tail_bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0, 0, :, j : j + 1] = m + jnp.log(l)


def _h2_fwd_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, **kw):
    _h2_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, **kw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_head", "kv_valid_len", "scale", "block_q", "interpret", "return_lse"
    ),
)
def flash_attention_h2(
    q: jnp.ndarray,  # (B, Tq, D)
    k: jnp.ndarray,  # (B, Tk, D)
    v: jnp.ndarray,  # (B, Tk, D)
    *,
    n_head: int,
    kv_valid_len: int | None = None,
    scale: float = 1.0,
    block_q: int | None = None,
    interpret: bool = False,
    return_lse: bool = True,
):
    """softmax(scale * q_h k_h^T) v_h per head over the natural layout,
    head-pair grid. With return_lse (training): returns (out (B, Tq, D),
    lse (D//128, B, Tq, hpb) fp32); without (inference — measured ~25%
    faster than the per-head-loop mh kernel at encoder shapes): just out."""
    b, tq, d = q.shape
    tk = k.shape[1]
    kv_len = kv_valid_len if kv_valid_len is not None else tk
    dh = d // n_head
    hpb = 128 // dh
    n_lane = d // 128

    tk_pad = _round_up(tk, 128)
    if block_q is None:
        # k/v per program are (tk, 128) regardless of D, so the q block can
        # be large; 512 keeps the fp32 score/prob tiles at 2x3 MB (T=1536)
        block_q = 512
    block_q = min(block_q, _round_up(tq, 128))
    for cand in range(block_q, 127, -128):
        if _round_up(tq, 128) % cand == 0:
            block_q = cand
            break
    tq_pad = _round_up(tq, block_q)
    if tq_pad != tq:
        q = jnp.pad(q, ((0, 0), (0, tq_pad - tq), (0, 0)))
    if tk_pad != tk:
        k = jnp.pad(k, ((0, 0), (0, tk_pad - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tk_pad - tk), (0, 0)))
        kv_len = min(kv_len, tk)

    kw = dict(hpb=hpb, kv_len=kv_len, tk_pad=tk_pad, scale=scale)
    grid = (b, n_lane, tq_pad // block_q)
    q_spec = pl.BlockSpec((1, block_q, 128), lambda b_, h, i: (b_, i, h))
    kv_spec = pl.BlockSpec((1, tk_pad, 128), lambda b_, h, i: (b_, 0, h))
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel"),
    )
    cost = pl.CostEstimate(
        flops=4 * b * tq_pad * tk_pad * d,
        bytes_accessed=b * (2 * tq_pad + 2 * tk_pad) * d * q.dtype.itemsize,
        transcendentals=b * tq_pad * tk_pad * n_head,
    )

    if not return_lse:
        out = pl.pallas_call(
            functools.partial(_h2_fwd_kernel, **kw),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            out_shape=jax.ShapeDtypeStruct((b, tq_pad, d), v.dtype),
            compiler_params=params,
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v)
        return out[:, :tq] if tq_pad != tq else out

    out, lse = pl.pallas_call(
        functools.partial(_h2_fwd_kernel_lse, **kw),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(
            q_spec,
            pl.BlockSpec((1, 1, block_q, hpb), lambda b_, h, i: (h, b_, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, tq_pad, d), v.dtype),
            jax.ShapeDtypeStruct((n_lane, b, tq_pad, hpb), jnp.float32),
        ),
        compiler_params=params,
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v)

    if tq_pad != tq:
        out, lse = out[:, :tq], lse[:, :, :tq]
    return out, lse


def _h2_bwd_dq_kernel(
    q_ref,  # (1, block_q, 128)
    k_ref,  # (1, tk_pad, 128)
    v_ref,  # (1, tk_pad, 128)
    do_ref,  # (1, block_q, 128)
    lse_ref,  # (1, 1, block_q, hpb) fp32
    delta_ref,  # (1, 1, block_q, hpb) fp32
    dq_ref,  # (1, block_q, 128)
    *,
    hpb: int,
    kv_len: int,
    tk_pad: int,
    scale: float,
):
    dh = 128 // hpb
    if kv_len < tk_pad:
        k_col = jax.lax.broadcasted_iota(jnp.int32, (1, tk_pad), 1)
        tail_bias = jnp.where(k_col < kv_len, 0.0, _NEG_INF)
    for j in range(hpb):
        sl = slice(j * dh, (j + 1) * dh)
        s = jax.lax.dot_general(
            q_ref[0][:, sl], k_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if scale != 1.0:
            s = s * scale
        if kv_len < tk_pad:
            s = s + tail_bias
        p = jnp.exp(s - lse_ref[0, 0][:, j : j + 1])
        dp = jax.lax.dot_general(
            do_ref[0][:, sl], v_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0][:, j : j + 1]) * scale
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0][:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)


def _h2_bwd_dkv_kernel(
    q_ref,  # (1, block_q, 128)
    k_ref,  # (1, tk_pad, 128)
    v_ref,  # (1, tk_pad, 128)
    do_ref,  # (1, block_q, 128)
    lse_ref,  # (1, 1, block_q, hpb) fp32
    delta_ref,  # (1, 1, block_q, hpb) fp32
    dk_ref,  # (1, tk_pad, 128)
    dv_ref,  # (1, tk_pad, 128)
    acc_dk,  # (tk_pad, 128) fp32 scratch
    acc_dv,  # (tk_pad, 128) fp32 scratch
    *,
    hpb: int,
    kv_len: int,
    tk_pad: int,
    scale: float,
):
    dh = 128 // hpb
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        acc_dk[...] = jnp.zeros_like(acc_dk)
        acc_dv[...] = jnp.zeros_like(acc_dv)

    if kv_len < tk_pad:
        k_col = jax.lax.broadcasted_iota(jnp.int32, (1, tk_pad), 1)
        tail_bias = jnp.where(k_col < kv_len, 0.0, _NEG_INF)
    for j in range(hpb):
        sl = slice(j * dh, (j + 1) * dh)
        s = jax.lax.dot_general(
            q_ref[0][:, sl], k_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, tk_pad)
        if scale != 1.0:
            s = s * scale
        if kv_len < tk_pad:
            s = s + tail_bias
        p = jnp.exp(s - lse_ref[0, 0][:, j : j + 1])
        do_j = do_ref[0][:, sl]
        acc_dv[:, sl] += jax.lax.dot_general(
            p.astype(do_j.dtype), do_j, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tk_pad, dh)
        dp = jax.lax.dot_general(
            do_j, v_ref[0][:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0][:, j : j + 1]) * scale
        acc_dk[:, sl] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0][:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (tk_pad, dh)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0] = acc_dv[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "kv_valid_len", "scale", "block_q", "interpret"),
)
def flash_attention_h2_bwd(
    q, k, v, lse, delta,  g,
    *,
    n_head: int,
    kv_valid_len: int | None = None,
    scale: float = 1.0,
    block_q: int | None = None,
    interpret: bool = False,
):
    """(dq, dk, dv) for flash_attention_h2. `lse`/`delta` are
    (D//128, B, Tq, hpb) fp32 (delta = per-head rowsum(dO*O), computed by
    the caller in XLA — an elementwise reduce that fuses with no relayout)."""
    b, tq, d = q.shape
    tk = k.shape[1]
    dh = d // n_head
    hpb = 128 // dh
    n_lane = d // 128
    kv_len = kv_valid_len if kv_valid_len is not None else tk

    if block_q is None:
        block_q = 512
    block_q = min(block_q, _round_up(tq, 128))
    for cand in range(block_q, 127, -128):
        if _round_up(tq, 128) % cand == 0:
            block_q = cand
            break
    tq_pad = _round_up(tq, block_q)
    tk_pad = _round_up(tk, 128)

    if tq_pad != tq:
        pad = ((0, 0), (0, tq_pad - tq), (0, 0))
        q = jnp.pad(q, pad)
        g = jnp.pad(g, pad)
        rpad = ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0))
        lse = jnp.pad(lse, rpad)
        delta = jnp.pad(delta, rpad)
    if tk_pad != tk:
        pad = ((0, 0), (0, tk_pad - tk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        kv_len = min(kv_len, tk)

    kw = dict(hpb=hpb, kv_len=kv_len, tk_pad=tk_pad, scale=scale)
    q_spec = pl.BlockSpec((1, block_q, 128), lambda b_, h, i: (b_, i, h))
    kfull_spec = pl.BlockSpec((1, tk_pad, 128), lambda b_, h, i: (b_, 0, h))
    r_spec = pl.BlockSpec((1, 1, block_q, hpb), lambda b_, h, i: (h, b_, i, 0))

    dq = pl.pallas_call(
        functools.partial(_h2_bwd_dq_kernel, **kw),
        grid=(b, n_lane, tq_pad // block_q),
        in_specs=[q_spec, kfull_spec, kfull_spec, q_spec, r_spec, r_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, tq_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * tq_pad * tk_pad * d,
            bytes_accessed=b * (4 * tq_pad + 2 * tk_pad) * d * q.dtype.itemsize,
            transcendentals=b * tq_pad * tk_pad * n_head,
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    # q sweep innermost ("arbitrary") so the fp32 dk/dv accumulators persist
    # across it; the k/v lane-tile blocks are grid-constant along that axis
    dk, dv = pl.pallas_call(
        functools.partial(_h2_bwd_dkv_kernel, **kw),
        grid=(b, n_lane, tq_pad // block_q),
        in_specs=[q_spec, kfull_spec, kfull_spec, q_spec, r_spec, r_spec],
        out_specs=(kfull_spec, kfull_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, tk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, tk_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((tk_pad, 128), jnp.float32),
            pltpu.VMEM((tk_pad, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * tq_pad * tk_pad * d,
            bytes_accessed=b * (4 * tq_pad + 4 * tk_pad) * d * q.dtype.itemsize,
            transcendentals=b * tq_pad * tk_pad * n_head,
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    dq = dq[:, :tq] if tq_pad != tq else dq
    if tk_pad != tk:
        dk, dv = dk[:, :tk], dv[:, :tk]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_mh_vjp(q, k, v, n_head, kv_valid_len=None, scale=1.0):
    """Differentiable natural-layout attention. The inference primal runs
    the head-pair h2 kernel when the shape is served (measured faster than
    the per-head-loop mh kernel at encoder shapes and D-independent, so
    wide models get it too), falling back to the mh kernel; under AD the
    h2 lse forward + natural-layout backward take over (head-split flash
    for shapes h2 does not serve)."""
    if h2_eligible(q.shape[1], k.shape[1], q.shape[2], n_head):
        return flash_attention_h2(
            q, k, v, n_head=n_head, kv_valid_len=kv_valid_len, scale=scale,
            return_lse=False,
        )
    return flash_attention_mh(
        q, k, v, n_head=n_head, kv_valid_len=kv_valid_len, scale=scale
    )


def _fa_mh_fwd(q, k, v, n_head, kv_valid_len, scale):
    b, tq, d = q.shape
    tk = k.shape[1]
    if h2_eligible(tq, tk, d, n_head):
        out, lse = flash_attention_h2(
            q, k, v, n_head=n_head, kv_valid_len=kv_valid_len, scale=scale
        )
        return out, (q, k, v, out, lse)

    dh = d // n_head

    def split(x, t):
        return x.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3).reshape(b * n_head, t, dh)

    out, lse = flash_attention(
        split(q, tq), split(k, tk), split(v, tk),
        kv_valid_len=kv_valid_len, scale=scale, return_lse=True,
    )
    merged = out.reshape(b, n_head, tq, dh).transpose(0, 2, 1, 3).reshape(b, tq, d)
    return merged, (q, k, v, out, lse)


def _fa_mh_bwd(n_head, kv_valid_len, scale, res, g):
    q, k, v, out_res, lse = res
    b, tq, d = q.shape
    tk = k.shape[1]
    dh = d // n_head
    if h2_eligible(tq, tk, d, n_head):
        # delta_h = rowsum(dO_h * O_h) in the h2 residual layout
        # (D//128, B, Tq, hpb): elementwise product + per-dh reduce + a
        # cheap transpose of the tiny (B, Tq, H) result
        hpb = 128 // dh
        n_lane = d // 128
        delta = (
            (g.astype(jnp.float32) * out_res.astype(jnp.float32))
            .reshape(b, tq, n_lane, hpb, dh)
            .sum(axis=-1)
            .transpose(2, 0, 1, 3)
        )
        return flash_attention_h2_bwd(
            q, k, v, lse, delta, g,
            n_head=n_head, kv_valid_len=kv_valid_len, scale=scale,
        )

    def split(x, t):
        return x.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3).reshape(b * n_head, t, dh)

    def merge(x, t):
        return x.reshape(b, n_head, t, dh).transpose(0, 2, 1, 3).reshape(b, t, d)

    dq, dk, dv = flash_attention_bwd(
        split(q, tq), split(k, tk), split(v, tk), out_res, lse, split(g, tq),
        kv_valid_len=kv_valid_len, scale=scale,
    )
    return merge(dq, tq), merge(dk, tk), merge(dv, tk)


flash_attention_mh_vjp.defvjp(_fa_mh_fwd, _fa_mh_bwd)


# ---------------------------------------------------------------------------
# Pallas backward kernels (FlashAttention-2 style)
# ---------------------------------------------------------------------------
#
# Residuals: q, k, v, o and the per-row logsumexp L. With
# delta = rowsum(dO * O) (computed in XLA, it's elementwise), each tile's
# probabilities are recomputed as P = exp(scale*qk^T - L) and
#   dV = P^T dO,   dS = P * (dO V^T - delta) * scale,   dQ = dS K,  dK = dS^T Q
# Two kernels so every accumulator lives in VMEM across its reduction axis:
# dQ sweeps keys per query block; dK/dV sweep queries per key block.


def _bwd_tile(q, k, lse, q_pos, k_pos, *, causal, q_len, kv_len, q_offset, scale):
    """Recompute the (block_q, block_k) probability tile from residuals."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if scale != 1.0:
        s = s * scale
    mask = (k_pos < kv_len) & (q_pos < q_len)
    if causal:
        mask &= k_pos <= (q_offset + q_pos)
    p = jnp.exp(s - lse)  # lse: (block_q, 1)
    return jnp.where(mask, p, 0.0)


def _bwd_tile_fast(q, k, lse, qi, ki, *, q_len, kv_len, tq_pad, tk_pad,
                   block_q, block_k, scale):
    """Probability tile without the per-element mask chain: padded q rows and
    kv-tail keys are handled by cheap broadcast bias rows/cols (padded q rows
    carry lse=0 from jnp.pad, so the -1e30 row bias drives exp to 0; same for
    tail keys against any finite lse)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if scale != 1.0:
        s = s * scale
    if kv_len < tk_pad:
        k_col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        s = s + jnp.where(k_col < kv_len, 0.0, _NEG_INF)
    if q_len < tq_pad:
        q_row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        s = s + jnp.where(q_row < q_len, 0.0, _NEG_INF)
    return jnp.exp(s - lse)


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc,
    *, causal, q_len, kv_len, block_q, block_k, q_offset, scale,
):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    tq_pad = pl.num_programs(1) * block_q
    tk_pad = nk * block_k

    @pl.when(ki == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    run_block = (ki * block_k) <= (q_offset + qi * block_q + block_q - 1) if causal else ki >= 0

    def _accumulate(p):
        dp = jax.lax.dot_general(
            do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_q, block_k)
        ds = p * (dp - delta_ref[0]) * scale
        acc[...] += jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _full():
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        _accumulate(_bwd_tile(
            q_ref[0], k_ref[0], lse_ref[0], q_pos, k_pos,
            causal=causal, q_len=q_len, kv_len=kv_len, q_offset=q_offset, scale=scale,
        ))

    def _fast():
        _accumulate(_bwd_tile_fast(
            q_ref[0], k_ref[0], lse_ref[0], qi, ki,
            q_len=q_len, kv_len=kv_len, tq_pad=tq_pad, tk_pad=tk_pad,
            block_q=block_q, block_k=block_k, scale=scale,
        ))

    if causal:
        crosses_diag = (ki * block_k + block_k - 1) > (q_offset + qi * block_q)
        pl.when(run_block & crosses_diag)(_full)
        pl.when(run_block & ~crosses_diag)(_fast)
    else:
        pl.when(run_block)(_fast)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0] = acc[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    acc_dk, acc_dv,
    *, causal, q_len, kv_len, block_q, block_k, q_offset, scale,
):
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    tq_pad = nq * block_q
    tk_pad = pl.num_programs(1) * block_k

    @pl.when(qi == 0)
    def _init():
        acc_dk[...] = jnp.zeros_like(acc_dk)
        acc_dv[...] = jnp.zeros_like(acc_dv)

    run_block = (ki * block_k) <= (q_offset + qi * block_q + block_q - 1) if causal else qi >= 0

    def _accumulate(p):
        do = do_ref[0]
        acc_dv[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_k, d)
        dp = jax.lax.dot_general(
            do, v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_ref[0]) * scale
        acc_dk[...] += jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (block_k, d)

    def _full():
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        _accumulate(_bwd_tile(
            q_ref[0], k_ref[0], lse_ref[0], q_pos, k_pos,
            causal=causal, q_len=q_len, kv_len=kv_len, q_offset=q_offset, scale=scale,
        ))

    def _fast():
        _accumulate(_bwd_tile_fast(
            q_ref[0], k_ref[0], lse_ref[0], qi, ki,
            q_len=q_len, kv_len=kv_len, tq_pad=tq_pad, tk_pad=tk_pad,
            block_q=block_q, block_k=block_k, scale=scale,
        ))

    if causal:
        crosses_diag = (ki * block_k + block_k - 1) > (q_offset + qi * block_q)
        pl.when(run_block & crosses_diag)(_full)
        pl.when(run_block & ~crosses_diag)(_fast)
    else:
        pl.when(run_block)(_fast)

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0] = acc_dk[...].astype(dk_ref.dtype)
        dv_ref[0] = acc_dv[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "q_offset", "kv_valid_len", "scale", "interpret"),
)
def flash_attention_bwd(
    q, k, v, out, lse, g,
    *,
    causal: bool = False,
    q_offset: int = 0,
    kv_valid_len: int | None = None,
    scale: float = 1.0,
    interpret: bool = False,
):
    """(dq, dk, dv) for flash_attention, all-Pallas (no (Tq, Tk) tensor in HBM)."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    kv_len = kv_valid_len if kv_valid_len is not None else tk

    block_q, block_k = _default_blocks(tq, tk, causal, jnp.dtype(q.dtype).itemsize)
    block_q = min(block_q, _round_up(tq, 128))
    block_k = min(block_k, _round_up(tk, 128))
    tq_pad = _round_up(tq, block_q)
    tk_pad = _round_up(tk, block_k)

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)

    if tq_pad != tq:
        pad = ((0, 0), (0, tq_pad - tq), (0, 0))
        q = jnp.pad(q, pad)
        g = jnp.pad(g, pad)
        lse = jnp.pad(lse, pad)
        delta = jnp.pad(delta, pad)
    if tk_pad != tk:
        pad = ((0, 0), (0, tk_pad - tk), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    kw = dict(causal=causal, q_len=tq, kv_len=kv_len, block_q=block_q,
              block_k=block_k, q_offset=q_offset, scale=scale)
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    k_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))
    r_spec = pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **kw),
        grid=(bh, tq_pad // block_q, tk_pad // block_k),
        in_specs=[q_spec, k_spec, k_spec, q_spec, r_spec, r_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    # dkv grid: key blocks in the middle, query sweep innermost
    qs_spec = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0))
    ks_spec = pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0))
    rs_spec = pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **kw),
        grid=(bh, tk_pad // block_k, tq_pad // block_q),
        in_specs=[qs_spec, ks_spec, ks_spec, qs_spec, rs_spec, rs_spec],
        out_specs=(ks_spec, ks_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bh, tk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, tk_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    dq = dq[:, :tq] if tq_pad != tq else dq
    if tk_pad != tk:
        dk, dv = dk[:, :tk], dv[:, :tk]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# differentiable wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_vjp(q, k, v, causal=False, q_offset=0, kv_valid_len=None, scale=1.0):
    return flash_attention(
        q, k, v, causal=causal, q_offset=q_offset, kv_valid_len=kv_valid_len, scale=scale
    )


def _fa_fwd(q, k, v, causal, q_offset, kv_valid_len, scale):
    out, lse = flash_attention(
        q, k, v, causal=causal, q_offset=q_offset, kv_valid_len=kv_valid_len,
        scale=scale, return_lse=True,
    )
    return out, (q, k, v, out, lse)


def _fa_bwd(causal, q_offset, kv_valid_len, scale, res, g):
    q, k, v, out, lse = res
    return flash_attention_bwd(
        q, k, v, out, lse, g,
        causal=causal, q_offset=q_offset, kv_valid_len=kv_valid_len, scale=scale,
    )


flash_attention_vjp.defvjp(_fa_fwd, _fa_bwd)
