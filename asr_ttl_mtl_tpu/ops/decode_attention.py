"""Fused single-token decode attention as a Pallas TPU kernel.

Why this kernel exists: for a query of length 1 (the incremental decode
step), XLA lowers the attention einsums to VPU multiply+reduce and — as the
captured HLO profile shows — *converts the whole bf16 KV to fp32 in HBM
every step* (two ~880 MB convert fusions per step at base/B=32, 46% of the
decode program). This kernel streams the bf16 cache through VMEM exactly
once per layer: per program it loads a (b_blk, Tk, D) K/V block, does
per-head MXU matvecs with fp32 scores, an in-VMEM softmax, and writes the
merged (b_blk, 1, D) outputs. No fp32 KV materialization, no head transpose.

Batch blocking: HBM bandwidth collapses when per-program DMAs are small —
the 128-slot self-attention cache at B-per-program=1 moves only 128 KB per
grid step and measured 333 GiB/s vs 675 GiB/s for the 1.5 MB cross-attention
blocks. Each program therefore covers enough batch rows to move ~1 MB+ of
KV, which puts both cache shapes at the HBM roofline.

Works directly on the framework's cache layouts (models/whisper.py):
  * self-attention cache  (L, B, n_text_ctx, D), valid keys <= position
  * cross-attention cache (L, B, n_audio_ctx, D), all keys valid

The softmax scale (d_head**-0.5) is folded into the fp32 scores, matching
reference whisper/model.py:114-122 numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_TARGET_BLOCK_BYTES = 1 << 20  # ~1 MB of K per program saturates HBM


def _decode_attn_kernel(
    valid_ref,  # (1, 1) int32 in SMEM: highest valid key position (-1: all)
    q_ref,      # (b_blk, G, D) — G query rows share each cache row
    k_ref,      # (1, b_blk, Tk, D)
    v_ref,      # (1, b_blk, Tk, D)
    o_ref,      # (b_blk, G, D)
    *,
    n_head: int,
    scale: float,
    tk: int,
):
    d = q_ref.shape[-1]
    dh = d // n_head
    k = k_ref[0]  # (b_blk, Tk, D)
    v = v_ref[0]

    valid_upto = valid_ref[0, 0]
    key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tk), 2)
    masked = (valid_upto >= 0) & (key_pos > valid_upto)

    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        qh = q_ref[:, :, sl]  # (b_blk, G, dh)
        kh = k[:, :, sl]      # (b_blk, Tk, dh)
        vh = v[:, :, sl]

        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (b_blk, G, Tk)
        s = jnp.where(masked, _NEG_INF, s * scale)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v.dtype)
        out = jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (b_blk, G, dh)
        o_ref[:, :, sl] = out.astype(o_ref.dtype)


def _batch_block(b: int, tk: int, d: int, itemsize: int,
                 target: int = _TARGET_BLOCK_BYTES) -> int:
    """Largest divisor of b whose K block stays near the DMA byte target."""
    per_row = tk * d * itemsize
    want = max(1, target // per_row)
    b_blk = 1
    for cand in range(1, b + 1):
        if b % cand == 0 and cand <= want:
            b_blk = cand
    return b_blk


@functools.partial(
    jax.jit, static_argnames=("layer", "n_head", "scale", "group", "interpret")
)
def decode_attention(
    q: jnp.ndarray,      # (B*group, 1, D)
    cache_k: jnp.ndarray,  # (L, B, Tk, D)
    cache_v: jnp.ndarray,  # (L, B, Tk, D)
    layer: int,
    n_head: int,
    *,
    scale: float,
    valid_upto=None,  # traced int32 scalar; None = every key valid (cross)
    group: int = 1,   # query rows per cache row (beam/best-of share cross-KV)
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(scale * q @ K_layer^T) @ V_layer for 1-token queries.

    Indexes the layer inside the BlockSpec so the (L, B, Tk, D) cache is
    never sliced/copied in HBM. With group=G, query rows [b*G, (b+1)*G) all
    attend over cache row b (audio-major beam layout) — the KV block is
    streamed ONCE for all G beams instead of being replicated per beam.
    Returns (B*group, 1, D) in q.dtype.
    """
    _, b, tk, d = cache_k.shape
    assert q.shape[0] == b * group and q.shape[1] == 1
    valid = jnp.full((1, 1), -1 if valid_upto is None else valid_upto, jnp.int32)
    b_blk = _batch_block(b, tk, d, cache_k.dtype.itemsize)
    qg = q.reshape(b, group, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b // b_blk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_blk, group, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, b_blk, tk, d), lambda i: (layer, i, 0, 0)),
            pl.BlockSpec((1, b_blk, tk, d), lambda i: (layer, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((b_blk, group, d), lambda i: (i, 0, 0)),
    )

    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, n_head=n_head, scale=scale, tk=tk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, group, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * group * tk * d,
            bytes_accessed=2 * b * tk * d * cache_k.dtype.itemsize,
            transcendentals=b * group * tk,
        ),
        interpret=interpret,
    )(valid, qg, cache_k, cache_v)
    return out.reshape(b * group, 1, d)


# ---------------------------------------------------------------------------
# int8 KV decode attention (opt-in serving mode)
# ---------------------------------------------------------------------------
#
# The decode step is HBM-bound on KV reads (a base/B=32 window moves ~589 MB
# of bf16 cross-KV per step). Storing the KV int8 with one fp32 scale per
# (layer, batch, position) row halves that traffic, and the matmuls run
# int8xint8->int32 on the MXU (queries and probabilities are quantized
# per-row in VMEM; softmax statistics stay fp32). SageAttention-style
# numerics: the per-row abs-max scales keep quantization error ~1e-2
# relative, well under the bf16 logit noise floor for argmax decoding.


def quantize_kv_rows(x: jnp.ndarray):
    """(..., T, D) float -> ((..., T_pad, D) int8, (..., T_pad) fp32 scale)
    with per-row abs-max scaling (plain XLA; runs once per window).

    T is padded up to a multiple of 128 — the int8 TPU tile is (32, 128), an
    unaligned second-minor dim halves the kernel's achieved HBM bandwidth
    (measured 322 vs 675 GiB/s at T=1500), and the key-blocked kernel needs a
    128-divisible key axis. Padded keys MUST be masked by the consumer
    (decode_attention_i8's valid_upto)."""
    t = x.shape[-2]
    t_pad = ((t + 127) // 128) * 128
    if t_pad != t:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, t_pad - t), (0, 0)]
        x = jnp.pad(x, pad)
    # Reduce |x| in the SOURCE dtype (max of bf16 magnitudes is exact — no
    # rounding in comparisons) and convert only the tiny (..., T) result:
    # converting x to f32 before the reduce gives the f32 tensor two
    # consumers (reduce + round), and XLA then materializes full fp32 copies
    # of the K/V in HBM (measured 13.7 ms of convert fusions at B=192 base).
    # With the reduce in bf16 the f32 convert feeds only the round and fuses
    # into a single bf16-read/s8-write pass.
    m = jnp.max(jnp.abs(x), axis=-1).astype(jnp.float32)
    scale = jnp.maximum(m, 1e-20) / 127.0
    xi = jnp.round(x.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
    return xi, scale


def _decode_attn_i8_kernel(
    valid_ref,  # (1, 1) int32 in SMEM
    q_ref,      # (b_blk, G, D) float
    k_ref,      # (1, b_blk, tk_blk, D) int8
    ks_ref,     # (1, b_blk, tk_blk) fp32 per-row scales
    v_ref,      # (1, b_blk, tk_blk, D) int8
    vs_ref,     # (1, b_blk, tk_blk) fp32
    o_ref,      # (b_blk, G, D)
    m_s,        # (b_blk, n_head*G) f32 scratch: running max, head-major rows
    l_s,        # (b_blk, n_head*G) f32 scratch: running sum
    acc_s,      # (b_blk, G, D)     f32 scratch: output accumulator
    *,
    n_head: int,
    scale: float,
    tk_blk: int,
):
    """Online-softmax over KEY blocks with block-diagonal head packing.

    A single-token decode step gives per-head matVECs (M=1) that cannot use
    the MXU — the first int8 kernel was VPU-compute-bound at 347 GiB/s, no
    faster than the bf16 one. Packing each (g, h) query into row g*H+h of a
    (G*H, D) block-diagonal matrix (q_{g,h} occupying lanes [h*dh, (h+1)*dh))
    turns QK into ONE (G*H, D) x (D, tk) int8 MXU matmul against K in its
    natural layout, and AV into (G*H, tk) x (tk, D) whose row g*H+h holds
    head h's output in exactly lanes [h*dh, (h+1)*dh) — extracted per head.
    7/8 of the MACs multiply zeros; MXU FLOPs are free here, HBM bytes are
    not, so the kernel runs at the DMA roofline.
    """
    d = q_ref.shape[-1]
    b_blk = q_ref.shape[0]
    g = q_ref.shape[1]
    dh = d // n_head
    gh = g * n_head
    ki = pl.program_id(1)
    nk = pl.num_programs(1)
    k = k_ref[0]   # (b_blk, tk_blk, D) int8
    v = v_ref[0]
    ks = ks_ref[0]  # (b_blk, tk_blk)
    vs = vs_ref[0]

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    valid_upto = valid_ref[0, 0]
    key_pos = ki * tk_blk + jax.lax.broadcasted_iota(jnp.int32, (1, 1, tk_blk), 2)
    masked = (valid_upto >= 0) & (key_pos > valid_upto)

    # --- quantize q per (row, head) and build the block-diagonal matrix ---
    # HEAD-MAJOR row order (row h*G + g): every later per-head read is then a
    # plain contiguous sublane slice — reshapes that split/merge the lane dim
    # do not lower in Mosaic
    rows = []
    sqs = []
    for h in range(n_head):
        qh = q_ref[:, :, h * dh:(h + 1) * dh].astype(jnp.float32)  # (b, G, dh)
        qmax = jnp.max(jnp.abs(qh), axis=-1, keepdims=True)
        sq = jnp.maximum(qmax, 1e-20) / 127.0
        qi = jnp.round(qh / sq)
        rows.append(jnp.pad(qi, ((0, 0), (0, 0), (h * dh, d - (h + 1) * dh))))
        sqs.append(sq)  # (b, G, 1)
    qbd = jnp.concatenate(rows, axis=1).astype(jnp.int8)  # (b, H*G, D)
    sq_all = jnp.concatenate(sqs, axis=1)  # (b, H*G, 1)

    s32 = jax.lax.dot_general(
        qbd, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32,
    )  # (b_blk, G*H, tk_blk) — int8 MXU
    sc = s32.astype(jnp.float32) * (sq_all * scale) * ks[:, None, :]
    sc = jnp.where(masked, _NEG_INF, sc)

    m_prev = m_s[...][:, :, None]  # (b, GH, 1)
    m_cur = jnp.max(sc, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(sc - m_new)
    p = jnp.where(masked, 0.0, p)  # fully-masked blocks: exp(0) lanes
    correction = jnp.exp(m_prev - m_new)  # (b, GH, 1)
    l_s[...] = (correction[..., 0] * l_s[...]) + jnp.sum(p, axis=-1)
    m_s[...] = m_new[..., 0]

    # fold the V row scales into the (unnormalized) probabilities, then
    # quantize per (row, block) so AV also runs int8 on the MXU
    pv = p * vs[:, None, :]
    pmax = jnp.max(pv, axis=-1, keepdims=True)
    sp = jnp.maximum(pmax, 1e-30) / 127.0
    pi = jnp.round(pv / sp).astype(jnp.int8)
    o32 = jax.lax.dot_general(
        pi, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32,
    )  # (b_blk, H*G, D) — row h*G+g carries head h's output at its own lanes
    of = o32.astype(jnp.float32) * sp  # (b, HG, D)

    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        rs = slice(h * g, (h + 1) * g)
        acc_s[:, :, sl] = (
            acc_s[:, :, sl] * correction[:, rs, :] + of[:, rs, sl]
        )

    @pl.when(ki == nk - 1)
    def _finalize():
        for h in range(n_head):
            sl = slice(h * dh, (h + 1) * dh)
            lh = l_s[:, h * g:(h + 1) * g][:, :, None]
            safe = jnp.where(lh == 0.0, 1.0, lh)
            o_ref[:, :, sl] = (acc_s[:, :, sl] / safe).astype(o_ref.dtype)


def _i8_blocks(b: int, tk: int, d: int):
    """(b_blk, tk_blk) for the int8 kernel, or None if unsupported.

    Mosaic tiling: the (1, b_blk, tk_blk) scale block is legal iff
    b_blk == b or b_blk % 8 == 0. Key blocks sized so K+V stay ~<=2 MB of
    VMEM per buffer with double-buffering headroom (~16 MB/core)."""
    if b <= 8:
        b_blk = b
    elif b % 8 == 0:
        b_blk = 8
    elif b * 128 * d <= (1 << 20):
        b_blk = b
    else:
        return None
    tk_blk = None
    for cand in (1024, 512, 256, 128):
        if tk % cand == 0 and b_blk * cand * d <= (1 << 20):
            tk_blk = cand
            break
    if tk_blk is None:
        if tk % 128 == 0 and b_blk * 128 * d <= (2 << 20):
            tk_blk = 128
        else:
            return None
    return b_blk, tk_blk


def i8_supported(b: int, tk: int, d: int) -> bool:
    """Whether decode_attention_i8 can serve this cache geometry."""
    return _i8_blocks(b, tk, d) is not None


@functools.partial(
    jax.jit, static_argnames=("layer", "n_head", "scale", "group", "interpret")
)
def decode_attention_i8(
    q: jnp.ndarray,        # (B*group, 1, D) float
    cache_k: jnp.ndarray,  # (L, B, Tk, D) int8
    k_scale: jnp.ndarray,  # (L, B, Tk) fp32
    cache_v: jnp.ndarray,  # (L, B, Tk, D) int8
    v_scale: jnp.ndarray,  # (L, B, Tk) fp32
    layer: int,
    n_head: int,
    *,
    scale: float,
    valid_upto=None,
    group: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """int8-KV variant of decode_attention: same layer-indexed streaming, half
    the HBM traffic. Returns (B*group, 1, D) in q.dtype."""
    _, b, tk, d = cache_k.shape
    assert q.shape[0] == b * group and q.shape[1] == 1
    blocks = _i8_blocks(b, tk, d)
    assert blocks is not None, f"unsupported int8 geometry b={b} tk={tk} d={d}"
    b_blk, tk_blk = blocks
    valid = jnp.full((1, 1), -1 if valid_upto is None else valid_upto, jnp.int32)
    qg = q.reshape(b, group, d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b // b_blk, tk // tk_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_blk, group, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, b_blk, tk_blk, d), lambda i, j: (layer, i, j, 0)),
            pl.BlockSpec((1, b_blk, tk_blk), lambda i, j: (layer, i, j)),
            pl.BlockSpec((1, b_blk, tk_blk, d), lambda i, j: (layer, i, j, 0)),
            pl.BlockSpec((1, b_blk, tk_blk), lambda i, j: (layer, i, j)),
        ],
        out_specs=pl.BlockSpec((b_blk, group, d), lambda i, j: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((b_blk, group * n_head), jnp.float32),
            pltpu.VMEM((b_blk, group * n_head), jnp.float32),
            pltpu.VMEM((b_blk, group, d), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _decode_attn_i8_kernel, n_head=n_head, scale=scale, tk_blk=tk_blk
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, group, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * group * tk * d,
            bytes_accessed=2 * b * tk * d,
            transcendentals=b * group * tk,
        ),
        interpret=interpret,
    )(valid, qg, cache_k, k_scale, cache_v, v_scale)
    return out.reshape(b * group, 1, d)
