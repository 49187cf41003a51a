"""Probe: is a nibble-packed (int4-in-int8) cross-KV decode-attention kernel
faster than the int8 one, or does the in-kernel unpack make it VPU-bound?

MEASURED DEAD END (2026-08-19, v5e, base B=192 T=1536 geometry; kept for
the record like the conv-stem GEMM and packed-dispatch ones):

  int8 kernel   0.445 ms/layer-call  (679 GB/s — HBM roofline)
  int4 packed   0.486-0.494 ms/layer (0.90-0.93x — SLOWER)

Two unpack formulations, both measured in a fused 64-step loop:
  v1: i8->i32 convert + sign-extending shifts + lane concat
  v3: biased nibbles, minimal i32 and/shift, no concat, split matmuls with
      integer bias corrections (this file)
Both land at ~0.25 ms of VPU unpack per layer-call — exactly the ~0.22 ms
of DMA the packing saves. Mosaic has no int8 VPU arithmetic ("Only
vector<i16> and vector<i32> are supported"), no int4 tiles, i16 matmuls
fail to compile, and pltpu.bitcast reinterprets along SUBLANES (so lane-dim
nibble layouts can't dodge the convert). The unpack touches every byte with
>=3 lane-ops at i32 density ~= 0.24 ms — structurally tied to the DMA
saving. int8 KV is the speed of light for this memory system on v5e.
Quality was also 5.5x worse (max err 0.097 vs 0.018 on random weights).

The int8 decode kernel (ops/decode_attention.py:decode_attention_i8) runs at
the HBM roofline; its KV stream dominates the headline decode loop (~170 ms
of 453 ms at base B=192, PERF.md). Packing two 4-bit values per byte halves
the bytes — IF the VPU unpack (shift/mask/concat on the full KV block) keeps
up with the doubled effective DMA rate.

Packing layout: byte[t, j] = (chan j) | (chan j + D/2) << 4, j in [0, D/2).
Unpack is then two plain ops per plane and ONE lane-dim concat that restores
the natural channel order:
    lo = (b << 4) >> 4   (arithmetic, sign-extends the low nibble)
    hi =  b >> 4         (arithmetic, sign-extends the high nibble)
    k  = concat([lo, hi], axis=-1)

Run on the real chip: python scripts/tpu_int4_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _attn_i4_kernel(
    q_ref,      # (b_blk, G, D) float
    kp_ref,     # (1, b_blk, tk_blk, D//2) int8 packed
    ks_ref,     # (1, b_blk, tk_blk) fp32
    vp_ref,     # (1, b_blk, tk_blk, D//2) int8 packed
    vs_ref,     # (1, b_blk, tk_blk) fp32
    o_ref,      # (b_blk, G, D)
    m_s, l_s, acc_s,
    *,
    n_head: int,
    scale: float,
    tk_blk: int,
):
    d = q_ref.shape[-1]
    g = q_ref.shape[1]
    dh = d // n_head
    ki = pl.program_id(1)
    nk = pl.num_programs(1)

    # Biased-nibble unpack: byte = (lo+8) | (hi & 0xF) << 4, value =
    # (lo+8) + 16*hi in [-128, 127]. Mosaic has no int8 VPU arithmetic
    # (only i16/i32), so unpack in i32 with the minimal op count:
    #   hi   = x32 >> 4 (arithmetic)          in [-8, 7]
    #   lo_u = x32 & 15 = lo + 8              in [0, 15]
    # No lane concat: lo/hi planes feed SEPARATE matmuls; the -8 bias is
    # removed after the matmul via a per-row rowsum(q_lo) correction.
    def unpack(p):  # (b_blk, tk_blk, D//2) int8 -> (lo_u, hi) int8 planes
        x = p[0].astype(jnp.int32)
        hi = jax.lax.shift_right_arithmetic(x, 4).astype(jnp.int8)
        lo_u = jax.lax.bitwise_and(x, 15).astype(jnp.int8)
        return lo_u, hi

    k_lo, k_hi = unpack(kp_ref)
    v_lo, v_hi = unpack(vp_ref)
    ks = ks_ref[0]
    vs = vs_ref[0]

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, _NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    rows, sqs = [], []
    for h in range(n_head):
        qh = q_ref[:, :, h * dh:(h + 1) * dh].astype(jnp.float32)
        qmax = jnp.max(jnp.abs(qh), axis=-1, keepdims=True)
        sq = jnp.maximum(qmax, 1e-20) / 127.0
        qi = jnp.round(qh / sq)
        rows.append(jnp.pad(qi, ((0, 0), (0, 0), (h * dh, d - (h + 1) * dh))))
        sqs.append(sq)
    qbd = jnp.concatenate(rows, axis=1).astype(jnp.int8)
    sq_all = jnp.concatenate(sqs, axis=1)

    dp2 = d // 2
    q_lo = qbd[:, :, :dp2]   # heads [0, H/2): block-diagonal rows zero elsewhere
    q_hi = qbd[:, :, dp2:]   # heads [H/2, H)
    s_lo = jax.lax.dot_general(
        q_lo, k_lo, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32)
    s_hi = jax.lax.dot_general(
        q_hi, k_hi, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.int32)
    qlo_rowsum = jnp.sum(q_lo.astype(jnp.int32), axis=-1, keepdims=True)
    s32 = s_lo + s_hi - 8 * qlo_rowsum
    sc = s32.astype(jnp.float32) * (sq_all * scale) * ks[:, None, :]

    m_prev = m_s[...][:, :, None]
    m_cur = jnp.max(sc, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(sc - m_new)
    correction = jnp.exp(m_prev - m_new)
    l_s[...] = (correction[..., 0] * l_s[...]) + jnp.sum(p, axis=-1)
    m_s[...] = m_new[..., 0]

    pv = p * vs[:, None, :]
    pmax = jnp.max(pv, axis=-1, keepdims=True)
    sp = jnp.maximum(pmax, 1e-30) / 127.0
    pi = jnp.round(pv / sp).astype(jnp.int8)
    o_lo = jax.lax.dot_general(
        pi, v_lo, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32)
    o_hi = jax.lax.dot_general(
        pi, v_hi, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32)
    pi_rowsum = jnp.sum(pi.astype(jnp.int32), axis=-1, keepdims=True)
    o32 = jnp.concatenate([o_lo - 8 * pi_rowsum, o_hi], axis=-1)
    of = o32.astype(jnp.float32) * sp

    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        rs = slice(h * g, (h + 1) * g)
        acc_s[:, :, sl] = acc_s[:, :, sl] * correction[:, rs, :] + of[:, rs, sl]

    @pl.when(ki == nk - 1)
    def _finalize():
        for h in range(n_head):
            sl = slice(h * dh, (h + 1) * dh)
            lh = l_s[:, h * g:(h + 1) * g][:, :, None]
            safe = jnp.where(lh == 0.0, 1.0, lh)
            o_ref[:, :, sl] = (acc_s[:, :, sl] / safe).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layer", "n_head", "scale", "interpret"))
def attn_i4(q, kp, ks, vp, vs, layer, n_head, *, scale, interpret=False):
    _, b, tk, dp2 = kp.shape
    d = dp2 * 2
    b_blk = 8 if b % 8 == 0 else b
    # tk_blk=512 OOMs scoped VMEM (20.2 MB): the i32 unpack temporaries are
    # 4x the packed block; 256 fits
    tk_blk = 256 if tk % 256 == 0 else 128
    qg = q.reshape(b, 1, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b // b_blk, tk // tk_blk),
        in_specs=[
            pl.BlockSpec((b_blk, 1, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, b_blk, tk_blk, dp2), lambda i, j: (layer, i, j, 0)),
            pl.BlockSpec((1, b_blk, tk_blk), lambda i, j: (layer, i, j)),
            pl.BlockSpec((1, b_blk, tk_blk, dp2), lambda i, j: (layer, i, j, 0)),
            pl.BlockSpec((1, b_blk, tk_blk), lambda i, j: (layer, i, j)),
        ],
        out_specs=pl.BlockSpec((b_blk, 1, d), lambda i, j: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((b_blk, n_head), jnp.float32),
            pltpu.VMEM((b_blk, n_head), jnp.float32),
            pltpu.VMEM((b_blk, 1, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_attn_i4_kernel, n_head=n_head, scale=scale, tk_blk=tk_blk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * tk * d, bytes_accessed=b * tk * d,
            transcendentals=b * tk),
        interpret=interpret,
    )(qg, kp, ks, vp, vs)
    return out.reshape(b, 1, d)


def pack_i4_rows(x):
    """(..., T, D) float -> packed (..., T, D//2) int8 + (..., T) fp32 scale.
    byte[..., t, j] = (q(chan j) + 8) | (q(chan j + D/2) & 0xF) << 4 — the low
    nibble is stored BIASED so the kernel unpacks with one shift + one mask."""
    m = jnp.max(jnp.abs(x), axis=-1).astype(jnp.float32)
    scale = jnp.maximum(m, 1e-20) / 7.0
    xi = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -8, 7)
    xi = xi.astype(jnp.int32)
    d = x.shape[-1]
    lo = xi[..., : d // 2] + 8
    hi = xi[..., d // 2:]
    packed = (lo | ((hi & 0xF) << 4)).astype(jnp.int8)
    return packed, scale


def main():
    from asr_ttl_mtl_tpu.ops.decode_attention import (
        decode_attention_i8, quantize_kv_rows)

    rng = np.random.RandomState(0)
    # timing is per layer-call; 2 layers keep HBM (+ fp32 quantize temps) low
    L, B, T, D, H = 2, 192, 1536, 512, 8
    q = jnp.asarray(rng.randn(B, 1, D), jnp.bfloat16)
    kf_h = rng.randn(L, B, T, D).astype(np.float32)
    vf_h = rng.randn(L, B, T, D).astype(np.float32)
    kf = jnp.asarray(kf_h, jnp.bfloat16)
    vf = jnp.asarray(vf_h, jnp.bfloat16)
    scale = (D // H) ** -0.25  # fold as in models (square applied twice)

    ki8, ks8 = jax.block_until_ready(quantize_kv_rows(kf))
    vi8, vs8 = jax.block_until_ready(quantize_kv_rows(vf))
    kp, ksp = jax.block_until_ready(pack_i4_rows(kf))
    vp, vsp = jax.block_until_ready(pack_i4_rows(vf))
    del kf, vf  # free the bf16 copies; ref() reads the host arrays

    # reference (fp32 einsum on host shapes, one layer)
    def ref(layer):
        qf = np.asarray(q, np.float32).reshape(B, 1, H, D // H)
        qf = np.moveaxis(qf, 2, 1)  # (B, H, 1, dh)
        import ml_dtypes
        kfl = kf_h[layer].astype(ml_dtypes.bfloat16).astype(np.float32)
        kfl = kfl.reshape(B, T, H, D // H)
        vfl = vf_h[layer].astype(ml_dtypes.bfloat16).astype(np.float32)
        vfl = vfl.reshape(B, T, H, D // H)
        s = np.einsum("bhqd,bthd->bhqt", qf, kfl) * (scale * scale)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        o = np.einsum("bhqt,bthd->bhqd", p, vfl)
        return np.moveaxis(o, 1, 2).reshape(B, 1, D)

    o8 = decode_attention_i8(q, ki8, ks8, vi8, vs8, 0, H, scale=scale * scale)
    o4 = attn_i4(q, kp, ksp, vp, vsp, 0, H, scale=scale * scale)
    r = ref(0)
    e8 = np.abs(np.asarray(o8, np.float32) - r).max()
    e4 = np.abs(np.asarray(o4, np.float32) - r).max()
    print(f"max err vs fp32 ref: int8 {e8:.4f}  int4 {e4:.4f}  "
          f"(out rms {np.sqrt((r ** 2).mean()):.3f})")

    # Time the way the decode loop uses these kernels: 64 chained calls in
    # ONE jitted program (per-dispatch tunnel overhead otherwise dominates).
    STEPS = 64

    @jax.jit
    def loop8(q, ki8, ks8, vi8, vs8):
        def body(i, qc):
            o = decode_attention_i8(qc, ki8, ks8, vi8, vs8, 0, H,
                                    scale=scale * scale)
            return o.astype(qc.dtype)
        return jax.lax.fori_loop(0, STEPS, body, q)

    @jax.jit
    def loop4(q, kp, ksp, vp, vsp):
        def body(i, qc):
            o = attn_i4(qc, kp, ksp, vp, vsp, 0, H, scale=scale * scale)
            return o.astype(qc.dtype)
        return jax.lax.fori_loop(0, STEPS, body, q)

    def bench(fn, *args, n=10):
        _ = float(np.asarray(fn(q, *args)[0, 0, 0], np.float32))
        _ = float(np.asarray(fn(q, *args)[0, 0, 0], np.float32))
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(q, *args)
        _ = float(np.asarray(out[0, 0, 0], np.float32))
        return (time.perf_counter() - t0) / n / STEPS * 1e3

    t8 = bench(loop8, ki8, ks8, vi8, vs8)
    t4 = bench(loop4, kp, ksp, vp, vsp)
    kv_bytes8 = 2 * B * T * D
    kv_bytes4 = B * T * D
    print(f"int8: {t8:.3f} ms/layer-call  ({kv_bytes8 / t8 / 1e6:.0f} GB/s)")
    print(f"int4: {t4:.3f} ms/layer-call  ({kv_bytes4 / t4 / 1e6:.0f} GB/s packed"
          f" = {kv_bytes8 / t4 / 1e6:.0f} GB/s effective)")
    print(f"speedup: {t8 / t4:.2f}x")


if __name__ == "__main__":
    main()
