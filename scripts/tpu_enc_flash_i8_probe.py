"""Probe: int8 QK/PV multi-head flash attention for the encoder.

flash_attention_mh is 78 ms of the 430 ms B=192 base headline (13 ms/layer)
vs a bf16-MXU ideal of ~7.1 ms/layer (QK runs at half MXU depth: dh=64
contraction). int8 operands double the MXU rate at any depth (394 TOPS vs
197 TFLOPS on v5e). This probe quantizes q/k per (row, head) and the
probabilities per row (V row scales folded before the quantize, like
ops/decode_attention._decode_attn_i8_kernel) with fp32 softmax statistics,
and times it against the bf16 kernel at headline encoder shapes.

Run on the real chip: python scripts/tpu_enc_flash_i8_probe.py

MEASURED DEAD END (2026-08-19, v5e, B=192 T=1500 D=512 H=8):

  bf16 mh flash  21.5 ms/layer-call (standalone; 13 ms inside the fused
                 headline program)
  int8 mh flash  61.4 ms/layer-call — 0.35x, 3x SLOWER

Numerics were fine (mean rel err 0.0073, cosine 0.99996) but the in-kernel
per-(head, q-block) re-quantization of K/V and the fp32 staging of every
head slice are pure VPU cost, and the dh=64-deep int8 QK matmuls gain
nothing over bf16 at that contraction depth (the int8 MXU's 2x rate needs
deep contractions; dh=64 runs both dtypes at the same shallow-pass rate).
The decode-side int8 kernel wins because its KV arrives PRE-quantized from
HBM (half the DMA bytes — its bottleneck); here K/V arrive bf16 and the
bytes don't change, so quantization only adds work. Encoder attention
stays bf16.
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


def _mh_i8_kernel(
    q_ref,  # (1, block_q, D) bf16
    k_ref,  # (1, tk_pad, D) bf16
    v_ref,  # (1, tk_pad, D) bf16
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

    def quant_rows(x):  # (..., n) float -> int8 with per-row f32 scale
        xf = x.astype(jnp.float32)
        m = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        s = jnp.maximum(m, 1e-20) / 127.0
        return jnp.round(xf / s).astype(jnp.int8), s

    for h in range(n_head):
        sl = slice(h * dh, (h + 1) * dh)
        qi, sq = quant_rows(q_ref[0][:, sl])      # (block_q, dh), (block_q, 1)
        ki, sk = quant_rows(k_ref[0][:, sl])      # (tk_pad, dh), (tk_pad, 1)
        s32 = jax.lax.dot_general(
            qi, ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (block_q, tk_pad)
        s = s32.astype(jnp.float32) * (sq * scale) * sk[:, 0][None, :]
        if kv_len < tk_pad:
            s = s + tail_bias
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        # fold V row scales into p, quantize p per row, int8 AV
        vf = v_ref[0][:, sl].astype(jnp.float32)
        vm = jnp.max(jnp.abs(vf), axis=-1, keepdims=True)
        sv = jnp.maximum(vm, 1e-20) / 127.0
        vi = jnp.round(vf / sv).astype(jnp.int8)  # (tk_pad, dh)
        pv = p * sv[:, 0][None, :]
        pm = jnp.max(pv, axis=1, keepdims=True)
        sp = jnp.maximum(pm, 1e-30) / 127.0
        pi = jnp.round(pv / sp).astype(jnp.int8)
        o32 = jax.lax.dot_general(
            pi, vi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (block_q, dh)
        acc = o32.astype(jnp.float32) * sp
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_head", "kv_valid_len", "scale", "block_q", "interpret")
)
def flash_mh_i8(q, k, v, *, n_head, kv_valid_len=None, scale=1.0,
                block_q=128, interpret=False):
    b, tq, d = q.shape
    tk = k.shape[1]
    kv_len = kv_valid_len if kv_valid_len is not None else tk
    tk_pad = ((tk + 127) // 128) * 128
    tq_pad = ((tq + block_q - 1) // block_q) * block_q
    if tq_pad != tq:
        q = jnp.pad(q, ((0, 0), (0, tq_pad - tq), (0, 0)))
    if tk_pad != tk:
        k = jnp.pad(k, ((0, 0), (0, tk_pad - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, tk_pad - tk), (0, 0)))
        kv_len = min(kv_len, tk)

    out = pl.pallas_call(
        functools.partial(
            _mh_i8_kernel, n_head=n_head, kv_len=kv_len, tk_pad=tk_pad, scale=scale,
        ),
        grid=(b, tq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, tk_pad, d), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, tk_pad, d), lambda b_, i: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, tq_pad, d), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * tq_pad * tk_pad * d,
            bytes_accessed=b * (2 * tq_pad + 2 * tk_pad) * d * q.dtype.itemsize,
            transcendentals=b * tq_pad * tk_pad * n_head,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :tq] if tq_pad != tq else out


def main():
    from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention_mh

    rng = np.random.RandomState(0)
    B, T, D, H = 192, 1500, 512, 8
    q = jnp.asarray(rng.randn(B, T, D) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, T, D) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, T, D) * 0.3, jnp.bfloat16)
    scale = float((D // H) ** -0.5)

    o_bf = flash_attention_mh(q, k, v, n_head=H, kv_valid_len=T, scale=scale)
    o_i8 = flash_mh_i8(q, k, v, n_head=H, kv_valid_len=T, scale=scale)
    a = np.asarray(o_bf[:2], np.float32)
    b_ = np.asarray(o_i8[:2], np.float32)
    rel = np.abs(a - b_).mean() / (np.abs(a).mean() + 1e-9)
    cos = float((a * b_).sum() / (np.linalg.norm(a) * np.linalg.norm(b_) + 1e-9))
    print(f"i8 vs bf16 kernel: mean rel err {rel:.4f}, cosine {cos:.5f}")

    def bench(fn, n=20):
        _ = np.asarray(fn()[0, 0, :1])
        _ = np.asarray(fn()[0, 0, :1])
        t0 = time.perf_counter()
        for _i in range(n):
            out = fn()
        _ = np.asarray(out[0, 0, :1])
        return (time.perf_counter() - t0) / n * 1e3

    tb = bench(lambda: flash_attention_mh(q, k, v, n_head=H, kv_valid_len=T, scale=scale))
    ti = bench(lambda: flash_mh_i8(q, k, v, n_head=H, kv_valid_len=T, scale=scale))
    print(f"bf16 mh flash: {tb:.2f} ms/layer-call")
    print(f"int8 mh flash: {ti:.2f} ms/layer-call   speedup {tb / ti:.2f}x")


if __name__ == "__main__":
    main()
