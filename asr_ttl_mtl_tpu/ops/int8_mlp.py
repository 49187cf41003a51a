"""Fused W8A8 encoder-MLP block as a single Pallas TPU kernel.

Why this kernel exists: the opt-in int8 encoder (models/whisper.py
`linear_i8`, reference parity target whisper/model.py:147-151 `mlp`) runs
its two projections as XLA int8 GEMMs that are individually at the MXU's
int8 roofline — but everything BETWEEN them materializes in HBM. Per layer
at B=192/base the HLO profile showed ~8 ms of pure plumbing around ~2 ms of
matmul: the per-token activation quantize (bf16 read + s8 write), the
(B, T, 4D) bf16 GELU intermediate (1.2 GB written + re-read), its re-quantize
to s8, the second GEMM's s32 accumulator (1.5 GB written + re-read), and the
dequant multiply.

This kernel streams token tiles through VMEM once: quantize -> int8 GEMM1
-> dequant+bias+GELU -> re-quantize -> int8 GEMM2 -> dequant+bias, with the
4D-wide intermediates never leaving VMEM. HBM traffic per tile is the bf16
input + bf16 output rows plus the (resident) int8 weights — the same bytes a
single elementwise pass would move.

Quantization semantics match `linear_i8` exactly (per-token symmetric
abs-max/127 activation scales, per-column weight scales, round-half-even,
clip to [-127, 127], bias added in f32, intermediate rounded to the compute
dtype before GELU) so the einsum fallback is the existing
`linear_i8(fc2, gelu(linear_i8(fc1, x)))` composition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _quant_rows(x32):
    """Per-row symmetric int8 quantization (matches whisper._quant_rowwise_sym)."""
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_mlp_kernel(
    h_ref,    # (block_m, D) compute-dtype input rows (post-LN)
    w1_ref,   # (D, H) int8
    s1_ref,   # (1, H) f32 per-column scales of w1
    b1_ref,   # (1, H) f32
    w2_ref,   # (H, D) int8
    s2_ref,   # (1, D) f32
    b2_ref,   # (1, D) f32
    o_ref,    # (block_m, D) compute-dtype output rows (pre-residual)
):
    cdt = h_ref.dtype
    h = h_ref[...].astype(_F32)
    qx, sx = _quant_rows(h)
    a1 = jax.lax.dot_general(
        qx, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (block_m, H) int8 MXU
    f1 = a1.astype(_F32) * (sx * s1_ref[...]) + b1_ref[...]
    # linear_i8 returns in the compute dtype and _gelu runs its tanh
    # approximation there — mirror both so the fallback matches tightly
    g = jax.nn.gelu(f1.astype(cdt), approximate=True).astype(_F32)
    qg, sg = _quant_rows(g)
    a2 = jax.lax.dot_general(
        qg, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (block_m, D)
    out = a2.astype(_F32) * (sg * s2_ref[...]) + b2_ref[...]
    o_ref[...] = out.astype(cdt)


def int8_mlp_supported(n_tokens: int, d: int, hidden: int) -> bool:
    """Geometry gate: lane-dim multiples of 128 and a VMEM-sized hidden."""
    return (
        d % 128 == 0
        and hidden % 128 == 0
        # w1 + w2 resident int8 plus ~5x block_m*hidden live intermediates
        and 2 * d * hidden + 5 * 256 * hidden * 4 <= 14 * (1 << 20)
        and n_tokens >= 8
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_mlp(
    x: jnp.ndarray,        # (..., D) compute-dtype activations (post-LN)
    w1q: jnp.ndarray,      # (D, H) int8
    s_w1: jnp.ndarray,     # (1, H) f32
    b1: jnp.ndarray,       # (H,) f32
    w2q: jnp.ndarray,      # (H, D) int8
    s_w2: jnp.ndarray,     # (1, D) f32
    b2: jnp.ndarray,       # (D,) f32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused quantize -> GEMM1 -> GELU -> quantize -> GEMM2 -> dequant."""
    d, hidden = w1q.shape
    orig_shape = x.shape
    n = 1
    for s in orig_shape[:-1]:
        n *= s
    xf = x.reshape(n, d)

    block_m = 256
    n_pad = -(-n // block_m) * block_m
    if n_pad != n:
        xf = jnp.pad(xf, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        _int8_mlp_kernel,
        grid=(n_pad // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0)),
            pl.BlockSpec((d, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * d * hidden,
            bytes_accessed=2 * n_pad * d * x.dtype.itemsize + 2 * d * hidden,
            transcendentals=n_pad * hidden,
        ),
        interpret=interpret,
    )(xf, w1q, s_w1, b1.reshape(1, hidden).astype(_F32),
      w2q, s_w2, b2.reshape(1, d).astype(_F32))
    if n_pad != n:
        out = out[:n]
    return out.reshape(orig_shape)
