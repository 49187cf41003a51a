"""Functional Whisper encoder-decoder for TPU (pure-pytree params, jax).

Architecture parity with reference `whisper/model.py` (AudioEncoder :174-204,
TextDecoder :207-249, MultiHeadAttention :81-139), re-designed for XLA:

* Parameters are a plain nested-dict pytree (fp32 masters); activations are
  computed in a caller-chosen `compute_dtype` (bf16 on TPU) with fp32 MXU
  accumulation via `preferred_element_type`, and LayerNorm always in fp32
  (the reference upcasts LN the same way, model.py:39-41).
* Decoding uses a *static-shape* KV cache: per-layer (B, n_text_ctx, D)
  buffers written with `dynamic_update_slice` and masked by position —
  instead of the reference's forward-hook cache that concatenates and
  reallocates every step (model.py:380-411), which would retrace under jit.
* One `decoder_apply` handles teacher-forced training (no cache), prompt
  prefill (cache write of T positions) and incremental steps (T=1), so the
  whole greedy/beam loop stays inside `lax.scan`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dims import ModelDimensions

Params = Dict[str, Any]

_F32 = jnp.float32
_HIGHEST = jax.lax.Precision.HIGHEST


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    """Sinusoidal position embeddings (reference model.py:62-68)."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------


def layer_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """LayerNorm computed in fp32, cast back to the input dtype."""
    x32 = x.astype(_F32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    out = out * p["scale"].astype(_F32) + p["bias"].astype(_F32)
    return out.astype(x.dtype)


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x @ W (+ b); weights stored (in, out); fp32 accumulation on the MXU."""
    out = jnp.matmul(x, p["w"].astype(x.dtype), preferred_element_type=_F32)
    if "b" in p:
        out = out + p["b"].astype(_F32)
    return out.astype(x.dtype)


def _quant_rowwise_sym(x32: jnp.ndarray):
    """Symmetric int8 quantization with one scale per last-dim row."""
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_colwise_sym(w32: jnp.ndarray):
    """Symmetric int8 quantization with one scale per output column."""
    absmax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    scale = jnp.maximum(absmax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def linear_i8(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """W8A8 dynamically-quantized linear: per-token activation scales x
    per-column weight scales, int8xint8->int32 matmul (2x MXU throughput on
    v5e vs bf16). Serving-only opt-in (`DecodingOptions.int8_encoder`) — the
    ~0.5% row-quantization error is amplified nowhere (encoder activations
    are LayerNorm-conditioned), but parity with the bf16 path is approximate
    by construction."""
    xq, sx = _quant_rowwise_sym(x.astype(_F32))
    wq, sw = _quant_colwise_sym(p["w"].astype(_F32))
    acc = jnp.matmul(xq, wq, preferred_element_type=jnp.int32)
    out = acc.astype(_F32) * (sx * sw)
    if "b" in p:
        out = out + p["b"].astype(_F32)
    return out.astype(x.dtype)


def conv1d(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """1-D conv over (B, C, T); weights in torch (O, I, K) layout.

    No `preferred_element_type`: its conv transpose rule rejects bf16
    inputs with an f32 cotangent under AD, and TPU convs accumulate in
    fp32 on the MXU regardless of the bf16 io dtype.

    Measured dead end (round 2): reformulating the k=3 stem as a shifted
    tap-stack GEMM in (B, T, C) layout ran 3.5x SLOWER on chip (14.4 vs
    4.0 ms device time at B=192 base — the tap slices/pads materialize in
    HBM, and XLA pattern-matches the stack-matmul back into a convolution
    anyway). XLA's native conv lowering is already at the stem's roofline.
    """
    out = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    out = out.astype(_F32) + p["b"].astype(_F32)[None, :, None]
    return out.astype(x.dtype)


def _split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


# Pallas flash attention is used on TPU whenever the structured mask info
# below describes the attention pattern (it always does in this codebase) and
# the query side is long enough for the fused kernel to win; the CPU backend
# takes the einsum path. Single-token decode steps use the dedicated fused
# decode-attention kernel (ops/decode_attention.py) — XLA's einsum lowering
# for Tq=1 converts the whole bf16 KV cache to fp32 in HBM every step.
_FLASH = {"enabled": True, "decode_kernel": "auto"}  # "auto" | "off" | "interpret"

# Fused W8A8 MLP kernel (ops/int8_mlp.py): measured NET-NEUTRAL at the
# headline config (B=192 base: 38.4 ms of kernel time replacing ~40 ms of
# XLA quantize/GELU/s32/dequant fusions — the kernel is VPU-bound on the
# same elementwise work the fusions spend HBM time on; block_m/bf16-GELU/
# W8A16 variants all within noise). Kept opt-in for future Mosaic
# vectorization improvements; "auto" enables it on TPU.
_INT8_MLP = {"mode": "off"}  # "auto" | "off"


def set_int8_mlp_kernel(mode: str) -> None:
    """Fused int8-MLP mode: "auto" (use on TPU when geometry fits), "off"."""
    assert mode in ("auto", "off")
    _INT8_MLP["mode"] = mode


def set_flash_attention(enabled: bool) -> None:
    """Globally enable/disable the Pallas flash-attention fast path.

    Controls ONLY the flash (Tq>=16) kernel; the single-token decode kernel
    has its own switch (`set_decode_kernel`) so the failure ladder can
    disable one bad geometry without degrading the other. Callers that want
    the plain-XLA path everywhere should use `set_kernels(False)`."""
    _FLASH["enabled"] = bool(enabled)


def set_kernels(enabled: bool) -> None:
    """Enable/disable BOTH Pallas attention kernels (flash + decode) — the
    one-call switch for "force the plain XLA path" (tests, pjit tracing,
    debugging). Equivalent to set_flash_attention(enabled) +
    set_decode_kernel("auto" if enabled else "off")."""
    set_flash_attention(enabled)
    set_decode_kernel("auto" if enabled else "off")


def set_decode_kernel(mode: str) -> None:
    """Pallas decode-attention mode: "auto" (on TPU), "off", or "interpret"
    (force the kernel in interpreter mode — CPU integration tests)."""
    assert mode in ("auto", "off", "interpret")
    _FLASH["decode_kernel"] = mode


def _decode_kernel_state() -> tuple:
    """(use_kernel, interpret) for the current backend/config.

    Independent of the flash switch: every caller that needs ALL kernels
    off (meshes, trainer) sets both flags explicitly, and the decode-kernel
    failure ladder (decoding.DecodingTask.run) must be able to disable the
    flash kernel for one bad geometry without degrading the decode loop."""
    mode = _FLASH["decode_kernel"]
    if mode == "interpret":
        return True, True
    if mode == "off":
        return False, False
    return jax.default_backend() == "tpu", False


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU matching reference model.py's nn.GELU (exact erf form) in fp32;
    the tanh approximation in half precision, where its ~3e-3 relative error
    sits below bf16's 2^-8 resolution but erf's VPU transcendentals cost ~10%
    of encoder device time (measured B=32 base: 60.0 -> 53.7 ms)."""
    half = x.dtype in (jnp.bfloat16, jnp.float16)
    return jax.nn.gelu(x, approximate=bool(half))


def _flash_eligible(tq: int, return_qk: bool, q_offset: Any, mask_structural: bool) -> bool:
    # mask_structural: the caller's additive `mask` (if any) is fully
    # described by the causal/q_offset/kv_valid_len arguments — the kernel
    # never sees the materialized mask, so anything else must take the
    # einsum path
    return (
        _FLASH["enabled"]
        and mask_structural
        and not return_qk
        and tq >= 16
        and isinstance(q_offset, int)
        and jax.default_backend() == "tpu"
    )


def qkv_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    mask: Optional[jnp.ndarray] = None,
    return_qk: bool = False,
    *,
    causal: bool = False,
    q_offset: Any = 0,
    kv_valid_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Scaled dot-product attention over (B, T, D) projections.

    Matches reference model.py:114-139: both q and k scaled by d_head**-0.25,
    softmax in fp32. `mask` is an additive fp32 mask broadcastable to
    (B, n_head, Tq, Tk); `causal`/`q_offset`/`kv_valid_len` describe the same
    pattern structurally so the Pallas flash kernel (ops/flash_attention.py)
    can be used on TPU without materializing the (Tq, Tk) logits.
    """
    d_head = q.shape[-1] // n_head
    scale = d_head**-0.25

    # Natural-layout multi-head kernel: non-causal attention over (B, T, D)
    # projections skips the four per-call head-split/merge HBM relayouts
    # (dh=64 is half a lane tile, so XLA must physically copy) — measured
    # 55.6 -> 46.0 ms per encoder self-attention at the B=192 base headline.
    if (
        not causal
        and _flash_eligible(q.shape[1], return_qk, q_offset, mask is None)
    ):
        from ..ops.flash_attention import (
            flash_attention_mh_vjp, h2_eligible, mh_flash_eligible,
        )

        # h2_eligible covers shapes the mh kernel's VMEM cap excludes
        # (D > 768, e.g. large's 1280): the vjp wrapper picks the h2
        # head-pair kernel for those (and for everything it serves)
        if mh_flash_eligible(
            q.shape[1], k.shape[1], q.shape[-1], n_head, False
        ) or h2_eligible(q.shape[1], k.shape[1], q.shape[-1], n_head):
            out = flash_attention_mh_vjp(
                q, k, v, n_head, kv_valid_len, float(d_head**-0.5)
            )
            return out, None

    q = _split_heads(q, n_head)
    k = _split_heads(k, n_head)
    v = _split_heads(v, n_head)

    if _flash_eligible(q.shape[2], return_qk, q_offset, mask is None or causal):
        from ..ops.flash_attention import flash_attention_vjp

        b, h, tq, d = q.shape
        tk = k.shape[2]
        # unscaled q/k: the kernel folds d**-0.5 into the fp32 scores
        out = flash_attention_vjp(
            q.reshape(b * h, tq, d),
            k.reshape(b * h, tk, d),
            v.reshape(b * h, tk, d),
            causal,
            q_offset,
            kv_valid_len,
            float(d_head**-0.5),
        ).reshape(b, h, tq, d)
        return _merge_heads(out), None

    # reference numerics (model.py:114-122): both sides scaled by d**-0.25
    q = q * jnp.asarray(scale, q.dtype)
    k = k * jnp.asarray(scale, k.dtype)
    qk = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=_F32)
    if mask is not None:
        qk = qk + mask
    if kv_valid_len is not None and kv_valid_len < k.shape[2]:
        # padded key tail (same structural mask the flash kernel applies)
        qk = jnp.where(
            jnp.arange(k.shape[2]) < kv_valid_len, qk, jnp.asarray(-jnp.inf, qk.dtype)
        )
    w = jax.nn.softmax(qk, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=_F32).astype(v.dtype)
    return _merge_heads(out), (qk if return_qk else None)


def _mha_project_qkv(p: Params, x: jnp.ndarray, xa: Optional[jnp.ndarray] = None):
    src = x if xa is None else xa
    return linear(p["query"], x), linear(p["key"], src), linear(p["value"], src)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encoder_apply(
    params: Params,
    dims: ModelDimensions,
    mel: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
    *,
    int8_linears: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """mel (B, n_mels, 3000) -> audio features (B, n_audio_ctx, D).

    int8_linears: run each block's six projections (QKV/out/fc1/fc2 — ~2/3 of
    encoder FLOPs) as dynamically-quantized W8A8 matmuls (`linear_i8`);
    attention itself and the conv frontend stay in compute_dtype.

    remat: checkpoint each block (training): the backward recomputes the
    block's activations from its (B, T, D) input instead of storing them —
    the encoder's T=1500 activations are what blow HBM at large batch."""
    lin = linear_i8 if int8_linears else linear
    p = params["encoder"]
    # Fused Pallas W8A8 MLP (ops/int8_mlp.py): keeps the quantize/GELU/
    # s32-accumulator intermediates in VMEM. Opt-in via set_int8_mlp_kernel
    # ("auto") — measured net-neutral vs the XLA fusions at base geometry,
    # see _INT8_MLP above. Gated like the other kernels: TPU backend,
    # _FLASH master switch (meshes/shard_map flip it off — no GSPMD rules),
    # and a VMEM-geometry check; the composition below is the fallback.
    d_enc = dims.n_audio_state
    use_mlp_kernel = False
    if (int8_linears and _INT8_MLP["mode"] == "auto" and _FLASH["enabled"]
            and jax.default_backend() == "tpu"):
        from ..ops.int8_mlp import int8_mlp_supported

        n_tok = mel.shape[0] * (-(-dims.n_audio_ctx // 128) * 128)
        use_mlp_kernel = int8_mlp_supported(n_tok, d_enc, 4 * d_enc)
    x = mel.astype(compute_dtype)
    x = _gelu(conv1d(p["conv1"], x, stride=1))
    x = _gelu(conv1d(p["conv2"], x, stride=2))
    x = x.transpose(0, 2, 1)  # (B, T, D)

    pos = jnp.asarray(sinusoids(dims.n_audio_ctx, dims.n_audio_state))
    x = (x + pos.astype(compute_dtype)).astype(compute_dtype)

    # Run the block stack at T rounded up to the flash-block granularity:
    # padding ONCE here (and masking padded keys structurally) is what keeps
    # every per-layer flash call pad-free — at T=1500 the per-call q/k/v
    # repads were 18 full-tensor HBM copies per encoder pass (~12 ms device
    # time at B=64 base). Padded rows carry garbage (LN emits its bias) but
    # never reach valid rows: keys are masked, and every other op is rowwise.
    t_valid = x.shape[1]
    t_run = -(-t_valid // 128) * 128
    if t_run != t_valid:
        x = jnp.pad(x, ((0, 0), (0, t_run - t_valid), (0, 0)))

    def one_block(x, block):
        # self-attention
        res = x
        h = layer_norm(block["attn_ln"], x)
        q, k, v = (
            lin(block["attn"]["query"], h),
            lin(block["attn"]["key"], h),
            lin(block["attn"]["value"], h),
        )
        att, _ = qkv_attention(
            q, k, v, dims.n_audio_head,
            kv_valid_len=t_valid if t_run != t_valid else None,
        )
        x = res + lin(block["attn"]["out"], att)
        # mlp
        res = x
        h = layer_norm(block["mlp_ln"], x)
        if use_mlp_kernel:
            from ..ops.int8_mlp import int8_mlp

            w1q, s1 = _quant_colwise_sym(block["mlp"]["fc1"]["w"].astype(_F32))
            w2q, s2 = _quant_colwise_sym(block["mlp"]["fc2"]["w"].astype(_F32))
            x = res + int8_mlp(
                h, w1q, s1, block["mlp"]["fc1"]["b"].astype(_F32),
                w2q, s2, block["mlp"]["fc2"]["b"].astype(_F32),
            )
        else:
            h = _gelu(lin(block["mlp"]["fc1"], h))
            x = res + lin(block["mlp"]["fc2"], h)
        return x

    if remat:
        one_block = jax.checkpoint(one_block)
    for block in p["blocks"]:
        x = one_block(x, block)

    x = x[:, :t_valid] if t_run != t_valid else x
    return layer_norm(p["ln_post"], x)


# ---------------------------------------------------------------------------
# decoder (single code path for full / prefill / step)
# ---------------------------------------------------------------------------


def init_kv_cache(
    dims: ModelDimensions,
    batch: int,
    compute_dtype: jnp.dtype = jnp.float32,
    ctx: Optional[int] = None,
) -> Params:
    """Preallocated static-shape self-attention cache for all decoder layers.

    `ctx` bounds the cache to the actual decode horizon (prompt bucket +
    sample_len) instead of the full n_text_ctx — the decode-step attention
    reads the whole buffer every step, so a 448-slot cache costs 3.5x the
    HBM traffic of a 128-slot one when only 72 positions are ever written.
    """
    shape = (dims.n_text_layer, batch, ctx or dims.n_text_ctx, dims.n_text_state)
    return {"k": jnp.zeros(shape, compute_dtype), "v": jnp.zeros(shape, compute_dtype)}


def init_kv_cache_i8(
    dims: ModelDimensions,
    batch: int,
    ctx: Optional[int] = None,
) -> Params:
    """int8 self-attention cache with per-(layer, batch, position) fp32 row
    scales — the kv_quant serving mode\'s counterpart to init_kv_cache
    (half the per-step cache traffic; beam gathers also move half the
    bytes). Unwritten slots are masked by position, their scale is inert."""
    ctx = ctx or dims.n_text_ctx
    shape = (dims.n_text_layer, batch, ctx, dims.n_text_state)
    sshape = shape[:-1]
    return {
        "k": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.ones(sshape, jnp.float32),
        "v": jnp.zeros(shape, jnp.int8),
        "v_scale": jnp.ones(sshape, jnp.float32),
    }


def _quant_rows(x: jnp.ndarray):
    """(B, T, D) float -> ((B, T, D) int8, (B, T) fp32) per-row abs-max
    quantization WITHOUT the T padding of ops.decode_attention.quantize_kv_rows
    (cache writes land inside an already-aligned buffer)."""
    # reduce |x| in the source dtype, convert only the (B, T) result — the
    # f32 copy of x then feeds only the round and fuses into one pass
    # (see ops/decode_attention.quantize_kv_rows)
    m = jnp.max(jnp.abs(x), axis=-1).astype(_F32)
    scale = jnp.maximum(m, 1e-20) / 127.0
    return jnp.round(x.astype(_F32) / scale[..., None]).astype(jnp.int8), scale


def precompute_cross_kv(
    params: Params,
    dims: ModelDimensions,
    audio_features: jnp.ndarray,
    quantize: bool = False,
    stack: bool = True,
) -> Params:
    """Cross-attention K/V projected once per audio window (the reference
    computes these lazily inside its hook cache, decoding.py:101-109).

    With quantize=True the K/V are stored int8 with per-(layer, batch,
    position) fp32 row scales — the opt-in serving mode that halves the
    decode step's dominant HBM traffic (ops/decode_attention.py).

    stack=False returns per-layer tuples instead of stacked (L, B, Ta, D)
    arrays. The fused int8 serving programs use this for the PREFILL's float
    K/V: the prefill reads per-layer slices anyway, and skipping the float
    stacking copies removed ~15 ms of dynamic-update-slice traffic per
    B=192 base window (headline HLO profile) — only the int8 store (half
    the bytes) is stacked for the layer-indexed decode kernel."""
    blocks = params["decoder"]["blocks"]
    ks, vs = [], []
    for block in blocks:
        ks.append(linear(block["cross_attn"]["key"], audio_features))
        vs.append(linear(block["cross_attn"]["value"], audio_features))
    if not stack:
        assert not quantize, "quantize_cross_kv stacks; use stack=True"
        return {"k": tuple(ks), "v": tuple(vs)}
    k, v = jnp.stack(ks), jnp.stack(vs)  # (L, B, Ta, D)
    if quantize:
        return quantize_cross_kv({"k": k, "v": v})
    return {"k": k, "v": v}


def quantize_cross_kv(cross_kv: Params) -> Params:
    """Float cross-KV dict -> int8 dict with per-(layer, batch, position)
    fp32 row scales (T padded to the int8 tile; see quantize_kv_rows).

    Kept separate from precompute_cross_kv so fused serving programs can
    hand the PRE-quantization float K/V to the prefill (which reads each
    value once) and the int8 store to the decode loop — dequantizing the
    whole KV back to f32 for the prefill cost 14 ms of convert fusions plus
    2.4 GB of HBM writes per window at B=192 base (headline HLO profile).

    Accepts stacked (L, B, Ta, D) arrays or per-layer tuples
    (precompute_cross_kv stack=False); tuples quantize per layer so only
    the int8 halves are stacked — per-row abs-max scaling is independent
    per (layer, batch, position) row, so the values are bit-identical."""
    from ..ops.decode_attention import quantize_kv_rows

    if isinstance(cross_kv["k"], (tuple, list)):
        kq = [quantize_kv_rows(k) for k in cross_kv["k"]]
        vq = [quantize_kv_rows(v) for v in cross_kv["v"]]
        return {
            "k": jnp.stack([q for q, _ in kq]),
            "k_scale": jnp.stack([s for _, s in kq]),
            "v": jnp.stack([q for q, _ in vq]),
            "v_scale": jnp.stack([s for _, s in vq]),
        }
    ki, ksc = quantize_kv_rows(cross_kv["k"])
    vi, vsc = quantize_kv_rows(cross_kv["v"])
    return {"k": ki, "k_scale": ksc, "v": vi, "v_scale": vsc}


def _dequant_cross_layer(cross_kv: Params, li: int, dtype, valid_len: int) -> tuple:
    """Per-layer K/V in float for the einsum fallback and split-program
    prefill paths — same rounded values the int8 kernel consumes. The fused
    serving programs skip this (their prefill reads the pre-quantization
    float K/V directly — see quantize_cross_kv). The int8 store pads T to a
    multiple of 128 (quantize_kv_rows); slice it back."""
    if "k_scale" in cross_kv:
        k = (cross_kv["k"][li].astype(_F32) * cross_kv["k_scale"][li][..., None]).astype(dtype)
        v = (cross_kv["v"][li].astype(_F32) * cross_kv["v_scale"][li][..., None]).astype(dtype)
        return k[:, :valid_len], v[:, :valid_len]
    return cross_kv["k"][li], cross_kv["v"][li]


def decoder_apply(
    params: Params,
    dims: ModelDimensions,
    tokens: jnp.ndarray,  # (B, T) int32
    audio_features: Optional[jnp.ndarray] = None,  # (B, Ta, D); None if cross_kv given
    *,
    kv_cache: Optional[Params] = None,
    cross_kv: Optional[Params] = None,
    pos_offset: Any = 0,  # scalar (traced ok): absolute position of tokens[:, 0]
    compute_dtype: jnp.dtype = jnp.float32,
    return_cross_qk: bool = False,
    cross_qk_pairs: Optional[Tuple[Tuple[int, int], ...]] = None,
    logits_slice: Optional[int] = None,  # keep only the last N positions' logits
    logits_dtype: Optional[jnp.dtype] = None,  # None = fp32 (default contract)
    return_hidden: bool = False,  # skip the vocab projection, return (B,T,D)
) -> Tuple[jnp.ndarray, Optional[Params], Optional[jnp.ndarray]]:
    """Run the text decoder over `tokens`.

    Modes:
      * kv_cache=None: teacher-forced full forward (training / eval), causal
        mask within the T tokens.
      * kv_cache given: K/V for these T positions are written into the cache
        at [pos_offset, pos_offset+T) and attention runs over the cache with
        mask `key_pos <= query_pos` — covers both prompt prefill (T>1) and
        incremental decode (T=1) without retracing.

    Returns (logits fp32, updated kv_cache or None, cross_qk or None).
    cross_qk: (L, B, n_head, T, Ta) fp32 pre-softmax attention logits for the
    word-timestamp DTW path (replaces the reference's forward hooks,
    timing.py:185-192). With `cross_qk_pairs` — a static tuple of
    (layer, head) alignment pairs — only those heads' rows are captured and
    the return is (n_pairs, B, T, Ta) in pair order instead: the full
    all-layer/all-head stack is L*H/n_pairs larger (14.7 GB fp32 at 320
    base windows vs 2.0 GB for its 8 alignment pairs) and was the
    batched-alignment program's HBM ceiling.
    """
    p = params["decoder"]
    B, T = tokens.shape
    D = dims.n_text_state

    embed = p["token_embedding"]
    x = embed[tokens].astype(compute_dtype)
    pos_emb = jax.lax.dynamic_slice(
        p["positional_embedding"], (pos_offset, 0), (T, D)
    ).astype(compute_dtype)
    x = x + pos_emb

    if cross_kv is None and audio_features is not None:
        cross_kv = precompute_cross_kv(params, dims, audio_features)

    # beam / best-of-N: query rows are audio-major beam groups sharing one
    # cross-KV row each (row b*G+g attends audio b) — the KV is never
    # replicated per beam, cutting cross-attention HBM traffic G-fold.
    # cross_kv["k"] is stacked (L, B, Ta, D) or a per-layer tuple of
    # (B, Ta, D) (precompute_cross_kv stack=False, prefill-only).
    cross_b = (
        cross_kv["k"][0].shape[0]
        if isinstance(cross_kv["k"], (tuple, list))
        else cross_kv["k"].shape[1]
    )
    kv_group = B // cross_b
    assert B == kv_group * cross_b, (
        f"token batch {B} not a multiple of cross-KV batch {cross_b}"
    )
    assert not (return_cross_qk and kv_group > 1), "cross-QK capture needs group=1"

    # additive causal mask
    neg = jnp.asarray(-1e9, _F32)
    if kv_cache is None:
        mask = jnp.where(np.triu(np.ones((T, T), bool), 1), neg, 0.0)[None, None]
        kv_len = None
    else:
        q_pos = pos_offset + jnp.arange(T)  # (T,)
        kv_len = kv_cache["k"].shape[2]
        key_pos = jnp.arange(kv_len)  # (Tk,)
        mask = jnp.where(key_pos[None, :] > q_pos[:, None], neg, 0.0)[None, None]

    # cache buffers are updated in place along the layer axis — the carried
    # (L, B, T, D) arrays stay whole, so XLA can alias them across
    # while_loop iterations instead of re-materializing a stacked copy
    # every decode step
    cache_k = kv_cache["k"] if kv_cache is not None else None
    cache_v = kv_cache["v"] if kv_cache is not None else None
    self_quant = kv_cache is not None and "k_scale" in kv_cache
    cache_ks = kv_cache["k_scale"] if self_quant else None
    cache_vs = kv_cache["v_scale"] if self_quant else None

    # single-token incremental step -> fused Pallas decode attention (streams
    # the bf16 caches once; see ops/decode_attention.py for the HLO-profile
    # rationale)
    use_dk, dk_interpret = _decode_kernel_state()
    fast_step = use_dk and T == 1 and kv_cache is not None and not return_cross_qk
    kv_quantized = cross_kv is not None and "k_scale" in cross_kv
    # the int8 kernel needs a tiling-legal (b_blk, tk_blk) geometry
    # (ops/decode_attention._i8_blocks); unsupported shapes dequantize into
    # the einsum path instead of asserting inside the kernel
    i8_cross_ok = i8_self_ok = False
    if fast_step and (kv_quantized or self_quant):
        from ..ops.decode_attention import decode_attention_i8, i8_supported

        if kv_quantized:
            i8_cross_ok = i8_supported(
                cross_kv["k"].shape[1], cross_kv["k"].shape[2], D
            )
        if self_quant:
            i8_self_ok = i8_supported(B, kv_cache["k"].shape[2], D)
    if fast_step:
        from ..ops.decode_attention import decode_attention

    d_head_scale = float((dims.n_text_state // dims.n_text_head) ** -0.5)

    cross_qks = []
    for li, block in enumerate(p["blocks"]):
        # --- causal self-attention ---
        res = x
        h = layer_norm(block["attn_ln"], x)
        q, k, v = _mha_project_qkv(block["attn"], h)
        if self_quant:
            ki, ksc = _quant_rows(k)
            vi, vsc = _quant_rows(v)
            cache_k = jax.lax.dynamic_update_slice(cache_k, ki[None], (li, 0, pos_offset, 0))
            cache_ks = jax.lax.dynamic_update_slice(cache_ks, ksc[None], (li, 0, pos_offset))
            cache_v = jax.lax.dynamic_update_slice(cache_v, vi[None], (li, 0, pos_offset, 0))
            cache_vs = jax.lax.dynamic_update_slice(cache_vs, vsc[None], (li, 0, pos_offset))
        elif kv_cache is not None:
            cache_k = jax.lax.dynamic_update_slice(cache_k, k[None], (li, 0, pos_offset, 0))
            cache_v = jax.lax.dynamic_update_slice(cache_v, v[None], (li, 0, pos_offset, 0))
        if fast_step and self_quant and i8_self_ok:
            att = decode_attention_i8(
                q, cache_k, cache_ks, cache_v, cache_vs, li, dims.n_text_head,
                scale=d_head_scale, valid_upto=pos_offset, interpret=dk_interpret,
            )
        elif fast_step and not self_quant:
            att = decode_attention(
                q, cache_k, cache_v, li, dims.n_text_head,
                scale=d_head_scale, valid_upto=pos_offset, interpret=dk_interpret,
            )
        else:
            if self_quant:
                # prefill reads the same rounded values the step kernel sees
                k = (cache_k[li].astype(_F32) * cache_ks[li][..., None]).astype(compute_dtype)
                v = (cache_v[li].astype(_F32) * cache_vs[li][..., None]).astype(compute_dtype)
            elif kv_cache is not None:
                k, v = cache_k[li], cache_v[li]
            att, _ = qkv_attention(
                q, k, v, dims.n_text_head, mask=mask, causal=True, q_offset=pos_offset
            )
        x = res + linear(block["attn"]["out"], att)

        # --- cross-attention ---
        res = x
        h = layer_norm(block["cross_attn_ln"], x)
        qc = linear(block["cross_attn"]["query"], h)
        if fast_step and kv_quantized and i8_cross_ok:
            # the int8 store pads T to the tile; mask the padded tail
            att, qk = decode_attention_i8(
                qc, cross_kv["k"], cross_kv["k_scale"],
                cross_kv["v"], cross_kv["v_scale"], li, dims.n_text_head,
                scale=d_head_scale, valid_upto=dims.n_audio_ctx - 1,
                group=kv_group, interpret=dk_interpret,
            ), None
        elif fast_step and not kv_quantized:
            att, qk = decode_attention(
                qc, cross_kv["k"], cross_kv["v"], li, dims.n_text_head,
                scale=d_head_scale, group=kv_group, interpret=dk_interpret,
            ), None
        elif kv_group > 1:
            # fold the beam axis into query positions (cross-attention has
            # no mask, so query rows are independent)
            ck, cv = _dequant_cross_layer(cross_kv, li, compute_dtype, dims.n_audio_ctx)
            qg = qc.reshape(B // kv_group, kv_group * T, D)
            att, qk = qkv_attention(qg, ck, cv, dims.n_text_head)
            att = att.reshape(B, T, D)
        else:
            ck, cv = _dequant_cross_layer(cross_kv, li, compute_dtype, dims.n_audio_ctx)
            att, qk = qkv_attention(
                qc, ck, cv, dims.n_text_head, return_qk=return_cross_qk,
            )
        if return_cross_qk:
            if cross_qk_pairs is not None:
                sel = [h for (l, h) in cross_qk_pairs if l == li]
                if sel:  # layers with no alignment head contribute nothing
                    cross_qks.append(qk[:, np.asarray(sel, np.int32)])
            else:
                cross_qks.append(qk)
        x = res + linear(block["cross_attn"]["out"], att)

        # --- mlp ---
        res = x
        h = layer_norm(block["mlp_ln"], x)
        h = _gelu(linear(block["mlp"]["fc1"], h))
        x = res + linear(block["mlp"]["fc2"], h)

    x = layer_norm(p["ln"], x)
    if logits_slice is not None:
        x = x[:, -logits_slice:]
    if return_hidden:
        # training's chunked cross-entropy (ops/chunked_xent.py) applies the
        # tied-embedding projection itself, per row-chunk, so the full
        # (B, T, n_vocab) logits tensor is never materialized
        logits = x
    else:
        logits = jnp.matmul(
            x, embed.T.astype(x.dtype), preferred_element_type=_F32
        )  # tied embeddings (reference model.py:245-247)
    if not return_hidden and logits_dtype is not None:
        # serving decode loops store the per-step (B, V) logits in the
        # compute dtype (f32 accumulation, rounded store): at B=192 base the
        # fp32 logit tensors were ~24 ms/window of pure HBM traffic across
        # the 64-step loop; downstream reductions upcast in-fusion
        logits = logits.astype(logits_dtype)

    if self_quant:
        updated_cache = {
            "k": cache_k, "k_scale": cache_ks, "v": cache_v, "v_scale": cache_vs,
        }
    elif kv_cache is not None:
        updated_cache = {"k": cache_k, "v": cache_v}
    else:
        updated_cache = None
    if not return_cross_qk:
        cross_qk = None
    elif cross_qk_pairs is not None:
        # (B, n_pairs, T, Ta) -> pair-major, ordered like cross_qk_pairs
        # (layer-major within the per-layer loop, head order within a layer
        # preserved — matches np.argwhere's row-major pair ordering)
        cross_qk = jnp.moveaxis(jnp.concatenate(cross_qks, axis=1), 1, 0)
    else:
        cross_qk = jnp.stack(cross_qks)
    return logits, updated_cache, cross_qk


def model_apply(
    params: Params,
    dims: ModelDimensions,
    mel: jnp.ndarray,
    tokens: jnp.ndarray,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Full teacher-forced forward: mel + tokens -> logits (reference
    model.py:293-296)."""
    audio_features = encoder_apply(params, dims, mel, compute_dtype)
    logits, _, _ = decoder_apply(
        params, dims, tokens, audio_features, compute_dtype=compute_dtype
    )
    return logits


# ---------------------------------------------------------------------------
# initialization / surgery
# ---------------------------------------------------------------------------


def _init_linear(key, n_in, n_out, bias=True):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(n_in)
    p = {"w": jax.random.uniform(k1, (n_in, n_out), _F32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (n_out,), _F32, -bound, bound)
    return p


def _init_ln(n):
    return {"scale": jnp.ones((n,), _F32), "bias": jnp.zeros((n,), _F32)}


def _init_block(key, n_state, cross: bool):
    keys = jax.random.split(key, 8)
    block = {
        "attn": {
            "query": _init_linear(keys[0], n_state, n_state),
            "key": _init_linear(keys[1], n_state, n_state, bias=False),
            "value": _init_linear(keys[2], n_state, n_state),
            "out": _init_linear(keys[3], n_state, n_state),
        },
        "attn_ln": _init_ln(n_state),
        "mlp": {
            "fc1": _init_linear(keys[4], n_state, n_state * 4),
            "fc2": _init_linear(keys[5], n_state * 4, n_state),
        },
        "mlp_ln": _init_ln(n_state),
    }
    if cross:
        block["cross_attn"] = {
            "query": _init_linear(keys[6], n_state, n_state),
            "key": _init_linear(keys[7], n_state, n_state, bias=False),
            "value": _init_linear(jax.random.fold_in(key, 100), n_state, n_state),
            "out": _init_linear(jax.random.fold_in(key, 101), n_state, n_state),
        }
        block["cross_attn_ln"] = _init_ln(n_state)
    return block


def init_params(key: jax.Array, dims: ModelDimensions) -> Params:
    """Random-initialized parameter pytree (torch-comparable fan-in init)."""
    ka, kt = jax.random.split(key)
    a_keys = jax.random.split(ka, dims.n_audio_layer + 4)
    t_keys = jax.random.split(kt, dims.n_text_layer + 4)

    def conv_init(key, n_in, n_out, ksize):
        k1, k2 = jax.random.split(key)
        bound = 1.0 / np.sqrt(n_in * ksize)
        return {
            "w": jax.random.uniform(k1, (n_out, n_in, ksize), _F32, -bound, bound),
            "b": jax.random.uniform(k2, (n_out,), _F32, -bound, bound),
        }

    encoder = {
        "conv1": conv_init(a_keys[0], dims.n_mels, dims.n_audio_state, 3),
        "conv2": conv_init(a_keys[1], dims.n_audio_state, dims.n_audio_state, 3),
        "blocks": [
            _init_block(a_keys[2 + i], dims.n_audio_state, cross=False)
            for i in range(dims.n_audio_layer)
        ],
        "ln_post": _init_ln(dims.n_audio_state),
    }
    decoder = {
        "token_embedding": jax.random.normal(
            t_keys[0], (dims.n_vocab, dims.n_text_state), _F32
        )
        * 0.02,
        "positional_embedding": jax.random.normal(
            t_keys[1], (dims.n_text_ctx, dims.n_text_state), _F32
        )
        * 0.01,
        "blocks": [
            _init_block(t_keys[2 + i], dims.n_text_state, cross=True)
            for i in range(dims.n_text_layer)
        ],
        "ln": _init_ln(dims.n_text_state),
    }
    return {"encoder": encoder, "decoder": decoder}


def resize_token_embeddings(
    params: Params, dims: ModelDimensions, new_vocab_size: int, key: jax.Array
) -> Tuple[Params, ModelDimensions]:
    """Grow the (tied) token embedding to fit spliced disease tokens.

    New rows ~ N(0, std(existing rows)) — matching the *live* (second)
    definition in the reference (model.py:346-378; the first at :299 is dead
    code shadowed by it).
    """
    old = params["decoder"]["token_embedding"]
    cur = old.shape[0]
    if new_vocab_size == cur:
        return params, dims
    assert new_vocab_size > cur
    std = jnp.std(old)
    new_rows = jax.random.normal(key, (new_vocab_size - cur, old.shape[1]), _F32) * std
    new_embed = jnp.concatenate([old, new_rows], axis=0)
    params = dict(params)
    params["decoder"] = dict(params["decoder"])
    params["decoder"]["token_embedding"] = new_embed
    return params, dims.replace(n_vocab=new_vocab_size)


def default_alignment_heads(dims: ModelDimensions) -> np.ndarray:
    """Bool (n_text_layer, n_text_head): last half of decoder layers
    (reference model.py:270-276)."""
    heads = np.zeros((dims.n_text_layer, dims.n_text_head), dtype=bool)
    heads[dims.n_text_layer // 2 :] = True
    return heads


def decode_alignment_heads_dump(dims: ModelDimensions, dump: bytes) -> np.ndarray:
    """Decode the base85/gzip alignment-head masks shipped with checkpoints
    (reference model.py:278-285)."""
    import base64 as b64
    import gzip

    array = np.frombuffer(gzip.decompress(b64.b85decode(dump)), dtype=bool).copy()
    return array.reshape(dims.n_text_layer, dims.n_text_head)
