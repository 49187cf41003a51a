"""Parity tests for the fused Pallas W8A8 MLP kernel (ops/int8_mlp.py).

The kernel must match the XLA fallback composition
`linear_i8(fc2, _gelu(linear_i8(fc1, x)))` (models/whisper.py) up to
quantization-boundary noise: identical scale/round semantics, but f32-vs-bf16
expression-order differences can flip a round-half case by one int, i.e. one
activation-scale unit. Reference behavior target: whisper/model.py:147-151.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_ttl_mtl_tpu.models import whisper as W
from asr_ttl_mtl_tpu.ops.int8_mlp import int8_mlp, int8_mlp_supported


def _mlp_params(rng, d, h, dtype=jnp.bfloat16):
    fc1 = {
        "w": jnp.asarray(rng.standard_normal((d, h), dtype=np.float32) * 0.05, dtype),
        "b": jnp.asarray(rng.standard_normal(h, dtype=np.float32) * 0.1, dtype),
    }
    fc2 = {
        "w": jnp.asarray(rng.standard_normal((h, d), dtype=np.float32) * 0.05, dtype),
        "b": jnp.asarray(rng.standard_normal(d, dtype=np.float32) * 0.1, dtype),
    }
    return fc1, fc2


def _run_kernel(x, fc1, fc2):
    w1q, s1 = W._quant_colwise_sym(fc1["w"].astype(jnp.float32))
    w2q, s2 = W._quant_colwise_sym(fc2["w"].astype(jnp.float32))
    return int8_mlp(
        x, w1q, s1, fc1["b"].astype(jnp.float32),
        w2q, s2, fc2["b"].astype(jnp.float32), interpret=True,
    )


@pytest.mark.parametrize("n_tokens", [256, 300, 1024])
def test_interpret_parity_vs_linear_i8_composition(n_tokens):
    rng = np.random.default_rng(0)
    d, h = 256, 1024
    fc1, fc2 = _mlp_params(rng, d, h)
    x = jnp.asarray(
        rng.standard_normal((2, n_tokens // 2, d), dtype=np.float32) * 0.5,
        jnp.bfloat16,
    )
    ref = np.asarray(
        W.linear_i8(fc2, W._gelu(W.linear_i8(fc1, x))), np.float32
    )
    out = np.asarray(_run_kernel(x, fc1, fc2), np.float32)
    assert out.shape == ref.shape
    diff = np.abs(out - ref)
    scale = np.abs(ref).mean() + 1e-6
    # one quantization-step flips allowed; aggregate error must be tiny
    assert diff.max() / scale < 0.12, (diff.max(), scale)
    assert diff.mean() / scale < 0.02
    cos = (out * ref).sum() / (np.linalg.norm(out) * np.linalg.norm(ref))
    assert cos > 0.9995


def test_fp32_compute_dtype():
    rng = np.random.default_rng(1)
    d, h = 128, 512
    fc1, fc2 = _mlp_params(rng, d, h, jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 200, d), dtype=np.float32))
    ref = np.asarray(W.linear_i8(fc2, W._gelu(W.linear_i8(fc1, x))))
    out = np.asarray(_run_kernel(x, fc1, fc2))
    # fp32 compute dtype: no bf16 rounding between stages; the only
    # difference left is f32 expression ordering around round-half cases
    diff = np.abs(out - ref)
    assert diff.max() / (np.abs(ref).mean() + 1e-6) < 0.05


def test_supported_gate():
    # base geometry fits; large-v3 geometry (d=1280) exceeds the VMEM model
    assert int8_mlp_supported(192 * 1536, 512, 2048)
    assert not int8_mlp_supported(192 * 1536, 1280, 5120)
    # unaligned lanes rejected
    assert not int8_mlp_supported(4096, 500, 2000)


def test_encoder_apply_fallback_on_cpu():
    """int8_linears on CPU must take the linear_i8 path (kernel is TPU-gated)
    and agree with itself regardless of the kernel gate plumbing."""
    from asr_ttl_mtl_tpu.models.whisper import ModelDimensions, init_params

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=96, n_audio_state=128, n_audio_head=2,
        n_audio_layer=1, n_vocab=1000, n_text_ctx=64, n_text_state=128,
        n_text_head=2, n_text_layer=1,
    )
    params = init_params(jax.random.PRNGKey(0), dims)
    mel = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 80, 192), np.float32) * 0.3
    )
    out = W.encoder_apply(params, dims, mel, int8_linears=True)
    assert np.isfinite(np.asarray(out, np.float32)).all()
