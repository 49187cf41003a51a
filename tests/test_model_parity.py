"""Numerical parity of the jax model against the reference torch model.

A small random-weight reference Whisper is instantiated (torch, CPU), its
state dict converted into our pytree, and encoder features / teacher-forced
logits / KV-cached incremental logits are compared in fp32.
"""

import numpy as np
import pytest

from conftest import import_reference_whisper, reference_available

import jax
import jax.numpy as jnp

from asr_ttl_mtl_tpu.models.dims import ModelDimensions
from asr_ttl_mtl_tpu.models import whisper as W
from asr_ttl_mtl_tpu.models.registry import convert_torch_state_dict, export_torch_state_dict

SMALL = ModelDimensions(
    n_mels=80,
    n_audio_ctx=96,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=1000,
    n_text_ctx=48,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def torch_ref():
    if not reference_available():
        pytest.skip("reference not mounted")
    import_reference_whisper()
    import torch
    from whisper.model import ModelDimensions as RefDims, Whisper as RefWhisper

    torch.manual_seed(0)
    model = RefWhisper(RefDims(**SMALL.__dict__)).eval()
    # positional_embedding is torch.empty in the reference; initialize it
    with torch.no_grad():
        model.decoder.positional_embedding.normal_(0, 0.02)
    return model


@pytest.fixture(scope="module")
def params(torch_ref):
    return convert_torch_state_dict(SMALL, torch_ref.state_dict())


def _mel(batch=2, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(batch, SMALL.n_mels, SMALL.n_audio_ctx * 2).astype(np.float32)


def _tokens(batch=2, t=7, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randint(0, SMALL.n_vocab, size=(batch, t)).astype(np.int32)


def test_encoder_parity(torch_ref, params):
    import torch

    mel = _mel()
    with torch.no_grad():
        ref = torch_ref.encoder(torch.from_numpy(mel)).numpy()
    ours = np.asarray(W.encoder_apply(params, SMALL, jnp.asarray(mel)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_decoder_teacher_forced_parity(torch_ref, params):
    import torch

    mel, toks = _mel(), _tokens()
    with torch.no_grad():
        feats = torch_ref.encoder(torch.from_numpy(mel))
        ref = torch_ref.decoder(torch.from_numpy(toks.astype(np.int64)), feats).numpy()
    feats_j = W.encoder_apply(params, SMALL, jnp.asarray(mel))
    ours, _, _ = W.decoder_apply(params, SMALL, jnp.asarray(toks), feats_j)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)


def test_kv_cached_decode_matches_full_forward(params):
    """prefill + per-token steps must reproduce the uncached forward."""
    mel, toks = _mel(1), _tokens(1, 10, seed=3)
    feats = W.encoder_apply(params, SMALL, jnp.asarray(mel))
    full, _, _ = W.decoder_apply(params, SMALL, jnp.asarray(toks), feats)

    cross_kv = W.precompute_cross_kv(params, SMALL, feats)
    cache = W.init_kv_cache(SMALL, batch=1)
    prefix_len = 4
    logits_pre, cache, _ = W.decoder_apply(
        params, SMALL, jnp.asarray(toks[:, :prefix_len]), cross_kv=cross_kv,
        kv_cache=cache, pos_offset=0,
    )
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(full[:, :prefix_len]), atol=2e-4, rtol=1e-3
    )
    for pos in range(prefix_len, toks.shape[1]):
        step_logits, cache, _ = W.decoder_apply(
            params, SMALL, jnp.asarray(toks[:, pos : pos + 1]), cross_kv=cross_kv,
            kv_cache=cache, pos_offset=pos,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full[:, pos]), atol=2e-4, rtol=1e-3
        )


def test_prefill_with_right_padding_is_safe(params):
    """Junk right-padding in the prefill bucket must not affect later steps
    once those slots are overwritten by generated tokens."""
    mel = _mel(1)
    feats = W.encoder_apply(params, SMALL, jnp.asarray(mel))
    cross_kv = W.precompute_cross_kv(params, SMALL, feats)
    toks = _tokens(1, 6, seed=5)
    valid = 3

    # ground truth: clean prefill of exactly `valid` tokens
    cache_a = W.init_kv_cache(SMALL, batch=1)
    la, cache_a, _ = W.decoder_apply(
        params, SMALL, jnp.asarray(toks[:, :valid]), cross_kv=cross_kv,
        kv_cache=cache_a, pos_offset=0,
    )
    # padded prefill: 3 junk tokens after the valid ones
    padded = np.concatenate([toks[:, :valid], np.full((1, 3), 999, np.int32)], axis=1)
    cache_b = W.init_kv_cache(SMALL, batch=1)
    lb, cache_b, _ = W.decoder_apply(
        params, SMALL, jnp.asarray(padded), cross_kv=cross_kv,
        kv_cache=cache_b, pos_offset=0,
    )
    np.testing.assert_allclose(
        np.asarray(lb[:, :valid]), np.asarray(la), atol=1e-4, rtol=1e-3
    )

    # continue generation from position `valid` on both caches; junk slots in
    # cache_b are overwritten before they can be attended
    next_tok = jnp.asarray([[7]], jnp.int32)
    outs = []
    for cache in (cache_a, cache_b):
        l1, cache, _ = W.decoder_apply(
            params, SMALL, next_tok, cross_kv=cross_kv, kv_cache=cache, pos_offset=valid
        )
        l2, cache, _ = W.decoder_apply(
            params, SMALL, next_tok + 1, cross_kv=cross_kv, kv_cache=cache,
            pos_offset=valid + 1,
        )
        outs.append((np.asarray(l1), np.asarray(l2)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)


def test_state_dict_export_roundtrip(torch_ref, params):
    sd = export_torch_state_dict(params, SMALL)
    ref_sd = torch_ref.state_dict()
    for k, v in sd.items():
        # sinusoid buffer computed in float64 here vs float32 in torch
        atol = 1e-5 if k == "encoder.positional_embedding" else 1e-6
        np.testing.assert_allclose(v.numpy(), ref_sd[k].numpy(), atol=atol, err_msg=k)


def test_resize_token_embeddings():
    key = jax.random.PRNGKey(0)
    params = W.init_params(key, SMALL)
    old_embed = params["decoder"]["token_embedding"]
    new_params, new_dims = W.resize_token_embeddings(params, SMALL, 1010, key)
    assert new_dims.n_vocab == 1010
    new_embed = new_params["decoder"]["token_embedding"]
    assert new_embed.shape == (1010, SMALL.n_text_state)
    np.testing.assert_array_equal(np.asarray(new_embed[:1000]), np.asarray(old_embed))
    # new rows drawn with the existing std (reference model.py:346-378)
    new_std = float(jnp.std(new_embed[1000:]))
    assert 0.3 * float(jnp.std(old_embed)) < new_std < 3.0 * float(jnp.std(old_embed))


def test_alignment_heads_default():
    heads = W.default_alignment_heads(SMALL)
    assert heads.shape == (2, 4)
    assert not heads[0].any() and heads[1].all()


def test_bf16_tanh_gelu_matches_fp32_erf_encoder():
    """The half-precision path switches GELU to the tanh approximation
    (models/whisper.py:_gelu); its ~3e-3 error must stay inside the bf16
    rounding noise of the fp32 erf encoder, i.e. not change the existing
    bf16-vs-fp32 tolerance envelope."""
    key = jax.random.PRNGKey(1)
    params = W.init_params(key, SMALL)
    mel = np.random.RandomState(0).randn(2, SMALL.n_mels, 2 * SMALL.n_audio_ctx)
    mel = jnp.asarray(mel.astype(np.float32) * 0.3)
    ref = np.asarray(W.encoder_apply(params, SMALL, mel, jnp.float32))
    got = np.asarray(
        W.encoder_apply(params, SMALL, mel.astype(jnp.bfloat16), jnp.bfloat16)
    ).astype(np.float32)
    # bf16 envelope: feature values are O(1) post-LN; 2^-8 resolution
    # compounds over 2 layers — 0.15 abs is the measured bf16-only bound
    assert np.max(np.abs(ref - got)) < 0.2
    assert np.mean(np.abs(ref - got)) < 0.02
