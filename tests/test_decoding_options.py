"""Differential tests vs the reference for decode-level options not covered
elsewhere: task="translate", prefix, prompt, and task="lang_id"
(reference `whisper/decoding.py:80-114, :606-642, :713-737`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import import_reference_whisper, reference_available

from asr_ttl_mtl_tpu import decoding as D
from asr_ttl_mtl_tpu.models.dims import ModelDimensions
from asr_ttl_mtl_tpu.models.registry import WhisperModel, convert_torch_state_dict

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

import_reference_whisper()

# multilingual vocab so translate/lang_id tasks exist
DIMS = ModelDimensions(
    n_mels=80,
    n_audio_ctx=96,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=51865,
    n_text_ctx=96,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def models():
    import torch
    from whisper.model import ModelDimensions as RefDims, Whisper as RefWhisper

    torch.manual_seed(11)
    ref = RefWhisper(RefDims(**DIMS.__dict__)).eval()
    with torch.no_grad():
        ref.decoder.positional_embedding.normal_(0, 0.02)
    params = convert_torch_state_dict(DIMS, ref.state_dict())
    ours = WhisperModel(dims=DIMS, params=params, compute_dtype=jnp.float32)
    return ref, ours


def _mel(batch=2, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(batch, DIMS.n_mels, DIMS.n_audio_ctx * 2) * 0.5).astype(np.float32)


def _run_both(models, mel, **opts):
    import torch
    from whisper.decoding import DecodingOptions as RefOptions, decode as ref_decode

    ref_model, our_model = models
    with torch.no_grad():
        ref = ref_decode(ref_model, torch.from_numpy(mel), RefOptions(fp16=False, **opts))
    ours = D.decode(our_model, jnp.asarray(mel), D.DecodingOptions(fp16=False, **opts))
    return ref, ours


COMMON = dict(language="en", without_timestamps=True, sample_len=10, suppress_tokens=None)


def test_translate_task_parity(models):
    ref, ours = _run_both(models, _mel(seed=1), task="translate", **COMMON)
    for r, o in zip(ref, ours):
        assert o.tokens == r.tokens
        assert o.text == r.text
        np.testing.assert_allclose(o.avg_logprob, r.avg_logprob, atol=1e-3)


def test_prefix_parity(models):
    ref, ours = _run_both(models, _mel(seed=2), prefix="hello there", **COMMON)
    for r, o in zip(ref, ours):
        assert o.tokens == r.tokens
        assert o.text == r.text


def test_prompt_parity(models):
    ref, ours = _run_both(
        models, _mel(seed=3), prompt="Some earlier context sentence.", **COMMON
    )
    for r, o in zip(ref, ours):
        assert o.tokens == r.tokens


def test_prompt_and_prefix_together(models):
    ref, ours = _run_both(
        models, _mel(seed=4), prompt="Earlier words.", prefix="and now", **COMMON
    )
    for r, o in zip(ref, ours):
        assert o.tokens == r.tokens


def test_lang_id_task(models):
    """task="lang_id": language probabilities match the reference's
    detect_language, and no tokens are sampled."""
    import torch
    from whisper.decoding import detect_language as ref_detect

    ref_model, our_model = models
    mel = _mel(batch=2, seed=5)
    with torch.no_grad():
        _, ref_probs = ref_detect(ref_model, torch.from_numpy(mel))
    ours = D.decode(
        our_model, jnp.asarray(mel), D.DecodingOptions(task="lang_id", fp16=False)
    )
    for r_probs, o in zip(ref_probs, ours):
        assert o.tokens == []
        assert o.language_probs is not None
        assert max(o.language_probs, key=o.language_probs.get) == max(
            r_probs, key=r_probs.get
        )
        for code in ("en", "de", "ja"):
            np.testing.assert_allclose(
                o.language_probs[code], r_probs[code], atol=1e-4
            )
        assert o.audio_features is not None


def test_decode_from_audio_features(models):
    """decode() accepts precomputed encoder features instead of a mel
    (reference decoding.py:644-664) — same result either way."""
    import torch

    ref_model, our_model = models
    mel = _mel(batch=2, seed=6)
    from_mel = D.decode(
        our_model, jnp.asarray(mel),
        D.DecodingOptions(fp16=False, return_audio_features=True, **COMMON),
    )
    feats = np.stack([r.audio_features for r in from_mel])
    assert feats.shape == (2, DIMS.n_audio_ctx, DIMS.n_audio_state)
    from_feats = D.decode(
        our_model, jnp.asarray(feats), D.DecodingOptions(fp16=False, **COMMON)
    )
    for a, b in zip(from_mel, from_feats):
        assert a.tokens == b.tokens
        np.testing.assert_allclose(a.avg_logprob, b.avg_logprob, atol=1e-4)

    # and the features match the reference encoder
    with torch.no_grad():
        ref_feats = ref_model.encoder(torch.from_numpy(mel)).numpy()
    np.testing.assert_allclose(feats, ref_feats, atol=1e-3)
