"""Beam-search parity vs the reference BeamSearchDecoder."""

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

DIMS = ModelDimensions(
    n_mels=80,
    n_audio_ctx=96,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=51864,
    n_text_ctx=96,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def models():
    import torch
    from whisper.model import ModelDimensions as RefDims, Whisper as RefWhisper

    torch.manual_seed(21)
    ref = RefWhisper(RefDims(**DIMS.__dict__)).eval()
    with torch.no_grad():
        ref.decoder.positional_embedding.normal_(0, 0.02)
    params = convert_torch_state_dict(DIMS, ref.state_dict())
    ours = WhisperModel(dims=DIMS, params=params, compute_dtype=jnp.float32)
    return ref, ours


def _mel(batch=1, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(batch, DIMS.n_mels, DIMS.n_audio_ctx * 2) * 0.5).astype(np.float32)


def _ref_decode(ref_model, mel, **opts):
    import torch
    from whisper.decoding import DecodingOptions as RefOpts, decode as ref_decode

    with torch.no_grad():
        return ref_decode(ref_model, torch.from_numpy(mel), RefOpts(fp16=False, **opts))


@pytest.mark.parametrize("beam_size,patience", [(3, None), (5, None), (3, 2.0)])
def test_beam_search_parity(models, beam_size, patience):
    ref_model, our_model = models
    mel = _mel(seed=1)
    opts = dict(language="en", beam_size=beam_size, patience=patience,
                without_timestamps=True, sample_len=24)
    ref = _ref_decode(ref_model, mel[0], **opts)
    ours = D.decode(our_model, mel[0], D.DecodingOptions(fp16=False, **opts))
    assert ours.tokens == ref.tokens
    assert ours.text == ref.text
    np.testing.assert_allclose(ours.avg_logprob, ref.avg_logprob, atol=2e-3)
    np.testing.assert_allclose(ours.no_speech_prob, ref.no_speech_prob, atol=1e-4)


def test_beam_search_with_timestamp_rules(models):
    ref_model, our_model = models
    mel = _mel(seed=2)
    opts = dict(language="en", beam_size=3, sample_len=24)
    ref = _ref_decode(ref_model, mel[0], **opts)
    ours = D.decode(our_model, mel[0], D.DecodingOptions(fp16=False, **opts))
    assert ours.tokens == ref.tokens


def test_beam_search_batched(models):
    """The reference only supports beam search at batch=1 (its hook KV cache
    never replicates audio features per beam group, so n_audio>1 crashes with
    a broadcast error — decoding.py:734 + model.py:124). Ours batches; each
    row must match its own single-audio decode."""
    ref_model, our_model = models
    mel = _mel(batch=2, seed=3)
    opts = dict(language="en", beam_size=3, without_timestamps=True, sample_len=16)

    import torch

    with pytest.raises(RuntimeError):
        _ref_decode(ref_model, mel, **opts)

    ours = D.decode(our_model, mel, D.DecodingOptions(fp16=False, **opts))
    for i in range(2):
        single = D.decode(our_model, mel[i], D.DecodingOptions(fp16=False, **opts))
        assert ours[i].tokens == single.tokens
        ref = _ref_decode(ref_model, mel[i], **opts)
        assert single.tokens == ref.tokens


def test_beam_submit_collect_matches_run(models):
    """The pipelined beam path (DecodingTask.submit -> collect, used by the
    batch-serving dispatch pipeline) must produce exactly what a blocking
    run() produces — same fused program, deferred fetch only."""
    _, our_model = models
    mel = jnp.asarray(_mel(batch=3, seed=7))
    opts = D.DecodingOptions(fp16=False, language="en", beam_size=3,
                             without_timestamps=True, sample_len=16)
    task = D.DecodingTask(our_model, opts)
    pending = task.submit(mel)
    assert pending[0] == "beam"  # really took the pipelined path
    got = task.collect(pending)
    want = task.run(mel)
    for g, w in zip(got, want):
        assert g.tokens == w.tokens
        assert g.text == w.text
        assert g.avg_logprob == pytest.approx(w.avg_logprob)
        assert g.no_speech_prob == pytest.approx(w.no_speech_prob)


def test_beam_search_length_penalty(models):
    ref_model, our_model = models
    mel = _mel(seed=4)
    opts = dict(language="en", beam_size=3, without_timestamps=True,
                sample_len=16, length_penalty=0.6)
    ref = _ref_decode(ref_model, mel[0], **opts)
    ours = D.decode(our_model, mel[0], D.DecodingOptions(fp16=False, **opts))
    assert ours.tokens == ref.tokens
