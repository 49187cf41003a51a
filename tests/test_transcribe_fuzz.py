"""Randomized differential fuzz over the long-form transcribe() option space
vs the reference (`whisper/transcribe.py:38-514`).

Composes pipeline options the per-feature tests exercise one at a time:
quality-gate thresholds, prompt conditioning, clip windows, timestamp
segmentation, word timestamps (+ punctuation sets), hallucination-silence,
and per-window beam search. temperature is pinned to 0 so both frameworks
are deterministic; gate thresholds are drawn aggressively so failed-state
paths (logprob/compression gates) are actually taken.
"""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import import_reference_whisper, reference_available

from asr_ttl_mtl_tpu.models.dims import PRESET_DIMS
from asr_ttl_mtl_tpu.models.registry import WhisperModel, convert_torch_state_dict
from asr_ttl_mtl_tpu.transcribe import transcribe

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

import_reference_whisper()

import os

N_CONFIGS = int(os.environ.get("FUZZ_N", "10"))  # seeded; FUZZ_N=50 for a deep sweep


@pytest.fixture(scope="module")
def models():
    import torch
    from whisper.model import ModelDimensions as RefDims, Whisper as RefWhisper

    dims = PRESET_DIMS["tiny.en"].replace(n_audio_layer=2, n_text_layer=2)
    torch.manual_seed(5)
    ref = RefWhisper(RefDims(**dims.__dict__)).eval()
    with torch.no_grad():
        ref.decoder.positional_embedding.normal_(0, 0.02)
    params = convert_torch_state_dict(dims, ref.state_dict())
    ours = WhisperModel(dims=dims, params=params, compute_dtype=jnp.float32)
    return ref, ours


def _draw_options(rng: random.Random) -> dict:
    opts = dict(
        temperature=0.0,
        fp16=False,
        verbose=None,
        sample_len=rng.choice([8, 12]),
        without_timestamps=rng.random() < 0.5,
        condition_on_previous_text=rng.random() < 0.6,
        no_speech_threshold=rng.choice([None, 0.3, 0.6]),
        logprob_threshold=rng.choice([None, -1.0, -0.2]),
        compression_ratio_threshold=rng.choice([None, 2.4, 1.2]),
    )
    if rng.random() < 0.4:
        opts["initial_prompt"] = "Notes from earlier."
        opts["carry_initial_prompt"] = rng.random() < 0.5
    if rng.random() < 0.3:
        opts["clip_timestamps"] = rng.choice(["0.5", "0.2,1.6", [0.0, 1.0, 1.2]])
    if rng.random() < 0.4:
        opts["word_timestamps"] = True
        opts["without_timestamps"] = False
        if rng.random() < 0.5:
            opts["prepend_punctuations"] = "\"'“¿([{-"
            opts["append_punctuations"] = "\"'.。,!?::”)]}、"
        if rng.random() < 0.4:
            opts["hallucination_silence_threshold"] = rng.choice([0.3, 1.0])
    if rng.random() < 0.3:
        opts["beam_size"] = 2  # per-window n_audio=1: safe in the reference
    return opts


def _draw_audio(np_rng: np.random.RandomState) -> np.ndarray:
    """2-4 s of noise with an occasional near-silent gap (no-speech paths)."""
    n = int(np_rng.uniform(2.0, 4.0) * 16000)
    audio = (np_rng.randn(n) * 0.1).astype(np.float32)
    if np_rng.rand() < 0.5:
        g0 = np_rng.randint(0, max(1, n - 8000))
        audio[g0 : g0 + 8000] *= 0.001
    return audio


def test_fuzz_transcribe_options(models):
    ref_model, our_model = models
    rng = random.Random(0xBEEF)
    np_rng = np.random.RandomState(0xFEED)
    for trial in range(N_CONFIGS):
        opts = _draw_options(rng)
        audio = _draw_audio(np_rng)
        ref = ref_model.transcribe(audio, **opts)
        ours = transcribe(our_model, audio, **opts)
        ctx = f"trial {trial}: {opts!r}"
        assert ours["text"] == ref["text"], ctx
        assert len(ours["segments"]) == len(ref["segments"]), ctx
        for so, sr in zip(ours["segments"], ref["segments"]):
            assert so["tokens"] == sr["tokens"], ctx
            np.testing.assert_allclose(so["start"], sr["start"], atol=1e-6, err_msg=ctx)
            np.testing.assert_allclose(so["end"], sr["end"], atol=1e-6, err_msg=ctx)
            if opts.get("word_timestamps"):
                ow = [w["word"] for w in so.get("words", [])]
                rw = [w["word"] for w in sr.get("words", [])]
                assert ow == rw, ctx
                np.testing.assert_allclose(
                    [w["start"] for w in so.get("words", [])],
                    [w["start"] for w in sr.get("words", [])],
                    atol=0.02, err_msg=ctx,
                )
