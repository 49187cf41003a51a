"""Randomized differential fuzz over the decode-option space vs the
reference (`whisper/decoding.py:80-114` option surface).

Every deterministic option combination must produce identical tokens/text:
temperature is pinned to 0 (sampling RNGs can't match across frameworks),
everything else — task, timestamp rules, beam/patience, prefix/prompt,
suppression sets, length penalty, max_initial_timestamp — is drawn from a
seeded RNG. A failure prints the full option dict for replay.
"""

import random

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
    n_vocab=51865,
    n_text_ctx=96,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)

import os

N_CONFIGS = int(os.environ.get("FUZZ_N", "24"))  # seeded; FUZZ_N=200 for a deep sweep


@pytest.fixture(scope="module")
def models():
    import torch
    from whisper.model import ModelDimensions as RefDims, Whisper as RefWhisper

    torch.manual_seed(7)
    ref = RefWhisper(RefDims(**DIMS.__dict__)).eval()
    with torch.no_grad():
        ref.decoder.positional_embedding.normal_(0, 0.02)
    params = convert_torch_state_dict(DIMS, ref.state_dict())
    ours = WhisperModel(dims=DIMS, params=params, compute_dtype=jnp.float32)
    return ref, ours


def _draw_options(rng: random.Random) -> dict:
    opts = dict(
        language=rng.choice(["en", "de", "ja"]),
        task=rng.choice(["transcribe", "transcribe", "translate"]),
        temperature=0.0,
        sample_len=rng.choice([6, 10, 14]),
        without_timestamps=rng.random() < 0.5,
        suppress_blank=rng.random() < 0.7,
        suppress_tokens=rng.choice([None, "-1", [], [220, 50256], "-1,11,13"]),
        fp16=False,
    )
    if rng.random() < 0.4:
        opts["beam_size"] = rng.choice([2, 3, 4])
        if rng.random() < 0.5:
            opts["patience"] = rng.choice([1.0, 1.5, 2.0])
        if rng.random() < 0.5:
            opts["length_penalty"] = rng.choice([0.6, 1.0])
    if rng.random() < 0.3:
        opts["prefix"] = rng.choice(["hello", "so then we", "42"])
    if rng.random() < 0.3:
        opts["prompt"] = rng.choice(["Earlier sentence.", "context words here"])
    if not opts["without_timestamps"] and rng.random() < 0.4:
        opts["max_initial_timestamp"] = rng.choice([0.2, 0.5, 1.0])
    return opts


def test_fuzz_option_combinations(models):
    import torch
    from whisper.decoding import DecodingOptions as RefOptions, decode as ref_decode

    ref_model, our_model = models
    rng = random.Random(0xA5)
    np_rng = np.random.RandomState(0x5A)
    for trial in range(N_CONFIGS):
        opts = _draw_options(rng)
        mel = (np_rng.randn(2, DIMS.n_mels, DIMS.n_audio_ctx * 2) * 0.5).astype(
            np.float32
        )
        with torch.no_grad():
            if opts.get("beam_size"):
                # vendored-reference defect (this fuzz found it): run()
                # repeats `tokens` by n_group but dropped upstream's
                # audio_features.repeat_interleave, so beam/best-of with
                # n_audio >= 2 crashes there (batch-1 survives only via
                # torch-SDPA batch broadcasting; the audio_features
                # [::n_group] un-repeat at decoding.py:740 is the leftover).
                # Compare our batched beam against per-audio reference calls.
                ref = [
                    ref_decode(
                        ref_model, torch.from_numpy(mel[i : i + 1]),
                        RefOptions(**opts),
                    )[0]
                    for i in range(mel.shape[0])
                ]
            else:
                ref = ref_decode(
                    ref_model, torch.from_numpy(mel), RefOptions(**opts)
                )
        ours = D.decode(our_model, jnp.asarray(mel), D.DecodingOptions(**opts))
        for i, (r, o) in enumerate(zip(ref, ours)):
            ctx = f"trial {trial} audio {i}: {opts!r}"
            assert o.tokens == r.tokens, ctx
            assert o.text == r.text, ctx
            np.testing.assert_allclose(
                o.avg_logprob, r.avg_logprob, atol=2e-3, err_msg=ctx
            )
            np.testing.assert_allclose(
                o.no_speech_prob, r.no_speech_prob, atol=2e-3, err_msg=ctx
            )
