"""Differential tests vs the reference for the less-traveled transcribe()
options: detect_language, clip_timestamps, initial_prompt /
carry_initial_prompt, condition_on_previous_text=False, and the
hallucination-silence path (reference `whisper/transcribe.py:139-505`,
`whisper/decoding.py:18-77`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import import_reference_whisper, reference_available

from asr_ttl_mtl_tpu.models.dims import PRESET_DIMS, ModelDimensions
from asr_ttl_mtl_tpu.models.registry import WhisperModel, convert_torch_state_dict
from asr_ttl_mtl_tpu.transcribe import transcribe

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

import_reference_whisper()


def _make_pair(dims: ModelDimensions, seed: int):
    import torch
    from whisper.model import ModelDimensions as RefDims, Whisper as RefWhisper

    torch.manual_seed(seed)
    ref = RefWhisper(RefDims(**dims.__dict__)).eval()
    with torch.no_grad():
        ref.decoder.positional_embedding.normal_(0, 0.02)
    params = convert_torch_state_dict(dims, ref.state_dict())
    ours = WhisperModel(dims=dims, params=params, compute_dtype=jnp.float32)
    return ref, ours


@pytest.fixture(scope="module")
def en_models():
    dims = PRESET_DIMS["tiny.en"].replace(n_audio_layer=2, n_text_layer=2)
    return _make_pair(dims, seed=3)


@pytest.fixture(scope="module")
def multi_models():
    dims = PRESET_DIMS["tiny"].replace(n_audio_layer=2, n_text_layer=2)
    return _make_pair(dims, seed=5)


@pytest.fixture(scope="module")
def long_wave():
    """~40 s: noise bursts separated by silence, so the seek loop takes
    multiple windows and the no-speech/hallucination paths see real silence."""
    rng = np.random.RandomState(29)
    sr = 16000
    wave = np.zeros(40 * sr, dtype=np.float32)
    for start_s in (0.5, 9.0, 22.0, 33.0):
        seg = slice(int(start_s * sr), int((start_s + 4.0) * sr))
        wave[seg] = (rng.randn(seg.stop - seg.start) * 0.1).astype(np.float32)
    return wave


def _assert_same_result(ours, ref):
    assert ours["text"] == ref["text"]
    assert ours["language"] == ref["language"]
    assert len(ours["segments"]) == len(ref["segments"])
    for so, sr in zip(ours["segments"], ref["segments"]):
        assert so["tokens"] == sr["tokens"]
        assert so["start"] == sr["start"] and so["end"] == sr["end"]
        assert so["seek"] == sr["seek"]


COMMON = dict(
    without_timestamps=True,
    sample_len=10,
    temperature=0.0,
    fp16=False,
    verbose=None,
)


def test_detect_language_parity(multi_models):
    """`detect_language` vs reference `whisper/decoding.py:18-77`: same argmax
    token and matching per-language probabilities."""
    import torch
    from whisper.audio import log_mel_spectrogram as ref_mel, pad_or_trim as ref_pad
    from whisper.decoding import detect_language as ref_detect

    from asr_ttl_mtl_tpu.audio import log_mel_spectrogram, pad_or_trim
    from asr_ttl_mtl_tpu.decoding import detect_language

    ref_model, our_model = multi_models
    rng = np.random.RandomState(17)
    wave = (rng.randn(2 * 16000) * 0.1).astype(np.float32)

    mel_r = ref_pad(ref_mel(torch.from_numpy(wave)), 3000)
    tok_r, probs_r = ref_detect(ref_model, mel_r)

    mel_o = pad_or_trim(np.asarray(log_mel_spectrogram(wave)), 3000, axis=-1)
    tok_o, probs_o = detect_language(our_model, jnp.asarray(mel_o))

    assert int(tok_o) == int(tok_r)
    assert set(probs_o) == set(probs_r)
    for code in probs_r:
        np.testing.assert_allclose(probs_o[code], probs_r[code], atol=1e-4)
    # batched form agrees with single form
    toks_b, probs_b = detect_language(our_model, jnp.asarray(mel_o)[None])
    assert int(toks_b[0]) == int(tok_o)
    assert max(probs_b[0], key=probs_b[0].get) == max(probs_o, key=probs_o.get)


def test_transcribe_auto_language_detection(multi_models):
    """language=None on a multilingual model triggers detection in both."""
    ref_model, our_model = multi_models
    rng = np.random.RandomState(23)
    wave = (rng.randn(2 * 16000) * 0.1).astype(np.float32)
    ref = ref_model.transcribe(wave, **COMMON)
    ours = transcribe(our_model, wave, **COMMON)
    assert ours["language"] == ref["language"]
    assert ours["text"] == ref["text"]


def test_batch_auto_language_detects_per_input(multi_models):
    """batch mode with language=None detects per INPUT FILE on its first
    window (reference transcribe.py:144-156 semantics) — each input's
    detected language and text must equal its own sequential transcribe()."""
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    _, our_model = multi_models
    rng = np.random.RandomState(31)
    waves = [(rng.randn(16000 + 4000 * i) * (0.05 + 0.05 * i)).astype(np.float32)
             for i in range(3)]
    kwargs = dict(without_timestamps=True, sample_len=8, temperature=0.0,
                  fp16=False, no_speech_threshold=None)
    outs = transcribe_batch(our_model, waves, batch_size=3, **kwargs)
    for wave, out in zip(waves, outs):
        seq = transcribe(our_model, wave, verbose=None, **kwargs)
        assert out["language"] == seq["language"]
        assert out["text"] == seq["text"]


def test_batch_auto_language_zero_window_input(multi_models):
    """An input whose clip_timestamps exclude every window still gets a
    detected language in its output dict (the reference detects on the
    file's first 30 s regardless); detection also chunks to batch_size."""
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    _, our_model = multi_models
    rng = np.random.RandomState(41)
    short = (rng.randn(2 * 16000) * 0.1).astype(np.float32)   # 2 s
    longer = (rng.randn(40 * 16000) * 0.1).astype(np.float32)  # 40 s
    kwargs = dict(without_timestamps=True, sample_len=6, temperature=0.0,
                  fp16=False, no_speech_threshold=None)
    # clips start at 35 s: the short file gets ZERO windows
    outs = transcribe_batch(our_model, [short, longer], batch_size=1,
                            clip_timestamps="35", **kwargs)
    assert outs[0]["segments"] == [] and outs[0]["text"] == ""
    assert isinstance(outs[0]["language"], str) and outs[0]["language"]
    # the zero-window input's language equals its own sequential detection
    seq = transcribe(our_model, short, verbose=None, **kwargs)
    assert outs[0]["language"] == seq["language"]
    assert isinstance(outs[1]["language"], str) and outs[1]["language"]


def test_clip_timestamps_parity(en_models, long_wave):
    """clip_timestamps windows restrict the seek loop identically
    (reference transcribe.py:168-177, :272-281)."""
    ref_model, our_model = en_models
    kwargs = dict(COMMON, clip_timestamps="1.0,12.5,20.0,36.0")
    ref = ref_model.transcribe(long_wave, **kwargs)
    ours = transcribe(our_model, long_wave, **kwargs)
    _assert_same_result(ours, ref)
    # open-ended final clip ("from 20 s to end")
    kwargs = dict(COMMON, clip_timestamps="20.0")
    ref = ref_model.transcribe(long_wave, **kwargs)
    ours = transcribe(our_model, long_wave, **kwargs)
    _assert_same_result(ours, ref)


@pytest.mark.parametrize("carry", [False, True])
def test_initial_prompt_parity(en_models, long_wave, carry):
    """initial_prompt tokens prepended (and re-carried when
    carry_initial_prompt=True; reference transcribe.py:288-293, :503-505)."""
    ref_model, our_model = en_models
    kwargs = dict(
        COMMON, initial_prompt="Speaker one: hello there.", carry_initial_prompt=carry
    )
    ref = ref_model.transcribe(long_wave[: 16000 * 35], **kwargs)
    ours = transcribe(our_model, long_wave[: 16000 * 35], **kwargs)
    _assert_same_result(ours, ref)


def test_condition_on_previous_text_off(en_models, long_wave):
    ref_model, our_model = en_models
    kwargs = dict(COMMON, condition_on_previous_text=False)
    ref = ref_model.transcribe(long_wave, **kwargs)
    ours = transcribe(our_model, long_wave, **kwargs)
    _assert_same_result(ours, ref)


def test_hallucination_silence_parity(en_models, long_wave):
    """word_timestamps + hallucination_silence_threshold: the silence-skip
    heuristics (reference transcribe.py:316-476) fire identically."""
    ref_model, our_model = en_models
    kwargs = dict(
        COMMON,
        word_timestamps=True,
        hallucination_silence_threshold=2.0,
        no_speech_threshold=0.9,  # random weights: keep the VAD gate lenient
    )
    ref = ref_model.transcribe(long_wave, **kwargs)
    ours = transcribe(our_model, long_wave, **kwargs)
    assert ours["text"] == ref["text"]
    assert len(ours["segments"]) == len(ref["segments"])
    for so, sr in zip(ours["segments"], ref["segments"]):
        assert so["tokens"] == sr["tokens"]
        np.testing.assert_allclose(so["start"], sr["start"], atol=0.05)
        np.testing.assert_allclose(so["end"], sr["end"], atol=0.05)
        assert len(so.get("words", [])) == len(sr.get("words", []))


def test_temperature_fallback_ladder_parity(en_models, long_wave):
    """Force the quality-fallback ladder (reference transcribe.py:184-224):
    an impossible compression-ratio threshold fails every rung until the
    ladder's sampling temperatures kick in — segment temperatures and
    structure must match the reference (shared greedy t=1.0 argmax... the
    final rung still samples; compare structure + temperature fields)."""
    ref_model, our_model = en_models
    wave = long_wave[: 16000 * 8]
    kwargs = dict(
        without_timestamps=True,
        sample_len=8,
        fp16=False,
        verbose=None,
        temperature=(0.0, 1.0),
        compression_ratio_threshold=-1.0,  # every rung "too repetitive"
        logprob_threshold=None,
        no_speech_threshold=None,
    )
    ref = ref_model.transcribe(wave, **kwargs)
    ours = transcribe(our_model, wave, **kwargs)
    assert len(ours["segments"]) == len(ref["segments"])
    for so, sr in zip(ours["segments"], ref["segments"]):
        assert so["temperature"] == sr["temperature"] == 1.0


def test_logprob_threshold_fallback_parity(en_models, long_wave):
    """logprob_threshold=0 always fails (logprobs are negative), exercising
    the avg_logprob fallback check; with a single temperature the ladder has
    nowhere to go and keeps the t=0 result — exactly like the reference."""
    ref_model, our_model = en_models
    wave = long_wave[: 16000 * 8]
    kwargs = dict(
        without_timestamps=True,
        sample_len=8,
        fp16=False,
        verbose=None,
        temperature=0.0,
        compression_ratio_threshold=2.4,
        logprob_threshold=0.0,
        no_speech_threshold=None,
    )
    ref = ref_model.transcribe(wave, **kwargs)
    ours = transcribe(our_model, wave, **kwargs)
    assert ours["text"] == ref["text"]
    for so, sr in zip(ours["segments"], ref["segments"]):
        assert so["tokens"] == sr["tokens"]
        assert so["temperature"] == sr["temperature"]


def test_no_speech_skip_parity(en_models):
    """A silent clip with a tiny no_speech_threshold: window skipping
    (reference transcribe.py:298-310) must agree on which segments survive."""
    ref_model, our_model = en_models
    silence = np.zeros(16000 * 5, dtype=np.float32)
    kwargs = dict(
        without_timestamps=True,
        sample_len=6,
        fp16=False,
        verbose=None,
        no_speech_threshold=1e-9,  # everything counts as no-speech...
        logprob_threshold=-1e9,    # ...but logprob check overrides the skip
    )
    ref = ref_model.transcribe(silence, **kwargs)
    ours = transcribe(our_model, silence, **kwargs)
    assert len(ours["segments"]) == len(ref["segments"])
    kwargs["logprob_threshold"] = -0.0001  # now the skip fires
    ref = ref_model.transcribe(silence, **kwargs)
    ours = transcribe(our_model, silence, **kwargs)
    assert len(ours["segments"]) == len(ref["segments"])
    assert ours["text"] == ref["text"]


def test_transcribe_batch_disambiguates_beam_and_best_of(en_models):
    """transcribe_batch applies the ladder's beam/best_of rule (t=0 keeps
    beam, drops best_of) instead of failing option validation — the CLI
    passes both defaults like the reference CLI does."""
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    _, our_model = en_models
    rng = np.random.RandomState(31)
    wave = (rng.randn(16000) * 0.1).astype(np.float32)
    outs = transcribe_batch(
        our_model, [wave], batch_size=2, without_timestamps=True, sample_len=6,
        fp16=False, temperature=0.0, beam_size=2, best_of=5, language="en",
    )
    assert len(outs) == 1 and len(outs[0]["segments"]) == 1
    outs = transcribe_batch(
        our_model, [wave], batch_size=2, without_timestamps=True, sample_len=6,
        fp16=False, temperature=0.7, beam_size=2, best_of=2, language="en",
    )
    assert len(outs) == 1


# ---------------------------------------------------------------------------
# batched throughput path: ladder / silence / prompt / clips / word timestamps
# (VERDICT round-1 items 2-3; reference transcribe.py:184-224, :288-293,
# :168-177, timing.py:163-242)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def batch_model(en_models):
    """tiny.en random-weight model with cross-attention boosted 25x so the
    audio content actually drives the decode (stock random weights argmax the
    same token for every input, which makes parity tests vacuous). Only used
    for batched-vs-sequential comparisons within OUR implementation."""
    import jax

    _, base_model = en_models

    def amplify(path, leaf):
        keys = "/".join(str(getattr(k, "key", getattr(k, "idx", ""))) for k in path)
        return leaf * 25.0 if "cross_attn" in keys and keys.endswith("/w") else leaf

    from asr_ttl_mtl_tpu.models.registry import WhisperModel

    return WhisperModel(
        dims=base_model.dims,
        params=jax.tree_util.tree_map_with_path(amplify, base_model.params),
        compute_dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def short_waves():
    """Five distinct ~1.5 s single-window clips (so batched fixed-stride
    windowing is identical to the sequential seek loop)."""
    waves = []
    for seed in (41, 42, 43, 44, 45):
        rng = np.random.RandomState(seed)
        waves.append((rng.randn(24000) * (0.05 + 0.1 * (seed % 3))).astype(np.float32))
    return waves


# the unmodified random weights loop on <|notimestamps|>; suppressing it
# makes every decode produce real, input-dependent text
_SUPPRESS = "-1,50362"


def _seq_all(model, waves, **kwargs):
    return [transcribe(model, w, verbose=None, **kwargs) for w in waves]


def test_batch_ladder_fallback_matches_sequential(batch_model, short_waves):
    """Force a subset of windows through the fallback ladder and check the
    batched path makes the same per-window ladder decisions as transcribe(),
    re-decoding only the failed subset."""
    from asr_ttl_mtl_tpu import transcribe as T
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    model = batch_model
    base = dict(
        without_timestamps=True, sample_len=8, fp16=False,
        compression_ratio_threshold=None, no_speech_threshold=None,
        language="en", suppress_tokens=_SUPPRESS,
    )

    # probe rung-0 logprobs to pick a threshold separating the five clips
    probe = transcribe_batch(
        model, short_waves, batch_size=5, temperature=0.0,
        logprob_threshold=None, **base,
    )
    lps = [o["segments"][0]["avg_logprob"] for o in probe]
    assert len(set(np.round(lps, 5))) > 1, "need distinct logprobs to split on"
    # threshold mid-way across the largest gap, so batch-vs-single float
    # jitter cannot flip any window's gate decision
    ordered = sorted(lps)
    gaps = np.diff(ordered)
    lo = int(np.argmax(gaps))
    threshold = float((ordered[lo] + ordered[lo + 1]) / 2)
    should_fail = [lp < threshold for lp in lps]
    assert any(should_fail) and not all(should_fail)

    # spy on DecodingTask.submit (the batch path's dispatch point — run() is
    # only its eager fallback) to verify only the failed subset is re-decoded
    from asr_ttl_mtl_tpu.decoding import DecodingTask

    calls = []
    orig_submit = DecodingTask.submit

    def spy(self, mel, rng_seed=0, **kw):
        calls.append((float(self.options.temperature), int(mel.shape[0])))
        return orig_submit(self, mel, rng_seed, **kw)

    DecodingTask.submit = spy
    try:
        ladder = (0.0, 0.8)
        outs = transcribe_batch(
            model, short_waves, batch_size=5, temperature=ladder,
            logprob_threshold=threshold, **base,
        )
    finally:
        DecodingTask.submit = orig_submit

    seqs = _seq_all(
        model, short_waves, temperature=ladder, logprob_threshold=threshold,
        **base,
    )
    for out, seq, fails in zip(outs, seqs, should_fail):
        # the ladder decision (which rung produced the result) must agree
        assert out["segments"][0]["temperature"] == seq["segments"][0]["temperature"]
        assert (out["segments"][0]["temperature"] > 0) == fails
        if not fails:  # t=0 is deterministic: exact text parity
            assert out["text"] == seq["text"]
    # rung 0 decodes all 5; rung 1 decodes only the failed subset
    assert calls[0] == (0.0, 5)
    assert len(calls) == 2 and calls[1][0] == 0.8


def test_batch_silence_skip_matches_sequential(batch_model, short_waves):
    """A confidently-silent window yields no segments in both paths."""
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    model = batch_model
    kwargs = dict(
        without_timestamps=True, sample_len=6, fp16=False, temperature=0.0,
        language="en", no_speech_threshold=-1.0, logprob_threshold=None,
        compression_ratio_threshold=None, suppress_tokens=_SUPPRESS,
    )
    outs = transcribe_batch(model, short_waves[:2], batch_size=2, **kwargs)
    seqs = _seq_all(model, short_waves[:2], **kwargs)
    for out, seq in zip(outs, seqs):
        assert out["segments"] == seq["segments"] == []
        assert out["text"] == seq["text"] == ""


def test_batch_initial_prompt_matches_sequential(batch_model, short_waves):
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    model = batch_model
    kwargs = dict(
        without_timestamps=True, sample_len=8, fp16=False, temperature=0.0,
        language="en", no_speech_threshold=None, suppress_tokens=_SUPPRESS,
    )
    outs = transcribe_batch(
        model, short_waves[:2], batch_size=2, initial_prompt="hello there", **kwargs
    )
    seqs = _seq_all(model, short_waves[:2], initial_prompt="hello there", **kwargs)
    for out, seq in zip(outs, seqs):
        assert out["text"] == seq["text"]
        assert [s["tokens"] for s in out["segments"]] == [
            s["tokens"] for s in seq["segments"]
        ]
    # and the prompt actually changed the output
    bare = transcribe_batch(model, short_waves[:2], batch_size=2, **kwargs)
    assert any(b["text"] != o["text"] for b, o in zip(bare, outs))


def test_batch_clip_timestamps_matches_sequential(batch_model, short_waves):
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    model = batch_model
    kwargs = dict(
        without_timestamps=True, sample_len=6, fp16=False, temperature=0.0,
        language="en", no_speech_threshold=None, suppress_tokens=_SUPPRESS,
    )
    outs = transcribe_batch(
        model, short_waves[:2], batch_size=2, clip_timestamps="0.4,1.1", **kwargs
    )
    seqs = _seq_all(model, short_waves[:2], clip_timestamps="0.4,1.1", **kwargs)
    for out, seq in zip(outs, seqs):
        assert out["text"] == seq["text"]
        assert [(s["start"], s["end"], s["seek"]) for s in out["segments"]] == [
            (s["start"], s["end"], s["seek"]) for s in seq["segments"]
        ]


def test_batch_word_timestamps_match_sequential(batch_model, short_waves):
    """Batched alignment (find_alignment_batch) vs the sequential per-window
    alignment: same words, timestamps within one DTW frame (0.02 s)."""
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    model = batch_model
    kwargs = dict(
        without_timestamps=True, sample_len=10, fp16=False, temperature=0.0,
        language="en", no_speech_threshold=None, word_timestamps=True,
        suppress_tokens=_SUPPRESS,
    )
    outs = transcribe_batch(model, short_waves[:3], batch_size=3, **kwargs)
    # batch_size=2 forces the alignment fan-out to CHUNK (2 + padded 1): the
    # chunked programs must produce the identical words/timestamps — the
    # guard against OOM-scale single-program alignment over hundreds of
    # windows silently changing results
    chunked = transcribe_batch(model, short_waves[:3], batch_size=2, **kwargs)
    for o3, o2 in zip(outs, chunked):
        assert o3["text"] == o2["text"]
        for s3, s2 in zip(o3["segments"], o2["segments"]):
            assert [(w["word"], w["start"], w["end"]) for w in s3["words"]] == [
                (w["word"], w["start"], w["end"]) for w in s2["words"]
            ]
    seqs = _seq_all(model, short_waves[:3], **kwargs)
    for out, seq in zip(outs, seqs):
        assert out["text"] == seq["text"]
        for so, ss in zip(out["segments"], seq["segments"]):
            assert [w["word"] for w in so["words"]] == [w["word"] for w in ss["words"]]
            for wo, ws in zip(so["words"], ss["words"]):
                assert abs(wo["start"] - ws["start"]) <= 0.021, (wo, ws)
                assert abs(wo["end"] - ws["end"]) <= 0.021, (wo, ws)
                assert abs(wo["probability"] - ws["probability"]) < 1e-4


def test_device_windows_match_host_windows(batch_model, short_waves, long_wave):
    """The device-resident window path (upload audio once; mel + window
    cutting + chunk assembly on device) must be BIT-identical to the host
    collection path — same segments, words, and everything in the result
    dicts. Mixes single-window clips with a multi-window file so both the
    chunk fast path and the partial tail window are exercised."""
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    model = batch_model
    inputs = list(short_waves[:2]) + [long_wave]
    kwargs = dict(
        without_timestamps=True, sample_len=8, fp16=False,
        temperature=(0.0, 0.5), language="en", word_timestamps=True,
        suppress_tokens=_SUPPRESS, batch_size=3,
    )
    host = transcribe_batch(model, inputs, device_windows=False, **kwargs)
    dev = transcribe_batch(model, inputs, device_windows=True, **kwargs)
    assert host == dev


def test_device_windows_language_detection_matches(multi_models, short_waves):
    """Per-input language detection over device-gathered first windows."""
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    _, model = multi_models
    kwargs = dict(without_timestamps=True, sample_len=4, fp16=False,
                  temperature=0.0, language=None, no_speech_threshold=None,
                  suppress_tokens=_SUPPRESS, batch_size=2)
    host = transcribe_batch(model, short_waves[:3], device_windows=False, **kwargs)
    dev = transcribe_batch(model, short_waves[:3], device_windows=True, **kwargs)
    assert [r["language"] for r in host] == [r["language"] for r in dev]
    assert host == dev


def test_words_mode_reuses_decode_features(batch_model, short_waves, long_wave, monkeypatch):
    """Words mode on the device-window path must feed the decode phase's
    captured encoder features into the alignment forward (no second encoder
    pass) — and still match the host path exactly. Guards against the
    eligibility gate silently regressing to the recompute path."""
    import importlib

    T = importlib.import_module("asr_ttl_mtl_tpu.transcribe")
    gathers = []
    orig = T._FeatureStore.gather

    def spy(self, idx, pad_to=None):
        gathers.append(list(idx))
        return orig(self, idx, pad_to)

    monkeypatch.setattr(T._FeatureStore, "gather", spy)
    model = batch_model
    inputs = list(short_waves[:2]) + [long_wave]
    kwargs = dict(
        without_timestamps=True, sample_len=8, fp16=False, temperature=0.0,
        language="en", word_timestamps=True, suppress_tokens=_SUPPRESS,
        batch_size=3,
    )
    dev = T.transcribe_batch(model, inputs, device_windows=True, **kwargs)
    assert gathers, "alignment did not read the decode-phase feature store"
    host = T.transcribe_batch(model, inputs, device_windows=False, **kwargs)
    assert host == dev


def test_batch_beam_with_word_timestamps_matches_sequential(en_models):
    """transcribe_batch composing beam_size with word_timestamps (r4-verdict
    coverage gap): single-window inputs must reproduce sequential
    transcribe() exactly — beam picks the sequences, the batched alignment
    times the words of those beam outputs."""
    from asr_ttl_mtl_tpu.transcribe import transcribe, transcribe_batch

    _, our_model = en_models
    rng = np.random.RandomState(37)
    waves = [(rng.randn(16000 * 2) * 0.1).astype(np.float32) for _ in range(2)]
    kwargs = dict(
        without_timestamps=True, sample_len=8, temperature=0.0, fp16=False,
        beam_size=3, word_timestamps=True, no_speech_threshold=None,
        language="en",
    )
    outs = transcribe_batch(our_model, waves, batch_size=2, **kwargs)
    for wave, out in zip(waves, outs):
        seq = transcribe(our_model, wave, verbose=None, **kwargs)
        assert out["text"] == seq["text"]
        assert len(out["segments"]) == len(seq["segments"])
        for so, ss in zip(out["segments"], seq["segments"]):
            assert [w["word"] for w in so["words"]] == [
                w["word"] for w in ss["words"]]
            for wo, ws in zip(so["words"], ss["words"]):
                np.testing.assert_allclose(wo["start"], ws["start"], atol=0.05)
                np.testing.assert_allclose(wo["end"], ws["end"], atol=0.05)


def test_word_align_batch_cap_is_semantically_identity(en_models):
    """word_align_batch caps the alignment program's chunk without changing
    results (the knob that keeps batch-320 decodes from compiling a
    320-window alignment program)."""
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    _, our_model = en_models
    rng = np.random.RandomState(41)
    waves = [(rng.randn(16000 * 2) * 0.1).astype(np.float32) for _ in range(3)]
    kwargs = dict(
        without_timestamps=True, sample_len=8, temperature=0.0, fp16=False,
        word_timestamps=True, no_speech_threshold=None, language="en",
    )
    full = transcribe_batch(our_model, waves, batch_size=3, **kwargs)
    capped = transcribe_batch(our_model, waves, batch_size=3,
                              word_align_batch=1, **kwargs)
    for a, b in zip(full, capped):
        assert a["text"] == b["text"]
        for sa, sb in zip(a["segments"], b["segments"]):
            assert [w["word"] for w in sa["words"]] == [
                w["word"] for w in sb["words"]]
            for wa, wb in zip(sa["words"], sb["words"]):
                assert wa["start"] == wb["start"] and wa["end"] == wb["end"]


def test_unfused_decode_batch_cap_identical(batch_model, short_waves, long_wave, monkeypatch):
    """ASRMTL_UNFUSED_DECODE_BATCH caps the words-mode unfused decode
    program's batch (the server compiler fp32-materializes its cross-KV —
    a compile OOM at 320 windows); the window/feature stores adopt the
    capped chunk, and results must be identical to the uncapped run."""
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    model = batch_model
    inputs = list(short_waves[:2]) + [long_wave]
    kwargs = dict(
        without_timestamps=True, sample_len=8, fp16=False, temperature=0.0,
        language="en", word_timestamps=True, suppress_tokens=_SUPPRESS,
        batch_size=4,
    )
    full = transcribe_batch(model, inputs, device_windows=True, **kwargs)
    monkeypatch.setenv("ASRMTL_UNFUSED_DECODE_BATCH", "2")
    capped = transcribe_batch(model, inputs, device_windows=True, **kwargs)
    assert full == capped
