"""Audio frontend golden tests.

Validates the generated mel filterbank against the published librosa-derived
asset, and the jax log-mel spectrogram against an independent torch
recomputation of the reference formula (whisper/audio.py:110-157).
"""

import numpy as np
import pytest

from asr_ttl_mtl_tpu import audio as A

from conftest import REFERENCE_ROOT, reference_available


def test_constants():
    assert A.N_SAMPLES == 480000
    assert A.N_FRAMES == 3000
    assert A.FRAMES_PER_SECOND == 100
    assert A.TOKENS_PER_SECOND == 50


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_filterbank_matches_published_asset(n_mels):
    if not reference_available():
        pytest.skip("reference assets not mounted")
    ref = np.load(f"{REFERENCE_ROOT}/whisper/assets/mel_filters.npz")[f"mel_{n_mels}"]
    ours = A.mel_filters(n_mels)
    assert ours.shape == ref.shape == (n_mels, 201)
    np.testing.assert_allclose(ours, ref, atol=2e-7)


def _torch_log_mel(wave_np, n_mels=80, padding=0):
    """Independent recomputation of the reference mel pipeline with torch."""
    import torch

    audio = torch.from_numpy(wave_np)
    if padding > 0:
        audio = torch.nn.functional.pad(audio, (0, padding))
    window = torch.hann_window(A.N_FFT)
    stft = torch.stft(audio, A.N_FFT, A.HOP_LENGTH, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(A.mel_filters(n_mels))
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).numpy()


@pytest.mark.parametrize("padding", [0, A.N_SAMPLES])
def test_log_mel_matches_torch_formula(padding):
    rng = np.random.RandomState(0)
    wave = (rng.randn(A.SAMPLE_RATE * 2)).astype(np.float32) * 0.1
    ours = np.asarray(A.log_mel_spectrogram(wave, padding=padding))
    ref = _torch_log_mel(wave, padding=padding)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_log_mel_full_chunk_shape():
    wave = np.zeros(A.N_SAMPLES, dtype=np.float32)
    mel = np.asarray(A.log_mel_spectrogram(wave))
    assert mel.shape == (80, A.N_FRAMES)


def test_log_mel_batched_matches_unbatched():
    rng = np.random.RandomState(1)
    waves = rng.randn(3, A.SAMPLE_RATE).astype(np.float32) * 0.05
    batched = np.asarray(A.log_mel_spectrogram(waves))
    for i in range(3):
        single = np.asarray(A.log_mel_spectrogram(waves[i]))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_pad_or_trim():
    x = np.ones(10, dtype=np.float32)
    assert A.pad_or_trim(x, 4).shape == (4,)
    padded = A.pad_or_trim(x, 20)
    assert padded.shape == (20,)
    assert padded[10:].sum() == 0

    import jax.numpy as jnp

    xj = jnp.ones((2, 10))
    assert A.pad_or_trim(xj, 16).shape == (2, 16)


def test_wav_roundtrip(tmp_path):
    import wave as wavmod

    rng = np.random.RandomState(2)
    pcm = (rng.randn(16000) * 8000).astype(np.int16)
    path = str(tmp_path / "test.wav")
    with wavmod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    loaded = A.load_audio(path)
    np.testing.assert_allclose(loaded, pcm.astype(np.float32) / 32768.0, atol=1e-6)


def test_wav_resample_and_stereo(tmp_path):
    import wave as wavmod

    t = np.arange(48000 * 2) / 48000.0
    tone = (np.sin(2 * np.pi * 440 * t) * 16000).astype(np.int16)
    stereo = np.stack([tone, tone], axis=1).reshape(-1)
    path = str(tmp_path / "tone48k.wav")
    with wavmod.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(48000)
        w.writeframes(stereo.tobytes())
    loaded = A.load_audio(path)
    assert abs(len(loaded) - 32000) <= 2
    # energy preserved around 440 Hz
    spec = np.abs(np.fft.rfft(loaded[:16000]))
    peak_hz = np.argmax(spec)  # bin == Hz for a 1s window at 16 kHz
    assert abs(peak_hz - 440) <= 2
