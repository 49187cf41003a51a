"""Fused Pallas log-mel frontend vs the XLA matmul-DFT path
(interpret mode on CPU; same code Mosaic-compiles on TPU).

The XLA path itself is golden-tested against the reference's torch STFT
math in test_audio.py, so parity here chains to reference parity.
"""

import numpy as np
import pytest

from asr_ttl_mtl_tpu.audio import (
    HOP_LENGTH,
    N_SAMPLES,
    log_mel_spectrogram,
    log_mel_spectrogram_jax,
)
from asr_ttl_mtl_tpu.ops.pallas_mel import log_mel_spectrogram_pallas, supports


def _compare(audio, n_mels, padding):
    got = np.asarray(
        log_mel_spectrogram_pallas(audio, n_mels=n_mels, padding=padding, interpret=True)
    )
    want = np.asarray(log_mel_spectrogram_jax(audio, n_mels=n_mels, padding=padding))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_single_30s_clip(n_mels):
    rng = np.random.RandomState(0)
    audio = (rng.randn(N_SAMPLES) * 0.1).astype(np.float32)
    _compare(audio, n_mels, 0)


def test_batched():
    rng = np.random.RandomState(1)
    audio = (rng.randn(4, N_SAMPLES) * 0.1).astype(np.float32)
    _compare(audio, 80, 0)


def test_long_form_padding_bucket():
    # the transcribe path: arbitrary-length waveform + 30 s silence padding,
    # zero-extended to a 30 s bucket by the wrapper before the kernel
    rng = np.random.RandomState(2)
    n = int(N_SAMPLES * 1.37)
    audio = (rng.randn(n) * 0.1).astype(np.float32)
    total = n + N_SAMPLES
    bucket = ((total + N_SAMPLES - 1) // N_SAMPLES) * N_SAMPLES
    _compare(audio, 80, N_SAMPLES + (bucket - total))


def test_wrapper_dispatch_slices_true_frames():
    rng = np.random.RandomState(3)
    n = int(N_SAMPLES * 0.53)
    audio = (rng.randn(n) * 0.1).astype(np.float32)
    got = np.asarray(log_mel_spectrogram(audio, padding=N_SAMPLES, use_pallas=False))
    assert got.shape[-1] == (n + N_SAMPLES) // HOP_LENGTH


def test_supports_predicate():
    assert supports(3000) and supports(6000)
    assert not supports(2999) and not supports(0)


def test_silence_dynamic_range_clamp():
    # all-zero audio exercises the log10(clip) floor + max-8 clamp identically
    audio = np.zeros(N_SAMPLES, np.float32)
    _compare(audio, 80, 0)
