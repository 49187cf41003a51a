"""Audio frontend: host-side decode + TPU-friendly log-mel spectrogram.

Behavior parity with reference `whisper/audio.py` (constants :12-22,
`load_audio` :25-62, `pad_or_trim` :65-88, `log_mel_spectrogram` :110-157),
re-designed for TPU:

* The STFT is computed as two dense matmuls against real/imag DFT bases
  instead of an FFT: for n_fft=400 the (frames, 400) x (400, 201) products
  map straight onto the MXU and fuse with the mel projection, which XLA
  cannot do with its FFT custom-call. Everything is static-shape and
  jit/vmap/pjit friendly.
* The mel filterbank is *generated* (librosa-compatible Slaney math), not a
  vendored binary asset; `tests/test_audio.py` golden-tests it against the
  published filterbank values.
* Decoding stays on the host (I/O bound): ffmpeg when present (same CLI
  contract as the reference), otherwise a native WAV reader + polyphase
  resampler.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from functools import lru_cache, partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .utils import exact_div

# hard-coded audio hyperparameters (identical to reference whisper/audio.py:12-22)
SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000 samples in a 30-second chunk
N_FRAMES = exact_div(N_SAMPLES, HOP_LENGTH)  # 3000 frames in a mel spectrogram input

N_SAMPLES_PER_TOKEN = HOP_LENGTH * 2  # the initial convolutions have stride 2
FRAMES_PER_SECOND = exact_div(SAMPLE_RATE, HOP_LENGTH)  # 10ms per audio frame
TOKENS_PER_SECOND = exact_div(SAMPLE_RATE, N_SAMPLES_PER_TOKEN)  # 20ms per audio token


# ---------------------------------------------------------------------------
# host-side audio decode
# ---------------------------------------------------------------------------


def _load_audio_ffmpeg(file: str, sr: int) -> np.ndarray:
    cmd = [
        "ffmpeg",
        "-nostdin",
        "-threads", "0",
        "-i", file,
        "-f", "s16le",
        "-ac", "1",
        "-acodec", "pcm_s16le",
        "-ar", str(sr),
        "-",
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, check=True).stdout
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"Failed to load audio: {e.stderr.decode()}") from e
    return np.frombuffer(out, np.int16).flatten().astype(np.float32) / 32768.0


def _read_wav(file: str) -> tuple[np.ndarray, int]:
    """Minimal standalone RIFF/WAVE reader: PCM 8/16/24/32-bit and IEEE float."""
    import struct
    import wave

    try:
        with wave.open(file, "rb") as w:
            n_channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            framerate = w.getframerate()
            raw = w.readframes(w.getnframes())
        if sampwidth == 1:
            data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif sampwidth == 2:
            data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
        elif sampwidth == 3:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            i32 = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            i32 = np.where(i32 >= 1 << 23, i32 - (1 << 24), i32)
            data = i32.astype(np.float32) / float(1 << 23)
        elif sampwidth == 4:
            data = np.frombuffer(raw, np.int32).astype(np.float32) / float(1 << 31)
        else:
            raise RuntimeError(f"unsupported WAV sample width: {sampwidth}")
    except wave.Error:
        # wave does not handle IEEE-float WAVs; parse the header manually
        with open(file, "rb") as f:
            blob = f.read()
        if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
            raise RuntimeError(f"{file} is not a RIFF/WAVE file")
        pos, fmt, data = 12, None, None
        framerate = n_channels = None
        while pos + 8 <= len(blob):
            cid, size = blob[pos : pos + 4], struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
            body = blob[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
                n_channels, framerate = fmt[1], fmt[2]
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)
        if fmt is None or data is None:
            raise RuntimeError(f"malformed WAV file: {file}")
        audio_format, bits = fmt[0], fmt[5]
        if audio_format == 3 and bits == 32:
            data = np.frombuffer(data, np.float32).astype(np.float32)
        elif audio_format == 3 and bits == 64:
            data = np.frombuffer(data, np.float64).astype(np.float32)
        else:
            raise RuntimeError(f"unsupported WAV format code {audio_format}/{bits}bit")
        return data.reshape(-1, n_channels).mean(axis=1), framerate

    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, framerate


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling with a Kaiser-windowed sinc filter."""
    if orig_sr == target_sr:
        return audio.astype(np.float32)
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, target_sr)
    return resample_poly(audio, target_sr // g, orig_sr // g).astype(np.float32)


def load_audio(file: str, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Read an audio file as a mono float32 waveform at `sr` Hz.

    Prefers the native in-process decoder for WAV files (no subprocess per
    sample — the reference forks one ffmpeg per file, `audio.py:58`, which is
    the input-pipeline bottleneck at training time); falls back to ffmpeg for
    compressed formats when available.
    """
    if file.lower().endswith(".wav") or not shutil.which("ffmpeg"):
        try:
            data, orig_sr = _read_wav_native(file)
            return resample(data, orig_sr, sr)
        except Exception:
            if not shutil.which("ffmpeg"):
                raise
    return _load_audio_ffmpeg(file, sr)


def _read_wav_native(file: str) -> tuple[np.ndarray, int]:
    """WAV decode via the C++ runtime when built, else the Python reader."""
    try:
        from .runtime import wav as _cwav  # optional native extension

        return _cwav.read(file)
    except ImportError:
        return _read_wav(file)


def pad_or_trim(array, length: int = N_SAMPLES, *, axis: int = -1):
    """Pad (with zeros) or trim the array to `length` along `axis`.

    Works for both numpy and jax arrays (reference `audio.py:65-88`).
    """
    xp = jnp if isinstance(array, jnp.ndarray) else np
    if array.shape[axis] > length:
        sl = [slice(None)] * array.ndim
        sl[axis] = slice(0, length)
        array = array[tuple(sl)]
    if array.shape[axis] < length:
        pad_widths = [(0, 0)] * array.ndim
        pad_widths[axis] = (0, length - array.shape[axis])
        array = xp.pad(array, pad_widths)
    return array


# ---------------------------------------------------------------------------
# mel filterbank (generated, librosa/Slaney-compatible)
# ---------------------------------------------------------------------------


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney-style mel scale (linear below 1 kHz, log above)."""
    freq = np.asanyarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        freq >= min_log_hz, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep, mels
    )


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    mel = np.asanyarray(mel, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mel
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mel >= min_log_mel, min_log_hz * np.exp(logstep * (mel - min_log_mel)), freqs)


@lru_cache(maxsize=None)
def mel_filters(n_mels: int, sr: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2+1).

    Equivalent to librosa.filters.mel(sr=16000, n_fft=400, n_mels=n_mels),
    which is what the reference ships as a binary asset
    (whisper/assets/mel_filters.npz; see whisper/audio.py:91-107).
    """
    assert n_mels in {80, 128}, f"Unsupported n_mels: {n_mels}"
    fftfreqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    return (weights * enorm[:, None]).astype(np.float32)


# ---------------------------------------------------------------------------
# log-mel spectrogram (pure jax, MXU matmul formulation)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _stft_constants(n_fft: int = N_FFT):
    """Hann window and real-DFT bases, precombined so framing -> one matmul."""
    n = np.arange(n_fft)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))  # periodic Hann
    k = np.arange(n_fft // 2 + 1)
    angle = 2.0 * np.pi * np.outer(n, k) / n_fft
    # fold the window into the bases: frames @ basis == rDFT(frames * window)
    cos_basis = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_basis = (-np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_basis, sin_basis


@partial(jax.jit, static_argnames=("n_mels", "padding"))
def log_mel_spectrogram_jax(audio: jnp.ndarray, n_mels: int = 80, padding: int = 0) -> jnp.ndarray:
    """Log-mel spectrogram of 16 kHz audio, shape (..., n_mels, n_frames).

    Matches reference whisper/audio.py:110-157 numerically: centered STFT
    (reflect pad, periodic Hann, n_fft=400, hop=160), power spectrum with the
    final frame dropped, mel projection, log10 clamp at 1e-10, dynamic-range
    clip to max-8 dB, then (x+4)/4 scaling. For batched input the dynamic
    range max is per-sample, which is what the reference computes when called
    per clip.

    TPU note: the windowed rDFT is expressed as (frames @ basis) so the whole
    frontend is two MXU matmuls plus elementwise ops — one fused XLA program,
    no FFT custom-call, no host round-trips.
    """
    audio = jnp.asarray(audio, dtype=jnp.float32)
    if padding > 0:
        pad_widths = [(0, 0)] * (audio.ndim - 1) + [(0, padding)]
        audio = jnp.pad(audio, pad_widths)
    # centered STFT: reflect-pad n_fft//2 on both sides
    pad_widths = [(0, 0)] * (audio.ndim - 1) + [(N_FFT // 2, N_FFT // 2)]
    audio = jnp.pad(audio, pad_widths, mode="reflect")

    n_frames_full = 1 + (audio.shape[-1] - N_FFT) // HOP_LENGTH
    starts = np.arange(n_frames_full) * HOP_LENGTH
    idx = starts[:, None] + np.arange(N_FFT)[None, :]  # (frames, n_fft), static
    frames = audio[..., idx]  # (..., frames, n_fft)

    # HIGHEST precision: the frontend is a negligible FLOP fraction of the
    # model, but bf16 MXU default would inject ~0.3% relative noise into the
    # power spectrum before the log, breaking parity with the reference.
    cos_basis, sin_basis = _stft_constants()
    re = jnp.matmul(frames, jnp.asarray(cos_basis), precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(sin_basis), precision=jax.lax.Precision.HIGHEST)
    magnitudes = (re * re + im * im)[..., :-1, :]  # drop last frame (torch.stft parity)

    filters = jnp.asarray(mel_filters(n_mels))  # (n_mels, n_freq)
    mel_spec = jnp.einsum(
        "mf,...tf->...mt", filters, magnitudes, precision=jax.lax.Precision.HIGHEST
    )

    log_spec = jnp.log10(jnp.clip(mel_spec, min=1e-10))
    global_max = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, global_max - 8.0)
    return (log_spec + 4.0) / 4.0


def log_mel_for_transfer(
    wave: np.ndarray, n_mels: int = 80, full_samples: Optional[int] = None
) -> np.ndarray:
    """Host-side normalized log-mel of bucket-length waveforms, as fp16 —
    the training pipeline's smallest exact-enough H2D representation.

    For a clip zero-padded to bucket length L, frames of the full-window
    (N_SAMPLES) log-mel whose centered STFT windows overlap samples < L are
    exactly the first L/HOP + 2 (frame f covers [f*HOP - N_FFT/2,
    f*HOP + N_FFT/2): frames L/HOP and L/HOP + 1 still reach back into the
    last N_FFT/2 real samples); every later frame is pure zero-padding whose
    value after the dynamic-range clip is max(per-sample max, -8 dB floor) —
    reconstructable on device from the shipped frames alone
    (MultiTaskTrainer._forward). So: compute the mel of wave||0^N_FFT on the
    host CPU backend with the SAME :func:`log_mel_spectrogram_jax` program,
    keep the first L/HOP + 2 frames, and ship them as fp16 (~1e-3 absolute
    rounding on values in [-1.5, 2.5] — below bf16 training noise). 4x fewer
    bytes than fp32 waveforms, 2x fewer than int16.
    """
    wave = np.asarray(wave, np.float32)
    lead, L = wave.shape[:-1], wave.shape[-1]
    flat = wave.reshape(-1, L)
    cpu = jax.devices("cpu")[0]
    if full_samples is not None and L >= full_samples:
        # dense clip filling the whole window: the device mel REFLECTS the
        # true waveform tail at the window boundary (no zero region exists),
        # so compute the full-window mel directly — zero extension would put
        # silence where the reflection puts real samples
        with jax.default_device(cpu):
            mel = log_mel_spectrogram_jax(jnp.asarray(flat), n_mels=n_mels)
        mel = np.asarray(mel).astype(np.float16)
        return mel.reshape(*lead, n_mels, mel.shape[-1])
    # trailing zeros so every kept frame's full window exists in the array
    flat = np.pad(flat, ((0, 0), (0, N_FFT)))
    with jax.default_device(cpu):
        mel = log_mel_spectrogram_jax(jnp.asarray(flat), n_mels=n_mels)
    mel = np.asarray(mel)[..., : L // HOP_LENGTH + 2].astype(np.float16)
    return mel.reshape(*lead, n_mels, mel.shape[-1])


def finish_transfer_mel(mel: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Device side of :func:`log_mel_for_transfer`: fp16 -> fp32 and extend
    to the full window's frame count with each sample's dynamic-range floor
    (max-8 dB == normalized max-2.0, never below the log10 clamp's -1.5).
    A full-window bucket ships target+2 frames — truncate, don't pad."""
    mel = mel.astype(jnp.float32)
    target = n_samples // HOP_LENGTH
    short = target - mel.shape[-1]
    if short <= 0:
        return mel[..., :target]
    floor = jnp.maximum(mel.max(axis=(-2, -1), keepdims=True) - 2.0, -1.5)
    pad = jnp.broadcast_to(floor, (*mel.shape[:-1], short))
    return jnp.concatenate([mel, pad], axis=-1)


_PALLAS_MEL_BROKEN = [False]  # set after a compile/launch failure


def _mel_dispatch(
    audio: jnp.ndarray, n_mels: int, padding: int, use_pallas: Optional[bool]
) -> jnp.ndarray:
    """Pick the fused Pallas frontend kernel (ops/pallas_mel.py) when it
    applies — single-device TPU, whole-bucket frame counts — else the
    pure-XLA matmul formulation. Both are numerically parity-tested against
    each other and the reference. A kernel compile/launch failure falls back
    to the XLA path for the rest of the process (never crash on a kernel
    problem — the reference's Triton fallback pattern, timing.py:41-46)."""
    n_frames = (audio.shape[-1] + padding) // HOP_LENGTH
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and not _PALLAS_MEL_BROKEN[0]
    if use_pallas:
        from .ops import pallas_mel

        if pallas_mel.supports(n_frames):
            try:
                return pallas_mel.log_mel_spectrogram_pallas(
                    audio, n_mels=n_mels, padding=padding
                )
            except Exception as e:
                import warnings

                warnings.warn(
                    f"Pallas mel kernel failed ({type(e).__name__}: {e}); "
                    "using the XLA frontend from now on"
                )
                _PALLAS_MEL_BROKEN[0] = True
    return log_mel_spectrogram_jax(audio, n_mels=n_mels, padding=padding)


def log_mel_spectrogram(
    audio: Union[str, np.ndarray, jnp.ndarray],
    n_mels: int = 80,
    padding: int = 0,
    device: Optional[object] = None,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Host-friendly wrapper: accepts a file path or waveform array.

    When `padding >= N_FFT` (the long-form transcription case, padding =
    30 s of silence) the waveform is zero-extended up to a 30 s multiple so
    the jitted STFT compiles once per BUCKET instead of once per unique file
    duration; the surplus frames are sliced off. Exact: every retained
    frame's window lies inside the explicitly zero-padded region either way.
    """
    if isinstance(audio, str):
        audio = load_audio(audio)
    audio = jnp.asarray(audio)
    n = audio.shape[-1]
    if padding >= N_FFT:
        total = n + padding
        true_frames = total // HOP_LENGTH
        bucket = ((total + N_SAMPLES - 1) // N_SAMPLES) * N_SAMPLES
        out = _mel_dispatch(audio, n_mels, padding + (bucket - total), use_pallas)[
            ..., :true_frames
        ]
    else:
        out = _mel_dispatch(audio, n_mels, padding, use_pallas)
    if device is not None:
        out = jax.device_put(out, device)
    return out
