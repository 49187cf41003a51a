"""Fused log-mel spectrogram frontend as a single Pallas TPU kernel.

TPU-native replacement for the reference's `log_mel_spectrogram`
(`whisper/audio.py:110-157`, torch.stft + mel matmul + log/clamp chain) and
the BASELINE north-star item "fuse the load/pad/log_mel_spectrogram STFT
path into a single Pallas kernel". One kernel performs, per frame tile:

  1. overlapping FRAME EXTRACTION straight out of VMEM — frames never hit
     HBM. The hop (160) divides into lane-rows; frame t is the concatenation
     of rows t, t+1 and the first 80 samples of row t+2, so framing is three
     sublane-shifted views of one (rows, 160) buffer instead of a gather.
     The 2-row overlap between adjacent grid tiles comes from passing the
     SAME rows array twice with two non-overlapping BlockSpecs (a 600-row
     main view and an 8-row tail view) — standard Pallas pipelining, no
     manual DMA.
  2. the windowed real DFT as two MXU matmuls against Hann-folded
     cos/sin bases (f32, exact parity with the XLA path in audio.py),
  3. the power spectrum + mel filterbank projection (second MXU matmul),
  4. log10(clip(., 1e-10)) on the VPU.

The global dynamic-range clamp (max - 8) and (x+4)/4 scaling need the
whole-spectrogram max, so they stay in XLA (one tiny elementwise pass over
the (n_mels, T) output). The caller-facing wrapper in audio.py picks this
kernel automatically on single-device TPU for qualifying shapes and falls
back to the pure-XLA matmul formulation everywhere else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_FFT = 400
HOP = 160
TILE_T = 600  # frames per grid step; multiple of 8, divides every 30 s bucket (3000)
_TAIL_ROWS = 8  # sublane-aligned extra rows giving the +2-row overlap


def _mel_kernel(rows_ref, tail_ref, cos_ref, sin_ref, mel_ref, o_ref):
    # rows_ref: (1, TILE_T, 160) hop-sized audio rows; tail_ref: (1, 8, 160)
    # the rows immediately after them. Frame t = rows[t] ++ rows[t+1] ++
    # rows[t+2][:80], so with R = rows_ref[0] and X = tail_ref[0]:
    r = rows_ref[0]
    x = tail_ref[0]
    a = r  # (TILE_T, 160)
    b = jnp.concatenate([r[1:], x[:1]], axis=0)  # rows 1..TILE_T
    c = jnp.concatenate([r[2:], x[:2]], axis=0)[:, :80]  # rows 2..TILE_T+1
    frames = jnp.concatenate([a, b, c], axis=1)  # (TILE_T, 400)

    # Hann window is folded into the bases (audio.py:_stft_constants); the
    # MXU must run true-f32 passes (HIGHEST) — default precision injects
    # ~0.4% bf16 noise into the power spectrum, breaking reference parity.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_ref[...], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames, sin_ref[...], preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im  # (TILE_T, 256); cols >= 201 are exactly 0

    mel = jnp.dot(power, mel_ref[...], preferred_element_type=jnp.float32, precision=hi)
    o_ref[0] = jnp.log10(jnp.clip(mel, min=1e-10))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _log_mel_core(rows: jnp.ndarray, cos_b, sin_b, mel_t, *, interpret=False):
    """rows: (B, n_rows, 160) f32 with n_rows = n_frames + 8; returns
    log10-mel (B, n_frames, 128) with mel lanes >= n_mels undefined-but-finite."""
    bsz, n_rows, _ = rows.shape
    n_frames = n_rows - _TAIL_ROWS
    assert n_frames % TILE_T == 0, n_frames
    t_tiles = n_frames // TILE_T

    return pl.pallas_call(
        _mel_kernel,
        grid=(bsz, t_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_T, HOP), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            # same array, tail view: 8 rows starting at frame (t+1)*TILE_T
            pl.BlockSpec(
                (1, _TAIL_ROWS, HOP),
                lambda b, t: (b, (t + 1) * (TILE_T // _TAIL_ROWS), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((N_FFT, 256), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_FFT, 256), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_T, 128), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n_frames, 128), jnp.float32),
        interpret=interpret,
    )(rows, rows, cos_b, sin_b, mel_t)


@functools.lru_cache(maxsize=None)
def _padded_constants(n_mels: int):
    """Hann-folded DFT bases padded to 256 lanes, mel filterbank transposed
    and padded to (256, 128). Zero padding keeps every matmul exact."""
    from ..audio import _stft_constants, mel_filters

    cos_basis, sin_basis = _stft_constants()  # (400, 201)
    n_freq = cos_basis.shape[1]
    cos_p = np.zeros((N_FFT, 256), np.float32)
    sin_p = np.zeros((N_FFT, 256), np.float32)
    cos_p[:, :n_freq] = cos_basis
    sin_p[:, :n_freq] = sin_basis
    filt = mel_filters(n_mels)  # (n_mels, 201)
    mel_t = np.zeros((256, 128), np.float32)
    mel_t[:n_freq, :n_mels] = filt.T
    return cos_p, sin_p, mel_t


def supports(n_frames: int) -> bool:
    """Shapes the kernel handles: whole 30 s buckets (transcribe + training
    paths both produce frame counts that are multiples of 3000)."""
    return n_frames > 0 and n_frames % TILE_T == 0


@functools.partial(jax.jit, static_argnames=("n_mels", "padding", "interpret"))
def log_mel_spectrogram_pallas(
    audio: jnp.ndarray, n_mels: int = 80, padding: int = 0, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for audio.log_mel_spectrogram_jax on qualifying shapes.

    audio: (..., n_samples) f32 waveform; returns (..., n_mels, n_frames)
    with n_frames = (n_samples + padding) // 160, matching the reference's
    centered-STFT + drop-last-frame semantics (whisper/audio.py:147).
    """
    audio = jnp.asarray(audio, dtype=jnp.float32)
    lead = audio.shape[:-1]
    n = audio.shape[-1] + padding
    n_frames = n // HOP
    if not supports(n_frames):
        raise ValueError(f"pallas mel kernel needs n_frames % {TILE_T} == 0, got {n_frames}")

    flat = audio.reshape((-1, audio.shape[-1]))
    if padding > 0:
        flat = jnp.pad(flat, ((0, 0), (0, padding)))
    # centered STFT: reflect-pad n_fft//2 both sides, then zero-extend so the
    # row buffer covers frame (n_frames-1)'s window plus the aligned tail view
    flat = jnp.pad(flat, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    total_rows = n_frames + _TAIL_ROWS
    flat = jnp.pad(flat, ((0, 0), (0, total_rows * HOP - flat.shape[-1])))
    rows = flat.reshape(flat.shape[0], total_rows, HOP)

    cos_b, sin_b, mel_t = (jnp.asarray(c) for c in _padded_constants(n_mels))
    log_spec = _log_mel_core(rows, cos_b, sin_b, mel_t, interpret=interpret)
    log_spec = jnp.transpose(log_spec[..., :n_mels], (0, 2, 1))  # (B, n_mels, T)

    global_max = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, global_max - 8.0)
    out = (log_spec + 4.0) / 4.0
    return out.reshape(lead + out.shape[1:])
