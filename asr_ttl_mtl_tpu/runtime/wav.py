"""ctypes bindings to the native audio runtime (native/audio_decoder.cpp).

API mirrors the Python fallbacks in audio.py:
  * read(file)                        -> (float32 mono, sample_rate)
  * resample(x, orig_sr, target_sr)   -> float32 (scipy resample_poly parity)
  * load_batch(paths, sr, length)     -> (n, length) float32 + per-file status

Import fails (ImportError) when the library can't be built — callers fall
back to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
from math import gcd
from typing import List, Sequence, Tuple

import numpy as np

from .build import build_library


def _load_library() -> ctypes.CDLL:
    """Load the cached .so; on a load failure (stale artifact from another
    platform/toolchain) rebuild once, then give up as ImportError so callers
    fall back to pure Python."""
    path = build_library("audio_decoder.cpp")
    try:
        return ctypes.CDLL(path)
    except OSError:
        try:
            os.unlink(path)
        except OSError:
            pass
        path = build_library("audio_decoder.cpp")
        try:
            return ctypes.CDLL(path)
        except OSError as e:
            raise ImportError(f"native audio runtime unusable: {e}") from e


_lib = _load_library()

_lib.wav_read.restype = ctypes.c_long
_lib.wav_read.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ctypes.POINTER(ctypes.c_int),
]
_lib.audio_free.restype = None
_lib.audio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
_lib.resample_f32.restype = ctypes.c_long
_lib.resample_f32.argtypes = [
    ctypes.POINTER(ctypes.c_float),
    ctypes.c_long,
    ctypes.c_int,
    ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
]
_lib.load_batch.restype = ctypes.c_int
_lib.load_batch.argtypes = [
    ctypes.POINTER(ctypes.c_char_p),
    ctypes.c_int,
    ctypes.c_int,
    ctypes.c_long,
    ctypes.POINTER(ctypes.c_float),
    ctypes.POINTER(ctypes.c_long),
    ctypes.c_int,
]

_ERRORS = {
    -1: "cannot open file",
    -2: "file too small",
    -3: "short read",
    -4: "not a RIFF/WAVE file",
    -5: "missing fmt/data chunk",
    -6: "zero sample width",
    -7: "unsupported WAV format",
    -100: "out of memory",
}


def read(file: str) -> Tuple[np.ndarray, int]:
    """Decode a WAV file to mono float32 at its native sample rate."""
    data_p = ctypes.POINTER(ctypes.c_float)()
    sr = ctypes.c_int(0)
    n = _lib.wav_read(file.encode(), ctypes.byref(data_p), ctypes.byref(sr))
    if n < 0:
        raise RuntimeError(f"{file}: {_ERRORS.get(n, f'error {n}')}")
    try:
        out = np.ctypeslib.as_array(data_p, shape=(n,)).copy()
    finally:
        _lib.audio_free(data_p)
    return out, sr.value


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Kaiser polyphase resample, parity with audio.py:resample."""
    if orig_sr == target_sr:
        return np.asarray(audio, np.float32)
    x = np.ascontiguousarray(audio, np.float32)
    g = gcd(orig_sr, target_sr)
    out_p = ctypes.POINTER(ctypes.c_float)()
    n = _lib.resample_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.shape[0],
        target_sr // g,
        orig_sr // g,
        ctypes.byref(out_p),
    )
    if n < 0:
        raise RuntimeError(_ERRORS.get(n, f"resample error {n}"))
    try:
        return np.ctypeslib.as_array(out_p, shape=(n,)).copy()
    finally:
        _lib.audio_free(out_p)


def load_batch(
    paths: Sequence[str],
    target_sr: int,
    target_len: int,
    n_threads: int = 0,
) -> Tuple[np.ndarray, List[int]]:
    """Decode+resample+pad/trim a batch of WAV files on a C++ thread pool.

    Returns ((n, target_len) float32, per-file status list). status[i] is the
    decoded length at target_sr, or a negative error code (that row is
    zero-filled — same contract as the reference's zero-mel dummy fallback,
    `speech_disorder/dataset.py:93-96`).
    """
    n = len(paths)
    out = np.zeros((n, target_len), np.float32)
    status = np.zeros((n,), np.int64)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    _lib.load_batch(
        c_paths,
        n,
        target_sr,
        target_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n_threads,
    )
    return out, status.tolist()
