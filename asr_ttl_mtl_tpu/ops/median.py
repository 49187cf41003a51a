"""Median filter along the last axis.

Equivalent of reference `whisper/timing.py:19-54` + the templated Triton
bubble-sort kernel (`triton_ops.py:43-95`). On TPU there is nothing to
hand-write: reflect-pad + windowed gather + `jnp.sort` compiles to one fused
XLA op over the (…, T, width) unfold — the same sort trick the reference's
CPU fallback uses (`timing.py:49`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def median_filter(x, filter_width: int):
    """Median filter of odd width along the last dimension, reflect-padded.

    Accepts numpy or jax arrays (any leading dims); returns the same kind.
    Inputs shorter than pad width are returned unchanged (reference
    timing.py:22-24).
    """
    assert filter_width > 0 and filter_width % 2 == 1, \
        "`filter_width` should be an odd number"
    pad_width = filter_width // 2
    if x.shape[-1] <= pad_width:
        return x

    is_np = isinstance(x, np.ndarray)
    xp = np if is_np else jnp
    padded = xp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(pad_width, pad_width)], mode="reflect"
    )
    T = x.shape[-1]
    idx = np.arange(T)[:, None] + np.arange(filter_width)[None, :]
    windows = padded[..., idx]  # (..., T, width)
    return xp.sort(windows, axis=-1)[..., pad_width]
