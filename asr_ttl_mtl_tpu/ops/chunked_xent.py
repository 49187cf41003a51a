"""Chunked softmax cross-entropy over the tied-embedding projection —
the (B, T, n_vocab) training logits tensor is never materialized.

The reference trains with `nn.CrossEntropyLoss(ignore_index=-100)` over the
full teacher-forced logits (speech_disorder/trainer.py:92-93). Materializing
those logits is the largest single training activation: bf16 (B, T, 51869)
is 0.6 GB at base bs=128/T=48 and ~6 GB at the T=448 token bucket, and its
forward store + backward dlogits are pure HBM roofline traffic (~18.5 ms of
the 139 ms tiny bs=64 step in round 4). Measured effect (PERF.md round 5):
device step time at parity with the materialized path (base bs=64: 283 ms,
MFU 16.9%); compile-time peak-HBM drops by the logits tensor's un-reusable
share — 0.33 GB at base-128/T=48 (XLA already aliased most of the logit
buffers at that short bucket), growing with B*T toward the full multi-GB
tensor at the T=192/448 buckets (see scripts/tpu_mem_analysis.py).

This op computes the identical loss per row-chunk from the (B, T, d) hidden
states instead:

  forward   per chunk: logits = x_c @ W^T (f32 accum), per-token
            logsumexp + target gather + argmax; only (N,) vectors survive.
  backward  per chunk (custom VJP): recompute the logits chunk, form
            dlogits = g * (softmax - onehot(target)) in registers, and
            contract immediately into dx_c = dlogits @ W and
            dW += dlogits^T @ x_c.

Peak transient drops from O(B*T*V) to O(R*V) (R = row_chunk, default 512:
~106 MB f32 at V=51869) plus the (V, d) f32 dW accumulator. FLOP cost is
one extra logits matmul in the backward (4 N*d*V matmuls vs the
materialized path's 3) — a few ms, traded for deleting multi-hundred-MB
HBM stores and the OOM wall. All reductions run in f32 regardless of the
compute dtype, so the chunked loss is at least as accurate as the bf16
logit-store path it replaces.

The softmax statistics (per-token logsumexp) are saved from the forward and
reused in the backward, so fwd/bwd see the same normalizer bit-for-bit.

XLA semantics note: the chunk loop is a `lax.scan` over statically-shaped
(R, d) slices — one compiled matmul program regardless of N, MXU-friendly
(R x V x d with R >= 256), no dynamic shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32


def _num_chunks(n: int, row_chunk: int) -> int:
    return max(1, (n + row_chunk - 1) // row_chunk)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _xent_core(
    hidden: jnp.ndarray,   # (N, D) compute dtype
    embed: jnp.ndarray,    # (V, D) param dtype (fp32 master)
    targets: jnp.ndarray,  # (N,) int32, ignore_index marks padding
    ignore_index: int,
    num_chunks: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    loss, preds, _lse = _forward(hidden, embed, targets, ignore_index, num_chunks)
    return loss, preds


def _forward(hidden, embed, targets, ignore_index, num_chunks):
    n, d = hidden.shape
    r = n // num_chunks
    assert r * num_chunks == n, (n, num_chunks)
    w_t = embed.T.astype(hidden.dtype)  # (D, V), same cast as decoder_apply

    xs = (hidden.reshape(num_chunks, r, d), targets.reshape(num_chunks, r))

    def chunk(_, x):
        x_c, t_c = x
        logits = jnp.matmul(x_c, w_t, preferred_element_type=_F32)  # (R, V) f32
        lse = jax.nn.logsumexp(logits, axis=-1)
        valid = t_c != ignore_index
        safe_t = jnp.where(valid, t_c, 0)
        tgt = jnp.take_along_axis(logits, safe_t[:, None], axis=-1)[:, 0]
        loss_c = jnp.where(valid, lse - tgt, 0.0)
        preds_c = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (), (loss_c, preds_c, lse)

    _, (loss, preds, lse) = jax.lax.scan(chunk, (), xs)
    return loss.reshape(n), preds.reshape(n), lse.reshape(n)


def _xent_fwd(hidden, embed, targets, ignore_index, num_chunks):
    loss, preds, lse = _forward(hidden, embed, targets, ignore_index, num_chunks)
    return (loss, preds), (hidden, embed, targets, lse)


def _xent_bwd(ignore_index, num_chunks, res, cts):
    hidden, embed, targets, lse = res
    g_loss, _g_preds = cts  # g_preds is float0 (integer output)
    n, d = hidden.shape
    v = embed.shape[0]
    r = n // num_chunks
    w_t = embed.T.astype(hidden.dtype)
    w_f32 = embed.astype(_F32)

    xs = (
        hidden.reshape(num_chunks, r, d),
        targets.reshape(num_chunks, r),
        lse.reshape(num_chunks, r),
        g_loss.reshape(num_chunks, r).astype(_F32),
    )

    def chunk(dw, x):
        x_c, t_c, lse_c, g_c = x
        logits = jnp.matmul(x_c, w_t, preferred_element_type=_F32)  # recompute
        p = jnp.exp(logits - lse_c[:, None])  # softmax w/ the fwd normalizer
        valid = t_c != ignore_index
        coeff = jnp.where(valid, g_c, 0.0)  # (R,)
        dlogits = p * coeff[:, None]
        safe_t = jnp.where(valid, t_c, 0)
        dlogits = dlogits.at[jnp.arange(r), safe_t].add(-coeff)
        dx_c = jnp.matmul(dlogits, w_f32, preferred_element_type=_F32)
        dw = dw + jnp.matmul(
            dlogits.T, x_c.astype(_F32), preferred_element_type=_F32
        )
        return dw, dx_c.astype(hidden.dtype)

    dw0 = jnp.zeros((v, d), _F32)
    dw, dx = jax.lax.scan(chunk, dw0, xs)
    return dx.reshape(n, d), dw.astype(embed.dtype), None


_xent_core.defvjp(_xent_fwd, _xent_bwd)


def chunked_softmax_xent(
    hidden: jnp.ndarray,   # (B, T, D)
    embed: jnp.ndarray,    # (V, D) tied embedding table
    targets: jnp.ndarray,  # (B, T) int32
    *,
    ignore_index: int = -100,
    row_chunk: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Token cross-entropy -log softmax(x @ W^T)[target] without
    materializing the (B, T, V) logits.

    Returns (token_loss (B, T) f32 — 0.0 at ignored positions, and
    pred_tokens (B, T) int32 — the argmax over the vocab, matching
    jnp.argmax over f32-accumulated logits).

    Rows are flattened to (B*T, D) and padded (with ignore_index targets,
    contributing exactly zero loss and gradient) up to a multiple of
    `row_chunk`, then processed by a scan of static (row_chunk, V) blocks.
    """
    b, t, d = hidden.shape
    n = b * t
    h2 = hidden.reshape(n, d)
    t1 = targets.reshape(n).astype(jnp.int32)
    if n <= row_chunk:
        chunks, n_pad = 1, n  # single small chunk, no padding needed
    else:
        chunks = _num_chunks(n, row_chunk)
        n_pad = chunks * row_chunk
    if n_pad != n:
        h2 = jnp.pad(h2, ((0, n_pad - n), (0, 0)))
        t1 = jnp.pad(t1, (0, n_pad - n), constant_values=ignore_index)
    loss, preds = _xent_core(h2, embed, t1, ignore_index, chunks)
    return loss[:n].reshape(b, t), preds[:n].reshape(b, t)
