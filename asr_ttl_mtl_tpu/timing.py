"""Word-level timestamps from cross-attention alignment.

Behavioral parity with reference `whisper/timing.py:154-388`
(find_alignment, merge_punctuations, add_word_timestamps): teacher-forced
forward capturing cross-attention QK, per-head normalization + median filter,
DTW over the negated attention matrix, word splitting, then the boundary /
punctuation / anomaly-duration heuristics.

TPU re-design: the reference installs forward hooks and disables SDPA to leak
QK matrices out of torch modules (timing.py:185-201); here the functional
decoder simply *returns* the fp32 pre-softmax cross-attention logits
(`decoder_apply(..., return_cross_qk=True)`), and the whole capture +
normalize + median-filter pipeline is one jitted program. Only the DTW
backtrace walks on host.
"""

from __future__ import annotations

import itertools
import warnings
from dataclasses import dataclass
from functools import lru_cache
from typing import TYPE_CHECKING, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .audio import HOP_LENGTH, SAMPLE_RATE, TOKENS_PER_SECOND
from .ops.dtw import dtw
from .ops.median import median_filter
from .tokenizer import Tokenizer

if TYPE_CHECKING:
    from .models.registry import WhisperModel


@dataclass
class WordTiming:
    word: str
    tokens: List[int]
    start: float
    end: float
    probability: float


@lru_cache(maxsize=32)
def _build_alignment_forward(dims, head_pairs, compute_dtype_name: str, medfilt_width: int):
    """Jitted: mel + tokens -> (text-token probs context, filtered attention
    matrix ready for DTW). head_pairs is a static tuple of (layer, head)."""
    from .models import whisper as W

    compute_dtype = jnp.dtype(compute_dtype_name)
    layers = np.asarray([p[0] for p in head_pairs])
    heads = np.asarray([p[1] for p in head_pairs])

    def run(params, mel, tokens, qk_scale, num_frames_tokens):
        feats = W.encoder_apply(params, dims, mel, compute_dtype)
        logits, _, cross_qk = W.decoder_apply(
            params, dims, tokens, feats, compute_dtype=compute_dtype,
            return_cross_qk=True,
        )
        # cross_qk: (L, B=1, H, T_text, T_audio) fp32 pre-softmax
        weights = cross_qk[layers, 0, heads]  # (n_sel, T_text, T_audio)
        # mask frames beyond the real segment, then softmax over audio time
        # (equivalent to the reference's pre-softmax slice, timing.py:208-209;
        # the slice length is dynamic so masking keeps this jit-compiled once)
        frame_ids = jnp.arange(weights.shape[-1])
        frame_mask = frame_ids[None, None, :] < num_frames_tokens
        weights = jnp.where(frame_mask, weights * qk_scale, -jnp.inf)
        weights = jax.nn.softmax(weights, axis=-1)
        return logits[0], weights

    return jax.jit(run)


def find_alignment(
    model: "WhisperModel",
    tokenizer: Tokenizer,
    text_tokens: List[int],
    mel: jnp.ndarray,
    num_frames: int,
    *,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
) -> List[WordTiming]:
    """Reference timing.py:163-242."""
    if len(text_tokens) == 0:
        return []

    tokens = [
        *tokenizer.sot_sequence,
        tokenizer.no_timestamps,
        *text_tokens,
        tokenizer.eot,
    ]
    head_pairs = tuple(
        (int(l), int(h)) for l, h in np.argwhere(model.alignment_heads)
    )
    fwd = _build_alignment_forward(
        model.dims, head_pairs, jnp.dtype(model.compute_dtype).name, medfilt_width
    )
    mel = jnp.asarray(mel)
    if mel.ndim == 2:
        mel = mel[None]
    logits, weights = fwd(
        model.params,
        mel,
        jnp.asarray([tokens], jnp.int32),
        jnp.asarray(qk_scale, jnp.float32),
        jnp.asarray(num_frames // 2, jnp.int32),
    )

    logits = np.asarray(logits)
    sampled_logits = logits[len(tokenizer.sot_sequence) :, : tokenizer.eot]
    token_probs = _softmax_np(sampled_logits)
    text_token_probs = token_probs[np.arange(len(text_tokens)), text_tokens].tolist()

    # slice to the real segment, standardize across tokens (biased std) and
    # median-filter (reference timing.py:207-216)
    if jax.default_backend() == "tpu":
        # keep the (heads, tokens, frames) block on device: standardize +
        # Pallas median (the reference's triton median_kernel equivalent,
        # triton_ops.py:43-95) without a host round-trip
        from .ops.pallas_median import median_filter_pallas

        w = jnp.asarray(weights, jnp.float32)[:, :, : num_frames // 2]
        mean = w.mean(axis=-2, keepdims=True)
        std = w.std(axis=-2, keepdims=True)
        w = median_filter_pallas((w - mean) / std, medfilt_width)
        matrix = np.asarray(w.mean(axis=0), dtype=np.float64)
    else:
        weights = np.asarray(weights, dtype=np.float64)[:, :, : num_frames // 2]
        mean = weights.mean(axis=-2, keepdims=True)
        std = weights.std(axis=-2, keepdims=True)
        # a zero-variance column yields NaN exactly like the reference's torch
        # standardization (timing.py:207-212); suppress numpy's warning only
        with np.errstate(invalid="ignore", divide="ignore"):
            weights = (weights - mean) / std
        weights = median_filter(weights, medfilt_width)
        matrix = weights.mean(axis=0)
    matrix = matrix[len(tokenizer.sot_sequence) : -1]
    # on TPU the wavefront DP fill runs as the Pallas kernel (ops/pallas_dtw.py,
    # the reference's triton_ops.py:13-40 equivalent); host numpy elsewhere
    text_indices, time_indices = dtw(
        -matrix, use_device=jax.default_backend() == "tpu"
    )

    return _word_timings_from_path(
        tokenizer, list(text_tokens), text_indices, time_indices, text_token_probs
    )


def _word_timings_from_path(
    tokenizer: Tokenizer,
    text_tokens: List[int],
    text_indices: np.ndarray,
    time_indices: np.ndarray,
    text_token_probs: List[float],
) -> List[WordTiming]:
    """DTW path -> per-word extents."""
    words, word_tokens = tokenizer.split_to_word_tokens(text_tokens + [tokenizer.eot])
    if len(word_tokens) <= 1:
        # a single EOT "word" produces empty float indices downstream
        # (reference timing.py:219-225)
        return []

    # first DTW frame of each text token, then word extents from the token
    # count prefix sums ([0, c0, c0+c1, ...]; the EOT pseudo-word closes the
    # last real word)
    entered_token = np.diff(text_indices, prepend=-1).astype(bool)
    token_start_times = time_indices[entered_token] / TOKENS_PER_SECOND
    edges = np.concatenate([[0], np.cumsum([len(t) for t in word_tokens[:-1]])])

    timings = []
    for word, tokens_, lo, hi in zip(words, word_tokens, edges[:-1], edges[1:]):
        timings.append(
            WordTiming(
                word,
                tokens_,
                start=token_start_times[lo],
                end=token_start_times[hi],
                probability=float(np.mean(text_token_probs[lo:hi])),
            )
        )
    return timings


_TOKEN_BUCKETS = (64, 128, 192, 256, 320, 384, 448)


@lru_cache(maxsize=16)
def _build_alignment_forward_batch(
    dims, head_pairs, compute_dtype_name: str, bucket_len: int, eot: int,
    medfilt_width: int, from_features: bool = False,
):
    """Jitted batched teacher-forced alignment forward: B window mels +
    padded token rows -> (per-window DTW cost matrix, per-position probability
    of the teacher-forced next token).

    The whole alignment pipeline — QK capture, masked softmax, per-column
    standardization, median filter, alignment-head mean — runs on device, so
    the host fetches only a (B, T_text, T_audio) matrix instead of the
    (n_heads, B, T_text, T_audio) raw attention block (~n_heads x less D2H:
    on the tunnel-attached chip the raw fetch dominated the whole batched
    path). Per-row frame/token lengths are honored by masking:
    * standardization statistics count only the real token rows, and
    * the median filter reflects at each row's true frame boundary (the same
      reflect-pad `ops.median.median_filter` applies after cropping),
    so cropped results match the single-window path column-for-column."""
    from .models import whisper as W
    from .ops.chunked_xent import chunked_softmax_xent

    compute_dtype = jnp.dtype(compute_dtype_name)
    half = medfilt_width // 2

    def run(params, mels, tokens, frame_lens, row_lens, qk_scale):
        if from_features:
            # mels ARE the decode phase's captured encoder features — the
            # same deterministic encoder output, so matrices are unchanged
            # (words mode, transcribe_batch._FeatureStore)
            feats = mels.astype(compute_dtype)
        else:
            feats = W.encoder_apply(params, dims, mels, compute_dtype)
        # only the alignment head pairs' QK rows are captured — the full
        # (L, B, H, T_text, T_audio) fp32 stack is L*H/n_pairs larger and
        # was the batched program's HBM ceiling (14.7 GB at 320 base
        # windows); the decoder returns (n_sel, B, Tt, Ta) in pair order
        hidden, _, weights = W.decoder_apply(
            params, dims, tokens, feats, compute_dtype=compute_dtype,
            return_cross_qk=True, return_hidden=True,
            cross_qk_pairs=head_pairs,
        )
        n_audio = weights.shape[-1]
        frame_ok = jnp.arange(n_audio)[None, :] < frame_lens[:, None]  # (B, Ta)
        weights = jnp.where(
            frame_ok[None, :, None, :], weights * qk_scale, -jnp.inf
        )
        weights = jax.nn.softmax(weights, axis=-1)

        # standardize each frame column over the REAL token rows only
        # (columns past a row's frame_len hold exact zeros and are cropped
        # away on host; their std is 0, guarded to 1 to avoid 0/0)
        tok_ok = (jnp.arange(weights.shape[-2]) < row_lens[:, None])[None, :, :, None]
        cnt = row_lens.astype(jnp.float32)[None, :, None, None]
        masked = jnp.where(tok_ok, weights, 0.0)
        mean = masked.sum(axis=-2, keepdims=True) / cnt
        var = jnp.where(tok_ok, (weights - mean) ** 2, 0.0).sum(axis=-2, keepdims=True) / cnt
        std = jnp.sqrt(var)
        # deliberately unguarded: a zero-variance column divides to NaN
        # exactly as the reference's torch.std_mean-then-divide does
        # (timing.py:210-212) and as the single-window paths above do —
        # batched and sequential results must agree bit-for-bit in the
        # degenerate case too
        w = (weights - mean) / std

        # median filter along frames, reflecting at each row's true boundary:
        # gather window element j of column t from reflect(t + j - half) where
        # reflection happens at 0 and at frame_len-1 per batch row
        t = jnp.arange(n_audio)[None, :, None]          # (1, Ta, 1)
        j = jnp.arange(medfilt_width)[None, None, :]     # (1, 1, width)
        raw = t + j - half
        raw = jnp.abs(raw)                               # reflect at 0
        hi = jnp.maximum(frame_lens[:, None, None] - 1, 0)
        raw = jnp.where(raw > hi, 2 * hi - raw, raw)     # reflect at frame_len-1
        idx = jnp.clip(raw, 0, n_audio - 1)              # (B, Ta, width)

        def _filter_one_head(wh):  # (B, Tt, Ta) -> same, median over windows
            win = jnp.take_along_axis(
                wh[..., None], idx[:, None, :, :], axis=-2
            )  # (B, Tt, Ta, width)
            return jnp.sort(win, axis=-1)[..., half]

        # map over heads to bound the (…, width) unfold's transient footprint
        filt = jax.lax.map(_filter_one_head, w)
        # rows too short to pad are returned unfiltered (median_filter contract)
        filt = jnp.where((frame_lens > half)[None, :, None, None], filt, w)
        matrix = filt.mean(axis=0)                       # (B, Tt, Ta)

        # probability each position assigns its teacher-forced next token,
        # normalized over the text vocabulary only (as the single-window path
        # does with logits[:, :eot]) — computed per row-chunk from the hidden
        # states (ops/chunked_xent.py): picked = exp(logit[tgt] - logsumexp),
        # with the SAME f32-accumulated tied-embedding dot the materialized
        # path used, so values agree to ~1 ulp (exp-of-difference vs
        # softmax-then-gather). The fp32 (B, T_text, n_vocab) logits+softmax
        # pair — 2 x 7.7 GB at 320 base windows, the buffer-assignment OOM
        # that forced word_align_batch=80 (PERF.md round 5) — never exists
        # in the program; alignment memory is now O(row_chunk x n_vocab).
        next_ids = jnp.roll(tokens, -1, axis=1)  # last column is junk
        tgt = jnp.minimum(next_ids, eot - 1).astype(jnp.int32)
        nll, _ = chunked_softmax_xent(
            hidden, params["decoder"]["token_embedding"][:eot], tgt,
            ignore_index=-1,
        )
        picked = jnp.exp(-nll)
        return matrix, picked

    return jax.jit(run)


def find_alignment_batch(
    model: "WhisperModel",
    tokenizer: Tokenizer,
    token_lists: List[List[int]],
    mels: np.ndarray,
    num_frames_list: List[int],
    *,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
    batch_size: Optional[int] = None,
    use_device_dtw: Optional[bool] = None,
    features=None,
) -> List[List[WordTiming]]:
    """Batched :func:`find_alignment` over many 30 s windows at once.

    The expensive stages — teacher-forced encoder+decoder forward AND the
    standardize/median/head-mean alignment pipeline — run as ONE device
    program over the whole window batch (token rows padded to a static
    bucket, per-row lengths honored by masking inside the program). On TPU
    (``use_device_dtw`` None/True) the per-row DTW fill runs as a batched
    Pallas wavefront kernel and the backtrace as a vmapped while_loop in the
    SAME dispatch chain, so only the (B, L) path index arrays cross the
    device boundary (~90x less D2H than the cost matrices) and chunks are
    pipelined depth-2 (chunk c's path fetch + host word assembly overlaps
    chunk c+1's forward). Off-TPU (or on any kernel failure) the host walks
    each row's fetched matrix as before. Each row's result matches a
    single-window :func:`find_alignment` call to fp32 accuracy (words
    identical, timestamps within one DTW frame).
    """
    sot_len = len(tokenizer.sot_sequence)
    rows = [
        [*tokenizer.sot_sequence, tokenizer.no_timestamps, *txt, tokenizer.eot]
        for txt in token_lists
    ]
    out: List[List[WordTiming]] = [[] for _ in token_lists]
    live = [i for i, txt in enumerate(token_lists) if len(txt) > 0]
    if not live:
        return out

    longest = max(len(rows[i]) for i in live)
    # one token bucket for ALL chunks so every chunk reuses one program shape
    bucket = next((b for b in _TOKEN_BUCKETS if b >= longest), longest)

    head_pairs = tuple((int(l), int(h)) for l, h in np.argwhere(model.alignment_heads))
    # `features`: decode-phase encoder output (an object with
    # .gather(indices, pad_to) -> (chunk, n_audio_ctx, D), e.g.
    # transcribe._FeatureStore) — the forward skips its encoder pass and the
    # sampled windows' features are reused instead of recomputed (the second
    # teacher-forced encoder was the dominant cost of words mode, PERF.md).
    fwd = _build_alignment_forward_batch(
        model.dims, head_pairs, jnp.dtype(model.compute_dtype).name, bucket,
        tokenizer.eot, medfilt_width, from_features=features is not None,
    )
    if features is None and not isinstance(mels, jnp.ndarray):
        mels = np.asarray(mels)  # device arrays stay resident (device gather)
    # chunk the fan-out: each window's cross-QK intermediate inside the
    # program is (layers, heads, bucket, T_audio) fp32 — tens of MB at base —
    # so aligning hundreds of windows in ONE program exhausts HBM even though
    # the (chunked) decode succeeded. The last chunk pads by repeating its
    # final row, keeping a single compiled shape per bucket.
    chunk = max(1, int(batch_size)) if batch_size else len(live)
    if use_device_dtw is None:
        use_device_dtw = jax.default_backend() == "tpu"
    interpret = use_device_dtw == "interpret"  # CPU integration tests

    def host_walk(part, matrices, picked):
        matrices = np.asarray(matrices, dtype=np.float64)
        for r, i in enumerate(part):
            n_row = len(rows[i])
            n_frames = num_frames_list[i] // 2
            matrix = matrices[r, :n_row, :n_frames][sot_len:-1]
            text_indices, time_indices = dtw(-matrix)
            token_probs = picked[r, sot_len : sot_len + len(token_lists[i])].tolist()
            out[i] = _word_timings_from_path(
                tokenizer, list(token_lists[i]), text_indices, time_indices,
                token_probs,
            )

    def path_walk(part, paths, picked):
        for r, i in enumerate(part):
            token_probs = picked[r, sot_len : sot_len + len(token_lists[i])].tolist()
            out[i] = _word_timings_from_path(
                tokenizer, list(token_lists[i]), paths[r][0], paths[r][1],
                token_probs,
            )

    pending: List[tuple] = []  # (part, paths_handles|matrices, picked)

    def drain_one():
        nonlocal use_device_dtw
        part, handles, picked = pending.pop(0)
        picked = np.asarray(picked)
        if handles[0] is not None:
            from .ops.pallas_dtw import dtw_paths_collect

            try:
                path_walk(part, dtw_paths_collect(handles[0]), picked)
                return
            except Exception as e:
                # kernel failed at run time: host-walk this chunk from the
                # still-live matrices, and stop using the kernel
                warnings.warn(
                    f"device DTW collect failed ({e!r}); falling back to the "
                    "host matrix walk for the rest of this call"
                )
                use_device_dtw = False
        host_walk(part, handles[1], picked)

    for c0 in range(0, len(live), chunk):
        part = live[c0 : c0 + chunk]
        pad = chunk - len(part) if len(live) > chunk else 0
        idx = part + [part[-1]] * pad
        tokens = np.full((len(idx), bucket), tokenizer.eot, np.int32)
        for r, i in enumerate(idx):
            tokens[r, : len(rows[i])] = rows[i]
        frame_lens = [num_frames_list[i] // 2 for i in idx]
        row_lens = [len(rows[i]) for i in idx]
        if features is not None:
            fwd_input = features.gather(idx)
        else:
            fwd_input = jnp.asarray(mels[np.asarray(idx)])
        matrices, picked = fwd(
            model.params,
            fwd_input,
            jnp.asarray(tokens),
            jnp.asarray(frame_lens, jnp.int32),
            jnp.asarray(row_lens, jnp.int32),
            jnp.asarray(qk_scale, jnp.float32),
        )
        handles = (None, matrices)
        if use_device_dtw:
            from .ops.pallas_dtw import dtw_paths_dispatch

            try:
                # device matrices consumed in place: slice off the SOT rows
                # and negate on device, dispatch fill+backtrace, never fetch
                # the matrices
                handles = (
                    dtw_paths_dispatch(
                        -matrices[:, sot_len:, :],
                        [n - sot_len - 1 for n in row_lens],
                        frame_lens,
                        interpret=interpret,
                    ),
                    matrices,
                )
            except Exception as e:
                warnings.warn(
                    f"device DTW dispatch failed ({e!r}); falling back to the "
                    "host matrix walk for the rest of this call"
                )
                use_device_dtw = False
        pending.append((part, handles, picked))
        if len(pending) >= 2:
            drain_one()
    while pending:
        drain_one()
    return out


def _softmax_np(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def _absorb_opening_punct(alignment: List[WordTiming], marks: str) -> None:
    """Right-to-left sweep: a floating opening mark (a word like ' "' whose
    stripped text appears in ``marks``) glues onto the word after it. Chains
    of marks accumulate onto the same anchor; emptied entries stay in place
    so token accounting per segment is undisturbed."""
    anchor: Optional[WordTiming] = None
    for entry in reversed(alignment):
        is_mark = entry.word.startswith(" ") and entry.word.strip() in marks
        if anchor is not None and is_mark:
            anchor.word = entry.word + anchor.word
            anchor.tokens = entry.tokens + anchor.tokens
            entry.word, entry.tokens = "", []
        else:
            anchor = entry


def _absorb_closing_punct(alignment: List[WordTiming], marks: str) -> None:
    """Left-to-right sweep: a closing mark glues onto the word before it,
    unless that word already ends with a space (i.e. the mark starts its own
    word)."""
    anchor: Optional[WordTiming] = None
    for entry in alignment:
        if anchor is not None and entry.word in marks and not anchor.word.endswith(" "):
            anchor.word = anchor.word + entry.word
            anchor.tokens = anchor.tokens + entry.tokens
            entry.word, entry.tokens = "", []
        else:
            anchor = entry


def merge_punctuations(alignment: List[WordTiming], prepended: str, appended: str):
    """Reference timing.py:245-276 semantics, as two anchor-scan passes."""
    _absorb_opening_punct(alignment, prepended)
    _absorb_closing_punct(alignment, appended)


_SENTENCE_ENDS = ".。!！?？"


def _typical_duration(alignment: List[WordTiming]) -> Tuple[float, float, bool]:
    """(median word duration capped at 0.7 s, 2x ceiling, any-nonzero flag)."""
    spans = [t.end - t.start for t in alignment if t.end - t.start != 0.0]
    if not spans:
        return 0.0, 0.0, False
    median = min(0.7, float(np.median(spans)))
    return median, median * 2, True


def _shorten_stretched_sentence_ends(alignment: List[WordTiming], ceiling: float) -> None:
    """An overlong word at a sentence boundary usually swallowed silence:
    clip a trailing period to its start side, and a word right after one to
    its end side."""
    for before, entry in zip(alignment, alignment[1:]):
        if entry.end - entry.start <= ceiling:
            continue
        if entry.word in _SENTENCE_ENDS:
            entry.end = entry.start + ceiling
        elif before.word in _SENTENCE_ENDS:
            entry.start = entry.end - ceiling


def _pop_segment_words(
    alignment: List[WordTiming], cursor: int, token_budget: int, time_offset: float
) -> Tuple[List[dict], int]:
    """Consume alignment entries covering ``token_budget`` text tokens;
    emptied (merged-away) entries spend their token count but emit nothing."""
    words: List[dict] = []
    spent = 0
    while cursor < len(alignment) and spent < token_budget:
        entry = alignment[cursor]
        if entry.word:
            words.append(
                dict(
                    word=entry.word,
                    start=round(time_offset + entry.start, 2),
                    end=round(time_offset + entry.end, 2),
                    probability=entry.probability,
                )
            )
        spent += len(entry.tokens)
        cursor += 1
    return words, cursor


def _snap_segment_edges(
    segment: dict,
    words: List[dict],
    *,
    median: float,
    ceiling: float,
    last_speech_timestamp: float,
) -> float:
    """Reconcile word-level and segment-level timestamps at the edges
    (reference timing.py:340-374); returns the updated speech high-water
    mark."""
    first, last = words[0], words[-1]

    # a first word stranded long after the previous speech, stretched well
    # past the ceiling, is an alignment artifact: pull its start in
    stranded = first["end"] - last_speech_timestamp > median * 4
    stretched = first["end"] - first["start"] > ceiling or (
        len(words) > 1 and words[1]["end"] - first["start"] > ceiling * 2
    )
    if stranded and stretched:
        if len(words) > 1 and words[1]["end"] - words[1]["start"] > ceiling:
            boundary = max(words[1]["end"] / 2, words[1]["end"] - ceiling)
            first["end"] = words[1]["start"] = boundary
        first["start"] = max(0, first["end"] - ceiling)

    # prefer the segment-level timestamp when the edge word reaches too far
    # outside the segment; otherwise let the word define the segment edge
    if segment["start"] < first["end"] and segment["start"] - 0.5 > first["start"]:
        first["start"] = max(0, min(first["end"] - median, segment["start"]))
    else:
        segment["start"] = first["start"]

    if segment["end"] > last["start"] and segment["end"] + 0.5 < last["end"]:
        last["end"] = max(last["start"] + median, segment["end"])
    else:
        segment["end"] = last["end"]

    return segment["end"]


def add_word_timestamps(
    *,
    segments: List[dict],
    model: "WhisperModel",
    tokenizer: Tokenizer,
    mel: jnp.ndarray,
    num_frames: int,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    last_speech_timestamp: float,
    alignment: Optional[List[WordTiming]] = None,
    **kwargs,
):
    """Reference timing.py:279-388 semantics.

    ``alignment`` short-circuits the per-window forward with a precomputed
    one (the batched path aligns many windows in one device program via
    :func:`find_alignment_batch` and applies the heuristics per window)."""
    if len(segments) == 0:
        return

    tokens_per_segment = [
        [token for token in segment["tokens"] if token < tokenizer.eot]
        for segment in segments
    ]
    if alignment is None:
        all_text_tokens = list(itertools.chain.from_iterable(tokens_per_segment))
        alignment = find_alignment(model, tokenizer, all_text_tokens, mel, num_frames, **kwargs)

    median, ceiling, have_spans = _typical_duration(alignment)
    if have_spans:
        _shorten_stretched_sentence_ends(alignment, ceiling)
    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    time_offset = segments[0]["seek"] * HOP_LENGTH / SAMPLE_RATE
    cursor = 0
    for segment, seg_tokens in zip(segments, tokens_per_segment):
        words, cursor = _pop_segment_words(alignment, cursor, len(seg_tokens), time_offset)
        if words:
            last_speech_timestamp = _snap_segment_edges(
                segment,
                words,
                median=median,
                ceiling=ceiling,
                last_speech_timestamp=last_speech_timestamp,
            )
        segment["words"] = words
