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
from dataclasses import dataclass
from functools import lru_cache
from typing import TYPE_CHECKING, List

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
        weights = (weights - mean) / std
        weights = median_filter(weights, medfilt_width)
        matrix = weights.mean(axis=0)
    matrix = matrix[len(tokenizer.sot_sequence) : -1]
    # on TPU the wavefront DP fill runs as the Pallas kernel (ops/pallas_dtw.py,
    # the reference's triton_ops.py:13-40 equivalent); host numpy elsewhere
    text_indices, time_indices = dtw(
        -matrix, use_device=jax.default_backend() == "tpu"
    )

    words, word_tokens = tokenizer.split_to_word_tokens(list(text_tokens) + [tokenizer.eot])
    if len(word_tokens) <= 1:
        # a single EOT "word" produces empty float indices downstream
        # (reference timing.py:219-225)
        return []
    word_boundaries = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))

    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] / TOKENS_PER_SECOND
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[word_boundaries[1:]]
    word_probabilities = [
        np.mean(text_token_probs[i:j])
        for i, j in zip(word_boundaries[:-1], word_boundaries[1:])
    ]

    return [
        WordTiming(word, tokens_, start, end, probability)
        for word, tokens_, start, end, probability in zip(
            words, word_tokens, start_times, end_times, word_probabilities
        )
    ]


def _softmax_np(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def merge_punctuations(alignment: List[WordTiming], prepended: str, appended: str):
    """Reference timing.py:245-276."""
    # merge prepended punctuations
    i = len(alignment) - 2
    j = len(alignment) - 1
    while i >= 0:
        previous = alignment[i]
        following = alignment[j]
        if previous.word.startswith(" ") and previous.word.strip() in prepended:
            following.word = previous.word + following.word
            following.tokens = previous.tokens + following.tokens
            previous.word = ""
            previous.tokens = []
        else:
            j = i
        i -= 1

    # merge appended punctuations
    i = 0
    j = 1
    while j < len(alignment):
        previous = alignment[i]
        following = alignment[j]
        if not previous.word.endswith(" ") and following.word in appended:
            previous.word = previous.word + following.word
            previous.tokens = previous.tokens + following.tokens
            following.word = ""
            following.tokens = []
        else:
            i = j
        j += 1


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
    **kwargs,
):
    """Reference timing.py:279-388."""
    if len(segments) == 0:
        return

    text_tokens_per_segment = [
        [token for token in segment["tokens"] if token < tokenizer.eot]
        for segment in segments
    ]
    text_tokens = list(itertools.chain.from_iterable(text_tokens_per_segment))
    alignment = find_alignment(model, tokenizer, text_tokens, mel, num_frames, **kwargs)
    word_durations = np.array([t.end - t.start for t in alignment])
    word_durations = word_durations[word_durations.nonzero()]
    median_duration = np.median(word_durations) if len(word_durations) > 0 else 0.0
    median_duration = min(0.7, float(median_duration))
    max_duration = median_duration * 2

    # truncate long words at sentence boundaries (reference heuristic)
    if len(word_durations) > 0:
        sentence_end_marks = ".。!！?？"
        for i in range(1, len(alignment)):
            if alignment[i].end - alignment[i].start > max_duration:
                if alignment[i].word in sentence_end_marks:
                    alignment[i].end = alignment[i].start + max_duration
                elif alignment[i - 1].word in sentence_end_marks:
                    alignment[i].start = alignment[i].end - max_duration

    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    time_offset = segments[0]["seek"] * HOP_LENGTH / SAMPLE_RATE
    word_index = 0

    for segment, seg_text_tokens in zip(segments, text_tokens_per_segment):
        saved_tokens = 0
        words = []

        while word_index < len(alignment) and saved_tokens < len(seg_text_tokens):
            timing = alignment[word_index]
            if timing.word:
                words.append(
                    dict(
                        word=timing.word,
                        start=round(time_offset + timing.start, 2),
                        end=round(time_offset + timing.end, 2),
                        probability=timing.probability,
                    )
                )
            saved_tokens += len(timing.tokens)
            word_index += 1

        # truncate long words at segment boundaries (reference heuristic)
        if len(words) > 0:
            if words[0]["end"] - last_speech_timestamp > median_duration * 4 and (
                words[0]["end"] - words[0]["start"] > max_duration
                or (
                    len(words) > 1
                    and words[1]["end"] - words[0]["start"] > max_duration * 2
                )
            ):
                if len(words) > 1 and words[1]["end"] - words[1]["start"] > max_duration:
                    boundary = max(words[1]["end"] / 2, words[1]["end"] - max_duration)
                    words[0]["end"] = words[1]["start"] = boundary
                words[0]["start"] = max(0, words[0]["end"] - max_duration)

            # prefer segment-level timestamps when the edge words are too long
            if segment["start"] < words[0]["end"] and segment["start"] - 0.5 > words[0]["start"]:
                words[0]["start"] = max(
                    0, min(words[0]["end"] - median_duration, segment["start"])
                )
            else:
                segment["start"] = words[0]["start"]

            if segment["end"] > words[-1]["start"] and segment["end"] + 0.5 < words[-1]["end"]:
                words[-1]["end"] = max(words[-1]["start"] + median_duration, segment["end"])
            else:
                segment["end"] = words[-1]["end"]

            last_speech_timestamp = segment["end"]

        segment["words"] = words
