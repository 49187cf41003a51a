"""Long-form transcription: host-side sliding-window pipeline.

Behavioral parity with reference ``whisper/transcribe.py:38-514``: 30 s of
silence padding, seek-pointer windowing, temperature-fallback ladder,
no-speech skipping, consecutive-timestamp segment splitting, prompt
conditioning (``condition_on_previous_text`` / ``carry_initial_prompt``),
clip_timestamps windows, word timestamps and the hallucination-silence
heuristics — all verified by the differential tests in tests/test_transcribe*.

The pipeline is decomposed into small host-side pieces this framework owns:
:class:`QualityGates` (the ladder's accept/retry/silence verdicts, shared by
the sequential and the batched ladder), :func:`options_at_temperature`
(per-rung option pruning), :func:`_cut_segments` (timestamp-pair splitting of
a window's token run), and the hallucination scoring helpers. The seek loop
itself is I/O + control and stays Python (as the reference's does); every
window decode is a single compiled XLA program (see decoding.py). For
throughput-oriented batch transcription of many files, see
:func:`transcribe_batch`.
"""

from __future__ import annotations

import os
import threading
import warnings
from dataclasses import dataclass
from functools import partial
from typing import TYPE_CHECKING, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import tqdm

from .audio import (
    FRAMES_PER_SECOND,
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    log_mel_spectrogram,
    pad_or_trim,
)
from .decoding import DecodingOptions, DecodingResult
from .tokenizer import LANGUAGES, get_tokenizer, normalize_language
from .utils import exact_div, format_timestamp, get_end, make_safe

if TYPE_CHECKING:
    from .models.registry import WhisperModel

_PUNCTUATION = "\"'“¿([{-\"'.。,，!！?？:：”)]}、"


def _frames_to_sec(frames) -> float:
    """Mel frames -> seconds (one frame = HOP_LENGTH/SAMPLE_RATE = 10 ms)."""
    return float(frames * HOP_LENGTH / SAMPLE_RATE)


def _sec_to_frames(seconds) -> int:
    return round(seconds * FRAMES_PER_SECOND)


# ---------------------------------------------------------------------------
# quality gates + temperature ladder (reference transcribe.py:184-224)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class QualityGates:
    """Acceptance thresholds applied to each window's decode result.

    ``None`` disables a gate. A window is *degenerate* (retry hotter) when its
    text compresses too well (repetition loop) or scores too low a mean
    logprob — unless the no-speech detector is confident the window is
    silence, which overrides both. A window is *silent* (skip entirely) when
    no-speech probability clears its threshold and the logprob gate does not
    vouch for the text.
    """

    compression_ratio: Optional[float] = 2.4
    logprob: Optional[float] = -1.0
    no_speech: Optional[float] = 0.6

    def degenerate(self, result: DecodingResult) -> bool:
        repetitive = (
            self.compression_ratio is not None
            and result.compression_ratio > self.compression_ratio
        )
        improbable = self.logprob is not None and result.avg_logprob < self.logprob
        if improbable and self.no_speech is not None and result.no_speech_prob > self.no_speech:
            return False  # confident silence: accept the window as-is
        return repetitive or improbable

    def silent_window(self, result: DecodingResult) -> bool:
        if self.no_speech is None or result.no_speech_prob <= self.no_speech:
            return False
        # a passing logprob vouches for the decoded text despite no-speech
        return not (self.logprob is not None and result.avg_logprob > self.logprob)


def options_at_temperature(decode_options: dict, t: float) -> DecodingOptions:
    """One rung of the ladder: beam search only at t==0, sampling candidates
    only at t>0 (the reference's per-temperature option pruning)."""
    opts = dict(decode_options)
    for key in ("beam_size", "patience") if t > 0 else ("best_of",):
        opts.pop(key, None)
    opts["temperature"] = t
    return DecodingOptions(**opts)


def _as_ladder(temperature: Union[float, Tuple[float, ...]]) -> Tuple[float, ...]:
    if isinstance(temperature, (int, float)):
        return (float(temperature),)
    return tuple(temperature)


# ---------------------------------------------------------------------------
# window token run -> segments (reference transcribe.py:339-399)
# ---------------------------------------------------------------------------


def _cut_segments(
    tokens: np.ndarray,
    tokenizer,
    *,
    time_offset: float,
    time_precision: float,
    segment_duration: float,
    segment_size: int,
    input_stride: int,
    make,
) -> Tuple[List[dict], int, bool]:
    """Split a window's token run into segments at consecutive-timestamp cuts.

    Returns (segments, frames_to_advance, single_timestamp_ending). ``make``
    builds one segment dict from (start, end, tokens).
    """
    stamp = np.asarray(tokens >= tokenizer.timestamp_begin)
    single_ending = len(tokens) >= 2 and bool(stamp[-1]) and not bool(stamp[-2])
    pos = lambda tok: int(tok) - tokenizer.timestamp_begin  # noqa: E731

    cuts = [i for i in range(1, len(tokens)) if stamp[i] and stamp[i - 1]]
    if cuts:
        bounds = cuts + [len(tokens)] if single_ending else cuts
        segments = [
            make(
                start=time_offset + pos(tokens[lo]) * time_precision,
                end=time_offset + pos(tokens[hi - 1]) * time_precision,
                tokens=tokens[lo:hi],
            )
            for lo, hi in zip([0] + bounds[:-1], bounds)
        ]
        if single_ending:
            advance = segment_size  # trailing silence: skip the whole window
        else:
            advance = pos(tokens[bounds[-1] - 1]) * input_stride
        return segments, advance, single_ending

    # no closed timestamp pair: one segment spanning to the last stamp (if any)
    duration = segment_duration
    stamps = tokens[stamp.nonzero()[0]]
    if len(stamps) and pos(stamps[-1]) != 0:
        duration = pos(stamps[-1]) * time_precision
    only = make(start=time_offset, end=time_offset + duration, tokens=tokens)
    return [only], segment_size, single_ending


def _build_segment(tokenizer, *, seek, start, end, tokens, result) -> dict:
    ids = [int(t) for t in tokens]
    return {
        "seek": seek,
        "start": start,
        "end": end,
        "text": tokenizer.decode([t for t in ids if t < tokenizer.eot]),
        "tokens": ids,
        "temperature": result.temperature,
        "avg_logprob": result.avg_logprob,
        "compression_ratio": result.compression_ratio,
        "no_speech_prob": result.no_speech_prob,
    }


# ---------------------------------------------------------------------------
# hallucination heuristics (reference transcribe.py:316-334, :418-472)
# ---------------------------------------------------------------------------


def _anomaly_score(word: dict) -> float:
    """Penalty for an implausible word: low probability, or a duration far
    from the plausible band (too brief weighted 15x, too drawn out 1x)."""
    duration = word["end"] - word["start"]
    return (
        (1.0 if word.get("probability", 0.0) < 0.15 else 0.0)
        + max(0.0, 0.133 - duration) * 15
        + max(0.0, duration - 2.0)
    )


def _is_hallucination(segment: Optional[dict]) -> bool:
    """A segment smells hallucinated when its first (up to 8) non-punctuation
    words are collectively anomalous: total penalty >= 3, or averaging about
    one penalty point per word."""
    if segment is None or not segment["words"]:
        return False
    words = [w for w in segment["words"] if w["word"] not in _PUNCTUATION][:8]
    score = sum(_anomaly_score(w) for w in words)
    return score >= 3 or score + 0.01 >= len(words)


def _first_with_words(segments: List[dict]) -> Optional[dict]:
    return next((s for s in segments if s["words"]), None)


def _drop_hallucinated_tail(
    segments: List[dict],
    *,
    threshold: float,
    time_offset: float,
    window_end_time: float,
    segment_duration: float,
    content_duration: float,
    content_frames: int,
    last_speech_timestamp: float,
) -> Optional[int]:
    """Find the first hallucination-looking segment bracketed by silence (or
    by further hallucinations); truncate the list there and return the frame
    to re-seek to. None = nothing dropped."""
    prev_speech_end = last_speech_timestamp
    for index, segment in enumerate(segments):
        if not segment["words"]:
            continue
        if _is_hallucination(segment):
            following = _first_with_words(segments[index + 1 :])
            next_speech_start = (
                following["words"][0]["start"]
                if following is not None
                else time_offset + segment_duration
            )
            quiet_before = (
                segment["start"] - prev_speech_end > threshold
                or segment["start"] < threshold
                or segment["start"] - time_offset < 2.0
            )
            quiet_after = (
                next_speech_start - segment["end"] > threshold
                or _is_hallucination(following)
                or window_end_time - segment["end"] < 2.0
            )
            if quiet_before and quiet_after:
                if content_duration - segment["end"] < threshold:
                    resume_at = content_frames  # hallucinated coda: stop here
                else:
                    resume_at = _sec_to_frames(max(time_offset + 1, segment["start"]))
                del segments[index:]
                return resume_at
        prev_speech_end = segment["end"]
    return None


# ---------------------------------------------------------------------------
# clip ranges
# ---------------------------------------------------------------------------


def _parse_clip_ranges(
    clip_timestamps: Union[str, List[float]], content_frames: int
) -> List[Tuple[int, int]]:
    """`"start,end,start2,end2,…"` seconds -> [(start_frame, end_frame), …];
    an unpaired final start runs to the end of the audio."""
    if isinstance(clip_timestamps, str):
        clip_timestamps = (
            [float(t) for t in clip_timestamps.split(",")] if clip_timestamps else []
        )
    edges = [_sec_to_frames(t) for t in clip_timestamps] or [0]
    if len(edges) % 2:
        edges = edges + [content_frames]
    return list(zip(edges[::2], edges[1::2]))


# ---------------------------------------------------------------------------
# the long-form pipeline
# ---------------------------------------------------------------------------


def transcribe(
    model: "WhisperModel",
    audio: Union[str, np.ndarray, jnp.ndarray],
    *,
    verbose: Optional[bool] = None,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    condition_on_previous_text: bool = True,
    initial_prompt: Optional[str] = None,
    carry_initial_prompt: bool = False,
    word_timestamps: bool = False,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    clip_timestamps: Union[str, List[float]] = "0",
    hallucination_silence_threshold: Optional[float] = None,
    **decode_options,
):
    """Transcribe an audio file or waveform; returns
    {"text", "segments", "language"} exactly like the reference API."""
    # mel for the whole file plus 30s of trailing silence for the last window
    mel = np.asarray(log_mel_spectrogram(audio, model.dims.n_mels, padding=N_SAMPLES))
    content_frames = mel.shape[-1] - N_FRAMES
    content_duration = _frames_to_sec(content_frames)

    language = normalize_language(decode_options.get("language"))
    decode_options["language"] = language
    if language is None:
        if model.is_multilingual:
            if verbose:
                print("Detecting language using up to the first 30 seconds...")
            head = pad_or_trim(mel, N_FRAMES, axis=-1)
            _, probs = model.detect_language(jnp.asarray(head))
            language = max(probs, key=probs.get)
            if verbose is not None:
                print(f"Detected language: {LANGUAGES[language].title()}")
        else:
            language = "en"
        decode_options["language"] = language

    task: str = decode_options.get("task", "transcribe")
    tokenizer = get_tokenizer(
        model.is_multilingual,
        num_languages=model.num_languages,
        language=language,
        task=task,
        include_diseases=model.has_disease_tokens,
    )
    if word_timestamps and task == "translate":
        warnings.warn("Word-level timestamps on translations may not be reliable.")

    gates = QualityGates(
        compression_ratio=compression_ratio_threshold,
        logprob=logprob_threshold,
        no_speech=no_speech_threshold,
    )
    ladder = _as_ladder(temperature)

    def decode_window(segment: np.ndarray) -> DecodingResult:
        result = None
        for t in ladder:
            result = model.decode(jnp.asarray(segment), options_at_temperature(decode_options, t))
            if not gates.degenerate(result):
                break
        return result

    input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)  # mel frames / token: 2
    time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE  # 0.02 s per token

    prompt_budget = model.dims.n_text_ctx // 2 - 1
    initial_prompt_tokens: List[int] = (
        tokenizer.encode(" " + initial_prompt.strip()) if initial_prompt is not None else []
    )
    prompt_budget -= len(initial_prompt_tokens)

    all_tokens: List[int] = list(initial_prompt_tokens)
    all_segments: List[dict] = []
    prompt_reset_since = 0
    last_speech_timestamp = 0.0

    progress = tqdm.tqdm(total=content_frames, unit="frames", disable=verbose is not False)
    with progress:
        for clip_start, clip_end in _parse_clip_ranges(clip_timestamps, content_frames):
            seek = clip_start
            while seek < clip_end:
                time_offset = _frames_to_sec(seek)
                window_end_time = _frames_to_sec(seek + N_FRAMES)
                segment_size = min(N_FRAMES, content_frames - seek, clip_end - seek)
                segment_duration = _frames_to_sec(segment_size)
                mel_segment = pad_or_trim(
                    mel[:, seek : seek + segment_size], N_FRAMES, axis=-1
                ).astype(np.float32)

                if carry_initial_prompt:
                    carried = all_tokens[max(len(initial_prompt_tokens), prompt_reset_since) :]
                    decode_options["prompt"] = (
                        initial_prompt_tokens + carried[-prompt_budget:]
                    )
                else:
                    decode_options["prompt"] = all_tokens[prompt_reset_since:]

                result = decode_window(mel_segment)

                if no_speech_threshold is not None and gates.silent_window(result):
                    seek += segment_size
                    continue

                previous_seek = seek
                tokens = np.asarray(result.tokens)

                def make(start, end, tokens):
                    return _build_segment(
                        tokenizer, seek=previous_seek, start=start, end=end,
                        tokens=tokens, result=result,
                    )

                current_segments, advance, single_ending = _cut_segments(
                    tokens,
                    tokenizer,
                    time_offset=time_offset,
                    time_precision=time_precision,
                    segment_duration=segment_duration,
                    segment_size=segment_size,
                    input_stride=input_stride,
                    make=make,
                )
                seek += advance

                if word_timestamps:
                    from .timing import add_word_timestamps

                    add_word_timestamps(
                        segments=current_segments,
                        model=model,
                        tokenizer=tokenizer,
                        mel=mel_segment,
                        num_frames=segment_size,
                        prepend_punctuations=prepend_punctuations,
                        append_punctuations=append_punctuations,
                        last_speech_timestamp=last_speech_timestamp,
                    )

                    if not single_ending:
                        spoken_until = get_end(current_segments)
                        if spoken_until is not None and spoken_until > time_offset:
                            # resume right after the last timed word
                            seek = _sec_to_frames(spoken_until)

                    if hallucination_silence_threshold is not None:
                        threshold = hallucination_silence_threshold
                        if not single_ending:
                            spoken_until = get_end(current_segments)
                            if spoken_until is not None and spoken_until > time_offset:
                                if window_end_time - spoken_until > threshold:
                                    seek = _sec_to_frames(spoken_until)
                                else:
                                    seek = previous_seek + segment_size

                        # a hallucination-like opener after leading silence:
                        # re-decode from where the speech actually starts
                        leading = _first_with_words(current_segments)
                        if leading is not None and _is_hallucination(leading):
                            gap = leading["start"] - time_offset
                            if gap > threshold:
                                seek = previous_seek + _sec_to_frames(gap)
                                continue

                        resume_at = _drop_hallucinated_tail(
                            current_segments,
                            threshold=threshold,
                            time_offset=time_offset,
                            window_end_time=window_end_time,
                            segment_duration=segment_duration,
                            content_duration=content_duration,
                            content_frames=content_frames,
                            last_speech_timestamp=last_speech_timestamp,
                        )
                        if resume_at is not None:
                            seek = resume_at

                    spoken_until = get_end(current_segments)
                    if spoken_until is not None:
                        last_speech_timestamp = spoken_until

                if verbose:
                    for segment in current_segments:
                        line = (
                            f"[{format_timestamp(segment['start'])} --> "
                            f"{format_timestamp(segment['end'])}] {segment['text']}"
                        )
                        print(make_safe(line))

                # blank out instantaneous / textless segments
                for segment in current_segments:
                    if segment["start"] == segment["end"] or not segment["text"].strip():
                        segment["text"] = ""
                        segment["tokens"] = []
                        segment["words"] = []

                for segment in current_segments:
                    all_segments.append({"id": len(all_segments), **segment})
                    all_tokens.extend(segment["tokens"])

                if not condition_on_previous_text or result.temperature > 0.5:
                    # hot decodes make unreliable prompts
                    prompt_reset_since = len(all_tokens)

                progress.update(min(content_frames, seek) - previous_seek)

    return dict(
        text=tokenizer.decode(all_tokens[len(initial_prompt_tokens) :]),
        segments=all_segments,
        language=language,
    )


@dataclass
class _Window:
    """One 30 s mel slice of one input, plus where it came from.

    `mel` is a host array on the host collection path, or None on the
    device-resident path (the window then lives at `_WindowStore` slot k)."""

    input_idx: int
    seek: int
    size: int  # un-padded frame count
    mel: Optional[np.ndarray]


def _collect_windows(
    model, audios, clip_timestamps: Union[str, List[float]]
) -> List[_Window]:
    windows: List[_Window] = []
    for idx, audio in enumerate(audios):
        mel = np.asarray(log_mel_spectrogram(audio, model.dims.n_mels, padding=N_SAMPLES))
        content_frames = max(mel.shape[-1] - N_FRAMES, 1)
        for clip_start, clip_end in _parse_clip_ranges(clip_timestamps, content_frames):
            seek = clip_start
            while seek < clip_end:
                size = max(1, min(N_FRAMES, content_frames - seek, clip_end - seek))
                padded = pad_or_trim(mel[:, seek : seek + size], N_FRAMES, axis=-1)
                windows.append(_Window(idx, seek, size, padded.astype(np.float32)))
                seek += size
    return windows


# --- device-resident windows -------------------------------------------------
# Through a remote-attached chip the host collection path moves every mel
# THREE times (audio up, full-file mel down, window batches up again:
# ~3.8 MB of tunnel traffic per 30 s window). The device-resident path
# uploads each file's (host-bucket-padded) waveform once, computes the mel
# and cuts windows on device, and batches windows into (program_b, n_mels,
# 3000) chunk buffers that feed the decode programs directly — mels never
# cross the device boundary. Values are bit-identical to the host path: the
# same mel program produces them, windows are the same slices, and the tail
# mask writes the same zeros pad_or_trim does.


@partial(jax.jit, donate_argnums=(0,))
def _write_window(buf, win, slot):
    return jax.lax.dynamic_update_slice(buf, win[None], (slot, 0, 0))


@jax.jit
def _read_window(buf, slot):
    return jax.lax.dynamic_slice(
        buf, (slot, 0, 0), (1, buf.shape[1], buf.shape[2])
    )[0]


@jax.jit
def _cut_window(mel, seek, size):
    win = jax.lax.dynamic_slice(mel, (0, seek), (mel.shape[0], N_FRAMES))
    return jnp.where(jnp.arange(N_FRAMES)[None, :] < size, win, 0.0)


class _WindowStore:
    """Windows resident on device as a list of (program_b, n_mels, N_FRAMES)
    chunk buffers; window k lives at buffer k//program_b, slot k%program_b.

    Thread-aware: a producer thread may fill the store (upload + device mel
    per file) while the main thread decodes — readers block in `chunk`/
    `gather` until the windows they need have been appended. Window COUNTS
    are known up front from host metadata (_window_metadata), so readers know
    exactly what to wait for; a producer failure is re-raised at the waiting
    reader."""

    def __init__(self, program_b: int, n_mels: int, total: Optional[int] = None):
        self.program_b = program_b
        self.n_mels = n_mels
        self.buffers: List[jnp.ndarray] = []
        self.count = 0
        self.total = total
        self._cond = threading.Condition()
        self._error: Optional[BaseException] = None
        self._done = False

    def append(self, win: jnp.ndarray) -> None:
        slot = self.count % self.program_b
        if slot == 0:
            self.buffers.append(
                jnp.zeros((self.program_b, self.n_mels, N_FRAMES), jnp.float32)
            )
        self.buffers[-1] = _write_window(self.buffers[-1], win, np.int32(slot))
        with self._cond:
            self.count += 1
            self._cond.notify_all()

    def fail(self, err: BaseException) -> None:
        with self._cond:
            self._error = err
            self._cond.notify_all()

    def finish(self) -> None:
        """Producer is done appending. Readers still waiting for windows
        beyond `count` then error out instead of re-waiting forever — guards
        against any drift between _window_metadata's and _fill_window_store's
        seek arithmetic turning into a silent hang."""
        with self._cond:
            self._done = True
            self._cond.notify_all()

    def _wait_for(self, n: int) -> None:
        """Block until at least n windows are stored (no-op when the store
        was filled synchronously)."""
        if self.total is not None:
            n = min(n, self.total)
        with self._cond:
            while self.count < n:
                if self._error is not None:
                    raise RuntimeError(
                        "window-store producer failed"
                    ) from self._error
                if self._done:
                    raise RuntimeError(
                        f"window-store producer finished after {self.count} "
                        f"windows but a reader needs {n} — window metadata "
                        "and producer seek arithmetic disagree"
                    )
                self._cond.wait(timeout=1.0)

    def chunk(self, start: int) -> jnp.ndarray:
        """The whole buffer holding windows [start, start+program_b) — valid
        only when start is chunk-aligned (the rung-0 fast path)."""
        assert start % self.program_b == 0
        self._wait_for(start + self.program_b)
        return self.buffers[start // self.program_b]

    def gather(self, indices: List[int], pad_to: Optional[int] = None) -> jnp.ndarray:
        """Arbitrary-subset chunk (ladder retries, language regrouping,
        alignment): one (1, n_mels, N_FRAMES) slice+write pair per window —
        a handful of cached programs, dispatch cost only. Slots beyond
        len(indices) (up to `pad_to`) stay zero, matching the host path's
        zero-padded partial chunks."""
        if indices:
            self._wait_for(max(indices) + 1)
        out = jnp.zeros((pad_to or len(indices), self.n_mels, N_FRAMES), jnp.float32)
        for slot, k in enumerate(indices):
            win = _read_window(self.buffers[k // self.program_b],
                               np.int32(k % self.program_b))
            out = _write_window(out, win, np.int32(slot))
        return out


class _FeatureStore:
    """Device-resident encoder features captured during the decode phase
    (words mode): chunk c's (program_b, n_audio_ctx, D) feature batch for
    windows [c*program_b, (c+1)*program_b). Lets the batched alignment
    forward (timing.find_alignment_batch) skip its second encoder pass —
    the features are the SAME deterministic encoder output the decode
    program consumed, so alignment matrices are unchanged."""

    def __init__(self, program_b: int):
        self.program_b = program_b
        self.chunks: dict = {}

    def put(self, chunk_idx: int, feats: jnp.ndarray) -> None:
        self.chunks[chunk_idx] = feats

    def has(self, indices: List[int]) -> bool:
        return all((k // self.program_b) in self.chunks for k in indices)

    def gather(self, indices: List[int], pad_to: Optional[int] = None) -> jnp.ndarray:
        first = self.chunks[indices[0] // self.program_b]
        out = jnp.zeros((pad_to or len(indices),) + first.shape[1:], first.dtype)
        for slot, k in enumerate(indices):
            row = _read_window(self.chunks[k // self.program_b],
                               np.int32(k % self.program_b))
            out = _write_window(out, row, np.int32(slot))
        return out


def _cut_window_dev(mel: jnp.ndarray, seek, size) -> jnp.ndarray:
    """(n_mels, F) bucketed device mel -> one (n_mels, N_FRAMES) window with
    the tail beyond `size` zeroed (what pad_or_trim writes on host)."""
    return _cut_window(mel, np.int32(seek), np.int32(size))


def _decode_audios(model, audios) -> Tuple[list, int]:
    """Host audio decode + window-count precount for the device path.
    Returns ([(waveform, bucket_samples, content_frames)], total_windows)."""
    from .audio import load_audio

    decoded = []
    total_windows = 0
    for audio in audios:
        if isinstance(audio, str):
            audio = load_audio(audio)
        audio = np.asarray(audio, np.float32).reshape(-1)
        total = audio.shape[-1] + N_SAMPLES
        bucket = -(-total // N_SAMPLES) * N_SAMPLES
        content = max(total // HOP_LENGTH - N_FRAMES, 1)
        decoded.append((audio, bucket, content))
        total_windows += -(-content // N_FRAMES)
    return decoded, total_windows


def _window_metadata(decoded) -> List[_Window]:
    """The window list the device path will produce, computed purely on host
    (same seek arithmetic as _fill_window_store) — lets decode start before
    the uploads/mels finish."""
    windows: List[_Window] = []
    for idx, (_audio, _bucket, content_frames) in enumerate(decoded):
        seek = 0
        while seek < content_frames:
            size = max(1, min(N_FRAMES, content_frames - seek))
            windows.append(_Window(idx, seek, size, None))
            seek += size
    return windows


def _fill_window_store(model, decoded, store: "_WindowStore") -> List[_Window]:
    windows: List[_Window] = []
    n_mels = model.dims.n_mels
    for idx, (audio, bucket, content_frames) in enumerate(decoded):
        # host-pad the waveform to the 30 s bucket so every device program
        # compiles per BUCKET, not per file length; mel of explicit zeros is
        # identical to the padding argument's zeros (audio.log_mel_spectrogram)
        padded = np.zeros(bucket - N_SAMPLES, np.float32)
        padded[: audio.shape[-1]] = audio
        # PCM-sourced waveforms (load_audio: int16/32768) upload as int16 —
        # HALF the tunnel bytes, and the upload is this path's wall-clock
        # bound; the device-side /32768 reproduces the f32 values EXACTLY,
        # so mels are bit-identical. Non-PCM floats keep the f32 upload.
        scaled = padded * 32768.0
        i16 = scaled.astype(np.int16)
        if np.array_equal(i16.astype(np.float32), scaled):
            wav_dev = jnp.asarray(i16).astype(jnp.float32) / 32768.0
        else:
            wav_dev = jnp.asarray(padded)
        mel = log_mel_spectrogram(wav_dev, n_mels, padding=N_SAMPLES)
        seek = 0
        while seek < content_frames:
            size = max(1, min(N_FRAMES, content_frames - seek))
            store.append(_cut_window_dev(mel, seek, size))
            windows.append(_Window(idx, seek, size, None))
            seek += size
    return windows


def _fill_window_store_async(model, decoded, store: "_WindowStore"):
    """Fill the store from a producer thread: file i+1's waveform uploads
    and mel-izes while file i's windows decode (the serialized upload phase
    was most of the e2e gap to the window-decode headline — PERF.md round-3
    e2e section; the training loader proves the producer pattern,
    mtl/dataset.py). Readers block in _WindowStore._wait_for; a producer
    crash is re-raised there."""

    def produce():
        try:
            _fill_window_store(model, decoded, store)
        except BaseException as e:  # noqa: BLE001 — must unblock readers
            store.fail(e)
        else:
            store.finish()

    t = threading.Thread(target=produce, daemon=True, name="window-store-producer")
    t.start()
    return t


def transcribe_batch(
    model: "WhisperModel",
    audios: List[Union[str, np.ndarray]],
    batch_size: int = 16,
    mesh=None,
    *,
    temperature: Union[float, Tuple[float, ...]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    compression_ratio_threshold: Optional[float] = 2.4,
    logprob_threshold: Optional[float] = -1.0,
    no_speech_threshold: Optional[float] = 0.6,
    initial_prompt: Optional[str] = None,
    clip_timestamps: Union[str, List[float]] = "0",
    word_timestamps: bool = False,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    device_windows: Optional[bool] = None,
    word_align_batch: Optional[int] = None,
    **decode_options,
) -> List[dict]:
    """Throughput-oriented batched transcription (TPU-native addition).

    All 30 s windows from all inputs are decoded together in device-wide
    batches. Windows are cut at fixed 30 s strides and decoded independently
    (no cross-window prompt conditioning — like the reference with
    ``condition_on_previous_text=False``; for inputs that fit one window the
    output matches sequential :func:`transcribe` exactly). This is the mode
    the BASELINE.json north star measures (audio-sec/sec/chip).

    The temperature-fallback ladder (reference ``transcribe.py:184-224``)
    applies per window: after each pass, windows failing the
    :class:`QualityGates` are re-decoded together at the next temperature —
    only the failed subset pays for the retry, and since temperature is a
    traced scalar the retries reuse the same compiled programs. Confidently
    silent windows contribute no segments (the sequential no-speech skip).

    ``initial_prompt`` conditions EVERY window (windows are independent, so
    the prompt is carried as with ``carry_initial_prompt=True``).
    ``clip_timestamps`` restricts windowing to the given ranges (applied to
    every input). ``word_timestamps`` aligns all windows' segments in
    batched teacher-forced forwards (:func:`timing.find_alignment_batch`).

    With ``language=None`` on a multilingual model, the language is detected
    per INPUT FILE on its first window (reference ``transcribe.py:144-156``
    semantics) in one batched :func:`decoding.detect_language` call; windows
    then decode grouped by language — all languages share the same compiled
    programs (the language token is a traced input).

    With `mesh` (a jax.sharding.Mesh with a 'dp' axis), window batches are
    decoded data-parallel across the mesh via parallel.serving — the
    multi-chip serving path; results are identical to single-device.

    ``device_windows`` (None = auto: TPU backend, single device, whole-file
    windowing): keep the window mels RESIDENT ON DEVICE — each file's
    waveform uploads once, the mel frontend and window cutting run on
    device, and decode/alignment programs read the windows in place. Through
    a remote-attached chip this removes ~3/4 of the tunnel traffic (the
    full-file mel fetch and the window-batch re-upload). Outputs are
    bit-identical to the host path. Falls back to host windows above
    $ASRMTL_DEVICE_WINDOWS_CAP windows (default 2048, ~2 GB HBM).
    """
    from .decoding import DecodingTask

    # Device windows work on meshes too (r4): the store lives on one device;
    # dispatch_batched_dp reshards each chunk device->shards over ICI instead
    # of re-uploading it from the host (the full 3x tunnel traffic the
    # single-device path already deleted). clip_timestamps remains the one
    # host-windowing case.
    use_dev_windows = device_windows
    if use_dev_windows is None:
        use_dev_windows = (
            jax.default_backend() == "tpu" and clip_timestamps == "0"
        )
    elif use_dev_windows and clip_timestamps != "0":
        use_dev_windows = False

    # Words-mode feature capture decodes with fuse_encoder=False; the
    # remote server compiler fp32-materializes that unfused program's bf16
    # cross-KV around the decode while_loop (2 x (L, B, Ta, D) f32 plus a
    # relayout copy — 17.6 GB at 320 base windows, a compile-time OOM even
    # though the StableHLO carries only bf16 KV + decode-kernel calls).
    # Cap the unfused decode program's batch; the window/feature stores
    # adopt the same chunk so the rung-0 fast path and feature capture keep
    # their aligned-chunk geometry. ASRMTL_UNFUSED_DECODE_BATCH=0 disables.
    decode_batch = batch_size
    _lang_known = normalize_language(decode_options.get("language"))
    if _lang_known is None and not model.is_multilingual:
        _lang_known = "en"
    if (
        word_timestamps
        and use_dev_windows
        and mesh is None
        and _lang_known is not None
        and not decode_options.get("int8_encoder", False)
    ):
        _cap = int(os.environ.get("ASRMTL_UNFUSED_DECODE_BATCH", "160"))
        if _cap > 0:
            decode_batch = min(batch_size, _cap)

    store = None
    if use_dev_windows:
        decoded, total_windows = _decode_audios(model, audios)
        cap = int(os.environ.get("ASRMTL_DEVICE_WINDOWS_CAP", "2048"))
        if 0 < total_windows <= cap:
            store = _WindowStore(
                min(decode_batch, total_windows), model.dims.n_mels,
                total=total_windows,
            )
            windows = _window_metadata(decoded)
            if os.environ.get("ASRMTL_UPLOAD_OVERLAP", "1") != "0":
                # producer thread: uploads + device mels overlap decode
                _fill_window_store_async(model, decoded, store)
            else:
                _fill_window_store(model, decoded, store)
        else:
            windows = _collect_windows(model, [d[0] for d in decoded],
                                       clip_timestamps)
    else:
        windows = _collect_windows(model, audios, clip_timestamps)
    if not windows:
        return [dict(text="", segments=[], language=decode_options.get("language"))
                for _ in audios]

    language = normalize_language(decode_options.pop("language", None))
    if language is None and not model.is_multilingual:
        language = "en"
    if language is None:
        # reference parity (transcribe.py:144-156): detect per INPUT FILE on
        # its first 30 s window — batched detect_language calls over all
        # inputs' first windows; each input's windows then decode in that
        # input's language group below
        first_win = {}
        for k, w in enumerate(windows):
            first_win.setdefault(w.input_idx, k)
        lang_of_input = {}
        if store is not None:
            # clip_timestamps == "0" here, so every input has a first window
            # in the store — gather them on device, never fetch the mels
            firsts = [first_win[i] for i in range(len(audios))]
            det_b = min(batch_size, len(firsts))
            for c0 in range(0, len(firsts), det_b):
                part = firsts[c0 : c0 + det_b]
                pad = det_b - len(part) if len(firsts) > det_b else 0
                _, probs = model.detect_language(
                    store.gather(part + [part[-1]] * pad))
                for off, p in enumerate(probs[: len(part)]):
                    lang_of_input[c0 + off] = max(p, key=p.get)
            det_mels = []
        else:
            det_mels = []
            for i in range(len(audios)):
                if i in first_win:
                    det_mels.append(windows[first_win[i]].mel)
                else:
                    # input whose clip_timestamps excluded every window: the
                    # reference still detects on the file's first 30 s
                    mel = np.asarray(
                        log_mel_spectrogram(audios[i], model.dims.n_mels,
                                            padding=N_SAMPLES))
                    det_mels.append(np.asarray(
                        pad_or_trim(mel[:, :N_FRAMES], N_FRAMES, axis=-1),
                        np.float32))
        # chunk + pad to ONE program shape: detect_language compiles per
        # batch shape, and fresh shapes cost minutes over a remote chip
        det_b = min(batch_size, len(det_mels)) if det_mels else 1
        for c0 in range(0, len(det_mels), det_b):
            part = det_mels[c0 : c0 + det_b]
            pad = det_b - len(part) if len(det_mels) > det_b else 0
            stack = np.stack(part + [part[-1]] * pad)
            _, probs = model.detect_language(jnp.asarray(stack))
            for off, p in enumerate(probs[: len(part)]):
                lang_of_input[c0 + off] = max(p, key=p.get)
        language_groups = {}
        for k, w in enumerate(windows):
            language_groups.setdefault(lang_of_input[w.input_idx], []).append(k)
    else:
        lang_of_input = {i: language for i in range(len(audios))}
        language_groups = {language: list(range(len(windows)))}
    if initial_prompt is not None:
        decode_options["prompt"] = " " + initial_prompt.strip()

    ladder = _as_ladder(temperature)
    gates = QualityGates(
        compression_ratio=compression_ratio_threshold,
        logprob=logprob_threshold,
        no_speech=no_speech_threshold,
    )

    if mesh is not None:
        from .parallel.serving import collect_batched_dp, dispatch_batched_dp

    tasks: dict = {}  # DecodingTask per (rung, language); the jitted programs
    # underneath are lru-cached on static config only, so all rungs AND all
    # languages share the same compiles (the language token is a traced input)

    # Words mode + device windows + one explicit-language group: decode with
    # an unfused encoder and CAPTURE its features per rung-0 chunk, so the
    # batched alignment forward reuses them instead of re-running the
    # encoder (its dominant cost — the same deterministic output, so
    # alignment matrices are unchanged). Skipped under int8_encoder (the
    # alignment contract is the non-quantized encoder) and above the window
    # cap (feature chunks are (B, n_audio_ctx, D) HBM residents).
    feat_store: Optional[_FeatureStore] = None
    if (
        word_timestamps
        and store is not None
        and mesh is None  # the mesh dispatch has no feature capture
        and language is not None
        and not decode_options.get("int8_encoder", False)
        and len(windows) <= int(os.environ.get("ASRMTL_FEATURE_STORE_CAP", "2048"))
    ):
        feat_store = _FeatureStore(min(decode_batch, len(windows)))
        decode_options["fuse_encoder"] = False

    def decode_subset(indices: List[int], t: float, lang: str) -> None:
        options = options_at_temperature({**decode_options, "language": lang}, t)
        task = tasks.get((t, lang))
        if task is None:
            task = tasks[(t, lang)] = DecodingTask(model, options)
        pending: List[tuple] = []  # (group, collect_fn, handle), ≤2 in flight

        def drain_one() -> None:
            group, collect_fn, handle = pending.pop(0)
            for k, res in zip(group, collect_fn(handle)):
                results[k] = res

        # every chunk — including ladder-retry subsets smaller than the first
        # rung's — pads up to the ONE program batch the first rung compiled
        # (min(decode_batch, total windows)); fresh shapes cost minutes over
        # a remote-attached chip
        program_b = min(decode_batch, len(windows))
        for i in range(0, len(indices), program_b):
            group = indices[i : i + program_b]
            aligned_chunk = (
                len(group) == program_b
                and group == list(range(group[0], group[0] + program_b))
                and group[0] % program_b == 0
            )
            if store is not None:
                if aligned_chunk:
                    # rung-0 fast path: the chunk IS a store buffer
                    chunk_dev = store.chunk(group[0])
                else:
                    # ladder retries / language regrouping: device gather,
                    # unfilled slots stay zero (= the host path's zero pad)
                    chunk_dev = store.gather(group, pad_to=program_b)
            else:
                chunk = [windows[k].mel for k in group]
                if len(chunk) < program_b:
                    chunk += [np.zeros_like(chunk[0])] * (program_b - len(chunk))
                chunk_dev = None
            # depth-2 dispatch pipeline (single device AND mesh): the next
            # chunk's device work overlaps this chunk's fetch + host assembly
            if mesh is not None:
                mels_in = chunk_dev if chunk_dev is not None else np.stack(chunk)
                handle = dispatch_batched_dp(
                    model, mels_in, options, mesh=mesh
                )
                pending.append((group, collect_batched_dp, handle))
            else:
                mels_in = chunk_dev if chunk_dev is not None else jnp.asarray(np.stack(chunk))
                sink = None
                # capture on any contiguous chunk-aligned group — the full
                # fast-path chunks AND rung 0's final partial chunk (its
                # gathered rows are windows [start, start+len) in order);
                # ladder-retry subsets are non-contiguous and never captured
                if (
                    feat_store is not None
                    and group
                    and group[0] % program_b == 0
                    and group == list(range(group[0], group[0] + len(group)))
                ):
                    chunk_idx = group[0] // program_b
                    if chunk_idx not in feat_store.chunks:
                        sink = partial(feat_store.put, chunk_idx)
                pending.append(
                    (group, task.collect, task.submit(mels_in, feature_sink=sink))
                )
            if len(pending) >= 2:
                drain_one()
        while pending:
            drain_one()

    results: List[Optional[DecodingResult]] = [None] * len(windows)
    for lang, lang_indices in language_groups.items():
        decode_subset(lang_indices, ladder[0], lang)
        for t in ladder[1:]:
            retry = [k for k in lang_indices if gates.degenerate(results[k])]
            if not retry:
                break
            decode_subset(retry, t, lang)

    # ---- assemble segments per window -------------------------------------
    # each window uses ITS language group's tokenizer: segment assembly is
    # language-independent (BPE decode), but word splitting for unspaced
    # scripts (zh/ja/th/lo/my/yue) keys off tokenizer.language
    win_lang = {k: lang for lang, idxs in language_groups.items() for k in idxs}
    lang_tokenizer = {
        lang: next(t for (_, lg), t in tasks.items() if lg == lang).tokenizer
        for lang in language_groups
    }
    input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)
    time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE

    window_segments: List[List[dict]] = []
    for k, (win, res) in enumerate(zip(windows, results)):
        if no_speech_threshold is not None and gates.silent_window(res):
            window_segments.append([])
            continue
        tokenizer = lang_tokenizer[win_lang[k]]
        time_offset = _frames_to_sec(win.seek)

        def make(start, end, tokens, _win=win, _res=res, _tok=tokenizer):
            return _build_segment(
                _tok, seek=_win.seek, start=start, end=end,
                tokens=tokens, result=_res,
            )

        segments, _, _ = _cut_segments(
            np.asarray(res.tokens),
            tokenizer,
            time_offset=time_offset,
            time_precision=time_precision,
            segment_duration=_frames_to_sec(win.size),
            segment_size=win.size,
            input_stride=input_stride,
            make=make,
        )
        window_segments.append(segments)

    if word_timestamps:
        from .timing import add_word_timestamps, find_alignment_batch

        for lang, lang_indices in language_groups.items():
            tokenizer = lang_tokenizer[lang]
            token_lists = [
                [t for seg in window_segments[k] for t in seg["tokens"]
                 if t < tokenizer.eot]
                for k in lang_indices
            ]
            features = None
            if feat_store is not None and feat_store.has(lang_indices):
                # reuse the decode phase's encoder features: local alignment
                # row i is global window lang_indices[i]
                class _Remap:
                    def __init__(self, fs, idx_map):
                        self.fs, self.idx_map = fs, idx_map

                    def gather(self, idx, pad_to=None):
                        return self.fs.gather(
                            [self.idx_map[i] for i in idx], pad_to
                        )

                features = _Remap(feat_store, lang_indices)
                mels_group = None
            else:
                mels_group = (
                    store.gather(lang_indices) if store is not None
                    else np.stack([windows[k].mel for k in lang_indices])
                )
            # the alignment program's per-window cross-QK intermediate is
            # tens of MB fp32, so its chunk is capped separately from the
            # decode batch (word_align_batch): a batch-320 decode pairs
            # with e.g. 80-window alignment chunks without recompiling the
            # decode programs
            alignments = find_alignment_batch(
                model,
                tokenizer,
                token_lists,
                mels_group,
                [windows[k].size for k in lang_indices],
                # default the alignment chunk to the (possibly capped)
                # decode program batch: at 320 windows the features-input
                # alignment program compiles but cannot allocate its
                # runtime arena next to the resident stores (measured
                # RESOURCE_EXHAUSTED, PERF.md round 5); the 160-chunk
                # matches the feature-store chunk geometry exactly
                batch_size=word_align_batch or decode_batch,
                features=features,
            )
            for k, alignment in zip(lang_indices, alignments):
                add_word_timestamps(
                    segments=window_segments[k],
                    model=model,
                    tokenizer=tokenizer,
                    mel=windows[k].mel,
                    num_frames=windows[k].size,
                    prepend_punctuations=prepend_punctuations,
                    append_punctuations=append_punctuations,
                    last_speech_timestamp=0.0,
                    alignment=alignment,
                )

    outputs = [
        dict(text="", segments=[], language=lang_of_input[i])
        for i in range(len(audios))
    ]
    for win, segments in zip(windows, window_segments):
        bucket = outputs[win.input_idx]
        for segment in segments:
            if segment["start"] == segment["end"] or not segment["text"].strip():
                segment["text"] = ""
                segment["tokens"] = []
                segment["words"] = []
            bucket["segments"].append({"id": len(bucket["segments"]), **segment})
            bucket["text"] += segment["text"]
    return outputs
