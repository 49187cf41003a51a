"""Long-form transcription: host-side sliding-window pipeline.

Behavioral parity with reference `whisper/transcribe.py:38-514`: 30 s of
silence padding, seek-pointer windowing, temperature-fallback ladder,
no-speech skipping, consecutive-timestamp segment splitting, prompt
conditioning (`condition_on_previous_text` / `carry_initial_prompt`),
clip_timestamps windows, word timestamps and the hallucination-silence
heuristics.

The loop itself is I/O + control and stays host-side Python (as the
reference's does); every window decode is a single compiled XLA program (see
decoding.py). For throughput-oriented batch transcription of many files, see
:func:`transcribe_batch`.
"""

from __future__ import annotations

import warnings
from typing import TYPE_CHECKING, List, Optional, Tuple, Union

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
from .tokenizer import LANGUAGES, get_tokenizer
from .utils import exact_div, format_timestamp, get_end, make_safe

if TYPE_CHECKING:
    from .models.registry import WhisperModel


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
    mel = log_mel_spectrogram(audio, model.dims.n_mels, padding=N_SAMPLES)
    mel = np.asarray(mel)
    content_frames = mel.shape[-1] - N_FRAMES
    content_duration = float(content_frames * HOP_LENGTH / SAMPLE_RATE)

    if decode_options.get("language", None) is None:
        if not model.is_multilingual:
            decode_options["language"] = "en"
        else:
            if verbose:
                print("Detecting language using up to the first 30 seconds...")
            mel_segment = pad_or_trim(mel, N_FRAMES, axis=-1)
            _, probs = model.detect_language(jnp.asarray(mel_segment))
            decode_options["language"] = max(probs, key=probs.get)
            if verbose is not None:
                print(f"Detected language: {LANGUAGES[decode_options['language']].title()}")

    language: str = decode_options["language"]
    task: str = decode_options.get("task", "transcribe")
    tokenizer = get_tokenizer(
        model.is_multilingual,
        num_languages=model.num_languages,
        language=language,
        task=task,
        include_diseases=model.has_disease_tokens,
    )

    if isinstance(clip_timestamps, str):
        clip_timestamps = [
            float(ts) for ts in (clip_timestamps.split(",") if clip_timestamps else [])
        ]
    seek_points: List[int] = [round(ts * FRAMES_PER_SECOND) for ts in clip_timestamps]
    if len(seek_points) == 0:
        seek_points.append(0)
    if len(seek_points) % 2 == 1:
        seek_points.append(content_frames)
    seek_clips: List[Tuple[int, int]] = list(zip(seek_points[::2], seek_points[1::2]))

    punctuation = "\"'“¿([{-\"'.。,，!！?？:：”)]}、"

    if word_timestamps and task == "translate":
        warnings.warn("Word-level timestamps on translations may not be reliable.")

    def decode_with_fallback(segment: np.ndarray) -> DecodingResult:
        """Temperature ladder: retry the window at higher temperature when the
        output is too repetitive or too improbable (reference :184-224)."""
        temperatures = (
            [temperature] if isinstance(temperature, (int, float)) else temperature
        )
        decode_result = None
        for t in temperatures:
            kwargs = {**decode_options}
            if t > 0:
                kwargs.pop("beam_size", None)
                kwargs.pop("patience", None)
            else:
                kwargs.pop("best_of", None)

            options = DecodingOptions(**kwargs, temperature=t)
            decode_result = model.decode(jnp.asarray(segment), options)

            needs_fallback = False
            if (
                compression_ratio_threshold is not None
                and decode_result.compression_ratio > compression_ratio_threshold
            ):
                needs_fallback = True  # too repetitive
            if (
                logprob_threshold is not None
                and decode_result.avg_logprob < logprob_threshold
            ):
                needs_fallback = True  # too improbable
            if (
                no_speech_threshold is not None
                and decode_result.no_speech_prob > no_speech_threshold
                and logprob_threshold is not None
                and decode_result.avg_logprob < logprob_threshold
            ):
                needs_fallback = False  # silence
            if not needs_fallback:
                break
        return decode_result

    clip_idx = 0
    seek = seek_clips[clip_idx][0]
    input_stride = exact_div(N_FRAMES, model.dims.n_audio_ctx)  # mel frames / token: 2
    time_precision = input_stride * HOP_LENGTH / SAMPLE_RATE  # 0.02 s per token
    all_tokens: List[int] = []
    all_segments: List[dict] = []
    prompt_reset_since = 0

    remaining_prompt_length = model.dims.n_text_ctx // 2 - 1
    if initial_prompt is not None:
        initial_prompt_tokens = tokenizer.encode(" " + initial_prompt.strip())
        all_tokens.extend(initial_prompt_tokens)
        remaining_prompt_length -= len(initial_prompt_tokens)
    else:
        initial_prompt_tokens = []

    def new_segment(*, start: float, end: float, tokens: np.ndarray, result: DecodingResult):
        tokens = [int(t) for t in tokens]
        text_tokens = [t for t in tokens if t < tokenizer.eot]
        return {
            "seek": seek,
            "start": start,
            "end": end,
            "text": tokenizer.decode(text_tokens),
            "tokens": tokens,
            "temperature": result.temperature,
            "avg_logprob": result.avg_logprob,
            "compression_ratio": result.compression_ratio,
            "no_speech_prob": result.no_speech_prob,
        }

    with tqdm.tqdm(
        total=content_frames, unit="frames", disable=verbose is not False
    ) as pbar:
        last_speech_timestamp = 0.0
        while clip_idx < len(seek_clips):
            seek_clip_start, seek_clip_end = seek_clips[clip_idx]
            if seek < seek_clip_start:
                seek = seek_clip_start
            if seek >= seek_clip_end:
                clip_idx += 1
                if clip_idx < len(seek_clips):
                    seek = seek_clips[clip_idx][0]
                continue
            time_offset = float(seek * HOP_LENGTH / SAMPLE_RATE)
            window_end_time = float((seek + N_FRAMES) * HOP_LENGTH / SAMPLE_RATE)
            segment_size = min(N_FRAMES, content_frames - seek, seek_clip_end - seek)
            mel_segment = mel[:, seek : seek + segment_size]
            segment_duration = segment_size * HOP_LENGTH / SAMPLE_RATE
            mel_segment = pad_or_trim(mel_segment, N_FRAMES, axis=-1).astype(np.float32)

            if carry_initial_prompt:
                nignored = max(len(initial_prompt_tokens), prompt_reset_since)
                remaining_prompt = all_tokens[nignored:][-remaining_prompt_length:]
                decode_options["prompt"] = initial_prompt_tokens + remaining_prompt
            else:
                decode_options["prompt"] = all_tokens[prompt_reset_since:]

            result: DecodingResult = decode_with_fallback(mel_segment)
            tokens = np.asarray(result.tokens)

            if no_speech_threshold is not None:
                # voice-activity gate (reference :298-310)
                should_skip = result.no_speech_prob > no_speech_threshold
                if (
                    logprob_threshold is not None
                    and result.avg_logprob > logprob_threshold
                ):
                    should_skip = False
                if should_skip:
                    seek += segment_size
                    continue

            previous_seek = seek
            current_segments: List[dict] = []

            # hallucination heuristics (reference :316-334)
            def word_anomaly_score(word: dict) -> float:
                probability = word.get("probability", 0.0)
                duration = word["end"] - word["start"]
                score = 0.0
                if probability < 0.15:
                    score += 1.0
                if duration < 0.133:
                    score += (0.133 - duration) * 15
                if duration > 2.0:
                    score += duration - 2.0
                return score

            def is_segment_anomaly(segment: Optional[dict]) -> bool:
                if segment is None or not segment["words"]:
                    return False
                words = [w for w in segment["words"] if w["word"] not in punctuation]
                words = words[:8]
                score = sum(word_anomaly_score(w) for w in words)
                return score >= 3 or score + 0.01 >= len(words)

            def next_words_segment(segments: List[dict]) -> Optional[dict]:
                return next((s for s in segments if s["words"]), None)

            timestamp_tokens = tokens >= tokenizer.timestamp_begin
            single_timestamp_ending = (
                len(timestamp_tokens) >= 2
                and timestamp_tokens[-2:].tolist() == [False, True]
            )

            consecutive = np.where(timestamp_tokens[:-1] & timestamp_tokens[1:])[0] + 1
            if len(consecutive) > 0:
                # split on consecutive timestamp pairs (reference :342-377)
                slices = consecutive.tolist()
                if single_timestamp_ending:
                    slices.append(len(tokens))

                last_slice = 0
                for current_slice in slices:
                    sliced_tokens = tokens[last_slice:current_slice]
                    start_timestamp_pos = int(sliced_tokens[0]) - tokenizer.timestamp_begin
                    end_timestamp_pos = int(sliced_tokens[-1]) - tokenizer.timestamp_begin
                    current_segments.append(
                        new_segment(
                            start=time_offset + start_timestamp_pos * time_precision,
                            end=time_offset + end_timestamp_pos * time_precision,
                            tokens=sliced_tokens,
                            result=result,
                        )
                    )
                    last_slice = current_slice

                if single_timestamp_ending:
                    # no speech after the last timestamp: advance a full window
                    seek += segment_size
                else:
                    # continue from the last closed timestamp
                    last_timestamp_pos = int(tokens[last_slice - 1]) - tokenizer.timestamp_begin
                    seek += last_timestamp_pos * input_stride
            else:
                duration = segment_duration
                timestamps = tokens[np.nonzero(timestamp_tokens)[0]]
                if len(timestamps) > 0 and int(timestamps[-1]) != tokenizer.timestamp_begin:
                    last_timestamp_pos = int(timestamps[-1]) - tokenizer.timestamp_begin
                    duration = last_timestamp_pos * time_precision

                current_segments.append(
                    new_segment(
                        start=time_offset,
                        end=time_offset + duration,
                        tokens=tokens,
                        result=result,
                    )
                )
                seek += segment_size

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

                if not single_timestamp_ending:
                    last_word_end = get_end(current_segments)
                    if last_word_end is not None and last_word_end > time_offset:
                        seek = round(last_word_end * FRAMES_PER_SECOND)

                # skip silence before possible hallucinations (reference :418-472)
                if hallucination_silence_threshold is not None:
                    threshold = hallucination_silence_threshold
                    if not single_timestamp_ending:
                        last_word_end = get_end(current_segments)
                        if last_word_end is not None and last_word_end > time_offset:
                            remaining_duration = window_end_time - last_word_end
                            if remaining_duration > threshold:
                                seek = round(last_word_end * FRAMES_PER_SECOND)
                            else:
                                seek = previous_seek + segment_size

                    first_segment = next_words_segment(current_segments)
                    if first_segment is not None and is_segment_anomaly(first_segment):
                        gap = first_segment["start"] - time_offset
                        if gap > threshold:
                            seek = previous_seek + round(gap * FRAMES_PER_SECOND)
                            continue

                    hal_last_end = last_speech_timestamp
                    for si in range(len(current_segments)):
                        segment = current_segments[si]
                        if not segment["words"]:
                            continue
                        if is_segment_anomaly(segment):
                            next_segment = next_words_segment(current_segments[si + 1 :])
                            if next_segment is not None:
                                hal_next_start = next_segment["words"][0]["start"]
                            else:
                                hal_next_start = time_offset + segment_duration
                            silence_before = (
                                segment["start"] - hal_last_end > threshold
                                or segment["start"] < threshold
                                or segment["start"] - time_offset < 2.0
                            )
                            silence_after = (
                                hal_next_start - segment["end"] > threshold
                                or is_segment_anomaly(next_segment)
                                or window_end_time - segment["end"] < 2.0
                            )
                            if silence_before and silence_after:
                                seek = round(
                                    max(time_offset + 1, segment["start"]) * FRAMES_PER_SECOND
                                )
                                if content_duration - segment["end"] < threshold:
                                    seek = content_frames
                                current_segments[si:] = []
                                break
                        hal_last_end = segment["end"]

                last_word_end = get_end(current_segments)
                if last_word_end is not None:
                    last_speech_timestamp = last_word_end

            if verbose:
                for segment in current_segments:
                    start, end, text = segment["start"], segment["end"], segment["text"]
                    line = f"[{format_timestamp(start)} --> {format_timestamp(end)}] {text}"
                    print(make_safe(line))

            # drop instantaneous / empty segments (reference :484-489)
            for _i, segment in enumerate(current_segments):
                if segment["start"] == segment["end"] or segment["text"].strip() == "":
                    segment["text"] = ""
                    segment["tokens"] = []
                    segment["words"] = []

            all_segments.extend(
                [
                    {"id": i, **segment}
                    for i, segment in enumerate(current_segments, start=len(all_segments))
                ]
            )
            all_tokens.extend(
                [token for segment in current_segments for token in segment["tokens"]]
            )

            if not condition_on_previous_text or result.temperature > 0.5:
                # hot decodes make unreliable prompts (reference :503-505)
                prompt_reset_since = len(all_tokens)

            pbar.update(min(content_frames, seek) - previous_seek)

    return dict(
        text=tokenizer.decode(all_tokens[len(initial_prompt_tokens) :]),
        segments=all_segments,
        language=language,
    )


def transcribe_batch(
    model: "WhisperModel",
    audios: List[Union[str, np.ndarray]],
    batch_size: int = 16,
    mesh=None,
    **decode_options,
) -> List[dict]:
    """Throughput-oriented batched transcription (TPU-native addition).

    All 30 s windows from all inputs are decoded together in device-wide
    batches (no cross-window prompt conditioning — each window is decoded
    independently, like the reference with condition_on_previous_text=False).
    This is the mode the BASELINE.json north star measures
    (audio-sec/sec/chip).

    With `mesh` (a jax.sharding.Mesh with a 'dp' axis), window batches are
    decoded data-parallel across the mesh via parallel.serving — the
    multi-chip serving path; results are identical to single-device.
    """
    from .decoding import DecodingTask

    # window all inputs
    windows = []  # (input_idx, seek_frames, mel_segment)
    metas = []
    for idx, audio in enumerate(audios):
        mel = np.asarray(log_mel_spectrogram(audio, model.dims.n_mels, padding=N_SAMPLES))
        content_frames = mel.shape[-1] - N_FRAMES
        seek = 0
        while seek < max(content_frames, 1):
            segment_size = min(N_FRAMES, content_frames - seek) if content_frames else N_FRAMES
            seg = pad_or_trim(mel[:, seek : seek + max(segment_size, 1)], N_FRAMES, axis=-1)
            windows.append(seg.astype(np.float32))
            metas.append((idx, seek, max(segment_size, 1)))
            seek += max(segment_size, 1)

    language = decode_options.pop("language", None)
    if language is None:
        if model.is_multilingual:
            # detect once on the first window of the whole batch (single-file
            # transcribe() detects per file; batch mode shares one language)
            _, probs = model.detect_language(jnp.asarray(windows[0]))
            language = max(probs, key=probs.get)
        else:
            language = "en"
    # same beam/best_of disambiguation as decode_with_fallback: greedy/beam
    # at t==0, sampling candidates at t>0 (reference transcribe.py:192-197)
    if (decode_options.get("temperature") or 0) > 0:
        decode_options.pop("beam_size", None)
        decode_options.pop("patience", None)
    else:
        decode_options.pop("best_of", None)
    options = DecodingOptions(language=language, **decode_options)
    task = DecodingTask(model, options)

    if mesh is not None:
        from .parallel.serving import decode_batched_dp

    results = [None] * len(windows)
    for i in range(0, len(windows), batch_size):
        chunk = windows[i : i + batch_size]
        pad_to = len(chunk)
        # pad the last chunk to the full batch so every call reuses ONE
        # compiled program shape (fresh shapes cost minutes over a
        # remote-attached chip)
        if len(chunk) < batch_size and len(windows) > batch_size:
            chunk = chunk + [np.zeros_like(chunk[0])] * (batch_size - len(chunk))
        if mesh is not None:
            out = decode_batched_dp(model, np.stack(chunk), options, mesh=mesh)
        else:
            out = task.run(jnp.asarray(np.stack(chunk)))
        for j, r in enumerate(out[:pad_to]):
            results[i + j] = r

    # assemble per input
    tokenizer = task.tokenizer
    outputs = [dict(text="", segments=[], language=language) for _ in audios]
    for (idx, seek, segment_size), res in zip(metas, results):
        time_offset = seek * HOP_LENGTH / SAMPLE_RATE
        text_tokens = [t for t in res.tokens if t < tokenizer.eot]
        seg = {
            "id": len(outputs[idx]["segments"]),
            "seek": seek,
            "start": time_offset,
            "end": time_offset + segment_size * HOP_LENGTH / SAMPLE_RATE,
            "text": tokenizer.decode(text_tokens),
            "tokens": list(res.tokens),
            "temperature": res.temperature,
            "avg_logprob": res.avg_logprob,
            "compression_ratio": res.compression_ratio,
            "no_speech_prob": res.no_speech_prob,
        }
        outputs[idx]["segments"].append(seg)
        outputs[idx]["text"] += seg["text"]
    return outputs
