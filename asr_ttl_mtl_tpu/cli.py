"""Command-line transcription interface (reference `whisper/transcribe.py:517-620`).

Usage: python -m asr_ttl_mtl_tpu audio.wav [--model tiny ...]
"""

from __future__ import annotations

import argparse
import os
import traceback
import warnings

import numpy as np

from .tokenizer import LANGUAGES, TO_LANGUAGE_CODE
from .utils import optional_float, optional_int, str2bool
from .utils.writers import get_writer


def build_parser() -> argparse.ArgumentParser:
    """The full transcription flag surface (reference transcribe.py:517-620),
    exposed separately from cli() so the arg surface is testable."""
    from .models import available_models

    def valid_model_name(name):
        if name in available_models() or os.path.exists(name):
            return name
        raise ValueError(
            f"model should be one of {available_models()} or path to a model checkpoint"
        )

    # fmt: off
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("audio", nargs="+", type=str, help="audio file(s) to transcribe")
    parser.add_argument("--model", default="turbo", type=valid_model_name, help="name of the Whisper model to use")
    parser.add_argument("--model_dir", type=str, default=None, help="the path to save model files; uses ~/.cache/asr_ttl_mtl_tpu by default")
    parser.add_argument("--device", default=None, help="jax platform to run on (e.g. 'tpu', 'cpu'); default: jax's default backend")
    parser.add_argument("--output_dir", "-o", type=str, default=".", help="directory to save the outputs")
    parser.add_argument("--output_format", "-f", type=str, default="all", choices=["txt", "vtt", "srt", "tsv", "json", "all"], help="format of the output file; if not specified, all available formats will be produced")
    parser.add_argument("--verbose", type=str2bool, default=True, help="whether to print out progress and debug messages")

    parser.add_argument("--task", type=str, default="transcribe", choices=["transcribe", "translate"], help="perform X->X speech recognition ('transcribe') or X->English translation ('translate')")
    parser.add_argument("--language", type=str, default=None, choices=sorted(LANGUAGES.keys()) + sorted([k.title() for k in TO_LANGUAGE_CODE.keys()]), help="language spoken in the audio; None performs language detection")

    parser.add_argument("--temperature", type=float, default=0, help="temperature to use for sampling")
    parser.add_argument("--best_of", type=optional_int, default=5, help="number of candidates when sampling with non-zero temperature")
    parser.add_argument("--beam_size", type=optional_int, default=5, help="number of beams in beam search, only applicable when temperature is zero")
    parser.add_argument("--patience", type=float, default=None, help="optional patience value in beam decoding (arXiv:2204.05424); 1.0 is conventional beam search")
    parser.add_argument("--length_penalty", type=float, default=None, help="optional token length penalty coefficient (alpha, arXiv:1609.08144); simple length normalization by default")

    parser.add_argument("--suppress_tokens", type=str, default="-1", help="comma-separated token ids to suppress; '-1' suppresses most special characters except common punctuation")
    parser.add_argument("--initial_prompt", type=str, default=None, help="optional text to provide as a prompt for the first window")
    parser.add_argument("--carry_initial_prompt", type=str2bool, default=False, help="prepend initial_prompt to every internal decode() call")

    parser.add_argument("--condition_on_previous_text", type=str2bool, default=True, help="provide the previous output as a prompt for the next window")
    parser.add_argument("--fp16", type=str2bool, default=True, help="use the fast half-precision compute dtype (bf16 on TPU)")
    parser.add_argument("--kv_int8", type=str2bool, default=False, help="store the attention K/V caches int8 (per-row scales): faster batched decoding, approximately identical output")
    parser.add_argument("--int8_encoder", type=str2bool, default=False, help="run the encoder block projections as dynamically-quantized int8 matmuls (2x MXU throughput): faster encoding, approximately identical output")
    parser.add_argument("--fuse_encoder", type=str2bool, default=True, help="run encoder+decode as one fused XLA program (default); False compiles two smaller programs — for very large model/batch combinations that exceed a remote compiler's program size limit")
    parser.add_argument("--batch_mode", type=str2bool, default=False, help="decode every 30s window of every input file in device-wide batches (throughput mode; windows are decoded independently)")
    parser.add_argument("--dp", type=optional_int, default=None, help="with --batch_mode: shard window batches data-parallel over this many devices (a jax.sharding mesh); default: single device")
    parser.add_argument("--tp", type=optional_int, default=None, help="with --batch_mode: additionally shard the model weights tensor-parallel over this many devices per dp replica (Megatron layout via pjit; the multi-chip latency path for large models)")

    parser.add_argument("--temperature_increment_on_fallback", type=optional_float, default=0.2, help="temperature increment on decode-quality fallback")
    parser.add_argument("--compression_ratio_threshold", type=optional_float, default=2.4, help="gzip compression ratio above which a decode is treated as failed")
    parser.add_argument("--logprob_threshold", type=optional_float, default=-1.0, help="average log probability below which a decode is treated as failed")
    parser.add_argument("--no_speech_threshold", type=optional_float, default=0.6, help="<|nospeech|> probability above which (with failed logprob) a segment is considered silent")
    parser.add_argument("--word_timestamps", type=str2bool, default=False, help="extract word-level timestamps")
    parser.add_argument("--prepend_punctuations", type=str, default="\"'“¿([{-", help="with --word_timestamps: merge these punctuation symbols with the next word")
    parser.add_argument("--append_punctuations", type=str, default="\"'.。,，!！?？:：”)]}、", help="with --word_timestamps: merge these punctuation symbols with the previous word")
    parser.add_argument("--highlight_words", type=str2bool, default=False, help="(requires --word_timestamps) underline each word as it is spoken in srt/vtt")
    parser.add_argument("--max_line_width", type=optional_int, default=None, help="(requires --word_timestamps) max characters per subtitle line")
    parser.add_argument("--max_line_count", type=optional_int, default=None, help="(requires --word_timestamps) max lines per subtitle segment")
    parser.add_argument("--max_words_per_line", type=optional_int, default=None, help="(requires --word_timestamps, no effect with --max_line_width) max words per segment")
    parser.add_argument("--clip_timestamps", type=str, default="0", help="comma-separated start,end,... timestamps (s) of clips to process")
    parser.add_argument("--hallucination_silence_threshold", type=optional_float, help="(requires --word_timestamps) skip silent periods longer than this (s) when a possible hallucination is detected")
    parser.add_argument("--threads", type=optional_int, default=0, help="number of CPU threads used for host-side compute (reference transcribe.py:564 exposes the same flag for torch)")
    # fmt: on
    return parser


def cli():
    from .models import load_model
    from .transcribe import transcribe

    parser = build_parser()
    args = parser.parse_args().__dict__
    model_name: str = args.pop("model")
    model_dir: str = args.pop("model_dir")
    output_dir: str = args.pop("output_dir")
    output_format: str = args.pop("output_format")
    device: str = args.pop("device")
    os.makedirs(output_dir, exist_ok=True)

    if model_name.endswith(".en") and args["language"] not in {"en", "English"}:
        if args["language"] is not None:
            warnings.warn(
                f"{model_name} is an English-only model but received '{args['language']}'; using English instead."
            )
        args["language"] = "en"

    args["kv_quant"] = args.pop("kv_int8")
    temperature = args.pop("temperature")
    if (increment := args.pop("temperature_increment_on_fallback")) is not None:
        temperature = tuple(np.arange(temperature, 1.0 + 1e-6, increment))
    else:
        temperature = [temperature]

    if (threads := args.pop("threads") or 0) > 0:
        # host-side CPU thread budget (the reference maps this to
        # torch.set_num_threads, transcribe.py:590-591). __main__.py pre-scans
        # the flag and sets these BEFORE the first jax/XLA import; this repeat
        # only covers direct cli() callers, where jax may already be live.
        os.environ["OMP_NUM_THREADS"] = str(threads)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_cpu_multi_thread_eigen={str(threads > 1).lower()}"
        ).strip()

    if device is not None:
        import jax

        jax.config.update("jax_platforms", device)

    model = load_model(model_name, download_root=model_dir)

    writer = get_writer(output_format, output_dir)
    word_options = ["highlight_words", "max_line_count", "max_line_width", "max_words_per_line"]
    if not args["word_timestamps"]:
        for option in word_options:
            if args[option]:
                parser.error(f"--{option} requires --word_timestamps True")
    if args["max_line_count"] and not args["max_line_width"]:
        warnings.warn("--max_line_count has no effect without --max_line_width")
    if args["max_words_per_line"] and args["max_line_width"]:
        warnings.warn("--max_words_per_line has no effect with --max_line_width")
    writer_args = {arg: args.pop(arg) for arg in word_options}
    from .transcribe import transcribe, transcribe_batch  # noqa: F811

    audio_paths = args.pop("audio")
    if args.pop("batch_mode"):
        # throughput mode: every 30 s window of every file decoded in
        # device-wide batches with the per-window fallback ladder (see
        # transcribe_batch). TPU-native addition — the reference CLI only
        # loops files sequentially.
        #
        # Option routing is derived from transcribe_batch's signature plus
        # DecodingOptions' fields, so a newly added option is either routed
        # automatically or fails loudly here — never silently dropped.
        import inspect

        from .decoding import DecodingOptions

        supported = (
            set(inspect.signature(transcribe_batch).parameters)
            | set(DecodingOptions.__dataclass_fields__)
        ) - {"model", "audios", "batch_size", "mesh", "decode_options", "temperature"}
        # sequential-only options the independent-window semantics cannot
        # honor, each with its reason:
        dropped = {
            # per-segment streaming prints are inherently sequential
            "verbose",
            # windows are decoded independently (always condition=False)
            "condition_on_previous_text",
            # initial_prompt already conditions every window in batch mode
            "carry_initial_prompt",
        }
        if args.get("hallucination_silence_threshold") is not None:
            parser.error(
                "--hallucination_silence_threshold needs the sequential "
                "adaptive seek loop; not supported with --batch_mode"
            )
        args.pop("hallucination_silence_threshold", None)
        mesh = None
        dp, tp = args.pop("dp"), args.pop("tp")
        if dp is not None or (tp or 1) > 1:
            from .parallel.mesh import create_mesh

            mesh = create_mesh((dp or 0, tp or 1))
        batch_args, unroutable = {}, []
        for key, value in args.items():
            if key in supported:
                batch_args[key] = value
            elif key not in dropped:
                unroutable.append(key)
        if unroutable:
            parser.error(
                f"option(s) {unroutable} are not routable to --batch_mode: "
                "add them to transcribe_batch's signature or to the CLI's "
                "dropped table"
            )
        try:
            results = transcribe_batch(
                model, list(audio_paths), mesh=mesh,
                temperature=tuple(temperature), **batch_args,
            )
            for audio_path, result in zip(audio_paths, results):
                writer(result, audio_path, **writer_args)
        except Exception as e:
            traceback.print_exc()
            print(f"Batch transcription failed: {type(e).__name__}: {str(e)}")
        return

    args.pop("dp", None)
    args.pop("tp", None)
    for audio_path in audio_paths:
        try:
            result = transcribe(model, audio_path, temperature=temperature, **args)
            writer(result, audio_path, **writer_args)
        except Exception as e:
            traceback.print_exc()
            print(f"Skipping {audio_path} due to {type(e).__name__}: {str(e)}")


if __name__ == "__main__":
    cli()
