"""End-to-end FILE-level serving bench: wav files on disk -> transcribe_batch
-> result dicts, as one wall-clock number beside the window-decode headline.

The headline (bench.py) measures window decode with precomputed mels; this
measures everything the reference's primary API does (transcribe.py:38-514):
audio file decode (C++ native loader), mel frontend, window cutting,
temperature-ladder decode with quality gates, language handling, segment
assembly — and reports the phase split so the frontend's share is a
measured number, not an assertion.

Decode budget: sample_len=64 with random weights (same forced budget as the
headline — random weights never emit EOT, so an unbounded decode would run
to the 224-token ceiling on every window; 64 keeps the device work
comparable to the headline's).

Usage: python scripts/tpu_e2e_bench.py [model_size] [n_files] [file_seconds]
       [batch]  (defaults: base 80 120 320)
       env: WORDS=1 adds the word-timestamp pass to the timed run
            BEAM=5 decodes the t=0 rung with beam search (keep batch ~48:
            beam replicates the self-KV cache beam_size-fold)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np

import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def make_corpus(root: str, n_files: int, seconds: float) -> list:
    """Synthetic 16 kHz 16-bit WAVs: band-limited noise + tone mixture (the
    decode path treats it as real audio; content does not affect timing
    because the token budget is fixed)."""
    import wave as wavmod

    os.makedirs(root, exist_ok=True)
    paths = []
    rng = np.random.RandomState(0)
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    for i in range(n_files):
        path = os.path.join(root, f"clip{i:03d}.wav")
        if not os.path.exists(path):
            x = 0.15 * np.sin(2 * np.pi * (180 + 17 * i) * t)
            x += 0.05 * rng.randn(n)
            pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")
            with wavmod.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes(pcm.tobytes())
        paths.append(path)
    return paths


def main():
    import importlib

    from asr_ttl_mtl_tpu.models import from_random

    # the package exports transcribe() the FUNCTION at top level; get the module
    T = importlib.import_module("asr_ttl_mtl_tpu.transcribe")

    model_size = sys.argv[1] if len(sys.argv) > 1 else "base"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    file_seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 320
    words = os.environ.get("WORDS") == "1"

    model = from_random(model_size, seed=0)
    corpus_root = os.path.join("/tmp", f"e2e_corpus_{int(file_seconds)}s")
    paths = make_corpus(corpus_root, n_files, file_seconds)
    total_audio_s = n_files * file_seconds
    print(f"{model_size}: {n_files} files x {file_seconds:.0f} s = "
          f"{total_audio_s:.0f} audio-s, batch={batch}, words={words}", flush=True)

    kwargs = dict(
        batch_size=batch,
        language="en",
        without_timestamps=False,
        sample_len=64,
        fp16=True,
        word_timestamps=words,
        temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    )
    beam = int(os.environ.get("BEAM", "0"))
    if beam:
        kwargs["beam_size"] = beam
        print(f"beam_size={beam} on the t=0 rung", flush=True)
    wab = int(os.environ.get("WORD_ALIGN_BATCH", "0"))
    if wab:
        kwargs["word_align_batch"] = wab
        print(f"word_align_batch={wab}", flush=True)

    # phase probe: frontend only (file -> windows), separately timed.
    # Uses its own pass so the e2e number below stays a pure black-box
    # wall-clock of transcribe_batch.
    t0 = time.perf_counter()
    windows = T._collect_windows(model, paths, "0")
    n_win = len(windows)  # host arrays: the mel fetch already synchronized
    t_frontend = time.perf_counter() - t0
    print(f"frontend (decode+mel+cut, {n_win} windows): {t_frontend:.2f} s "
          f"= {total_audio_s / t_frontend:.0f} audio-s/s", flush=True)
    del windows

    # warmup: compiles (mel buckets, decode program, gather/ladder reuse)
    t0 = time.perf_counter()
    T.transcribe_batch(model, paths[:2], **kwargs)
    print(f"warmup (2 files): {time.perf_counter() - t0:.1f} s", flush=True)

    results_by_mode = {}
    for mode, dev_win in (("host-windows", False), ("device-windows", True),
                          ("device-windows", True)):
        t0 = time.perf_counter()
        results = T.transcribe_batch(model, paths, device_windows=dev_win, **kwargs)
        dt = time.perf_counter() - t0
        n_seg = sum(len(r["segments"]) for r in results)
        print(f"e2e {mode}: {dt:.2f} s = {total_audio_s / dt:.1f} audio-s/s "
              f"({n_seg} segments, {n_win} windows, "
              f"{dt / n_win * 1e3:.1f} ms/window incl everything)", flush=True)
        results_by_mode[mode] = (dt, results)
    same = results_by_mode["host-windows"][1] == results_by_mode["device-windows"][1]
    print(f"host vs device window results identical: {same}", flush=True)
    dt = results_by_mode["device-windows"][0]

    # single-rung ceiling: random weights + noise fail the quality gates on
    # most windows, so the runs above pay the full 6-rung ladder — the
    # worst case. Clean speech on trained weights passes rung 0; this
    # variant (gates off, one temperature) is that behavior's e2e number.
    # NOTE: warmups must run at the FULL path set — a 2-file warmup compiles
    # an 8-window program, not the program_b=batch one the timed run uses
    kwargs_1rung = {**kwargs, "temperature": 0.0,
                    "compression_ratio_threshold": None,
                    "logprob_threshold": None, "no_speech_threshold": None}
    T.transcribe_batch(model, paths, **kwargs_1rung)  # compile at full shape
    t0 = time.perf_counter()
    results1 = T.transcribe_batch(model, paths, **kwargs_1rung)
    dt1 = time.perf_counter() - t0
    print(f"e2e single-rung (clean-speech ceiling): {dt1:.2f} s = "
          f"{total_audio_s / dt1:.1f} audio-s/s "
          f"({sum(len(r['segments']) for r in results1)} segments)", flush=True)

    # and with the headline bench's exact decode knobs (no timestamp rules,
    # int8 KV + int8 encoder) so the remaining gap to bench.py's
    # window-decode number is purely the file/segment pipeline
    import jax as _jax

    on_tpu = _jax.default_backend() == "tpu"
    kwargs_hl = {**kwargs_1rung, "without_timestamps": True,
                 "kv_quant": on_tpu, "int8_encoder": on_tpu}
    if not words:
        T.transcribe_batch(model, paths, **kwargs_hl)  # compile at full shape
        t0 = time.perf_counter()
        T.transcribe_batch(model, paths, **kwargs_hl)
        dt2 = time.perf_counter() - t0
        print(f"e2e single-rung + headline decode knobs: {dt2:.2f} s = "
              f"{total_audio_s / dt2:.1f} audio-s/s", flush=True)

    import json
    print(json.dumps({
        "metric": "e2e_file_transcribe_throughput",
        "model": model_size,
        "value": round(total_audio_s / dt, 1),
        "unit": "audio-sec/sec/chip",
        "frontend_s": round(t_frontend, 2),
        "e2e_s": round(dt, 2),
        "windows": n_win,
        "words": words,
    }), flush=True)


if __name__ == "__main__":
    main()
