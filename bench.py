"""Benchmark: batched 30s-window greedy transcription throughput.

Measures audio-seconds transcribed per wall-clock second on one chip with the
`base`-architecture model (bf16 compute + int8 KV caches on TPU): full
pipeline per window = log-mel is precomputed (as in serving, where the
frontend overlaps with decode), encoder forward, KV-cache prefill, and a
forced 64-token greedy decode (EOT is suppressed so every window decodes
exactly 64 tokens — a realistic dense-speech token budget per 30 s window,
and deterministic regardless of model weights).

The int8 KV serving mode is the repo's best honest config: greedy/beam token
agreement measured 32/32 with zero normalized-text delta on trained weights
(scripts/tpu_int8_quality.py; PERF.md quality table — random-weight beam is
the only config that diverges, by construction of near-uniform logits).
bf16-KV measures ~6430 audio-s/s on the same harness (PERF.md).

Baseline: the BASELINE.json north star of 10x real-time per v5e chip at base
(the reference publishes no inference throughput numbers at all —
`vs_baseline` = value / 10.0, so >1.0 beats the target).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

# persistent XLA compilation cache: repeat bench runs skip the multi-minute
# first-compile of the fused decode program
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def _tpu_tunnel_up(timeout: float = 180.0) -> bool:
    """Bounded TPU-backend probe in a subprocess.

    The remote-attached (axon tunnel) backend can be DOWN for hours, in which
    case jax.devices() in this process would either hang forever or raise —
    and the driver's bench run would record nothing. Probing in a child
    process bounds both failure modes; on failure the bench falls back to CPU
    so it still prints its one JSON line.
    """
    import subprocess
    import sys

    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert any(d.platform == 'tpu' for d in jax.devices())"],
            timeout=timeout, capture_output=True,
        )
        return proc.returncode == 0
    except Exception:  # TimeoutExpired (hang) or spawn failure
        return False


def main():
    import jax

    if not _tpu_tunnel_up():
        # must happen before first backend use; the env var alone loses to
        # the container sitecustomize prepending 'axon' (see CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import from_random

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    model = from_random("base", seed=0, compute_dtype=compute_dtype)

    # The batch amortizes the fixed per-program launch overhead until HBM
    # pressure bites. After the unstacked float-KV prefill + bf16 logit
    # stores freed ~4 GB of peak HBM, the curve moved: measured 12589 (192)
    # / 12383 (256) / 12724 (288) / 12868 (320) / 12865 (352) / 12351 (384)
    # audio-s/s on a v5e — plateau at 320-352 (round-1-era peak was 192).
    BATCH = int(os.environ.get("BATCH", "320" if on_tpu else "4"))
    DECODE_TOKENS = 64
    CHUNK_SECONDS = 30.0

    tokenizer_eot = 50257  # multilingual EOT; suppressing it forces full-length decode
    options = DecodingOptions(
        language="en",
        without_timestamps=True,
        sample_len=DECODE_TOKENS,
        suppress_tokens=f"-1,{tokenizer_eot}",
        fp16=True,
        kv_quant=on_tpu,  # int8 KV on the chip (quality table in PERF.md)
        # W8A8 encoder projections: headline default on-chip since the
        # quality table covers enc-int8/kv+enc (32/32 on trained weights,
        # PERF.md); INT8_ENC=0 A/Bs the bf16 encoder.
        int8_encoder=on_tpu and bool(int(os.environ.get("INT8_ENC", "1"))),
    )
    task = DecodingTask(model, options)

    rng = np.random.RandomState(0)
    mels = jnp.asarray(rng.randn(BATCH, model.dims.n_mels, 3000).astype(np.float32) * 0.3)

    # warmup / compile (two calls: the remote-attached runtime may recompile
    # once more for settled buffer layouts on the second call)
    task.run(mels)
    task.run(mels, rng_seed=99)

    n_iters = 5 if on_tpu else 2
    # depth-2 submit/collect pipeline: batch i+1's device execution overlaps
    # batch i's result fetch + host assembly (sequential run() leaves the
    # remote-attached chip idle for the fetch round-trip every call)
    t0 = time.time()
    pending = task.submit(mels, rng_seed=0)
    for i in range(1, n_iters):
        nxt = task.submit(mels, rng_seed=i)
        results = task.collect(pending)
        pending = nxt
    results = task.collect(pending)
    elapsed = time.time() - t0

    audio_seconds = BATCH * CHUNK_SECONDS * n_iters
    value = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "base_batched_greedy_transcribe_throughput"
                + ("" if on_tpu else "_CPU_FALLBACK_TUNNEL_DOWN"),
                "value": round(value, 2),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(value / 10.0, 3),
            }
        )
    )
    return value


if __name__ == "__main__":
    main()
