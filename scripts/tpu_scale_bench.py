"""Model-family scale proof on one chip: batched greedy decode throughput for
small / medium / large-v3 / large-v3-turbo (random weights — no egress to
fetch real checkpoints; throughput is weight-independent because EOT is
suppressed so every window decodes exactly 64 tokens).

Covers the reference's full `_MODELS` range (`whisper/__init__.py:17-32`)
on TPU, including the 128-mel large-v3 frontend. Usage:

    python scripts/tpu_scale_bench.py [size ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

BATCH = {"tiny": 64, "small": 32, "medium": 16, "large-v3": 8, "large-v3-turbo": 16}
# best measured batches for the pipelined int8 config (PERF.md family table;
# large-v3 B=32 exceeds the remote compiler's program-size ceiling when fused.
# int8 encoder only helps at d<=768: pass --int8_enc for tiny/small, not for
# medium/large/turbo — see the family-table sweep in PERF.md)
BATCH_PIPE = {"tiny": 768, "small": 128, "medium": 64, "large-v3": 24,
              "large-v3-turbo": 96}


def bench_size(name: str, kv_quant: bool = False, pipeline: bool = False,
               int8_encoder: bool = False, batch: int = 0) -> None:
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import from_random

    model = from_random(name, seed=0, compute_dtype=jnp.bfloat16)
    batch = batch or (BATCH_PIPE if pipeline else BATCH).get(name, 8)
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=64,
        suppress_tokens="-1,50257", fp16=True, kv_quant=kv_quant,
        int8_encoder=int8_encoder,
    )
    task = DecodingTask(model, opts)
    rng = np.random.RandomState(0)
    mels = jnp.asarray(rng.randn(batch, model.dims.n_mels, 3000).astype(np.float32) * 0.3)

    t0 = time.perf_counter()
    task.run(mels)
    print(f"[{name}] first call (compile) {time.perf_counter() - t0:.0f} s", flush=True)
    task.run(mels, rng_seed=99)

    n = 5
    t0 = time.perf_counter()
    if pipeline:
        # depth-2 submit/collect: batch i+1's device execution overlaps
        # batch i's fetch + host assembly (same pattern as bench.py)
        pending = task.submit(mels, rng_seed=0)
        for i in range(1, n):
            nxt = task.submit(mels, rng_seed=i)
            task.collect(pending)
            pending = nxt
        task.collect(pending)
    else:
        for i in range(n):
            task.run(mels, rng_seed=i)
    dt = (time.perf_counter() - t0) / n
    tag = (" int8-KV" if kv_quant else "") + (" int8-enc" if int8_encoder else "")
    tag += " pipelined" if pipeline else ""
    print(
        f"[{name}{tag}] B={batch}: {dt * 1e3:.0f} ms/call -> "
        f"{batch * 30.0 / dt:.0f} audio-sec/sec/chip",
        flush=True,
    )

    if name == "large-v3-turbo":
        mel1 = mels[:1]
        task.run(mel1)
        task.run(mel1, rng_seed=99)
        lats = []
        for i in range(10):
            t0 = time.perf_counter()
            task.run(mel1, rng_seed=i)
            lats.append(time.perf_counter() - t0)
        lats.sort()
        print(
            f"[{name}] p50 single 30s-clip greedy latency (B=1): "
            f"{lats[len(lats) // 2] * 1e3:.1f} ms (p90 {lats[8] * 1e3:.1f} ms)",
            flush=True,
        )


def main():
    args = sys.argv[1:]
    kv_quant = "--kv_int8" in args
    pipeline = "--pipeline" in args
    int8_enc = "--int8_enc" in args
    batch = int(os.environ.get("BATCH", "0"))
    sizes = [a for a in args if not a.startswith("--")] or [
        "small", "medium", "large-v3", "large-v3-turbo"
    ]
    for name in sizes:
        bench_size(name, kv_quant=kv_quant, pipeline=pipeline,
                   int8_encoder=int8_enc, batch=batch)


if __name__ == "__main__":
    main()
