"""Serving-shape measurements on the real chip (BASELINE.json configs):

* p50 single-clip (30 s) greedy decode latency, batch 1
* beam_size=5 batched decode throughput (base multilingual shape)

Usage: python scripts/tpu_serving_bench.py
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


def main():
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import from_random

    model = from_random("base", seed=0, compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)

    # --- p50 latency, batch 1, greedy, realistic token budget ---
    mel1 = jnp.asarray(rng.randn(1, model.dims.n_mels, 3000).astype(np.float32) * 0.3)
    opts = DecodingOptions(language="en", without_timestamps=True,
                           sample_len=64, suppress_tokens="-1,50257", fp16=True)
    task = DecodingTask(model, opts)
    for _ in range(3):
        task.run(mel1)
    lats = []
    for i in range(10):
        t0 = time.perf_counter()
        task.run(mel1, rng_seed=i)
        lats.append(time.perf_counter() - t0)
    lats.sort()
    print(f"p50 single 30s-clip greedy latency (B=1): {lats[len(lats)//2]*1e3:.1f} ms "
          f"(p90 {lats[int(len(lats)*0.9)]*1e3:.1f} ms)", flush=True)

    # --- beam_size=5, batch 8 ---
    mel8 = jnp.asarray(rng.randn(8, model.dims.n_mels, 3000).astype(np.float32) * 0.3)
    opts_b = DecodingOptions(language="en", without_timestamps=True,
                             sample_len=64, beam_size=5,
                             suppress_tokens="-1,50257", fp16=True)
    task_b = DecodingTask(model, opts_b)
    for _ in range(2):
        task_b.run(mel8)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        task_b.run(mel8)
    dt = (time.perf_counter() - t0) / n
    print(f"beam=5 B=8 base: {dt*1e3:.0f} ms/call = "
          f"{8 * 30.0 / dt:.0f} audio-sec/sec/chip", flush=True)


if __name__ == "__main__":
    main()
