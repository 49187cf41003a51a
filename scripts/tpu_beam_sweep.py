"""Beam-serving batch sweep on the real chip: beam=5, int8 KV, depth-2
submit/collect pipeline (the greedy headline's amortization levers applied
to beam — reference whisper exposes beam only through sequential
transcribe(); this measures the batched beam serving mode).

Usage: python scripts/tpu_beam_sweep.py [batches...]   (default 8 16 32 48)
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

    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32, 48]
    model = from_random("base", seed=0, compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)

    opts = DecodingOptions(language="en", without_timestamps=True,
                           sample_len=64, beam_size=5,
                           suppress_tokens="-1,50257", fp16=True,
                           kv_quant=True)
    for B in batches:
        task = DecodingTask(model, opts)
        mel = jnp.asarray(rng.randn(B, model.dims.n_mels, 3000).astype(np.float32) * 0.3)
        for _ in range(2):  # compile + settle donated layouts
            task.run(mel)
        n = 4
        t0 = time.perf_counter()
        pending = task.submit(mel, rng_seed=0)
        for i in range(1, n):
            nxt = task.submit(mel, rng_seed=i)
            task.collect(pending)
            pending = nxt
        task.collect(pending)
        dt = (time.perf_counter() - t0) / n
        print(f"beam=5 int8 B={B}: {dt*1e3:.0f} ms/call = "
              f"{B * 30.0 / dt:.0f} audio-sec/sec/chip (pipelined)", flush=True)


if __name__ == "__main__":
    main()
