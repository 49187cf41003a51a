"""large-v3 split-program probe: the FUSED encoder+decode program fails
server-side compile at B>=32 through the tunnel (remote tpu_compile_helper
exit 1 — program too large). fuse_encoder=False compiles encoder and decode
as two smaller programs, unlocking bigger batches; this measures whether the
extra launch overhead is worth the batch headroom (depth-2 pipeline, int8).

Usage: python scripts/tpu_large_split_probe.py [batches...]  (default 24 32 48)
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

    batches = [int(a) for a in sys.argv[1:]] or [24, 32, 48]
    model = from_random("large-v3", seed=0, compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)

    opts = DecodingOptions(language="en", without_timestamps=True,
                           sample_len=64, suppress_tokens="-1,50257",
                           fp16=True, kv_quant=True, fuse_encoder=False)
    for B in batches:
        task = DecodingTask(model, opts)
        mel = jnp.asarray(
            rng.randn(B, model.dims.n_mels, 3000).astype(np.float32) * 0.3
        )
        try:
            t0 = time.perf_counter()
            task.run(mel)
            print(f"[split B={B}] first call (compile) "
                  f"{time.perf_counter() - t0:.0f} s", flush=True)
            task.run(mel, rng_seed=99)
            n = 4
            t0 = time.perf_counter()
            pending = task.submit(mel, rng_seed=0)
            for i in range(1, n):
                nxt = task.submit(mel, rng_seed=i)
                task.collect(pending)
                pending = nxt
            task.collect(pending)
            dt = (time.perf_counter() - t0) / n
            print(f"large-v3 split int8 B={B}: {dt*1e3:.0f} ms/call = "
                  f"{B * 30.0 / dt:.0f} audio-sec/sec/chip (pipelined)",
                  flush=True)
        except Exception as e:
            print(f"large-v3 split B={B} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
