"""int8 cross-KV serving mode on the real chip: token agreement vs the bf16
path and batched-greedy / beam throughput.

Usage: python scripts/tpu_int8_bench.py
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


def run_cfg(model, mel, n_iter=8, **opts):
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask

    task = DecodingTask(model, DecodingOptions(**opts))
    for _ in range(3):
        res = task.run(mel)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        res = task.run(mel)
    dt = (time.perf_counter() - t0) / n_iter
    return res, dt


def main():
    from asr_ttl_mtl_tpu.models import from_random

    model = from_random("base", seed=0, compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(32, model.dims.n_mels, 3000).astype(np.float32) * 0.3)
    common = dict(language="en", without_timestamps=True, sample_len=64,
                  suppress_tokens="-1,50257", fp16=True)

    base_res, base_dt = run_cfg(model, mel, **common)
    q_res, q_dt = run_cfg(model, mel, kv_quant=True, **common)

    same = sum(a.tokens == b.tokens for a, b in zip(base_res, q_res))
    toks_a = sum(len(a.tokens) for a in base_res)
    agree = sum(
        sum(x == y for x, y in zip(a.tokens, b.tokens))
        for a, b in zip(base_res, q_res)
    )
    print(f"greedy B=32 base:   bf16-KV {base_dt*1e3:6.1f} ms  ->  int8-KV {q_dt*1e3:6.1f} ms "
          f"({32*30/q_dt:.0f} audio-sec/s/chip, was {32*30/base_dt:.0f})", flush=True)
    print(f"token agreement: {same}/32 sequences identical, "
          f"{agree}/{toks_a} tokens matching", flush=True)

    mel8 = jnp.asarray(rng.randn(8, model.dims.n_mels, 3000).astype(np.float32) * 0.3)
    bcommon = dict(language="en", without_timestamps=True, beam_size=5,
                   sample_len=64, suppress_tokens="-1,50257", fp16=True)
    bb_res, bb_dt = run_cfg(model, mel8, **bcommon)
    bq_res, bq_dt = run_cfg(model, mel8, kv_quant=True, **bcommon)
    bsame = sum(a.tokens == b.tokens for a, b in zip(bb_res, bq_res))
    print(f"beam=5 B=8 base:    bf16-KV {bb_dt*1e3:6.1f} ms  ->  int8-KV {bq_dt*1e3:6.1f} ms "
          f"({8*30/bq_dt:.0f} audio-sec/s/chip, was {8*30/bb_dt:.0f}); "
          f"{bsame}/8 sequences identical", flush=True)


if __name__ == "__main__":
    main()
