"""Bisect DecodingTask.run wall time into device programs vs host/transfer.

Usage: python scripts/tpu_bisect.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit(label, fn, n=5, sync=True):
    fn()
    jax.block_until_ready(fn()) if sync else None
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    if sync:
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:50s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask, _build_greedy_loop, _bucket
    from asr_ttl_mtl_tpu.models import from_random

    model = from_random("base", seed=0, compute_dtype=jnp.bfloat16)
    options = DecodingOptions(
        language="en", without_timestamps=True, sample_len=64,
        suppress_tokens="-1,50257", fp16=True,
    )
    task = DecodingTask(model, options)

    rng = np.random.RandomState(0)
    mels_np = rng.randn(32, model.dims.n_mels, 3000).astype(np.float32) * 0.3
    mels = jnp.asarray(mels_np)

    # full pipeline
    task.run(mels)
    timeit("task.run (device-resident mel)", lambda: task.run(mels), n=3)

    # pieces
    feats, cross_kv = task._encode_audio(mels)
    jax.block_until_ready(feats)
    timeit("encode+cross_kv", lambda: task._encode_audio(mels)[0], n=3)

    initial = np.tile(np.asarray(task.initial_tokens, np.int32), (32, 1))
    valid_len = initial.shape[1]
    bucket = _bucket(valid_len)
    padded = np.full((32, bucket), task.tokenizer.eot, np.int32)
    padded[:, :valid_len] = initial
    loop = _build_greedy_loop(model.dims, task.filter_cfg, bucket, 64, task._dtype_name)

    def run_loop():
        return loop(
            model.params, cross_kv, jnp.asarray(padded),
            jnp.asarray(valid_len, jnp.int32), jnp.asarray(task.sot_index, jnp.int32),
            jnp.asarray(-1, jnp.int32), jnp.asarray(0.0, jnp.float32),
            jax.random.PRNGKey(0),
        )[0]

    timeit("greedy loop program (prefill + 64 steps)", run_loop, n=3)

    timeit("feats -> np.asarray transfer", lambda: np.asarray(feats), n=3, sync=False)

    out = task._run_greedy(feats, cross_kv, initial, 0)
    timeit("_run_greedy (loop + host slicing)", lambda: task._run_greedy(feats, cross_kv, initial, 0), n=3, sync=False)


if __name__ == "__main__":
    main()
