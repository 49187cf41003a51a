"""Component-level timing on the real TPU chip: where does a batched greedy
transcribe step spend its time?  (dev tool, not part of the bench contract)

Usage: python scripts/profile_tpu.py
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


def timeit(label, fn, n=10):
    fn()  # warmup/compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:45s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import from_random
    from asr_ttl_mtl_tpu.models.whisper import (
        decoder_apply,
        encoder_apply,
        init_kv_cache,
        precompute_cross_kv,
    )

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print("backend:", jax.default_backend(), "dtype:", dtype.__name__)

    model = from_random("base", seed=0, compute_dtype=dtype)
    params, dims = model.params, model.dims

    B = 32
    rng = np.random.RandomState(0)
    mels_host = rng.randn(B, dims.n_mels, 3000).astype(np.float32) * 0.3

    # H2D transfer cost over the tunnel
    t0 = time.perf_counter()
    mels = jax.device_put(mels_host)
    jax.block_until_ready(mels)
    print(f"{'H2D 30MB mel transfer':45s} {(time.perf_counter() - t0) * 1e3:9.2f} ms")
    mels = mels.astype(dtype)

    enc = jax.jit(lambda m: encoder_apply(params, dims, m, dtype))
    timeit("encoder forward (B=32, base)", lambda: enc(mels))
    feats = jax.block_until_ready(enc(mels))

    ckv = jax.jit(lambda f: precompute_cross_kv(params, dims, f))
    timeit("precompute cross KV", lambda: ckv(feats))
    cross_kv = jax.block_until_ready(ckv(feats))

    cache = init_kv_cache(dims, B, dtype)
    toks = jnp.full((B, 1), 50258, jnp.int32)

    @jax.jit
    def step(tokens, cache):
        logits, new_cache, _ = decoder_apply(
            params, dims, tokens, None, kv_cache=cache, cross_kv=cross_kv,
            pos_offset=3, compute_dtype=dtype,
        )
        return jnp.argmax(logits[:, -1], -1)[:, None], new_cache

    def one_step():
        t, c = step(toks, cache)
        return t

    timeit("single decode step (T=1, cache)", one_step)

    @jax.jit
    def decode64(tokens, cache):
        def body(carry, _):
            t, c = carry
            nt, nc = step(t, c)
            return (nt, nc), None
        (t, c), _ = jax.lax.scan(body, (tokens, cache), None, length=64)
        return t

    timeit("64 decode steps (scan)", lambda: decode64(toks, cache), n=3)

    # full task
    options = DecodingOptions(
        language="en", without_timestamps=True, sample_len=64,
        suppress_tokens="-1,50257", fp16=True,
    )
    task = DecodingTask(model, options)
    task.run(jnp.asarray(mels_host))  # compile
    timeit("full DecodingTask.run (incl host post)", lambda: task.run(jnp.asarray(mels_host)), n=3)


if __name__ == "__main__":
    main()
