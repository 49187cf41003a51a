"""Stage-by-stage timing INSIDE DecodingTask.run (dev tool)."""

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


def main():
    from asr_ttl_mtl_tpu.decoding import (
        DecodingOptions,
        DecodingTask,
        MaximumLikelihoodRanker,
    )
    from asr_ttl_mtl_tpu.models import from_random
    from asr_ttl_mtl_tpu.utils import compression_ratio

    model = from_random("base", seed=0, compute_dtype=jnp.bfloat16)
    options = DecodingOptions(
        language="en", without_timestamps=True, sample_len=64,
        suppress_tokens="-1,50257", fp16=True,
    )
    task = DecodingTask(model, options)
    rng = np.random.RandomState(0)
    mels = jnp.asarray(rng.randn(32, model.dims.n_mels, 3000).astype(np.float32) * 0.3)

    task.run(mels)  # warm
    task.run(mels)

    for it in range(3):
        t = {}
        t0 = time.perf_counter()
        feats, cross_kv = task._encode_audio(mels)
        jax.block_until_ready(feats)
        t["encode"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        initial = np.tile(np.asarray(task.initial_tokens, np.int32), (32, 1))
        tokens, sum_logprobs, no_speech_probs = task._run_greedy(feats, cross_kv, initial, it)
        t["greedy"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        selected = MaximumLikelihoodRanker(task.options.length_penalty).rank(tokens, sum_logprobs)
        final_tokens = [tk[i] for i, tk in zip(selected, tokens)]
        texts = [task.tokenizer.decode(tk).strip() for tk in final_tokens]
        t["rank+decode"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        feats_np = np.asarray(feats)
        t["feats->np"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        _ = [compression_ratio(x) for x in texts]
        t["compression"] = time.perf_counter() - t0

        print({k: round(v * 1e3, 1) for k, v in t.items()},
              "sum:", round(sum(t.values()) * 1e3, 1), flush=True)

    t0 = time.perf_counter()
    for it in range(3):
        task.run(mels, rng_seed=it)
    print("task.run avg:", round((time.perf_counter() - t0) / 3 * 1e3, 1), "ms", flush=True)


if __name__ == "__main__":
    main()
