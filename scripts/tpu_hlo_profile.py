"""Capture a jax.profiler trace of the 64-step decode scan and dump the
top HLO ops by self time (dev tool).

Usage: python scripts/tpu_hlo_profile.py
"""

import glob
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

LOGDIR = "/tmp/jax_trace_decode"


def main():
    from asr_ttl_mtl_tpu.models import from_random
    from asr_ttl_mtl_tpu.models.whisper import (
        decoder_apply, encoder_apply, init_kv_cache, precompute_cross_kv,
    )

    model = from_random("base", seed=0, compute_dtype=jnp.bfloat16)
    params, dims = model.params, model.dims
    rng = np.random.RandomState(0)
    mels = jnp.asarray(rng.randn(32, dims.n_mels, 3000).astype(np.float32) * 0.3).astype(jnp.bfloat16)

    enc = jax.jit(lambda p, m: encoder_apply(p, dims, m, jnp.bfloat16))
    feats = jax.block_until_ready(enc(params, mels))
    ckv = jax.jit(lambda p, f: precompute_cross_kv(p, dims, f))
    cross_kv = jax.block_until_ready(ckv(params, feats))
    cache = init_kv_cache(dims, 32, jnp.bfloat16)
    toks = jnp.full((32, 1), 50258, jnp.int32)

    @jax.jit
    def decode64(params, cross_kv, tokens, cache):
        def body(carry, i):
            t, c = carry
            logits, nc, _ = decoder_apply(
                params, dims, t, None, kv_cache=c, cross_kv=cross_kv_,
                pos_offset=i + 3, compute_dtype=jnp.bfloat16,
            )
            return (jnp.argmax(logits[:, -1], -1)[:, None].astype(jnp.int32), nc), None

        cross_kv_ = cross_kv
        (t, _), _ = jax.lax.scan(body, (tokens, cache), jnp.arange(64))
        return t

    jax.block_until_ready(decode64(params, cross_kv, toks, cache))  # compile

    os.system(f"rm -rf {LOGDIR}")
    jax.profiler.start_trace(LOGDIR)
    jax.block_until_ready(decode64(params, cross_kv, toks, cache))
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    xplanes = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return

    from xprof.convert import raw_to_tool_data as rtd

    for tool in ("hlo_stats", "framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
            out = f"/tmp/profile_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"wrote {out} ({len(data)} bytes)", flush=True)
        except Exception as e:
            print(f"{tool}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
