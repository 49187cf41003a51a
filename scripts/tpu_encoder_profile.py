"""Profile the audio encoder (base, bf16) and dump top HLO ops by
self time (dev tool).

Usage: python scripts/tpu_encoder_profile.py
       BATCH=192 KV_INT8=1 python scripts/tpu_encoder_profile.py  # headline shape
"""

import glob
import json
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

LOGDIR = "/tmp/jax_trace_encoder"


def main():
    from asr_ttl_mtl_tpu.models import from_random
    from asr_ttl_mtl_tpu.models.whisper import encoder_apply, precompute_cross_kv

    batch = int(os.environ.get("BATCH", "32"))
    kv_int8 = os.environ.get("KV_INT8", "0") == "1"
    model = from_random("base", seed=0, compute_dtype=jnp.bfloat16)
    params, dims = model.params, model.dims
    rng = np.random.RandomState(0)
    mels = jnp.asarray(
        rng.randn(batch, dims.n_mels, 3000).astype(np.float32) * 0.3
    ).astype(jnp.bfloat16)

    @jax.jit
    def enc(p, m):
        feats = encoder_apply(p, dims, m, jnp.bfloat16)
        return precompute_cross_kv(p, dims, feats, quantize=kv_int8)

    jax.block_until_ready(enc(params, mels))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(enc(params, mels))
    print(f"encoder+crossKV B={batch} kv_int8={kv_int8}: "
          f"{(time.perf_counter()-t0)/5*1e3:.1f} ms", flush=True)

    os.system(f"rm -rf {LOGDIR}")
    jax.profiler.start_trace(LOGDIR)
    jax.block_until_ready(enc(params, mels))
    jax.profiler.stop_trace()

    xplanes = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    i = {c: idx for idx, c in enumerate(cols)}
    rows = [[(c or {}).get("v") for c in r["c"]] for r in d["rows"]]
    tot = sum(float(r[i["total_self_time"]] or 0) for r in rows)
    rows.sort(key=lambda r: -float(r[i["total_self_time"]] or 0))
    print(f"total device self time: {tot/1e3:.1f} ms over {len(rows)} ops")
    by_cat = {}
    for r in rows:
        by_cat.setdefault(str(r[i["category"]]), [0.0, 0])
        by_cat[str(r[i["category"]])][0] += float(r[i["total_self_time"]] or 0)
        by_cat[str(r[i["category"]])][1] += 1
    for cat, (t, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"  {t/1e3:8.2f} ms {100*t/tot:5.1f}%  n={n:<4} {cat}")
    for r in rows[: int(os.environ.get("TOPN", "20"))]:
        st = float(r[i["total_self_time"]])
        print(
            f'{st/1e3:7.2f}ms {100*st/tot:5.1f}% occ={r[i["occurrences"]]:>4} '
            f'{str(r[i["category"]])[:18]:18s} gflops={r[i["model_flop_rate"]]} '
            f'bw={r[i["measured_memory_bw"]]} bound={r[i["bound_by"]]} '
            f'{str(r[i["hlo_op_name"]])[:50]}'
        )


if __name__ == "__main__":
    main()
