"""Capture a jax.profiler trace of the fused beam-search window (B=8, K=5,
base) and dump the top HLO ops by self time (dev tool).

Usage: python scripts/tpu_beam_profile.py
"""

import csv
import glob
import io
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

LOGDIR = "/tmp/jax_trace_beam"


def main():
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import from_random

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    kv_int8 = os.environ.get("KV_INT8", "0") == "1"
    # MODEL= sweeps the family (small/medium/large-v3-turbo rows revalidate
    # the fused logprobs-top-k kernel at n_vocab 51865/51866 and larger d)
    model_size = os.environ.get("MODEL", "base")
    model = from_random(model_size, seed=0, compute_dtype=jnp.bfloat16)
    eot = 50256 if model_size.endswith(".en") else 50257
    rng = np.random.RandomState(0)
    mel8 = jnp.asarray(rng.randn(B, model.dims.n_mels, 3000).astype(np.float32) * 0.3)
    opts = DecodingOptions(language="en", without_timestamps=True, beam_size=5,
                           sample_len=64, suppress_tokens=f"-1,{eot}", fp16=True,
                           kv_quant=kv_int8)
    task = DecodingTask(model, opts)
    for _ in range(3):
        task.run(mel8)
    t0 = time.perf_counter()
    for i in range(5):
        task.run(mel8)
    dt = (time.perf_counter() - t0) / 5
    print(f"beam=5 B={B} int8={kv_int8} {model_size}: {dt*1e3:.0f} ms/call = {B*30/dt:.0f} audio-sec/sec/chip",
          flush=True)
    if os.environ.get("NO_TRACE", "0") == "1":  # family sweeps skip the trace
        return

    os.system(f"rm -rf {LOGDIR}")
    jax.profiler.start_trace(LOGDIR)
    task.run(mel8)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    xplanes = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        print("no xplane files")
        return

    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = list(csv.reader(io.StringIO(data)))
    head = rows[0]
    i_self = head.index("total_self_time_us") if "total_self_time_us" in head else None
    print("columns:", head[:12])
    if i_self is None:
        print("\n".join(",".join(r[:8]) for r in rows[:25]))
        return
    body = sorted(rows[1:], key=lambda r: -float(r[i_self] or 0))
    tot = sum(float(r[i_self] or 0) for r in rows[1:])
    print(f"total device self time: {tot/1e3:.1f} ms")
    for r in body[:25]:
        name = r[head.index("hlo_op_expression")][:110] if "hlo_op_expression" in head else r[1][:110]
        cat = r[head.index("hlo_category")] if "hlo_category" in head else "?"
        print(f"{float(r[i_self])/1e3:8.2f} ms  {100*float(r[i_self])/tot:5.1f}%  {cat:24s} {name}")


if __name__ == "__main__":
    main()
