"""Profile the bench.py headline program (fused encoder + prefill + 64-step
greedy decode, B=192 int8 KV) and print the device-time split: decode-loop
ops vs everything outside the loop (encoder/prefill/logits).

This answers "what do we optimize next": the decode loop is known
HBM-roofline-bound (PERF.md), so if the outside-the-loop share dominates at
the headline batch, the encoder is the next target.

Usage: python scripts/tpu_headline_profile.py          # B=192 int8 on TPU
       BATCH=4 JAX_PLATFORMS=cpu python scripts/tpu_headline_profile.py
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np

LOGDIR = "/tmp/jax_trace_headline"


def parse_gviz(text):
    """Parse xprof's Google-Visualization tool output into (cols, rows).

    The format is a JS object literal with INCONSISTENTLY quoted keys
    (e.g. ``{"cols":[{"id":"rank", label:"Rank", type:"number"}], rows:[...]}``),
    so bare identifier keys are quoted before json.loads. Row cells arrive as
    ``{"c":[{"v": ...}, ...]}``; returns each row as a flat list of values.
    """
    import json
    import re

    quoted = re.sub(r'([,{\[])\s*([A-Za-z_][A-Za-z0-9_]*)\s*:', r'\1"\2":', text.strip())
    obj = json.loads(quoted)
    cols = obj.get("cols", [])
    rows = []
    for row in obj.get("rows", []):
        rows.append([cell.get("v") if isinstance(cell, dict) else cell
                     for cell in row.get("c", [])])
    return cols, rows


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the env var alone loses to the container sitecustomize prepending
        # 'axon'; pin CPU before first backend use (see CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import from_random

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    batch = int(os.environ.get("BATCH", "192" if on_tpu else "4"))
    model = from_random(
        os.environ.get("MODEL", "base"), seed=0,
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    options = DecodingOptions(
        language="en", without_timestamps=True, sample_len=64,
        suppress_tokens="-1,50257", fp16=on_tpu,
        kv_quant=bool(int(os.environ.get("KV_INT8", "1" if on_tpu else "0"))),
        # match bench.py's headline default (INT8_ENC=0 A/Bs the bf16 encoder)
        int8_encoder=bool(int(os.environ.get("INT8_ENC", "1" if on_tpu else "0"))),
    )
    task = DecodingTask(model, options)
    rng = np.random.RandomState(0)
    mels = jnp.asarray(rng.randn(batch, model.dims.n_mels, 3000).astype(np.float32) * 0.3)

    print("compiling + warmup 1...", flush=True)
    task.run(mels)
    print("warmup 2...", flush=True)
    task.run(mels, rng_seed=1)  # settle donated-buffer layouts

    os.system(f"rm -rf {LOGDIR}")
    jax.profiler.start_trace(LOGDIR)
    task.run(mels, rng_seed=2)
    jax.profiler.stop_trace()
    print("trace captured", flush=True)

    xplanes = glob.glob(f"{LOGDIR}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        print("no trace captured")
        return
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    text = data.decode() if isinstance(data, bytes) else str(data)
    with open("/tmp/headline_hlo_stats.out", "w") as f:  # raw dump for manual digs
        f.write(text)

    try:
        cols, rows = parse_gviz(text)
    except Exception as e:  # key-quoting heuristic can trip on exotic HLO text
        print(f"gviz parse failed ({type(e).__name__}: {e}); "
              "raw dump: /tmp/headline_hlo_stats.out")
        return
    ids = [c.get("id", "") for c in cols]
    try:
        name_col = ids.index("hlo_op_name")
        time_col = ids.index("total_self_time")  # microseconds (label says us)
    except ValueError:
        print("unexpected hlo_stats columns:", ids)
        return
    cat_col = ids.index("category") if "category" in ids else None

    in_loop, outside, per_op = 0.0, 0.0, {}
    for row in rows:
        name = str(row[name_col] or "")
        try:
            t = float(row[time_col])
        except (TypeError, ValueError):
            continue
        key = (name.split(".")[0], str(row[cat_col]) if cat_col is not None else "")
        per_op[key] = per_op.get(key, 0.0) + t
        if "while" in name or "body" in name or "condition" in name:
            in_loop += t
        else:
            outside += t

    total = in_loop + outside
    if total == 0:
        print(f"no self-time rows parsed ({len(rows)} rows); "
              "raw dump: /tmp/headline_hlo_stats.out")
        return
    scale = 1e3  # us -> ms
    print(f"batch={batch} kv_int8={options.kv_quant} int8_enc={options.int8_encoder} "
          f"device total: {total/scale:.1f} ms")
    print(f"decode-loop (while body): {in_loop/scale:.1f} ms ({100*in_loop/total:.1f}%)")
    print(f"outside loop (encoder/prefill/logits): {outside/scale:.1f} ms ({100*outside/total:.1f}%)")
    print("\ntop op groups:")
    for (name, cat), t in sorted(per_op.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {t/scale:9.2f} ms  {name:40s} {cat}")


if __name__ == "__main__":
    main()
