"""Device self-time of one MTL train step (tiny, bs=16, bf16) via a
jax.profiler trace — isolates device compute from tunnel H2D/dispatch cost
(dev tool).

Usage: python scripts/tpu_trainstep_profile.py [model_size] [batch]
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

LOGDIR = "/tmp/jax_trace_trainstep"


def main():
    from asr_ttl_mtl_tpu.mtl.config import TrainingConfig
    from asr_ttl_mtl_tpu.mtl.trainer import MultiTaskTrainer
    from asr_ttl_mtl_tpu.parallel.mesh import data_sharding

    model_size = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    T = 48
    config = TrainingConfig(
        model_size=model_size, pretrained="random", compute_dtype="bfloat16",
        batch_size=B,
    )
    trainer = MultiTaskTrainer(config, verbose=False)
    rng = np.random.RandomState(0)
    batch = {
        "audio": (rng.randn(B, 480000) * 0.1).astype(np.float32),
        "input_tokens": rng.randint(0, 1000, (B, T)).astype(np.int32),
        "target_tokens": rng.randint(0, 1000, (B, T)).astype(np.int32),
        "classes": rng.randint(0, 3, (B,)).astype(np.int32),
    }
    dev = {}
    for key_ in ("audio", "input_tokens", "target_tokens", "classes"):
        v = batch[key_]
        if key_ == "audio":
            v = trainer._audio_for_transfer(v)
        dev[key_] = jax.device_put(v, data_sharding(trainer.mesh, v.ndim))

    step = trainer._get_train_step()
    trainable = trainer._trainable()
    opt_state = trainer.opt_state
    a = jnp.asarray(0.5, jnp.float32)
    key = jax.random.PRNGKey(0)

    def one(trainable, opt_state):
        return step(
            trainable, opt_state, dev["audio"], dev["input_tokens"],
            dev["target_tokens"], dev["classes"], a, a, key, np.int32(B),
        )

    for i in range(3):
        trainable, opt_state, loss, aux = one(trainable, opt_state)
    print(f"warm loss={float(np.asarray(loss)):.4f}", flush=True)

    os.system(f"rm -rf {LOGDIR}")
    jax.profiler.start_trace(LOGDIR)
    out = one(trainable, opt_state)
    jax.block_until_ready(out)
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
    print(f"train step device self time: {tot/1e3:.1f} ms over {len(rows)} ops")

    # category rollup — the long tail of small ops is where a low-MFU step
    # hides (per-leaf optimizer chains, layernorms, format copies)
    cats = {}
    for r in rows:
        c = str(r[i["category"]])
        st = float(r[i["total_self_time"]] or 0)
        n, s = cats.get(c, (0, 0.0))
        cats[c] = (n + 1, s + st)
    for c, (n, s) in sorted(cats.items(), key=lambda kv: -kv[1][1]):
        print(f"  {s/1e3:7.2f}ms {100*s/tot:5.1f}% {n:5d} ops  {c}")

    # name-level rollup of everything OUTSIDE the model's custom calls:
    # group by the leading op name before any digit suffix
    import re as _re

    groups = {}
    for r in rows:
        name = str(r[i["hlo_op_name"]])
        key = _re.split(r"[.\d]", name, 1)[0]
        st = float(r[i["total_self_time"]] or 0)
        n, s = groups.get(key, (0, 0.0))
        groups[key] = (n + 1, s + st)
    print("top op-name groups:")
    for k, (n, s) in sorted(groups.items(), key=lambda kv: -kv[1][1])[:12]:
        print(f"  {s/1e3:7.2f}ms {100*s/tot:5.1f}% {n:5d} ops  {k}")
    for r in rows[:34]:
        st = float(r[i["total_self_time"]])
        print(
            f'{st/1e3:7.2f}ms {100*st/tot:5.1f}% occ={r[i["occurrences"]]:>4} '
            f'{str(r[i["category"]])[:18]:18s} bound={r[i["bound_by"]]} '
            f'{str(r[i["hlo_op_name"]])[:52]}'
        )


if __name__ == "__main__":
    main()
