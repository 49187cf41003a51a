"""Full-step roofline table (PERF.md, round-5): per HLO category the
measured device self-time of one MTL train step, the FLOP-or-bytes floor at
the hardware caps, and the ratio — so "structurally capped" is an
end-to-end-proven claim (summed floors bound the step) instead of a
per-category assertion.

Floors (v5e):
  * MXU GEMMs: category FLOPs / 197 TFLOP/s bf16 peak. Attention dot
    products at dh=64 fill at most half the 256-wide MXU k-dim -> those
    (the h2 custom-call kernels) get a 0.5 peak cap.
  * HBM-bound categories (fusions/elementwise/copies/CE): bytes accessed /
    819 GB/s.
Every op gets max(flop_floor, byte_floor) — the roofline — summed per
category. XLA's per-op `model_flops`/`bytes accessed` come from the
profiler's hlo_stats (custom-call FLOPs are counted analytically like
tpu_train_bench does, since cost_analysis skips them).

Usage: python scripts/tpu_roofline_table.py [model,batch ...]
       (default: tiny,64 base,64)
"""

import glob
import json
import os
import re
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

LOGDIR = "/tmp/jax_trace_roofline"
PEAK_FLOPS = 197e12  # v5e bf16
HBM_BW = 819e9  # v5e HBM GB/s
DH64_CAP = 0.5  # dh=64 attention dots fill <=128 of the 256-wide MXU k-dim


def profile_step(model_size: str, B: int):
    """One traced train step -> (rows, col-index map, trainer)."""
    from asr_ttl_mtl_tpu.mtl.config import TrainingConfig
    from asr_ttl_mtl_tpu.mtl.trainer import MultiTaskTrainer
    from asr_ttl_mtl_tpu.parallel.mesh import data_sharding

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
    trainable, opt_state = trainer._trainable(), trainer.opt_state
    a = jnp.asarray(0.5, jnp.float32)
    key = jax.random.PRNGKey(0)

    def one(trainable, opt_state):
        return step(trainable, opt_state, dev["audio"], dev["input_tokens"],
                    dev["target_tokens"], dev["classes"], a, a, key, np.int32(B))

    for _ in range(3):
        trainable, opt_state, loss, aux = one(trainable, opt_state)
    jax.block_until_ready(loss)

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
    idx = {c: i for i, c in enumerate(cols)}
    rows = [[(c or {}).get("v") for c in r["c"]] for r in d["rows"]]
    return rows, idx, trainer


def attention_custom_call_flops(trainer, B: int) -> float:
    """Analytic FLOPs of the Pallas h2 flash fwd+bwd custom calls (XLA's
    stats carry no FLOPs for custom calls): per encoder layer 4*B*T^2*d for
    the fwd dots, ~2.5x more for the FA2 backward recompute+dgrads."""
    dims = trainer.model.dims
    t_run = -(-dims.n_audio_ctx // 128) * 128
    if trainer._use_remat():
        # backward re-runs the fwd kernel once more under remat
        factor = 4.5
    else:
        factor = 3.5
    return dims.n_audio_layer * 4.0 * B * t_run * t_run * dims.n_audio_state * factor


def build_table(model_size: str, B: int):
    rows, idx, trainer = profile_step(model_size, B)

    def g(r, col, default=0.0):
        v = r[idx[col]] if col in idx else None
        try:
            return float(v)
        except (TypeError, ValueError):
            return default

    # available columns vary by xprof version; find flops/bytes columns
    flop_col = next((c for c in idx if "flop" in c.lower()), None)
    byte_col = next((c for c in idx if "bytes" in c.lower()), None)
    print(f"(columns: time=total_self_time flops={flop_col} bytes={byte_col})")

    cc_flops_total = attention_custom_call_flops(trainer, B)
    cc_time_total = sum(
        g(r, "total_self_time") for r in rows
        if "custom-call" in str(r[idx["category"]]).lower()
    )

    cats = {}
    for r in rows:
        cat = str(r[idx["category"]])
        t_us = g(r, "total_self_time")
        fl = g(r, flop_col) if flop_col else 0.0
        by = g(r, byte_col) if byte_col else 0.0
        if "custom-call" in cat.lower():
            # apportion the analytic kernel FLOPs by each call's share of
            # custom-call time; dh=64 halves the usable MXU width
            fl = cc_flops_total * (t_us / max(cc_time_total, 1e-9))
            floor_s = fl / (PEAK_FLOPS * DH64_CAP)
        else:
            floor_s = max(fl / PEAK_FLOPS, by / HBM_BW)
        n, t_sum, f_sum = cats.get(cat, (0, 0.0, 0.0))
        cats[cat] = (n + 1, t_sum + t_us, f_sum + floor_s * 1e6)

    total_t = sum(t for _, t, _ in cats.values())
    total_f = sum(f for _, _, f in cats.values())
    print(f"\n=== roofline table: {model_size} bs={B} "
          f"(remat={trainer._use_remat()}, chunked_ce={trainer._use_chunked_ce()}) ===")
    print(f"{'category':28s} {'ops':>5s} {'meas ms':>9s} {'floor ms':>9s} {'ratio':>6s}")
    for cat, (n, t_us, f_us) in sorted(cats.items(), key=lambda kv: -kv[1][1]):
        ratio = t_us / max(f_us, 1e-9)
        print(f"{cat[:28]:28s} {n:5d} {t_us/1e3:9.2f} {f_us/1e3:9.2f} "
              f"{min(ratio, 999):6.2f}")
    print(f"{'TOTAL':28s} {'':5s} {total_t/1e3:9.2f} {total_f/1e3:9.2f} "
          f"{total_t/max(total_f,1e-9):6.2f}")
    print(f"summed floors bound the measured step within "
          f"{(total_t/max(total_f,1e-9) - 1)*100:.0f}% overhead")
    return cats


def main():
    configs = [a.split(",") for a in sys.argv[1:]] or [("tiny", "64"), ("base", "64")]
    for m, b in configs:
        build_table(m, int(b))


if __name__ == "__main__":
    main()
