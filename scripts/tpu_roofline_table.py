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
        # match tpu_train_bench's knobs so medium profiles under the
        # same config its measured row used
        optimizer_moment_dtype=os.environ.get("MOMENT_DTYPE", "float32"),
        **({"remat": os.environ["REMAT"] == "1"} if "REMAT" in os.environ else {}),
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


def load_trace(trace_dir: str):
    """hlo_stats rows from an existing trace dir (post-process without TPU)."""
    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    d = json.loads(data)
    cols = [c["id"] for c in d["cols"]]
    idx = {c: i for i, c in enumerate(cols)}
    rows = [[(c or {}).get("v") for c in r["c"]] for r in d["rows"]]
    return rows, idx


def build_table(rows, idx, label: str, extra: str = ""):
    """Per-op roofline from the profiler's measured rates: each op's floor
    is t * max(model_flop_rate / peak_flops, hbm_bw / peak_hbm_bw) — the
    time the op would take if its own executed FLOPs ran at MXU peak or its
    own HBM bytes moved at HBM peak, whichever binds. Custom-call (h2
    attention kernel) rows are compared against the dh=64-capped MXU peak
    (their dots cannot fill the 256-wide MXU k-dim)."""

    def g(r, col, default=0.0):
        v = r[idx[col]] if col in idx else None
        try:
            return float(v)
        except (TypeError, ValueError):
            return default

    peak_gflops = PEAK_FLOPS / 1e9  # model_flop_rate is in GFLOP/s
    hbm_gbps = HBM_BW / 1e9  # hbm_bw column is GB/s

    cats = {}
    for r in rows:
        cat = str(r[idx["category"]])
        t_us = g(r, "total_self_time")
        flop_rate = g(r, "model_flop_rate")  # GFLOP/s, includes pallas calls
        hbm_rate = g(r, "hbm_bw")  # GB/s of actual HBM traffic
        peak = peak_gflops * (DH64_CAP if "custom-call" in cat.lower() else 1.0)
        frac = max(flop_rate / peak, hbm_rate / hbm_gbps)
        floor_us = t_us * min(frac, 1.0)
        n, t_sum, f_sum = cats.get(cat, (0, 0.0, 0.0))
        cats[cat] = (n + 1, t_sum + t_us, f_sum + floor_us)

    total_t = sum(t for _, t, _ in cats.values())
    total_f = sum(f for _, _, f in cats.values())
    print(f"\n=== roofline table: {label} {extra} ===")
    print(f"{'category':28s} {'ops':>5s} {'meas ms':>9s} {'floor ms':>9s} {'ratio':>6s}")
    for cat, (n, t_us, f_us) in sorted(cats.items(), key=lambda kv: -kv[1][1]):
        ratio = t_us / max(f_us, 1e-9)
        print(f"{cat[:28]:28s} {n:5d} {t_us/1e3:9.2f} {f_us/1e3:9.2f} "
              f"{min(ratio, 999):6.2f}")
    print(f"{'TOTAL':28s} {'':5s} {total_t/1e3:9.2f} {total_f/1e3:9.2f} "
          f"{total_t/max(total_f,1e-9):6.2f}")
    print(f"summed per-op floors bound the measured step: measured = "
          f"{total_t/max(total_f,1e-9):.2f}x the floor sum")
    return cats


def profile_and_table(model_size: str, B: int):
    keep = os.environ.get("KEEP_TRACE")  # also copy the trace here
    rows, idx, trainer = profile_step(model_size, B)
    if keep:
        os.system(f"rm -rf {keep} && cp -r {LOGDIR} {keep}")
    build_table(rows, idx, f"{model_size} bs={B}",
                f"(remat={trainer._use_remat()}, "
                f"chunked_ce={trainer._use_chunked_ce()})")


def main():
    trace_dir = os.environ.get("TRACE_DIR")
    if trace_dir:  # post-process an existing trace, no TPU needed
        rows, idx = load_trace(trace_dir)
        build_table(rows, idx, sys.argv[1] if len(sys.argv) > 1 else trace_dir)
        return
    configs = [a.split(",") for a in sys.argv[1:]] or [("tiny", "64"), ("base", "64")]
    for m, b in configs:
        profile_and_table(m, int(b))


if __name__ == "__main__":
    main()
