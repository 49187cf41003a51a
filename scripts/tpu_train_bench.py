"""MTL fine-tune throughput on the real chip vs the reference's training log
(BASELINE.md: tiny, bs=16, ~4.2 it/s early -> ~1.8 it/s late on an RTX 3090,
fp32). Full-size model, synthetic audio (input pipeline excluded — this
measures the train step; the C++ batch loader runs at >100 files/s/thread).

Usage:
  python scripts/tpu_train_bench.py [model_size] [batch] [sm]   # one point
  python scripts/tpu_train_bench.py sweep [models] [batches] [sm]
      # batch-scaling study, e.g. `sweep tiny,base 16,64,128,256 sm`
      # (`sm` also A/Bs the shard_map(dp=1) step at the first batch size)
  python scripts/tpu_train_bench.py epoch [model] [clip_s] [transfer] [k] [packed]
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


def main():
    model_size = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dp_shard_map = "force" if (len(sys.argv) > 3 and sys.argv[3] == "sm") else True
    bench_one(model_size, B, dp_shard_map=dp_shard_map)


def bench_one(model_size: str, B: int, dp_shard_map=True, K: int = 8):
    """Measure the fused train step at (model, batch); returns a result dict."""
    from asr_ttl_mtl_tpu.mtl import MultiTaskTrainer, TrainingConfig

    remat_env = os.environ.get("REMAT")  # "0"/"1" overrides the auto policy
    K = int(os.environ.get("K", K))  # steps fused per dispatch
    extra = {}
    if remat_env is not None:
        extra["remat"] = remat_env == "1"
    if "CHUNKED_CE" in os.environ:  # A/B the chunked-CE path ("0" = materialized)
        extra["chunked_ce"] = os.environ["CHUNKED_CE"] == "1"
    config = TrainingConfig(
        model_size=model_size,
        pretrained="random",  # architecture identical to the real checkpoint
        batch_size=B,
        compute_dtype="bfloat16",
        dp_shard_map=dp_shard_map,
        seed=0,
        # bf16 m/v buffers (MOMENT_DTYPE=bfloat16): the knob that fits
        # whisper-medium's optimizer state on one chip
        optimizer_moment_dtype=os.environ.get("MOMENT_DTYPE", "float32"),
        **extra,
    )
    trainer = MultiTaskTrainer(config, verbose=False)
    tok = trainer.tokenizer

    rng = np.random.RandomState(0)
    L = 48  # bucket the reference's ~10-40-token labels land in
    input_tokens = np.full((B, L), tok.eot, np.int32)
    target_tokens = np.full((B, L), -100, np.int32)
    for i in range(B):
        seq = [tok.sot, list(tok.disease_tokens.values())[i % 3]]
        seq += tok.encode(" the quick brown fox jumps over the lazy dog today") + [tok.eot]
        input_tokens[i, : len(seq) - 1] = seq[:-1]
        target_tokens[i, : len(seq) - 1] = seq[1:]
    batch = {
        "audio": (rng.randn(B, config.audio_samples) * 0.05).astype(np.float32),
        "input_tokens": input_tokens,
        "target_tokens": target_tokens,
        "classes": np.asarray([i % 3 for i in range(B)], np.int32),
    }

    from asr_ttl_mtl_tpu.parallel import stacked_data_sharding

    # K optimizer steps per dispatch (config.steps_per_call auto on TPU)
    dev = {}
    for key_ in ("audio", "input_tokens", "target_tokens", "classes"):
        v = np.stack([batch[key_]] * K)
        if key_ == "audio":  # same transfer quantization the trainer applies
            v = trainer._audio_for_transfer(v)
        dev[key_] = jax.device_put(v, stacked_data_sharding(trainer.mesh, v.ndim))

    scan_fn = trainer._get_train_scan_step(K)
    trainable = trainer._trainable()
    opt_state = trainer.opt_state
    key = jax.random.PRNGKey(0)
    a = jnp.asarray(0.5, jnp.float32)

    def one_call(trainable, opt_state, k):
        return scan_fn(
            trainable, opt_state, dev["audio"], dev["input_tokens"],
            dev["target_tokens"], dev["classes"], a, a, k,
            np.full((K,), B, np.int32),
        )

    # 3 warmup calls: the first ones pay server-side compiles for the
    # donated-buffer layouts; steady state starts afterwards
    for i in range(3):
        t0 = time.perf_counter()
        trainable, opt_state, key, losses, _ = one_call(trainable, opt_state, key)
        lv = float(np.asarray(losses)[-1])
        print(f"warmup {i}: {time.perf_counter() - t0:.1f} s loss={lv:.4f}", flush=True)

    host = {k: np.asarray(v) for k, v in
            ((k_, np.stack([batch[k_]] * K)) for k_ in
             ("audio", "input_tokens", "target_tokens", "classes"))}
    host["audio"] = trainer._audio_for_transfer(host["audio"])

    N = 6  # dispatches = N*K optimizer steps; fresh H2D per call (real epoch shape)
    t0 = time.perf_counter()
    for _ in range(N):
        dev = {k: jax.device_put(v, stacked_data_sharding(trainer.mesh, v.ndim))
               for k, v in host.items()}
        trainable, opt_state, key, losses, _ = scan_fn(
            trainable, opt_state, dev["audio"], dev["input_tokens"],
            dev["target_tokens"], dev["classes"], a, a, key,
            np.full((K,), B, np.int32),
        )
        float(np.asarray(losses)[-1])  # force completion (async-safe timing)
    dt = (time.perf_counter() - t0) / (N * K)
    result = {"model": model_size, "B": B, "dp_shard_map": dp_shard_map,
              "remat": trainer._use_remat(),
              "ms_incl_h2d": dt * 1e3, "samples_per_s": B / dt}
    print(
        f"{model_size} bs={B} (fused x{K}, incl H2D): {dt * 1e3:.1f} ms/step = {1 / dt:.2f} it/s "
        f"= {B / dt:.1f} samples/s (reference 3090: 1.8-4.2 it/s at tiny bs=16)",
        flush=True,
    )

    # MFU from XLA's own cost analysis of the fused program (per optimizer
    # step), against the v5e peak of 197 TFLOP/s bf16
    try:
        lowered = scan_fn.lower(
            trainable, opt_state, dev["audio"], dev["input_tokens"],
            dev["target_tokens"], dev["classes"], a, a, key,
            np.full((K,), B, np.int32),
        )
        cost = lowered.compile().cost_analysis()
        flops_per_step = float(cost.get("flops", 0.0)) / K
        # XLA's cost analysis does NOT count custom-call (Pallas) FLOPs, so
        # with the flash kernels live the encoder self-attention — the
        # biggest matmul block in the step — is invisible to it. Add it
        # analytically: per layer 2 (T,d)x(d,T) + (T,T)x(T,d) matmuls
        # = 4*B*T^2*d fwd; the FA2 backward (recompute + dQ/dK/dV) ~2.5x.
        from asr_ttl_mtl_tpu.models import whisper as W_

        attn_flops = 0.0
        if W_._FLASH["enabled"] and jax.default_backend() == "tpu":
            d = trainer.model.dims.n_audio_state
            t_run = -(-trainer.model.dims.n_audio_ctx // 128) * 128
            layers = trainer.model.dims.n_audio_layer
            attn_flops = layers * 4.0 * B * t_run * t_run * d * 3.5
        flops_total = flops_per_step + attn_flops
        peak = 197e12

        # device-only step time: re-time with inputs already resident (no H2D)
        t0 = time.perf_counter()
        trainable, opt_state, key, losses, _ = one_call(trainable, opt_state, key)
        float(np.asarray(losses)[-1])
        dt_dev = (time.perf_counter() - t0) / K
        result.update(ms_device=dt_dev * 1e3,
                      gflops_per_step=flops_total / 1e9,
                      gflops_xla_counted=flops_per_step / 1e9,
                      mfu_pct=(flops_total / dt_dev) / peak * 100,
                      mfu_incl_h2d_pct=(flops_total / dt) / peak * 100)
        # Basis note: under remat the backward RE-EXECUTES the encoder
        # matmuls; XLA's cost analysis counts that recompute (it appears in
        # the lowered program) but the analytic flash add-on is the
        # no-recompute 3.5x either way, so remat rows count model FLOPs, not
        # executed FLOPs, for the attention share. Say which basis this row
        # used so mixed tables aren't misread.
        basis = "remat (attention FLOPs=model, XLA rows=executed)" if (
            trainer._use_remat()) else "no-remat (all FLOPs=executed)"
        print(
            f"  train-step FLOPs {flops_total / 1e9:.1f} G "
            f"({flops_per_step / 1e9:.1f} XLA-counted + "
            f"{attn_flops / 1e9:.1f} flash-attention); device-resident "
            f"step {dt_dev * 1e3:.1f} ms -> MFU {(flops_total / dt_dev) / peak * 100:.1f}% "
            f"of v5e bf16 peak ({flops_total / dt_dev / 1e12:.2f} TFLOP/s); "
            f"incl-H2D MFU {(flops_total / dt) / peak * 100:.1f}% "
            f"[basis: {basis}]",
            flush=True,
        )
    except Exception as e:
        print(f"  (cost analysis unavailable: {e})", flush=True)
    return result


def sweep_mode():
    """Training batch-scaling study: samples/s + MFU at each batch size,
    tiny and base (PERF.md training table). Usage:
      python scripts/tpu_train_bench.py sweep [models] [batches] [sm]
    e.g. `sweep tiny,base 16,64,128,256`. Appending `sm` also A/Bs the
    shard_map(dp=1) step at the first batch size (must match the plain
    single-device step time — same program on local shapes)."""
    models = (sys.argv[2] if len(sys.argv) > 2 else "tiny,base").split(",")
    batches = [int(b) for b in (sys.argv[3] if len(sys.argv) > 3 else
                                "16,64,128,256").split(",")]
    do_sm = len(sys.argv) > 4 and sys.argv[4] == "sm"
    rows = []
    for m in models:
        for B in batches:
            try:
                rows.append(bench_one(m, B))
            except Exception as e:
                print(f"{m} bs={B}: FAILED ({type(e).__name__}: {e})", flush=True)
                rows.append({"model": m, "B": B, "error": str(e)[:200]})
        if do_sm:
            try:
                rows.append(bench_one(m, batches[0], dp_shard_map="force"))
            except Exception as e:
                print(f"{m} bs={batches[0]} sm: FAILED ({e})", flush=True)

    print("\n== batch-scaling study ==", flush=True)
    print(f"{'model':>8} {'bs':>5} {'mode':>6} {'ms/step':>8} {'samples/s':>10} "
          f"{'MFU%':>6}", flush=True)
    for r in rows:
        if "error" in r:
            print(f"{r['model']:>8} {r['B']:>5}  ERROR: {r['error'][:60]}", flush=True)
            continue
        mode = "sm" if r.get("dp_shard_map") == "force" else "pjit1"
        print(f"{r['model']:>8} {r['B']:>5} {mode:>6} "
              f"{r.get('ms_device', r['ms_incl_h2d']):>8.1f} "
              f"{r['samples_per_s']:>10.1f} {r.get('mfu_pct', 0):>6.2f}", flush=True)
    import json
    print(json.dumps(rows), flush=True)


def epoch_mode():
    """Time trainer.train_epoch itself (the realistic number: input pipeline
    H2D + fused dispatches + deferred metric fetches)."""
    from asr_ttl_mtl_tpu.mtl import MultiTaskTrainer, TrainingConfig

    model_size = sys.argv[2] if len(sys.argv) > 2 else "tiny"
    # clip length shipped per sample: the dataset pipeline buckets H2D to the
    # true clip length (TORGO/UncommonVoice clips are mostly < 8 s); pass 30
    # to force the old fully-padded transfers
    clip_seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 7.5
    transfer = sys.argv[4] if len(sys.argv) > 4 else "int16"
    k = int(sys.argv[5]) if len(sys.argv) > 5 else 0  # 0 = auto (8 on TPU)
    # 6th arg: packed-state dispatch — "on"/"off"/"auto" (default auto)
    packed = {"on": True, "off": False}.get(
        sys.argv[6] if len(sys.argv) > 6 else "auto")
    B, NBATCH = 16, 48

    config = TrainingConfig(model_size=model_size, pretrained="random",
                            batch_size=B, compute_dtype="bfloat16", seed=0,
                            alpha=0.5, beta=0.5, audio_transfer_dtype=transfer,
                            steps_per_call=k, packed_dispatch=packed)
    trainer = MultiTaskTrainer(config, verbose=False)
    tok = trainer.tokenizer
    rng = np.random.RandomState(0)
    L = 48
    ship_samples = min(int(clip_seconds * 16000), config.audio_samples)
    from asr_ttl_mtl_tpu.mtl.dataset import audio_buckets, bucket_length

    ship_samples = bucket_length(ship_samples, audio_buckets(config))
    it_ = np.full((B, L), tok.eot, np.int32)
    tt = np.full((B, L), -100, np.int32)
    seq = [tok.sot, list(tok.disease_tokens.values())[0]] + tok.encode(
        " the quick brown fox jumps over the lazy dog today") + [tok.eot]
    for i in range(B):
        it_[i, : len(seq) - 1] = seq[:-1]
        tt[i, : len(seq) - 1] = seq[1:]
    batches = [
        {"audio": (rng.randn(B, ship_samples) * 0.05).astype(np.float32),
         "input_tokens": it_, "target_tokens": tt,
         "classes": np.asarray([i % 3 for i in range(B)], np.int32),
         "texts": ["the quick brown fox jumps over the lazy dog today"] * B}
        for _ in range(NBATCH)
    ]
    if transfer == "mel_fp16":
        # the real loader converts in its producer thread (overlapped with
        # training); pre-convert here to measure the same pipeline shape
        from asr_ttl_mtl_tpu.audio import log_mel_for_transfer

        for b in batches:
            b["audio"] = log_mel_for_transfer(
                b["audio"], full_samples=config.audio_samples)
        kb = batches[0]["audio"].nbytes / 1024
    else:
        kb = batches[0]["audio"].nbytes / 1024 / (2 if transfer == "int16" else 1)
    print(f"shipping {ship_samples} samples/clip ({ship_samples / 16000:.1f} s "
          f"buckets) as {transfer}: {kb:.0f} KiB/batch", flush=True)

    trainer.train_epoch(batches[:16], 0)  # compile + warm layouts
    t0 = time.perf_counter()
    m = trainer.train_epoch(batches, 1)
    wall = time.perf_counter() - t0
    print(f"{model_size} epoch: {NBATCH} steps x bs={B} in {wall:.1f} s = "
          f"{NBATCH / wall:.2f} it/s = {NBATCH * B / wall:.1f} samples/s "
          f"(loss {m['loss']:.3f})", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "epoch":
        epoch_mode()
    elif len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep_mode()
    else:
        main()
