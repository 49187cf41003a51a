"""Compiled-program HBM accounting for the train step (compile-only, no
execution): XLA's memory_analysis() for chosen (model, batch, chunked_ce,
remat) configs — the definitive answer to "does base bs=128 fit un-remat'd
once the (B,T,51869) logits tensor is gone" (round-5 VERDICT #2) and "does
whisper-medium's state + remat'd activations fit 16 GB" (#1).

Usage: python scripts/tpu_mem_analysis.py model,B,chunked,remat ...
       e.g.  base,128,1,0 base,128,0,0 medium,8,1,1
(chunked/remat: 1/0; remat 'a' = auto policy)
"""

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


def analyze(model_size: str, B: int, chunked: str, remat: str,
            moment_dtype: str = "float32"):
    from asr_ttl_mtl_tpu.mtl.config import TrainingConfig
    from asr_ttl_mtl_tpu.mtl.trainer import MultiTaskTrainer

    cfg = TrainingConfig(
        model_size=model_size, pretrained="random", compute_dtype="bfloat16",
        batch_size=B,
        chunked_ce=(chunked == "1"),
        optimizer_moment_dtype=moment_dtype,
        **({} if remat == "a" else {"remat": remat == "1"}),
    )
    trainer = MultiTaskTrainer(cfg, verbose=False)
    T = int(os.environ.get("T", "48"))  # token bucket; 448 = the long bucket
    rng = np.random.RandomState(0)
    audio = trainer._audio_for_transfer(
        (rng.randn(B, 480000) * 0.1).astype(np.float32))
    it = rng.randint(0, 1000, (B, T)).astype(np.int32)
    tt = rng.randint(0, 1000, (B, T)).astype(np.int32)
    cl = rng.randint(0, 3, (B,)).astype(np.int32)

    step = trainer._get_train_step()
    a = jnp.asarray(0.5, jnp.float32)
    key = jax.random.PRNGKey(0)
    tag = (f"{model_size} bs={B} T={T} chunked={trainer._use_chunked_ce()} "
           f"remat={trainer._use_remat()} moments={moment_dtype}")
    try:
        lowered = step.lower(
            trainer._trainable(), trainer.opt_state, audio, it, tt, cl,
            a, a, key, np.int32(B))
        compiled = lowered.compile()
        m = compiled.memory_analysis()
        args_gb = m.argument_size_in_bytes / 1e9
        out_gb = m.output_size_in_bytes / 1e9
        tmp_gb = m.temp_size_in_bytes / 1e9
        alias_gb = getattr(m, "alias_size_in_bytes", 0) / 1e9
        peak_gb = args_gb + out_gb + tmp_gb - alias_gb
        print(f"{tag}: args {args_gb:.2f} GB + outputs {out_gb:.2f} GB "
              f"+ temps {tmp_gb:.2f} GB - aliased {alias_gb:.2f} GB "
              f"= peak ~{peak_gb:.2f} GB {'FITS' if peak_gb < 16 else 'OVER'} 16 GB",
              flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:200]
        print(f"{tag}: COMPILE FAILED ({msg})", flush=True)


def main():
    specs = sys.argv[1:] or ["base,128,1,0", "base,128,0,0", "medium,8,1,1"]
    for spec in specs:
        parts = spec.split(",")
        model, b, chunked, remat = parts[0], int(parts[1]), parts[2], parts[3]
        md = parts[4] if len(parts) > 4 else "float32"
        analyze(model, b, chunked, remat, md)


if __name__ == "__main__":
    main()
