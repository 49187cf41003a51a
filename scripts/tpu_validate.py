"""On-TPU validation + timing for the Pallas kernels (dev tool).

1. flash attention vs einsum parity on real Mosaic-compiled kernels
2. Pallas DTW trace vs host numpy sweep
3. encoder forward time with flash on/off
4. decode-loop step timing breakdown

Usage: python scripts/tpu_validate.py
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


def timeit(label, fn, n=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:45s} {dt * 1e3:9.2f} ms", flush=True)
    return dt


def main():
    from asr_ttl_mtl_tpu.models import from_random
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.ops.dtw import dtw_wavefront_numpy
    from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention
    from asr_ttl_mtl_tpu.ops.pallas_dtw import dtw_trace_pallas

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    # --- 1. flash attention parity (compiled, not interpret) ---
    q = jnp.asarray(rng.randn(8, 1500, 64).astype(np.float32) * 0.2)
    k = jnp.asarray(rng.randn(8, 1500, 64).astype(np.float32) * 0.2)
    v = jnp.asarray(rng.randn(8, 1500, 64).astype(np.float32))
    got = np.asarray(flash_attention(q, k, v))
    s = jnp.einsum("bqd,bkd->bqk", q, k)
    want = np.asarray(jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(s, -1), v))
    err = np.abs(got - want).max()
    print(f"flash no-mask 1500x1500 max err: {err:.2e}", flush=True)
    assert err < 2e-3, "flash parity FAILED"  # MXU fp32 = bf16 passes

    qc = jnp.asarray(rng.randn(4, 448, 64).astype(np.float32) * 0.2)
    kc = jnp.asarray(rng.randn(4, 448, 64).astype(np.float32) * 0.2)
    vc = jnp.asarray(rng.randn(4, 448, 64).astype(np.float32))
    gotc = np.asarray(flash_attention(qc, kc, vc, causal=True))
    m = np.triu(np.ones((448, 448), bool), 1)

    def ref_causal(precision):
        sc = jnp.einsum("bqd,bkd->bqk", qc, kc, precision=precision)
        sc = jnp.where(jnp.asarray(m)[None], -jnp.inf, sc)
        return np.asarray(
            jnp.einsum("bqk,bkd->bqd", jax.nn.softmax(sc, -1), vc, precision=precision)
        )

    want_def = ref_causal(None)
    want_hi = ref_causal(jax.lax.Precision.HIGHEST)
    print(f"flash causal 448: vs default einsum {np.abs(gotc - want_def).max():.2e}, "
          f"vs HIGHEST einsum {np.abs(gotc - want_hi).max():.2e}, "
          f"default-vs-HIGHEST {np.abs(want_def - want_hi).max():.2e}", flush=True)

    # --- 1b. Pallas median filter vs XLA sort on device ---
    from asr_ttl_mtl_tpu.ops.median import median_filter
    from asr_ttl_mtl_tpu.ops.pallas_median import median_filter_pallas

    xm = rng.randn(16, 1500).astype(np.float32)
    got_m = np.asarray(median_filter_pallas(jnp.asarray(xm), 7))
    want_m = np.asarray(median_filter(xm, 7))
    print(f"pallas median identical: {np.array_equal(got_m, want_m)}", flush=True)

    # --- 1b. fused Pallas log-mel frontend vs the XLA matmul-DFT path ---
    from asr_ttl_mtl_tpu.audio import N_SAMPLES, log_mel_spectrogram_jax
    from asr_ttl_mtl_tpu.ops.pallas_mel import log_mel_spectrogram_pallas

    wav = jnp.asarray((rng.randn(8, N_SAMPLES) * 0.1).astype(np.float32))
    mel_err = np.abs(
        np.asarray(log_mel_spectrogram_pallas(wav)) - np.asarray(log_mel_spectrogram_jax(wav))
    ).max()
    print(f"pallas log-mel max abs err vs XLA: {mel_err:.2e}", flush=True)
    assert mel_err < 1e-4, "log-mel parity FAILED"
    timeit("log-mel  XLA   B=8", lambda: log_mel_spectrogram_jax(wav))
    timeit("log-mel  Pallas B=8", lambda: log_mel_spectrogram_pallas(wav))

    # --- 2. Pallas DTW parity on device ---
    x = rng.rand(40, 300).astype(np.float32)
    trace_dev = dtw_trace_pallas(-x)
    trace_host = dtw_wavefront_numpy(-x)
    same = np.array_equal(trace_dev[1:, 1:], trace_host[1:, 1:])
    print(f"pallas DTW trace identical: {same}", flush=True)
    assert same, "DTW parity FAILED"

    # --- 3. encoder forward: flash vs einsum ---
    model = from_random("base", seed=0, compute_dtype=jnp.bfloat16)
    params, dims = model.params, model.dims
    mels = jnp.asarray(rng.randn(32, dims.n_mels, 3000).astype(np.float32) * 0.3).astype(jnp.bfloat16)

    W.set_flash_attention(False)
    enc_nf = jax.jit(lambda m: W.encoder_apply(params, dims, m, jnp.bfloat16))
    t_nf = timeit("encoder B=32 einsum", lambda: enc_nf(mels))
    feats_nf = jax.block_until_ready(enc_nf(mels))

    W.set_flash_attention(True)
    enc_fl = jax.jit(lambda m: W.encoder_apply(params, dims, m, jnp.bfloat16))
    t_fl = timeit("encoder B=32 flash", lambda: enc_fl(mels))
    feats_fl = jax.block_until_ready(enc_fl(mels))
    fdiff = np.abs(np.asarray(feats_fl, np.float32) - np.asarray(feats_nf, np.float32)).max()
    print(f"encoder flash-vs-einsum max feature diff: {fdiff:.3f} (bf16)", flush=True)

    # --- 3a2. natural-layout training attention backward (mh fwd+bwd
    # kernels vs einsum autodiff, compiled on chip) ---
    from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention_mh_vjp, h2_eligible

    for (bb, tq_, tk_, hh, lbl) in ((2, 1500, 1500, 8, "enc 1500x1500 d512"),
                                    (4, 48, 1500, 8, "cross 48x1500 d512")):
        d_ = hh * 64
        assert h2_eligible(tq_, tk_, d_, hh)
        qg = jnp.asarray(rng.randn(bb, tq_, d_).astype(np.float32) * 0.2).astype(jnp.bfloat16)
        kg = jnp.asarray(rng.randn(bb, tk_, d_).astype(np.float32) * 0.2).astype(jnp.bfloat16)
        vg = jnp.asarray(rng.randn(bb, tk_, d_).astype(np.float32)).astype(jnp.bfloat16)

        def mh_loss(q_, k_, v_):
            out = flash_attention_mh_vjp(q_, k_, v_, hh, None, 0.125)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def ref_loss(q_, k_, v_):
            qs = q_.reshape(bb, tq_, hh, 64)
            ks = k_.reshape(bb, tk_, hh, 64)
            vs = v_.reshape(bb, tk_, hh, 64)
            sg_ = jnp.einsum("bqhd,bkhd->bhqk", qs, ks,
                             preferred_element_type=jnp.float32) * 0.125
            wg = jax.nn.softmax(sg_, axis=-1).astype(v_.dtype)
            og = jnp.einsum("bhqk,bkhd->bqhd", wg, vs,
                            preferred_element_type=jnp.float32)
            return jnp.sum(og.reshape(bb, tq_, d_) ** 2)

        f_g = jax.jit(jax.grad(mh_loss, argnums=(0, 1, 2)))(qg, kg, vg)
        r_g = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(qg, kg, vg)
        for fg_, rg_, nm in zip(f_g, r_g, "qkv"):
            fa = np.asarray(fg_, np.float32)
            ra = np.asarray(rg_, np.float32)
            denom = np.abs(ra).max() + 1e-9
            relmax = np.abs(fa - ra).max() / denom
            print(f"mh-bwd {lbl} d{nm}: rel-max {relmax:.2e}", flush=True)
            assert relmax < 5e-2, f"mh natural bwd parity FAILED ({lbl} d{nm})"

    # --- 3b. int8 (W8A8) encoder projections: timing + closeness ---
    enc_i8 = jax.jit(
        lambda m: W.encoder_apply(params, dims, m, jnp.bfloat16, int8_linears=True)
    )
    timeit("encoder B=32 int8 linears", lambda: enc_i8(mels))
    feats_i8 = jax.block_until_ready(enc_i8(mels))
    a = np.asarray(feats_i8, np.float32).ravel()
    b = np.asarray(feats_fl, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    rel = float(np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9))
    print(f"encoder int8-vs-flash: cosine {cos:.5f}, mean rel err {rel:.4f}", flush=True)

    # --- 4. decode loop breakdown ---
    from asr_ttl_mtl_tpu.models.whisper import decoder_apply, init_kv_cache, precompute_cross_kv

    ckv = jax.jit(lambda f: precompute_cross_kv(params, dims, f))
    cross_kv = jax.block_until_ready(ckv(feats_fl))
    cache = init_kv_cache(dims, 32, jnp.bfloat16)
    toks = jnp.full((32, 1), 50258, jnp.int32)

    # cross_kv/params as ARGUMENTS (a closure would bake 295MB of constants
    # into the HLO and blow the remote-compile request limit)
    @jax.jit
    def step(params, cross_kv, tokens, cache, pos):
        logits, new_cache, _ = decoder_apply(
            params, dims, tokens, None, kv_cache=cache, cross_kv=cross_kv,
            pos_offset=pos, compute_dtype=jnp.bfloat16,
        )
        return jnp.argmax(logits[:, -1], -1)[:, None], new_cache

    timeit("decode step T=1 B=32",
           lambda: step(params, cross_kv, toks, cache, 3)[0], n=20)

    @jax.jit
    def decode64(params, cross_kv, tokens, cache):
        def body(carry, i):
            t, c = carry
            nt, nc = step(params, cross_kv, t, c, i + 3)
            return (nt, nc), None
        (t, _), _ = jax.lax.scan(body, (tokens, cache), jnp.arange(64))
        return t

    timeit("64-step scan decode",
           lambda: decode64(params, cross_kv, toks, cache), n=3)

    # --- 5. full fused decode task (what bench.py measures) ---
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import from_random as _fr

    model2 = from_random("base", seed=0, compute_dtype=jnp.bfloat16)
    options = DecodingOptions(
        language="en", without_timestamps=True, sample_len=64,
        suppress_tokens="-1,50257", fp16=True,
    )
    task = DecodingTask(model2, options)
    mels_f32 = jnp.asarray(np.asarray(mels, np.float32))
    task.run(mels_f32)
    timeit("full DecodingTask.run B=32 64tok", lambda: task.run(mels_f32), n=3)

    # --- 6. end-to-end greedy parity: fused decode kernel vs einsum path ---
    res_kernel = task.run(mels_f32)
    W.set_decode_kernel("off")
    try:
        res_einsum = task.run(mels_f32)
    finally:
        W.set_decode_kernel("auto")
    same = sum(a.tokens == b.tokens for a, b in zip(res_kernel, res_einsum))
    print(f"decode-kernel vs einsum: {same}/32 identical token sequences", flush=True)
    if same < 32:
        for i, (a, b) in enumerate(zip(res_kernel, res_einsum)):
            if a.tokens != b.tokens:
                # bf16 argmax near-ties can flip a token; print the first few
                print(f"  [{i}] kernel={a.tokens[:12]}... einsum={b.tokens[:12]}...", flush=True)
                break


if __name__ == "__main__":
    main()
