"""On-chip benchmark: batched vs sequential word-timestamp alignment.

Measures `timing.find_alignment_batch` (one device program for the whole
window batch + per-row host DTW) against per-window `timing.find_alignment`
on the real TPU. The batched program keeps the standardize/median/head-mean
pipeline on device and fetches only (B, T_text, T_audio) cost matrices —
~n_heads x less D2H than fetching raw attention, which dominated through
the tunnel.

Run: python scripts/tpu_align_bench.py  (owns the TPU; run alone)
"""

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(repo, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from asr_ttl_mtl_tpu.models.dims import PRESET_DIMS
from asr_ttl_mtl_tpu.models.registry import WhisperModel
from asr_ttl_mtl_tpu.models.whisper import init_params
from asr_ttl_mtl_tpu.tokenizer import get_tokenizer
from asr_ttl_mtl_tpu import timing


def main():
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_words = 15

    dims = PRESET_DIMS["base"]
    params = init_params(jax.random.PRNGKey(0), dims)
    model = WhisperModel(dims=dims, params=params, compute_dtype=jnp.bfloat16)
    tok = get_tokenizer(multilingual=True, num_languages=100, language="en",
                        task="transcribe")
    print("alignment heads:", int(np.asarray(model.alignment_heads).sum()))

    rng = np.random.RandomState(0)
    mels = rng.randn(n_windows, dims.n_mels, 3000).astype(np.float32) * 0.1
    token_lists = [
        [int(t) for t in rng.randint(300, 20000, size=3 * n_words)]
        for _ in range(n_windows)
    ]
    frames = [3000] * n_windows

    # --- batched: warm then time ------------------------------------------
    # device DTW (Pallas fill + on-device backtrace; the default on TPU)
    # vs the host matrix-walk path, both over the same batched forward
    run_b = lambda: timing.find_alignment_batch(model, tok, token_lists, mels, frames)
    run_b()
    t0 = time.perf_counter()
    out_b = run_b()
    batched_s = time.perf_counter() - t0

    run_h = lambda: timing.find_alignment_batch(
        model, tok, token_lists, mels, frames, use_device_dtw=False)
    run_h()
    t0 = time.perf_counter()
    out_h = run_h()
    host_dtw_s = time.perf_counter() - t0
    same = all(
        [w.word for w in b] == [w.word for w in h]
        and all(wb.start == wh.start and wb.end == wh.end
                for wb, wh in zip(b, h))
        for b, h in zip(out_b, out_h)
    )
    print(f"batched device-DTW {batched_s*1e3:.0f} ms vs host-DTW "
          f"{host_dtw_s*1e3:.0f} ms ({host_dtw_s/batched_s:.1f}x); "
          f"words+times identical: {same}")

    # --- sequential: warm one window then time all ------------------------
    timing.find_alignment(model, tok, token_lists[0], jnp.asarray(mels[0]), frames[0])
    t0 = time.perf_counter()
    out_s = [
        timing.find_alignment(model, tok, tl, jnp.asarray(m), f)
        for tl, m, f in zip(token_lists, mels, frames)
    ]
    sequential_s = time.perf_counter() - t0

    total = agree = 0
    for b, s in zip(out_b, out_s):
        assert [w.word for w in b] == [w.word for w in s]
        for wb, ws in zip(b, s):
            total += 1
            agree += abs(wb.start - ws.start) <= 0.021 and abs(wb.end - ws.end) <= 0.021
    audio_s = n_windows * 30.0
    print(
        f"alignment {n_windows} windows: sequential {sequential_s*1e3:.0f} ms, "
        f"batched {batched_s*1e3:.0f} ms ({sequential_s/batched_s:.1f}x; "
        f"{audio_s/batched_s:.0f} audio-sec/s of alignment)"
    )
    # random weights are the worst case for DTW stability: attention is flat,
    # so bf16 batch-shape noise can move a cut point; structured weights agree
    # exactly (tests/test_transcribe_features.py batched-vs-sequential)
    print(f"words timed within one DTW frame of sequential: {agree}/{total}")


if __name__ == "__main__":
    main()
