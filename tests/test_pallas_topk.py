"""Pallas single-pass top-k vs lax.top_k: bit-identical values AND indices
(tie order included) across shapes, duplicates, -inf rows, and padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_ttl_mtl_tpu.ops.pallas_topk import topk_pallas


def _check(x, k):
    want_v, want_i = jax.lax.top_k(jnp.asarray(x), k)
    got_v, got_i = topk_pallas(jnp.asarray(x), k, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


@pytest.mark.quick
@pytest.mark.parametrize("b,v,k", [(4, 1000, 6), (240, 5187, 6), (3, 130, 2), (8, 128, 1),
                                   # whole-family vocab widths: multilingual-v2 (51865),
                                   # v3 (51866), and the MTL-expanded 51869/51872
                                   (2, 51865, 6), (2, 51866, 6), (2, 51872, 6)])
def test_matches_lax_topk_random(b, v, k):
    rng = np.random.RandomState(b * v + k)
    _check(rng.randn(b, v).astype(np.float32), k)


@pytest.mark.quick
def test_ties_and_duplicates():
    # duplicated maxima must be listed repeatedly, lowest index first
    x = np.zeros((4, 300), np.float32)
    x[0, [7, 50, 123]] = 5.0
    x[1, :] = 1.0  # all equal
    x[2, [299, 0]] = 3.0
    _check(x, 6)


@pytest.mark.quick
def test_neg_inf_rows_prefer_real_indices_over_padding():
    # a row whose entries are all -inf: top-k must return real indices
    # (0..k-1), never the -inf lane padding the kernel adds
    x = np.full((2, 517), -np.inf, np.float32)
    x[1, 300] = 1.0
    want_v, want_i = jax.lax.top_k(jnp.asarray(x), 6)
    got_v, got_i = topk_pallas(jnp.asarray(x), 6, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
    assert np.asarray(got_i).max() < 517
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))


@pytest.mark.quick
def test_beam_search_uses_kernel_and_matches_fallback():
    """Full jitted beam window with the topk kernel (interpret) vs the
    lax.top_k path: identical sequences."""
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import from_random
    from asr_ttl_mtl_tpu.models import whisper as W

    from asr_ttl_mtl_tpu.models.dims import PRESET_DIMS

    dims = PRESET_DIMS["tiny.en"].replace(
        n_audio_ctx=100, n_audio_state=64, n_audio_head=2, n_audio_layer=1,
        n_text_state=64, n_text_head=2, n_text_layer=1,
    )
    model = from_random(dims, seed=3, compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, model.dims.n_mels, 200).astype(np.float32) * 0.3)
    opts = DecodingOptions(language="en", without_timestamps=True, beam_size=3,
                           sample_len=6, fp16=False, suppress_tokens=None)

    outs = {}
    for mode in ("interpret", "off"):
        W.set_decode_kernel(mode)
        try:
            outs[mode] = DecodingTask(model, opts).run(mel)
        finally:
            W.set_decode_kernel("auto")
    assert [r.tokens for r in outs["interpret"]] == [r.tokens for r in outs["off"]]


@pytest.mark.quick
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_topk_logprobs_matches_logsoftmax_then_topk(dtype):
    from asr_ttl_mtl_tpu.ops.pallas_topk import topk_logprobs_pallas

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(17, 1111).astype(np.float32) * 3).astype(dtype)
    # suppressed lanes (-inf) like the beam filters produce
    x = x.at[:, 5].set(-np.inf)
    want_v, want_i = jax.lax.top_k(
        jax.nn.log_softmax(x.astype(jnp.float32), axis=-1), 6
    )
    got_v, got_i = topk_logprobs_pallas(x, 6, interpret=True)
    # indices exact; values within reduction-order rounding (the kernel's
    # logsumexp sums over the padded lane count)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=2e-6, atol=2e-6
    )
