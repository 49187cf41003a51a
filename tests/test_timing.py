"""Word-timing parity: median filter, DTW, find_alignment, add_word_timestamps."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import import_reference_whisper, reference_available

from asr_ttl_mtl_tpu.models.dims import ModelDimensions
from asr_ttl_mtl_tpu.models.registry import WhisperModel, convert_torch_state_dict
from asr_ttl_mtl_tpu.ops.dtw import dtw, dtw_wavefront_numpy, backtrace
from asr_ttl_mtl_tpu.ops.median import median_filter
from asr_ttl_mtl_tpu.tokenizer import get_tokenizer
from asr_ttl_mtl_tpu import timing as T

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

import_reference_whisper()

DIMS = ModelDimensions(
    n_mels=80,
    n_audio_ctx=96,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=51864,
    n_text_ctx=96,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def models():
    import torch
    from whisper.model import ModelDimensions as RefDims, Whisper as RefWhisper

    torch.manual_seed(13)
    ref = RefWhisper(RefDims(**DIMS.__dict__)).eval()
    with torch.no_grad():
        ref.decoder.positional_embedding.normal_(0, 0.02)
    params = convert_torch_state_dict(DIMS, ref.state_dict())
    ours = WhisperModel(dims=DIMS, params=params, compute_dtype=jnp.float32)
    return ref, ours


@pytest.mark.parametrize("width", [3, 7, 11])
@pytest.mark.parametrize("shape", [(40,), (5, 40), (3, 4, 40)])
def test_median_filter_parity(width, shape):
    import torch
    from whisper.timing import median_filter as ref_median

    rng = np.random.RandomState(width)
    x = rng.randn(*shape).astype(np.float32)
    ref = ref_median(torch.from_numpy(x), width).numpy()
    ours_np = median_filter(x, width)
    ours_jax = np.asarray(median_filter(jnp.asarray(x), width))
    np.testing.assert_allclose(ours_np, ref, atol=1e-7)
    np.testing.assert_allclose(ours_jax, ref, atol=1e-6)


def test_median_filter_short_input_passthrough():
    x = np.ones((2,), np.float32)
    np.testing.assert_array_equal(median_filter(x, 7), x)


@pytest.mark.parametrize("shape", [(5, 8), (20, 31), (1, 10), (17, 17)])
def test_dtw_parity(shape):
    from whisper.timing import dtw_cpu as ref_dtw  # numba stubbed -> pure python

    rng = np.random.RandomState(shape[0] * 100 + shape[1])
    x = rng.randn(*shape).astype(np.float32)
    ref = ref_dtw(x.astype(np.float64))
    ours = dtw(-(-x))  # via wavefront + backtrace
    np.testing.assert_array_equal(ours, ref)


def test_backtrace_matches_reference_semantics():
    # build a trace through the wavefront and re-run the reference backtrace
    from whisper.timing import backtrace as ref_backtrace

    rng = np.random.RandomState(0)
    x = rng.rand(6, 9)
    trace = dtw_wavefront_numpy(x)
    ref = ref_backtrace(trace.copy())
    ours = backtrace(trace.copy())
    np.testing.assert_array_equal(ours, ref)


def test_find_alignment_parity(models):
    import torch
    from whisper.timing import find_alignment as ref_find_alignment

    ref_model, our_model = models
    tok = get_tokenizer(False)  # en-only: sot_sequence = (sot,)
    rng = np.random.RandomState(5)
    mel = (rng.randn(DIMS.n_mels, DIMS.n_audio_ctx * 2) * 0.4).astype(np.float32)
    text_tokens = tok.encode(" hello there how are you")
    num_frames = 160

    ref_words = ref_find_alignment(
        ref_model, tok, text_tokens, torch.from_numpy(mel), num_frames
    )
    our_words = T.find_alignment(our_model, tok, text_tokens, mel, num_frames)

    assert len(our_words) == len(ref_words)
    for o, r in zip(our_words, ref_words):
        assert o.word == r.word
        assert o.tokens == r.tokens
        np.testing.assert_allclose(o.start, r.start, atol=0.03)
        np.testing.assert_allclose(o.end, r.end, atol=0.03)
        np.testing.assert_allclose(o.probability, r.probability, atol=1e-3)


def test_find_alignment_empty_tokens(models):
    _, our_model = models
    tok = get_tokenizer(False)
    assert T.find_alignment(our_model, tok, [], np.zeros((80, 192), np.float32), 100) == []


def test_add_word_timestamps_parity(models):
    import torch
    from whisper.timing import add_word_timestamps as ref_awt

    ref_model, our_model = models
    tok = get_tokenizer(False)
    rng = np.random.RandomState(6)
    mel = (rng.randn(DIMS.n_mels, DIMS.n_audio_ctx * 2) * 0.4).astype(np.float32)
    toks = tok.encode(" the quick brown fox jumps.")
    mid = len(toks) // 2

    def mk_segments():
        return [
            {"seek": 0, "start": 0.0, "end": 1.0, "tokens": list(toks[:mid])},
            {"seek": 0, "start": 1.0, "end": 2.0, "tokens": list(toks[mid:])},
        ]

    segs_ref = mk_segments()
    ref_awt(
        segments=segs_ref, model=ref_model, tokenizer=tok,
        mel=torch.from_numpy(mel), num_frames=160, last_speech_timestamp=0.0,
    )
    segs_ours = mk_segments()
    T.add_word_timestamps(
        segments=segs_ours, model=our_model, tokenizer=tok,
        mel=mel, num_frames=160, last_speech_timestamp=0.0,
    )
    for so, sr in zip(segs_ours, segs_ref):
        assert len(so["words"]) == len(sr["words"])
        for wo, wr in zip(so["words"], sr["words"]):
            assert wo["word"] == wr["word"]
            np.testing.assert_allclose(wo["start"], wr["start"], atol=0.03)
            np.testing.assert_allclose(wo["end"], wr["end"], atol=0.03)
        np.testing.assert_allclose(so["start"], sr["start"], atol=0.03)
        np.testing.assert_allclose(so["end"], sr["end"], atol=0.03)


def test_find_alignment_batch_device_dtw_matches_host(models):
    """The batched Pallas DTW + on-device backtrace path (interpret mode on
    CPU) must produce WordTimings identical to the host matrix-walk path —
    same words, same DTW frames, same probabilities."""
    _, our_model = models
    tok = get_tokenizer(False)
    rng = np.random.RandomState(11)
    texts = [" hello there how are you", " the quick brown fox", " hi"]
    token_lists = [tok.encode(t) for t in texts] + [[]]
    mels = (rng.randn(4, DIMS.n_mels, DIMS.n_audio_ctx * 2) * 0.4).astype(np.float32)
    frames = [160, 192, 100, 120]

    host = T.find_alignment_batch(
        our_model, tok, token_lists, mels, frames, use_device_dtw=False)
    dev = T.find_alignment_batch(
        our_model, tok, token_lists, mels, frames, use_device_dtw="interpret")
    # chunked fan-out takes the same pipelined path
    dev_chunked = T.find_alignment_batch(
        our_model, tok, token_lists, mels, frames, use_device_dtw="interpret",
        batch_size=2)

    assert dev[3] == [] and host[3] == []
    for variant in (dev, dev_chunked):
        for h_row, d_row in zip(host, variant):
            assert len(h_row) == len(d_row)
            for h, d in zip(h_row, d_row):
                assert h.word == d.word and h.tokens == d.tokens
                assert h.start == d.start and h.end == d.end
                np.testing.assert_allclose(h.probability, d.probability, rtol=1e-6)


def test_dtw_paths_batch_interpret_parity():
    """Batched kernel + device backtrace vs per-row host wavefront+backtrace
    on random cost matrices with ragged (n, m)."""
    from asr_ttl_mtl_tpu.ops.dtw import backtrace, dtw_wavefront_numpy
    from asr_ttl_mtl_tpu.ops.pallas_dtw import dtw_paths_batch

    rng = np.random.RandomState(0)
    ns, ms = [37, 12, 1, 30, 7], [143, 77, 50, 1, 143]
    x = rng.randn(5, max(ns), max(ms)).astype(np.float32)
    paths = dtw_paths_batch(x, ns, ms, interpret=True)
    for b, (ti, tj) in enumerate(paths):
        ref = backtrace(dtw_wavefront_numpy(x[b, : ns[b], : ms[b]].astype(np.float64)))
        np.testing.assert_array_equal(ref[0], ti)
        np.testing.assert_array_equal(ref[1], tj)


def test_decoder_selective_cross_qk_capture(models):
    """decoder_apply(cross_qk_pairs=...) returns exactly the selected rows of
    the full (L, B, H, Tt, Ta) capture, in pair order — the batched
    alignment program depends on this (the full stack is L*H/n_pairs larger
    and was its HBM ceiling at large window batches)."""
    from asr_ttl_mtl_tpu.models import whisper as W

    _, ours = models
    rng = np.random.RandomState(7)
    mels = jnp.asarray(rng.randn(2, DIMS.n_mels, DIMS.n_audio_ctx * 2), jnp.float32)
    tokens = jnp.asarray(rng.randint(0, DIMS.n_vocab, (2, 9)), jnp.int32)
    feats = W.encoder_apply(ours.params, DIMS, mels, jnp.float32)

    full_logits, _, full_qk = W.decoder_apply(
        ours.params, DIMS, tokens, feats, compute_dtype=jnp.float32,
        return_cross_qk=True,
    )
    pairs = ((0, 1), (0, 3), (1, 0), (1, 2))  # layer-major like np.argwhere
    hidden, _, sel_qk = W.decoder_apply(
        ours.params, DIMS, tokens, feats, compute_dtype=jnp.float32,
        return_cross_qk=True, return_hidden=True, cross_qk_pairs=pairs,
    )
    layers = np.asarray([p[0] for p in pairs])
    heads = np.asarray([p[1] for p in pairs])
    np.testing.assert_array_equal(
        np.asarray(sel_qk), np.asarray(full_qk)[layers, :, heads]
    )
    # return_hidden composes: projecting the hidden states reproduces logits
    embed = ours.params["decoder"]["token_embedding"]
    re_logits = np.asarray(hidden) @ np.asarray(embed).T
    np.testing.assert_allclose(np.asarray(full_logits), re_logits, atol=1e-4)
