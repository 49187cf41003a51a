"""Decoding-engine parity vs the reference implementation.

Two layers of testing:
1. logit-filter parity: our vectorized `_apply_filters` vs the reference
   SuppressBlank/SuppressTokens/ApplyTimestampRules classes on random logits
   and synthetic token histories.
2. end-to-end greedy decode parity on a shared random-weight model: token
   sequences, text, avg_logprob, no_speech_prob must match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import import_reference_whisper, reference_available

from asr_ttl_mtl_tpu import decoding as D
from asr_ttl_mtl_tpu.models.dims import ModelDimensions
from asr_ttl_mtl_tpu.models.registry import WhisperModel, convert_torch_state_dict
from asr_ttl_mtl_tpu.tokenizer import get_tokenizer

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

import_reference_whisper()

# english-only vocab so both stacks pick the gpt2 tokenizer (the reference
# derives num_languages from n_vocab)
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

    torch.manual_seed(7)
    ref = RefWhisper(RefDims(**DIMS.__dict__)).eval()
    # the reference leaves positional_embedding as torch.empty (uninitialized
    # memory, normally overwritten by checkpoint load) — initialize it
    with torch.no_grad():
        ref.decoder.positional_embedding.normal_(0, 0.02)
    params = convert_torch_state_dict(DIMS, ref.state_dict())
    ours = WhisperModel(dims=DIMS, params=params, compute_dtype=jnp.float32)
    return ref, ours


def _mel(batch=1, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(batch, DIMS.n_mels, DIMS.n_audio_ctx * 2) * 0.5).astype(np.float32)


# ---------------------------------------------------------------------------
# 1. filter parity
# ---------------------------------------------------------------------------


def _ref_filters(tokenizer, cfg, logits_np, tokens_np, sample_begin):
    import torch
    from whisper.decoding import ApplyTimestampRules, SuppressBlank, SuppressTokens

    logits = torch.from_numpy(logits_np.copy())
    tokens = torch.from_numpy(tokens_np)
    filters = []
    if cfg.suppress_blank:
        filters.append(SuppressBlank(tokenizer, sample_begin))
    if cfg.suppress_tokens:
        filters.append(SuppressTokens(list(cfg.suppress_tokens)))
    if cfg.apply_timestamp_rules:
        mit = cfg.max_initial_timestamp_index if cfg.max_initial_timestamp_index >= 0 else None
        filters.append(ApplyTimestampRules(tokenizer, sample_begin, mit))
    for f in filters:
        f.apply(logits, tokens)
    return logits.numpy()


@pytest.mark.parametrize("history", ["empty", "text", "ts_open", "ts_pair", "long_mixed"])
def test_filter_parity(history):
    tok = get_tokenizer(False)  # gpt2 layout
    ts = tok.timestamp_begin
    sample_begin = 1
    base = [tok.sot]
    histories = {
        "empty": [],
        "text": [100, 200],
        "ts_open": [ts + 3, 50, 60],        # open segment: ts then text
        "ts_pair": [ts + 3, 50, ts + 7],    # last token is a closing ts
        "long_mixed": [ts + 0, 11, 12, ts + 5, ts + 5, 90, ts + 9],
    }
    sampled = histories[history]
    tokens_np = np.asarray([base + sampled], dtype=np.int64)

    cfg = D.FilterConfig(
        n_vocab=DIMS.n_vocab,
        eot=tok.eot,
        timestamp_begin=ts,
        no_timestamps=tok.no_timestamps,
        blank_tokens=tuple(tok.encode(" ") + [tok.eot]),
        suppress_tokens=tuple(sorted({tok.transcribe, tok.translate, tok.sot,
                                      tok.sot_prev, tok.sot_lm, tok.no_speech}
                                     | set(tok.non_speech_tokens))),
        suppress_blank=True,
        apply_timestamp_rules=True,
        max_initial_timestamp_index=50,
    )

    rng = np.random.RandomState(hash(history) % 2**31)
    logits_np = rng.randn(1, DIMS.n_vocab).astype(np.float32)

    ref = _ref_filters(tok, cfg, logits_np, tokens_np, sample_begin)

    step = len(sampled)
    prev = sampled[-1] if step >= 1 else -1
    penult = sampled[-2] if step >= 2 else -1
    ts_list = [t for t in sampled if t >= ts]
    last_ts = ts_list[-1] if ts_list else -1
    ours = np.asarray(
        D._apply_filters(
            cfg,
            jnp.asarray(logits_np),
            jnp.asarray(step),
            jnp.asarray([prev]),
            jnp.asarray([penult]),
            jnp.asarray([last_ts]),
        )
    )

    ref_masked = ~np.isfinite(ref) | (ref <= -1e8)
    ours_masked = ours <= -1e8
    np.testing.assert_array_equal(ours_masked, ref_masked)
    np.testing.assert_allclose(
        np.where(ours_masked, 0.0, ours), np.where(ref_masked, 0.0, ref), atol=1e-5
    )


# ---------------------------------------------------------------------------
# 2. end-to-end greedy parity
# ---------------------------------------------------------------------------


def _ref_decode(ref_model, mel, **opts):
    import torch
    from whisper.decoding import DecodingOptions as RefOpts, decode as ref_decode

    with torch.no_grad():
        return ref_decode(ref_model, torch.from_numpy(mel), RefOpts(fp16=False, **opts))


@pytest.mark.parametrize("without_timestamps", [False, True])
def test_greedy_decode_parity(models, without_timestamps):
    ref_model, our_model = models
    mel = _mel()
    ref = _ref_decode(ref_model, mel[0], language="en", without_timestamps=without_timestamps)
    ours = D.decode(
        our_model, mel[0], D.DecodingOptions(fp16=False, language="en", without_timestamps=without_timestamps)
    )
    assert ours.tokens == ref.tokens
    assert ours.text == ref.text
    np.testing.assert_allclose(ours.avg_logprob, ref.avg_logprob, atol=1e-3)
    np.testing.assert_allclose(ours.no_speech_prob, ref.no_speech_prob, atol=1e-4)
    assert ours.language == ref.language


def test_greedy_decode_batched_matches_reference(models):
    ref_model, our_model = models
    mel = _mel(batch=3, seed=4)
    refs = _ref_decode(ref_model, mel, language="en")
    ours = D.decode(our_model, mel, D.DecodingOptions(fp16=False, language="en"))
    for r, o in zip(refs, ours):
        assert o.tokens == r.tokens
        np.testing.assert_allclose(o.avg_logprob, r.avg_logprob, atol=1e-3)


@pytest.mark.parametrize("kv_quant", [False, True])
def test_fuse_encoder_off_matches_fused(models, kv_quant):
    """fuse_encoder=False (two smaller XLA programs — the mode for models
    whose fused program exceeds a remote compiler's size limit) must match
    the fused single-program path exactly, through run() AND the
    submit/collect pipeline — including with int8 KV caches (the split
    encoder program must emit the same quantized cross-KV layout the fused
    program builds internally)."""
    _, our_model = models
    mel = jnp.asarray(_mel(batch=2, seed=11))
    fused = D.DecodingTask(
        our_model, D.DecodingOptions(fp16=False, language="en", kv_quant=kv_quant)
    ).run(mel)
    task = D.DecodingTask(
        our_model,
        D.DecodingOptions(fp16=False, language="en", kv_quant=kv_quant,
                          fuse_encoder=False),
    )
    split = task.run(mel)
    pending = task.submit(mel)
    assert pending[0] == "greedy"  # split mode still pipelines
    piped = task.collect(pending)
    for f, s, p in zip(fused, split, piped):
        assert f.tokens == s.tokens == p.tokens
        assert f.text == s.text == p.text
        np.testing.assert_allclose(s.avg_logprob, f.avg_logprob, atol=1e-5)
        np.testing.assert_allclose(p.avg_logprob, f.avg_logprob, atol=1e-5)


def test_greedy_decode_with_prompt_parity(models):
    ref_model, our_model = models
    mel = _mel(seed=9)
    prompt = list(np.random.RandomState(0).randint(0, 40000, size=5))
    ref = _ref_decode(ref_model, mel[0], language="en", prompt=prompt)
    ours = D.decode(our_model, mel[0], D.DecodingOptions(fp16=False, language="en", prompt=prompt))
    assert ours.tokens == ref.tokens


def test_sampling_runs_and_terminates(models):
    _, our_model = models
    mel = _mel(seed=5)
    res = D.decode(
        our_model, mel[0], D.DecodingOptions(fp16=False, language="en", temperature=0.8, best_of=3)
    )
    assert isinstance(res.tokens, list)
    assert res.temperature == 0.8
    assert np.isfinite(res.avg_logprob)


class TestOptionValidation:
    """Invalid options fail fast with clear errors (not deep assertions)."""

    def test_bad_values_rejected(self, models=None):
        import pytest as _pytest

        from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask

        cases = [
            dict(beam_size=0),
            dict(best_of=0, temperature=0.5),
            dict(beam_size=5, patience=0.5),
            dict(beam_size=3, best_of=3, temperature=0.5),
        ]
        for kw in cases:
            with _pytest.raises(ValueError):
                DecodingTask._verify_options(None, DecodingOptions(**kw))


class TestBf16LogitCarry:
    """The serving loops carry per-step logits in the compute dtype (bf16 on
    TPU). CPU parity tests all run fp32, so without this the bf16 carry
    wiring (while_loop dtype consistency, in-fusion upcasts) is exercised
    only by on-chip runs."""

    def _bf16_model(self):
        from asr_ttl_mtl_tpu.models.registry import from_random

        return from_random(DIMS, seed=3, compute_dtype=jnp.bfloat16)

    @pytest.mark.parametrize("kv_quant", [False, True])
    def test_greedy_bf16_runs_and_is_deterministic(self, kv_quant):
        from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask

        model = self._bf16_model()
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=8,
            fp16=True, kv_quant=kv_quant, temperature=0.0,
        )
        task = DecodingTask(model, opts)
        r1 = task.run(jnp.asarray(_mel(batch=2, seed=5)))
        r2 = task.run(jnp.asarray(_mel(batch=2, seed=5)))
        for a, b in zip(r1, r2):
            assert a.tokens == b.tokens
            assert np.isfinite(a.avg_logprob)
            assert all(0 <= t < DIMS.n_vocab for t in a.tokens)

    def test_beam_bf16_runs(self):
        from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask

        model = self._bf16_model()
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=8,
            fp16=True, beam_size=3, temperature=0.0,
        )
        task = DecodingTask(model, opts)
        (res,) = task.run(jnp.asarray(_mel(batch=1, seed=6)))
        assert np.isfinite(res.avg_logprob)
        assert all(0 <= t < DIMS.n_vocab for t in res.tokens)


@pytest.mark.parametrize("kv_quant", [False, True])
def test_encode_audio_chunked_matches_single(models, kv_quant, monkeypatch):
    """_encode_audio above ASRMTL_ENCODE_CHUNK dispatches even sub-batches of
    one compiled encoder shape (the 320-window unfused program OOM'd the
    round-5 server compiler) — feats and cross-KV must be bit-identical to
    the single-dispatch path, including the padded tail chunk and the int8
    quantized layout."""
    _, our_model = models
    mel = jnp.asarray(_mel(batch=5, seed=23))
    task = D.DecodingTask(
        our_model,
        D.DecodingOptions(fp16=False, language="en", kv_quant=kv_quant,
                          fuse_encoder=False),
    )
    whole = task._encode_audio(mel)
    monkeypatch.setenv("ASRMTL_ENCODE_CHUNK", "2")  # 5 -> 3 chunks of 2 (pad 1)
    chunked = task._encode_audio(mel)
    np.testing.assert_array_equal(np.asarray(whole[0]), np.asarray(chunked[0]))
    for leaf_w, leaf_c in zip(
        jax.tree.leaves(whole[1]), jax.tree.leaves(chunked[1])
    ):
        np.testing.assert_array_equal(np.asarray(leaf_w), np.asarray(leaf_c))
    # and the decode results through run() are unchanged
    res_chunked = task.run(mel)
    monkeypatch.delenv("ASRMTL_ENCODE_CHUNK")
    res_ref = task.run(mel)
    for a, b in zip(res_chunked, res_ref):
        assert a.tokens == b.tokens and a.text == b.text
