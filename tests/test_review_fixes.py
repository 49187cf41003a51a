"""Regression tests for the round-1 code-review findings."""

import threading
import time
import wave as wavmod

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_ttl_mtl_tpu import audio as A
from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
from asr_ttl_mtl_tpu.models import whisper as W
from asr_ttl_mtl_tpu.models.dims import ModelDimensions
from asr_ttl_mtl_tpu.models.registry import WhisperModel


def _doll(n_vocab, multilingual_dims=True, seed=0):
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=48, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=n_vocab, n_text_ctx=512, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    return WhisperModel(dims=dims, params=W.init_params(jax.random.PRNGKey(seed), dims),
                        compute_dtype=jnp.float32)


class TestDiseaseCheckpointDecoding:
    """MTL-expanded checkpoints must decode with the disease-spliced
    tokenizer — the reference itself mis-maps specials here (SURVEY §5 q3)."""

    def test_expanded_vocab_selects_disease_tokenizer(self):
        model = _doll(51869)  # multilingual + diseases
        assert model.has_disease_tokens and model.is_multilingual
        task = DecodingTask(model, DecodingOptions(language="en", fp16=False))
        tok = task.tokenizer
        assert tok.disease_tokens  # spliced layout present
        # observed reference IDs (SURVEY §5 quirk 3)
        assert tok.eot == 50257 and tok.sot == 50258
        assert tok.disease_tokens == {"normal": 50359, "dysphonia": 50360,
                                      "dysarthria": 50361}
        assert tok.transcribe > 50361  # shifted past the disease block
        assert tok.transcribe in tok.sot_sequence

    def test_en_only_expanded_vocab(self):
        model = _doll(51868)
        assert model.has_disease_tokens and not model.is_multilingual
        task = DecodingTask(model, DecodingOptions(language="en", fp16=False))
        assert task.tokenizer.eot == 50256
        assert task.tokenizer.disease_tokens == {"normal": 50358,
                                                 "dysphonia": 50359,
                                                 "dysarthria": 50360}

    def test_expanded_model_decodes(self):
        model = _doll(51869)
        mel = jnp.asarray(np.random.RandomState(0).randn(1, 80, 96).astype(np.float32))
        # run through the real decode path end to end
        res = model.decode(mel, DecodingOptions(language="en", fp16=False,
                                                sample_len=8,
                                                without_timestamps=True))[0]
        assert isinstance(res.text, str)


class TestPrefixOverflow:
    def test_long_prefix_truncated_not_crash(self):
        model = _doll(51865)
        prefix = list(np.random.RandomState(0).randint(100, 5000, 300))
        res = model.decode(
            jnp.asarray(np.random.RandomState(1).randn(1, 80, 96).astype(np.float32)),
            DecodingOptions(language="en", fp16=False, prefix=prefix,
                            sample_len=4, without_timestamps=True),
        )[0]
        assert isinstance(res.text, str)

    def test_prompt_plus_prefix_truncated(self):
        model = _doll(51865)
        rng = np.random.RandomState(2)
        res = model.decode(
            jnp.asarray(rng.randn(1, 80, 96).astype(np.float32)),
            DecodingOptions(language="en", fp16=False, sample_len=4,
                            prompt=list(rng.randint(100, 5000, 250)),
                            prefix=list(rng.randint(100, 5000, 100)),
                            without_timestamps=True),
        )[0]
        assert isinstance(res.text, str)


class TestBucketedMel:
    @pytest.mark.parametrize("n", [16000, 16001, 480000, 481234, 700001])
    def test_matches_direct_for_transcribe_padding(self, n):
        rng = np.random.RandomState(n % 97)
        x = rng.randn(n).astype(np.float32) * 0.2
        got = np.asarray(A.log_mel_spectrogram(x, padding=A.N_SAMPLES))
        want = np.asarray(A.log_mel_spectrogram_jax(jnp.asarray(x), padding=A.N_SAMPLES))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_small_padding_unbucketed(self):
        x = np.random.RandomState(0).randn(16100).astype(np.float32)
        got = np.asarray(A.log_mel_spectrogram(x, padding=0))
        want = np.asarray(A.log_mel_spectrogram_jax(jnp.asarray(x), padding=0))
        np.testing.assert_allclose(got, want, atol=0)


class TestPaddedRowLossMasking:
    def test_dp_padding_rows_do_not_bias_loss(self, tmp_path):
        from test_mtl import DEBUG_DIMS, _config, _write_dataset
        from asr_ttl_mtl_tpu.mtl import MultiTaskSpeechDataset, MultiTaskTrainer
        from asr_ttl_mtl_tpu.mtl.dataset import DataLoader

        # 5 samples on the 8-device mesh: every batch is padded 5 -> 8
        csv = _write_dataset(tmp_path, n=5)
        cfg = _config(tmp_path, csv, epochs=1, alpha=0.5, beta=0.5)
        tr = MultiTaskTrainer(cfg, verbose=False)
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=5, num_workers=1, buckets=cfg.token_buckets)
        m5 = tr.evaluate(loader)

        # same data, batch already a multiple of dp via batch_size=1 groups
        tr2 = MultiTaskTrainer(cfg, verbose=False)
        # evaluate with per-sample batches padded 1 -> 8 (all pads masked)
        loader1 = DataLoader(ds, batch_size=1, num_workers=1, buckets=cfg.token_buckets)
        m1 = tr2.evaluate(loader1)
        # cls losses are per-batch means of VALID rows; averaging differs by
        # batching, but the 5-batch mean of singles equals the single batch of
        # 5 when each batch is one sample
        assert np.isfinite(m5["loss"]) and np.isfinite(m1["loss"])
        assert m5["cls_loss"] == pytest.approx(
            np.mean([m1["cls_loss"]]), rel=0.2
        )  # sanity: same scale, no 8/5 inflation


class TestLoaderAbandonment:
    def test_producer_exits_when_iteration_abandoned(self, tmp_path):
        from test_mtl import _config, _write_dataset
        from asr_ttl_mtl_tpu.mtl import MultiTaskSpeechDataset
        from asr_ttl_mtl_tpu.mtl.dataset import DataLoader

        csv = _write_dataset(tmp_path, n=12)
        cfg = _config(tmp_path, csv)
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=2, num_workers=1, prefetch_batches=1)
        before = threading.active_count()
        it = iter(loader)
        next(it)
        it.close()  # abandon mid-epoch
        deadline = time.time() + 10
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before, "producer thread leaked"


def test_decode_kernel_failure_falls_back_to_xla(monkeypatch):
    """A Pallas decode-kernel failure must not crash DecodingTask.run: the
    kernels are disabled and the window retried on plain XLA attention
    (the reference's Triton-launch fallback pattern, timing.py:41-46)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from asr_ttl_mtl_tpu import decoding as D
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.dims import ModelDimensions
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.ops import decode_attention as DA

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=96, n_audio_state=64, n_audio_head=4,
        n_audio_layer=1, n_vocab=51864, n_text_ctx=96, n_text_state=64,
        n_text_head=4, n_text_layer=1,
    )
    params = W.init_params(jax.random.PRNGKey(0), dims)
    model = WhisperModel(dims=dims, params=params, compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 80, 192).astype(np.float32) * 0.5)
    opts = D.DecodingOptions(language="en", without_timestamps=True,
                             sample_len=6, fp16=False, suppress_tokens=None)

    expected = D.DecodingTask(model, opts).run(mel)

    def boom(*a, **k):
        raise RuntimeError("Mosaic failed to compile TPU kernel (simulated)")

    state_before = dict(W._FLASH)
    monkeypatch.setattr(DA, "decode_attention", boom)
    try:
        # force the (broken) kernel path on, as on a TPU backend
        W.set_decode_kernel("interpret")
        D._clear_program_caches()
        got = D.DecodingTask(model, opts).run(mel)
        # the failure handler must have turned the kernels off
        assert W._FLASH["decode_kernel"] == "off"
    finally:
        W._FLASH.update(state_before)
        D._clear_program_caches()

    for g, e in zip(got, expected):
        assert g.tokens == e.tokens
        assert g.text == e.text


def test_kernel_failure_fallback_is_scoped_per_kernel(monkeypatch):
    """A failure whose message names one Pallas kernel disables ONLY that
    kernel: a flash-encoder compile failure at one model geometry must not
    degrade the decode kernel for the whole process, and a second, different
    kernel failing during the retry cascades into its own scoped disable."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from asr_ttl_mtl_tpu import decoding as D
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.dims import ModelDimensions
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.ops import decode_attention as DA

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=96, n_audio_state=64, n_audio_head=4,
        n_audio_layer=1, n_vocab=51864, n_text_ctx=96, n_text_state=64,
        n_text_head=4, n_text_layer=1,
    )
    params = W.init_params(jax.random.PRNGKey(0), dims)
    model = WhisperModel(dims=dims, params=params, compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 80, 192).astype(np.float32) * 0.5)
    opts = D.DecodingOptions(language="en", without_timestamps=True,
                             sample_len=6, fp16=False, suppress_tokens=None)
    expected = D.DecodingTask(model, opts).run(mel)

    # (a) scoped: an error naming decode_attention leaves flash enabled
    def decode_boom(*a, **k):
        raise RuntimeError(
            "Mosaic compile failed for pallas kernel decode_attention")

    state_before = dict(W._FLASH)
    monkeypatch.setattr(DA, "decode_attention", decode_boom)
    try:
        W.set_flash_attention(True)
        W.set_decode_kernel("interpret")
        D._clear_program_caches()
        got = D.DecodingTask(model, opts).run(mel)
        assert W._FLASH["decode_kernel"] == "off"
        assert W._FLASH["enabled"] is True  # flash untouched
    finally:
        W._FLASH.update(state_before)
        D._clear_program_caches()
    for g, e in zip(got, expected):
        assert g.tokens == e.tokens

    # (b) cascade: flash-named failure first, decode-named on the retry —
    # both end up off and the window still decodes
    calls = {"n": 0}

    def two_stage_boom(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "Mosaic compile failed for pallas kernel flash_attention")
        raise RuntimeError(
            "Mosaic compile failed for pallas kernel decode_attention")

    monkeypatch.setattr(DA, "decode_attention", two_stage_boom)
    try:
        W.set_flash_attention(True)
        W.set_decode_kernel("interpret")
        D._clear_program_caches()
        got = D.DecodingTask(model, opts).run(mel)
        assert W._FLASH["decode_kernel"] == "off"
        assert W._FLASH["enabled"] is False
        assert calls["n"] == 2
    finally:
        W._FLASH.update(state_before)
        D._clear_program_caches()
    for g, e in zip(got, expected):
        assert g.tokens == e.tokens


def test_kernel_failure_ladder_is_depth_bounded(monkeypatch):
    """A Mosaic error that keeps naming a kernel the ladder ALREADY disabled
    (stale/mislabeled attribution) must raise instead of recursing forever:
    the ladder tracks its own disables and refuses a retry that cannot
    change anything."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from asr_ttl_mtl_tpu import decoding as D
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.dims import ModelDimensions
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.ops import decode_attention as DA

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=96, n_audio_state=64, n_audio_head=4,
        n_audio_layer=1, n_vocab=51864, n_text_ctx=96, n_text_state=64,
        n_text_head=4, n_text_layer=1,
    )
    params = W.init_params(jax.random.PRNGKey(0), dims)
    model = WhisperModel(dims=dims, params=params, compute_dtype=jnp.float32)
    mel = jnp.asarray(np.random.RandomState(0).randn(1, 80, 192).astype(np.float32))
    opts = D.DecodingOptions(language="en", without_timestamps=True,
                             sample_len=4, fp16=False, suppress_tokens=None)

    calls = {"n": 0}

    def always_flash_named(*a, **k):
        calls["n"] += 1
        # names flash_attention even though the decode kernel is the caller;
        # after flash is off the attribution is stale — must not loop
        raise RuntimeError("Mosaic compile failed for pallas kernel Flash_Attention")

    state_before = dict(W._FLASH)
    monkeypatch.setattr(DA, "decode_attention", always_flash_named)
    try:
        W.set_flash_attention(True)
        W.set_decode_kernel("interpret")
        D._clear_program_caches()
        with pytest.raises(RuntimeError, match="Flash_Attention"):
            D.DecodingTask(model, opts).run(mel)
        # capitalized kernel name attributed correctly (lowercased match):
        # only flash disabled, and exactly one retry attempted
        assert W._FLASH["enabled"] is False
        assert W._FLASH["decode_kernel"] == "interpret"
        assert calls["n"] == 2
    finally:
        W._FLASH.update(state_before)
        D._clear_program_caches()


def test_set_kernels_convenience():
    """set_kernels(False) is the one-call plain-XLA switch: both the flash
    and the decode kernel flags flip (the two-flag contract is otherwise
    easy to miss — set_flash_attention alone leaves the decode kernel on)."""
    from asr_ttl_mtl_tpu.models import whisper as W

    state_before = dict(W._FLASH)
    try:
        W.set_kernels(False)
        assert W._FLASH["enabled"] is False
        assert W._FLASH["decode_kernel"] == "off"
        W.set_kernels(True)
        assert W._FLASH["enabled"] is True
        assert W._FLASH["decode_kernel"] == "auto"
    finally:
        W._FLASH.update(state_before)
