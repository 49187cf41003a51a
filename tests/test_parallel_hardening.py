"""Multichip-evidence hardening (VERDICT round-1 item 8): multi-step dp x tp
training + orbax resume onto a DIFFERENT mesh shape, dp-sharded evaluate,
and the combined dp + beam + int8 serving path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_mtl import DEBUG_DIMS, _config, _write_dataset

from asr_ttl_mtl_tpu.mtl import DataLoader, MultiTaskSpeechDataset, MultiTaskTrainer
from asr_ttl_mtl_tpu.parallel.mesh import create_mesh

if jax.device_count() < 8:
    pytest.skip("needs the 8-virtual-device conftest mesh", allow_module_level=True)


def _loader(csv, cfg):
    ds = MultiTaskSpeechDataset(csv, cfg)
    return DataLoader(ds, batch_size=cfg.batch_size, num_workers=0,
                      buckets=cfg.token_buckets)


def test_resume_across_mesh_shapes(tmp_path):
    """Train 2 epochs on a dp=4 x tp=2 mesh, orbax-save, restore into a
    dp=2 x tp=4... (heads=4 allows tp up to 4) trainer, and continue: the
    restored trainer's next-epoch losses must match a never-interrupted
    same-seed run on the ORIGINAL mesh."""
    csv = _write_dataset(tmp_path)

    def make(mesh_shape, subdir):
        cfg = _config(tmp_path, csv, epochs=1, num_workers=0, seed=11,
                      mesh_shape=mesh_shape, save_dir=str(tmp_path / subdir))
        tr = MultiTaskTrainer(cfg, verbose=False)
        return tr, _loader(csv, cfg)

    base, base_loader = make((4, 2), "base")
    for epoch in range(2):
        base.train_epoch(base_loader, epoch)
    resume_dir = str(tmp_path / "resume")
    base.save_resume_state(resume_dir, epoch=2, best_loss=1.0, patience_counter=0)
    # uninterrupted continuation on the original mesh = the gold trajectory
    gold = base.train_epoch(base_loader, 2)

    other, other_loader = make((2, 4), "other")
    meta = other.restore_resume_state(resume_dir)
    assert meta["epoch"] == 2
    # restored alpha/beta frozen values carried over
    assert other.alpha == pytest.approx(base.alpha)
    cont = other.train_epoch(other_loader, 2)

    assert cont["loss"] == pytest.approx(gold["loss"], abs=2e-4)
    assert cont["cls_loss"] == pytest.approx(gold["cls_loss"], abs=2e-4)
    assert cont["trans_loss"] == pytest.approx(gold["trans_loss"], abs=2e-4)


def test_dp_sharded_evaluate_matches_single(tmp_path):
    """trainer.evaluate under a dp=8 mesh equals the single-device metrics."""
    csv = _write_dataset(tmp_path)
    single_cfg = _config(tmp_path, csv, epochs=1, num_workers=0, seed=3)
    sharded_cfg = _config(tmp_path, csv, epochs=1, num_workers=0, seed=3,
                          mesh_shape=(8, 1))
    single = MultiTaskTrainer(single_cfg, verbose=False)
    sharded = MultiTaskTrainer(sharded_cfg, verbose=False)
    # identical weights (same seed, same init path)
    sm = single.evaluate(_loader(csv, single_cfg))
    dm = sharded.evaluate(_loader(csv, sharded_cfg))
    assert dm["loss"] == pytest.approx(sm["loss"], abs=1e-4)
    assert dm["disease_acc"] == pytest.approx(sm["disease_acc"])
    assert dm["wer"] == pytest.approx(sm["wer"], abs=1e-9)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (1, 8)])
def test_tp_serving_matches_single(mesh_shape):
    """Tensor-parallel serving (pjit + Megatron weight shardings, the
    multi-chip latency path for the large family): greedy AND beam decode on
    a dp x tp mesh must equal the single-device DecodingTask.run — including
    with int8 KV caches (einsum dequant path under GSPMD)."""
    from asr_ttl_mtl_tpu.audio import log_mel_spectrogram, pad_or_trim
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.dims import ModelDimensions
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.parallel.serving import decode_batched_dp

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    params = W.init_params(jax.random.PRNGKey(5), dims)
    model = WhisperModel(dims=dims, params=params, compute_dtype=jnp.float32)
    rng = np.random.RandomState(33)
    mel = np.stack([
        np.asarray(pad_or_trim(
            np.asarray(log_mel_spectrogram((rng.randn(16000) * 0.1).astype(np.float32))),
            3000, axis=-1))
        for _ in range(4)
    ]).astype(np.float32)

    for beam, kv_quant in ((None, False), (3, False), (None, True)):
        opts = DecodingOptions(language="en", without_timestamps=True,
                               beam_size=beam, sample_len=8, fp16=False,
                               suppress_tokens=None, kv_quant=kv_quant)
        single = DecodingTask(model, opts).run(jnp.asarray(mel))
        out = decode_batched_dp(model, mel, opts, mesh=create_mesh(mesh_shape))
        for a, b in zip(out, single):
            assert a.tokens == b.tokens
            assert a.text == b.text
            np.testing.assert_allclose(a.avg_logprob, b.avg_logprob, atol=1e-4)

    # best-of sampling (the ladder's t>0 rungs): runs as ONE GLOBAL pjit
    # program, so the rng draws — and therefore every sampled token — match
    # the single-device program exactly
    opts = DecodingOptions(language="en", without_timestamps=True,
                           temperature=0.7, best_of=3, sample_len=8,
                           fp16=False, suppress_tokens=None)
    single = DecodingTask(model, opts).run(jnp.asarray(mel), rng_seed=5)
    out = decode_batched_dp(model, mel, opts, mesh=create_mesh(mesh_shape),
                            rng_seed=5)
    for a, b in zip(out, single):
        assert a.tokens == b.tokens
        np.testing.assert_allclose(a.avg_logprob, b.avg_logprob, atol=1e-4)


def test_dp_batch_word_timestamps_matches_single():
    """--batch_mode --dp + word_timestamps: the mesh decode path composed
    with the (single-device) chunked batched alignment must reproduce the
    single-device transcribe_batch output word-for-word."""
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.dims import ModelDimensions
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    params = W.init_params(jax.random.PRNGKey(5), dims)
    model = WhisperModel(dims=dims, params=params, compute_dtype=jnp.float32)

    rng = np.random.RandomState(7)
    waves = [(rng.randn(16000) * 0.1).astype(np.float32) for _ in range(4)]
    kwargs = dict(temperature=0.0, language="en", no_speech_threshold=None,
                  word_timestamps=True, fp16=False, sample_len=8,
                  without_timestamps=True)
    dp = transcribe_batch(model, waves, batch_size=4,
                          mesh=create_mesh((4, 1)), **kwargs)
    single = transcribe_batch(model, waves, batch_size=4, **kwargs)
    assert len(dp) == len(single) == 4
    for a, b in zip(dp, single):
        assert a["text"] == b["text"]
        for sa, sb in zip(a["segments"], b["segments"]):
            assert [(w["word"], w["start"], w["end"]) for w in sa["words"]] == [
                (w["word"], w["start"], w["end"]) for w in sb["words"]
            ]


def test_dp_beam_int8_combined(tmp_path):
    """beam search + int8 KV + dp sharding together: parity with the
    single-device int8 beam path."""
    from asr_ttl_mtl_tpu.audio import log_mel_spectrogram, pad_or_trim
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.dims import ModelDimensions
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.parallel.serving import decode_batched_dp

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    params = W.init_params(jax.random.PRNGKey(5), dims)
    model = WhisperModel(dims=dims, params=params, compute_dtype=jnp.float32)

    rng = np.random.RandomState(33)
    mel = np.stack([
        np.asarray(pad_or_trim(
            np.asarray(log_mel_spectrogram((rng.randn(16000) * 0.1).astype(np.float32))),
            3000, axis=-1))
        for _ in range(8)
    ]).astype(np.float32)

    opts = DecodingOptions(language="en", without_timestamps=True, beam_size=3,
                           sample_len=8, fp16=False, suppress_tokens=None,
                           kv_quant=True)
    single = DecodingTask(model, opts).run(jnp.asarray(mel))
    sharded = decode_batched_dp(model, mel, opts, mesh=create_mesh((8, 1)))
    assert len(sharded) == len(single) == 8
    for a, b in zip(sharded, single):
        assert a.tokens == b.tokens
        assert a.text == b.text
        np.testing.assert_allclose(a.avg_logprob, b.avg_logprob, atol=1e-4)
