"""CLI --batch_mode: end-to-end run and signature-derived option routing
(VERDICT round-1 item 9: unroutable options must fail loudly by construction,
not via a hand-maintained deny-list)."""

import os
import sys
import wave as wave_mod

import numpy as np
import pytest


@pytest.fixture(scope="module")
def doll_setup(tmp_path_factory):
    """A 1-layer doll checkpoint + two tiny wavs on disk."""
    import torch

    from asr_ttl_mtl_tpu.models import registry
    from asr_ttl_mtl_tpu.models.dims import ModelDimensions

    tmp = tmp_path_factory.mktemp("cli_batch")
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=1,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_state=64,
        n_text_head=1, n_text_layer=1,
    )
    model = registry.from_random(dims)
    sd = registry.export_torch_state_dict(model.params, model.dims)
    ckpt = tmp / "doll.pt"
    torch.save({"dims": dims.__dict__, "model_state_dict": sd}, str(ckpt))

    paths = []
    for seed in (1, 2):
        rng = np.random.RandomState(seed)
        pcm = (rng.randn(16000) * 0.1 * 32767).astype(np.int16)
        p = tmp / f"clip{seed}.wav"
        with wave_mod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        paths.append(str(p))
    return tmp, str(ckpt), paths


def _run_cli(argv, monkeypatch):
    from asr_ttl_mtl_tpu.cli import cli

    monkeypatch.setattr(sys, "argv", ["asr_ttl_mtl_tpu"] + argv)
    cli()


def test_cli_batch_mode_end_to_end(doll_setup, monkeypatch):
    """--batch_mode with the full ladder + word timestamps + initial_prompt +
    clip_timestamps routes cleanly and writes every output format."""
    tmp, ckpt, paths = doll_setup
    out = tmp / "out1"
    _run_cli(
        paths + [
            "--model", ckpt, "--language", "en", "--batch_mode", "True",
            "--word_timestamps", "True", "--initial_prompt", "hi",
            "--clip_timestamps", "0,0.9", "--output_dir", str(out),
            "--output_format", "all", "--fp16", "False", "--verbose", "False",
        ],
        monkeypatch,
    )
    for ext in ("txt", "vtt", "srt", "tsv", "json"):
        assert (out / f"clip1.{ext}").exists() and (out / f"clip2.{ext}").exists()


def test_cli_batch_mode_rejects_sequential_only_option(doll_setup, monkeypatch):
    tmp, ckpt, paths = doll_setup
    with pytest.raises(SystemExit):
        _run_cli(
            paths[:1] + [
                "--model", ckpt, "--batch_mode", "True",
                "--hallucination_silence_threshold", "2.0",
                "--word_timestamps", "True",
            ],
            monkeypatch,
        )


def test_cli_batch_mode_unroutable_option_fails_loudly(doll_setup, monkeypatch):
    """If transcribe_batch loses (or never gains) a parameter the CLI still
    exposes, routing must error instead of silently dropping it."""
    import asr_ttl_mtl_tpu.cli as cli_mod

    tmp, ckpt, paths = doll_setup

    def narrow_transcribe_batch(model, audios, batch_size=16, mesh=None, **kw):
        raise AssertionError("should not be reached")

    T = sys.modules["asr_ttl_mtl_tpu.transcribe"]
    monkeypatch.setattr(T, "transcribe_batch", narrow_transcribe_batch)
    # DecodingOptions has no 'word_timestamps' field and the narrowed
    # signature lost it -> parser.error
    with pytest.raises(SystemExit):
        _run_cli(
            paths[:1] + [
                "--model", ckpt, "--batch_mode", "True",
                "--word_timestamps", "True", "--fp16", "False",
            ],
            monkeypatch,
        )
