"""Quick-tier smoke tests for the subsystems whose full modules are too
heavy for `-m quick` (decoding/beam compile fused programs, the MTL suite
trains). One small-dims / host-only test per top-level, so the quick tier
touches every package surface: models+registry, decoding, beam, writers,
normalizer entry, mtl metrics+config, parallel mesh, CLI arg surface.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_ttl_mtl_tpu.models.dims import ModelDimensions
from asr_ttl_mtl_tpu.models.registry import (
    WhisperModel,
    convert_torch_state_dict,
    export_torch_state_dict,
)
from asr_ttl_mtl_tpu.models.whisper import init_params

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=96, n_audio_state=64, n_audio_head=4,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=96, n_text_state=64,
    n_text_head=4, n_text_layer=2,
)


@pytest.fixture(scope="module")
def model():
    params = init_params(jax.random.PRNGKey(0), DIMS)
    return WhisperModel(dims=DIMS, params=params, compute_dtype=jnp.float32)


def test_registry_export_import_roundtrip(model):
    """models/registry: the torch `.pt` layout round-trips bit-for-bit."""
    sd = export_torch_state_dict(model.params, DIMS)
    back = convert_torch_state_dict(DIMS, sd)
    for a, b in zip(jax.tree.leaves(model.params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_greedy_decode_smoke(model):
    """decoding: one fused greedy window on small dims produces sane shapes."""
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask

    mel = np.random.RandomState(0).randn(2, 80, 192).astype(np.float32) * 0.3
    opts = DecodingOptions(language="en", without_timestamps=True,
                           sample_len=4, fp16=False, suppress_tokens=None)
    results = DecodingTask(model, opts).run(jnp.asarray(mel))
    assert len(results) == 2
    for r in results:
        assert len(r.tokens) <= 4
        assert np.isfinite(r.avg_logprob)


def test_beam_options_surface(model):
    """beam: option validation (the full beam program lives in test_beam)."""
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask

    opts = DecodingOptions(language="en", beam_size=2, patience=1.0,
                           without_timestamps=True, sample_len=3, fp16=False,
                           suppress_tokens=None)
    task = DecodingTask(model, opts)
    assert task.options.beam_size == 2
    with pytest.raises(ValueError):
        DecodingTask(model, DecodingOptions(beam_size=2, best_of=2))


def test_writers_golden(tmp_path):
    """utils/writers: every format renders the same result dict."""
    from asr_ttl_mtl_tpu.utils.writers import get_writer

    result = {
        "text": " hello world",
        "language": "en",
        "segments": [
            {"id": 0, "seek": 0, "start": 0.0, "end": 1.5,
             "text": " hello world", "tokens": [1, 2],
             "temperature": 0.0, "avg_logprob": -0.1,
             "compression_ratio": 1.0, "no_speech_prob": 0.01},
        ],
    }
    rendered = {}
    for fmt in ("txt", "vtt", "srt", "tsv", "json"):
        writer = get_writer(fmt, str(tmp_path))
        writer(dict(result), "clip.wav", {"highlight_words": False,
                                          "max_line_width": None,
                                          "max_line_count": None,
                                          "max_words_per_line": None})
        out = (tmp_path / f"clip.{fmt}").read_text()
        rendered[fmt] = out
    assert rendered["txt"].strip() == "hello world"
    assert "00:00.000 --> 00:01.500" in rendered["vtt"]
    assert "00:00:00,000 --> 00:00:01,500" in rendered["srt"]
    assert rendered["tsv"].splitlines()[0] == "start\tend\ttext"
    assert '"language": "en"' in rendered["json"]


def test_mtl_metrics_smoke():
    """mtl/metrics: WER/CER + classification block on known values."""
    from asr_ttl_mtl_tpu.mtl.metrics import cer, detailed_metrics, wer

    assert wer(["hello world"], ["hello world"]) == 0.0
    assert wer(["a b c d"], ["a b x d"]) == pytest.approx(0.25)
    assert cer(["abc"], ["abd"]) == pytest.approx(1 / 3)
    m = detailed_metrics(["hi there", "ok"], ["hi there", "no"],
                         [0, 1], [0, 2])
    assert m["disease_acc"] == 0.5
    assert 0.0 <= m["wer"]


def test_training_config_parity_fields():
    """mtl/config: the reference's fields exist with its defaults."""
    from asr_ttl_mtl_tpu.mtl import TrainingConfig

    c = TrainingConfig()
    assert (c.epochs, c.batch_size, c.val_batch_size) == (50, 16, 8)
    assert (c.learning_rate, c.weight_decay) == (1e-5, 0.01)
    assert (c.alpha, c.beta) == (0.0, 0.0)
    assert c.early_stopping_patience == 10
    assert c.class_to_disease == {0: "normal", 1: "dysphonia", 2: "dysarthria"}


def test_parallel_mesh_smoke():
    """parallel: mesh construction + tp weight specs (no device programs)."""
    from jax.sharding import PartitionSpec as P

    from asr_ttl_mtl_tpu.parallel import create_mesh
    from asr_ttl_mtl_tpu.parallel.mesh import _tp_spec_for_path

    mesh = create_mesh((0, 1))
    assert mesh.shape["tp"] == 1 and mesh.shape["dp"] >= 1

    class K:  # minimal DictKey stand-in
        def __init__(self, key):
            self.key = key

    spec = _tp_spec_for_path((K("blocks"), K("0"), K("attn"), K("query"), K("w")), None)
    assert spec == P(None, "tp")
    spec = _tp_spec_for_path((K("blocks"), K("0"), K("mlp"), K("fc2"), K("w")), None)
    assert spec == P("tp", None)


def test_cli_arg_surface():
    """cli: the transcription CLI exposes the reference's flag surface."""
    from asr_ttl_mtl_tpu.cli import build_parser

    parser = build_parser()
    args = parser.parse_args(["a.wav", "--model", "tiny", "--language", "en",
                              "--temperature", "0.3", "--beam_size", "5"])
    assert args.audio == ["a.wav"]
    assert args.model == "tiny"
    assert args.beam_size == 5
    defaults = parser.parse_args(["x.wav"])
    assert defaults.task == "transcribe"
    assert defaults.output_format == "all"
