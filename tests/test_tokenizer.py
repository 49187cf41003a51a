"""Tokenizer layout tests.

The critical invariants are the exact special-token IDs observed in the
reference training logs (SURVEY.md §5 quirk 3) and round-trip/behavioral
parity with the reference tokenizer.
"""

import pytest

from asr_ttl_mtl_tpu import tokenizer as T

from conftest import reference_available, import_reference_whisper


def _have_assets():
    try:
        T.find_vocab_file("gpt2")
        T.find_vocab_file("multilingual")
        return True
    except FileNotFoundError:
        return False


pytestmark = pytest.mark.skipif(not _have_assets(), reason="tiktoken assets unavailable")


def test_multilingual_disease_layout():
    tok = T.get_tokenizer(multilingual=True, language="en", task="transcribe", include_diseases=True)
    assert tok.eot == 50257
    assert tok.sot == 50258
    assert tok.disease_tokens == {"normal": 50359, "dysphonia": 50360, "dysarthria": 50361}
    # diseases spliced into the language block shift the task tokens
    assert tok.transcribe == 50363
    assert tok.translate == 50362
    # vocab grew by 4 (+3 diseases +1 'yue' pulled in by the slice arithmetic)
    assert tok.encoding.n_vocab == 51869
    assert tok.sot_sequence == (50258, 50259, 50363)


def test_english_only_disease_layout():
    tok = T.get_tokenizer(multilingual=False, include_diseases=True)
    assert tok.eot == 50256
    assert tok.sot == 50257
    assert tok.disease_tokens == {"normal": 50358, "dysphonia": 50359, "dysarthria": 50360}
    assert tok.encoding.n_vocab == 51868
    assert tok.sot_sequence == (50257,)


def test_standard_multilingual_layout():
    tok = T.get_tokenizer(multilingual=True, language="en", task="transcribe")
    assert tok.eot == 50257
    assert tok.sot == 50258
    assert tok.encoding.n_vocab == 51865
    assert tok.timestamp_begin == tok.special_tokens["<|0.00|>"]
    assert tok.no_timestamps == tok.timestamp_begin - 1
    assert len(tok.all_language_tokens) == 99
    assert tok.sot_sequence == (tok.sot, tok.sot + 1, tok.transcribe)
    assert tok.language_token == tok.sot + 1


def test_encode_decode_roundtrip():
    tok = T.get_tokenizer(multilingual=False)
    text = " Hello, world! Don't ask me to carry an oily rag."
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # timestamps are dropped by decode()
    assert tok.decode(ids + [tok.timestamp_begin + 5]) == text
    # but other specials decode literally
    assert "<|endoftext|>" in tok.decode(ids + [tok.eot])
    # decode_text_only drops them all
    assert tok.decode_text_only([tok.sot] + ids + [tok.eot]) == text


def test_decode_with_timestamps():
    tok = T.get_tokenizer(multilingual=False)
    out = tok.decode_with_timestamps([tok.timestamp_begin + 54])
    assert out == "<|1.08|>"


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("multilingual", [True, False])
@pytest.mark.parametrize("include_diseases", [True, False])
def test_parity_with_reference(multilingual, include_diseases):
    import_reference_whisper()
    from whisper.tokenizer import get_tokenizer as ref_get_tokenizer

    kwargs = dict(include_diseases=include_diseases)
    if multilingual:
        kwargs.update(language="en", task="transcribe")
    ref = ref_get_tokenizer(multilingual, **kwargs)
    ours = T.get_tokenizer(multilingual, **kwargs)

    assert ours.special_tokens == ref.special_tokens
    assert ours.sot_sequence == tuple(ref.sot_sequence)
    assert ours.eot == ref.eot
    assert ours.non_speech_tokens == ref.non_speech_tokens

    text = " The quick brown fox, worth $12.50, jumps—naïvely—over the lazy dog."
    assert ours.encode(text) == ref.encode(text)

    ids = ours.encode(" hello world") + [ours.eot]
    words, word_tokens = ours.split_to_word_tokens(ids)
    ref_words, ref_word_tokens = ref.split_to_word_tokens(ids)
    assert words == ref_words
    assert word_tokens == ref_word_tokens


def test_language_name_normalization():
    """Upstream whisper accepts language NAMES and any case; the vendored
    reference dropped that normalization so `--language Spanish` crashes with
    a bare tuple.index error (breakage, not replicated — SURVEY §5 policy).
    """
    es = T.get_tokenizer(True, language="es", task="transcribe")
    for alias in ("Spanish", "ES", "spanish", "castilian"):
        tok = T.get_tokenizer(True, language=alias, task="transcribe")
        assert tok.language == "es"
        assert tok.sot_sequence == es.sot_sequence

    assert T.normalize_language(None) is None
    assert T.normalize_language("Burmese") == "my"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="Unsupported language"):
        T.get_tokenizer(True, language="klingon")


def test_decoding_task_normalizes_language():
    import jax.numpy as jnp

    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.dims import ModelDimensions
    from asr_ttl_mtl_tpu.models.registry import WhisperModel

    import jax

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=32, n_audio_state=64, n_audio_head=1,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=32, n_text_state=64,
        n_text_head=1, n_text_layer=1,
    )
    model = WhisperModel(
        dims=dims, params=W.init_params(jax.random.PRNGKey(0), dims),
        compute_dtype=jnp.float32,
    )
    task = DecodingTask(model, DecodingOptions(language="German", sample_len=4))
    assert task.options.language == "de"
    assert task.tokenizer.language == "de"

