"""Tokenizer micro-parity sweep (VERDICT round-1 item 10): every language x
task x disease-tokenizer combination must reproduce the reference's special
token IDs and sot_sequence exactly — the spliced-disease-ID quirk shifts the
whole special block (reference whisper/tokenizer.py:351-434)."""

import pytest

from conftest import import_reference_whisper, reference_available

from asr_ttl_mtl_tpu.tokenizer import LANGUAGES, get_tokenizer

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

import_reference_whisper()


def _spot_ids(tok):
    return dict(
        eot=tok.eot,
        sot=tok.sot,
        sot_prev=tok.sot_prev,
        sot_lm=tok.sot_lm,
        no_speech=tok.no_speech,
        no_timestamps=tok.no_timestamps,
        timestamp_begin=tok.timestamp_begin,
        transcribe=tok.transcribe,
        translate=tok.translate,
        sot_sequence=tuple(tok.sot_sequence),
        vocab=tok.encoding.n_vocab,
        languages=tuple(tok.all_language_tokens),
        special_tokens=dict(tok.special_tokens),
    )


@pytest.mark.parametrize("include_diseases", [False, True])
@pytest.mark.parametrize("task", ["transcribe", "translate"])
def test_multilingual_sweep_all_languages(task, include_diseases):
    from whisper.tokenizer import get_tokenizer as ref_get_tokenizer

    for language in LANGUAGES:
        try:
            ref = ref_get_tokenizer(
                True, language=language, task=task, include_diseases=include_diseases
            )
        except ValueError:
            # 'yue' is the 100th language: without the disease splice the
            # language block is truncated to 99 and the reference tokenizer
            # raises — ours must raise identically (quirk parity)
            with pytest.raises(ValueError):
                get_tokenizer(
                    True, language=language, task=task,
                    include_diseases=include_diseases,
                )
            continue
        ours = get_tokenizer(
            True, language=language, task=task, include_diseases=include_diseases
        )
        assert _spot_ids(ours) == _spot_ids(ref), (language, task, include_diseases)
        assert ours.language_token == ref.language_token, language
        if include_diseases:
            assert ours.disease_tokens == ref.disease_tokens, language


@pytest.mark.parametrize("include_diseases", [False, True])
def test_english_only_sweep(include_diseases):
    from whisper.tokenizer import get_tokenizer as ref_get_tokenizer

    ours = get_tokenizer(False, include_diseases=include_diseases)
    ref = ref_get_tokenizer(False, include_diseases=include_diseases)
    ours_ids, ref_ids = _spot_ids(ours), _spot_ids(ref)
    # en-only tokenizers have no language/task context
    assert ours_ids == ref_ids, include_diseases
    if include_diseases:
        assert ours.disease_tokens == ref.disease_tokens


@pytest.mark.parametrize("include_diseases", [False, True])
def test_disease_sot_splice_positions(include_diseases):
    """The observed IDs from the reference notebooks (SURVEY.md §5 quirk 3)
    stay pinned: multilingual diseases 50359-50361 / vocab 51869, en-only
    50358-50360 / vocab 51868."""
    multi = get_tokenizer(True, language="en", task="transcribe",
                          include_diseases=include_diseases)
    if include_diseases:
        assert multi.disease_tokens == {
            "normal": 50359, "dysphonia": 50360, "dysarthria": 50361
        }
        assert multi.encoding.n_vocab == 51869
        en = get_tokenizer(False, include_diseases=True)
        assert en.disease_tokens == {
            "normal": 50358, "dysphonia": 50359, "dysarthria": 50360
        }
        assert en.encoding.n_vocab == 51868
    else:
        assert multi.encoding.n_vocab == 51865
