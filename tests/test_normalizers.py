"""Differential tests of the text normalizers against the reference."""

import pytest

from conftest import import_reference_whisper, reference_available

from asr_ttl_mtl_tpu.normalizers import BasicTextNormalizer, EnglishTextNormalizer
from asr_ttl_mtl_tpu.normalizers.english import EnglishNumberNormalizer

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

import_reference_whisper()

BASIC_CASES = [
    "Hello, World!",
    "Ünïcödé — tëst «string» with œ, ß, and Łódź",
    "[noise] (laughs) <unk> real words",
    "MULTIPLE    spaces\tand\nnewlines",
    "日本語のテキスト、句読点。",
    "naïve façade coöperate",
]

NUMBER_CASES = [
    "one hundred and twenty three",
    "twenty twenty four",
    "one oh one",
    "nineteen sixty",
    "the nineteen sixties",
    "two hundred and seventy fourth",
    "thirty second street",
    "minus five degrees",
    "plus or minus three",
    "twenty dollars",
    "twenty dollars and seven cents",
    "a million dollars",
    "three point one four one five nine",
    "two and a half hours",
    "double oh seven",
    "triple nine",
    "fifty percent",
    "three per cent",
    "one ones one",
    "six sixes sixty sixth",
    "a dozen eggs cost two euros",
    "he won twenty twenty-two awards",
    "1,234,567 things",
    "version 2.5.1 released",
    "1960s music",
    "32nd and 3rd",
    "$5 million",
    "zero zero seven",
    "one thousand and one nights",
    "seven hundred billion",
    "twelve thirty",
    "four score and seven years ago",
    "point five",
    "oh point five",
    "one million two hundred thirty four thousand five hundred sixty seven",
]

ENGLISH_CASES = [
    "Mr. Brown won't go to Dr. Smith's office.",
    "I'm gonna be there, y'all!",
    "it's been a long day; she'd gone home",
    "Let's meet at 3:30... or maybe 4 o'clock?",
    "colour and flavour vs color and flavor",
    "The programme organised a dialogue about defence.",
    "hmm, uh, I think, um, it works",
    "He paid $20 million for the yacht.",
    "Won't you buy twenty-five apples?",
    "I OWE YOU $1.50!",
    "the metre measured a litre of petrol",
]


@pytest.mark.parametrize("remove_diacritics", [False, True])
@pytest.mark.parametrize("case", BASIC_CASES)
def test_basic_normalizer_parity(case, remove_diacritics):
    from whisper.normalizers import BasicTextNormalizer as RefBasic

    ref = RefBasic(remove_diacritics=remove_diacritics)
    ours = BasicTextNormalizer(remove_diacritics=remove_diacritics)
    assert ours(case) == ref(case)


def test_basic_split_letters_parity():
    from whisper.normalizers import BasicTextNormalizer as RefBasic

    case = "héllo 世界 test"
    assert BasicTextNormalizer(split_letters=True)(case) == RefBasic(split_letters=True)(case)


@pytest.mark.parametrize("case", NUMBER_CASES)
def test_number_normalizer_parity(case):
    from whisper.normalizers.english import EnglishNumberNormalizer as RefNum

    assert EnglishNumberNormalizer()(case) == RefNum()(case)


@pytest.mark.parametrize("case", ENGLISH_CASES)
def test_english_normalizer_parity(case):
    from whisper.normalizers import EnglishTextNormalizer as RefEnglish

    assert EnglishTextNormalizer()(case) == RefEnglish()(case)


def test_english_normalizer_fuzz_parity():
    """Random word-soup differential test over the number vocabulary."""
    import random

    from whisper.normalizers.english import EnglishNumberNormalizer as RefNum

    ref = RefNum()
    ours = EnglishNumberNormalizer()
    vocab = list(ours.words) + ["cat", "dog", "the", "7", "3.5", "$4", "-2", "."]
    rng = random.Random(0)
    for _ in range(300):
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
        s = " ".join(words)
        try:
            expected = ref(s)
        except Exception:
            # the reference state machine can raise on pathological inputs;
            # we only require parity where it succeeds
            continue
        assert ours(s) == expected, f"mismatch on: {s!r}"
