"""Whisper tokenizer with speech-disorder token support (host-side).

Functional equivalent of reference `whisper/tokenizer.py`, including the
repo's core customization: three disease tokens (`<|normal|>`,
`<|dysphonia|>`, `<|dysarthria|>`) spliced into the *language* token block
(`tokenizer.py:363-367` in the reference). That splice shifts
`<|translate|>`/`<|transcribe|>`/`<|notimestamps|>` and all timestamp IDs
relative to the pretrained checkpoints — fine after fine-tuning, and we
reproduce the exact observed ID layout (see tests/test_tokenizer.py):

* multilingual: EOT=50257, SOT=50258, diseases 50359/50360/50361
* english-only: EOT=50256, SOT=50257, diseases 50358/50359/50360

Note the reference's `num_languages + 3` arithmetic makes the language slice
pick up the 100th language (`yue`), so the multilingual vocab grows by 4
(51865 -> 51869), not 3. We replicate that as an explicit policy.

Tokenization is BPE over the public GPT-2 / Whisper-multilingual rank tables
(tiktoken). The rank tables are resolved from `ASRMTL_ASSET_DIR`, the package
`assets/` dir, `~/.cache/asr_ttl_mtl_tpu`, or downloaded from the public
openaipublic URLs when network is available. Tokenization is off the TPU hot
path and stays on host.
"""

from __future__ import annotations

import base64
import os
import string
from dataclasses import dataclass, field
from functools import cached_property, lru_cache
from typing import Dict, List, Optional, Tuple

import tiktoken

# fmt: off
# ISO language codes recognized by Whisper checkpoints, in vocabulary order
# (public data from openai/whisper; order defines the special-token IDs).
LANGUAGES = {
    "en": "english", "zh": "chinese", "de": "german", "es": "spanish",
    "ru": "russian", "ko": "korean", "fr": "french", "ja": "japanese",
    "pt": "portuguese", "tr": "turkish", "pl": "polish", "ca": "catalan",
    "nl": "dutch", "ar": "arabic", "sv": "swedish", "it": "italian",
    "id": "indonesian", "hi": "hindi", "fi": "finnish", "vi": "vietnamese",
    "he": "hebrew", "uk": "ukrainian", "el": "greek", "ms": "malay",
    "cs": "czech", "ro": "romanian", "da": "danish", "hu": "hungarian",
    "ta": "tamil", "no": "norwegian", "th": "thai", "ur": "urdu",
    "hr": "croatian", "bg": "bulgarian", "lt": "lithuanian", "la": "latin",
    "mi": "maori", "ml": "malayalam", "cy": "welsh", "sk": "slovak",
    "te": "telugu", "fa": "persian", "lv": "latvian", "bn": "bengali",
    "sr": "serbian", "az": "azerbaijani", "sl": "slovenian", "kn": "kannada",
    "et": "estonian", "mk": "macedonian", "br": "breton", "eu": "basque",
    "is": "icelandic", "hy": "armenian", "ne": "nepali", "mn": "mongolian",
    "bs": "bosnian", "kk": "kazakh", "sq": "albanian", "sw": "swahili",
    "gl": "galician", "mr": "marathi", "pa": "punjabi", "si": "sinhala",
    "km": "khmer", "sn": "shona", "yo": "yoruba", "so": "somali",
    "af": "afrikaans", "oc": "occitan", "ka": "georgian", "be": "belarusian",
    "tg": "tajik", "sd": "sindhi", "gu": "gujarati", "am": "amharic",
    "yi": "yiddish", "lo": "lao", "uz": "uzbek", "fo": "faroese",
    "ht": "haitian creole", "ps": "pashto", "tk": "turkmen", "nn": "nynorsk",
    "mt": "maltese", "sa": "sanskrit", "lb": "luxembourgish", "my": "myanmar",
    "bo": "tibetan", "tl": "tagalog", "mg": "malagasy", "as": "assamese",
    "tt": "tatar", "haw": "hawaiian", "ln": "lingala", "ha": "hausa",
    "ba": "bashkir", "jw": "javanese", "su": "sundanese", "yue": "cantonese",
}
# fmt: on

# speech-disorder classes; order defines the spliced token IDs
DISEASE_CONDITIONS = {"normal": 0, "dysphonia": 1, "dysarthria": 2}

# name -> code, plus historical/alternate language names
_ALT_LANGUAGE_NAMES = dict(
    burmese="my", valencian="ca", flemish="nl", haitian="ht",
    letzeburgesch="lb", pushto="ps", panjabi="pa", moldavian="ro",
    moldovan="ro", sinhalese="si", castilian="es", mandarin="zh",
)
TO_LANGUAGE_CODE = {
    **{language: code for code, language in LANGUAGES.items()},
    **_ALT_LANGUAGE_NAMES,
}


def normalize_language(language: Optional[str]) -> Optional[str]:
    """Map a language name or code (any case) to its code, or raise.

    Upstream whisper normalizes inside get_tokenizer (accepting "Spanish",
    "ES", "castilian", ...); the vendored reference copy dropped that block,
    so `--language Spanish` crashes there with a bare
    `tuple.index(x): x not in tuple`. That is breakage, not a quirk — this
    framework restores the intended behavior (clean "Unsupported language"
    error included).
    """
    if language is None:
        return None
    lowered = language.lower()
    if lowered in LANGUAGES:
        return lowered
    code = TO_LANGUAGE_CODE.get(lowered)
    if code is None:
        raise ValueError(f"Unsupported language: {language}")
    return code

_VOCAB_URLS = {
    "gpt2": "https://openaipublic.blob.core.windows.net/gpt-2/encodings/main/vocab.bpe",
    # tiktoken-format rank files as shipped with openai/whisper
    "gpt2.tiktoken": "https://raw.githubusercontent.com/openai/whisper/main/whisper/assets/gpt2.tiktoken",
    "multilingual.tiktoken": "https://raw.githubusercontent.com/openai/whisper/main/whisper/assets/multilingual.tiktoken",
}


def find_vocab_file(name: str) -> str:
    """Locate `<name>.tiktoken` (shared search order, utils/assets.py),
    downloading the public rank table to the cache dir as a last resort."""
    from .utils.assets import cache_dir as _cache_dir, find_asset

    fname = f"{name}.tiktoken"
    found = find_asset(
        fname,
        os.path.join(os.path.dirname(__file__), "assets"),
        os.path.join("whisper", "assets", fname),
    )
    if found:
        return found
    cache_dir = _cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    target = os.path.join(cache_dir, fname)
    import urllib.request

    url = _VOCAB_URLS[fname]
    try:
        with urllib.request.urlopen(url, timeout=30) as src, open(target, "wb") as dst:
            dst.write(src.read())
    except Exception as e:  # zero-egress environments land here
        raise FileNotFoundError(
            f"BPE rank table '{fname}' not found in {_asset_search_dirs()} and "
            f"could not be downloaded ({e}). Set ASRMTL_ASSET_DIR to a directory "
            "containing the public Whisper tiktoken assets."
        ) from e
    return target


# Tokenizer attribute name -> special-token marker text. One table drives
# both the vocabulary layout (_build_special_tokens) and the id accessors
# (Tokenizer.__getattr__).
_MARKERS = {
    "eot": "<|endoftext|>",
    "sot": "<|startoftranscript|>",
    "translate": "<|translate|>",
    "transcribe": "<|transcribe|>",
    "sot_lm": "<|startoflm|>",
    "sot_prev": "<|startofprev|>",
    "no_speech": "<|nospeech|>",
    "no_timestamps": "<|notimestamps|>",
    "timestamp_begin": "<|0.00|>",
}


def _build_special_tokens(num_languages: int, include_diseases: bool) -> List[str]:
    """The ordered special-token list that follows the BPE ranks.

    Replicates the reference layout (`tokenizer.py:362-380`): when
    include_diseases is set, the disease tokens are appended to the language
    block, *before* `<|translate|>` — and the language slice is taken over
    `num_languages` entries, which (being num_languages = 99+3 at the
    callsite) rounds the block up to all 100 known languages.
    """
    lang_block = list(LANGUAGES.keys())[:num_languages]
    if include_diseases:
        lang_block = lang_block + list(DISEASE_CONDITIONS.keys())
    controls = "translate transcribe startoflm startofprev nospeech notimestamps"
    return [
        _MARKERS["eot"],
        _MARKERS["sot"],
        *[f"<|{lang}|>" for lang in lang_block],
        *[f"<|{name}|>" for name in controls.split()],
        *[f"<|{i * 0.02:.2f}|>" for i in range(1501)],
    ]


@lru_cache(maxsize=None)
def get_encoding(
    name: str = "gpt2", num_languages: int = 99, include_diseases: bool = False
) -> tiktoken.Encoding:
    vocab_path = find_vocab_file(name)
    ranks: Dict[bytes, int] = {}
    with open(vocab_path) as f:
        for line in f:
            if not line.strip():
                continue
            token_b64, rank = line.split()
            ranks[base64.b64decode(token_b64)] = int(rank)

    special_tokens = {
        tok: len(ranks) + i
        for i, tok in enumerate(_build_special_tokens(num_languages, include_diseases))
    }
    return tiktoken.Encoding(
        name=os.path.basename(vocab_path),
        explicit_n_vocab=len(ranks) + len(special_tokens),
        pat_str=r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
        mergeable_ranks=ranks,
        special_tokens=special_tokens,
    )


@dataclass
class Tokenizer:
    """tiktoken wrapper with quick access to Whisper special tokens."""

    encoding: tiktoken.Encoding
    num_languages: int
    language: Optional[str] = None
    task: Optional[str] = None
    sot_sequence: Tuple[int, ...] = ()
    special_tokens: Dict[str, int] = field(default_factory=dict)
    disease_conditions: Optional[Dict[str, int]] = None

    def __post_init__(self):
        for special in self.encoding.special_tokens_set:
            self.special_tokens[special] = self.encoding.encode_single_token(special)

        sot = self.special_tokens["<|startoftranscript|>"]
        seq = [sot]
        if self.language is not None:
            langs = tuple(LANGUAGES.keys())[: self.num_languages]
            seq.append(sot + 1 + langs.index(self.language))
        if self.task is not None:
            seq.append(self.transcribe if self.task == "transcribe" else self.translate)
        self.sot_sequence = tuple(seq)

    # -- encode/decode -----------------------------------------------------

    def encode(self, text: str, **kwargs) -> List[int]:
        return self.encoding.encode(text, **kwargs)

    def decode(self, token_ids, **kwargs) -> str:
        # timestamp tokens (and anything above) are dropped; other special
        # tokens decode to their literal "<|...|>" text (reference behavior,
        # tokenizer.py:171-173)
        token_ids = [int(t) for t in token_ids if int(t) < self.timestamp_begin]
        return self.encoding.decode(token_ids, **kwargs)

    def decode_with_timestamps(self, token_ids, **kwargs) -> str:
        return self.encoding.decode([int(t) for t in token_ids], **kwargs)

    def decode_text_only(self, token_ids) -> str:
        """Decode dropping *all* special tokens (used by MTL metrics)."""
        token_ids = [int(t) for t in token_ids]
        specials = set(self.special_tokens.values())
        return self.encoding.decode([t for t in token_ids if t not in specials])

    # -- special token accessors -------------------------------------------
    # eot / sot / transcribe / translate / sot_lm / sot_prev / no_speech /
    # no_timestamps / timestamp_begin all resolve through the _MARKERS table;
    # the first lookup stores the id on the instance so later ones are plain
    # attribute reads.

    def __getattr__(self, name: str) -> int:
        marker = _MARKERS.get(name)
        if marker is None:
            raise AttributeError(name)
        token_id = self.special_tokens[marker]
        setattr(self, name, token_id)
        return token_id

    @cached_property
    def language_token(self) -> int:
        if self.language is None:
            raise ValueError("This tokenizer does not have language token configured")
        return self.to_language_token(self.language)

    def to_language_token(self, language: str) -> int:
        token = self.special_tokens.get(f"<|{language}|>")
        if token is None:
            raise KeyError(f"Language {language} not found in tokenizer.")
        return token

    @cached_property
    def all_language_tokens(self) -> Tuple[int, ...]:
        # insertion order, NOT sorted: the reference truncates the special-
        # token dict's iteration order to num_languages (tokenizer.py:297-303),
        # and the two orders pick different subsets for some tokenizer builds
        result = [
            token_id
            for token, token_id in self.special_tokens.items()
            if token.strip("<|>") in LANGUAGES
        ]
        return tuple(result[: self.num_languages])

    @cached_property
    def all_language_codes(self) -> Tuple[str, ...]:
        return tuple(self.decode([t]).strip("<|>") for t in self.all_language_tokens)

    @cached_property
    def sot_sequence_including_notimestamps(self) -> Tuple[int, ...]:
        return tuple(list(self.sot_sequence) + [self.no_timestamps])

    @cached_property
    def disease_tokens(self) -> Dict[str, int]:
        """disease name -> spliced special-token id (empty if not configured)"""
        if not self.disease_conditions:
            return {}
        return {
            disease: self.special_tokens[f"<|{disease}|>"]
            for disease in self.disease_conditions
            if f"<|{disease}|>" in self.special_tokens
        }

    @cached_property
    def non_speech_tokens(self) -> Tuple[int, ...]:
        """Token ids suppressed to avoid speaker tags / non-speech annotations,
        keeping basic punctuation (reference tokenizer.py:249-282)."""
        symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』')
        symbols += (
            "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪".split()
        )
        miscellaneous = set("♩♪♫♬♭♮♯")
        assert all(0x2640 <= ord(c) <= 0x267F for c in miscellaneous)

        # allow hyphens and single quotes between words, but not word-initial
        result = {self.encoding.encode(" -")[0], self.encoding.encode(" '")[0]}
        for symbol in symbols + list(miscellaneous):
            for tokens in [self.encoding.encode(symbol), self.encoding.encode(" " + symbol)]:
                if len(tokens) == 1 or symbol in miscellaneous:
                    result.add(tokens[0])
        return tuple(sorted(result))

    # -- word splitting (for word-level timestamps) --------------------------

    def split_to_word_tokens(self, tokens: List[int]):
        if self.language in {"zh", "ja", "th", "lo", "my", "yue"}:
            # no-space scripts: split at valid unicode boundaries instead
            return self.split_tokens_on_unicode(tokens)
        return self.split_tokens_on_spaces(tokens)

    def split_tokens_on_unicode(self, tokens: List[int]):
        """Group tokens at codepoint-complete boundaries.

        BPE tokens can split a multi-byte codepoint, in which case the partial
        decode shows a U+FFFD placeholder. A group of tokens closes once its
        decode carries no placeholder — or carries one that the decode of the
        WHOLE sequence also has at that exact position (i.e. a genuine U+FFFD
        in the text rather than a split-codepoint artifact).
        """
        full_text = self.decode_with_timestamps(tokens)
        texts: List[str] = []
        groups: List[List[int]] = []
        pending: List[int] = []
        covered = 0  # codepoints of full_text covered by closed groups
        for token in tokens:
            pending.append(token)
            text = self.decode_with_timestamps(pending)
            cut = text.find("�")
            if cut < 0 or full_text[covered + cut] == "�":
                texts.append(text)
                groups.append(pending)
                covered += len(text)
                pending = []
        return texts, groups

    def split_tokens_on_spaces(self, tokens: List[int]):
        """Merge codepoint groups into words: a group opens a new word when it
        is a special token, begins with a space, or is bare punctuation;
        anything else extends the word before it."""
        words: List[str] = []
        word_tokens: List[List[int]] = []
        for piece, piece_tokens in zip(*self.split_tokens_on_unicode(tokens)):
            opens_word = (
                not words
                or piece_tokens[0] >= self.eot
                or piece.startswith(" ")
                or piece.strip() in string.punctuation
            )
            if opens_word:
                words.append(piece)
                word_tokens.append(piece_tokens)
            else:
                words[-1] += piece
                word_tokens[-1].extend(piece_tokens)
        return words, word_tokens


@lru_cache(maxsize=None)
def get_tokenizer(
    multilingual: bool,
    *,
    num_languages: int = 99,
    language: Optional[str] = None,
    task: Optional[str] = None,
    include_diseases: bool = False,
) -> Tokenizer:
    """Build the Whisper tokenizer (reference `tokenizer.py:395-434` parity).

    With include_diseases the language-block size is num_languages + 3, which
    both appends the disease tokens and (as in the reference) pulls `yue`
    into the multilingual language block — see the module docstring.
    """
    language = normalize_language(language)
    if multilingual:
        encoding_name = "multilingual"
        language = language or "en"
        task = task or "transcribe"
    else:
        encoding_name = "gpt2"
        language = None
        task = None

    total_languages = num_languages + (len(DISEASE_CONDITIONS) if include_diseases else 0)
    encoding = get_encoding(
        name=encoding_name, num_languages=total_languages, include_diseases=include_diseases
    )
    return Tokenizer(
        encoding=encoding,
        num_languages=total_languages,
        language=language,
        task=task,
        disease_conditions=dict(DISEASE_CONDITIONS) if include_diseases else None,
    )
