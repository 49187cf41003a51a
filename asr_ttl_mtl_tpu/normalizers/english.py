"""English text normalization for WER scoring.

Behavioral parity with reference `whisper/normalizers/english.py`:
`EnglishNumberNormalizer` (spelled-out numbers -> arabic numerals, currency /
percent / ordinal handling), `EnglishSpellingNormalizer` (British->American
spelling map) and the top-level `EnglishTextNormalizer` contraction rules.

The number normalizer here is organized as an explicit emitter object
(`_Emitter`) carrying the in-progress (prefix, value) state with one handler
per token category, rather than the reference's single generator with
nonlocal state — semantics are identical (see tests/test_normalizers.py for
the differential tests against the reference on a corpus of edge cases).
"""

from __future__ import annotations

import json
import os
import re
from fractions import Fraction
from typing import List, Optional, Union

from .basic import remove_symbols_and_diacritics

_NUMERIC_RE = re.compile(r"^\d+(\.\d+)?$")


def _fraction_or_none(s) -> Optional[Fraction]:
    try:
        return Fraction(s)
    except ValueError:
        return None


class _Emitter:
    """Accumulates the in-progress number (`value`) and sign/currency
    `prefix`, and collects finalized output words."""

    def __init__(self):
        self.prefix: Optional[str] = None
        self.value: Optional[Union[str, int]] = None
        self.out: List[str] = []

    def flush(self, result=None):
        """Finalize `result` (default: the pending value) into the output."""
        if result is None:
            result = self.value
        result = str(result)
        if self.prefix is not None:
            result = self.prefix + result
        self.prefix = None
        self.value = None
        self.out.append(result)

    def flush_pending(self):
        if self.value is not None:
            self.flush()

    def append_digits(self, digits: str):
        self.value = str(self.value or "") + digits


class EnglishNumberNormalizer:
    """Convert spelled-out numbers to arabic numerals: keeps ordinal/plural
    suffixes (`274th`, `1960s`), moves currency symbols in front (`$20
    million` -> spelled `20000000 dollars` -> `$20000000`), reads successive
    single digits as nominal (`one oh one` -> `101`), and leaves bare
    `one`/`ones` alone."""

    def __init__(self):
        self.zeros = {"o", "oh", "zero"}
        one_names = [
            "one", "two", "three", "four", "five", "six", "seven", "eight",
            "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
            "fifteen", "sixteen", "seventeen", "eighteen", "nineteen",
        ]
        self.ones = {name: i + 1 for i, name in enumerate(one_names)}
        self.ones_plural = {
            ("sixes" if name == "six" else name + "s"): (value, "s")
            for name, value in self.ones.items()
        }
        irregular_ordinals = {
            "zeroth": (0, "th"), "first": (1, "st"), "second": (2, "nd"),
            "third": (3, "rd"), "fifth": (5, "th"), "twelfth": (12, "th"),
        }
        self.ones_ordinal = {
            **irregular_ordinals,
            **{
                name + ("h" if name.endswith("t") else "th"): (value, "th")
                for name, value in self.ones.items()
                if value > 3 and value not in (5, 12)
            },
        }
        self.ones_suffixed = {**self.ones_plural, **self.ones_ordinal}

        self.tens = {
            "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
            "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
        }
        self.tens_suffixed = {
            **{n.replace("y", "ies"): (v, "s") for n, v in self.tens.items()},
            **{n.replace("y", "ieth"): (v, "th") for n, v in self.tens.items()},
        }

        names = ["hundred", "thousand", "million", "billion", "trillion",
                 "quadrillion", "quintillion", "sextillion", "septillion",
                 "octillion", "nonillion", "decillion"]
        self.multipliers = {
            name: 100 if name == "hundred" else 10 ** (3 * i)
            for i, name in enumerate(names)
        }
        self.multipliers_suffixed = {
            **{n + "s": (v, "s") for n, v in self.multipliers.items()},
            **{n + "th": (v, "th") for n, v in self.multipliers.items()},
        }
        self.decimals = {*self.ones, *self.tens, *self.zeros}

        self.preceding_prefixers = {
            "minus": "-", "negative": "-", "plus": "+", "positive": "+",
        }
        self.following_prefixers = {
            "pound": "£", "pounds": "£", "euro": "€", "euros": "€",
            "dollar": "$", "dollars": "$", "cent": "¢", "cents": "¢",
        }
        self.prefixes = set(self.preceding_prefixers.values()) | set(
            self.following_prefixers.values()
        )
        self.suffixers = {"per": {"cent": "%"}, "percent": "%"}
        self.specials = {"and", "double", "triple", "point"}

        self.words = set().union(
            self.zeros, self.ones, self.ones_suffixed, self.tens,
            self.tens_suffixed, self.multipliers, self.multipliers_suffixed,
            self.preceding_prefixers, self.following_prefixers,
            self.suffixers, self.specials,
        )
        self.literal_words = {"one", "ones"}

    # -- per-category handlers (each mirrors one branch of the reference's
    # state machine, timing preserved exactly) -------------------------------

    def _handle_arabic(self, em: _Emitter, current: str):
        has_prefix = current[0] in self.prefixes
        bare = current[1:] if has_prefix else current
        f = _fraction_or_none(bare)
        assert f is not None
        if em.value is not None:
            if isinstance(em.value, str) and em.value.endswith("."):
                # decimal continuation / dotted sequences like IP addresses
                em.value = str(em.value) + str(current)
                return
            em.flush()
        if has_prefix:
            em.prefix = current[0]
        em.value = f.numerator if f.denominator == 1 else bare

    def _handle_one(self, em: _Emitter, prev: Optional[str], current: str):
        ones = self.ones[current]
        if em.value is None:
            em.value = ones
        elif isinstance(em.value, str) or prev in self.ones:
            if prev in self.tens and ones < 10:
                assert em.value[-1] == "0"
                em.value = em.value[:-1] + str(ones)  # fill the tens slot
            else:
                em.value = str(em.value) + str(ones)
        elif ones < 10:
            if em.value % 10 == 0:
                em.value += ones
            else:
                em.value = str(em.value) + str(ones)
        else:  # eleven..nineteen
            if em.value % 100 == 0:
                em.value += ones
            else:
                em.value = str(em.value) + str(ones)

    def _handle_one_suffixed(self, em: _Emitter, prev: Optional[str], current: str):
        ones, suffix = self.ones_suffixed[current]
        if em.value is None:
            em.flush(str(ones) + suffix)
        elif isinstance(em.value, str) or prev in self.ones:
            if prev in self.tens and ones < 10:
                assert em.value[-1] == "0"
                em.flush(em.value[:-1] + str(ones) + suffix)
            else:
                em.flush(str(em.value) + str(ones) + suffix)
        elif ones < 10:
            if em.value % 10 == 0:
                em.flush(str(em.value + ones) + suffix)
            else:
                em.flush(str(em.value) + str(ones) + suffix)
        else:
            if em.value % 100 == 0:
                em.flush(str(em.value + ones) + suffix)
            else:
                em.flush(str(em.value) + str(ones) + suffix)
        em.value = None

    def _handle_ten(self, em: _Emitter, current: str):
        tens = self.tens[current]
        if em.value is None:
            em.value = tens
        elif isinstance(em.value, str):
            em.value = str(em.value) + str(tens)
        elif em.value % 100 == 0:
            em.value += tens
        else:
            em.value = str(em.value) + str(tens)

    def _handle_ten_suffixed(self, em: _Emitter, current: str):
        tens, suffix = self.tens_suffixed[current]
        if em.value is None:
            em.flush(str(tens) + suffix)
        elif isinstance(em.value, str):
            em.flush(str(em.value) + str(tens) + suffix)
        elif em.value % 100 == 0:
            em.flush(str(em.value + tens) + suffix)
        else:
            em.flush(str(em.value) + str(tens) + suffix)

    def _handle_multiplier(self, em: _Emitter, current: str):
        multiplier = self.multipliers[current]
        if em.value is None:
            em.value = multiplier
        elif isinstance(em.value, str) or em.value == 0:
            f = _fraction_or_none(em.value)
            p = f * multiplier if f is not None else None
            if f is not None and p.denominator == 1:
                em.value = p.numerator
            else:
                em.flush()
                em.value = multiplier
        else:
            before = em.value // 1000 * 1000
            residual = em.value % 1000
            em.value = before + residual * multiplier

    def _handle_multiplier_suffixed(self, em: _Emitter, current: str):
        multiplier, suffix = self.multipliers_suffixed[current]
        if em.value is None:
            em.flush(str(multiplier) + suffix)
        elif isinstance(em.value, str):
            f = _fraction_or_none(em.value)
            p = f * multiplier if f is not None else None
            if f is not None and p.denominator == 1:
                em.flush(str(p.numerator) + suffix)
            else:
                em.flush()
                em.flush(str(multiplier) + suffix)
        else:
            before = em.value // 1000 * 1000
            residual = em.value % 1000
            em.value = before + residual * multiplier
            em.flush(str(em.value) + suffix)
        em.value = None

    # -- driver ---------------------------------------------------------------

    def process_words(self, words: List[str]) -> List[str]:
        em = _Emitter()
        skip = False
        n = len(words)
        for i, current in enumerate(words):
            if skip:
                skip = False
                continue
            prev = words[i - 1] if i > 0 else None
            nxt = words[i + 1] if i + 1 < n else None
            next_is_numeric = nxt is not None and _NUMERIC_RE.match(nxt)
            bare = current[1:] if current[0] in self.prefixes else current

            if _NUMERIC_RE.match(bare):
                self._handle_arabic(em, current)
            elif current not in self.words:
                em.flush_pending()
                em.flush(current)
            elif current in self.zeros:
                em.append_digits("0")
            elif current in self.ones:
                self._handle_one(em, prev, current)
            elif current in self.ones_suffixed:
                self._handle_one_suffixed(em, prev, current)
            elif current in self.tens:
                self._handle_ten(em, current)
            elif current in self.tens_suffixed:
                self._handle_ten_suffixed(em, current)
            elif current in self.multipliers:
                self._handle_multiplier(em, current)
            elif current in self.multipliers_suffixed:
                self._handle_multiplier_suffixed(em, current)
            elif current in self.preceding_prefixers:
                em.flush_pending()
                if (nxt in self.words) or next_is_numeric:
                    em.prefix = self.preceding_prefixers[current]
                else:
                    em.flush(current)
            elif current in self.following_prefixers:
                if em.value is not None:
                    em.prefix = self.following_prefixers[current]
                    em.flush()
                else:
                    em.flush(current)
            elif current in self.suffixers:
                if em.value is not None:
                    suffix = self.suffixers[current]
                    if isinstance(suffix, dict):
                        if nxt in suffix:
                            em.flush(str(em.value) + suffix[nxt])
                            skip = True
                        else:
                            em.flush()
                            em.flush(current)
                    else:
                        em.flush(str(em.value) + suffix)
                else:
                    em.flush(current)
            elif current in self.specials:
                if (nxt not in self.words) and not next_is_numeric:
                    em.flush_pending()
                    em.flush(current)
                elif current == "and":
                    # "and" between multiplier groups is dropped
                    if prev not in self.multipliers:
                        em.flush_pending()
                        em.flush(current)
                elif current in ("double", "triple"):
                    if nxt in self.ones or nxt in self.zeros:
                        repeats = 2 if current == "double" else 3
                        em.append_digits(str(self.ones.get(nxt, 0)) * repeats)
                        skip = True
                    else:
                        em.flush_pending()
                        em.flush(current)
                elif current == "point":
                    if nxt in self.decimals or next_is_numeric:
                        em.append_digits(".")
                else:  # pragma: no cover
                    raise ValueError(f"Unexpected token: {current}")
            else:  # pragma: no cover
                raise ValueError(f"Unexpected token: {current}")

        em.flush_pending()
        return em.out

    def preprocess(self, s: str) -> str:
        # "<number> and a half" -> "<number> point five"
        results = []
        segments = re.split(r"\band\s+a\s+half\b", s)
        for i, segment in enumerate(segments):
            if len(segment.strip()) == 0:
                continue
            if i == len(segments) - 1:
                results.append(segment)
            else:
                results.append(segment)
                last_word = segment.rsplit(maxsplit=2)[-1]
                if last_word in self.decimals or last_word in self.multipliers:
                    results.append("point five")
                else:
                    results.append("and a half")
        s = " ".join(results)

        # separate digits glued to letters, but keep ordinal/plural suffixes
        s = re.sub(r"([a-z])([0-9])", r"\1 \2", s)
        s = re.sub(r"([0-9])([a-z])", r"\1 \2", s)
        s = re.sub(r"([0-9])\s+(st|nd|rd|th|s)\b", r"\1\2", s)
        return s

    def postprocess(self, s: str) -> str:
        def combine_cents(m: re.Match) -> str:
            try:
                return f"{m.group(1)}{m.group(2)}.{int(m.group(3)):02d}"
            except ValueError:
                return m.string

        def extract_cents(m: re.Match) -> str:
            try:
                return f"¢{int(m.group(1))}"
            except ValueError:
                return m.string

        # "$2 and ¢7" -> "$2.07"
        s = re.sub(r"([€£$])([0-9]+) (?:and )?¢([0-9]{1,2})\b", combine_cents, s)
        s = re.sub(r"[€£$]0.([0-9]{1,2})\b", extract_cents, s)
        # keep "one(s)" literal for readability
        s = re.sub(r"\b1(s?)\b", r"one\1", s)
        return s

    def __call__(self, s: str) -> str:
        s = self.preprocess(s)
        s = " ".join(w for w in self.process_words(s.split()) if w is not None)
        return self.postprocess(s)


def _find_spelling_mapping() -> dict:
    """Locate the British->American spelling map (english.json asset,
    shared search order in utils/assets.py)."""
    from ..utils.assets import find_asset

    path = find_asset(
        "english.json",
        os.path.dirname(__file__),
        os.path.join("whisper", "normalizers", "english.json"),
    )
    if path:
        with open(path) as f:
            return json.load(f)
    # network fallback (public openai/whisper asset)
    try:
        import urllib.request

        url = "https://raw.githubusercontent.com/openai/whisper/main/whisper/normalizers/english.json"
        with urllib.request.urlopen(url, timeout=30) as src:
            data = json.load(src)
        cache_path = candidates[-2]
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        with open(cache_path, "w") as f:
            json.dump(data, f)
        return data
    except Exception:
        import warnings

        warnings.warn(
            "english.json spelling map not found; EnglishSpellingNormalizer "
            "will be a no-op. Set ASRMTL_ASSET_DIR to provide it."
        )
        return {}


class EnglishSpellingNormalizer:
    """British->American spelling mapping (tysto.com word list)."""

    def __init__(self):
        self.mapping = _find_spelling_mapping()

    def __call__(self, s: str) -> str:
        return " ".join(self.mapping.get(word, word) for word in s.split())


class EnglishTextNormalizer:
    def __init__(self):
        self.ignore_patterns = r"\b(hmm|mm|mhm|mmm|uh|um)\b"
        self.replacers = {
            # common contractions
            r"\bwon't\b": "will not",
            r"\bcan't\b": "can not",
            r"\blet's\b": "let us",
            r"\bain't\b": "aint",
            r"\by'all\b": "you all",
            r"\bwanna\b": "want to",
            r"\bgotta\b": "got to",
            r"\bgonna\b": "going to",
            r"\bi'ma\b": "i am going to",
            r"\bimma\b": "i am going to",
            r"\bwoulda\b": "would have",
            r"\bcoulda\b": "could have",
            r"\bshoulda\b": "should have",
            r"\bma'am\b": "madam",
            # titles / honorifics
            r"\bmr\b": "mister ",
            r"\bmrs\b": "missus ",
            r"\bst\b": "saint ",
            r"\bdr\b": "doctor ",
            r"\bprof\b": "professor ",
            r"\bcapt\b": "captain ",
            r"\bgov\b": "governor ",
            r"\bald\b": "alderman ",
            r"\bgen\b": "general ",
            r"\bsen\b": "senator ",
            r"\brep\b": "representative ",
            r"\bpres\b": "president ",
            r"\brev\b": "reverend ",
            r"\bhon\b": "honorable ",
            r"\basst\b": "assistant ",
            r"\bassoc\b": "associate ",
            r"\blt\b": "lieutenant ",
            r"\bcol\b": "colonel ",
            r"\bjr\b": "junior ",
            r"\bsr\b": "senior ",
            r"\besq\b": "esquire ",
            # perfect tenses with unambiguous participles
            r"'d been\b": " had been",
            r"'s been\b": " has been",
            r"'d gone\b": " had gone",
            r"'s gone\b": " has gone",
            r"'d done\b": " had done",
            r"'s got\b": " has got",
            # general contractions
            r"n't\b": " not",
            r"'re\b": " are",
            r"'s\b": " is",
            r"'d\b": " would",
            r"'ll\b": " will",
            r"'t\b": " not",
            r"'ve\b": " have",
            r"'m\b": " am",
        }
        self.standardize_numbers = EnglishNumberNormalizer()
        self.standardize_spellings = EnglishSpellingNormalizer()

    def __call__(self, s: str) -> str:
        s = s.lower()
        s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)  # drop bracketed annotations
        s = re.sub(r"\(([^)]+?)\)", "", s)  # drop parenthesized asides
        s = re.sub(self.ignore_patterns, "", s)
        s = re.sub(r"\s+'", "'", s)  # re-attach detached apostrophes

        for pattern, replacement in self.replacers.items():
            s = re.sub(pattern, replacement, s)

        s = re.sub(r"(\d),(\d)", r"\1\2", s)  # digit group commas
        s = re.sub(r"\.([^0-9]|$)", r" \1", s)  # periods not in numbers
        s = remove_symbols_and_diacritics(s, keep=".%$¢€£")

        s = self.standardize_numbers(s)
        s = self.standardize_spellings(s)

        # strip numeric symbols that ended up unattached to numbers
        s = re.sub(r"[.$¢€£]([^0-9])", r" \1", s)
        s = re.sub(r"([^0-9])%", r"\1 ", s)
        return re.sub(r"\s+", " ", s)
