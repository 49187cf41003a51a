"""Language-agnostic text normalization for WER scoring.

Behavioral parity with reference `whisper/normalizers/basic.py`.
"""

from __future__ import annotations

import re
import unicodedata

import regex

_BRACKETED = re.compile(r"[<\[][^>\]]*[>\]]")
_PARENTHESIZED = re.compile(r"\(([^)]+?)\)")
_WHITESPACE = re.compile(r"\s+")

# non-ASCII letters that NFKD does not decompose to base letters
ADDITIONAL_DIACRITICS = {
    "œ": "oe", "Œ": "OE", "ø": "o", "Ø": "O", "æ": "ae", "Æ": "AE",
    "ß": "ss", "ẞ": "SS", "đ": "d", "Đ": "D", "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "th", "ł": "l", "Ł": "L",
}

# Unicode major categories replaced by a space: Marks, Symbols, Punctuation
_SPACED_CATEGORIES = frozenset("MSP")


def remove_symbols_and_diacritics(s: str, keep: str = "") -> str:
    """Drop diacritics (Mn) and replace marks/symbols/punctuation with a
    space, after NFKD decomposition."""
    out = []
    for c in unicodedata.normalize("NFKD", s):
        if c in keep:
            out.append(c)
        elif c in ADDITIONAL_DIACRITICS:
            out.append(ADDITIONAL_DIACRITICS[c])
        else:
            cat = unicodedata.category(c)
            if cat == "Mn":
                continue
            out.append(" " if cat[0] in _SPACED_CATEGORIES else c)
    return "".join(out)


def remove_symbols(s: str) -> str:
    """Replace marks/symbols/punctuation with a space, keeping diacritics."""
    chars = (
        " " if unicodedata.category(c)[0] in _SPACED_CATEGORIES else c
        for c in unicodedata.normalize("NFKC", s)
    )
    return "".join(chars)


class BasicTextNormalizer:
    def __init__(self, remove_diacritics: bool = False, split_letters: bool = False):
        self.clean = (
            remove_symbols_and_diacritics if remove_diacritics else remove_symbols
        )
        self.split_letters = split_letters

    def __call__(self, s: str) -> str:
        s = _BRACKETED.sub("", s.lower())  # drop bracketed annotations
        s = _PARENTHESIZED.sub("", s)  # drop parenthesized asides
        s = self.clean(s).lower()
        if self.split_letters:
            s = " ".join(regex.findall(r"\X", s, regex.U))
        return _WHITESPACE.sub(" ", s)
