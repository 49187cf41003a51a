"""Small host-side helpers shared across the framework.

Functional parity targets: reference `whisper/utils.py:24-82` (exact_div,
str2bool, optional_int/float, compression_ratio, format_timestamp,
get_start/get_end, make_safe) — same observable behavior, this framework's
own expression. Writers live in :mod:`asr_ttl_mtl_tpu.utils.writers`.
"""

from __future__ import annotations

import sys
import zlib
from typing import Callable, List, Optional, TypeVar

system_encoding = sys.getdefaultencoding()

_T = TypeVar("_T")


def make_safe(string: str) -> str:
    """Make `string` printable on the current stdout encoding.

    A UTF-8 console (the overwhelmingly common case) passes through
    untouched; anything narrower gets unrepresentable characters replaced
    via an encode/decode round-trip."""
    if system_encoding == "utf-8":
        return string
    return string.encode(system_encoding, errors="replace").decode(system_encoding)


def exact_div(x: int, y: int) -> int:
    """Integer division that insists on divisibility (audio-frame math:
    a remainder means a constant upstream is wrong, not a rounding choice)."""
    quotient, remainder = divmod(x, y)
    assert remainder == 0
    return quotient


_BOOL_WORDS = {"True": True, "False": False}


def str2bool(string: str) -> bool:
    """argparse bool type: accepts exactly the Python literals True/False."""
    try:
        return _BOOL_WORDS[string]
    except KeyError:
        raise ValueError(
            f"Expected one of {set(_BOOL_WORDS.keys())}, got {string}"
        ) from None


def _none_or(string: str, parse: Callable[[str], _T]) -> Optional[_T]:
    """argparse helper: the literal "None" means None, anything else parses."""
    if string == "None":
        return None
    return parse(string)


def optional_int(string: str) -> Optional[int]:
    return _none_or(string, int)


def optional_float(string: str) -> Optional[float]:
    return _none_or(string, float)


def compression_ratio(text: str) -> float:
    """gzip compressibility of the text; >2.4 flags degenerate repetition
    (used by the temperature-fallback ladder, reference `transcribe.py:203-208`)."""
    raw = text.encode("utf-8")
    return len(raw) / len(zlib.compress(raw))


def format_timestamp(
    seconds: float, always_include_hours: bool = False, decimal_marker: str = "."
) -> str:
    """Render seconds as [HH:]MM:SS<marker>mmm (SRT/VTT cue timestamps)."""
    assert seconds >= 0, "non-negative timestamp expected"
    total_ms = round(seconds * 1000.0)
    ms = total_ms % 1000
    mins, secs = divmod(total_ms // 1000, 60)
    hours, mins = divmod(mins, 60)
    body = f"{mins:02d}:{secs:02d}{decimal_marker}{ms:03d}"
    if always_include_hours or hours:
        return f"{hours:02d}:{body}"
    return body


def get_start(segments: List[dict]) -> Optional[float]:
    """Start time of the first aligned word; the first segment's start when
    no segment carries words; None for an empty result."""
    for segment in segments:
        for word in segment["words"]:
            return word["start"]
    if segments:
        return segments[0]["start"]
    return None


def get_end(segments: List[dict]) -> Optional[float]:
    """End time of the last aligned word; the last segment's end when no
    segment carries words; None for an empty result."""
    for segment in reversed(segments):
        for word in reversed(segment["words"]):
            return word["end"]
    if segments:
        return segments[-1]["end"]
    return None


# Re-export the writers so `asr_ttl_mtl_tpu.utils` presents the same surface
# as the reference's flat `whisper/utils.py` (get_writer at utils.py:296,
# writer classes :109-294). Imported last: writers.py pulls helpers defined
# above from this module.
from .writers import (  # noqa: E402,F401
    ResultWriter,
    SubtitlesWriter,
    WriteJSON,
    WriteSRT,
    WriteTSV,
    WriteTXT,
    WriteVTT,
    get_writer,
)
