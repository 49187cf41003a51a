"""Small host-side helpers shared across the framework.

Functional parity targets: reference `whisper/utils.py:24-82` (exact_div,
str2bool, optional_int/float, compression_ratio, format_timestamp,
get_start/get_end, make_safe). Writers live in
:mod:`asr_ttl_mtl_tpu.utils.writers`.
"""

from __future__ import annotations

import sys
import zlib
from typing import List, Optional

system_encoding = sys.getdefaultencoding()


def make_safe(string: str) -> str:
    """Replace characters not representable in the system encoding with '?'."""
    if system_encoding == "utf-8":
        return string
    return string.encode(system_encoding, errors="replace").decode(system_encoding)


def exact_div(x: int, y: int) -> int:
    assert x % y == 0
    return x // y


def str2bool(string: str) -> bool:
    str2val = {"True": True, "False": False}
    if string in str2val:
        return str2val[string]
    raise ValueError(f"Expected one of {set(str2val.keys())}, got {string}")


def optional_int(string: str) -> Optional[int]:
    return None if string == "None" else int(string)


def optional_float(string: str) -> Optional[float]:
    return None if string == "None" else float(string)


def compression_ratio(text: str) -> float:
    """gzip compressibility of the text; >2.4 flags degenerate repetition
    (used by the temperature-fallback ladder, reference `transcribe.py:203-208`)."""
    text_bytes = text.encode("utf-8")
    return len(text_bytes) / len(zlib.compress(text_bytes))


def format_timestamp(
    seconds: float, always_include_hours: bool = False, decimal_marker: str = "."
) -> str:
    assert seconds >= 0, "non-negative timestamp expected"
    milliseconds = round(seconds * 1000.0)

    hours, milliseconds = divmod(milliseconds, 3_600_000)
    minutes, milliseconds = divmod(milliseconds, 60_000)
    seconds, milliseconds = divmod(milliseconds, 1_000)

    hours_marker = f"{hours:02d}:" if always_include_hours or hours > 0 else ""
    return f"{hours_marker}{minutes:02d}:{seconds:02d}{decimal_marker}{milliseconds:03d}"


def get_start(segments: List[dict]) -> Optional[float]:
    return next(
        (w["start"] for s in segments for w in s["words"]),
        segments[0]["start"] if segments else None,
    )


def get_end(segments: List[dict]) -> Optional[float]:
    return next(
        (w["end"] for s in reversed(segments) for w in reversed(s["words"])),
        segments[-1]["end"] if segments else None,
    )


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
