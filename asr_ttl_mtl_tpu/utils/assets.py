"""Shared asset resolution (tiktoken rank tables, spelling map).

One search order for every asset so the tokenizer and the normalizers cannot
drift: ASRMTL_ASSET_DIR -> the package directory -> the XDG cache -> the
read-only reference mount (dev environments; override its location with
ASRMTL_REFERENCE_DIR). Callers handle their own network fallback.
"""

from __future__ import annotations

import os
from typing import List, Optional


def cache_dir() -> str:
    default_cache = os.path.join(os.path.expanduser("~"), ".cache")
    return os.path.join(os.getenv("XDG_CACHE_HOME", default_cache), "asr_ttl_mtl_tpu")


def find_asset(
    filename: str, package_dir: str, reference_relpath: str
) -> Optional[str]:
    """First existing path for `filename`, or None.

    package_dir: directory inside this package where the asset may ship.
    reference_relpath: path of the equivalent asset inside a mounted
    reference checkout (developer convenience only).
    """
    candidates: List[str] = []
    if os.environ.get("ASRMTL_ASSET_DIR"):
        candidates.append(os.path.join(os.environ["ASRMTL_ASSET_DIR"], filename))
    candidates.append(os.path.join(package_dir, filename))
    candidates.append(os.path.join(cache_dir(), filename))
    ref_root = os.environ.get("ASRMTL_REFERENCE_DIR", "/root/reference")
    candidates.append(os.path.join(ref_root, reference_relpath))
    for path in candidates:
        if os.path.isfile(path):
            return path
    return None
