"""Hash-cached g++ build of the native runtime library."""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import tempfile

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "_build")


def build_library(source_name: str = "audio_decoder.cpp") -> str:
    """Compile native/<source_name> into a shared library, reusing the cached
    build when the source is unchanged. Returns the .so path.

    Raises ImportError when no compiler is available or compilation fails so
    importers can fall back to pure Python.
    """
    src = os.path.join(_NATIVE_DIR, source_name)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    stem = os.path.splitext(source_name)[0]
    lib_path = os.path.join(_BUILD_DIR, f"lib{stem}-{digest}.so")
    if os.path.exists(lib_path):
        return lib_path

    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        raise ImportError("no C++ compiler available for the native runtime")

    os.makedirs(_BUILD_DIR, exist_ok=True)
    # build to a temp file then atomic-rename: concurrent importers
    # (DataLoader-style worker processes) race on first use
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_BUILD_DIR)
    os.close(fd)
    cmd = [
        gxx, "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        "-fno-math-errno", src, "-o", tmp,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise ImportError(f"native runtime build failed:\n{proc.stderr[-2000:]}")
        os.replace(tmp, lib_path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return lib_path
