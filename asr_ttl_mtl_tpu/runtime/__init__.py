"""Native host runtime (C++): audio decode/resample and batch input loading.

The TPU compute path is JAX/XLA/Pallas; this package is the *host* side of
the framework — the pieces the reference ran as native code out of process
(one ffmpeg subprocess per sample, `whisper/audio.py:42-58`) run here as an
in-process C++ shared library with a thread pool, bound via ctypes.

Modules:
  * build  — hash-cached g++ compilation of native/*.cpp
  * wav    — decode / resample / batch-load bindings

Importing `wav` raises ImportError when no C++ toolchain is available, and
callers (audio.py, mtl/dataset.py) fall back to the pure-Python path.
"""
