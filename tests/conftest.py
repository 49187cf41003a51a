"""Test configuration.

All tests run on CPU with 8 virtual XLA devices so sharding/pjit paths are
exercised without TPU hardware (the standard TPU-less testing recipe).
This must run before jax initializes its backends, hence env vars here.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax at interpreter startup (to register
# the axon TPU plugin), which snapshots JAX_PLATFORMS before this file runs —
# so the env var alone is not enough; force the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def import_reference_whisper():
    """Import the reference torch implementation as a numerical oracle.

    The reference imports numba/triton at module scope; neither is installed,
    so stub just enough for CPU-path usage (numba.jit is a no-op decorator).
    """
    import types

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def _jit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]
            return lambda f: f

        numba.jit = _jit
        sys.modules["numba"] = numba
    if "jiwer" not in sys.modules:
        # the reference's speech_disorder package imports jiwer at module
        # scope; provide our own (semantics-compatible) WER/CER
        from asr_ttl_mtl_tpu.mtl import metrics as _m

        jiwer = types.ModuleType("jiwer")
        jiwer.wer = lambda refs, hyps: _m.wer(
            refs if isinstance(refs, list) else [refs],
            hyps if isinstance(hyps, list) else [hyps],
        )
        jiwer.cer = lambda refs, hyps: _m.cer(
            refs if isinstance(refs, list) else [refs],
            hyps if isinstance(hyps, list) else [hyps],
        )
        sys.modules["jiwer"] = jiwer
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import whisper  # noqa: F401

    return whisper


# ---------------------------------------------------------------------------
# test tiers (pytest.ini markers)
#
# `-m quick`: a <5-minute smoke set covering every package top-level —
# whole fast modules below, plus tests/test_quick_smoke.py which holds one
# tiny-dims test per subsystem whose full module is too heavy for the tier.
# `-m "not heavy"` skips the multi-minute mesh/fuzz/convergence suites.
# ---------------------------------------------------------------------------

_QUICK_MODULES = {
    "test_quick_smoke",
    "test_tokenizer",
    "test_normalizers",
    "test_audio",
    "test_timing",
    "test_decoding_options",
    "test_native_runtime",
    "test_profiling",
    "test_pallas_dtw",
    "test_pallas_median",
    "test_review_fixes",
}

_HEAVY_MODULES = {
    "test_mtl_convergence",
    "test_parallel",
    "test_parallel_hardening",
    "test_dp_shard_map",
    "test_decoding_fuzz",
    "test_transcribe_fuzz",
    "test_tokenizer_sweep",
    "test_mtl",
    "test_scripts",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        mod = item.module.__name__
        if mod in _QUICK_MODULES:
            item.add_marker(_pytest.mark.quick)
        if mod in _HEAVY_MODULES:
            item.add_marker(_pytest.mark.heavy)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free each module's compiled executables when it finishes.

    The full single-process suite (~380 tests) accumulated enough XLA CPU
    executables that the compiler itself segfaulted ~40 min in (inside
    backend_compile_and_load while compiling test_parallel_hardening's tp
    program — reproducible only with the full history, not per tier).
    Modules share few programs, so per-module clearing costs little and
    keeps the compiler healthy."""
    yield
    import jax as _jax

    _jax.clear_caches()
