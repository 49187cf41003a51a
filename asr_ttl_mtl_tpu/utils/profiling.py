"""Tracing / profiling hooks (SURVEY.md §5: the reference has none beyond
tqdm bars — this is the TPU-native observability layer the rebuild adds).

* `trace(logdir)`   — context manager around jax.profiler (XLA/TPU trace
                      viewable in TensorBoard / Perfetto)
* `annotate(name)`  — host-side named span that shows up inside the trace
* `StepTimer`       — step-time + throughput (samples/s, audio-sec/sec/chip)
                      accumulator used by the trainer and serving loops
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace scope; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host span, nested inside an active jax.profiler trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Accumulates per-step wall times and derived throughput.

    Usage:
        timer = StepTimer(n_chips=jax.device_count())
        with timer.step(samples=B, audio_seconds=B * 30.0):
            ... run one step ...
        print(timer.summary())
    """

    n_chips: int = 1
    warmup_steps: int = 1  # skip compile-dominated first step(s)
    _times: List[float] = field(default_factory=list)
    _samples: List[int] = field(default_factory=list)
    _audio_seconds: List[float] = field(default_factory=list)
    _seen: int = 0

    @contextlib.contextmanager
    def step(self, samples: int = 0, audio_seconds: float = 0.0, n_steps: int = 1):
        """Time a dispatch covering `n_steps` optimizer steps; the recorded
        distribution is always per-step so fused (lax.scan) and single-step
        dispatches produce comparable mean/p50 numbers."""
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen <= self.warmup_steps:
            return
        n_steps = max(1, n_steps)
        self._times.extend([dt / n_steps] * n_steps)
        self._samples.append(samples)
        self._audio_seconds.append(audio_seconds)

    @property
    def steps(self) -> int:
        return len(self._times)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        total = sum(self._times)
        times = sorted(self._times)
        out = {
            "steps": len(times),
            "mean_step_s": total / len(times),
            "p50_step_s": times[len(times) // 2],
            "p90_step_s": times[int(len(times) * 0.9)],
        }
        if sum(self._samples):
            out["samples_per_s"] = sum(self._samples) / total
        if sum(self._audio_seconds):
            out["audio_sec_per_sec"] = sum(self._audio_seconds) / total
            out["audio_sec_per_sec_per_chip"] = out["audio_sec_per_sec"] / max(1, self.n_chips)
        return out

    def reset(self) -> None:
        self._times.clear()
        self._samples.clear()
        self._audio_seconds.clear()
        self._seen = 0
