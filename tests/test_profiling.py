"""StepTimer / trace observability hooks (utils/profiling.py)."""

import time

from asr_ttl_mtl_tpu.utils.profiling import StepTimer, trace


class TestStepTimer:
    def test_warmup_excluded_and_throughput(self):
        t = StepTimer(n_chips=2, warmup_steps=1)
        for _ in range(4):
            with t.step(samples=8, audio_seconds=240.0):
                time.sleep(0.01)
        s = t.summary()
        assert s["steps"] == 3  # first step dropped as warmup
        assert s["mean_step_s"] >= 0.01
        assert s["samples_per_s"] > 0
        # per-chip = total / n_chips
        assert abs(s["audio_sec_per_sec_per_chip"] * 2 - s["audio_sec_per_sec"]) < 1e-9

    def test_empty_summary(self):
        assert StepTimer().summary() == {"steps": 0}

    def test_reset(self):
        t = StepTimer(warmup_steps=0)
        with t.step(samples=1):
            pass
        t.reset()
        assert t.summary() == {"steps": 0}


class TestTrace:
    def test_noop_without_logdir(self):
        with trace(None):
            pass
        with trace(""):
            pass

    def test_real_trace_writes_files(self, tmp_path):
        import jax.numpy as jnp

        with trace(str(tmp_path)):
            jnp.ones((8,)).sum().block_until_ready()
        assert any(tmp_path.rglob("*")), "profiler wrote nothing"
