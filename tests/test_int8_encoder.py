"""int8 (W8A8) encoder serving mode (`DecodingOptions.int8_encoder`).

The mode runs each encoder block's six projections as dynamically-quantized
int8 matmuls (models/whisper.py `linear_i8`) for 2x MXU throughput on TPU.
It is approximate by construction; these tests pin the approximation error
at the op, encoder, and end-to-end decode levels on CPU, and that the option
threads through every program builder (greedy fused/split, beam, dp mesh).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
from asr_ttl_mtl_tpu.models import whisper as W
from asr_ttl_mtl_tpu.models.dims import ModelDimensions
from asr_ttl_mtl_tpu.models.registry import from_random

DIMS = ModelDimensions(
    n_mels=80,
    n_audio_ctx=96,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=51865,
    n_text_ctx=96,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


def _mel(batch=2, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.randn(batch, DIMS.n_mels, DIMS.n_audio_ctx * 2) * 0.5).astype(
        np.float32
    )


class TestQuantHelpers:
    def test_rowwise_roundtrip_error_bounded(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(8, 64).astype(np.float32) * 3.0)
        q, s = W._quant_rowwise_sym(x)
        assert q.dtype == jnp.int8
        back = np.asarray(q, np.float32) * np.asarray(s)
        # symmetric 127-level quantization: error <= scale/2 per element
        bound = np.broadcast_to(np.asarray(s) / 2 + 1e-7, back.shape)
        np.testing.assert_array_less(np.abs(back - np.asarray(x)), bound)

    def test_colwise_scales_per_output(self):
        rng = np.random.RandomState(1)
        w = rng.randn(64, 32).astype(np.float32)
        w[:, 5] *= 100.0  # an outlier column must not poison the others
        q, s = W._quant_colwise_sym(jnp.asarray(w))
        assert s.shape == (1, 32)
        back = np.asarray(q, np.float32) * np.asarray(s)
        rel = np.abs(back - w).max(axis=0) / np.abs(w).max(axis=0)
        assert rel.max() < 1e-2

    def test_linear_i8_matches_linear(self):
        rng = np.random.RandomState(2)
        p = {
            "w": jnp.asarray(rng.randn(64, 48).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.randn(48).astype(np.float32) * 0.1),
        }
        x = jnp.asarray(rng.randn(4, 10, 64).astype(np.float32))
        want = np.asarray(W.linear(p, x))
        got = np.asarray(W.linear_i8(p, x))
        denom = np.abs(want).mean() + 1e-6
        assert np.abs(got - want).mean() / denom < 2e-2


class TestEncoderInt8:
    def test_features_close_to_fp32(self):
        model = from_random(DIMS, seed=3)
        mel = jnp.asarray(_mel())
        ref = np.asarray(W.encoder_apply(model.params, DIMS, mel))
        got = np.asarray(
            W.encoder_apply(model.params, DIMS, mel, int8_linears=True)
        )
        # post-LN features: per-element scale ~1; quant noise stays small
        err = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-6)
        assert err < 5e-2, err
        cos = (got * ref).sum() / (
            np.linalg.norm(got) * np.linalg.norm(ref) + 1e-9
        )
        assert cos > 0.999, cos


class TestDecodeThreading:
    def _decode(self, model, **opt_kw):
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=8, fp16=False,
            **opt_kw,
        )
        return DecodingTask(model, opts).run(jnp.asarray(_mel()))

    def test_greedy_fused_runs_and_is_close(self):
        model = from_random(DIMS, seed=4)
        base = self._decode(model)
        quant = self._decode(model, int8_encoder=True)
        assert len(base) == len(quant) == 2
        # random weights = near-uniform logits (worst case): sequences may
        # drift, but the no-speech probability (a softmax over the first
        # forward) must stay close
        for b, q in zip(base, quant):
            assert abs(b.no_speech_prob - q.no_speech_prob) < 0.05

    def test_greedy_split_mode_runs(self):
        model = from_random(DIMS, seed=4)
        res = self._decode(model, int8_encoder=True, fuse_encoder=False)
        assert len(res) == 2 and all(len(r.tokens) > 0 for r in res)

    def test_beam_runs(self):
        model = from_random(DIMS, seed=5)
        res = self._decode(model, int8_encoder=True, beam_size=2)
        assert len(res) == 2 and all(len(r.tokens) > 0 for r in res)

    def test_kv_quant_composes(self):
        model = from_random(DIMS, seed=6)
        res = self._decode(model, int8_encoder=True, kv_quant=True)
        assert len(res) == 2 and all(len(r.tokens) > 0 for r in res)


class TestMeshThreading:
    def test_dp_greedy_accepts_flag(self):
        import jax

        from asr_ttl_mtl_tpu.parallel.mesh import create_mesh
        from asr_ttl_mtl_tpu.parallel.serving import decode_batched_dp

        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        model = from_random(DIMS, seed=7)
        mesh = create_mesh((2, 1))
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=8, fp16=False,
            int8_encoder=True,
        )
        res = decode_batched_dp(model, jnp.asarray(_mel(4)), opts, mesh=mesh)
        assert len(res) == 4

    def test_tp_greedy_accepts_flag(self):
        import jax

        from asr_ttl_mtl_tpu.parallel.mesh import create_mesh
        from asr_ttl_mtl_tpu.parallel.serving import decode_batched_dp

        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh")
        model = from_random(DIMS, seed=8)
        mesh = create_mesh((1, 2))  # tp=2 -> pjit builder path
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=8, fp16=False,
            int8_encoder=True,
        )
        res = decode_batched_dp(model, jnp.asarray(_mel(2)), opts, mesh=mesh)
        assert len(res) == 2
