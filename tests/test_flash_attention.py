"""Pallas flash-attention kernel vs the plain einsum+softmax reference path.

Runs the kernel in interpret mode on CPU (the tests' forced platform); the
same code compiles via Mosaic on TPU. Mirrors the numerics contract of
models/whisper.py:qkv_attention (reference whisper/model.py:114-139).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention, flash_attention_bhtd


def reference_attention(q, k, v, causal=False, q_offset=0, kv_valid_len=None):
    tq, tk = q.shape[1], k.shape[1]
    s = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32)
    mask = jnp.ones((tq, tk), bool)
    if kv_valid_len is not None:
        mask &= jnp.arange(tk)[None, :] < kv_valid_len
    if causal:
        mask &= jnp.arange(tk)[None, :] <= (q_offset + jnp.arange(tq))[:, None]
    s = jnp.where(mask[None], s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", w, v.astype(jnp.float32))


def run_case(bh, tq, tk, d, seed=0, **kwargs):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(bh, tq, d).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.randn(bh, tk, d).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.randn(bh, tk, d).astype(np.float32))
    got = flash_attention(q, k, v, interpret=True, **kwargs)
    want = reference_attention(q, k, v, **{
        key: val for key, val in kwargs.items() if key not in ("block_q", "block_k")
    })
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


class TestFlashAttention:
    def test_no_mask_aligned(self):
        run_case(2, 256, 512, 64, block_q=128, block_k=256)

    def test_no_mask_unaligned_lengths(self):
        # encoder shape: 1500 isn't a block multiple — padded tail keys masked
        run_case(2, 300, 300, 64, block_q=128, block_k=128)

    def test_kv_valid_len(self):
        run_case(2, 128, 384, 64, kv_valid_len=301, block_q=128, block_k=128)

    def test_causal(self):
        run_case(2, 256, 256, 64, causal=True, block_q=128, block_k=128)

    def test_causal_offset(self):
        # prefill into a longer KV buffer: queries at absolute [5, 5+64)
        run_case(2, 64, 448, 64, causal=True, q_offset=5, block_q=128, block_k=128)

    def test_causal_offset_unaligned(self):
        run_case(1, 37, 448, 64, causal=True, q_offset=11, block_q=128, block_k=128)

    def test_single_kblock(self):
        run_case(3, 128, 128, 64, block_q=128, block_k=128)

    def test_bf16_inputs(self):
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(2, 256, 64).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(rng.randn(2, 256, 64).astype(np.float32)).astype(jnp.bfloat16)
        v = jnp.asarray(rng.randn(2, 256, 64).astype(np.float32)).astype(jnp.bfloat16)
        got = flash_attention(q, k, v, interpret=True)
        want = reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
        )
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=3e-2, rtol=3e-2
        )

    def test_bhtd_wrapper(self):
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(2, 4, 128, 64).astype(np.float32))
        k = jnp.asarray(rng.randn(2, 4, 256, 64).astype(np.float32))
        v = jnp.asarray(rng.randn(2, 4, 256, 64).astype(np.float32))
        got = flash_attention_bhtd(q, k, v, interpret=True)
        want = reference_attention(
            q.reshape(8, 128, 64), k.reshape(8, 256, 64), v.reshape(8, 256, 64)
        ).reshape(2, 4, 128, 64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def test_whisper_encoder_shape(self):
        # the real encoder case: Tq = Tk = 1500, d = 64
        run_case(1, 1500, 1500, 64, seed=3, block_q=256, block_k=512)


class TestFlashMH:
    """Natural-layout multi-head kernel (flash_attention_mh): per-head lane
    slices of (B, T, D) inputs must match head-split flash / einsum exactly."""

    def _inputs(self, b=2, tq=256, tk=256, h=4, dh=64, seed=7, dtype=np.float32):
        rng = np.random.RandomState(seed)
        d = h * dh
        q = jnp.asarray(rng.randn(b, tq, d).astype(dtype) * 0.3)
        k = jnp.asarray(rng.randn(b, tk, d).astype(dtype) * 0.3)
        v = jnp.asarray(rng.randn(b, tk, d).astype(dtype))
        return q, k, v

    @staticmethod
    def _reference_mh(q, k, v, n_head, kv_valid_len=None, scale=1.0):
        b, tq, d = q.shape
        tk = k.shape[1]
        dh = d // n_head
        split = lambda x, t: x.reshape(b, t, n_head, dh).transpose(0, 2, 1, 3).reshape(
            b * n_head, t, dh
        )
        out = reference_attention(
            split(q * scale**0.5, tq), split(k * scale**0.5, tk), split(v, tk),
            kv_valid_len=kv_valid_len,
        )
        return out.reshape(b, n_head, tq, dh).transpose(0, 2, 1, 3).reshape(b, tq, d)

    def test_matches_headsplit_reference(self):
        from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention_mh

        q, k, v = self._inputs()
        got = flash_attention_mh(q, k, v, n_head=4, scale=0.125, interpret=True)
        want = self._reference_mh(q, k, v, 4, scale=0.125)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def test_kv_valid_len_and_unaligned_tq(self):
        # the encoder case scaled down: unaligned Tq/Tk, masked key tail
        from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention_mh

        q, k, v = self._inputs(tq=300, tk=300, seed=8)
        got = flash_attention_mh(
            q, k, v, n_head=4, kv_valid_len=277, scale=0.125, interpret=True
        )
        want = self._reference_mh(q, k, v, 4, kv_valid_len=277, scale=0.125)
        assert got.shape == q.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def test_bf16(self):
        from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention_mh

        q, k, v = self._inputs(seed=9)
        got = flash_attention_mh(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            n_head=4, scale=0.125, interpret=True,
        )
        want = self._reference_mh(q, k, v, 4, scale=0.125)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want), atol=3e-2, rtol=3e-2
        )

    def test_wide_model_block_q(self):
        # d=768 (small encoder) takes the narrow block_q=64 default (the
        # 128-wide block overflows scoped VMEM on chip at this width) —
        # exercise that branch's padding/masking with an unaligned Tq
        from asr_ttl_mtl_tpu.ops.flash_attention import (
            flash_attention_mh, mh_flash_eligible,
        )

        assert mh_flash_eligible(1500, 1500, 768, 12, causal=False)  # small
        q, k, v = self._inputs(tq=200, tk=256, h=12, dh=64, seed=11)
        got = flash_attention_mh(
            q, k, v, n_head=12, kv_valid_len=230, scale=0.125, interpret=True
        )
        want = self._reference_mh(q, k, v, 12, kv_valid_len=230, scale=0.125)
        assert got.shape == q.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def test_eligibility_gate(self):
        from asr_ttl_mtl_tpu.ops.flash_attention import mh_flash_eligible

        assert mh_flash_eligible(1536, 1536, 512, 8, causal=False)   # base encoder
        assert not mh_flash_eligible(1536, 1536, 512, 8, causal=True)
        assert not mh_flash_eligible(1536, 1536, 1280, 20, causal=False)  # large: D > cap
        assert not mh_flash_eligible(1536, 4096, 512, 8, causal=False)    # keys too long
        assert not mh_flash_eligible(4, 1536, 512, 8, causal=False)       # tiny Tq

    def test_vjp_grads_match_einsum_autodiff(self):
        """flash_attention_mh_vjp primal = mh kernel, grads = head-split
        flash backward; both must match plain einsum autodiff."""
        from jax.experimental.pallas import tpu as pltpu

        from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention_mh_vjp

        q, k, v = self._inputs(b=1, tq=64, tk=96, h=2, dh=64, seed=10)

        def ref_loss(q, k, v):
            out = self._reference_mh(q, k, v, 2, scale=0.125)
            return jnp.sum(out * jnp.cos(out))

        def mh_loss(q, k, v):
            out = flash_attention_mh_vjp(q, k, v, 2, None, 0.125)
            return jnp.sum(out * jnp.cos(out))

        with pltpu.force_tpu_interpret_mode():
            f_val, f_grads = jax.value_and_grad(mh_loss, argnums=(0, 1, 2))(q, k, v)
        r_val, r_grads = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(f_val), float(r_val), rtol=1e-5)
        for fg, rg, name in zip(f_grads, r_grads, "qkv"):
            np.testing.assert_allclose(
                np.asarray(fg), np.asarray(rg), atol=1e-4, rtol=1e-4,
                err_msg=f"d{name} mismatch",
            )


class TestFlashVJP:
    """flash_attention_vjp: Pallas forward + hand-written backward must match
    einsum autodiff (this is the path TPU training takes)."""

    def _inputs(self, seed=0, bh=2, tq=64, tk=96, d=64):
        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(bh, tq, d).astype(np.float32) * 0.3)
        k = jnp.asarray(rng.randn(bh, tk, d).astype(np.float32) * 0.3)
        v = jnp.asarray(rng.randn(bh, tk, d).astype(np.float32))
        return q, k, v

    @pytest.mark.parametrize("causal,scale", [(False, 1.0), (True, 0.125), (False, 0.125)])
    def test_grads_match_einsum_autodiff(self, causal, scale):
        from jax.experimental.pallas import tpu as pltpu

        from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention_vjp

        q, k, v = self._inputs()
        tq, tk = q.shape[1], k.shape[1]

        def ref_loss(q, k, v):
            s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
            if causal:
                mask = jnp.arange(tk)[None, :] <= jnp.arange(tq)[:, None]
                s = jnp.where(mask[None], s, -jnp.inf)
            w = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum("bqk,bkd->bqd", w, v)
            return jnp.sum(out * jnp.cos(out))  # nontrivial cotangent

        def flash_loss(q, k, v):
            out = flash_attention_vjp(q, k, v, causal, 0, None, scale)
            return jnp.sum(out * jnp.cos(out))

        with pltpu.force_tpu_interpret_mode():
            f_val, f_grads = jax.value_and_grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
        r_val, r_grads = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

        np.testing.assert_allclose(float(f_val), float(r_val), rtol=1e-5)
        for fg, rg, name in zip(f_grads, r_grads, "qkv"):
            np.testing.assert_allclose(
                np.asarray(fg), np.asarray(rg), atol=1e-4, rtol=1e-4,
                err_msg=f"d{name} mismatch",
            )

    @pytest.mark.parametrize("tq,tk", [(37, 300), (130, 257)])
    def test_grads_with_padded_tails(self, tq, tk):
        """Unaligned lengths: padded q rows must not leak into dk/dv and
        padded k columns must not leak into dq."""
        from jax.experimental.pallas import tpu as pltpu

        from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention_vjp

        q, k, v = self._inputs(seed=3, tq=tq, tk=tk)

        def ref_loss(q, k, v):
            s = jnp.einsum("bqd,bkd->bqk", q, k) * 0.125
            w = jax.nn.softmax(s, axis=-1)
            return jnp.sum(jnp.einsum("bqk,bkd->bqd", w, v) ** 2)

        def flash_loss(q, k, v):
            out = flash_attention_vjp(q, k, v, False, 0, None, 0.125)
            return jnp.sum(out ** 2)

        with pltpu.force_tpu_interpret_mode():
            f_grads = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
        r_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for fg, rg in zip(f_grads, r_grads):
            np.testing.assert_allclose(np.asarray(fg), np.asarray(rg), atol=1e-4)

    def test_grads_with_kv_valid_len(self):
        from jax.experimental.pallas import tpu as pltpu

        from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention_vjp

        q, k, v = self._inputs(seed=4, tq=64, tk=128)
        valid = 101

        def ref_loss(q, k, v):
            s = jnp.einsum("bqd,bkd->bqk", q, k) * 0.125
            s = jnp.where(jnp.arange(128)[None, None, :] < valid, s, -jnp.inf)
            w = jax.nn.softmax(s, axis=-1)
            return jnp.sum(jnp.sin(jnp.einsum("bqk,bkd->bqd", w, v)))

        def flash_loss(q, k, v):
            return jnp.sum(jnp.sin(flash_attention_vjp(q, k, v, False, 0, valid, 0.125)))

        with pltpu.force_tpu_interpret_mode():
            f_grads = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
        r_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for fg, rg in zip(f_grads, r_grads):
            np.testing.assert_allclose(np.asarray(fg), np.asarray(rg), atol=1e-4)
        # masked-out keys must receive exactly zero gradient
        assert np.all(np.asarray(f_grads[1])[:, valid:] == 0)
        assert np.all(np.asarray(f_grads[2])[:, valid:] == 0)


class TestMHNaturalBackward:
    """Head-pair (h2) training kernels via flash_attention_mh_vjp: lane-
    tile-sliced fwd(lse)+dq/dkv over (B, T, D) must match einsum autodiff —
    no head-split relayouts anywhere."""

    def _inputs(self, b=2, tq=256, tk=256, h=4, dh=64, seed=20, dtype=np.float32):
        rng = np.random.RandomState(seed)
        d = h * dh
        q = jnp.asarray(rng.randn(b, tq, d).astype(dtype) * 0.3)
        k = jnp.asarray(rng.randn(b, tk, d).astype(dtype) * 0.3)
        v = jnp.asarray(rng.randn(b, tk, d).astype(dtype))
        return q, k, v

    @staticmethod
    def _ref_loss_fn(n_head, kv_valid_len, scale):
        def ref_loss(q, k, v):
            b, tq, d = q.shape
            tk = k.shape[1]
            dh = d // n_head
            qs = q.reshape(b, tq, n_head, dh)
            ks = k.reshape(b, tk, n_head, dh)
            vs = v.reshape(b, tk, n_head, dh)
            s = jnp.einsum("bqhd,bkhd->bhqk", qs, ks) * scale
            if kv_valid_len is not None:
                s = jnp.where(
                    jnp.arange(tk)[None, None, None, :] < kv_valid_len, s, -jnp.inf
                )
            w = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", w, vs).reshape(b, tq, d)
            return jnp.sum(out * jnp.cos(out))

        return ref_loss

    def _check(self, q, k, v, n_head, kv_valid_len=None, scale=0.125, atol=1e-4):
        from jax.experimental.pallas import tpu as pltpu

        from asr_ttl_mtl_tpu.ops.flash_attention import (
            flash_attention_mh_vjp, h2_eligible,
        )

        assert h2_eligible(q.shape[1], k.shape[1], q.shape[2], n_head)

        def mh_loss(q, k, v):
            out = flash_attention_mh_vjp(q, k, v, n_head, kv_valid_len, scale)
            return jnp.sum(out * jnp.cos(out))

        with pltpu.force_tpu_interpret_mode():
            f_val, f_grads = jax.value_and_grad(mh_loss, argnums=(0, 1, 2))(q, k, v)
        ref_loss = self._ref_loss_fn(n_head, kv_valid_len, scale)
        r_val, r_grads = jax.value_and_grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(f_val), float(r_val), rtol=1e-5)
        for fg, rg, name in zip(f_grads, r_grads, "qkv"):
            np.testing.assert_allclose(
                np.asarray(fg), np.asarray(rg), atol=atol, rtol=1e-4,
                err_msg=f"d{name} mismatch",
            )
        return f_grads

    def test_aligned(self):
        q, k, v = self._inputs()
        self._check(q, k, v, n_head=4)

    def test_encoder_shape_small(self):
        # 1500-key geometry scaled down batch-wise: unaligned tk -> padded tail
        q, k, v = self._inputs(b=1, tq=375, tk=375, h=6, seed=21)
        self._check(q, k, v, n_head=6)

    def test_cross_attention_shape(self):
        # teacher-forced cross-attn: short queries against long keys
        q, k, v = self._inputs(b=2, tq=48, tk=300, seed=22)
        self._check(q, k, v, n_head=4)

    def test_kv_valid_len_zero_grad_on_tail(self):
        q, k, v = self._inputs(b=1, tq=130, tk=257, seed=23)
        f_grads = self._check(q, k, v, n_head=4, kv_valid_len=201)
        assert np.all(np.asarray(f_grads[1])[:, 201:] == 0)
        assert np.all(np.asarray(f_grads[2])[:, 201:] == 0)

    def test_bf16(self):
        q, k, v = self._inputs(seed=24)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        from jax.experimental.pallas import tpu as pltpu

        from asr_ttl_mtl_tpu.ops.flash_attention import flash_attention_mh_vjp

        def mh_loss(q, k, v):
            out = flash_attention_mh_vjp(q, k, v, 4, None, 0.125)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        with pltpu.force_tpu_interpret_mode():
            f_grads = jax.grad(mh_loss, argnums=(0, 1, 2))(qb, kb, vb)
        r_grads = jax.grad(
            lambda q, k, v: jnp.sum(
                self._ref_loss_and_out(q, k, v, 4, 0.125) ** 2
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
        for fg, rg in zip(f_grads, r_grads):
            np.testing.assert_allclose(
                np.asarray(fg, dtype=np.float32), np.asarray(rg), atol=0.12, rtol=0.12
            )

    @staticmethod
    def _ref_loss_and_out(q, k, v, n_head, scale):
        b, tq, d = q.shape
        tk = k.shape[1]
        dh = d // n_head
        qs = q.reshape(b, tq, n_head, dh)
        ks = k.reshape(b, tk, n_head, dh)
        vs = v.reshape(b, tk, n_head, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", qs, ks) * scale
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", w, vs).reshape(b, tq, d)

    def test_eligibility_gate(self):
        from asr_ttl_mtl_tpu.ops.flash_attention import h2_eligible

        assert h2_eligible(1536, 1536, 384, 6)   # tiny encoder
        assert h2_eligible(1536, 1536, 512, 8)   # base encoder
        assert h2_eligible(48, 1500, 512, 8)     # base cross-attn
        assert h2_eligible(1536, 1536, 768, 12)  # small encoder
        assert h2_eligible(1536, 1536, 1280, 20)  # large: D-independent VMEM
        assert not h2_eligible(1536, 1536, 192, 3)  # D not a lane-tile multiple
        assert not h2_eligible(4, 1536, 512, 8)     # tiny Tq

    @pytest.mark.parametrize("h", [12, 20])
    def test_wide_model_grads(self, h):
        """d=768 (small) and d=1280 (large) — the h2 kernels' VMEM footprint
        is D-independent (per-program k/v is (tk, 128)), so wide models get
        the natural-layout training path too."""
        q, k, v = self._inputs(b=1, tq=64, tk=200, h=h, seed=30 + h)
        self._check(q, k, v, n_head=h)
