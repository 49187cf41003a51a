"""Chunked softmax cross-entropy (ops/chunked_xent.py): value, argmax, and
gradient parity vs the materialized-logits path it replaces, including the
multi-chunk + row-padding geometry and bf16 compute."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_ttl_mtl_tpu.ops.chunked_xent import chunked_softmax_xent

_F32 = jnp.float32


def _materialized(hidden, embed, targets, ignore_index=-100):
    """The exact computation chunked_softmax_xent replaces
    (models/whisper.py decoder_apply tail + trainer.cross_entropy_ignore_index)."""
    logits = jnp.matmul(
        hidden, embed.T.astype(hidden.dtype), preferred_element_type=_F32
    )
    valid = targets != ignore_index
    safe_t = jnp.where(valid, targets, 0)
    logprobs = jax.nn.log_softmax(logits.astype(_F32), axis=-1)
    token_lp = jnp.take_along_axis(logprobs, safe_t[..., None], axis=-1)[..., 0]
    token_loss = jnp.where(valid, -token_lp, 0.0)
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return token_loss, preds


def _rand(b, t, d, v, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    hidden = (rng.standard_normal((b, t, d)) * 0.5).astype(dtype)
    embed = (rng.standard_normal((v, d)) * 0.1).astype(np.float32)
    targets = rng.integers(0, v, (b, t)).astype(np.int32)
    # sprinkle ignore_index like the -100 target padding
    mask = rng.random((b, t)) < 0.25
    targets = np.where(mask, -100, targets)
    return jnp.asarray(hidden), jnp.asarray(embed), jnp.asarray(targets)


@pytest.mark.quick
@pytest.mark.parametrize("row_chunk", [64, 512])
def test_value_and_preds_match_materialized(row_chunk):
    # b*t = 96 rows: row_chunk=64 -> 2 chunks with 32 rows of padding;
    # row_chunk=512 -> single unpadded chunk
    hidden, embed, targets = _rand(8, 12, 32, 257)
    loss_c, preds_c = chunked_softmax_xent(
        hidden, embed, targets, row_chunk=row_chunk
    )
    loss_m, preds_m = _materialized(hidden, embed, targets)
    np.testing.assert_allclose(np.asarray(loss_c), np.asarray(loss_m),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(preds_c), np.asarray(preds_m))


@pytest.mark.quick
def test_grads_match_materialized_f32():
    hidden, embed, targets = _rand(4, 24, 48, 311, seed=1)

    def loss_chunked(h, w):
        tl, _ = chunked_softmax_xent(h, w, targets, row_chunk=32)
        cnt = (targets != -100).sum()
        return tl.sum() / jnp.maximum(cnt, 1)

    def loss_mat(h, w):
        tl, _ = _materialized(h, w, targets)
        cnt = (targets != -100).sum()
        return tl.sum() / jnp.maximum(cnt, 1)

    (vc, gc) = jax.value_and_grad(loss_chunked, argnums=(0, 1))(hidden, embed)
    (vm, gm) = jax.value_and_grad(loss_mat, argnums=(0, 1))(hidden, embed)
    np.testing.assert_allclose(float(vc), float(vm), rtol=1e-6)
    for a, b in zip(gc, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.quick
def test_grads_bf16_hidden_close_to_f32_reference():
    """bf16 hidden states (the TPU training dtype): the chunked path's f32
    chunk math must stay within bf16 resolution of the all-f32 reference."""
    hidden, embed, targets = _rand(4, 16, 32, 203, seed=2)
    hb = hidden.astype(jnp.bfloat16)

    def loss_chunked(h, w):
        tl, _ = chunked_softmax_xent(h, w, targets, row_chunk=64)
        return tl.sum() / jnp.maximum((targets != -100).sum(), 1)

    def loss_ref(h, w):
        tl, _ = _materialized(h.astype(jnp.bfloat16), w, targets)
        return tl.sum() / jnp.maximum((targets != -100).sum(), 1)

    vc, gc = jax.value_and_grad(loss_chunked, argnums=(0, 1))(hb, embed)
    vm, gm = jax.value_and_grad(loss_ref, argnums=(0, 1))(hidden, embed)
    np.testing.assert_allclose(float(vc), float(vm), rtol=1e-2)
    assert gc[0].dtype == jnp.bfloat16  # cotangent in the hidden dtype
    np.testing.assert_allclose(
        np.asarray(gc[1]), np.asarray(gm[1]), rtol=0.05, atol=1e-4
    )


@pytest.mark.quick
def test_all_ignored_rows_zero():
    hidden, embed, _ = _rand(2, 8, 16, 101, seed=3)
    targets = jnp.full((2, 8), -100, jnp.int32)

    def loss(h, w):
        tl, _ = chunked_softmax_xent(h, w, targets, row_chunk=8)
        return tl.sum()

    v, g = jax.value_and_grad(loss, argnums=(0, 1))(hidden, embed)
    assert float(v) == 0.0
    assert float(jnp.abs(g[0]).max()) == 0.0
    assert float(jnp.abs(g[1]).max()) == 0.0


def test_trainer_chunked_vs_materialized_step(tmp_path):
    """One full f32 train step with chunked_ce on vs off: same loss and
    near-identical updated params (reduction-order-level differences only)."""
    from asr_ttl_mtl_tpu.mtl import DataLoader, MultiTaskSpeechDataset, MultiTaskTrainer
    from test_mtl import _config, _write_dataset

    csv = _write_dataset(tmp_path)
    results = {}
    for mode in (False, True):
        cfg = _config(tmp_path, csv, epochs=1, chunked_ce=mode, seed=0)
        tr = MultiTaskTrainer(cfg, verbose=False)
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=4, num_workers=2,
                            buckets=cfg.token_buckets)
        m = tr.train_epoch(loader, epoch=0)
        results[mode] = (m["loss"], jax.tree.leaves(tr._trainable()))
    loss_off, leaves_off = results[False]
    loss_on, leaves_on = results[True]
    assert loss_on == pytest.approx(loss_off, rel=1e-5)
    for a, b in zip(leaves_on, leaves_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
