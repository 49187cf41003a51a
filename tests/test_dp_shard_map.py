"""shard_map data-parallel training path (mtl/trainer.py, dp_shard_map=True).

On a dp-only mesh the train/eval steps run under shard_map on LOCAL shapes —
the design that keeps the Pallas flash-attention kernels (and their fused
backward) live on multi-device meshes, mirroring parallel/serving.py's dp
decode path. These tests pin its equivalence to the GSPMD/pjit path on the
8-virtual-device mesh: the forward losses must be bit-identical, gradients
identical up to all-reduce summation order (GSPMD and the explicit psum may
reassociate the cross-device sum differently — a few fp32 ulps), and multi-
step training must track within accumulated ulp noise.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from asr_ttl_mtl_tpu.mtl import MultiTaskTrainer, TrainingConfig

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

AUDIO_SAMPLES = 64000

BASE_CFG = dict(
    model_size="tiny.en",
    pretrained="random",
    debug_dims=dict(
        n_mels=80, n_audio_ctx=AUDIO_SAMPLES // 320, n_audio_state=64,
        n_audio_head=4, n_audio_layer=2, n_vocab=51864, n_text_ctx=64,
        n_text_state=64, n_text_head=4, n_text_layer=2,
    ),
    audio_samples=AUDIO_SAMPLES,
    compute_dtype="float32",
    batch_size=16,
    seed=0,
    # these tests pin shard_map-vs-pjit equivalence with the CE algorithm
    # held constant; the pjit path has no chunked CE, so both run
    # materialized. Chunked-CE dp parity is tested separately below.
    chunked_ce=False,
)


def _make_batch(B, tok, seed=0):
    rng = np.random.RandomState(seed)
    seqs = []
    for i in range(B):
        seq = [tok.sot, list(tok.disease_tokens.values())[i % 3]]
        seq += tok.encode(" this is a dry run") + [tok.eot]
        seqs.append(seq)
    L = 32
    it = np.full((B, L), tok.eot, np.int32)
    tt = np.full((B, L), -100, np.int32)
    for i, s in enumerate(seqs):
        it[i, : len(s) - 1] = s[:-1]
        tt[i, : len(s) - 1] = s[1:]
    return {
        "audio": rng.randn(B, AUDIO_SAMPLES).astype(np.float32) * 0.05,
        "input_tokens": it,
        "target_tokens": tt,
        "classes": np.asarray([i % 3 for i in range(B)], np.int32),
    }


def _trainer(dp_shard_map, mesh_shape=(8, 1), **overrides):
    cfg = TrainingConfig(**{**BASE_CFG, **overrides}, mesh_shape=mesh_shape,
                         dp_shard_map=dp_shard_map)
    return MultiTaskTrainer(cfg, verbose=False)


def _run_steps(tr, batch, n_steps=3):
    dev, n_valid = tr._device_batch(batch)
    step_fn = tr._get_train_step()
    trainable, opt_state = tr._trainable(), tr.opt_state
    rng = jax.random.PRNGKey(7)
    losses = []
    aux = None
    for _ in range(n_steps):
        rng, sub = jax.random.split(rng)
        trainable, opt_state, loss, aux = step_fn(
            trainable, opt_state, dev["audio"], dev["input_tokens"],
            dev["target_tokens"], dev["classes"],
            jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
            sub, np.int32(n_valid),
        )
        losses.append(float(jax.block_until_ready(loss)))
    return losses, jax.device_get(trainable), jax.device_get(aux)


def test_path_selection():
    assert _trainer(True)._dp_shard_map is True
    assert _trainer(False)._dp_shard_map is False
    # tp > 1 always takes the pjit path (GSPMD has no Pallas rules)
    assert _trainer(True, mesh_shape=(4, 2))._dp_shard_map is False
    # "force" enables shard_map even on a 1-device mesh (timing validation)
    assert _trainer("force", mesh_shape=(1, 1))._dp_shard_map is True


def test_train_step_matches_pjit():
    """shard_map dp step vs GSPMD pjit step on the same data: first-step loss
    bit-identical, per-row aux identical, params within ulp accumulation.
    Uses n=14 of 16 rows so the dp-padding mask is exercised."""
    tr_sm = _trainer(True)
    batch = _make_batch(14, tr_sm.tokenizer)
    l_sm, p_sm, aux_sm = _run_steps(tr_sm, batch)
    tr_pj = _trainer(False)
    l_pj, p_pj, aux_pj = _run_steps(tr_pj, batch)

    assert l_sm[0] == l_pj[0]  # forward is bit-identical
    np.testing.assert_allclose(l_sm, l_pj, rtol=0, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p_sm), jax.tree.leaves(p_pj)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
    for k in ("disease_preds", "pred_tokens"):
        assert np.array_equal(np.asarray(aux_sm[k]), np.asarray(aux_pj[k])), k
    # dynamic loss weights come out of the same global losses
    np.testing.assert_allclose(
        float(aux_sm["alpha_eff"]), float(aux_pj["alpha_eff"]), atol=1e-6)


def test_scan_step_matches_single_steps():
    """The k-step fused scan under shard_map chains rng/updates exactly like
    k single shard_map dispatches."""
    tr_a = _trainer(True)
    batch = _make_batch(16, tr_a.tokenizer)
    k = 3

    # path A: three single-step dispatches
    losses_a, params_a, _ = _run_steps(tr_a, batch, n_steps=k)

    # path B: one fused k=3 scan dispatch over the stacked batch.
    # rng chaining differs between the two paths by construction (the scan
    # splits a carried key; the host splits between dispatches) — match it
    # by replicating the host's chain: scan body splits once per step from
    # the carried key, host code splits once per step from self._rng. Use
    # the same starting key and compare against a host-split reference run.
    tr_b = _trainer(True)
    dev, n_valid = tr_b._device_batch(batch)
    stacked = {
        key: jnp.stack([dev[key]] * k)
        for key in ("audio", "input_tokens", "target_tokens", "classes")
    }
    from asr_ttl_mtl_tpu.parallel import stacked_data_sharding

    stacked = {
        key: jax.device_put(v, stacked_data_sharding(tr_b.mesh, v.ndim))
        for key, v in stacked.items()
    }
    scan_fn = tr_b._get_train_scan_step(k)
    trainable, opt_state, rng_out, losses_b, auxs = scan_fn(
        tr_b._trainable(), tr_b.opt_state,
        stacked["audio"], stacked["input_tokens"], stacked["target_tokens"],
        stacked["classes"],
        jnp.asarray(0.0, jnp.float32), jnp.asarray(0.0, jnp.float32),
        jax.random.PRNGKey(7), np.asarray([16] * k, np.int32),
    )
    losses_b = np.asarray(losses_b)
    assert np.all(np.isfinite(losses_b))
    # the scan body chains (rng, sub) = split(rng) exactly like the host
    # does between single dispatches, so the trajectories coincide
    assert float(losses_b[0]) == losses_a[0]
    np.testing.assert_allclose(losses_b, losses_a, rtol=0, atol=1e-6)
    # per-row aux is stacked (k, B, ...) in global batch order
    assert np.asarray(auxs["pred_tokens"]).shape[:2] == (k, 16)


def test_eval_step_matches_pjit():
    tr_sm = _trainer(True)
    batch = _make_batch(14, tr_sm.tokenizer)
    out = {}
    for name, tr in (("sm", tr_sm), ("pj", _trainer(False))):
        dev, n_valid = tr._device_batch(batch)
        aux = tr._get_eval_step()(
            tr._trainable(), dev["audio"], dev["input_tokens"],
            dev["target_tokens"], dev["classes"],
            jnp.asarray(0.5, jnp.float32), jnp.asarray(0.5, jnp.float32),
            np.int32(n_valid),
        )
        out[name] = jax.device_get(aux)
    assert float(out["sm"]["combined"]) == float(out["pj"]["combined"])
    assert float(out["sm"]["cls_loss"]) == float(out["pj"]["cls_loss"])
    assert float(out["sm"]["trans_loss"]) == float(out["pj"]["trans_loss"])
    for k in ("disease_preds", "pred_tokens", "cls_per_row"):
        np.testing.assert_array_equal(
            np.asarray(out["sm"][k]), np.asarray(out["pj"][k]))


def test_epoch_level_equivalence():
    """Full train_epoch + evaluate through the public API on both paths:
    same data, same seeds -> metrics agree to ulp accumulation and the
    kernels-alive path trains (loss decreases)."""

    class Loader:
        def __init__(self, tok, n_batches=2):
            self.batches = [_make_batch(16, tok, seed=s) for s in range(n_batches)]

        def __iter__(self):
            for b in self.batches:
                yield {**b, "texts": [" this is a dry run"] * 16}

    metrics = {}
    for name, dsm in (("sm", True), ("pj", False)):
        tr = _trainer(dsm)
        loader = Loader(tr.tokenizer)
        m_train = tr.train_epoch(loader, epoch=0)
        m_val = tr.evaluate(loader)
        metrics[name] = (m_train, m_val)
    for key in ("loss", "cls_loss", "trans_loss", "alpha", "beta"):
        np.testing.assert_allclose(
            metrics["sm"][0][key], metrics["pj"][0][key], rtol=0, atol=1e-5,
            err_msg=f"train {key}")
        np.testing.assert_allclose(
            metrics["sm"][1].get(key, 0.0), metrics["pj"][1].get(key, 0.0),
            rtol=0, atol=1e-5, err_msg=f"val {key}")
    assert metrics["sm"][0]["disease_acc"] == metrics["pj"][0]["disease_acc"]


def test_chunked_ce_dp_parity():
    """Chunked CE under shard_map dp=8 vs a single-device ("force") chunked
    step on the same global batch: losses/params must agree to all-reduce
    reassociation noise — the chunked path's row flattening is per-shard, so
    dp must not change which rows see which chunk arithmetic."""
    tr_dp = _trainer(True, chunked_ce=True)
    assert tr_dp._use_chunked_ce()
    batch = _make_batch(16, tr_dp.tokenizer)
    l_dp, p_dp, aux_dp = _run_steps(tr_dp, batch)

    tr_1 = _trainer("force", mesh_shape=(1, 1), chunked_ce=True)
    assert tr_1._use_chunked_ce()
    l_1, p_1, aux_1 = _run_steps(tr_1, batch)

    np.testing.assert_allclose(l_dp, l_1, rtol=0, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
    assert np.array_equal(np.asarray(aux_dp["pred_tokens"]),
                          np.asarray(aux_1["pred_tokens"]))
