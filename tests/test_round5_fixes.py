"""Round-5 advisor-fix regression tests: fused-optimizer checkpoint
migration, window-store producer done-marking, and trainer kernel-switch
scoping."""

import numpy as np
import pytest

import jax

from asr_ttl_mtl_tpu.mtl import DataLoader, MultiTaskSpeechDataset, MultiTaskTrainer
from asr_ttl_mtl_tpu.models import whisper as W

from test_mtl import _config, _write_dataset


# ---------------------------------------------------------------------------
# per-leaf -> fused optimizer state migration (ADVICE r4: resuming an orbax
# checkpoint written by a pre-round-4 per-leaf run must not structurally fail)
# ---------------------------------------------------------------------------


@pytest.mark.quick
def test_per_leaf_resume_checkpoint_migrates_into_fused(tmp_path):
    csv = _write_dataset(tmp_path)
    cfg_old = _config(tmp_path, csv, epochs=1, fused_optimizer=False)
    tr_old = MultiTaskTrainer(cfg_old, verbose=False)
    ds = MultiTaskSpeechDataset(csv, cfg_old)
    loader = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg_old.token_buckets)
    tr_old.train(loader, loader)
    d = str(tmp_path / "old_resume")
    tr_old.save_resume_state(d, epoch=0, best_loss=1.0, patience_counter=0)

    # a fused-optimizer trainer restores the per-leaf checkpoint via migration
    cfg_new = _config(tmp_path, csv, epochs=1, fused_optimizer=True)
    tr_new = MultiTaskTrainer(cfg_new, verbose=False)
    from asr_ttl_mtl_tpu.mtl.fused_optim import FusedAdamWState

    assert isinstance(tr_new.opt_state, FusedAdamWState)
    meta = tr_new.restore_resume_state(d)
    assert meta["epoch"] == 0
    assert isinstance(tr_new.opt_state, FusedAdamWState)
    assert int(tr_new.opt_state.count) > 0  # carried the adam step count

    # the migrated state must equal packing the per-leaf mu/nu directly
    from asr_ttl_mtl_tpu.mtl.fused_optim import migrate_per_leaf_state

    expect = migrate_per_leaf_state(
        tr_new._optimizer_labels(), tr_new._optimizer_hparams(),
        tr_old._trainable(), jax.device_get(tr_old.opt_state),
    )
    for k in expect.m:
        np.testing.assert_array_equal(
            np.asarray(expect.m[k]), np.asarray(tr_new.opt_state.m[k]))
        np.testing.assert_array_equal(
            np.asarray(expect.v[k]), np.asarray(tr_new.opt_state.v[k]))

    # continuing the run is bit-identical to a per-leaf continuation
    # (fused AdamW is arithmetically identical — test_fused_optim.py)
    tr_pl = MultiTaskTrainer(cfg_old, verbose=False)
    tr_pl.restore_resume_state(d)
    loader_a = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg_old.token_buckets)
    loader_b = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg_old.token_buckets)
    tr_new.train_epoch(loader_a, epoch=1)
    tr_pl.train_epoch(loader_b, epoch=1)
    for a, b in zip(jax.tree.leaves(tr_new._trainable()),
                    jax.tree.leaves(tr_pl._trainable())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.quick
def test_incompatible_resume_state_names_escape_hatch(tmp_path):
    """A restore that matches neither structure raises the clear error."""
    csv = _write_dataset(tmp_path)
    cfg = _config(tmp_path, csv, epochs=1)
    tr = MultiTaskTrainer(cfg, verbose=False)
    d = str(tmp_path / "bogus")
    import json
    import os

    os.makedirs(os.path.join(d, "state"), exist_ok=True)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"epoch": 0, "best_loss": 1.0, "patience_counter": 0,
                   "alpha": 0.5, "beta": 0.5}, f)
    with pytest.raises(Exception):
        tr.restore_resume_state(d)


# ---------------------------------------------------------------------------
# window-store: producer under-production raises instead of hanging
# ---------------------------------------------------------------------------


@pytest.mark.quick
def test_window_store_finish_with_missing_windows_raises():
    from asr_ttl_mtl_tpu.transcribe import _WindowStore

    store = _WindowStore(program_b=2, n_mels=80, total=4)
    store.finish()  # producer exits cleanly having appended nothing
    with pytest.raises(RuntimeError, match="finished after 0 windows"):
        store._wait_for(1)


@pytest.mark.quick
def test_window_store_producer_failure_still_raises():
    from asr_ttl_mtl_tpu.transcribe import _WindowStore

    store = _WindowStore(program_b=2, n_mels=80, total=2)
    store.fail(ValueError("boom"))
    with pytest.raises(RuntimeError, match="producer failed"):
        store._wait_for(1)


# ---------------------------------------------------------------------------
# trainer kernel-switch scoping (ADVICE r4: construction must not mutate the
# module-global Pallas switches; pjit trainers scope them per call)
# ---------------------------------------------------------------------------


def test_trainer_construction_leaves_kernel_switches_alone(tmp_path):
    csv = _write_dataset(tmp_path)
    ambient = dict(W._FLASH)
    try:
        W.set_flash_attention(True)
        W.set_decode_kernel("auto")
        before = dict(W._FLASH)

        # tp=2 -> pjit path, which needs kernels off during ITS traces only
        cfg = _config(tmp_path, csv, epochs=1, mesh_shape=(2, 2))
        tr = MultiTaskTrainer(cfg, verbose=False)
        assert dict(W._FLASH) == before  # construction didn't stomp globals
        assert tr._kernel_scope_state == (False, "off")

        with tr._kernel_scope():
            assert W._FLASH["enabled"] is False
            assert W._FLASH["decode_kernel"] == "off"
        assert dict(W._FLASH) == before  # restored after the scope

        # a user's explicit kernels-off survives into a shard_map trainer
        W.set_kernels(False)
        cfg2 = _config(tmp_path, csv, epochs=1, mesh_shape=(2, 1))
        tr2 = MultiTaskTrainer(cfg2, verbose=False)
        assert tr2._kernel_scope_state == (False, "off")
    finally:
        W._FLASH.update(ambient)


def test_pjit_trainer_step_scopes_kernels_and_trains(tmp_path):
    """A tp=2 trainer's compiled step runs (kernels scoped off inside) and
    the ambient switches are untouched afterwards."""
    csv = _write_dataset(tmp_path)
    ambient = dict(W._FLASH)
    try:
        W.set_flash_attention(True)
        W.set_decode_kernel("auto")
        before = dict(W._FLASH)
        cfg = _config(tmp_path, csv, epochs=1, mesh_shape=(2, 2))
        tr = MultiTaskTrainer(cfg, verbose=False)
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=4, num_workers=2, buckets=cfg.token_buckets)
        metrics = tr.train_epoch(loader, epoch=0)
        assert np.isfinite(metrics["loss"])
        assert dict(W._FLASH) == before
    finally:
        W._FLASH.update(ambient)


# ---------------------------------------------------------------------------
# remat composes with chunked CE (base bs>=128's config on TPU): remat must
# be semantically identity — same loss, same updated params
# ---------------------------------------------------------------------------


def test_remat_composes_with_chunked_ce(tmp_path):
    from asr_ttl_mtl_tpu.mtl import DataLoader, MultiTaskSpeechDataset

    csv = _write_dataset(tmp_path)
    results = {}
    for remat in (False, True):
        cfg = _config(tmp_path, csv, epochs=1, remat=remat, chunked_ce=True)
        tr = MultiTaskTrainer(cfg, verbose=False)
        assert tr._use_remat() is remat
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=4, num_workers=2,
                            buckets=cfg.token_buckets)
        m = tr.train_epoch(loader, epoch=0)
        results[remat] = (m["loss"], jax.tree.leaves(tr._trainable()))
    assert results[True][0] == pytest.approx(results[False][0], rel=1e-6)
    for a, b in zip(results[True][1], results[False][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


# ---------------------------------------------------------------------------
# auto-remat policy: must account for resident train state (medium's 769M
# params + moments) — measured anchors from PERF.md rounds 4-5
# ---------------------------------------------------------------------------


def test_auto_remat_policy_anchors(tmp_path, monkeypatch):
    from asr_ttl_mtl_tpu.mtl import TrainingConfig

    dims = {
        "tiny": dict(n_audio_state=384, n_audio_layer=4, n_params=39_000_000),
        "base": dict(n_audio_state=512, n_audio_layer=6, n_params=74_000_000),
        "medium": dict(n_audio_state=1024, n_audio_layer=24, n_params=769_000_000),
    }

    class FakeDims:
        def __init__(self, d):
            self.n_audio_state = d["n_audio_state"]
            self.n_audio_layer = d["n_audio_layer"]

    class FakeModel:
        def __init__(self, d):
            self.dims = FakeDims(d)
            # one fake leaf carrying the param count
            self.params = {"w": np.zeros((d["n_params"],), np.float32)}

    def policy(model_size, batch, moment_dtype="float32", zero1=False, dp=1):
        from asr_ttl_mtl_tpu.mtl.trainer import MultiTaskTrainer

        tr = MultiTaskTrainer.__new__(MultiTaskTrainer)
        tr.config = TrainingConfig(
            model_size=model_size, batch_size=batch,
            optimizer_moment_dtype=moment_dtype, zero1=zero1,
            dp_shard_map=True,
        )
        tr.model = FakeModel(dims[model_size])
        tr._dp_shard_map = dp > 1

        class M:
            shape = {"dp": dp, "tp": 1}
            size = dp

        tr.mesh = M()
        return tr._use_remat()

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # measured anchors (PERF.md): fits un-remat'd
    assert policy("tiny", 64) is False
    assert policy("tiny", 128) is False
    assert policy("base", 64) is False
    # measured compile-OOM un-remat'd -> remat
    assert policy("base", 128) is True
    # medium bs=8 needs remat even with bf16 moments (measured via REMAT=1)
    assert policy("medium", 8, moment_dtype="bfloat16") is True
    assert policy("medium", 8) is True
    # dp spreads activations: base bs=128 over dp=4 is per-device bs=32
    assert policy("base", 128, dp=4) is False
