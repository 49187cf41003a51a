"""Bit-parity differential: the fused flat-buffer 4-group AdamW
(mtl/fused_optim.py) against the per-leaf optax chain it replaces
(clip_by_global_norm + multi_transform(adamw x 4 + set_to_zero)).

Same formulas in the same float-op order per element => identical bits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from asr_ttl_mtl_tpu.mtl.fused_optim import fused_multigroup_adamw

LR, WD, CLIP = 1e-3, 0.01, 1.0


def _params(seed=0):
    """A tree shaped like the trainer's trainable dict: mixed large/small
    leaves incl. non-128-aligned sizes (129, 3) to exercise pad lanes."""
    r = np.random.RandomState(seed)
    f = lambda *s: jnp.asarray(r.randn(*s).astype(np.float32))
    return {
        "model": {
            "encoder": {"w": f(384, 384), "b": f(384), "ln": f(129)},
            "decoder": {
                "token_embedding": f(517, 64),
                "blocks": [{"w": f(64, 256), "b": f(256)}, {"w": f(256, 64), "b": f(64)}],
            },
        },
        "classifier": {"w1": f(64, 32), "b1": f(32), "w2": f(32, 3), "b2": f(3)},
    }


def _label(path, _leaf):
    names = [str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))) for k in path]
    if names[0] == "classifier":
        return "classifier"
    if names[1] == "encoder":
        return "encoder"
    if names[1] == "decoder" and names[2] == "token_embedding":
        return "embeddings"
    return "decoder"


def _reference_chain(label_fn):
    groups = {
        "encoder": optax.adamw(LR * 0.1, weight_decay=WD),
        "decoder": optax.adamw(LR * 0.3, weight_decay=WD),
        "embeddings": optax.adamw(LR, weight_decay=0.0),
        "classifier": optax.adamw(LR, weight_decay=WD),
        "frozen": optax.set_to_zero(),
    }
    labels = lambda tree: jax.tree_util.tree_map_with_path(label_fn, tree)  # noqa: E731
    return optax.chain(
        optax.clip_by_global_norm(CLIP), optax.multi_transform(groups, labels)
    )


def _fused(params, label_fn):
    label_tree = jax.tree_util.tree_map_with_path(label_fn, params)
    hparams = {
        "encoder": (LR * 0.1, WD),
        "decoder": (LR * 0.3, WD),
        "embeddings": (LR, 0.0),
        "classifier": (LR, WD),
    }
    return fused_multigroup_adamw(label_tree, hparams, CLIP)


def _run(opt, params, n_steps, grad_scale=1.0):
    state = opt.init(params)

    @jax.jit
    def step(params, state, g):
        updates, state = opt.update(g, state, params)
        return optax.apply_updates(params, updates), state

    r = np.random.RandomState(42)
    for i in range(n_steps):
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                (r.randn(*p.shape) * grad_scale).astype(np.float32)
            ),
            params,
        )
        params, state = step(params, state, g)
    return params


@pytest.mark.quick
@pytest.mark.parametrize("grad_scale", [1.0, 0.01])
def test_fused_adamw_bit_parity(grad_scale):
    """grad_scale=1.0 triggers the clip branch (norm >> 1); 0.01 takes the
    unclipped branch — both must match the per-leaf chain bit-for-bit over
    several steps (m/v state compounding included)."""
    params = _params()
    ref = _run(_reference_chain(_label), params, n_steps=5, grad_scale=grad_scale)
    fused = _run(_fused(params, _label), params, n_steps=5, grad_scale=grad_scale)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.quick
def test_fused_adamw_frozen_group():
    def label_frozen(path, leaf):
        lab = _label(path, leaf)
        return "frozen" if lab == "encoder" else lab

    params = _params(1)
    ref = _run(_reference_chain(label_frozen), params, n_steps=3)
    fused = _run(_fused_frozen(params, label_frozen), params, n_steps=3)
    # frozen leaves unchanged
    assert np.array_equal(
        np.asarray(ref["model"]["encoder"]["w"]),
        np.asarray(params["model"]["encoder"]["w"]),
    )
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _fused_frozen(params, label_fn):
    label_tree = jax.tree_util.tree_map_with_path(label_fn, params)
    hparams = {
        "encoder": (LR * 0.1, WD),
        "decoder": (LR * 0.3, WD),
        "embeddings": (LR, 0.0),
        "classifier": (LR, WD),
    }
    return fused_multigroup_adamw(label_tree, hparams, CLIP)


@pytest.mark.quick
def test_trainer_uses_fused_optimizer_and_matches_per_leaf():
    """End-to-end: two trainers (fused on/off), same seed and batch, one
    train step each — identical resulting parameters."""
    from asr_ttl_mtl_tpu.mtl.config import TrainingConfig
    from asr_ttl_mtl_tpu.mtl.trainer import MultiTaskTrainer
    from asr_ttl_mtl_tpu.mtl.fused_optim import FusedAdamWState

    dims = dict(
        n_mels=80, n_vocab=51865, n_audio_ctx=150, n_audio_state=64,
        n_audio_head=1, n_audio_layer=1, n_text_ctx=448, n_text_state=64,
        n_text_head=1, n_text_layer=1,
    )
    r = np.random.RandomState(0)
    B, T = 2, 12
    batch = {
        "audio": (r.randn(B, 48000) * 0.1).astype(np.float32),
        "input_tokens": r.randint(0, 1000, (B, T)).astype(np.int32),
        "target_tokens": r.randint(0, 1000, (B, T)).astype(np.int32),
        "classes": r.randint(0, 3, (B,)).astype(np.int32),
    }

    outs = {}
    for fused in (True, False):
        cfg = TrainingConfig(
            model_size="tiny", pretrained="random", debug_dims=dims,
            compute_dtype="float32", batch_size=B, audio_samples=48000,
            mesh_shape=(1, 1), fused_optimizer=fused,
        )
        tr = MultiTaskTrainer(cfg, verbose=False)
        if fused:
            assert isinstance(tr.opt_state, FusedAdamWState)
        step = tr._get_train_step()
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        trainable, _, loss, _ = step(
            tr._trainable(), tr.opt_state, dev["audio"], dev["input_tokens"],
            dev["target_tokens"], dev["classes"],
            jnp.asarray(0.5, jnp.float32), jnp.asarray(0.5, jnp.float32),
            jax.random.PRNGKey(0), np.int32(B),
        )
        outs[fused] = (jax.device_get(trainable), float(loss))

    assert outs[True][1] == outs[False][1]
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[True][0]),
        jax.tree_util.tree_leaves(outs[False][0]),
    ):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# round-5 extensions: bf16 moments, ZeRO-1 over dp, fused on tp meshes
# ---------------------------------------------------------------------------


@pytest.mark.quick
def test_bf16_moments_track_fp32():
    """bf16 m/v storage: same trajectory as fp32 moments within bf16
    rounding (the update math runs in f32 from upcast state), and the state
    really is stored in bf16 (half the optimizer HBM)."""
    params = _params(2)
    label_tree = jax.tree_util.tree_map_with_path(_label, params)
    hparams = {
        "encoder": (LR * 0.1, WD), "decoder": (LR * 0.3, WD),
        "embeddings": (LR, 0.0), "classifier": (LR, WD),
    }
    opt32 = fused_multigroup_adamw(label_tree, hparams, CLIP)
    opt16 = fused_multigroup_adamw(
        label_tree, hparams, CLIP, moment_dtype=jnp.bfloat16
    )
    st16 = opt16.init(params)
    assert all(b.dtype == jnp.bfloat16 for b in st16.m.values())
    assert all(b.dtype == jnp.bfloat16 for b in st16.v.values())

    p32 = _run(opt32, params, n_steps=8, grad_scale=0.01)
    p16 = _run(opt16, params, n_steps=8, grad_scale=0.01)
    for a, b in zip(jax.tree_util.tree_leaves(p32), jax.tree_util.tree_leaves(p16)):
        a, b = np.asarray(a), np.asarray(b)
        # adam updates are bounded by ~lr per element; 8 steps of bf16
        # moment rounding perturbs the trajectory well under that scale
        np.testing.assert_allclose(a, b, atol=8 * LR * 0.05, rtol=0)


@pytest.mark.quick
def test_bf16_moments_convergence_differential():
    """Optimizing a quadratic: bf16 moments must reach (essentially) the
    same loss as fp32 moments — the documented-drift, not-broken check."""
    r = np.random.RandomState(3)
    target = jnp.asarray(r.randn(64, 64).astype(np.float32))
    params = {"model": {"decoder": {"w": jnp.zeros((64, 64))}}}
    label_tree = jax.tree_util.tree_map_with_path(lambda p, l: "decoder", params)
    hparams = {"decoder": (1e-2, 0.0)}

    def loss_fn(p):
        return jnp.mean((p["model"]["decoder"]["w"] - target) ** 2)

    losses = {}
    for md in (jnp.float32, jnp.bfloat16):
        opt = fused_multigroup_adamw(label_tree, hparams, 1e9, moment_dtype=md)
        p, st = params, opt.init(params)

        @jax.jit
        def step(p, st):
            l, g = jax.value_and_grad(loss_fn)(p)
            u, st = opt.update(g, st, p)
            return optax.apply_updates(p, u), st, l

        for _ in range(300):
            p, st, l = step(p, st)
        losses[jnp.dtype(md).name] = float(l)
    assert losses["bfloat16"] < losses["float32"] * 1.5 + 1e-4, losses


def _mesh_trainer(mesh_shape, **overrides):
    from asr_ttl_mtl_tpu.mtl import MultiTaskTrainer
    from test_dp_shard_map import BASE_CFG, TrainingConfig

    cfg = TrainingConfig(**{**BASE_CFG, **overrides}, mesh_shape=mesh_shape)
    return MultiTaskTrainer(cfg, verbose=False)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_zero1_update_bit_parity_standalone():
    """The ZeRO-1 update in isolation (shard_map over dp=8, m/v row-sharded)
    is BIT-identical to the replicated fused update: elementwise math on
    disjoint row ranges + exact all-gather."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from asr_ttl_mtl_tpu.mtl.fused_optim import FusedAdamWState
    from asr_ttl_mtl_tpu.parallel import create_mesh

    r = np.random.RandomState(0)
    params = {"a": jnp.asarray(r.randn(100, 64).astype(np.float32)),
              "b": jnp.asarray(r.randn(7).astype(np.float32))}
    grads = {"a": jnp.asarray(r.randn(100, 64).astype(np.float32) * 0.01),
             "b": jnp.asarray(r.randn(7).astype(np.float32) * 0.01)}
    labels = {"a": "decoder", "b": "decoder"}
    hp = {"decoder": (LR, WD)}
    mesh = create_mesh((8, 1))

    opt_r = fused_multigroup_adamw(labels, hp, CLIP)
    opt_z = fused_multigroup_adamw(labels, hp, CLIP, zero_axis="dp", zero_size=8)
    st_r = opt_r.init(params)
    st_z = opt_z.init(params)
    row = NamedSharding(mesh, P("dp"))
    st_z = FusedAdamWState(
        count=st_z.count,
        m={k: jax.device_put(v, row) for k, v in st_z.m.items()},
        v={k: jax.device_put(v, row) for k, v in st_z.v.items()},
    )
    spec = FusedAdamWState(count=P(), m={k: P("dp") for k in st_z.m},
                           v={k: P("dp") for k in st_z.v})
    u_r, st_r2 = jax.jit(opt_r.update)(grads, st_r, params)
    fn = jax.jit(jax.shard_map(
        opt_z.update, mesh=mesh, in_specs=(P(), spec, P()),
        out_specs=(P(), spec), check_vma=False))
    u_z, st_z2 = fn(grads, st_z, params)
    for k in u_r:
        np.testing.assert_array_equal(np.asarray(u_r[k]), np.asarray(u_z[k]))
    for k in st_r2.m:
        rows = st_r2.m[k].shape[0]
        np.testing.assert_array_equal(
            np.asarray(st_r2.m[k]), np.asarray(st_z2.m[k])[:rows])
        np.testing.assert_array_equal(
            np.asarray(st_r2.v[k]), np.asarray(st_z2.v[k])[:rows])


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_zero1_matches_replicated_update():
    """ZeRO-1 (m/v row-sharded over dp=8) vs the replicated fused update
    through the FULL train step: losses bit-identical, params within one
    fp32 ulp (the two programs' fusion contexts may FMA-contract the
    elementwise chains differently — measured 7.5e-9 max; the standalone
    differential above pins the arithmetic itself as bit-exact), and the
    optimizer buffers really are row-sharded."""
    from test_dp_shard_map import _make_batch, _run_steps

    tr_z = _mesh_trainer((8, 1), dp_shard_map=True, zero1=True)
    assert tr_z._use_zero1()
    for buf in tr_z.opt_state.m.values():
        assert buf.sharding.spec == jax.sharding.PartitionSpec("dp")
        assert buf.shape[0] % 8 == 0  # rows padded to the dp multiple
    batch = _make_batch(16, tr_z.tokenizer)
    l_z, p_z, _ = _run_steps(tr_z, batch)

    tr_r = _mesh_trainer((8, 1), dp_shard_map=True, zero1=False)
    l_r, p_r, _ = _run_steps(tr_r, batch)

    assert l_z == l_r  # losses bit-identical step for step
    for a, b in zip(jax.tree.leaves(p_z), jax.tree.leaves(p_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=3e-8)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_tp_mesh_uses_fused_optimizer_and_matches_per_leaf():
    """VERDICT r4 #4: a tp=2 trainer must take the fused path (no silent
    per-leaf downgrade) and match the per-leaf chain's parameters."""
    from asr_ttl_mtl_tpu.mtl.fused_optim import FusedAdamWState
    from test_dp_shard_map import _make_batch, _run_steps

    tr_f = _mesh_trainer((4, 2), dp_shard_map=True)  # tp=2 -> pjit path
    assert tr_f._dp_shard_map is False
    assert isinstance(tr_f.opt_state, FusedAdamWState)
    batch = _make_batch(16, tr_f.tokenizer)
    l_f, p_f, _ = _run_steps(tr_f, batch)

    tr_p = _mesh_trainer((4, 2), dp_shard_map=True, fused_optimizer=False)
    l_p, p_p, _ = _run_steps(tr_p, batch)

    np.testing.assert_allclose(l_f, l_p, rtol=0, atol=1e-5)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_trainer_bf16_moments_converges_like_fp32(tmp_path):
    """Through the FULL trainer (the medium-runbook config, scaled down):
    two epochs with bf16 m/v buffers must track fp32-moment training —
    same-loss-to-within-noise, monotone improvement."""
    from asr_ttl_mtl_tpu.mtl import DataLoader, MultiTaskSpeechDataset, MultiTaskTrainer
    from test_mtl import _config, _write_dataset

    csv = _write_dataset(tmp_path)
    finals = {}
    for md in ("float32", "bfloat16"):
        cfg = _config(tmp_path, csv, epochs=2, optimizer_moment_dtype=md,
                      save_dir=str(tmp_path / md))
        tr = MultiTaskTrainer(cfg, verbose=False)
        ds = MultiTaskSpeechDataset(csv, cfg)
        loader = DataLoader(ds, batch_size=4, num_workers=2,
                            buckets=cfg.token_buckets)
        m1 = tr.train_epoch(loader, epoch=0)
        m2 = tr.train_epoch(loader, epoch=1)
        assert m2["loss"] < m1["loss"]  # learning
        finals[md] = m2["loss"]
    # bf16 moment rounding must not visibly change the trajectory at this
    # scale (lr 1e-3, 2 epochs)
    assert finals["bfloat16"] == pytest.approx(finals["float32"], rel=0.02)
