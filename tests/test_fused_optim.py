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
