"""Sharding correctness on the 8-virtual-device CPU mesh: dp and tp must be
numerically equivalent to single-device execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from asr_ttl_mtl_tpu.models import whisper as W
from asr_ttl_mtl_tpu.models.dims import ModelDimensions
from asr_ttl_mtl_tpu.parallel import (
    create_mesh,
    data_sharding,
    param_shardings,
    shard_params,
)

DIMS = ModelDimensions(
    n_mels=80,
    n_audio_ctx=64,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=512,
    n_text_ctx=32,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def params():
    return W.init_params(jax.random.PRNGKey(0), DIMS)


def _mel(batch, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(batch, DIMS.n_mels, DIMS.n_audio_ctx * 2).astype(np.float32)


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = create_mesh((0, 1))
    assert dict(mesh.shape) == {"dp": 8, "tp": 1}
    mesh = create_mesh((2, 4))
    assert dict(mesh.shape) == {"dp": 2, "tp": 4}


def test_tp_param_specs():
    mesh = create_mesh((4, 2))
    params = W.init_params(jax.random.PRNGKey(0), DIMS)
    shardings = param_shardings(params, mesh)
    blk = shardings["encoder"]["blocks"][0]
    assert blk["attn"]["query"]["w"].spec == jax.sharding.PartitionSpec(None, "tp")
    assert blk["attn"]["out"]["w"].spec == jax.sharding.PartitionSpec("tp", None)
    assert blk["mlp"]["fc1"]["w"].spec == jax.sharding.PartitionSpec(None, "tp")
    assert blk["mlp"]["fc2"]["w"].spec == jax.sharding.PartitionSpec("tp", None)
    # replicated leaves
    assert shardings["decoder"]["token_embedding"].spec == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_encoder_forward_sharded_matches_single(params, mesh_shape):
    mel = _mel(8)
    ref = np.asarray(W.encoder_apply(params, DIMS, jnp.asarray(mel)))

    mesh = create_mesh(mesh_shape)
    p = shard_params(params, mesh)
    x = jax.device_put(jnp.asarray(mel), data_sharding(mesh, 3))
    out = jax.jit(lambda p, x: W.encoder_apply(p, DIMS, x))(p, x)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (2, 4)])
def test_decoder_forward_sharded_matches_single(params, mesh_shape):
    mel = _mel(8, seed=1)
    rng = np.random.RandomState(2)
    toks = rng.randint(0, DIMS.n_vocab, size=(8, 12)).astype(np.int32)

    feats = W.encoder_apply(params, DIMS, jnp.asarray(mel))
    ref, _, _ = W.decoder_apply(params, DIMS, jnp.asarray(toks), feats)
    ref = np.asarray(ref)

    mesh = create_mesh(mesh_shape)
    p = shard_params(params, mesh)
    x = jax.device_put(jnp.asarray(mel), data_sharding(mesh, 3))
    t = jax.device_put(jnp.asarray(toks), data_sharding(mesh, 2))

    def fwd(p, x, t):
        feats = W.encoder_apply(p, DIMS, x)
        logits, _, _ = W.decoder_apply(p, DIMS, t, feats)
        return logits

    out = jax.jit(fwd)(p, x, t)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-4)


def test_dp_gradients_match_single_device(params):
    """Data-parallel grads over the mesh == single-device grads on the same
    global batch (XLA's psum must reproduce serial accumulation)."""
    mel = _mel(8, seed=3)
    rng = np.random.RandomState(4)
    toks = rng.randint(0, DIMS.n_vocab, size=(8, 10)).astype(np.int32)
    targets = rng.randint(0, DIMS.n_vocab, size=(8, 10)).astype(np.int32)

    def loss_fn(p, mel, toks, targets):
        logits = W.model_apply(p, DIMS, mel, toks)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return -tok_lp.mean()

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(
        params, jnp.asarray(mel), jnp.asarray(toks), jnp.asarray(targets)
    )

    mesh = create_mesh((8, 1))
    p = shard_params(params, mesh)
    args = (
        jax.device_put(jnp.asarray(mel), data_sharding(mesh, 3)),
        jax.device_put(jnp.asarray(toks), data_sharding(mesh, 2)),
        jax.device_put(jnp.asarray(targets), data_sharding(mesh, 2)),
    )
    dp_loss, dp_grads = jax.jit(jax.value_and_grad(loss_fn))(p, *args)

    np.testing.assert_allclose(float(dp_loss), float(ref_loss), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(ref_grads)
    flat_dp = jax.tree_util.tree_leaves(dp_grads)
    for a, b in zip(flat_ref, flat_dp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-3)


def test_mtl_train_step_dp_tp(tmp_path):
    """Full MTL training step runs under a (4,2) mesh and matches the (1,1)
    mesh loss on the same batch."""
    from asr_ttl_mtl_tpu.mtl import MultiTaskTrainer, TrainingConfig

    def make(mesh_shape, seed=0):
        return MultiTaskTrainer(
            TrainingConfig(
                model_size="tiny.en",
                pretrained="random",
                debug_dims=dict(
                    n_mels=80, n_audio_ctx=100, n_audio_state=64, n_audio_head=4,
                    n_audio_layer=1, n_vocab=51864, n_text_ctx=48, n_text_state=64,
                    n_text_head=4, n_text_layer=1,
                ),
                audio_samples=32000,
                compute_dtype="float32",
                mesh_shape=mesh_shape,
                batch_size=8,
                seed=seed,
            ),
            verbose=False,
        )

    rng = np.random.RandomState(0)
    tok_ids = rng.randint(100, 40000, size=(8, 16)).astype(np.int32)
    batch = {
        "audio": rng.randn(8, 32000).astype(np.float32) * 0.05,
        "input_tokens": tok_ids,
        "target_tokens": np.concatenate(
            [tok_ids[:, 1:], np.full((8, 1), -100, np.int32)], axis=1
        ),
        "classes": np.asarray([i % 3 for i in range(8)], np.int32),
    }

    losses = {}
    for shape in [(1, 1), (8, 1), (4, 2)]:
        trainer = make(shape)
        dev, _ = trainer._device_batch(batch)
        step = trainer._get_train_step()
        _, _, loss, aux = step(
            trainer._trainable(), trainer.opt_state,
            dev["audio"], dev["input_tokens"], dev["target_tokens"], dev["classes"],
            jnp.asarray(0.5, jnp.float32), jnp.asarray(0.5, jnp.float32),
            jax.random.PRNGKey(0), np.int32(len(batch["classes"])),
        )
        losses[shape] = float(loss)

    np.testing.assert_allclose(losses[(8, 1)], losses[(1, 1)], rtol=1e-5)
    np.testing.assert_allclose(losses[(4, 2)], losses[(1, 1)], rtol=1e-5)


def test_batched_greedy_decode_dp_sharded_matches_single(params):
    """Multi-chip SERVING: the fused greedy window program under a dp mesh
    (params replicated, mel batch-sharded) must produce the same tokens as
    single-device execution."""
    from asr_ttl_mtl_tpu.decoding import FilterConfig, _build_greedy_window
    from asr_ttl_mtl_tpu.parallel import replicated

    cfg = FilterConfig(
        n_vocab=DIMS.n_vocab, eot=DIMS.n_vocab - 1, timestamp_begin=DIMS.n_vocab + 7,
        no_timestamps=DIMS.n_vocab - 2, blank_tokens=(0, DIMS.n_vocab - 1),
        suppress_tokens=(), suppress_blank=True, apply_timestamp_rules=False,
        max_initial_timestamp_index=-1,
    )
    B = 8
    mel = jnp.asarray(_mel(B, seed=3))
    initial = np.full((B, 8), 5, np.int32)
    scalars = (np.int32(8), np.int32(0), np.int32(-1), np.float32(0.0), np.int32(0))
    loop = _build_greedy_window(DIMS, cfg, 8, 12, "float32")

    buf1, lp1, _, n1 = loop(params, mel, initial, *scalars)

    mesh = create_mesh((8, 1))
    p_sh = shard_params(params, mesh)
    mel_sh = jax.device_put(mel, data_sharding(mesh, 3))
    init_sh = jax.device_put(initial, data_sharding(mesh, 2))
    buf8, lp8, _, n8 = loop(p_sh, mel_sh, init_sh, *scalars)

    np.testing.assert_array_equal(np.asarray(buf8), np.asarray(buf1))
    np.testing.assert_allclose(np.asarray(lp8), np.asarray(lp1), atol=1e-4)
    assert int(n8) == int(n1)


def test_decode_batched_dp_matches_single_device(params):
    """shard_map data-parallel serving: same DecodingResults as the
    single-device DecodingTask.run, with the Pallas decode kernel running
    per-shard (interpret mode) inside shard_map."""
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.parallel.serving import decode_batched_dp

    # real vocab size so DecodingTask's tokenizer/filters apply; tiny elsewhere
    dims = DIMS.replace(n_vocab=51865)
    vocab_params = W.init_params(jax.random.PRNGKey(1), dims)
    model = WhisperModel(dims=dims, params=vocab_params, compute_dtype=jnp.float32)
    # 10 windows over an 8-way dp mesh exercises batch padding too
    mel = _mel(10, seed=7)
    opts = DecodingOptions(language="en", without_timestamps=True,
                           sample_len=12, fp16=False, suppress_tokens=None)

    task = DecodingTask(model, opts)
    single = task.run(jnp.asarray(mel))

    try:
        W.set_decode_kernel("interpret")
        sharded = decode_batched_dp(model, mel, opts, mesh=create_mesh((8, 1)))
    finally:
        W.set_decode_kernel("auto")

    assert len(sharded) == len(single) == 10
    for a, b in zip(sharded, single):
        assert a.tokens == b.tokens
        assert a.text == b.text
        np.testing.assert_allclose(a.avg_logprob, b.avg_logprob, atol=1e-4)


def test_decode_batched_dp_beam_matches_single_device(params):
    """shard_map data-parallel BEAM serving: same DecodingResults as the
    single-device beam path (shared cross-KV, per-audio prefill) on the
    8-device mesh, including batch padding."""
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.parallel.serving import decode_batched_dp

    dims = DIMS.replace(n_vocab=51865)
    vocab_params = W.init_params(jax.random.PRNGKey(1), dims)
    model = WhisperModel(dims=dims, params=vocab_params, compute_dtype=jnp.float32)
    mel = _mel(10, seed=9)
    opts = DecodingOptions(language="en", without_timestamps=True, beam_size=3,
                           patience=1.5, sample_len=10, fp16=False,
                           suppress_tokens=None)

    task = DecodingTask(model, opts)
    single = task.run(jnp.asarray(mel))

    sharded = decode_batched_dp(model, mel, opts, mesh=create_mesh((8, 1)))

    assert len(sharded) == len(single) == 10
    for a, b in zip(sharded, single):
        assert a.tokens == b.tokens
        assert a.text == b.text
        np.testing.assert_allclose(a.avg_logprob, b.avg_logprob, atol=1e-4)


def test_transcribe_batch_over_mesh(params):
    """transcribe_batch(mesh=...): long-form batched transcription through
    the dp serving path gives identical outputs to single-device."""
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.dims import PRESET_DIMS
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    # full 1500-frame window so the real audio frontend feeds the model
    dims = PRESET_DIMS["tiny.en"].replace(n_audio_layer=1, n_text_layer=1)
    vocab_params = W.init_params(jax.random.PRNGKey(1), dims)
    model = WhisperModel(dims=dims, params=vocab_params, compute_dtype=jnp.float32)
    rng = np.random.RandomState(13)
    audios = [
        (rng.randn(2 * 16000) * 0.1).astype(np.float32) for _ in range(3)
    ]
    # temperature pinned to 0.0: this test checks mesh-vs-single parity, and
    # the default ladder's sampling rungs are nondeterministic across paths
    common = dict(language="en", without_timestamps=True, sample_len=8,
                  fp16=False, batch_size=4, temperature=0.0)
    single = transcribe_batch(model, audios, **common)
    sharded = transcribe_batch(model, audios, mesh=create_mesh((8, 1)), **common)
    assert len(sharded) == len(single) == 3
    for a, b in zip(sharded, single):
        assert a["text"] == b["text"]
        assert [s["tokens"] for s in a["segments"]] == [
            s["tokens"] for s in b["segments"]
        ]


def test_transcribe_batch_over_mesh_multi_chunk(params):
    """Mesh path with more windows than batch_size: several chunks flow
    through the depth-2 dispatch/collect pipeline (dispatch_batched_dp +
    deferred collect) and still match single-device output exactly."""
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.dims import PRESET_DIMS
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.transcribe import transcribe_batch

    dims = PRESET_DIMS["tiny.en"].replace(n_audio_layer=1, n_text_layer=1)
    vocab_params = W.init_params(jax.random.PRNGKey(1), dims)
    model = WhisperModel(dims=dims, params=vocab_params, compute_dtype=jnp.float32)
    rng = np.random.RandomState(29)
    audios = [
        (rng.randn(2 * 16000) * 0.1).astype(np.float32) for _ in range(5)
    ]
    # batch_size=2 over 5 windows -> 3 chunks: exercises two handles in
    # flight plus the final drain, on the mesh path
    common = dict(language="en", without_timestamps=True, sample_len=8,
                  fp16=False, batch_size=2, temperature=0.0)
    single = transcribe_batch(model, audios, **common)
    sharded = transcribe_batch(model, audios, mesh=create_mesh((8, 1)), **common)
    assert len(sharded) == len(single) == 5
    for a, b in zip(sharded, single):
        assert a["text"] == b["text"]


def test_decode_batched_dp_with_kv_quant(params):
    """dp serving composes with the int8 cross-KV mode: results match the
    single-device kv_quant path exactly (same quantized numerics)."""
    from asr_ttl_mtl_tpu.decoding import DecodingOptions, DecodingTask
    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.registry import WhisperModel
    from asr_ttl_mtl_tpu.parallel.serving import decode_batched_dp

    dims = DIMS.replace(n_vocab=51865)
    vocab_params = W.init_params(jax.random.PRNGKey(1), dims)
    model = WhisperModel(dims=dims, params=vocab_params, compute_dtype=jnp.float32)
    mel = _mel(8, seed=21)
    opts = DecodingOptions(language="en", without_timestamps=True, sample_len=8,
                           fp16=False, suppress_tokens=None, kv_quant=True)

    single = DecodingTask(model, opts).run(jnp.asarray(mel))
    sharded = decode_batched_dp(model, mel, opts, mesh=create_mesh((8, 1)))
    for a, b in zip(sharded, single):
        assert a.tokens == b.tokens
        np.testing.assert_allclose(a.avg_logprob, b.avg_logprob, atol=1e-4)



def test_transcribe_batch_mesh_device_windows(params, monkeypatch):
    """Device-resident windows on a dp mesh: the store fills on one device
    and dispatch_batched_dp reshards each chunk over the mesh (no host
    round-trip). Asserts the device-window path actually RAN (store.chunk
    spy) and outputs match both the mesh host-window path and single-device."""
    import importlib

    from asr_ttl_mtl_tpu.models import whisper as W
    from asr_ttl_mtl_tpu.models.dims import PRESET_DIMS
    from asr_ttl_mtl_tpu.models.registry import WhisperModel

    T = importlib.import_module("asr_ttl_mtl_tpu.transcribe")
    dims = PRESET_DIMS["tiny.en"].replace(n_audio_layer=1, n_text_layer=1)
    vocab_params = W.init_params(jax.random.PRNGKey(1), dims)
    model = WhisperModel(dims=dims, params=vocab_params, compute_dtype=jnp.float32)
    rng = np.random.RandomState(31)
    audios = [
        (rng.randn(2 * 16000) * 0.1).astype(np.float32) for _ in range(5)
    ]
    common = dict(language="en", without_timestamps=True, sample_len=8,
                  fp16=False, batch_size=4, temperature=0.0)

    chunk_reads = []
    orig_chunk = T._WindowStore.chunk

    def spy(self, start):
        chunk_reads.append(start)
        return orig_chunk(self, start)

    monkeypatch.setattr(T._WindowStore, "chunk", spy)
    mesh = create_mesh((8, 1))
    dev = T.transcribe_batch(model, audios, mesh=mesh, device_windows=True, **common)
    assert chunk_reads, "mesh run did not take the device-window store path"
    host = T.transcribe_batch(model, audios, mesh=mesh, device_windows=False, **common)
    single = T.transcribe_batch(model, audios, **common)
    for a, b, c in zip(dev, host, single):
        assert a["text"] == b["text"] == c["text"]
        assert [s["tokens"] for s in a["segments"]] == [
            s["tokens"] for s in b["segments"]
        ]
