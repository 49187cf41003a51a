"""Data-parallel batched decoding over a device mesh (multi-chip serving).

The single-chip path (decoding.DecodingTask.run) compiles one fused XLA
program per 30 s window batch. This module scales that program across chips
the TPU-native way: `shard_map` over a 1-D `dp` mesh with the window batch
sharded and the parameters replicated. Pure data parallelism — no
collectives are needed, and inside shard_map every device runs the program
on LOCAL shapes, so the Pallas attention kernels work unchanged (outside
shard_map, pallas_call has no GSPMD partitioning rules — that is why the
model-level kernels are disabled on >1-device meshes, models/whisper.py).

The reference has no distributed anything (SURVEY.md §2.6); this is the
framework's own scaling surface for batched transcription.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .mesh import create_mesh


@lru_cache(maxsize=32)
def _build_dp_beam(mesh, dims, cfg, bucket, sample_len, K, C, dtype_name, kv_quant, int8_encoder=False):
    """jit(shard_map(beam window)) cached per (mesh, program shape) — a fresh
    wrapper per call would re-trace the whole program every chunk."""
    from ..beam import _beam_window_fn

    fn = _beam_window_fn(dims, cfg, bucket, sample_len, K, C, dtype_name, kv_quant, int8_encoder)

    def per_shard_beam(params, mel, toks, valid, sot, nosp):
        ft, fs, fc, lb, lsp, ns, n = fn(params, mel, toks, valid, sot, nosp)
        # scalar -> (1,) so the per-shard step counts stack over dp
        return ft, fs, fc, lb, lsp, ns, jnp.reshape(n, (1,))

    return jax.jit(
        jax.shard_map(
            per_shard_beam,
            mesh=mesh,
            in_specs=(P(), P("dp"), P("dp"), P(), P(), P()),
            out_specs=tuple(P("dp") for _ in range(7)),
            check_vma=False,
        )
    )


@lru_cache(maxsize=32)
def _build_dp_greedy(mesh, dims, cfg, bucket, sample_len, dtype_name, kv_quant, int8_encoder=False):
    from ..decoding import _greedy_window_fn

    fn = _greedy_window_fn(dims, cfg, bucket, sample_len, dtype_name, kv_quant, int8_encoder)

    def per_shard(params, mel, toks, valid, sot, nosp, temp, seed):
        buf, sum_lp, ns, n = fn(params, mel, toks, valid, sot, nosp, temp, seed)
        # scalar -> (1,) so the per-shard step counts stack over dp
        return buf, sum_lp, ns, jnp.reshape(n, (1,))

    return jax.jit(
        jax.shard_map(
            per_shard,
            mesh=mesh,
            in_specs=(P(), P("dp"), P("dp"), P(), P(), P(), P(), P()),
            out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
            check_vma=False,
        )
    )


@lru_cache(maxsize=16)
def _build_tp_greedy(mesh, dims, cfg, bucket, sample_len, dtype_name, kv_quant, int8_encoder=False):
    """pjit(greedy window) for a dp x tp mesh: batch sharded over dp, the
    Megatron tp weight shardings (mesh.param_shardings) propagated by GSPMD
    through the fused encoder+prefill+decode program — attention heads and
    MLP hidden split over tp, one psum per block output. Used when tp > 1
    (shard_map dp keeps the Pallas kernels; GSPMD has no rules for them, so
    this path traces with kernels disabled)."""
    from ..decoding import _greedy_window_fn

    from jax.sharding import NamedSharding

    fn = _kernels_off_during_trace(
        _greedy_window_fn(dims, cfg, bucket, sample_len, dtype_name, kv_quant, int8_encoder)
    )
    dp_s = NamedSharding(mesh, P("dp"))
    return jax.jit(fn, out_shardings=(dp_s, dp_s, dp_s, None))


@lru_cache(maxsize=16)
def _build_tp_beam(mesh, dims, cfg, bucket, sample_len, K, C, dtype_name, kv_quant, int8_encoder=False):
    from ..beam import _beam_window_fn

    from jax.sharding import NamedSharding

    fn = _kernels_off_during_trace(
        _beam_window_fn(dims, cfg, bucket, sample_len, K, C, dtype_name, kv_quant, int8_encoder)
    )
    dp_s = NamedSharding(mesh, P("dp"))
    return jax.jit(fn, out_shardings=(dp_s,) * 6 + (None,))


def _tp_params(model, mesh):
    """Mesh-placed (tp-sharded, or replicated when tp==1) params, cached ON
    the model per mesh and identity-checked against the CURRENT params tree —
    an id()-keyed module cache could silently serve a freed model's weights
    (CPython reuses ids) or go stale after fine-tuning reassigns
    model.params. Dies with the model; one copy per (model, mesh)."""
    from .mesh import shard_params

    cache = getattr(model, "_tp_params_cache", None)
    entry = cache.get(mesh) if cache else None
    if entry is None or entry[0] is not model.params:
        entry = (model.params, shard_params(model.params, mesh))
        try:
            if cache is None:
                cache = {}
                object.__setattr__(model, "_tp_params_cache", cache)
            cache[mesh] = entry
        except AttributeError:
            pass  # __slots__ model: recompute per call (correct, uncached)
    return entry[1]


def _kernels_off_during_trace(fn):
    """Pallas kernels have no GSPMD partitioning rules — pjit paths must
    trace the plain-XLA attention (shard_map dp keeps the kernels). Wrapping
    the traced body (rather than the call site) pins the kernel flags off for
    EVERY (re)trace of this program, whenever jit decides to retrace."""

    def traced(*args):
        from ..models import whisper as W

        saved = (W._FLASH["enabled"], W._FLASH["decode_kernel"])
        W.set_flash_attention(False)
        W.set_decode_kernel("off")
        try:
            return fn(*args)
        finally:
            W._FLASH["enabled"], W._FLASH["decode_kernel"] = saved

    return traced


def decode_batched_dp(
    model,
    mels,
    options=None,
    mesh=None,
    rng_seed: int = 0,
    **option_kwargs,
) -> List:
    """Decode a batch of 30 s mel windows (greedy or beam search), sharded
    over `dp` — and, when the mesh has tp > 1, with the weights
    tensor-parallel-sharded over `tp` (Megatron layout via pjit/GSPMD; the
    multi-chip latency path for the large model family).

    Same results as DecodingTask.run (known language); the batch is
    zero-padded up to a multiple of the dp size and the padded rows dropped.
    Returns a list of DecodingResult.
    """
    return collect_batched_dp(
        dispatch_batched_dp(model, mels, options, mesh, rng_seed,
                            **option_kwargs)
    )


def dispatch_batched_dp(
    model,
    mels,
    options=None,
    mesh=None,
    rng_seed: int = 0,
    **option_kwargs,
):
    """Launch a mesh decode WITHOUT fetching (JAX dispatch is async): the
    returned handle lets transcribe_batch keep the next chunk's device work
    in flight while this chunk's results cross the host boundary — the mesh
    equivalent of DecodingTask.submit/collect. Fetch with
    :func:`collect_batched_dp`."""
    from ..decoding import DecodingOptions, DecodingTask, _bucket

    if options is None:
        options = DecodingOptions(**option_kwargs)
    if options.language is None:
        raise ValueError("decode_batched_dp needs a known language")

    mesh = mesh or create_mesh((0, 1))
    dp = mesh.shape["dp"]
    task = DecodingTask(model, options)

    # device-resident mels (transcribe_batch's window store on a mesh) stay
    # on device: the dp resharding below moves them shard-to-shard over ICI
    # instead of round-tripping through the host
    device_mels = isinstance(mels, jnp.ndarray)
    if not device_mels:
        mels = np.asarray(mels, np.float32)
    n_audio = mels.shape[0]
    if n_audio % dp:
        pad = dp - n_audio % dp
        if device_mels:
            mels = jnp.pad(mels, ((0, pad), (0, 0), (0, 0)))
        else:
            mels = np.concatenate(
                [mels, np.zeros((pad, *mels.shape[1:]), np.float32)]
            )
    B = mels.shape[0]

    n_group = task.n_group if options.beam_size is None else 1
    initial = np.tile(np.asarray(task.initial_tokens, np.int32), (B, 1))
    valid_len = initial.shape[1]
    bucket = _bucket(valid_len)
    padded = np.full((B, bucket), task.tokenizer.eot, np.int32)
    padded[:, :valid_len] = initial
    if n_group > 1:  # best-of-N sampling: replicate token rows audio-major;
        # the decoder shares one cross-KV row per audio (kv_group)
        padded = np.repeat(padded, n_group, axis=0)
    sample_len = min(task.sample_len, task.n_ctx)
    no_speech = task.tokenizer.no_speech if task.tokenizer.no_speech is not None else -1

    tp = mesh.shape.get("tp", 1)
    # best-of sampling must run as ONE GLOBAL program (pjit): shard_map would
    # draw each shard's rows from the same shard-local rng stream, diverging
    # from the single-device sampling semantics
    use_pjit = tp > 1 or n_group > 1
    if use_pjit:
        from jax.sharding import NamedSharding

        # mesh-placed params even at tp==1 (replicated): raw host params
        # would re-broadcast the full weights on every chunk, and params
        # committed to one device would make the multi-device jit raise
        params = _tp_params(model, mesh)
        # device_put the numpy arrays directly: host -> shards in one hop
        # (jnp.asarray first would stage the whole batch on device 0)
        mel_dev = jax.device_put(mels, NamedSharding(mesh, P("dp", None, None)))
        toks_dev = jax.device_put(padded, NamedSharding(mesh, P("dp", None)))
    else:
        params, toks_dev = model.params, padded
        if device_mels and mesh.size > 1:
            from jax.sharding import NamedSharding

            # a store buffer is committed to one device; reshard it over dp
            # explicitly (ICI scatter) — the shard_map jit would otherwise
            # reject the committed single-device placement
            mel_dev = jax.device_put(mels, NamedSharding(mesh, P("dp", None, None)))
        else:
            mel_dev = jnp.asarray(mels)

    if options.beam_size is not None:
        K = options.beam_size
        patience = options.patience or 1.0
        C = round(K * patience)
        assert C > 0, f"Invalid beam size ({K}) or patience ({patience})"
        build = _build_tp_beam if use_pjit else _build_dp_beam
        sharded = build(
            mesh, model.dims, task.filter_cfg, bucket, sample_len, K, C,
            task._dtype_name, task.kv_quant, task.int8_encoder,
        )
        outs = sharded(
                params,
                mel_dev,
                toks_dev,
                jnp.asarray(valid_len, jnp.int32),
                jnp.asarray(task.sot_index, jnp.int32),
                jnp.asarray(no_speech, jnp.int32),
            )
        return ("beam", task, options, outs, (B, K, valid_len, n_audio))
    else:
        build = _build_tp_greedy if use_pjit else _build_dp_greedy
        sharded = build(
            mesh, model.dims, task.filter_cfg, bucket, sample_len,
            task._dtype_name, task.kv_quant, task.int8_encoder,
        )

        arrays = sharded(
                params,
                mel_dev,
                toks_dev,
                jnp.asarray(valid_len, jnp.int32),
                jnp.asarray(task.sot_index, jnp.int32),
                jnp.asarray(no_speech, jnp.int32),
                jnp.asarray(options.temperature, jnp.float32),
                jnp.asarray(rng_seed, jnp.int32),
            )
        return ("greedy", task, options, arrays, (B, n_group, valid_len, n_audio))


def collect_batched_dp(handle) -> List:
    """Fetch + assemble a :func:`dispatch_batched_dp` launch."""
    from ..decoding import DecodingResult, MaximumLikelihoodRanker
    from ..utils import compression_ratio

    kind, task, options, arrays, meta = handle
    if kind == "beam":
        from ..beam import assemble_beam_results

        B, K, valid_len, n_audio = meta
        tokens, sum_logprobs, no_speech_probs = assemble_beam_results(
            [np.asarray(o) for o in arrays], B, K, valid_len, task.tokenizer.eot
        )
    else:
        B, n_group, valid_len, n_audio = meta
        buf, sum_lp, ns_probs, n_sampled = arrays
        tokens, sum_logprobs, no_speech_probs = task._assemble_greedy(
            buf, sum_lp, ns_probs, np.asarray(n_sampled), B, n_group, valid_len
        )
    selected = MaximumLikelihoodRanker(options.length_penalty).rank(tokens, sum_logprobs)
    results = []
    for i in range(n_audio):  # padded rows dropped
        toks = tokens[i][selected[i]]
        text = task.tokenizer.decode(toks).strip()
        lp = sum_logprobs[i][selected[i]]
        results.append(
            DecodingResult(
                audio_features=None,
                language=options.language,
                tokens=toks,
                text=text,
                avg_logprob=lp / (len(toks) + 1),
                no_speech_prob=float(no_speech_probs[i]),
                temperature=options.temperature,
                compression_ratio=compression_ratio(text),
            )
        )
    return results
