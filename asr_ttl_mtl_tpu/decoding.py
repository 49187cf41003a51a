"""Decoding engine: 30-second-window inference, fully inside XLA.

Behavioral parity with reference `whisper/decoding.py` (DecodingTask :508,
GreedyDecoder :272, logit filters :423-505, detect_language :18), re-designed
for TPU:

* The reference's per-step Python loop with stateful LogitFilter objects and
  hook-based KV caching (`decoding.py:680-710`) becomes ONE compiled XLA
  program: prompt prefill + a `lax.while_loop` over decode steps with a
  static-shape KV cache. No host round-trips inside a window.
* Logit filters (SuppressBlank/SuppressTokens/ApplyTimestampRules) are
  vectorized masks over (batch, vocab). The timestamp-rule state that the
  reference recomputes by re-scanning token history each step
  (`decoding.py:458-484`) is carried in the loop state instead: last/penult
  sampled token and the running last-timestamp.
* Prompts of varying length are right-padded into a small set of static
  buckets so XLA compiles a handful of programs, with the true length as a
  traced scalar (junk KV slots are overwritten before they become visible —
  see tests/test_model_parity.py::test_prefill_with_right_padding_is_safe).
* Temperature is a traced scalar: one compiled program serves the whole
  temperature-fallback ladder (`transcribe.py:184-224` in the reference).

Beam search lives in :mod:`asr_ttl_mtl_tpu.beam`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace
from functools import lru_cache, partial
from typing import TYPE_CHECKING, Dict, Iterable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .audio import CHUNK_LENGTH
from .tokenizer import Tokenizer, get_tokenizer, normalize_language
from .utils import compression_ratio

if TYPE_CHECKING:
    from .models.registry import WhisperModel

_F32 = jnp.float32
# effective -inf that keeps softmax finite; a Python float (not a device
# array) so importing this module never initializes a backend
_NEG = -1e9

_PROMPT_BUCKETS = (8, 16, 32, 64, 128, 256)


def _bucket(n: int) -> int:
    for b in _PROMPT_BUCKETS:
        if n <= b:
            return b
    return _PROMPT_BUCKETS[-1]


@dataclass(frozen=True)
class DecodingOptions:
    """Mirror of the reference options (`decoding.py:80-114`)."""

    task: str = "transcribe"
    language: Optional[str] = None

    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None

    length_penalty: Optional[float] = None

    prompt: Optional[Union[str, List[int]]] = None
    prefix: Optional[Union[str, List[int]]] = None

    suppress_tokens: Optional[Union[str, Iterable[int]]] = "-1"
    suppress_blank: bool = True

    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0

    # fp16 in the reference; here it selects the model's fast compute dtype
    # (bf16 on TPU) vs full fp32
    fp16: bool = True

    # OPT-IN serving mode (no reference equivalent): store the per-window
    # cross-attention K/V int8 with per-row scales and run the decode-step
    # attention matmuls int8 on the MXU — halves the decode loop's dominant
    # HBM traffic (see ops/decode_attention.py). Off by default: bit-parity
    # with the bf16 path is only approximate (per-row abs-max quantization)
    kv_quant: bool = False

    # OPT-IN serving mode (no reference equivalent): run the encoder blocks'
    # six projections as dynamically-quantized W8A8 int8 matmuls (2x MXU
    # throughput; models/whisper.py linear_i8). Approximate like kv_quant —
    # quality must be measured per deployment (scripts/tpu_int8_quality.py)
    int8_encoder: bool = False

    # the reference's DecodingResult always carries the encoder output
    # (decoding.py:117-127) but nothing in its pipeline consumes it; the
    # device->host copy of (B, 1500, D) features costs more than the whole
    # decode loop on TPU, so it is opt-in here (lang_id results always
    # include features)
    return_audio_features: bool = False

    # run the encoder and the decode loop as ONE fused XLA program (default:
    # halves dispatch round-trips). Set False to compile them as two smaller
    # programs — needed when the fused program exceeds a remote compiler's
    # size limit (e.g. large-v3 at B>=32 through the axon tunnel); both
    # submit()/collect() pipelining and run() support either mode
    fuse_encoder: bool = True


@dataclass(frozen=True)
class DecodingResult:
    audio_features: Optional[np.ndarray]
    language: str
    language_probs: Optional[Dict[str, float]] = None
    tokens: List[int] = field(default_factory=list)
    text: str = ""
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan


# ---------------------------------------------------------------------------
# vectorized logit filters
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FilterConfig:
    """Static per-task filter configuration (hashable: participates in jit
    specialization)."""

    n_vocab: int
    eot: int
    timestamp_begin: int
    no_timestamps: int
    blank_tokens: Tuple[int, ...]  # tokens suppressed at sample start
    suppress_tokens: Tuple[int, ...]
    suppress_blank: bool
    apply_timestamp_rules: bool
    max_initial_timestamp_index: int  # -1 = unlimited


def _apply_filters(
    cfg: FilterConfig,
    logits: jnp.ndarray,  # (B, V) in the loop's compute dtype (bf16 on TPU,
    # fp32 on the CPU parity path) — precision-sensitive math in here must
    # upcast explicitly, as the timestamp-gate reductions do
    step: jnp.ndarray,  # scalar int: number of sampled tokens so far
    prev_tok: jnp.ndarray,  # (B,) last sampled token (-1 before any)
    penult_tok: jnp.ndarray,  # (B,) second-to-last sampled token (-1)
    last_ts: jnp.ndarray,  # (B,) last sampled timestamp token (-1 if none)
) -> jnp.ndarray:
    """All reference logit filters as one vectorized masking pass."""
    V = cfg.n_vocab
    vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)

    # SuppressBlank (reference decoding.py:423-430): at the first sampled
    # position, suppress " " and EOT.
    if cfg.suppress_blank:
        blank = np.zeros((V,), np.float32)
        blank[list(cfg.blank_tokens)] = 1.0
        logits = jnp.where(
            (step == 0) & (jnp.asarray(blank)[None, :] > 0), _NEG, logits
        )

    # SuppressTokens (reference decoding.py:433-438): static list.
    if cfg.suppress_tokens:
        sup = np.zeros((V,), np.float32)
        sup[list(cfg.suppress_tokens)] = 1.0
        logits = jnp.where(jnp.asarray(sup)[None, :] > 0, _NEG, logits)

    if cfg.apply_timestamp_rules:
        ts_begin = cfg.timestamp_begin
        # <|notimestamps|> is never sampled here (decoding.py:453-455)
        logits = jnp.where(vocab_ids == cfg.no_timestamps, _NEG, logits)

        last_was_ts = (step >= 1) & (prev_tok >= ts_begin)  # (B,)
        penult_was_ts = (step < 2) | (penult_tok >= ts_begin)

        # timestamps come in pairs (decoding.py:468-472)
        force_non_ts = (last_was_ts & penult_was_ts)[:, None]  # must be text
        force_ts_or_eot = (last_was_ts & ~penult_was_ts)[:, None]
        logits = jnp.where(force_non_ts & (vocab_ids >= ts_begin), _NEG, logits)
        logits = jnp.where(force_ts_or_eot & (vocab_ids < cfg.eot), _NEG, logits)

        # non-decreasing timestamps (decoding.py:474-484)
        has_ts = last_ts >= 0
        ts_floor = jnp.where(
            last_was_ts & ~penult_was_ts, last_ts, last_ts + 1
        )  # (B,)
        ts_mask = (
            has_ts[:, None]
            & (vocab_ids >= ts_begin)
            & (vocab_ids < ts_floor[:, None])
        )
        logits = jnp.where(ts_mask, _NEG, logits)

        # at the very first sample: force a timestamp, optionally capped
        # (decoding.py:486-495)
        at_begin = step == 0
        logits = jnp.where(at_begin & (vocab_ids < ts_begin), _NEG, logits)
        if cfg.max_initial_timestamp_index >= 0:
            last_allowed = ts_begin + cfg.max_initial_timestamp_index
            logits = jnp.where(at_begin & (vocab_ids > last_allowed), _NEG, logits)

        # if total timestamp probability beats every text token, sample a
        # timestamp (decoding.py:497-505). The reference compares
        # log_softmax values; the softmax shift (-logsumexp over the full
        # vocab) is common to both sides, so the comparison is done on raw
        # logits — two partial reductions instead of materializing a full
        # (B, V) fp32 log_softmax in HBM every step (was ~0.25 ms/step of
        # pure HBM traffic at B=192 base).
        ts_logprob = jax.nn.logsumexp(logits[:, ts_begin:].astype(jnp.float32), axis=-1)
        max_text = jnp.max(logits[:, :ts_begin].astype(jnp.float32), axis=-1)
        force_ts = (ts_logprob > max_text)[:, None]
        logits = jnp.where(force_ts & (vocab_ids < ts_begin), _NEG, logits)

    return logits


# ---------------------------------------------------------------------------
# jitted greedy main loop
# ---------------------------------------------------------------------------


@jax.jit
def _pack_for_fetch(*arrays):
    """Concatenate arrays into ONE flat int32 buffer (floats bitcast).

    Every device->host fetch is a full tunnel round trip (~30 ms measured on
    the remote-attached chip), so a program with N small outputs pays N round
    trips unless they are packed device-side and fetched once."""
    parts = []
    for a in arrays:
        a = jnp.asarray(a)
        if jnp.issubdtype(a.dtype, jnp.floating):
            a = jax.lax.bitcast_convert_type(a.astype(jnp.float32), jnp.int32)
        else:
            a = a.astype(jnp.int32)
        parts.append(a.reshape(-1))
    return jnp.concatenate(parts)


def fetch_packed(*arrays) -> List[np.ndarray]:
    """Fetch device arrays to host numpy in a single round trip, restoring
    each array's shape (floats come back as float32, ints as int32)."""
    flat = np.asarray(_pack_for_fetch(*arrays))
    out, off = [], 0
    for a in arrays:
        n = 1
        for s in a.shape:
            n *= s
        seg = flat[off : off + n]
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
            seg = seg.copy().view(np.float32)
        out.append(seg.reshape(a.shape))
        off += n
    return out


@lru_cache(maxsize=64)
def _build_greedy_loop(dims, cfg: FilterConfig, bucket: int, sample_len: int, compute_dtype_name: str):
    """Compile-once greedy window decode: prefill + while_loop of steps.

    Returns fn(params, cross_kv, initial_tokens (B, bucket) int32,
    valid_len scalar, sot_index scalar, no_speech_token scalar (-1: skip),
    temperature scalar, rng_seed scalar int32) -> (tokens_buf
    (B, bucket+sample_len), sum_logprobs (B,), no_speech_probs (B,),
    n_sampled scalar). All scalars may be raw numpy — they ride the single
    jit dispatch instead of separate device_put round-trips (which cost
    real milliseconds over a remote-attached TPU).
    """
    run = partial(
        _greedy_program, dims=dims, cfg=cfg, bucket=bucket,
        sample_len=sample_len, compute_dtype=jnp.dtype(compute_dtype_name),
    )
    return jax.jit(run)


def _greedy_window_fn(dims, cfg: FilterConfig, bucket: int, sample_len: int, compute_dtype_name: str, kv_quant: bool = False, int8_encoder: bool = False):
    """The un-jitted whole-window function: encoder + cross-KV + prefill +
    decode loop. Callers jit it directly (_build_greedy_window) or wrap it
    in shard_map for data-parallel serving (parallel/serving.py)."""
    from .models import whisper as W

    compute_dtype = jnp.dtype(compute_dtype_name)

    def run(params, mel, initial_tokens, valid_len, sot_index, no_speech_token, temperature, rng_seed):
        feats = W.encoder_apply(params, dims, mel.astype(compute_dtype), compute_dtype, int8_linears=int8_encoder)
        # the decode loop reads the int8 store; the prefill reads the
        # PRE-quantization float K/V it already produced (one pass, no
        # dequantized f32 copy in HBM — quantize_cross_kv docstring).
        # Under kv_quant the float K/V stays UNstacked (per-layer tuples):
        # only the int8 halves pay the (L, ...) stacking copies.
        cross_f = W.precompute_cross_kv(params, dims, feats, stack=not kv_quant)
        cross_kv = W.quantize_cross_kv(cross_f) if kv_quant else cross_f
        return _greedy_program(
            params, cross_kv, initial_tokens, valid_len, sot_index,
            no_speech_token, temperature, rng_seed,
            dims=dims, cfg=cfg, bucket=bucket, sample_len=sample_len,
            compute_dtype=compute_dtype,
            cross_kv_prefill=cross_f if kv_quant else None,
        )

    return run


@lru_cache(maxsize=64)
def _build_greedy_window(dims, cfg: FilterConfig, bucket: int, sample_len: int, compute_dtype_name: str, kv_quant: bool = False, int8_encoder: bool = False):
    """Like _build_greedy_loop but takes the MEL and runs the whole window
    as ONE XLA program — one dispatch per 30 s window instead of two (each
    dispatch costs real milliseconds of handle marshalling on a
    remote-attached chip)."""
    return jax.jit(_greedy_window_fn(dims, cfg, bucket, sample_len, compute_dtype_name, kv_quant, int8_encoder))


def _greedy_program(params, cross_kv, initial_tokens, valid_len, sot_index,
                    no_speech_token, temperature, rng_seed, *,
                    dims, cfg: FilterConfig, bucket: int, sample_len: int,
                    compute_dtype, cross_kv_prefill=None):
    from .models import whisper as W

    buf_len = bucket + sample_len
    # cache bounded to the decode horizon, 128-aligned for TPU tiling
    # (16-sublane alignment was tried and REGRESSED: 80-slot caches made
    # the decode program 2x slower — XLA re-lays-out the non-128 carries)
    cache_len = min(dims.n_text_ctx, ((buf_len + 127) // 128) * 128)

    rng = jax.random.PRNGKey(rng_seed)
    B = initial_tokens.shape[0]
    if "k_scale" in cross_kv:  # kv_quant: int8 self cache too
        cache = W.init_kv_cache_i8(dims, B, ctx=cache_len)
    else:
        cache = W.init_kv_cache(dims, B, compute_dtype, ctx=cache_len)

    prefill_logits, cache, _ = W.decoder_apply(
        params, dims, initial_tokens,
        cross_kv=cross_kv_prefill if cross_kv_prefill is not None else cross_kv,
        kv_cache=cache, pos_offset=0, compute_dtype=compute_dtype,
    )  # (B, bucket, V) fp32

    # no-speech probability from the SOT position of the first forward
    # pass (reference decoding.py:689-693)
    probs_at_sot = jax.nn.softmax(
        jnp.take_along_axis(
            prefill_logits, sot_index[None, None, None].astype(jnp.int32), axis=1
        )[:, 0],
        axis=-1,
    )
    no_speech_probs = jnp.where(
        no_speech_token >= 0,
        probs_at_sot[:, jnp.maximum(no_speech_token, 0)],
        jnp.nan,
    )

    first_logits = jnp.take_along_axis(
        prefill_logits, (valid_len - 1)[None, None, None].astype(jnp.int32), axis=1
    )[:, 0]

    # carried/materialized per-step logits in the compute dtype (f32
    # accumulation, rounded store — halves ~24 ms/window of (B, V) fp32 HBM
    # traffic at B=192 base under bf16); fp32 compute (the CPU differential
    # parity path) keeps the fp32 logit contract bit-for-bit
    ldt = jnp.dtype(compute_dtype)
    first_logits = first_logits.astype(ldt)

    tokens_buf = jnp.concatenate(
        [initial_tokens, jnp.full((B, sample_len), cfg.eot, jnp.int32)], axis=1
    )

    state = dict(
        i=jnp.asarray(0, jnp.int32),
        logits=first_logits,
        cache=cache,
        buf=tokens_buf,
        sum_lp=jnp.zeros((B,), _F32),
        prev=jnp.full((B,), -1, jnp.int32),
        penult=jnp.full((B,), -1, jnp.int32),
        last_ts=jnp.full((B,), -1, jnp.int32),
        finished=jnp.zeros((B,), bool),
        rng=rng,
    )

    def cond(s):
        pos = valid_len + s["i"]
        return (s["i"] < sample_len) & (~jnp.all(s["finished"])) & (pos < dims.n_text_ctx)

    def body(s):
        logits = _apply_filters(cfg, s["logits"], s["i"], s["prev"], s["penult"], s["last_ts"])

        rng, sub = jax.random.split(s["rng"])
        # lax.cond so the t=0 ladder rung doesn't pay for gumbel noise
        # over the whole vocab every step (both branches compile once;
        # only one executes per call)
        next_tok = jax.lax.cond(
            temperature == 0.0,
            lambda: jnp.argmax(logits, axis=-1).astype(jnp.int32),
            lambda: jax.random.categorical(
                sub, logits.astype(_F32) / jnp.maximum(temperature, 1e-6), axis=-1
            ).astype(jnp.int32),
        )

        # chosen-token logprob without materializing log_softmax: the
        # reference's logprobs[next] (GreedyDecoder.update,
        # decoding.py:283-285) equals logits[next] - logsumexp(logits).
        # Reductions + a (B,) gather replace two full (B, V) fp32 HBM
        # round-trips per step (~0.4 ms/step at B=192 base).
        lse = jax.nn.logsumexp(logits.astype(_F32), axis=-1)
        chosen = jnp.take_along_axis(logits, next_tok[:, None], axis=1)[:, 0]
        cur_lp = chosen.astype(_F32) - lse
        # freeze finished rows: force EOT, stop accumulating logprob
        # (reference GreedyDecoder.update, decoding.py:277-293)
        sum_lp = s["sum_lp"] + jnp.where(s["finished"], 0.0, cur_lp)
        next_tok = jnp.where(s["finished"], cfg.eot, next_tok)
        finished = s["finished"] | (next_tok == cfg.eot)

        pos = valid_len + s["i"]
        buf = jax.lax.dynamic_update_slice(
            s["buf"], next_tok[:, None], (0, pos)
        )

        is_ts = next_tok >= cfg.timestamp_begin
        last_ts = jnp.where(is_ts & ~s["finished"], next_tok, s["last_ts"])

        # the token we just emitted sits at absolute position `pos`; one
        # decoder step at that position yields the next distribution
        step_logits, cache, _ = W.decoder_apply(
            params, dims, next_tok[:, None], cross_kv=cross_kv,
            kv_cache=s["cache"], pos_offset=pos,
            compute_dtype=compute_dtype, logits_dtype=ldt,
        )
        return dict(
            i=s["i"] + 1,
            logits=step_logits[:, 0],
            cache=cache,
            buf=buf,
            sum_lp=sum_lp,
            prev=next_tok,
            penult=s["prev"],
            last_ts=last_ts,
            finished=finished,
            rng=rng,
        )

    final = jax.lax.while_loop(cond, body, state)
    return final["buf"], final["sum_lp"], no_speech_probs, final["i"]


# ---------------------------------------------------------------------------
# jitted encoder / single-pass helpers
# ---------------------------------------------------------------------------


def _clear_program_caches() -> None:
    """Drop every cached jitted program so the next build re-traces with the
    current kernel flags (the builders read models.whisper._FLASH at trace
    time)."""
    for b in (
        _build_greedy_loop,
        _build_greedy_window,
        _build_encoder,
        _build_cross_kv,
        _build_single_token_logits,
    ):
        b.cache_clear()
    from . import beam as _beam

    _beam._build_beam_loop.cache_clear()
    _beam._build_beam_window.cache_clear()
    from .parallel import serving as _serving

    _serving._build_dp_greedy.cache_clear()
    _serving._build_dp_beam.cache_clear()


@lru_cache(maxsize=32)
def _build_encoder(dims, compute_dtype_name: str, kv_quant: bool = False, int8_encoder: bool = False):
    from .models import whisper as W

    compute_dtype = jnp.dtype(compute_dtype_name)

    def run(params, mel):
        feats = W.encoder_apply(params, dims, mel, compute_dtype, int8_linears=int8_encoder)
        cross_kv = W.precompute_cross_kv(params, dims, feats, quantize=kv_quant)
        return feats, cross_kv

    return jax.jit(run)


@lru_cache(maxsize=32)
def _build_cross_kv(dims, compute_dtype_name: str, kv_quant: bool = False):
    """Cross-KV projection for callers that already hold encoder features
    (cached: a fresh jit(lambda) per call would recompile every time)."""
    from .models import whisper as W

    def run(params, feats):
        return W.precompute_cross_kv(params, dims, feats, quantize=kv_quant)

    return jax.jit(run)


@lru_cache(maxsize=32)
def _build_single_token_logits(dims, compute_dtype_name: str):
    """One decoder forward over a single token (for language detection)."""
    from .models import whisper as W

    compute_dtype = jnp.dtype(compute_dtype_name)

    def run(params, tokens, feats):
        logits, _, _ = W.decoder_apply(
            params, dims, tokens, feats, compute_dtype=compute_dtype
        )
        return logits[:, 0]

    return jax.jit(run)


def detect_language(
    model: "WhisperModel", mel: jnp.ndarray, tokenizer: Optional[Tokenizer] = None
):
    """Detect the spoken language (reference `decoding.py:18-77`).

    Accepts either mel spectrograms (..., n_mels, 3000) or already-encoded
    audio features (..., n_audio_ctx, n_audio_state).
    """
    if tokenizer is None:
        tokenizer = get_tokenizer(
            model.is_multilingual,
            num_languages=model.num_languages,
            include_diseases=model.has_disease_tokens,
        )
    if tokenizer.language is None or tokenizer.language_token not in tokenizer.sot_sequence:
        raise ValueError("This model doesn't have language tokens so it can't perform lang id")

    mel = jnp.asarray(mel)
    single = mel.ndim == 2
    if single:
        mel = mel[None]

    dtype_name = jnp.dtype(model.compute_dtype).name
    if mel.shape[-2:] != (model.dims.n_audio_ctx, model.dims.n_audio_state):
        feats, _ = _build_encoder(model.dims, dtype_name)(model.params, mel)
    else:
        feats = mel.astype(model.compute_dtype)

    n_audio = feats.shape[0]
    x = jnp.full((n_audio, 1), tokenizer.sot, jnp.int32)
    logits = _build_single_token_logits(model.dims, dtype_name)(model.params, x, feats)

    mask = np.full((logits.shape[-1],), True)
    mask[list(tokenizer.all_language_tokens)] = False
    logits = jnp.where(jnp.asarray(mask)[None, :], _NEG, logits)
    language_tokens = np.asarray(jnp.argmax(logits, axis=-1))
    language_token_probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    language_probs = [
        {
            c: float(language_token_probs[i, j])
            for j, c in zip(tokenizer.all_language_tokens, tokenizer.all_language_codes)
        }
        for i in range(n_audio)
    ]
    if single:
        return int(language_tokens[0]), language_probs[0]
    return language_tokens, language_probs


# ---------------------------------------------------------------------------
# sequence ranking (host-side; tiny)
# ---------------------------------------------------------------------------


class MaximumLikelihoodRanker:
    """Pick the best candidate per audio using length-normalized logprob or
    the Google NMT length penalty (reference decoding.py:190-213)."""

    def __init__(self, length_penalty: Optional[float]):
        self.length_penalty = length_penalty

    def rank(self, tokens: List[List[List[int]]], sum_logprobs: List[List[float]]) -> List[int]:
        def scores(logprobs, lengths):
            result = []
            for logprob, length in zip(logprobs, lengths):
                if self.length_penalty is None:
                    penalty = length
                else:
                    penalty = ((5 + length) / 6) ** self.length_penalty
                result.append(logprob / penalty)
            return result

        lengths = [[len(t) for t in s] for s in tokens]
        return [int(np.argmax(scores(p, l))) for p, l in zip(sum_logprobs, lengths)]


# ---------------------------------------------------------------------------
# the decoding task
# ---------------------------------------------------------------------------


class DecodingTask:
    """Orchestrates one batched 30s-window decode (reference decoding.py:508).

    Host code handles option plumbing and result assembly; all compute is in
    the cached jitted programs above.
    """

    def __init__(self, model: "WhisperModel", options: DecodingOptions):
        self.model = model

        if options.language is not None:
            # accept names/any case ("Spanish", "ES") like upstream whisper;
            # results and downstream comparisons carry the code
            normalized = normalize_language(options.language)
            if normalized != options.language:
                options = replace(options, language=normalized)
        language = options.language or "en"
        tokenizer = get_tokenizer(
            model.is_multilingual,
            num_languages=model.num_languages,
            language=language,
            task=options.task,
            include_diseases=model.has_disease_tokens,
        )
        self.tokenizer = tokenizer
        self.options = self._verify_options(options)

        self.n_group: int = options.beam_size or options.best_of or 1
        self.n_ctx: int = model.dims.n_text_ctx
        self.sample_len: int = options.sample_len or model.dims.n_text_ctx // 2

        self.sot_sequence = tokenizer.sot_sequence
        if self.options.without_timestamps:
            self.sot_sequence = tokenizer.sot_sequence_including_notimestamps

        self.initial_tokens: Tuple[int, ...] = self._get_initial_tokens()
        self.sample_begin: int = len(self.initial_tokens)
        self.sot_index: int = self.initial_tokens.index(tokenizer.sot)

        max_initial_timestamp_index = -1
        if not options.without_timestamps and options.max_initial_timestamp:
            precision = CHUNK_LENGTH / model.dims.n_audio_ctx  # 0.02 s
            max_initial_timestamp_index = round(options.max_initial_timestamp / precision)

        self.filter_cfg = FilterConfig(
            n_vocab=model.dims.n_vocab,
            eot=tokenizer.eot,
            timestamp_begin=tokenizer.timestamp_begin,
            no_timestamps=tokenizer.no_timestamps,
            blank_tokens=tuple(tokenizer.encode(" ") + [tokenizer.eot]),
            suppress_tokens=self._get_suppress_tokens(),
            suppress_blank=bool(options.suppress_blank),
            apply_timestamp_rules=not options.without_timestamps,
            max_initial_timestamp_index=max_initial_timestamp_index,
        )

        self.compute_dtype = (
            model.compute_dtype if options.fp16 else jnp.float32
        )
        self._dtype_name = jnp.dtype(self.compute_dtype).name
        self.kv_quant = bool(options.kv_quant)
        self.int8_encoder = bool(options.int8_encoder)

    # --- option/initial-token plumbing (reference decoding.py:572-642) -----

    def _verify_options(self, options: DecodingOptions) -> DecodingOptions:
        if options.beam_size is not None and options.beam_size < 1:
            raise ValueError(f"beam_size must be >= 1, got {options.beam_size}")
        if options.best_of is not None and options.best_of < 1:
            raise ValueError(f"best_of must be >= 1, got {options.best_of}")
        if options.patience is not None and options.patience < 1:
            raise ValueError(f"patience must be >= 1.0, got {options.patience}")
        if options.beam_size is not None and options.best_of is not None:
            raise ValueError("beam_size and best_of can't be given together")
        if options.temperature == 0 and options.best_of is not None:
            raise ValueError("best_of with greedy sampling (T=0) is not compatible")
        if options.patience is not None and options.beam_size is None:
            raise ValueError("patience requires beam_size to be given")
        if options.length_penalty is not None and not (0 <= options.length_penalty <= 1):
            raise ValueError("length_penalty (alpha) should be a value between 0 and 1")
        return options

    def _get_initial_tokens(self) -> Tuple[int, ...]:
        tokens = list(self.sot_sequence)

        if prefix := self.options.prefix:
            prefix_tokens = (
                self.tokenizer.encode(" " + prefix.strip())
                if isinstance(prefix, str)
                else list(prefix)
            )
            if self.sample_len is not None:
                max_prefix_len = self.n_ctx // 2 - self.sample_len
                prefix_tokens = prefix_tokens[-max_prefix_len:]
            tokens = tokens + prefix_tokens

        if prompt := self.options.prompt:
            prompt_tokens = (
                self.tokenizer.encode(" " + prompt.strip())
                if isinstance(prompt, str)
                else list(prompt)
            )
            tokens = (
                [self.tokenizer.sot_prev]
                + prompt_tokens[-(self.n_ctx // 2 - 1):]
                + tokens
            )

        # the static prompt buckets top out at _PROMPT_BUCKETS[-1]; with the
        # default sample_len the reference's prefix-truncation rule keeps
        # everything (prefix_tokens[-0:]), which would overflow the bucket —
        # trim the leading prompt/prefix context instead of crashing, but
        # never drop the SOT sequence itself
        limit = _PROMPT_BUCKETS[-1]
        if len(tokens) > limit:
            sot = self.tokenizer.sot
            sot_at = tokens.index(sot)
            tail = tokens[sot_at:]
            if len(tail) > limit:
                raise ValueError(
                    f"prefix too long: {len(tail) - len(self.sot_sequence)} tokens "
                    f"exceed the decoder's {limit}-token prompt budget"
                )
            tokens = tokens[sot_at - (limit - len(tail)):] if limit > len(tail) else tail
            if tokens[0] != self.tokenizer.sot_prev and sot_at > 0:
                tokens = [self.tokenizer.sot_prev] + tokens[1:]

        return tuple(tokens)

    def _get_suppress_tokens(self) -> Tuple[int, ...]:
        suppress_tokens = self.options.suppress_tokens
        if isinstance(suppress_tokens, str):
            suppress_tokens = [int(t) for t in suppress_tokens.split(",")]
        if suppress_tokens is None:
            suppress_tokens = []
        else:
            suppress_tokens = list(suppress_tokens)
        if -1 in suppress_tokens:
            suppress_tokens = [t for t in suppress_tokens if t >= 0]
            suppress_tokens.extend(self.tokenizer.non_speech_tokens)

        suppress_tokens.extend(
            [
                self.tokenizer.transcribe,
                self.tokenizer.translate,
                self.tokenizer.sot,
                self.tokenizer.sot_prev,
                self.tokenizer.sot_lm,
            ]
        )
        if self.tokenizer.no_speech is not None:
            suppress_tokens.append(self.tokenizer.no_speech)
        return tuple(sorted(set(suppress_tokens)))

    # --- run ----------------------------------------------------------------

    def _encode_audio(self, mel: jnp.ndarray):
        if mel.shape[-2:] == (self.model.dims.n_audio_ctx, self.model.dims.n_audio_state):
            feats = mel.astype(self.compute_dtype)
            cross_kv = _build_cross_kv(self.model.dims, self._dtype_name, self.kv_quant)(
                self.model.params, feats
            )
            return feats, cross_kv
        enc = _build_encoder(
            self.model.dims, self._dtype_name, self.kv_quant, self.int8_encoder
        )
        b = mel.shape[0]
        # the standalone encoder program's transients scale with its batch
        # (~17.6 GB at 320 base windows on the round-5 server compiler —
        # over HBM); above the cap, dispatch even sub-batches of ONE compiled
        # shape and concatenate on device. The decode program's inputs
        # (feats + cross-KV) are identical, outputs bit-identical, and the
        # chunk dispatches pipeline asynchronously like everything else.
        cap = int(os.environ.get("ASRMTL_ENCODE_CHUNK", "160"))
        if cap <= 0 or b <= cap:
            return enc(self.model.params, mel)
        n_chunks = -(-b // cap)
        csize = -(-b // n_chunks)
        feats_parts, kv_parts = [], []
        for i in range(0, b, csize):
            sub = mel[i : i + csize]
            real = sub.shape[0]
            if real < csize:  # pad the tail chunk to the one program shape
                sub = jnp.concatenate(
                    [sub, jnp.broadcast_to(sub[-1:], (csize - real,) + sub.shape[1:])]
                )
            f, kv = enc(self.model.params, sub)
            if real < csize:
                f = f[:real]
                kv = jax.tree.map(lambda a: a[:, :real], kv)  # batch axis 1 (L-stacked)
            feats_parts.append(f)
            kv_parts.append(kv)
        feats = jnp.concatenate(feats_parts, axis=0)
        cross_kv = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1), *kv_parts)
        return feats, cross_kv

    def run(
        self, mel: jnp.ndarray, rng_seed: int = 0, _disabled: tuple = ()
    ) -> List[DecodingResult]:
        """Decode one batch of 30 s windows; on a Pallas kernel
        compile/launch failure, disable the custom kernels and retry once on
        the plain XLA paths (the reference does the same for Triton launch
        failures, timing.py:41-46 — never crash on a kernel problem).

        `_disabled` is the ladder's own memory of which kernels IT already
        turned off: the recursion is bounded by |{flash, decode}| retries
        even if a stale/mislabeled Mosaic message keeps naming a kernel
        that is already disabled."""
        try:
            return self._run(mel, rng_seed)
        except Exception as e:
            from .models import whisper as W

            use_dk, _ = W._decode_kernel_state()
            if not (use_dk or W._FLASH["enabled"]):
                raise  # kernels already off: a real error
            # only retry when the failure is actually the custom kernels —
            # backend contention / OOM / remote-compile errors must propagate
            # without permanently degrading the whole process to XLA paths
            msg = f"{type(e).__name__}: {e}"
            low = msg.lower()
            # 'custom_call' alone is too generic (appears in unrelated XLA
            # runtime errors); require a Mosaic/Pallas-specific marker
            kernel_markers = ("mosaic", "pallas", "tpu_custom_call")
            if not any(m in low for m in kernel_markers):
                raise
            import warnings

            # disable only the kernel the error names (Pallas failures carry
            # the pallas_call's kernel name in the op path; match lowercased
            # like the marker check) — a flash-encoder compile failure at one
            # model geometry must not degrade the decode kernel for the whole
            # process, and vice versa
            failed = set()
            if "flash_attention" in low:
                failed.add("flash")
            if "decode_attention" in low:
                failed.add("decode")
            if not failed:
                failed = {"flash", "decode"}  # unattributed: both off
            newly = failed - set(_disabled)
            if not newly:
                # every kernel this error names was already disabled by this
                # ladder — retrying again cannot change anything
                raise
            warnings.warn(
                f"custom TPU kernel path failed ({msg}); retrying with "
                + ("plain XLA attention" if newly == {"flash", "decode"}
                   else "the flash kernel off" if newly == {"flash"}
                   else "the decode kernel off")
            )
            if "decode" in newly:
                W.set_decode_kernel("off")
            if "flash" in newly:
                W.set_flash_attention(False)
            _clear_program_caches()
            # re-enter run (not _run) so a DIFFERENT kernel failing during
            # the retry gets its own scoped disable; _disabled bounds the
            # recursion at two retries
            return self.run(mel, rng_seed, _disabled=tuple(set(_disabled) | newly))

    def _run(self, mel: jnp.ndarray, rng_seed: int = 0) -> List[DecodingResult]:
        tokenizer = self.tokenizer
        mel = jnp.asarray(mel)
        n_audio = mel.shape[0]

        # known language: encoder + cross-KV + decode loop (greedy, best-of,
        # or beam) run as ONE fused XLA program (halves dispatch round-trips)
        fused_mel = None
        if (
            self.options.task != "lang_id"
            and self.options.language is not None
            and not self.options.return_audio_features
            and self.options.fuse_encoder
            and mel.shape[-2:]
            != (self.model.dims.n_audio_ctx, self.model.dims.n_audio_state)
        ):
            fused_mel = mel
            feats = cross_kv = None
        else:
            feats, cross_kv = self._encode_audio(mel)

        # language detection, writing detected tokens into the prompt
        # (reference decoding.py:666-678)
        initial = np.tile(np.asarray(self.initial_tokens, np.int32), (n_audio, 1))
        languages = [self.options.language] * n_audio
        language_probs = None
        if self.options.language is None or self.options.task == "lang_id":
            lang_tokens, language_probs = detect_language(self.model, feats, tokenizer)
            languages = [max(probs, key=probs.get) for probs in language_probs]
            if self.options.language is None:
                initial[:, self.sot_index + 1] = np.asarray(lang_tokens)

        if self.options.task == "lang_id":
            feats_np = np.asarray(feats)
            return [
                DecodingResult(audio_features=feats_np[i], language=languages[i],
                               language_probs=language_probs[i])
                for i in range(n_audio)
            ]

        if self.options.beam_size is not None:
            from .beam import run_beam_search

            tokens, sum_logprobs, no_speech_probs = run_beam_search(
                self, feats, cross_kv, initial, fused_mel=fused_mel
            )
        else:
            tokens, sum_logprobs, no_speech_probs = self._run_greedy(
                feats, cross_kv, initial, rng_seed, fused_mel=fused_mel
            )

        feats_np = (
            np.asarray(feats) if self.options.return_audio_features else None
        )
        return self._finalize(tokens, sum_logprobs, no_speech_probs, languages, feats_np)

    def _finalize(self, tokens, sum_logprobs, no_speech_probs, languages,
                  feats_np=None) -> List[DecodingResult]:
        """Rank within each group and assemble results (decoding.py:739-789)."""
        tokenizer = self.tokenizer
        selected = MaximumLikelihoodRanker(self.options.length_penalty).rank(
            tokens, sum_logprobs
        )
        final_tokens: List[List[int]] = [t[i] for i, t in zip(selected, tokens)]
        texts = [tokenizer.decode(t).strip() for t in final_tokens]
        final_sum_lp = [lp[i] for i, lp in zip(selected, sum_logprobs)]
        avg_logprobs = [lp / (len(t) + 1) for t, lp in zip(final_tokens, final_sum_lp)]

        return [
            DecodingResult(
                audio_features=feats_np[i] if feats_np is not None else None,
                language=languages[i],
                tokens=final_tokens[i],
                text=texts[i],
                avg_logprob=avg_logprobs[i],
                no_speech_prob=float(no_speech_probs[i]),
                temperature=self.options.temperature,
                compression_ratio=compression_ratio(texts[i]),
            )
            for i in range(len(tokens))
        ]

    def submit(self, mel: jnp.ndarray, rng_seed: int = 0, feature_sink=None):
        """Dispatch one batch's fused decode program WITHOUT waiting.

        JAX dispatch is asynchronous — run()'s only sync point is the result
        fetch — so submitting batch i+1 before collecting batch i overlaps
        its device execution with batch i's fetch round-trip and host
        assembly (a remote-attached chip otherwise idles tens of ms between
        sequential run() calls). Returns an opaque handle for collect().
        Both the fused greedy and the fused beam programs pipeline; paths
        outside them (language detection, lang_id, return_audio_features)
        fall back to an eager run() inside submit, so submit/collect is
        always safe to use.

        `feature_sink`: with fuse_encoder=False, called with this batch's
        device-resident encoder features (B, n_audio_ctx, D) — words mode
        captures them so the batched alignment forward can skip its second
        encoder pass (transcribe_batch._FeatureStore).
        """
        mel = jnp.asarray(mel)
        fused_ok = (
            self.options.task != "lang_id"
            and self.options.language is not None
            and not self.options.return_audio_features
            and mel.shape[-2:]
            != (self.model.dims.n_audio_ctx, self.model.dims.n_audio_state)
        )
        if not fused_ok:
            return ("done", self.run(mel, rng_seed))
        n_audio = mel.shape[0]
        initial = np.tile(np.asarray(self.initial_tokens, np.int32), (n_audio, 1))
        try:
            # fuse_encoder=False still pipelines: the encoder dispatch below
            # is async too — its outputs feed the decode dispatch without a
            # host sync, just as two programs instead of one
            fused_mel, feats, cross_kv = mel, None, None
            if not self.options.fuse_encoder:
                fused_mel = None
                feats, cross_kv = self._encode_audio(mel)
                if feature_sink is not None:
                    feature_sink(feats)
            if self.options.beam_size is not None:
                from .beam import dispatch_beam

                arrays, meta = dispatch_beam(
                    self, feats, cross_kv, initial, fused_mel=fused_mel
                )
                return ("beam", arrays, meta, mel, rng_seed)
            arrays, meta = self._dispatch_greedy(
                initial, rng_seed, fused_mel, feats=feats, cross_kv=cross_kv
            )
        except Exception:
            # compile-time kernel failures surface here: reuse run()'s
            # fallback-and-retry logic by re-running eagerly
            return ("done", self.run(mel, rng_seed))
        return ("greedy", arrays, meta, mel, rng_seed)

    def collect(self, pending) -> List[DecodingResult]:
        """Fetch + assemble the results of a submit()ed batch."""
        if pending[0] == "done":
            return pending[1]
        kind, arrays, meta, mel, rng_seed = pending
        try:
            if kind == "beam":
                from .beam import collect_beam

                tokens, sum_logprobs, no_speech_probs = collect_beam(self, arrays, meta)
            else:
                tokens, sum_logprobs, no_speech_probs = self._assemble_greedy(
                    *arrays, *meta
                )
        except Exception:
            # async launch failures surface at fetch time; run() owns the
            # kernel-fallback policy (and re-raises non-kernel errors)
            return self.run(mel, rng_seed)
        languages = [self.options.language] * mel.shape[0]
        return self._finalize(tokens, sum_logprobs, no_speech_probs, languages)

    def _run_greedy(self, feats, cross_kv, initial: np.ndarray, rng_seed: int,
                    fused_mel=None):
        arrays, meta = self._dispatch_greedy(
            initial, rng_seed, fused_mel, feats=feats, cross_kv=cross_kv
        )
        return self._assemble_greedy(*arrays, *meta)

    def _dispatch_greedy(self, initial: np.ndarray, rng_seed: int,
                         fused_mel=None, feats=None, cross_kv=None):
        n_audio = initial.shape[0]
        n_group = self.n_group
        if n_group > 1:  # best-of-N sampling: replicate token rows only —
            # the decoder shares one cross-KV row per audio across the group
            # (models/whisper.py kv_group), so the KV is never copied
            initial = np.repeat(initial, n_group, axis=0)

        valid_len = initial.shape[1]
        bucket = _bucket(valid_len)
        padded = np.full((initial.shape[0], bucket), self.tokenizer.eot, np.int32)
        padded[:, :valid_len] = initial

        sample_len = min(self.sample_len, self.n_ctx)
        no_speech = self.tokenizer.no_speech if self.tokenizer.no_speech is not None else -1
        scalars = (
            np.int32(valid_len),
            np.int32(self.sot_index),
            np.int32(no_speech),
            np.float32(self.options.temperature),
            np.int32(rng_seed),
        )
        if fused_mel is not None:
            loop = _build_greedy_window(
                self.model.dims, self.filter_cfg, bucket, sample_len,
                self._dtype_name, self.kv_quant, self.int8_encoder,
            )
            buf, sum_lp, ns_probs, n_sampled = loop(
                self.model.params, fused_mel, padded, *scalars
            )
        else:
            loop = _build_greedy_loop(
                self.model.dims, self.filter_cfg, bucket, sample_len, self._dtype_name
            )
            buf, sum_lp, ns_probs, n_sampled = loop(
                self.model.params, cross_kv, padded, *scalars
            )
        return (buf, sum_lp, ns_probs, n_sampled), (n_audio, n_group, valid_len)

    def _assemble_greedy(self, buf, sum_lp, ns_probs, n_sampled,
                         n_audio: int, n_group: int, valid_len: int):
        """Host post-processing of a greedy program's outputs: slice the
        sampled region and cut at the first EOT (reference decoding.py:749-752).

        The four outputs are packed on device and fetched in ONE round trip
        (fetch_packed): 4 fetches -> 1 cuts ~100 ms off every batched
        window on the remote-attached chip."""
        buf, sum_lp, ns_probs, n_sampled = fetch_packed(buf, sum_lp, ns_probs, n_sampled)
        n_sampled = int(np.max(n_sampled))

        tokens: List[List[List[int]]] = []
        sum_logprobs: List[List[float]] = []
        for a in range(n_audio):
            group_toks, group_lps = [], []
            for g in range(n_group):
                row = buf[a * n_group + g, valid_len : valid_len + n_sampled]
                eots = np.nonzero(row == self.tokenizer.eot)[0]
                end = int(eots[0]) if len(eots) else len(row)
                group_toks.append([int(t) for t in row[:end]])
                group_lps.append(float(sum_lp[a * n_group + g]))
            tokens.append(group_toks)
            sum_logprobs.append(group_lps)
        no_speech_probs = ns_probs.reshape(n_audio, n_group)[:, 0]
        return tokens, sum_logprobs, no_speech_probs


def decode(
    model: "WhisperModel",
    mel: jnp.ndarray,
    options: Optional[DecodingOptions] = None,
    **kwargs,
) -> Union[DecodingResult, List[DecodingResult]]:
    """Decode 30-second audio segment(s) given as mel spectrogram(s)
    (reference decoding.py:792-826)."""
    if options is None:
        options = DecodingOptions()
    mel = jnp.asarray(mel)
    single = mel.ndim == 2
    if single:
        mel = mel[None]
    if kwargs:
        options = replace(options, **kwargs)

    result = DecodingTask(model, options).run(mel)
    return result[0] if single else result
