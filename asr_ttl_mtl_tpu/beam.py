"""Beam search with patience, fully inside XLA.

Behavioral parity with reference `whisper/decoding.py:301-404`
(BeamSearchDecoder): per-beam top-(beam_size+1) candidates, global re-rank,
EOT candidates retire into a finished set capped at
`max_candidates = round(beam_size * patience)` in score order per step
(fill-once, no replacement — matching the reference's dict-capacity logic),
completion when every audio has a full finished set, and finalize() that tops
up unfinished audios from the live beams.

TPU re-design vs the reference:

* The whole search is ONE compiled program: prefill + `lax.while_loop`; no
  per-step host sync, no Python dict bookkeeping.
* Beam state lives in static buffers: tokens (B*K, L), finished sequences
  (B, C, L) written by rank-computed scatter slots.
* The reference rearranges its hook KV cache by gathering per module
  (`decoding.py:172-176`); here the cache is (layers, B*K, ctx, D) and one
  gather along the beam axis does all layers at once.
* The reference's first-step duplicate-candidate dedup (identical initial
  beams collapse in its dict) is reproduced by initializing beams 1..K-1 at
  -inf score, which selects the top-K distinct tokens from beam 0 — the
  standard equivalent formulation.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .decoding import FilterConfig, _apply_filters

_F32 = jnp.float32
_NEG = -1e9
_INVALID = -0.5e9  # scores below this are dead-beam artifacts, never used


@lru_cache(maxsize=32)
def _build_beam_loop(
    dims,
    cfg: FilterConfig,
    bucket: int,
    sample_len: int,
    beam_size: int,
    max_candidates: int,
    compute_dtype_name: str,
):
    """fn(params, cross_kv (B audio rows, shared across beams), initial_tokens
    (B, bucket), valid_len, sot_index, no_speech_token)
      -> (fin_tokens (B, C, L), fin_scores (B, C), fin_count (B,),
          live_buf (B*K, L), live_sum_lp (B*K,), no_speech_probs (B,), n_sampled)
    """
    run = partial(
        _beam_program, dims=dims, cfg=cfg, bucket=bucket, sample_len=sample_len,
        beam_size=beam_size, max_candidates=max_candidates,
        compute_dtype=jnp.dtype(compute_dtype_name),
    )
    return jax.jit(run)


def _beam_window_fn(
    dims,
    cfg: FilterConfig,
    bucket: int,
    sample_len: int,
    beam_size: int,
    max_candidates: int,
    compute_dtype_name: str,
    kv_quant: bool = False,
    int8_encoder: bool = False,
):
    """The un-jitted whole-window beam function (encoder + cross-KV + beam
    loop). Callers jit it directly (_build_beam_window) or wrap it in
    shard_map for data-parallel serving (parallel/serving.py)."""
    from .models import whisper as W

    compute_dtype = jnp.dtype(compute_dtype_name)

    def run(params, mel, initial_tokens, valid_len, sot_index, no_speech_token):
        feats = W.encoder_apply(params, dims, mel.astype(compute_dtype), compute_dtype, int8_linears=int8_encoder)
        # prefill reads the pre-quantization float K/V; only the beam loop
        # reads the int8 store (see whisper.quantize_cross_kv docstring).
        # Under kv_quant the float K/V stays UNstacked (per-layer tuples):
        # only the int8 halves pay the (L, ...) stacking copies.
        cross_f = W.precompute_cross_kv(params, dims, feats, stack=not kv_quant)
        cross_kv = W.quantize_cross_kv(cross_f) if kv_quant else cross_f
        return _beam_program(
            params, cross_kv, initial_tokens, valid_len, sot_index,
            no_speech_token, dims=dims, cfg=cfg, bucket=bucket,
            sample_len=sample_len, beam_size=beam_size,
            max_candidates=max_candidates, compute_dtype=compute_dtype,
            cross_kv_prefill=cross_f if kv_quant else None,
        )

    return run


@lru_cache(maxsize=32)
def _build_beam_window(
    dims,
    cfg: FilterConfig,
    bucket: int,
    sample_len: int,
    beam_size: int,
    max_candidates: int,
    compute_dtype_name: str,
    kv_quant: bool = False,
    int8_encoder: bool = False,
):
    """Like _build_beam_loop but takes the MEL: encoder + cross-KV + beam
    search as ONE XLA program — one dispatch per window instead of two."""
    return jax.jit(
        _beam_window_fn(
            dims, cfg, bucket, sample_len, beam_size, max_candidates,
            compute_dtype_name, kv_quant, int8_encoder,
        )
    )


def _beam_program(params, cross_kv, initial_tokens, valid_len, sot_index,
                  no_speech_token, *, dims, cfg: FilterConfig, bucket: int,
                  sample_len: int, beam_size: int, max_candidates: int,
                  compute_dtype, cross_kv_prefill=None):
    from .models import whisper as W

    K, C = beam_size, max_candidates
    buf_len = bucket + sample_len

    def _gather_beam_cache(cache, src, BK):
        """Per-step beam rearrange of the self-attention cache.

        A whole-array axis-1 gather (c[:, src]) made XLA transpose each
        (L, BK, ctx, D) leaf to beam-major, gather, and transpose back —
        measured ~2.6x the gather's own r+w bytes (the round-4 beam
        profile's copy_bitcast/pad_add chain, ~36% of the B=48 int8 step).
        Per-layer axis-0 gathers of the contiguous (BK, ctx, D) slices need
        no relayout: measured at HBM roofline (27 ms vs 104 for the 64-step
        B=48 int8 call). A one-hot int8 MXU matmul permute was also tried
        and REGRESSED — XLA lowers the contraction to s32-materializing
        fusions, not a GEMM. Small leaves (the fp32 scale rows) keep the
        plain gather."""

        def permute(c):
            if c.ndim != 4 or c.shape[1] != BK or c.shape[2] * c.shape[3] < 4096:
                return c[:, src]  # small leaf: gather overhead is noise
            return jnp.stack([c[l][src] for l in range(c.shape[0])], axis=0)

        return jax.tree.map(permute, cache)
    # cache bounded to the decode horizon, 128-aligned for TPU tiling
    # (16-sublane alignment was tried and REGRESSED: 80-slot caches made
    # the decode program 2x slower — XLA re-lays-out the non-128 carries)
    cache_len = min(dims.n_text_ctx, ((buf_len + 127) // 128) * 128)

    # prefill once per AUDIO (beams start identical), then replicate the
    # self-attention cache K-fold — (K-1)/K of the prefill FLOPs saved
    B = initial_tokens.shape[0]
    BK = B * K
    if "k_scale" in cross_kv:  # kv_quant: int8 self cache too
        cache = W.init_kv_cache_i8(dims, B, ctx=cache_len)
    else:
        cache = W.init_kv_cache(dims, B, compute_dtype, ctx=cache_len)

    prefill_logits, cache, _ = W.decoder_apply(
        params, dims, initial_tokens,
        cross_kv=cross_kv_prefill if cross_kv_prefill is not None else cross_kv,
        kv_cache=cache, pos_offset=0, compute_dtype=compute_dtype,
    )
    cache = jax.tree.map(lambda x: jnp.repeat(x, K, axis=1), cache)
    probs_at_sot = jax.nn.softmax(
        jnp.take_along_axis(
            prefill_logits, sot_index[None, None, None].astype(jnp.int32), axis=1
        )[:, 0],
        axis=-1,
    )
    no_speech_probs = jnp.where(
        no_speech_token >= 0, probs_at_sot[:, jnp.maximum(no_speech_token, 0)], jnp.nan
    )  # (B,)
    first_logits = jnp.repeat(
        jnp.take_along_axis(
            prefill_logits, (valid_len - 1)[None, None, None].astype(jnp.int32), axis=1
        )[:, 0],
        K,
        axis=0,
    )
    # carried/materialized per-step logits in bf16 under bf16 compute (see
    # decoding._greedy_program) — the ranking math below stays fp32: the
    # materialized log_softmax and all candidate scores are fp32 (matching
    # the reference's logits.float() log_softmax, decoding.py:341)
    ldt = jnp.dtype(compute_dtype)
    first_logits = first_logits.astype(ldt)

    tokens_buf = jnp.concatenate(
        [jnp.repeat(initial_tokens, K, axis=0),
         jnp.full((BK, sample_len), cfg.eot, jnp.int32)], axis=1
    )
    # only beam 0 is live at the start (see module docstring)
    sum_lp = jnp.tile(
        jnp.asarray([0.0] + [_NEG] * (K - 1), _F32), (B,)
    )

    state = dict(
        i=jnp.asarray(0, jnp.int32),
        logits=first_logits,
        cache=cache,
        buf=tokens_buf,
        sum_lp=sum_lp,
        prev=jnp.full((BK,), -1, jnp.int32),
        penult=jnp.full((BK,), -1, jnp.int32),
        last_ts=jnp.full((BK,), -1, jnp.int32),
        fin_tokens=jnp.full((B, C + 1, buf_len), cfg.eot, jnp.int32),
        fin_scores=jnp.full((B, C + 1), -jnp.inf, _F32),
        fin_count=jnp.zeros((B,), jnp.int32),
    )

    def cond(s):
        pos = valid_len + s["i"]
        done = jnp.all(s["fin_count"] >= C)
        return (s["i"] < sample_len) & (~done) & (pos < dims.n_text_ctx)

    def body(s):
        pos = valid_len + s["i"]
        logits = _apply_filters(cfg, s["logits"], s["i"], s["prev"], s["penult"], s["last_ts"])

        # per-beam top-(K+1) candidates (reference decoding.py:342).
        # lax.top_k over the (BK, ~52k) fp32 logprobs lowers to a multi-pass
        # routine at ~64 GB/s (23 ms of the 291 ms B=48 int8 call) plus a
        # materialized log_softmax; the Pallas kernel reads the filtered
        # logits ONCE, computes the log_softmax row stats in VMEM, and
        # returns exact indices with logprob values within ~1 ulp of the
        # lax.top_k fallback (different logsumexp reduction order — see
        # ops/pallas_topk.py); near-exact ties between candidates can
        # therefore resolve differently with the kernel on vs off.
        # Gated by the decode-kernel switch like the other loop kernels
        # ("interpret" drives the CPU integration tests).
        use_tk, tk_interp = W._decode_kernel_state()
        if use_tk:
            from .ops.pallas_topk import topk_logprobs_pallas

            top_lp, top_tok = topk_logprobs_pallas(
                logits, K + 1, interpret=tk_interp
            )
        else:
            # materialize log_softmax BEFORE top_k: XLA's multi-pass top_k
            # fuses its producer, so feeding it the raw filter fusion
            # re-executes the whole mask chain per pass (measured 2x slower)
            logprobs = jax.nn.log_softmax(logits.astype(_F32), axis=-1)
            top_lp, top_tok = jax.lax.top_k(logprobs, K + 1)  # (BK, K+1)
        cand_scores = (s["sum_lp"][:, None] + top_lp).reshape(B, K * (K + 1))
        cand_tok = top_tok.reshape(B, K * (K + 1))
        cand_parent = jnp.repeat(jnp.arange(K), K + 1)[None, :].repeat(B, 0)

        # global sort: descending score (stable)
        order = jnp.argsort(-cand_scores, axis=1, stable=True)
        cand_scores = jnp.take_along_axis(cand_scores, order, axis=1)
        cand_tok = jnp.take_along_axis(cand_tok, order, axis=1)
        cand_parent = jnp.take_along_axis(cand_parent, order, axis=1)

        valid = cand_scores > _INVALID
        is_eot = (cand_tok == cfg.eot) & valid

        # --- next K live beams: best non-EOT candidates in score order ---
        keep = (~is_eot) & valid
        keep_cum = jnp.cumsum(keep.astype(jnp.int32), axis=1)  # inclusive
        keep_rank = keep_cum - 1
        selected = keep & (keep_rank < K)
        # the reference stops scanning candidates once K beams are saved
        # (decoding.py:350-360), so EOT candidates ranked below the K-th
        # kept one never reach the finished set
        is_eot = is_eot & (keep_cum < K)
        # compact the selected candidates to the front, preserving order
        comp = jnp.argsort(~selected, axis=1, stable=True)[:, :K]  # (B, K)
        new_scores = jnp.take_along_axis(cand_scores, comp, axis=1)  # (B, K)
        new_tok = jnp.take_along_axis(cand_tok, comp, axis=1)
        new_parent = jnp.take_along_axis(cand_parent, comp, axis=1)

        src = (new_parent + jnp.arange(B)[:, None] * K).reshape(BK)  # global rows
        buf = s["buf"][src]
        buf = jax.lax.dynamic_update_slice(buf, new_tok.reshape(BK, 1), (0, pos))
        cache = _gather_beam_cache(s["cache"], src, BK)
        new_sum_lp = new_scores.reshape(BK)

        prev = new_tok.reshape(BK)
        penult = s["prev"][src]
        is_ts = prev >= cfg.timestamp_begin
        last_ts = jnp.where(is_ts, prev, s["last_ts"][src])

        # --- retire EOT candidates into the finished set ---------------
        eot_rank = jnp.cumsum(is_eot.astype(jnp.int32), axis=1) - 1
        slot = jnp.where(is_eot, s["fin_count"][:, None] + eot_rank, C)
        slot = jnp.minimum(slot, C)  # overflow -> scratch slot C
        # finished sequence = parent row with EOT at `pos`
        parent_rows = s["buf"].reshape(B, K, buf_len)[
            jnp.arange(B)[:, None], cand_parent
        ]  # (B, K*(K+1), L)
        parent_rows = jax.lax.dynamic_update_slice(
            parent_rows,
            jnp.full((B, K * (K + 1), 1), cfg.eot, jnp.int32),
            (0, 0, pos),
        )
        fin_tokens = s["fin_tokens"].at[jnp.arange(B)[:, None], slot].set(parent_rows)
        fin_scores = s["fin_scores"].at[jnp.arange(B)[:, None], slot].set(cand_scores)
        fin_count = jnp.minimum(
            s["fin_count"] + is_eot.sum(axis=1).astype(jnp.int32), C
        )
        # scratch slot stays inert
        fin_tokens = fin_tokens.at[:, C].set(cfg.eot)
        fin_scores = fin_scores.at[:, C].set(-jnp.inf)

        step_logits, cache, _ = W.decoder_apply(
            params, dims, prev[:, None], cross_kv=cross_kv,
            kv_cache=cache, pos_offset=pos, compute_dtype=compute_dtype,
            logits_dtype=ldt,
        )
        return dict(
            i=s["i"] + 1,
            logits=step_logits[:, 0],
            cache=cache,
            buf=buf,
            sum_lp=new_sum_lp,
            prev=prev,
            penult=penult,
            last_ts=last_ts,
            fin_tokens=fin_tokens,
            fin_scores=fin_scores,
            fin_count=fin_count,
        )

    final = jax.lax.while_loop(cond, body, state)
    return (
        final["fin_tokens"][:, :C],
        final["fin_scores"][:, :C],
        final["fin_count"],
        final["buf"],
        final["sum_lp"],
        no_speech_probs,
        final["i"],
    )



def run_beam_search(
    task, feats, cross_kv, initial: np.ndarray, fused_mel=None
) -> Tuple[List[List[List[int]]], List[List[float]], np.ndarray]:
    """Returns (tokens, sum_logprobs, no_speech_probs) in DecodingTask.run's
    group format (one candidate list per audio).

    With fused_mel, the encoder runs inside the same XLA program as the beam
    loop (one dispatch per window instead of two)."""
    outs, meta = dispatch_beam(task, feats, cross_kv, initial, fused_mel)
    return collect_beam(task, outs, meta)


def dispatch_beam(task, feats, cross_kv, initial: np.ndarray, fused_mel=None):
    """Launch the beam program WITHOUT fetching: JAX dispatch is async, so
    the returned device arrays let DecodingTask.submit()/collect() overlap
    batch i+1's beam execution with batch i's fetch + host assembly, exactly
    like the greedy pipeline. Returns (device outputs, assemble metadata)."""
    options = task.options
    K = options.beam_size
    patience = options.patience or 1.0
    C = round(K * patience)
    assert C > 0, f"Invalid beam size ({K}) or patience ({patience})"

    n_audio = initial.shape[0]
    # initial tokens and cross_kv stay at n_audio rows: prefill runs once per
    # audio, and the decoder maps beam row a*K+k to cross-KV row a
    # (models/whisper.py kv_group) — K-fold less HBM traffic in decode
    # cross-attention, which dominates the beam step

    valid_len = initial.shape[1]
    from .decoding import _bucket

    bucket = _bucket(valid_len)
    padded = np.full((initial.shape[0], bucket), task.tokenizer.eot, np.int32)
    padded[:, :valid_len] = initial

    sample_len = min(task.sample_len, task.n_ctx)
    no_speech = task.tokenizer.no_speech if task.tokenizer.no_speech is not None else -1
    scalars = (np.int32(valid_len), np.int32(task.sot_index), np.int32(no_speech))
    if fused_mel is not None:
        loop = _build_beam_window(
            task.model.dims, task.filter_cfg, bucket, sample_len, K, C,
            task._dtype_name, task.kv_quant, task.int8_encoder,
        )
        outs = loop(task.model.params, fused_mel, padded, *scalars)
    else:
        loop = _build_beam_loop(
            task.model.dims, task.filter_cfg, bucket, sample_len, K, C, task._dtype_name
        )
        outs = loop(task.model.params, cross_kv, padded, *scalars)
    return outs, (n_audio, K, valid_len)


def collect_beam(task, outs, meta):
    """Fetch (one round trip) + host-assemble a dispatch_beam launch."""
    n_audio, K, valid_len = meta
    # single-round-trip fetch of all seven outputs (see decoding.fetch_packed)
    from .decoding import fetch_packed

    outs = fetch_packed(*outs)
    return assemble_beam_results(outs, n_audio, K, valid_len, task.tokenizer.eot)


def assemble_beam_results(outs, n_audio: int, K: int, valid_len: int, eot: int):
    """Host-side finalize over fetched beam-program outputs: EOT-slice the
    finished sequences and top up short finished sets from the live beams
    (reference decoding.py:384-395). Shared by the single-device path and the
    dp-sharded serving path."""
    fin_tokens, fin_scores, fin_count, live_buf, live_sum_lp, ns_probs, n_sampled = outs
    live_buf = np.asarray(live_buf).reshape(n_audio, K, -1)
    live_sum_lp = np.asarray(live_sum_lp).reshape(n_audio, K)
    fin_tokens, fin_scores, fin_count = map(np.asarray, (fin_tokens, fin_scores, fin_count))
    # per-shard step counts under shard_map: the global horizon is their max
    # (rows past a shard's own count are EOT-filled)
    n_sampled = int(np.max(n_sampled))

    def slice_sampled(row) -> List[int]:
        sampled = row[valid_len : valid_len + n_sampled + 1]
        ends = np.nonzero(sampled == eot)[0]
        end = int(ends[0]) if len(ends) else len(sampled)
        return [int(t) for t in sampled[:end]]

    tokens: List[List[List[int]]] = []
    sum_logprobs: List[List[float]] = []
    for a in range(n_audio):
        seqs = [slice_sampled(fin_tokens[a, c]) for c in range(int(fin_count[a]))]
        scores = [float(fin_scores[a, c]) for c in range(int(fin_count[a]))]
        if len(seqs) < K:
            # top up from live beams, best first (reference decoding.py:384-395)
            for j in np.argsort(live_sum_lp[a])[::-1]:
                if len(seqs) >= K:
                    break
                if live_sum_lp[a, j] <= _INVALID:
                    continue
                seqs.append(slice_sampled(live_buf[a, j]))
                scores.append(float(live_sum_lp[a, j]))
        tokens.append(seqs)
        sum_logprobs.append(scores)

    no_speech_probs = np.asarray(ns_probs).reshape(n_audio)
    return tokens, sum_logprobs, no_speech_probs
