"""Multi-task trainer: joint ASR + speech-disorder-classification fine-tune.

Behavioral parity with reference `speech_disorder/trainer.py:16-629`:
disease-token vocab expansion, mean-pooled-encoder classifier head
(Linear(d, d/2) -> ReLU -> Dropout(0.1) -> Linear(d/2, 3)), 4-group AdamW
(encoder 0.1x lr, decoder 0.3x, embeddings 1x/no-decay, classifier 1x),
one-shot inverse-loss alpha/beta, global-norm grad clip, best-val-loss
checkpointing with early stopping, teacher-forced evaluation metrics, and
`.pt` checkpoints that are byte-compatible with the reference's
(`trainer.py:568-586`) so either stack can load the other's models.

TPU-first design:
* One jitted train step = device log-mel + encoder + both heads + backward +
  optax update; executed under a ('dp','tp') mesh with batch sharded over dp
  (XLA inserts the gradient psum over ICI). Master params fp32; forward in
  bf16 on TPU.
* Input pipeline ships raw waveforms (see mtl/dataset.py); no per-sample host
  STFT and no per-step Python optimizer loop.
"""

from __future__ import annotations

import json
import os
import sys
import time
import types
from dataclasses import asdict, fields
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..audio import finish_transfer_mel, log_mel_spectrogram_jax
from ..models import whisper as W
from ..models.dims import ModelDimensions
from ..models.registry import (
    WhisperModel,
    convert_torch_state_dict,
    export_torch_state_dict,
    from_random,
    load_model,
)
from ..parallel import create_mesh, data_sharding, replicated, shard_params, stacked_data_sharding
from ..tokenizer import Tokenizer
from .config import TrainingConfig
from .dataset import build_mtl_tokenizer
from .metrics import detailed_metrics

_F32 = jnp.float32


# ---------------------------------------------------------------------------
# classifier head + losses (pure functions)
# ---------------------------------------------------------------------------


def init_classifier_params(key: jax.Array, d_model: int, n_classes: int = 3) -> Dict:
    """Linear(d, d/2) -> ReLU -> Dropout -> Linear(d/2, n_classes)
    (reference trainer.py:126-137), torch-default fan-in init."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = d_model // 2

    def u(k, shape, fan_in):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(k, shape, _F32, -bound, bound)

    return {
        "fc1": {"w": u(k1, (d_model, h), d_model), "b": u(k2, (h,), d_model)},
        "fc2": {"w": u(k3, (h, n_classes), h), "b": u(k4, (n_classes,), h)},
    }


def classifier_apply(
    cp: Dict,
    pooled: jnp.ndarray,  # (B, D)
    *,
    dropout_rng: Optional[jax.Array] = None,
    train: bool = False,
    compute_dtype=jnp.float32,
    dropout_rows: Optional[Tuple[Any, int]] = None,
) -> jnp.ndarray:
    x = pooled.astype(compute_dtype)
    x = jnp.matmul(x, cp["fc1"]["w"].astype(compute_dtype), preferred_element_type=_F32)
    x = jax.nn.relu(x + cp["fc1"]["b"].astype(_F32))
    if train and dropout_rng is not None:
        if dropout_rows is not None:
            # inside shard_map: draw the GLOBAL-batch mask and slice this
            # shard's row block, so dropout is bit-identical to the pjit
            # path (threefry bits are a function of global element index)
            row0, global_b = dropout_rows
            keep = jax.random.bernoulli(dropout_rng, 0.9, (global_b,) + x.shape[1:])
            keep = jax.lax.dynamic_slice_in_dim(keep, row0, x.shape[0], 0)
        else:
            keep = jax.random.bernoulli(dropout_rng, 0.9, x.shape)
        x = jnp.where(keep, x / 0.9, 0.0)
    x = x.astype(compute_dtype)
    logits = jnp.matmul(x, cp["fc2"]["w"].astype(compute_dtype), preferred_element_type=_F32)
    return logits + cp["fc2"]["b"].astype(_F32)


def cross_entropy_ignore_index(
    logits: jnp.ndarray, targets: jnp.ndarray, ignore_index: int = -100
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Token CE with ignore mask. Returns (mean, per_row_sum, per_row_count)
    — mean matches torch's CrossEntropyLoss(ignore_index=-100) reduction."""
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logprobs = jax.nn.log_softmax(logits.astype(_F32), axis=-1)
    token_lp = jnp.take_along_axis(logprobs, safe_targets[..., None], axis=-1)[..., 0]
    token_loss = jnp.where(valid, -token_lp, 0.0)
    per_row_sum = token_loss.sum(axis=-1)
    per_row_count = valid.sum(axis=-1)
    mean = per_row_sum.sum() / jnp.maximum(per_row_count.sum(), 1)
    return mean, per_row_sum, per_row_count


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    logprobs = jax.nn.log_softmax(logits.astype(_F32), axis=-1)
    per_row = -jnp.take_along_axis(logprobs, labels[:, None], axis=-1)[:, 0]
    return per_row.mean(), per_row


def _global_sum_local_grad(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Cross-shard sum whose VALUE is psum(x) (bit-exact, replicated) but
    whose GRADIENT is d(x)/dtheta — the local share only. `x - sg(x)` is
    exactly 0.0 in the primal, so the value is the pure psum; AD sees the
    tangent of the bare `x` term. Keeps psum off the grad path, where
    shard_map(check_vma=False) would transpose it to another psum."""
    sg = jax.lax.stop_gradient
    return sg(jax.lax.psum(x, axis)) + (x - sg(x))


# ---------------------------------------------------------------------------
# the trainer
# ---------------------------------------------------------------------------


class MultiTaskTrainer:
    def __init__(self, config: TrainingConfig, verbose: bool = True):
        self.config = config
        self.verbose = verbose
        self._log(f"=== Multi-Task Learning Trainer (TPU/jax) ===")

        self.is_english_only = ".en" in config.model_size
        self.tokenizer: Tokenizer = build_mtl_tokenizer(config.model_size)
        self._log(
            f"Tokenizer: {'en-only' if self.is_english_only else 'multilingual'}, "
            f"EOT={self.tokenizer.eot} SOT={self.tokenizer.sot} "
            f"diseases={self.tokenizer.disease_tokens}"
        )

        self.class_to_disease = config.class_to_disease
        self.disease_to_class = {v: k for k, v in config.class_to_disease.items()}
        self.disease_token_ids = dict(self.tokenizer.disease_tokens)
        # position of the disease token inside the target sequence
        # (reference trainer.py:70-76)
        self.disease_token_position = 1 if self.is_english_only else 2

        self.compute_dtype = jnp.dtype(config.compute_dtype)
        self.model = self._load_base_model()
        self._expand_vocabulary()

        key = jax.random.PRNGKey(config.seed)
        self.classifier_params = init_classifier_params(key, self.model.dims.n_audio_state)

        self.mesh = create_mesh(config.mesh_shape)
        tp = self.mesh.shape.get("tp", 1)
        # dp-only meshes train under shard_map (LOCAL shapes per device), so
        # the Pallas flash-attention kernels and their fused backward stay
        # live — the same pattern parallel/serving.py uses for dp decode.
        self._dp_shard_map = tp == 1 and (
            config.dp_shard_map == "force"
            or (bool(config.dp_shard_map) and self.mesh.size > 1)
        )
        if self.mesh.size > 1 and not self._dp_shard_map:
            # pjit/GSPMD path: the Pallas attention kernels carry no GSPMD
            # partitioning rules — under a globally-traced multi-device
            # program the einsum paths shard cleanly while pallas_call would
            # force gathers (or fail to partition) on the head-merged inputs.
            # The switches are NOT mutated globally: every compiled-step
            # invocation runs under _kernel_scope, which sets this state for
            # the call (covering any retrace) and restores the ambient state
            # after — so trainers with different paths coexist in one
            # process and an explicit user set_kernels(False) survives.
            self._kernel_scope_state = (False, "off")
        else:
            # shard_map / single-device: per-device local-shape traces where
            # the Pallas kernels are live. Capture the ambient switches at
            # construction so a user's explicit set_kernels(False) is
            # honored, while a pjit trainer's scoped "off" cannot leak in.
            self._kernel_scope_state = (
                W._FLASH["enabled"], W._FLASH["decode_kernel"]
            )
        self._shard_all()

        self.optimizer = self._build_optimizer()
        self.opt_state = self._place_opt_state(
            self.optimizer.init(self._trainable())
        )

        self.alpha = float(config.alpha)
        self.beta = float(config.beta)
        self._rng = jax.random.PRNGKey(config.seed + 1)
        self._train_step = None
        self._train_scan_steps: Dict[int, Any] = {}
        self._packed_scan_steps: Dict[int, Any] = {}
        self._pack_spec = None
        self._eval_step = None
        self._log(
            f"Trainer ready: dims={self.model.dims}, mesh={dict(self.mesh.shape)}, "
            f"compute={self.compute_dtype}"
        )

    # --- setup -------------------------------------------------------------

    def _log(self, *args):
        if self.verbose:
            print(*args)

    def _load_base_model(self) -> WhisperModel:
        cfg = self.config
        if cfg.pretrained == "random":
            spec = (
                ModelDimensions(**cfg.debug_dims) if cfg.debug_dims else cfg.model_size
            )
            return from_random(spec, seed=cfg.seed, compute_dtype=self.compute_dtype)
        name = cfg.pretrained or cfg.model_size
        try:
            model = load_model(name, compute_dtype=self.compute_dtype)
        except Exception as e:
            raise RuntimeError(
                f"Could not load pretrained weights for '{name}' ({e}). Set "
                "TrainingConfig.pretrained to a local checkpoint path, or to "
                "'random' for scratch initialization."
            ) from e
        return model

    def _expand_vocabulary(self):
        """Grow embeddings to cover the spliced disease tokens
        (reference trainer.py:103-124)."""
        original = self.model.dims.n_vocab
        max_token_id = max(self.tokenizer.special_tokens.values())
        new_vocab = max_token_id + 1
        if new_vocab > original:
            self.model.resize_token_embeddings(new_vocab, seed=self.config.seed)
            self._log(f"Vocabulary expanded: {original} -> {new_vocab}")

    def _shard_all(self):
        self.model.params = shard_params(self.model.params, self.mesh)
        self.classifier_params = jax.device_put(
            self.classifier_params, replicated(self.mesh)
        )

    def _trainable(self) -> Dict:
        return {"model": self.model.params, "classifier": self.classifier_params}

    def _set_trainable(self, tr: Dict):
        self.model.params = tr["model"]
        self.classifier_params = tr["classifier"]

    def _use_zero1(self) -> bool:
        """ZeRO-1 optimizer-state sharding over dp: opt-in (config.zero1),
        needs the shard_map dp path (the fused update slices/all-gathers by
        explicit axis index) and a real dp axis to shard over."""
        return (
            bool(getattr(self.config, "zero1", False))
            and getattr(self.config, "fused_optimizer", True)
            and self._dp_shard_map
            and int(self.mesh.shape.get("dp", 1)) > 1
        )

    def _opt_state_spec(self):
        """shard_map in/out spec for the optimizer state: replicated
        normally; under ZeRO-1 the m/v buffers row-shard over dp."""
        if not self._use_zero1():
            return P()
        from .fused_optim import FusedAdamWState

        assert isinstance(self.opt_state, FusedAdamWState)
        return FusedAdamWState(
            count=P(),
            m={k: P("dp") for k in self.opt_state.m},
            v={k: P("dp") for k in self.opt_state.v},
        )

    def _place_opt_state(self, opt_state):
        """Give a freshly-initialized fused optimizer state its mesh
        placement: ZeRO-1 row-shards m/v over dp, any other multi-device
        mesh replicates (deterministic layout for donation + orbax resume)."""
        from .fused_optim import FusedAdamWState

        if not isinstance(opt_state, FusedAdamWState) or self.mesh.size == 1:
            return opt_state
        if self._use_zero1():
            row = jax.sharding.NamedSharding(self.mesh, P("dp"))
            rep = replicated(self.mesh)
            return FusedAdamWState(
                count=jax.device_put(opt_state.count, rep),
                m={k: jax.device_put(v, row) for k, v in opt_state.m.items()},
                v={k: jax.device_put(v, row) for k, v in opt_state.v.items()},
            )
        return jax.device_put(opt_state, replicated(self.mesh))

    def _optimizer_label(self, path, _leaf):
        """Param-group label for one leaf (reference trainer.py:139-198)."""
        names = [str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))) for k in path]
        if names[0] == "classifier":
            return "classifier"
        if names[1] == "encoder":
            return "frozen" if self.config.freeze_encoder else "encoder"
        if names[1] == "decoder" and names[2] == "token_embedding":
            return "embeddings"
        return "decoder"

    def _optimizer_labels(self, tree=None):
        return jax.tree_util.tree_map_with_path(
            self._optimizer_label, tree if tree is not None else self._trainable()
        )

    def _optimizer_hparams(self) -> Dict[str, Tuple[float, float]]:
        lr, wd = self.config.learning_rate, self.config.weight_decay
        return {
            "encoder": (lr * 0.1, wd),
            "decoder": (lr * 0.3, wd),
            "embeddings": (lr * 1.0, 0.0),
            "classifier": (lr * 1.0, wd),
        }

    def _build_optimizer(self, force_per_leaf: bool = False) -> optax.GradientTransformation:
        """Global-norm clip + 4-group AdamW (reference trainer.py:139-198)."""
        cfg = self.config
        lr, wd = cfg.learning_rate, cfg.weight_decay

        def adamw(lr_scale, weight_decay):
            return optax.adamw(
                lr * lr_scale, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
            )

        # Fused flat-buffer path (default): same arithmetic, ~4 elementwise
        # chains instead of a per-leaf tail (see mtl/fused_optim.py). On
        # tp>1/pjit meshes the buffers stay replicated (GSPMD gathers each
        # sharded grad leaf into its segment); on dp shard_map meshes the
        # m/v buffers optionally row-shard over dp (ZeRO-1, config.zero1).
        if getattr(cfg, "fused_optimizer", True) and not force_per_leaf:
            from .fused_optim import fused_multigroup_adamw

            zero_axis, zero_size = (None, 1)
            if self._use_zero1():
                zero_axis = "dp"
                zero_size = int(self.mesh.shape.get("dp", 1))
            return fused_multigroup_adamw(
                self._optimizer_labels(), self._optimizer_hparams(),
                cfg.gradient_clip_norm,
                moment_dtype=getattr(cfg, "optimizer_moment_dtype", "float32"),
                zero_axis=zero_axis, zero_size=zero_size,
            )

        groups = {
            "encoder": adamw(0.1, wd),
            "decoder": adamw(0.3, wd),
            "embeddings": adamw(1.0, 0.0),
            "classifier": adamw(1.0, wd),
            "frozen": optax.set_to_zero(),
        }
        return optax.chain(
            optax.clip_by_global_norm(cfg.gradient_clip_norm),
            optax.multi_transform(groups, self._optimizer_labels),
        )

    # --- the compiled steps --------------------------------------------------

    def _kernel_scope(self):
        """Set the module-global Pallas kernel switches to this trainer's
        required state for the duration of a compiled-step call (traces — and
        retraces on new batch shapes — happen inside the call), restoring the
        ambient state after. Keeps the pjit path's kernels-off requirement
        from leaking into other trainers or stomping user overrides."""
        import contextlib

        @contextlib.contextmanager
        def scope():
            saved = (W._FLASH["enabled"], W._FLASH["decode_kernel"])
            W._FLASH["enabled"], W._FLASH["decode_kernel"] = self._kernel_scope_state
            try:
                yield
            finally:
                W._FLASH["enabled"], W._FLASH["decode_kernel"] = saved

        return scope()

    def _scoped(self, fn):
        """Wrap a compiled step so every invocation runs under _kernel_scope.
        jit introspection (`.lower`, used by the MFU cost analysis in
        scripts/tpu_train_bench.py) is delegated, scoped the same way."""

        def wrapper(*args, **kwargs):
            with self._kernel_scope():
                return fn(*args, **kwargs)

        def lower(*args, **kwargs):
            with self._kernel_scope():
                return fn.lower(*args, **kwargs)

        wrapper.lower = lower
        wrapper.__wrapped__ = fn
        return wrapper

    def _forward(self, trainable, audio, input_tokens, target_tokens, classes,
                 rng, train: bool, n_valid=None, shard_axis: Optional[str] = None):
        """Shared fwd: device log-mel -> encoder -> both heads -> losses.

        `n_valid` (traced scalar) masks dp-padding rows out of the loss
        means — the duplicated last sample used to pad a batch up to the dp
        size must not be double-weighted in gradients.

        `shard_axis`: when the step runs under shard_map (dp data
        parallelism with the Pallas kernels kept live on local shapes),
        the loss reductions here see only this shard's rows — the global
        masked means are assembled with psums over `shard_axis`, matching
        what GSPMD lowers the pjit path's global reductions to (local
        partial sums + all-reduce)."""
        dims = self.model.dims
        params, cp = trainable["model"], trainable["classifier"]
        if audio.dtype == jnp.float16:
            # host-computed log-mel transfer (audio.log_mel_for_transfer):
            # extend the bucketed frames to the full window with the
            # per-sample dynamic-range floor
            mels = finish_transfer_mel(audio, self.config.audio_samples)
        else:
            if audio.dtype == jnp.int16:  # quantized transfer (_audio_for_transfer)
                audio = audio.astype(jnp.float32) / 32768.0
            if audio.shape[-1] < self.config.audio_samples:
                # bucketed H2D (dataset.audio_buckets): finish the zero-pad to
                # the full window on device — identical mels, fewer bytes
                audio = jnp.pad(
                    audio, ((0, 0), (0, self.config.audio_samples - audio.shape[-1]))
                )
            mels = log_mel_spectrogram_jax(audio, n_mels=dims.n_mels)
        feats = W.encoder_apply(
            params, dims, mels, self.compute_dtype,
            remat=train and self._use_remat(),
        )

        b_local = audio.shape[0]
        dropout_rows = None
        if shard_axis is not None:
            dp = self.mesh.shape.get("dp", 1)
            row0 = jax.lax.axis_index(shard_axis) * b_local
            dropout_rows = (row0, b_local * dp)

        pooled = feats.mean(axis=1)
        disease_logits = classifier_apply(
            cp, pooled, dropout_rng=rng, train=train,
            compute_dtype=self.compute_dtype, dropout_rows=dropout_rows,
        )
        cls_loss, cls_per_row = cross_entropy(disease_logits, classes)

        if train and self._use_chunked_ce():
            # Chunked CE (ops/chunked_xent.py): the decoder returns the
            # (B, T, d) hidden states and the tied-embedding projection +
            # softmax-CE run per row-chunk in f32 — the (B, T, 51869)
            # training logits tensor is never materialized, forward or
            # backward, at device-step-time parity with the materialized
            # path (measured, PERF.md round 5). Eval (train=False) keeps
            # the materialized fp32 logits contract so teacher-forced WER
            # semantics and the CPU differential tests are bit-unchanged.
            hidden, _, _ = W.decoder_apply(
                params, dims, input_tokens, feats,
                compute_dtype=self.compute_dtype, return_hidden=True,
            )
            from ..ops.chunked_xent import chunked_softmax_xent

            token_loss, pred_tokens = chunked_softmax_xent(
                hidden, params["decoder"]["token_embedding"], target_tokens,
                row_chunk=self.config.ce_chunk_rows,
            )
            trans_row_sum = token_loss.sum(axis=-1)
            trans_row_cnt = (target_tokens != -100).sum(axis=-1)
            trans_loss = trans_row_sum.sum() / jnp.maximum(trans_row_cnt.sum(), 1)
        else:
            # Training under bf16 compute stores the (B, T, V) logits in
            # bf16 — the CE log_softmax upcasts to fp32 in-fusion, so only
            # the HBM stores/reads round (same contract as the serving
            # decode loops' bf16 logit stores). Eval keeps fp32 logits.
            logits_dtype = (
                self.compute_dtype
                if (train and self.compute_dtype == jnp.bfloat16)
                else None
            )
            trans_logits, _, _ = W.decoder_apply(
                params, dims, input_tokens, feats, compute_dtype=self.compute_dtype,
                logits_dtype=logits_dtype,
            )
            trans_loss, trans_row_sum, trans_row_cnt = cross_entropy_ignore_index(
                trans_logits, target_tokens
            )
            pred_tokens = jnp.argmax(trans_logits, axis=-1)

        if shard_axis is not None:
            # Global masked means across shards. The psum must stay OFF the
            # grad path: under shard_map(check_vma=False) psum transposes to
            # psum, so differentiating through it would hand back grads that
            # are already globally summed and the caller's explicit psum
            # would scale them by dp. _global_sum_local_grad gives the exact
            # psum'd VALUE (replicated) while the GRADIENT flows only through
            # this shard's local sum — the caller's psum of the per-device
            # partial grads then reproduces GSPMD's grad all-reduce exactly.
            assert n_valid is not None
            rows = row0 + jnp.arange(b_local)
            row_mask = rows < n_valid
            cls_sum = _global_sum_local_grad(
                (cls_per_row * row_mask).sum(), shard_axis
            )
            cls_cnt = jax.lax.psum(row_mask.sum(), shard_axis)
            cls_loss = cls_sum / jnp.maximum(cls_cnt, 1)
            t_sum = _global_sum_local_grad(
                jnp.where(row_mask, trans_row_sum, 0.0).sum(), shard_axis
            )
            t_cnt = jax.lax.psum(
                jnp.where(row_mask, trans_row_cnt, 0).sum(), shard_axis
            )
            trans_loss = t_sum / jnp.maximum(t_cnt, 1)
        elif n_valid is not None:
            row_mask = jnp.arange(audio.shape[0]) < n_valid
            cls_loss = (cls_per_row * row_mask).sum() / jnp.maximum(row_mask.sum(), 1)
            t_sum = jnp.where(row_mask, trans_row_sum, 0.0)
            t_cnt = jnp.where(row_mask, trans_row_cnt, 0)
            trans_loss = t_sum.sum() / jnp.maximum(t_cnt.sum(), 1)

        aux = {
            "cls_loss": cls_loss,
            "trans_loss": trans_loss,
            "cls_per_row": cls_per_row,
            "trans_row_sum": trans_row_sum,
            "trans_row_count": trans_row_cnt,
            "disease_preds": jnp.argmax(disease_logits, axis=-1),
            "disease_probs": jax.nn.softmax(disease_logits, axis=-1),
            "pred_tokens": pred_tokens,
        }
        return cls_loss, trans_loss, aux

    def _use_chunked_ce(self) -> bool:
        """Chunked-CE policy (config.chunked_ce): "auto" enables it wherever
        the train step traces per-device shapes — single device or the dp
        shard_map path. The pjit/GSPMD path (tp > 1 or dp_shard_map=False on
        a mesh) keeps the materialized logits: the chunk scan's flatten +
        scatter-add have no clean GSPMD partitioning over a sharded batch."""
        mode = getattr(self.config, "chunked_ce", "auto")
        if mode == "auto":
            return self.mesh.size == 1 or self._dp_shard_map
        return bool(mode)

    def _use_remat(self) -> bool:
        """Encoder-block remat policy (config.remat): "auto" enables it on
        TPU when estimated activations + resident train state approach HBM.

        Estimate calibrated against the measured 16 GB v5e boundary (rounds
        4-5, chunked CE): activations ~= 45 KB per unit of
        b_local * d_audio * audio_layers (T=1500 fixed); resident state =
        n_params * (4 fp32 params + 4 fp32 grads + m/v moment bytes).
        Measured anchor points all respected: tiny bs<=128 and base bs<=64
        fit un-remat'd (base-64: est 10.0 GB, measured fine at MFU 16.9%);
        base bs=128 does not (est 18.9 GB vs measured compile-OOM at
        17.2 GB needed); medium bs=8 with bf16 moments needs remat (est
        18.0 GB un-remat'd; measured fitting WITH remat at 13.9 GB peak)."""
        mode = getattr(self.config, "remat", "auto")
        if mode == "auto":
            if jax.default_backend() != "tpu":
                return False
            d = self.model.dims.n_audio_state
            layers = self.model.dims.n_audio_layer
            # Under dp (shard_map or pjit) each device stores activations for
            # batch_size/dp samples — threshold on the per-device batch so
            # multi-chip runs don't over-trigger remat.
            dp = self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
            b_local = max(1, self.config.batch_size // max(1, dp))
            act_bytes = b_local * d * layers * 45_000
            n_params = sum(
                int(np.prod(p.shape)) for p in jax.tree.leaves(self.model.params)
            )
            moment_bytes = 2 * jnp.dtype(
                getattr(self.config, "optimizer_moment_dtype", "float32")
            ).itemsize
            if self._use_zero1():  # m/v row-sharded over dp
                moment_bytes /= max(1, dp)
            state_bytes = n_params * (4 + 4 + moment_bytes)
            return act_bytes + state_bytes > 13.5e9
        return bool(mode)

    def _effective_weights(self, alpha, beta, cls_loss, trans_loss):
        """Inverse-loss-normalized weights when configured dynamic
        (reference trainer.py:207-220; one-shot freeze handled by the host)."""
        c = jax.lax.stop_gradient(cls_loss) + 1e-6
        t = jax.lax.stop_gradient(trans_loss) + 1e-6
        dyn_alpha = (1.0 / c) / (1.0 / c + 1.0 / t)
        dyn_beta = (1.0 / t) / (1.0 / c + 1.0 / t)
        use_dyn = (alpha == 0.0) | (beta == 0.0)
        return (
            jnp.where(use_dyn, dyn_alpha, alpha),
            jnp.where(use_dyn, dyn_beta, beta),
        )

    # aux-dict entries carrying one value per batch row (everything else in
    # aux is a replicated scalar) — used to build shard_map out_specs
    _AUX_ROW_KEYS = frozenset({
        "cls_per_row", "trans_row_sum", "trans_row_count",
        "disease_preds", "disease_probs", "pred_tokens",
    })

    def _aux_specs(self, keys, stacked: bool = False):
        row = P(None, "dp") if stacked else P("dp")
        return {k: (row if k in self._AUX_ROW_KEYS else P()) for k in keys}

    _TRAIN_AUX_KEYS = (
        "cls_loss", "trans_loss", "cls_per_row", "trans_row_sum",
        "trans_row_count", "disease_preds", "disease_probs", "pred_tokens",
        "alpha_eff", "beta_eff",
    )

    def _get_train_step(self):
        if self._train_step is not None:
            return self._train_step
        optimizer = self.optimizer

        def step(trainable, opt_state, audio, input_tokens, target_tokens, classes,
                 alpha, beta, rng, n_valid, shard_axis=None):
            def loss_fn(tr):
                cls_loss, trans_loss, aux = self._forward(
                    tr, audio, input_tokens, target_tokens, classes, rng,
                    train=True, n_valid=n_valid, shard_axis=shard_axis,
                )
                a, b = self._effective_weights(alpha, beta, cls_loss, trans_loss)
                combined = a * cls_loss + b * trans_loss
                aux.update({"alpha_eff": a, "beta_eff": b})
                return combined, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
            if shard_axis is not None:
                # per-device grads are the partial (local-data) gradients of
                # the global loss — sum them over dp, exactly the all-reduce
                # GSPMD inserts on the pjit path
                grads = jax.lax.psum(grads, shard_axis)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss, aux

        if self._dp_shard_map:
            opt_spec = self._opt_state_spec()
            fn = jax.shard_map(
                partial(step, shard_axis="dp"),
                mesh=self.mesh,
                in_specs=(P(), opt_spec, P("dp"), P("dp"), P("dp"), P("dp"),
                          P(), P(), P(), P()),
                out_specs=(P(), opt_spec, P(), self._aux_specs(self._TRAIN_AUX_KEYS)),
                check_vma=False,
            )
            self._train_step = self._scoped(jax.jit(fn, donate_argnums=(0, 1)))
        else:
            # shard_axis stays at its Python default (None) and is never
            # passed by callers, so it is a trace-time constant under jit
            self._train_step = self._scoped(jax.jit(step, donate_argnums=(0, 1)))
        return self._train_step

    def _kstep_core(self, trainable, opt_state, audio, input_tokens,
                    target_tokens, classes, alpha, beta, rng, n_valids,
                    shard_axis=None):
        """k training steps via lax.scan over stacked (k, B, ...) batches.
        The carried rng chains split() exactly like the host does between
        single-step calls, so fused and single-step training are
        bit-identical (tests/test_mtl.py)."""
        optimizer = self.optimizer

        def body(carry, xs):
            tr, opt, rng = carry
            a_i, it_i, tt_i, cl_i, nv_i = xs
            rng, sub = jax.random.split(rng)

            def loss_fn(tr):
                cls_loss, trans_loss, aux = self._forward(
                    tr, a_i, it_i, tt_i, cl_i, sub, train=True, n_valid=nv_i,
                    shard_axis=shard_axis,
                )
                a, b = self._effective_weights(alpha, beta, cls_loss, trans_loss)
                combined = a * cls_loss + b * trans_loss
                aux.update({"alpha_eff": a, "beta_eff": b})
                return combined, aux

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(tr)
            if shard_axis is not None:
                grads = jax.lax.psum(grads, shard_axis)
            updates, opt = optimizer.update(grads, opt, tr)
            tr = optax.apply_updates(tr, updates)
            return (tr, opt, rng), (loss, aux)

        (trainable, opt_state, rng), (losses, auxs) = jax.lax.scan(
            body, (trainable, opt_state, rng),
            (audio, input_tokens, target_tokens, classes, n_valids),
        )
        return trainable, opt_state, rng, losses, auxs

    def _get_train_scan_step(self, k: int):
        """k training steps in ONE jitted program. Per-dispatch overhead
        scales with the number of buffer handles (~500 for params+optimizer),
        which on a remote-attached TPU costs more than the compute itself —
        batching k steps per dispatch amortizes it k-fold and lets XLA
        pipeline the H2D copies."""
        if k in self._train_scan_steps:
            return self._train_scan_steps[k]
        if self._dp_shard_map:
            opt_spec = self._opt_state_spec()
            fn = jax.jit(
                jax.shard_map(
                    partial(self._kstep_core, shard_axis="dp"),
                    mesh=self.mesh,
                    in_specs=(P(), opt_spec, P(None, "dp"), P(None, "dp"),
                              P(None, "dp"), P(None, "dp"), P(), P(), P(), P()),
                    out_specs=(P(), opt_spec, P(), P(),
                               self._aux_specs(self._TRAIN_AUX_KEYS, stacked=True)),
                    check_vma=False,
                ),
                donate_argnums=(0, 1),
            )
        else:
            fn = jax.jit(self._kstep_core, donate_argnums=(0, 1))
        fn = self._scoped(fn)
        self._train_scan_steps[k] = fn
        return fn

    # --- packed-state dispatch ---------------------------------------------
    # The remaining per-dispatch cost after k-step fusion is marshalling the
    # ~500 param+optimizer buffer handles (~0.6 ms each through the tunnel).
    # Packing the whole train state into ONE flat device buffer per dtype
    # cuts a dispatch to a handful of handles; the jitted program unpacks
    # (static slices, which XLA aliases) and repacks (one HBM copy of the
    # state, ~1 ms) around the identical _kstep_core — bit-identical results.
    # Single-device only: a flat concat cannot carry per-leaf NamedShardings.

    def _use_packed_dispatch(self, k_max: int) -> bool:
        # Opt-in only: measured SLOWER through the tunnel (tiny bs=16 48-step
        # epoch wall 11.4 s packed vs 2.4 s unpacked, steady-state) — the
        # donated packed buffers re-layout server-side on every call, which
        # costs far more than the ~500-handle dispatch overhead it removes
        # (that overhead overlaps with device compute in the deferred
        # pipeline anyway). Kept behind TrainingConfig.packed_dispatch=True
        # for directly-attached hosts where the tradeoff may differ.
        if self.mesh.size > 1 or k_max < 1 or self._dp_shard_map:
            return False
        return bool(getattr(self.config, "packed_dispatch", None))

    def _state_pack_spec(self):
        """(treedef, per-leaf (dtype_key, row_offset, shape), rows/dtype).

        Buffers are (rows, 128) 2-D arrays with every leaf's slot padded to
        a 128-element (one-row) boundary. A single flat 1-D buffer does NOT
        work on TPU: the total f32 element count is odd-sized, and XLA
        factorizes large 1-D arrays into a 2-D tiled layout using the
        smallest factor — here f32[37260675, 3], whose (8,128) tiling pads
        the minor dim 3 -> 128 and transiently allocates 19 GB at compile.
        An explicit lane-aligned (rows, 128) shape keeps the layout exact.
        """
        if getattr(self, "_pack_spec", None) is not None:
            return self._pack_spec
        leaves, treedef = jax.tree_util.tree_flatten(
            (self._trainable(), self.opt_state)
        )
        totals: Dict[str, int] = {}
        entries = []
        for leaf in leaves:
            dt = str(leaf.dtype)
            row = totals.get(dt, 0)
            entries.append((dt, row, tuple(leaf.shape)))
            size = int(np.prod(leaf.shape or (1,)))
            totals[dt] = row + (size + 127) // 128
        self._pack_spec = (treedef, tuple(entries), dict(totals))
        return self._pack_spec

    def _pack_tree(self, state):
        """(trainable, opt_state) -> {dtype: (rows, 128) buffer} (traceable)."""
        _, entries, totals = self._state_pack_spec()
        bufs = {dt: jnp.zeros((rows, 128), dtype=dt) for dt, rows in totals.items()}
        for leaf, (dt, row, shape) in zip(jax.tree_util.tree_leaves(state), entries):
            size = int(np.prod(shape or (1,)))
            rows = (size + 127) // 128
            flat = jnp.pad(jnp.ravel(leaf), (0, rows * 128 - size))
            bufs[dt] = jax.lax.dynamic_update_slice(
                bufs[dt], flat.reshape(rows, 128), (row, 0)
            )
        return bufs

    def _unpack_tree(self, bufs):
        """{dtype: (rows, 128) buffer} -> (trainable, opt_state) (traceable)."""
        treedef, entries, _ = self._state_pack_spec()
        leaves = []
        for dt, row, shape in entries:
            size = int(np.prod(shape or (1,)))
            rows = (size + 127) // 128
            seg = jax.lax.slice(bufs[dt], (row, 0), (row + rows, 128))
            leaves.append(seg.reshape(rows * 128)[:size].reshape(shape))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def _pack_jit(self):
        """Cached jit of _pack_tree — a fresh jax.jit per epoch would
        retrace/recompile the ~500-leaf pack program every epoch."""
        if getattr(self, "_pack_jit_fn", None) is None:
            self._pack_jit_fn = jax.jit(self._pack_tree)
        return self._pack_jit_fn

    def _unpack_jit(self):
        if getattr(self, "_unpack_jit_fn", None) is None:
            self._unpack_jit_fn = jax.jit(self._unpack_tree)
        return self._unpack_jit_fn

    def _get_packed_scan_step(self, k: int):
        if k in self._packed_scan_steps:
            return self._packed_scan_steps[k]

        def pkstep(bufs, audio, input_tokens, target_tokens, classes,
                   alpha, beta, rng, n_valids):
            trainable, opt_state = self._unpack_tree(bufs)
            trainable, opt_state, rng, losses, auxs = self._kstep_core(
                trainable, opt_state, audio, input_tokens, target_tokens,
                classes, alpha, beta, rng, n_valids,
            )
            return self._pack_tree((trainable, opt_state)), rng, losses, auxs

        fn = self._scoped(jax.jit(pkstep, donate_argnums=(0,)))
        self._packed_scan_steps[k] = fn
        return fn

    def _get_eval_step(self):
        if self._eval_step is not None:
            return self._eval_step

        def step(trainable, audio, input_tokens, target_tokens, classes, alpha, beta,
                 n_valid, shard_axis=None):
            cls_loss, trans_loss, aux = self._forward(
                trainable, audio, input_tokens, target_tokens, classes, None,
                train=False, n_valid=n_valid, shard_axis=shard_axis,
            )
            a, b = self._effective_weights(alpha, beta, cls_loss, trans_loss)
            combined = a * cls_loss + b * trans_loss
            aux.update({"alpha_eff": a, "beta_eff": b, "combined": combined})
            return aux

        if self._dp_shard_map:
            keys = self._TRAIN_AUX_KEYS + ("combined",)
            self._eval_step = self._scoped(jax.jit(
                jax.shard_map(
                    partial(step, shard_axis="dp"),
                    mesh=self.mesh,
                    in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp"),
                              P(), P(), P()),
                    out_specs=self._aux_specs(keys),
                    check_vma=False,
                )
            ))
        else:
            self._eval_step = self._scoped(jax.jit(step))
        return self._eval_step

    def _device_batch(self, batch: Dict, pad_to_multiple: Optional[int] = None):
        """Ship a host batch to the mesh (dp-sharded), optionally padding the
        batch dim so it divides dp. Returns (device arrays, n_valid)."""
        dp = self.mesh.shape.get("dp", 1)
        n = batch["audio"].shape[0]
        n_valid = n
        mult = pad_to_multiple or dp
        if n % mult != 0:
            pad = mult - n % mult
            rep = lambda a: np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])  # noqa: E731
            batch = {
                **batch,
                "audio": rep(batch["audio"]),
                "input_tokens": rep(batch["input_tokens"]),
                "target_tokens": rep(batch["target_tokens"]),
                "classes": rep(batch["classes"]),
            }
        dev = {}
        for k in ("audio", "input_tokens", "target_tokens", "classes"):
            v = batch[k]
            if k == "audio":
                v = self._audio_for_transfer(v)
            dev[k] = jax.device_put(v, data_sharding(self.mesh, v.ndim))
        return dev, n_valid

    def _audio_for_transfer(self, audio: np.ndarray) -> np.ndarray:
        """Shrink the audio H2D copy as configured (config.audio_transfer_dtype):
        "int16" quantizes waveforms (exact for 16-bit PCM sources), "mel_fp16"
        ships host-computed log-mels at 2x fewer bytes still (the loader's
        producer thread usually converts already — fp16 batches pass through).
        The jitted step undoes either transform (see _forward)."""
        audio = np.asarray(audio)
        if audio.dtype == np.float16:  # already a host-computed mel batch
            return audio
        mode = self.config.audio_transfer_dtype
        if mode == "mel_fp16":
            from ..audio import log_mel_for_transfer

            return log_mel_for_transfer(audio, self.model.dims.n_mels,
                                        full_samples=self.config.audio_samples)
        if mode != "int16":
            return audio
        return np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)

    # --- prediction decoding (reference trainer.py:222-244) -----------------

    _SPECIAL_STRINGS = [
        "<|startoftranscript|>", "<|endoftext|>", "<|en|>",
        "<|transcribe|>", "<|notimestamps|>", "<|nospeech|>",
        "<|normal|>", "<|dysphonia|>", "<|dysarthria|>",
    ]

    def decode_predictions(self, pred_tokens: np.ndarray) -> List[str]:
        texts = []
        for row in pred_tokens:
            text = self.tokenizer.decode([int(t) for t in row if t != -100])
            for s in self._SPECIAL_STRINGS:
                text = text.replace(s, "")
            texts.append(text.strip())
        return texts

    # --- epochs --------------------------------------------------------------

    def train_epoch(self, dataloader, epoch: int) -> Dict:
        step_fn = self._get_train_step()
        trainable = self._trainable()
        opt_state = self.opt_state

        totals = {"loss": 0.0, "cls_loss": 0.0, "trans_loss": 0.0}
        all_preds, all_labels, all_pred_texts, all_ref_texts = [], [], [], []
        n_batches = 0
        t0 = time.time()

        # observability (SURVEY.md §5): step timer always on; a jax.profiler
        # trace of epoch 0 when config.profile_dir is set
        from ..utils.profiling import StepTimer, trace

        timer = StepTimer(n_chips=jax.device_count())
        trace_ctx = trace(self.config.profile_dir if epoch == 0 else None)

        k_max = self.config.steps_per_call or (
            8 if jax.default_backend() == "tpu" else 1
        )
        use_packed = self._use_packed_dispatch(k_max)
        packed_state = None  # {dtype: flat buffer} once first packed

        def collect(batch, loss, aux, n_valid):
            nonlocal n_batches
            n_batches += 1
            totals["loss"] += float(loss)
            totals["cls_loss"] += float(aux["cls_loss"])
            totals["trans_loss"] += float(aux["trans_loss"])

            # one-shot dynamic weight freeze (reference trainer.py:412-413)
            if self.alpha == 0.0 or self.beta == 0.0:
                if not self.config.true_dynamic_weights:
                    self.alpha = float(aux["alpha_eff"])
                    self.beta = float(aux["beta_eff"])

            all_preds.extend(np.asarray(aux["disease_preds"])[:n_valid])
            all_labels.extend(batch["classes"][:n_valid])
            all_pred_texts.extend(
                self.decode_predictions(np.asarray(aux["pred_tokens"])[:n_valid])
            )
            all_ref_texts.extend(batch["texts"][:n_valid])

        def run_single(batch):
            nonlocal trainable, opt_state
            with timer.step(samples=len(batch["classes"]),
                            audio_seconds=len(batch["classes"]) * self.config.audio_samples / 16000.0):
                dev, n_valid = self._device_batch(batch)
                self._rng, sub = jax.random.split(self._rng)
                trainable, opt_state, loss, aux = step_fn(
                    trainable, opt_state,
                    dev["audio"], dev["input_tokens"], dev["target_tokens"],
                    dev["classes"],
                    jnp.asarray(self.alpha, _F32), jnp.asarray(self.beta, _F32),
                    sub, np.int32(n_valid),
                )
                loss = jax.block_until_ready(loss)
            collect(batch, loss, aux, n_valid)

        def dispatch_group(group):
            # one fused k=len(group) dispatch (packed state when enabled)
            nonlocal trainable, opt_state, packed_state
            n = sum(len(b["classes"]) for b in group)
            dp = self.mesh.shape.get("dp", 1)
            with timer.step(samples=n,
                            audio_seconds=n * self.config.audio_samples / 16000.0,
                            n_steps=len(group)):
                dev = {}
                for key in ("audio", "input_tokens", "target_tokens", "classes"):
                    cols = []
                    for b in group:
                        v = b[key]
                        if v.shape[0] % dp != 0:  # same padding as _device_batch
                            pad = dp - v.shape[0] % dp
                            v = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                        cols.append(v)
                    v = np.stack(cols)
                    if key == "audio":
                        v = self._audio_for_transfer(v)
                    dev[key] = jax.device_put(v, stacked_data_sharding(self.mesh, v.ndim))
                n_valids = np.asarray([len(b["classes"]) for b in group], np.int32)
                scalars = (jnp.asarray(self.alpha, _F32),
                           jnp.asarray(self.beta, _F32), self._rng, n_valids)
                if use_packed:
                    if packed_state is None:
                        packed_state = self._pack_jit()((trainable, opt_state))
                    pscan_fn = self._get_packed_scan_step(len(group))
                    packed_state, self._rng, losses, auxs = pscan_fn(
                        packed_state, dev["audio"], dev["input_tokens"],
                        dev["target_tokens"], dev["classes"], *scalars,
                    )
                else:
                    scan_fn = self._get_train_scan_step(len(group))
                    trainable, opt_state, self._rng, losses, auxs = scan_fn(
                        trainable, opt_state,
                        dev["audio"], dev["input_tokens"], dev["target_tokens"],
                        dev["classes"], *scalars,
                    )
            # results stay ON DEVICE until epoch end: fetching here would
            # serialize every dispatch against the previous group's compute
            # and H2D (the timer above therefore measures submission, not
            # execution; epoch_seconds is the honest wall number)
            deferred.append((group, losses, auxs))

        def run_group(group):
            # k same-shape optimizer steps fused into one dispatch. Partial
            # groups fall back to k=1 dispatches (packed mode — the k=1
            # program compiles per shape bucket exactly like the single-step
            # program would) or to run_single; each distinct k>1 would
            # compile its own program (minutes on a remote-attached chip)
            if len(group) == k_max:
                dispatch_group(group)
            elif use_packed:
                for b in group:
                    dispatch_group([b])
            else:
                for b in group:
                    run_single(b)

        with trace_ctx:
            deferred = []
            pending, pending_shape = [], None
            for batch in dataloader:
                # the FIRST batch must run alone when loss weights are
                # dynamic: its aux freezes alpha/beta for the whole run
                first_dynamic = n_batches == 0 and not pending and (
                    self.alpha == 0.0 or self.beta == 0.0
                ) and not self.config.true_dynamic_weights
                if first_dynamic or (k_max == 1 and not use_packed):
                    run_single(batch)
                    continue
                shape = (batch["audio"].shape, batch["input_tokens"].shape)
                if pending and (shape != pending_shape or len(pending) == k_max):
                    run_group(pending)
                    pending = []
                pending.append(batch)
                pending_shape = shape
            if pending:
                run_group(pending)

            # drain deferred group results (one sync at epoch end)
            for group, losses, auxs in deferred:
                losses = np.asarray(losses)
                auxs_np = jax.device_get(auxs)
                for i, b in enumerate(group):
                    collect(b, losses[i],
                            jax.tree.map(lambda x: x[i], auxs_np), len(b["classes"]))

        if self.config.profile_dir and timer.steps:
            s = timer.summary()
            self._log(
                f"  profile: mean step {s['mean_step_s']*1e3:.1f} ms, "
                f"p50 {s['p50_step_s']*1e3:.1f} ms, "
                f"audio-sec/sec/chip {s.get('audio_sec_per_sec_per_chip', 0):.1f}"
            )

        if packed_state is not None:
            trainable, opt_state = self._unpack_jit()(packed_state)
        self._set_trainable(trainable)
        self.opt_state = opt_state

        metrics = detailed_metrics(all_pred_texts, all_ref_texts, all_preds, all_labels)
        n_batches = max(n_batches, 1)
        metrics.update(
            loss=totals["loss"] / n_batches,
            cls_loss=totals["cls_loss"] / n_batches,
            trans_loss=totals["trans_loss"] / n_batches,
            alpha=self.alpha,
            beta=self.beta,
            epoch_seconds=time.time() - t0,
            samples_per_second=len(all_labels) / max(time.time() - t0, 1e-9),
        )
        self._log(
            f"epoch {epoch+1} train: loss={metrics['loss']:.4f} "
            f"(cls {metrics['cls_loss']:.4f}, trans {metrics['trans_loss']:.4f}) "
            f"alpha={self.alpha:.4f} beta={self.beta:.4f} "
            f"acc={metrics.get('disease_acc', 0):.4f} wer={metrics.get('wer', -1):.4f} "
            f"[{metrics['samples_per_second']:.1f} samples/s]"
        )
        return metrics

    def evaluate(self, dataloader) -> Dict:
        step_fn = self._get_eval_step()
        trainable = self._trainable()

        loss_sums = {"combined": 0.0, "cls": 0.0, "trans": 0.0}
        n_batches = 0
        all_preds, all_labels, all_pred_texts, all_ref_texts = [], [], [], []

        # dispatch every batch first (results stay on device — fetching
        # inline would serialize each dispatch against the previous batch's
        # compute), then drain
        pending = []
        for batch in dataloader:
            dev, n_valid = self._device_batch(batch)
            aux = step_fn(
                trainable,
                dev["audio"], dev["input_tokens"], dev["target_tokens"], dev["classes"],
                jnp.asarray(self.alpha, _F32), jnp.asarray(self.beta, _F32),
                np.int32(n_valid),
            )
            pending.append((batch, aux, n_valid))

        for batch, aux, n_valid in pending:
            aux = jax.device_get(aux)
            n_batches += 1
            # batch-mean losses over the *valid* rows only
            cls_rows = np.asarray(aux["cls_per_row"])[:n_valid]
            tr_sum = np.asarray(aux["trans_row_sum"])[:n_valid]
            tr_cnt = np.asarray(aux["trans_row_count"])[:n_valid]
            cls_mean = float(cls_rows.mean())
            trans_mean = float(tr_sum.sum() / max(tr_cnt.sum(), 1))
            loss_sums["cls"] += cls_mean
            loss_sums["trans"] += trans_mean
            # the step's effective weights: equal to the frozen host values
            # normally, and the per-batch dynamic weights when alpha/beta are
            # still 0.0 (true_dynamic_weights) — host 0.0*x+0.0*y would make
            # val loss constantly zero and break early stopping
            a_eff = float(aux["alpha_eff"])
            b_eff = float(aux["beta_eff"])
            loss_sums["combined"] += a_eff * cls_mean + b_eff * trans_mean

            all_preds.extend(np.asarray(aux["disease_preds"])[:n_valid])
            all_labels.extend(batch["classes"][:n_valid])
            all_pred_texts.extend(
                self.decode_predictions(np.asarray(aux["pred_tokens"])[:n_valid])
            )
            all_ref_texts.extend(batch["texts"][:n_valid])

        metrics = detailed_metrics(all_pred_texts, all_ref_texts, all_preds, all_labels)
        n_batches = max(n_batches, 1)
        metrics.update(
            loss=loss_sums["combined"] / n_batches,
            cls_loss=loss_sums["cls"] / n_batches,
            trans_loss=loss_sums["trans"] / n_batches,
        )
        self._log(
            f"  val: loss={metrics['loss']:.4f} acc={metrics.get('disease_acc', 0):.4f} "
            f"wer={metrics.get('wer', -1):.4f} cer={metrics.get('cer', -1):.4f}"
        )
        return metrics

    def train(self, train_loader, val_loader, resume_dir: Optional[str] = None) -> Dict:
        """Best-val-loss checkpointing + early stopping
        (reference trainer.py:541-612).

        `resume_dir` enables crash-safe epoch-level resume — a gap in the
        reference, which saves optimizer state but never reloads it
        (trainer.py:621-625): the FULL training state (params, classifier,
        optimizer, loss-weight freeze, PRNG, early-stop counters) is written
        after every epoch and restored on restart.
        """
        best_loss = float("inf")
        patience_counter = 0
        training_history = []
        start_epoch = 0

        if resume_dir and os.path.exists(os.path.join(resume_dir, "meta.json")):
            meta = self.restore_resume_state(resume_dir)
            start_epoch = meta["epoch"] + 1
            best_loss = meta["best_loss"]
            patience_counter = meta["patience_counter"]
            training_history = meta.get("training_history", [])
            self._log(f"resumed from {resume_dir} at epoch {start_epoch}")

        for epoch in range(start_epoch, self.config.epochs):
            train_metrics = self.train_epoch(train_loader, epoch)
            val_metrics = self.evaluate(val_loader)

            current_loss = val_metrics["loss"]
            if current_loss < best_loss:
                best_loss = current_loss
                patience_counter = 0
                self.save_checkpoint(
                    epoch=epoch,
                    best_loss=best_loss,
                    val_metrics=val_metrics,
                    train_metrics=train_metrics,
                )
            else:
                patience_counter += 1
                self._log(
                    f"  no improvement; patience {patience_counter}/"
                    f"{self.config.early_stopping_patience}"
                )
                if patience_counter >= self.config.early_stopping_patience:
                    self._log("early stopping triggered")
                    break

            training_history.append(
                {"epoch": epoch + 1, "train_metrics": train_metrics, "val_metrics": val_metrics}
            )
            if resume_dir:
                self.save_resume_state(
                    resume_dir,
                    epoch=epoch,
                    best_loss=best_loss,
                    patience_counter=patience_counter,
                    training_history=training_history,
                )

        # persist the history (the reference *claims* to save this file but
        # never writes it — train_disease.py:202-204; we actually do)
        if self.config.save_dir:
            hist_path = os.path.join(
                self.config.save_dir, f"training_history_{self.config.model_size}.json"
            )
            with open(hist_path, "w") as f:
                json.dump(_to_jsonable(training_history), f, indent=2)

        self._log(f"training complete; best val loss {best_loss:.4f}")
        return {"best_loss": best_loss, "training_history": training_history}

    # --- checkpointing -------------------------------------------------------

    def checkpoint_path(self) -> str:
        return os.path.join(
            self.config.save_dir or ".", f"best_multitask_model_{self.config.model_size}.pt"
        )

    def _classifier_state_dict(self):
        """Reference-compatible nn.Sequential keys (0=fc1, 3=fc2)."""
        import torch

        cp = jax.device_get(self.classifier_params)

        # force writable C-order copies: jax arrays view as read-only numpy,
        # and torch.from_numpy on a read-only view warns (undefined on write)
        def t(a):
            return torch.from_numpy(np.array(a, copy=True, order="C"))

        return {
            "0.weight": t(np.asarray(cp["fc1"]["w"]).T),
            "0.bias": t(cp["fc1"]["b"]),
            "3.weight": t(np.asarray(cp["fc2"]["w"]).T),
            "3.bias": t(cp["fc2"]["b"]),
        }

    def _load_classifier_state_dict(self, sd):
        self.classifier_params = jax.device_put(
            {
                "fc1": {
                    "w": jnp.asarray(np.asarray(sd["0.weight"]).T),
                    "b": jnp.asarray(np.asarray(sd["0.bias"])),
                },
                "fc2": {
                    "w": jnp.asarray(np.asarray(sd["3.weight"]).T),
                    "b": jnp.asarray(np.asarray(sd["3.bias"])),
                },
            },
            replicated(self.mesh),
        )

    def save_checkpoint(self, epoch: int, best_loss: float, val_metrics=None, train_metrics=None):
        """Write the reference `.pt` checkpoint format (trainer.py:568-586)."""
        import torch

        ckpt = {
            "model_state_dict": export_torch_state_dict(
                jax.device_get(self.model.params), self.model.dims
            ),
            "disease_classifier_state_dict": self._classifier_state_dict(),
            "optimizer_state_dict": _to_jsonable(jax.device_get(self.opt_state)),
            "config": asdict(self.config),
            "dims": self.model.dims.__dict__,
            "epoch": epoch,
            "best_loss": best_loss,
            "val_metrics": _to_jsonable(val_metrics),
            "train_metrics": _to_jsonable(train_metrics),
            "alpha": self.alpha,
            "beta": self.beta,
            "tokenizer_info": {
                "eot_token": self.tokenizer.eot,
                "sot_token": self.tokenizer.sot,
                "disease_tokens": dict(self.tokenizer.disease_tokens),
                "disease_token_ids": dict(self.disease_token_ids),
                "disease_token_position": self.disease_token_position,
            },
        }
        path = self.checkpoint_path()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        torch.save(ckpt, path)
        self._log(f"  best model saved: {path}")

    # --- epoch-level resume (orbax full-state checkpoints) -------------------

    def _resume_pytree(self) -> Dict:
        return {
            "params": jax.device_get(self.model.params),
            "classifier": jax.device_get(self.classifier_params),
            "opt_state": jax.device_get(self.opt_state),
            "rng": jax.device_get(self._rng),
        }

    def save_resume_state(self, directory: str, *, epoch: int, best_loss: float,
                          patience_counter: int, training_history=None) -> None:
        """Write the FULL training state (orbax StandardCheckpointer) so a
        killed run restarts exactly where it stopped."""
        import orbax.checkpoint as ocp

        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        state_dir = os.path.join(directory, "state")
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(state_dir, self._resume_pytree(), force=True)
        meta = {
            "epoch": epoch,
            "best_loss": best_loss,
            "patience_counter": patience_counter,
            "alpha": self.alpha,
            "beta": self.beta,
            "training_history": _to_jsonable(training_history or []),
        }
        tmp = os.path.join(directory, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(directory, "meta.json"))

    def _restore_migrating_opt_state(self, ckptr, state_dir: str,
                                     orig_err: Exception) -> Dict:
        """Fallback for resume checkpoints written by a pre-fused-optimizer
        run: when the structural restore against the fused template fails and
        this trainer uses the fused optimizer, retry with the per-leaf optax
        chain template and convert its state into the arithmetically
        identical FusedAdamWState (fused_optim.migrate_per_leaf_state) — the
        resumed run continues bit-identically. Any other mismatch re-raises
        with the fused_optimizer=False escape hatch named."""
        from .fused_optim import FusedAdamWState, migrate_per_leaf_state

        if not isinstance(self.opt_state, FusedAdamWState):
            raise RuntimeError(
                f"resume checkpoint at {state_dir} does not match this "
                "trainer's optimizer state structure. If it was written by a "
                "run with fused_optimizer=True, construct the trainer with "
                "the same setting."
            ) from orig_err
        per_leaf = self._build_optimizer(force_per_leaf=True)
        template = dict(self._resume_pytree())
        template["opt_state"] = jax.device_get(per_leaf.init(self._trainable()))
        try:
            state = ckptr.restore(state_dir, template)
        except Exception:
            raise RuntimeError(
                f"resume checkpoint at {state_dir} matches neither the fused "
                "flat-buffer optimizer state nor the per-leaf optax chain. "
                "If it was written with a different TrainingConfig "
                "(fused_optimizer / freeze_encoder / model size), construct "
                "the trainer with that config (fused_optimizer=False selects "
                "the per-leaf chain)."
            ) from orig_err
        self._log(
            "resume: migrated per-leaf optimizer state (pre-fused-optimizer "
            "checkpoint) into fused flat buffers"
        )
        migrated = migrate_per_leaf_state(
            self._optimizer_labels(), self._optimizer_hparams(),
            {"model": state["params"], "classifier": state["classifier"]},
            state["opt_state"],
        )
        state["opt_state"] = self._adapt_migrated_state(migrated)
        return state

    def _adapt_migrated_state(self, st):
        """Bring a migrated (f32, unpadded) FusedAdamWState to this
        trainer's buffer layout: moment dtype cast + ZeRO row padding."""
        from .fused_optim import FusedAdamWState, _round_up

        md = jnp.dtype(getattr(self.config, "optimizer_moment_dtype", "float32"))
        dp = int(self.mesh.shape.get("dp", 1)) if self._use_zero1() else 1

        def fix(buf):
            buf = jnp.asarray(buf).astype(md)
            if dp > 1:
                pad = _round_up(buf.shape[0], dp) - buf.shape[0]
                if pad:
                    buf = jnp.pad(buf, ((0, pad), (0, 0)))
            return buf

        return FusedAdamWState(
            count=st.count,
            m={k: fix(v) for k, v in st.m.items()},
            v={k: fix(v) for k, v in st.v.items()},
        )

    def restore_resume_state(self, directory: str) -> Dict:
        """Restore params/classifier/optimizer/PRNG + loop counters saved by
        save_resume_state. Returns the meta dict."""
        import orbax.checkpoint as ocp

        directory = os.path.abspath(directory)
        state_dir = os.path.join(directory, "state")
        with ocp.StandardCheckpointer() as ckptr:
            try:
                state = ckptr.restore(state_dir, self._resume_pytree())
            except Exception as orig_err:
                state = self._restore_migrating_opt_state(
                    ckptr, state_dir, orig_err
                )
        self.model.params = shard_params(state["params"], self.mesh)
        self.classifier_params = jax.device_put(state["classifier"], replicated(self.mesh))
        # restore the optimizer state with the SAME shardings optimizer.init
        # produced: tp-sharded moment tensors keep their mesh layout (they
        # must not be replicated onto every chip); scalar counters and
        # anything init left on the default device are mesh-replicated
        rep = replicated(self.mesh)

        def _sharding_of(x):
            s = getattr(x, "sharding", None)
            if isinstance(s, jax.sharding.NamedSharding) and s.mesh.shape == self.mesh.shape:
                return s
            return rep

        opt_shardings = jax.tree.map(_sharding_of, self.opt_state)
        self.opt_state = jax.device_put(state["opt_state"], opt_shardings)
        self._rng = jnp.asarray(state["rng"])
        with open(os.path.join(directory, "meta.json")) as f:
            meta = json.load(f)
        self.alpha = float(meta["alpha"])
        self.beta = float(meta["beta"])
        return meta

    @classmethod
    def load_from_checkpoint(cls, checkpoint_path: str, verbose: bool = True,
                             **config_overrides) -> "MultiTaskTrainer":
        """Restore from a `.pt` checkpoint — ours *or* the reference's
        (trainer.py:614-629)."""
        ckpt = _torch_load_compat(checkpoint_path)
        config = _coerce_config(ckpt["config"], **config_overrides)
        # no network fetch needed: all weights come from the checkpoint
        config.pretrained = "random"
        trainer = cls(config, verbose=verbose)

        sd = ckpt["model_state_dict"]
        n_vocab = sd["decoder.token_embedding.weight"].shape[0]
        dims = trainer.model.dims.replace(n_vocab=int(n_vocab))
        trainer.model.dims = dims
        trainer.model.params = shard_params(
            convert_torch_state_dict(dims, sd), trainer.mesh
        )
        trainer._load_classifier_state_dict(ckpt["disease_classifier_state_dict"])
        trainer.opt_state = trainer.optimizer.init(trainer._trainable())
        trainer.alpha = float(ckpt.get("alpha", 0.5))
        trainer.beta = float(ckpt.get("beta", 0.5))
        if verbose:
            print(f"Model loaded from: {checkpoint_path}")
        return trainer


# ---------------------------------------------------------------------------
# checkpoint-compat helpers
# ---------------------------------------------------------------------------


def _torch_load_compat(path: str):
    """torch.load that tolerates checkpoints pickled with the reference's
    `speech_disorder` package installed (its TrainingConfig class)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except ModuleNotFoundError as e:
        if "speech_disorder" not in str(e):
            raise
        shim = types.ModuleType("speech_disorder")
        shim_cfg = types.ModuleType("speech_disorder.config")

        class _RefConfig:  # plain attribute bag for unpickling
            pass

        shim_cfg.TrainingConfig = _RefConfig
        shim.config = shim_cfg
        sys.modules.setdefault("speech_disorder", shim)
        sys.modules.setdefault("speech_disorder.config", shim_cfg)
        return torch.load(path, map_location="cpu", weights_only=False)


def _coerce_config(obj: Any, **overrides) -> TrainingConfig:
    """Accept a dict (ours) or any attribute bag (reference pickle)."""
    if isinstance(obj, TrainingConfig):
        cfg = obj
    else:
        known = {f.name for f in fields(TrainingConfig)}
        if isinstance(obj, dict):
            data = {k: v for k, v in obj.items() if k in known}
        else:
            data = {
                k: getattr(obj, k)
                for k in known
                if hasattr(obj, k) and not k.startswith("_")
            }
        data.pop("device", None)
        cfg = TrainingConfig(**data)
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return cfg


def _to_jsonable(obj):
    if isinstance(obj, dict):
        return {str(k): _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, (np.ndarray, jnp.ndarray)):
        return np.asarray(obj).tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if hasattr(obj, "_fields") or hasattr(obj, "__dict__") and not isinstance(obj, type):
        try:
            json.dumps(obj)
            return obj
        except TypeError:
            return str(obj)
    return obj
