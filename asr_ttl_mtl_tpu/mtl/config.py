"""Training configuration for the multi-task (ASR + disorder) fine-tune.

Field parity with reference `speech_disorder/config.py:5-54`, extended with
TPU-native knobs (mesh shape, token-padding buckets, compute dtype, input
pipeline workers).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class TrainingConfig:
    # model
    model_size: str = "tiny"
    device: str = "auto"  # "auto" | "tpu" | "cpu" (jax platform)

    mode: str = "multi_task"

    # training hyperparameters (reference defaults)
    epochs: int = 50
    batch_size: int = 16
    val_batch_size: int = 8
    learning_rate: float = 1e-5

    # multi-task loss weights; 0.0 means "dynamic": inverse-loss-normalized
    # weights computed once on the first batch, then frozen (replicates the
    # reference's observed behavior — SURVEY.md §5 quirk 2). Set
    # true_dynamic_weights=True for per-step re-weighting instead.
    alpha: float = 0.0
    beta: float = 0.0
    true_dynamic_weights: bool = False

    weight_decay: float = 0.01
    gradient_clip_norm: float = 1.0
    early_stopping_patience: int = 10

    # dataset paths (reference CSV schema: file,text,class)
    train_csv: str = "../data/custom_train.csv"
    val_csv: str = "../data/custom_val.csv"
    test_csv: str = "../data/custom_test.csv"

    freeze_encoder: bool = False
    save_dir: Optional[str] = None

    class_to_disease: Dict[int, str] = field(
        default_factory=lambda: {0: "normal", 1: "dysphonia", 2: "dysarthria"}
    )
    disease_tokens: List[str] = field(
        default_factory=lambda: ["normal", "dysphonia", "dysarthria"]
    )

    # --- TPU-native additions ---
    # where to find pretrained weights; None = registry download / cache.
    # "random" initializes randomly (tests / offline smoke runs).
    pretrained: Optional[str] = None
    compute_dtype: str = "bfloat16"  # forward/backward compute dtype on TPU
    # token sequences are padded up to one of these bucket lengths so XLA
    # compiles a handful of shapes instead of one per batch max-length
    token_buckets: Tuple[int, ...] = (48, 64, 96, 128, 192, 448)
    # device mesh: (data, model) axis sizes; data*model must divide devices
    mesh_shape: Tuple[int, int] = (0, 1)  # 0 = all remaining devices on dp
    num_workers: int = 8  # host-side audio decode threads
    mel_on_device: bool = True  # fuse log-mel into the jitted train step
    seed: int = 0
    # override architecture dims (dict of ModelDimensions fields) — used with
    # pretrained="random" for fast smoke tests on scaled-down models
    debug_dims: Optional[Dict[str, int]] = None
    # samples per training window (480000 = whisper's 30 s; smaller values
    # pair with debug_dims whose n_audio_ctx = audio_samples / 320)
    audio_samples: int = 480000
    # H2D length buckets for the waveforms: each batch ships only up to the
    # smallest bucket covering its longest clip; the jitted step zero-pads to
    # audio_samples on device (bit-identical mels, ~4-8x less transfer for
    # short-clip corpora like TORGO). None = auto (audio_samples//4 and
    # audio_samples); set to (audio_samples,) to always ship the full window
    audio_length_buckets: Optional[Tuple[int, ...]] = None
    # when set, a jax.profiler trace of the first profiled epoch is written
    # here (TensorBoard/Perfetto-viewable) and per-step timing summaries are
    # logged (utils/profiling.py)
    profile_dir: Optional[str] = None
    # optimizer steps fused into one XLA dispatch via lax.scan (0 = auto:
    # 8 on TPU, 1 elsewhere). Per-dispatch overhead scales with the ~500
    # param+optimizer buffer handles, so on remote-attached TPUs single-step
    # dispatch costs more than the compute
    steps_per_call: int = 0
    # waveform host->device transfer dtype. "int16" halves the dominant H2D
    # stream and is EXACT for 16 kHz 16-bit PCM sources (the dataset's
    # native format; scale 32768 round-trips the original samples);
    # resampled audio quantizes at -90 dB, far below the mel log floor.
    # "float32" preserves the reference's float pipeline bit-for-bit.
    # "mel_fp16" ships host-computed log-mels instead of waveforms — 2x fewer
    # bytes than int16 (4x vs float32), ~1e-3 absolute mel rounding (below
    # bf16 compute noise); computed in the loader's producer thread so it
    # overlaps training (audio.log_mel_for_transfer).
    audio_transfer_dtype: str = "int16"
    # pack the ~500-leaf params+optimizer state into one lane-aligned
    # (rows, 128) device buffer per dtype so each fused dispatch marshals a
    # handful of buffer handles instead of ~500. Unpack and repack happen
    # inside the jitted program; bit-identical to unpacked dispatch.
    # Default OFF: measured SLOWER through the axon tunnel (the donated
    # packed buffers re-layout server-side every call — see
    # trainer._use_packed_dispatch); opt in with True on directly-attached
    # hosts. A >1-device mesh always runs unpacked (a flat concat cannot
    # carry per-leaf NamedShardings).
    packed_dispatch: Optional[bool] = None
    # data-parallel execution mode when tp == 1. True (default): the train/
    # eval steps run under shard_map with the batch sharded over dp — every
    # device traces on LOCAL shapes, so the Pallas flash-attention kernels
    # (and their fused backward) stay live on multi-device meshes, exactly
    # like parallel/serving.py's dp decode path; gradients are psum'd over
    # ICI inside the mapped step. False: GSPMD/pjit path (kernels off on
    # >1-device meshes — pallas_call has no partitioning rules). "force":
    # use shard_map even on a 1-device mesh (timing validation). tp > 1
    # always takes the pjit path.
    dp_shard_map: object = True
    # rematerialize each encoder block in the backward pass (jax.checkpoint):
    # trades ~1/3 more encoder FLOPs for dropping the stored T=1500
    # activations — what HBM-OOMs the fused train step at batch >= 128.
    # "auto" (default) enables it when batch_size >= 96 on TPU.
    remat: object = "auto"
    # chunked training cross-entropy (ops/chunked_xent.py): compute the CE
    # fwd+bwd per row-chunk from the (B, T, d) hidden states so the
    # (B, T, 51869) logits tensor is never materialized, for one extra
    # backward matmul. Measured (PERF.md round 5): device step time parity
    # with the materialized path (base bs=64 283 ms / MFU 16.9%); peak-HBM
    # savings scale with B*T (modest at the short T=48 bucket where XLA
    # already reused the logit buffers, decisive at the T=448 bucket and on
    # medium where the fp32 logits would be multi-GB). "auto" (default) =
    # on for single-device and dp-shard_map steps, off on the pjit/GSPMD
    # path. Eval always keeps the materialized fp32 logits (bit-unchanged
    # teacher-forced semantics).
    chunked_ce: object = "auto"
    # rows per chunk in the chunked CE scan: transient is
    # (ce_chunk_rows, n_vocab) f32 (~106 MB at 512); >=256 keeps the MXU
    # busy, smaller trims transient memory further
    ce_chunk_rows: int = 512
    # fused flat-buffer 4-group AdamW (mtl/fused_optim.py): arithmetically
    # identical to the per-leaf optax chain (bit-parity differential in
    # tests/test_fused_optim.py) but collapses the ~3000-op per-leaf
    # optimizer tail into a few lane-aligned chains. Automatically falls
    # back to the per-leaf chain when tp > 1 (sharded params cannot live in
    # one flat buffer). Orbax resume checkpoints written by an older
    # per-leaf run are detected and migrated into the flat buffers
    # automatically (bit-identical continuation — trainer.
    # _restore_migrating_opt_state); set False to force the per-leaf chain.
    fused_optimizer: bool = True
    # storage dtype for the fused optimizer's m/v buffers. "float32"
    # (default) is bit-identical to the per-leaf optax chain; "bfloat16"
    # halves optimizer-state HBM (what lets whisper-medium fine-tune on one
    # 16 GB chip) — the update math still runs in f32 from upcast moments,
    # only the stored state rounds. Convergence differential vs fp32
    # moments in tests/test_fused_optim.py.
    optimizer_moment_dtype: str = "float32"
    # ZeRO-1: row-shard the fused optimizer's (rows, 128) m/v buffers over
    # the dp axis (each device stores and updates rows/dp of the optimizer
    # state, then all-gathers the per-group adam terms for the apply).
    # Bit-identical to the replicated update. Requires the dp shard_map
    # path with dp > 1; ignored otherwise.
    zero1: bool = False


DISORDER_TYPE = {0: "Normal", 1: "Dysphonia", 2: "Dysarthria"}
