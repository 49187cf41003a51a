#!/usr/bin/env bash
# Whisper-medium (769M) MTL fine-tune on ONE 16 GB v5e chip — the
# size-agnostic-training parity run (reference speech_disorder/config.py:7 +
# whisper/__init__.py:103 accept any size; a 24 GB RTX 3090 fits medium in
# torch fp32 only barely — here the same fits via:
#   * bf16 AdamW moments (halves optimizer HBM: 12.3 -> 9.2 GB static)
#   * chunked cross-entropy (the (B,T,52k) logits tensor never exists)
#   * encoder remat (auto policy keeps it on at this size)
# On a multi-chip pod slice, add `--dp N --zero1` to ZeRO-shard the
# optimizer state over data parallelism instead of going low-precision.
set -euo pipefail
cd "$(dirname "$0")/.."
DATA_DIR=${DATA_DIR:-../data}
OUT=${OUT:-checkpoints/medium}

python scripts/train_disease.py \
  --model_size medium --epochs 50 --batch_size 8 --learning_rate 1e-5 \
  --optimizer_moment_dtype bfloat16 \
  --train_csv "$DATA_DIR/custom_train.csv" --val_csv "$DATA_DIR/custom_val.csv" \
  --test_csv "$DATA_DIR/custom_test.csv" --save_dir "$OUT" \
  --resume_dir "$OUT/resume"

python scripts/inference_disease.py \
  --model_path "$OUT/best_multitask_model_medium.pt" \
  --test_csv "$DATA_DIR/custom_test.csv" \
  --save_results "$OUT/inference_results.csv"
