#!/usr/bin/env bash
# Reference run_ipynb/base_en/run_base_en_exp_encoder_learn_new_ffmpeg.ipynb, TPU-native.
set -euo pipefail
cd "$(dirname "$0")/.."
DATA_DIR=${DATA_DIR:-../data}
OUT=${OUT:-checkpoints/base_en}

python scripts/train_disease.py \
  --model_size base.en --epochs 50 --batch_size 16 --learning_rate 1e-5 \
  --train_csv "$DATA_DIR/custom_train.csv" --val_csv "$DATA_DIR/custom_val.csv" \
  --test_csv "$DATA_DIR/custom_test.csv" --save_dir "$OUT"

python scripts/inference_disease.py \
  --model_path "$OUT/best_multitask_model_base.en.pt" \
  --test_csv "$DATA_DIR/custom_test.csv" \
  --save_results "$OUT/inference_results.csv"
