#!/usr/bin/env bash
# Serving recipes (see PERF.md for measured numbers on a v5e chip).

# Batched greedy transcription (throughput mode), bit-exact bf16 path:
python -m asr_ttl_mtl_tpu audio1.wav audio2.wav --model base --language en \
  --batch_mode True --beam_size None --temperature 0 --output_dir out/

# int8 KV serving mode: ~+16% batched greedy / +45% beam throughput at base,
# approximately identical output (per-row-scaled int8 KV caches):
python -m asr_ttl_mtl_tpu audio1.wav --model base --language en \
  --kv_int8 True --output_dir out/

# Multi-chip: shard the window batches data-parallel over 8 devices:
python -m asr_ttl_mtl_tpu audio*.wav --model base --language en \
  --batch_mode True --dp 8 --output_dir out/

# Beam search with patience (fully jitted, one XLA program per window):
python -m asr_ttl_mtl_tpu audio1.wav --model base --language en \
  --beam_size 5 --patience 1.5 --output_dir out/
