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

# Batched beam serving (submit/collect pipelined; PERF.md: beam=5 int8
# B=48 = 4439 audio-sec/s/chip on a v5e):
python -m asr_ttl_mtl_tpu audio*.wav --model base --language en \
  --batch_mode True --beam_size 5 --kv_int8 True --output_dir out/

# Per-model best measured throughput configs (PERF.md family table):
#   tiny/base/small  -> --kv_int8 True --int8_encoder True  (int8 enc wins at d<=768)
#   medium/large/turbo -> --kv_int8 True                    (bf16 enc wins at d>=1024)
python -m asr_ttl_mtl_tpu audio*.wav --model small --language en \
  --batch_mode True --kv_int8 True --int8_encoder True --output_dir out/

# Very large model whose fused encoder+decode program exceeds a remote
# compiler's size limit: compile them as two smaller programs instead
# (still pipelined; needed for large-v3 at B>=32 through a tunnel):
python -m asr_ttl_mtl_tpu audio*.wav --model large-v3 --language en \
  --batch_mode True --kv_int8 True --fuse_encoder False --output_dir out/

# Mixed-language batch: language detection runs per input file (one
# batched detect_language call), windows decode grouped by language:
python -m asr_ttl_mtl_tpu english.wav french.wav korean.wav --model base \
  --batch_mode True --output_dir out/
