#!/usr/bin/env bash
# Long-form transcription with word-level timestamps (the vendored-Whisper
# side of the reference: `python -m whisper <file>`).
set -euo pipefail
cd "$(dirname "$0")/.."
AUDIO=${1:?usage: transcribe.sh <audio.wav> [model]}
MODEL=${2:-base}

python -m asr_ttl_mtl_tpu "$AUDIO" \
  --model "$MODEL" --word_timestamps True --output_format all \
  --output_dir transcripts
