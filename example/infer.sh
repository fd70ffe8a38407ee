#!/usr/bin/env bash
# Demo inference (role of reference example/infer.sh): synthesizes one
# utterance by voice-cloning from a prompt wav.
#
#   ./example/infer.sh [MODEL_DIR]
#
# Without MODEL_DIR the pipeline runs random-init (smoke test).
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL_DIR="${1:-}"
ARGS=(--text "Hello! This is the TPU-native Spark TTS stack." \
      --save_dir example/results \
      --max_new_tokens 500)
if [[ -n "$MODEL_DIR" ]]; then
  ARGS+=(--model_dir "$MODEL_DIR" --prompt_speech_path example/prompt_audio.wav \
         --prompt_text "prompt transcript here")
else
  ARGS+=(--gender female --pitch moderate --speed moderate --max_new_tokens 50)
fi
python -m sparktts_tpu.cli "${ARGS[@]}"
