#!/usr/bin/env bash
# Staged deployment runbook — role of the reference's runtime/triton_trtllm/run.sh
# (stages 0-5: convert -> build -> serve -> smoke -> bench).
#
# Usage:
#   bash scripts/deploy.sh <start_stage> <stop_stage> [model_dir]
#   bash scripts/deploy.sh 0 5                  # full flow, random-init tiny config
#   bash scripts/deploy.sh 0 5 /path/to/Spark-TTS-0.5B
#
# Stages:
# Env: SPARKTTS_PLATFORM=cpu forces the CPU backend (smoke flows on shared
# or tunneled accelerators); default is the ambient jax platform.
#
#   0  convert checkpoint -> cached pytrees (orbax) / validate random-init
#   1  export deployment artifacts (StableHLO graph set, reference's 6-graph split)
#   2  start the HTTP TTS server (background, waits for /health)
#   3  offline smoke request through the network (client CLI)
#   4  streaming smoke request (chunked /tts_stream)
#   5  mini offline benchmark; then stop the server
set -euo pipefail

START=${1:-0}
STOP=${2:-5}
MODEL_DIR=${3:-}
HOST=127.0.0.1
PORT=${PORT:-8959}
WORK=${WORK:-/tmp/sparktts_deploy}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
MODEL_ARG=""
[ -n "$MODEL_DIR" ] && MODEL_ARG="--model_dir $MODEL_DIR"

mkdir -p "$WORK"

run_stage() { [ "$START" -le "$1" ] && [ "$1" -le "$STOP" ]; }

if run_stage 0; then
  echo "=== stage 0: checkpoint conversion / param cache"
  python - "$MODEL_DIR" <<'EOF'
import sys
from sparktts_tpu.utils.platform import apply_platform_env
apply_platform_env()
model_dir = sys.argv[1] or None
from sparktts_tpu.pipeline import SparkTTSPipeline
pipe = SparkTTSPipeline(model_dir=model_dir, max_new_tokens=24, prompt_bucket=32)
n = sum(x.size for x in __import__("jax").tree.leaves(pipe.llm_params))
print(f"stage 0 OK: params loaded ({'checkpoint: ' + model_dir if model_dir else 'random-init tiny config'}), LM params {n/1e6:.1f}M")
EOF
fi

if run_stage 1; then
  echo "=== stage 1: export deployment artifacts -> $WORK/artifacts"
  python - "$MODEL_DIR" "$WORK/artifacts" <<'EOF'
import sys
from sparktts_tpu.utils.platform import apply_platform_env
apply_platform_env()
model_dir = sys.argv[1] or None
out = sys.argv[2]
from sparktts_tpu.export import export_pipeline_artifacts
from sparktts_tpu.pipeline import SparkTTSPipeline
pipe = SparkTTSPipeline(model_dir=model_dir, max_new_tokens=24, prompt_bucket=32)
manifest = export_pipeline_artifacts(pipe, out, wav_seconds=1.0, vocoder_tokens=50, prompt_len=32)
print(f"stage 1 OK: exported {sorted(manifest)} -> {out}")
EOF
fi

if run_stage 2; then
  echo "=== stage 2: start HTTP server on :$PORT"
  python "$REPO/scripts/run_server.py" $MODEL_ARG --host $HOST --port $PORT \
    --max_new_tokens 24 > "$WORK/server.log" 2>&1 &
  echo $! > "$WORK/server.launcher.pid"
  for i in $(seq 1 120); do
    if curl -sf --max-time 2 "http://$HOST:$PORT/health" > /dev/null 2>&1; then
      echo "stage 2 OK: server healthy after ${i}s"; break
    fi
    [ "$i" = 120 ] && { echo "server failed to start"; tail -5 "$WORK/server.log"; exit 1; }
    sleep 1
  done
fi

if run_stage 3; then
  echo "=== stage 3: offline smoke request"
  python - "$WORK/prompt.wav" <<'EOF'
import sys, numpy as np
from sparktts_tpu.utils.platform import apply_platform_env
apply_platform_env()
from sparktts_tpu.io.audio import write_wav
sr = 16000; t = np.arange(sr) / sr
write_wav(sys.argv[1], (0.3 * np.sin(2 * np.pi * 240 * t)).astype(np.float32), sr)
EOF
  python -m sparktts_tpu.serve.client --host $HOST --port $PORT \
    --text "deployment smoke test" --prompt-wav "$WORK/prompt.wav" \
    --output "$WORK/smoke_offline.wav"
  echo "stage 3 OK"
fi

if run_stage 4; then
  echo "=== stage 4: streaming smoke request"
  python -m sparktts_tpu.serve.client --host $HOST --port $PORT \
    --text "streaming smoke test" --prompt-wav "$WORK/prompt.wav" \
    --stream --output "$WORK/smoke_stream.wav"
  echo "stage 4 OK"
fi

if run_stage 5; then
  echo "=== stage 5: mini offline benchmark"
  python "$REPO/scripts/benchmark.py" $MODEL_ARG --num_synthetic 2 \
    --max_new_tokens 24 --output "$WORK/bench.json" | tail -12
  echo "stage 5 OK: stats in $WORK/bench.json"
  PID=$(ss -ltnp 2>/dev/null | grep ":$PORT" | grep -oP 'pid=\K[0-9]+' | head -1 || true)
  [ -n "${PID:-}" ] && kill "$PID" && echo "server stopped"
fi

echo "deploy.sh: stages $START-$STOP complete (work dir: $WORK)"
