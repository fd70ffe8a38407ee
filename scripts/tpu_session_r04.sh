#!/bin/bash
# Round-4 TPU artifact re-record, in one ordered session (VERDICT r03 item 1:
# every recorded artifact must be measured AT HEAD).  Each stage logs to
# /tmp/r04_*.log and is individually resumable.
#
#   bash scripts/tpu_session_r04.sh
#
# Stages:
#   1. dataset re-record (vocode-window cap + stream-window warm active,
#      streaming conc 1/2/4, gRPC conc 1/2/4, longform row)
#        -> BENCH_DATASET_r04.json
#   2. scale bench at conc 8/16 (first-chunk-priority vocode scheduling)
#        -> BENCH_SCALE_r04.json
#   3. speculative + distill + sanity task -> SPEC_BENCH_r04.json
#   4. decode-step attribution sweep (dispatch tax vs per-step floor)
#        -> DECODE_ATTRIB_r04.json
#   5. bench.py headline (live; watchdog can only truncate diagnostics)
set -uo pipefail
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) ==="
  timeout "$to" "$@" 2>&1 | tee "/tmp/r04_${name}.log" | tail -5
  echo "=== [$name] rc=$? ==="
}

run dataset 5400 python scripts/run_dataset_bench.py --out BENCH_DATASET_r04.json \
  --streaming_conc 1,2,4 --grpc_conc 1,2,4

run scale 3600 python scripts/run_dataset_bench.py --out BENCH_SCALE_r04.json \
  --tasks 48 --offline_conc 8,16 --streaming_conc 8,16 --grpc_conc '' \
  --longform_requests 0

run spec 2400 python scripts/bench_speculative.py --distill 300 --sanity \
  --out SPEC_BENCH_r04.json

run decode_attrib 2400 python scripts/bench_decode_step.py \
  --sweep_steps 32,64,128,256,512 --iters 5 --out DECODE_ATTRIB_r04.json

run bench 1800 python bench.py

echo "all stages done; update README/BENCH_NOTES from the new artifacts"
