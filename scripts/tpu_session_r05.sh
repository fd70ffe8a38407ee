#!/bin/bash
# Round-5 TPU artifact re-record, in one ordered session (VERDICT r04 items
# 1-4, 5, 7).  Every artifact now embeds its own relay-health probe
# (dispatch_tax), so each cell carries the window it was measured in.
#
#   bash scripts/tpu_session_r05.sh
#
# Stages:
#   1. dataset re-record (multi-slot spec first chunks + pipelined dispatch
#      depth 2 + reused gRPC channel; streaming conc 1/2/4, gRPC conc 1/2/4,
#      REAL-HTTP conc 1/2, longform n=8 overlapped) -> BENCH_DATASET_r05.json
#   2. scale bench at conc 8/16 with max_slots=16 (every stream admits
#      immediately; VERDICT r04 item 3) -> BENCH_SCALE_r05.json
#   3. dispatch-depth A/B (depth 1 vs 2 at streaming conc 1/2)
#      -> DEPTH_AB_r05.json (two part files merged by the builder)
#   4. paged-vs-dense waiver re-record with clean control arm
#      -> PAGED_AB_r05.json
#   5. first-chunk mode A/B -> FIRST_CHUNK_BENCH_r05.json
#   6. bench.py headline (live; watchdog can only truncate diagnostics)
set -uo pipefail
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) ==="
  timeout "$to" "$@" 2>&1 | tee "/tmp/r05_${name}.log" | tail -5
  echo "=== [$name] rc=$? ==="
}

run dataset 5400 python scripts/run_dataset_bench.py --out BENCH_DATASET_r05.json \
  --streaming_conc 1,2,4 --grpc_conc 1,2,4 --http_conc 1,2 --longform_requests 8

run scale 3600 python scripts/run_dataset_bench.py --out BENCH_SCALE_r05.json \
  --tasks 48 --max_slots 16 --offline_conc 8,16 --streaming_conc 8,16 \
  --grpc_conc '' --longform_requests 0

run depth1 2400 env SPARKTTS_DISPATCH_DEPTH=1 python scripts/run_dataset_bench.py \
  --out DEPTH_AB_r05_depth1.json --tasks 12 --offline_conc '' \
  --streaming_conc 1,2 --grpc_conc '' --longform_requests 0

run depth2 2400 env SPARKTTS_DISPATCH_DEPTH=2 python scripts/run_dataset_bench.py \
  --out DEPTH_AB_r05_depth2.json --tasks 12 --offline_conc '' \
  --streaming_conc 1,2 --grpc_conc '' --longform_requests 0

run paged_ab 3600 python scripts/bench_paged_ab.py --tasks 8 \
  --concurrency 1,4 --out PAGED_AB_r05.json

run first_chunk 2400 python scripts/bench_first_chunk.py --tasks 8

run bench 1800 python bench.py

echo "all stages done; update README/BENCH_NOTES from the new artifacts"
