#!/bin/bash
# Round-3 pending TPU measurements, in one ordered session (run when the TPU
# relay is reachable).  Each stage logs to /tmp/r03_*.log and is individually
# resumable; re-running skips nothing (cheap stages are idempotent).
#
#   bash scripts/tpu_session_r03.sh
#
# Stages:
#   1. first-chunk A/B: fused admission vs three-program chain
#   2. int8 MLP matvec kernel measurement (SPARKTTS_MLP_KERNEL=1 vs 0)
#   3. full dataset bench re-record -> BENCH_DATASET_r03.json
#   4. bench.py headline refresh -> BENCH_LAST.json
set -uo pipefail
cd "$(dirname "$0")/.."

run() { # name, timeout_s, cmd...
  local name=$1 to=$2; shift 2
  echo "=== [$name] $(date -u +%H:%M:%S) ==="
  timeout "$to" "$@" 2>&1 | tee "/tmp/r03_${name}.log" | tail -5
  echo "=== [$name] rc=$? ==="
}

# 1. fused-admission first-chunk A/B (production dims, int8 LM)
run first_chunk 2400 python scripts/bench_first_chunk.py --tasks 8

# 2. decode-step with and without the fused int8 MLP kernel
run mlp_xla    1200 python scripts/bench_decode_step.py --iters 5
run mlp_kernel 1200 env SPARKTTS_MLP_KERNEL=1 python scripts/bench_decode_step.py --iters 5

# 3. dataset re-record (fused offline + decode kernel + first-chunk levers)
run dataset 3600 python scripts/run_dataset_bench.py --out BENCH_DATASET_r03.json

# 4. headline single-stream RTF
run bench 1800 python bench.py

echo "all stages done; diff BENCH_DATASET_r03.json + update README/BENCH_NOTES"
