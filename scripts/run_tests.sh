#!/usr/bin/env bash
# Sharded test runner: the full suite in a few SEPARATE pytest processes.
#
# Rationale: one ~40-minute pytest process accumulates hundreds of compiled
# XLA:CPU executables plus the serving tests' thread stacks, and this
# environment's XLA:CPU occasionally segfaults inside backend_compile_and_load
# late in such a run (known flake, NOTES_ROUND3.md — crash is inside the XLA
# compiler, not in framework code; every affected test passes standalone).
# Sharding bounds per-process accumulation and isolates any crash.
#
#   bash scripts/run_tests.sh [n_shards]   # default 4
set -u
cd "$(dirname "$0")/.."
n=${1:-4}

mapfile -t files < <(ls tests/test_*.py | sort)
total=${#files[@]}
fail=0
for ((i = 0; i < n; i++)); do
  shard=()
  for ((j = i; j < total; j += n)); do
    shard+=("${files[$j]}")
  done
  echo "=== shard $((i + 1))/$n: ${shard[*]}"
  JAX_PLATFORMS=cpu python -m pytest "${shard[@]}" -q || fail=1
done
exit $fail
