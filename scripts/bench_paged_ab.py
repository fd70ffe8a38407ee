#!/usr/bin/env python
"""Dense vs paged-KV serving A/B at production dims (VERDICT r03 item 5).

The paged engine (Pallas page-table decode kernel, `lm/paged.py`) is
single-device-only: its per-page DMA indexing does not compose with the
GSPMD-sharded dense engine (`continuous_server.py` rejects paged+shard_llm).
The kernel itself measured at parity with dense attention in isolation
(BENCH_NOTES "Paged KV kernel"); this records the SERVING-level comparison —
same tasks, same continuous server, dense vs paged — so the dense-default /
tp-composability tradeoff rests on a measured number rather than an isolated
microbenchmark (reference paged-KV role: runtime/triton_trtllm/run.sh:65).

    python scripts/bench_paged_ab.py --tasks 8 --out PAGED_AB.json
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparktts_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", type=int, default=8)
    ap.add_argument("--concurrency", default="1,4")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--max_new_tokens", type=int, default=500)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sparktts_tpu.bench.harness import run_continuous_benchmark
    from sparktts_tpu.pipeline import SparkTTSPipeline

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from run_dataset_bench import make_tasks  # noqa: E402

    if args.tiny:
        pipe = SparkTTSPipeline(max_new_tokens=32, prompt_bucket=32)
        tasks = make_tasks(args.tasks, (16, 24, 32), (1,))
    else:
        from sparktts_tpu.config import SparkTTSConfig
        from sparktts_tpu.lm.quant import quantize_qwen_int8

        pipe = SparkTTSPipeline(
            config=SparkTTSConfig(), max_new_tokens=args.max_new_tokens
        )
        pipe.llm_params = jax.tree.map(jnp.asarray, quantize_qwen_int8(pipe.llm_params))
        tasks = make_tasks(args.tasks, (args.max_new_tokens,), (3, 6))
    pipe.vocode_bucket = args.max_new_tokens if not args.tiny else 32

    concs = [int(c) for c in args.concurrency.split(",") if c]
    results = {
        "bench": "paged_vs_dense_serving",
        "dims": "tiny" if args.tiny else "production (0.5B, int8 LM)",
        "backend": jax.default_backend(),
        "tasks": len(tasks),
        "runs": [],
    }
    from sparktts_tpu.bench.relay_probe import probe_record

    results["dispatch_tax_session_start"] = probe_record("session start")
    for engine in ("dense", "paged"):
        paged = engine == "paged"
        for streaming in (False, True):
            # warm pass at EVERY timed concurrency (VERDICT r04 item 7: a
            # warm pass at conc 2 alone leaves batch-composition signatures
            # cold for the conc-1/4 timed rows — the r04 dense rows carried
            # exactly that confound)
            for conc in sorted(set([2] + concs)):
                run_continuous_benchmark(
                    pipe, tasks, concurrency=conc, streaming=streaming,
                    paged=paged,
                )
            for conc in concs:
                s = run_continuous_benchmark(
                    pipe, tasks, concurrency=conc, streaming=streaming,
                    paged=paged,
                )
                row = {
                    "engine": engine,
                    "streaming": streaming,
                    "concurrency": conc,
                    "rtf": s["rtf"],
                    "avg_latency_ms": s["avg_latency_ms"],
                    "p90_latency_ms": s["p90_latency_ms"],
                    "dispatch_tax": probe_record(),
                }
                for k in ("first_chunk_p50_ms", "first_chunk_p90_ms"):
                    if k in s:
                        row[k] = s[k]
                print(json.dumps(row), file=sys.stderr)
                results["runs"].append(row)
    print(json.dumps(results, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
