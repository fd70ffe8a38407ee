#!/usr/bin/env python
"""How does the continuous engine's per-step decode cost scale with the
dispatch size (scan length)?  Sizes the DISPATCH_LADDER economics: the
adaptive scheduler trades per-dispatch relay round-trips against scan length,
which is only a win if ms/step stays flat as n_steps grows.

    python scripts/bench_dispatch_scaling.py --rungs 64,128,256,512 --iters 3
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparktts_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", default="64,128,256,512")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--max_slots", type=int, default=8)
    ap.add_argument("--active", type=int, default=1)
    ap.add_argument("--cache_len", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp


    from sparktts_tpu.config import QwenConfig
    from sparktts_tpu.lm.continuous import ContinuousBatchingEngine
    from sparktts_tpu.lm.quant import quantize_qwen_int8
    from sparktts_tpu.lm.qwen import init_qwen

    cfg = QwenConfig()
    params = jax.device_put(
        quantize_qwen_int8(init_qwen(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    )
    vocab_slice = (151665, 151665 + 8192)
    rungs = [int(r) for r in args.rungs.split(",")]

    def fresh_engine():
        eng = ContinuousBatchingEngine(
            params, cfg, max_slots=args.max_slots, cache_len=args.cache_len,
            prompt_pad=64, eos_ids=(cfg.eos_token_id,), pad_id=0,
            vocab_slice=vocab_slice, extra_ids=(cfg.eos_token_id,),
            max_dispatch=max(rungs),
        )
        for _ in range(args.active):
            # budget = full cache so the device stop never fires mid-timing
            eng.submit(list(range(10, 42)), max_new_tokens=args.cache_len - 64)
        return eng

    # warm every rung once (compile / cache load outside the timed loop)
    eng = fresh_engine()
    for n in rungs:
        t0 = time.perf_counter()
        eng.step(n)
        print(f"warm n={n}: {(time.perf_counter() - t0) * 1e3:.0f} ms", flush=True)

    for n in rungs:
        eng = fresh_engine()
        eng.step(rungs[0])  # settle
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            eng.step(n)
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"n_steps={n:4d}: best {best * 1e3:8.1f} ms  "
            f"{best / n * 1e3:6.3f} ms/step  (all: "
            + ", ".join(f"{t * 1e3:.0f}" for t in times) + ")",
            flush=True,
        )


if __name__ == "__main__":
    main()
