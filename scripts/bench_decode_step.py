#!/usr/bin/env python
"""Microbenchmark the decode step at production dims (Qwen2.5-0.5B,
int8 weights, guided decoding) to attribute the per-step time budget.

Knobs swept:
  * layer-scan unroll factor (scan boundary tax attribution)
  * greedy vs sampled (sampler cost attribution)

    python scripts/bench_decode_step.py --n_steps 128 --iters 5
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparktts_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_steps", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--t_pad", type=int, default=256)
    ap.add_argument("--cache_len", type=int, default=2048)
    ap.add_argument("--unrolls", default="1,2,4,6")
    ap.add_argument("--no_guided", action="store_true")
    ap.add_argument(
        "--sweep_steps", default=None,
        help="comma-separated scan lengths (e.g. 32,64,128,256,512): instead "
        "of the unroll sweep, record ms/token vs scan length at the best "
        "unroll and fit t(n) = dispatch_tax + n*step_floor — attribution of "
        "the relay dispatch tax vs the weight-streaming compute floor "
        "(VERDICT r03 item 8)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp


    from sparktts_tpu.config import QwenConfig
    from sparktts_tpu.lm.generate import decode_chunk, init_kv_cache, prefill
    from sparktts_tpu.lm.quant import quantize_qwen_int8
    from sparktts_tpu.lm.qwen import init_qwen

    cfg = QwenConfig()
    # clone-mode guided constraint shape: 8192 semantic rows + EOS
    vocab_slice = None if args.no_guided else (151665, 151665 + 8192)
    extra_ids = () if args.no_guided else (cfg.eos_token_id,)

    key = jax.random.PRNGKey(0)
    params = quantize_qwen_int8(init_qwen(key, cfg, dtype=jnp.bfloat16))
    params = jax.device_put(params)

    b, t_pad = args.batch, args.t_pad
    ids = jax.random.randint(key, (b, t_pad), 0, 1000, jnp.int32)
    mask = jnp.ones((b, t_pad), bool)

    if args.sweep_steps:
        import numpy as np

        steps_list = [int(s) for s in args.sweep_steps.split(",")]
        kwargs = dict(
            temperature=0.8, top_k=50, top_p=0.95,
            eos_ids=(), pad_id=0, greedy=False,
            vocab_slice=vocab_slice, extra_ids=extra_ids,
        )

        def fresh_state():
            # each measured scan starts from the same cache position (a long
            # sweep would otherwise overflow cache_len across iterations)
            cache = init_kv_cache(cfg, b, args.cache_len, jnp.bfloat16)
            return prefill(
                params, cfg, ids, mask, cache, jax.random.PRNGKey(1),
                0.8, 50, 0.95, greedy=False,
                vocab_slice=vocab_slice, extra_ids=extra_ids,
            )

        rows = []
        for n_steps in steps_list:
            state = fresh_state()
            _, toks, _ = decode_chunk(
                params, cfg, state, t_pad, n_steps, **kwargs
            )
            jax.device_get(toks)  # compile
            times = []
            for _ in range(args.iters):
                state = fresh_state()
                jax.device_get(state.cur_token)  # fence: prefill off the clock
                t0 = time.perf_counter()
                _, toks, _ = decode_chunk(
                    params, cfg, state, t_pad, n_steps, **kwargs
                )
                jax.device_get(toks)
                times.append(time.perf_counter() - t0)
            best = min(times)
            rows.append({
                "scan_steps": n_steps,
                "ms_total": round(best * 1e3, 2),
                "ms_per_token": round(best / n_steps * 1e3, 4),
                "tok_s": round(n_steps / best, 1),
            })
            print(json.dumps(rows[-1]), flush=True)
        # least-squares fit t(n) = a + b*n: `a` is the fixed per-dispatch tax
        # (host->relay->device enqueue + packed fetch), `b` the asymptotic
        # per-step floor (weight streaming + scan-boundary work)
        ns = np.asarray([r["scan_steps"] for r in rows], float)
        ts = np.asarray([r["ms_total"] for r in rows], float)
        bfit, afit = np.polyfit(ns, ts, 1)
        doc = {
            "bench": "decode_step_attribution",
            "dims": f"batch {b}, int8, guided={not args.no_guided}, "
                    f"cache {args.cache_len}",
            "rows": rows,
            "fit": {
                "dispatch_tax_ms": round(float(afit), 3),
                "per_step_floor_ms": round(float(bfit), 4),
                "note": "t(n) = dispatch_tax + n*per_step_floor (least squares)",
            },
        }
        print(json.dumps(doc, indent=2))
        if args.out:
            Path(args.out).write_text(json.dumps(doc, indent=2) + "\n")
        return

    results = {}
    for unroll in [int(u) for u in args.unrolls.split(",")]:
        for greedy in (False, True):
            cache = init_kv_cache(cfg, b, args.cache_len, jnp.bfloat16)
            state = prefill(
                params, cfg, ids, mask, cache, jax.random.PRNGKey(1),
                0.8, 50, 0.95, greedy=greedy,
                vocab_slice=vocab_slice, extra_ids=extra_ids,
            )
            kwargs = dict(
                temperature=0.8, top_k=50, top_p=0.95,
                eos_ids=(), pad_id=0, greedy=greedy,
                vocab_slice=vocab_slice, extra_ids=extra_ids,
                scan_unroll=unroll,
            )
            # warm (compile); device_get — block_until_ready does not
            # synchronize through the axon relay
            t0 = time.perf_counter()
            state, toks, valid = decode_chunk(
                params, cfg, state, t_pad, args.n_steps, **kwargs
            )
            jax.device_get(toks)
            compile_s = time.perf_counter() - t0

            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                state, toks, valid = decode_chunk(
                    params, cfg, state, t_pad, args.n_steps, **kwargs
                )
                jax.device_get(toks)
                times.append(time.perf_counter() - t0)
            best = min(times)
            ms_per_tok = best / args.n_steps * 1e3
            name = f"unroll{unroll}_{'greedy' if greedy else 'sampled'}"
            results[name] = {
                "ms_per_token": round(ms_per_tok, 4),
                "tok_s": round(args.n_steps / best, 1),
                "compile_s": round(compile_s, 1),
            }
            print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
