#!/usr/bin/env python
"""Stage attribution of the WaveGenerator vocoder's time budget.

The vocoder is the second-hottest path (BENCH_NOTES: 15.6 ms per 500-token
utterance after the shifted-matmul/subpixel rewrite) but its ~480 GFLOP at
production dims bound it at ~2.5 ms on v5e — i.e. it runs at ~15% MXU
utilization.  This script times each decoder block separately (and the full
stack) to locate where the gap lives before building any fused kernel:
late blocks have long T and channels below the 128-lane MXU tile (192/96),
so the per-tap shifted matmuls may be lane-starved there.

Each stage is timed as an n_iters-iteration scan inside ONE jitted program
(the relay's ~33 ms dispatch floor amortizes out); a carry-dependent
perturbation of the input keeps XLA from hoisting the loop-invariant body.

    python scripts/bench_vocoder.py                  # production dims
    python scripts/bench_vocoder.py --batch 8
    python scripts/bench_vocoder.py --tiny           # CPU smoke
"""
import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparktts_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--t_in", type=int, default=500, help="latent frames (tokens)")
    ap.add_argument("--iters", type=int, default=16, help="scan length per program")
    ap.add_argument("--reps", type=int, default=5, help="timed reps (min taken)")
    ap.add_argument(
        "--modes", default="xla",
        help="comma list of ResidualUnit impls to sweep: xla,carry,tiles "
        "(carry/tiles = fused Pallas unit variants, "
        "kernels/vocoder_fusion.py)",
    )
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp


    from sparktts_tpu.codec.wave_generator import (
        _decoder_block_apply,
        init_wave_generator,
        wave_generator_apply,
    )
    from sparktts_tpu.config import WaveGeneratorConfig
    from sparktts_tpu.nn.layers import conv1d_apply, snake_apply

    if args.tiny:
        cfg = WaveGeneratorConfig(
            input_channel=32, channels=48, rates=(2, 2), kernel_sizes=(4, 4)
        )
        args.t_in = min(args.t_in, 16)
        args.iters = min(args.iters, 2)
        args.reps = min(args.reps, 2)
    else:
        cfg = WaveGeneratorConfig()

    params = jax.device_put(
        jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            init_wave_generator(jax.random.PRNGKey(0), cfg),
        )
    )
    B, T = args.batch, args.t_in

    # stage list: (name, fn(params, x) -> y, input shape (B, T, C))
    stages = [
        (
            "conv_in",
            lambda p, x: conv1d_apply(p["conv_in"], x, padding=3),
            (B, T, cfg.input_channel),
        )
    ]
    t = T
    for i, (k, s) in enumerate(zip(cfg.kernel_sizes, cfg.rates)):
        cin = cfg.channels // 2**i

        def blk(p, x, i=i, k=k, s=s):
            return _decoder_block_apply(p["blocks"][i], x, k, s)

        stages.append((f"block{i}_x{s}_c{cin}", blk, (B, t, cin)))
        t *= s
    cout = cfg.channels // 2 ** len(cfg.rates)

    def out_stage(p, x):
        y = snake_apply(p["snake_out"], x)
        return jnp.tanh(conv1d_apply(p["conv_out"], y, padding=3))

    stages.append(("out", out_stage, (B, t, cout)))
    stages.append(
        (
            "full",
            lambda p, x: wave_generator_apply(p, x, cfg),
            (B, T, cfg.input_channel),
        )
    )

    def flops(name, shape):
        """MACs*2 for the matmul work of a stage (elementwise excluded)."""
        b, t_in_s, cin = shape
        if name == "conv_in":
            return 2 * b * t_in_s * cin * cfg.channels * 7
        if name == "out":
            return 2 * b * t_in_s * cin * cfg.d_out * 7
        if name == "full":
            return sum(flops(n, s) for n, _, s in stages if n != "full")
        i = int(name.split("_")[0][5:])
        k, s = cfg.kernel_sizes[i], cfg.rates[i]
        co = cin // 2
        up = 2 * b * t_in_s * cin * co * k
        res = 3 * (2 * b * t_in_s * s * co * co * (7 + 1))
        return up + res

    # `mode` is part of the jit key: _residual_unit_apply reads
    # SPARKTTS_VOCODER_KERNEL at TRACE time, so a fresh static arg forces
    # a retrace after the env flips between sweep passes
    @functools.partial(jax.jit, static_argnames=("idx", "mode"))
    def run(params, x, idx, mode):
        fn = stages[idx][1]

        def body(acc, _):
            y = fn(params, x + (acc * 1e-12).astype(x.dtype))
            return y.astype(jnp.float32).mean(), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=args.iters
        )
        return acc

    import os

    results = {}
    for mode in args.modes.split(","):
        os.environ["SPARKTTS_VOCODER_KERNEL"] = mode
        res = {}
        for idx, (name, _, shape) in enumerate(stages):
            x = jnp.zeros(shape, jnp.bfloat16) + 0.01
            acc = run(params, x, idx, mode)
            jax.device_get(acc)  # warm + force completion (relay block advisory)
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.device_get(run(params, x, idx, mode))
                times.append(time.perf_counter() - t0)
            ms = min(times) / args.iters * 1e3
            gf = flops(name, shape) / 1e9
            res[name] = {
                "ms": round(ms, 3),
                "gflop": round(gf, 1),
                "tflops": round(gf / ms, 2) if ms > 0 else None,
            }
            print(mode, name, res[name], flush=True)
        results[mode] = res

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
