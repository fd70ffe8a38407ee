#!/usr/bin/env python
"""Long-stream vocode scaling A/B: receptive-field-windowed streaming vocode
vs full-prefix recompute, one long clone stream through the continuous
server at production dims.

The reference's streaming BLS re-vocodes the full token prefix for every
chunk (its growing-chunk schedule caps chunks at 30 s to bound that cost),
so per-chunk vocode work grows linearly with stream position.  The windowed
path re-renders only [emitted - RF, upto) with bit-identical output
(codec/bicodec.py:detokenize_receptive_field), so per-chunk cost — and the
set of compiled detokenize shapes — stays O(1) in stream length.

    python scripts/bench_long_stream.py --max_new_tokens 2000

Prints one JSON object: per-arm RTF, first-chunk, inter-chunk gap
percentiles, and the server's vocode stage stats (warm pass).
"""
import argparse
import asyncio
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparktts_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


async def run_stream(server, text, prompt_wav, max_new_tokens):
    t0 = time.perf_counter()
    arrivals, audio_s = [], 0.0
    async for chunk in server.synthesize_streaming(
        text, prompt_wav=prompt_wav, max_new_tokens=max_new_tokens
    ):
        arrivals.append(time.perf_counter() - t0)
        audio_s += len(chunk) / server.pipe.sample_rate
    return arrivals, audio_s


def run_arm(pipe, ctx, text, prompt_wav, max_new_tokens, passes=2):
    """Build a fresh server with the given stream context; warm then measure."""
    import numpy as np

    from sparktts_tpu.serve.continuous_server import ContinuousTTSServer

    out = {}

    async def go():
        server = ContinuousTTSServer(
            pipe, max_slots=2, steps_per_dispatch=512,
            fused_warm="sync", stream_context_frames=ctx,
        )
        await server.start()
        for p in range(passes):  # last pass is the warm measurement
            t0 = time.perf_counter()
            arrivals, audio_s = await run_stream(
                server, text, prompt_wav, max_new_tokens
            )
            wall = time.perf_counter() - t0
        gaps = np.diff(np.asarray(arrivals)) * 1000
        voc = server.stage_stats.summary().get("vocode", {})
        out.update(
            chunks=len(arrivals),
            audio_s=round(audio_s, 2),
            wall_s=round(wall, 3),
            rtf=round(wall / max(audio_s, 1e-9), 5),
            first_chunk_ms=round(arrivals[0] * 1000, 1) if arrivals else None,
            # inter-chunk gaps need >= 2 chunks (tiny budgets / early EOS)
            gap_p50_ms=round(float(np.percentile(gaps, 50)), 1) if gaps.size else None,
            gap_p90_ms=round(float(np.percentile(gaps, 90)), 1) if gaps.size else None,
            gap_max_ms=round(float(gaps.max()), 1) if gaps.size else None,
            vocode_stats=voc,
        )
        await server.stop()

    asyncio.new_event_loop().run_until_complete(go())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_new_tokens", type=int, default=2000)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    import jax


    import jax.numpy as jnp
    import numpy as np

    from sparktts_tpu.pipeline import SparkTTSPipeline

    if args.tiny:
        pipe = SparkTTSPipeline(max_new_tokens=args.max_new_tokens, prompt_bucket=32)
    else:
        from sparktts_tpu.config import SparkTTSConfig
        from sparktts_tpu.lm.quant import quantize_qwen_int8

        pipe = SparkTTSPipeline(
            config=SparkTTSConfig(), max_new_tokens=args.max_new_tokens
        )
        pipe.llm_params = jax.tree.map(jnp.asarray, quantize_qwen_int8(pipe.llm_params))
        pipe.vocode_bucket = 125

    rng = np.random.default_rng(0)
    prompt_wav = rng.standard_normal(3 * 16000).astype(np.float32) * 0.1
    text = "long stream vocode scaling " * 40

    results = {"max_new_tokens": args.max_new_tokens}
    results["windowed"] = run_arm(
        pipe, None, text, prompt_wav, args.max_new_tokens, args.passes
    )
    results["full_prefix"] = run_arm(
        pipe, 10**9, text, prompt_wav, args.max_new_tokens, args.passes
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
