#!/usr/bin/env python
"""Deploy script (role of reference runtime/triton_trtllm/run.sh stages 3-4):
load/convert the checkpoint, start the batching HTTP TTS server.

    python scripts/run_server.py --model_dir pretrained_models/Spark-TTS-0.5B \
        --port 8000 --max_batch 16
"""
import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparktts_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", default=None, help="checkpoint dir (random-init if omitted)")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch", type=int, default=16)
    parser.add_argument("--max_new_tokens", type=int, default=3000)
    parser.add_argument("--paged_kv", action="store_true",
                        help="paged KV cache for the streaming engine")
    parser.add_argument("--speculative_k", type=int, default=0,
                        help="draft-k-then-verify speculative decoding (0 = off)")
    parser.add_argument("--no_guided", action="store_true",
                        help="disable guided decoding (full-vocab sampling)")
    parser.add_argument("--warmup", action="store_true",
                        help="compile the hot serving programs before the "
                             "socket opens (first request then runs warm)")
    parser.add_argument("--grpc_port", type=int, default=None,
                        help="also serve gRPC on this port, sharing the "
                             "HTTP streaming engine (one decode batch)")
    parser.add_argument("--voice_cache", type=int, default=0,
                        help="LRU size of the speaker-prompt token cache "
                             "(0 = off): repeat requests with the same "
                             "prompt voice skip the audio-tokenize stack")
    parser.add_argument("--voices_dir", default=None,
                        help="directory of <name>.wav prompt files to "
                             "pre-register as named clone voices for the "
                             "OpenAI-compatible /v1/audio/speech endpoint")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    from sparktts_tpu.pipeline import SparkTTSPipeline
    from sparktts_tpu.serve.server import serve_http

    pipe = SparkTTSPipeline(
        model_dir=args.model_dir,
        max_new_tokens=args.max_new_tokens,
        guided=not args.no_guided,
        speculative_k=args.speculative_k,
        voice_cache_size=args.voice_cache,
    )
    voices = None
    if args.voices_dir:
        from sparktts_tpu.io.audio import load_audio
        from sparktts_tpu.serve.voices import VoiceRegistry

        voices = VoiceRegistry()
        for wav_path in sorted(Path(args.voices_dir).glob("*.wav")):
            voices.register(
                wav_path.stem,
                load_audio(wav_path, sampling_rate=pipe.sample_rate),
            )
            logging.info("registered voice %r from %s", wav_path.stem, wav_path)

    serve_http(
        pipe, host=args.host, port=args.port, max_batch=args.max_batch,
        paged_kv=args.paged_kv, warmup=args.warmup, grpc_port=args.grpc_port,
        voices=voices,
    )


if __name__ == "__main__":
    main()
