#!/usr/bin/env python
"""Dataset-scale benchmark (role of the reference's 26-pair seed_tts run,
reference client_grpc.py:608-820): a 20+ utterance manifest with varied
prompt/target lengths through the continuous (inflight) batching server,
offline at concurrency {1,2,4} and streaming at {1,2}, with avg/P50/P90/P99
latency + RTF per mode.  Writes one JSON document with every summary.

    python scripts/run_dataset_bench.py --out BENCH_DATASET.json
    python scripts/run_dataset_bench.py --tiny --tasks 6   # CPU smoke
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from sparktts_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def make_tasks(n: int, max_new_choices, prompt_secs=(3, 6)):
    """Synthetic manifest: seeded noise prompts in a few duration buckets and
    per-task generation budgets — varied prompt AND target lengths, but a
    bounded set of XLA shape buckets."""
    import numpy as np

    from sparktts_tpu.bench.harness import BenchTask

    rng = np.random.default_rng(0)
    sr = 16000
    words = ("the quick brown fox jumps over the lazy dog and runs far away "
             "while birds sing in the tall green trees near the river").split()
    tasks = []
    for i in range(n):
        dur = prompt_secs[i % len(prompt_secs)]
        wav = (0.2 * rng.standard_normal(dur * sr)).astype(np.float32)
        # short enough that every prompt lands in ONE t_pad bucket — batch
        # composition is timing-dependent, so extra buckets mean fresh
        # compiles landing inside timed runs
        n_words = 4 + (i * 3) % 8
        text = " ".join(words[(i * 3 + j) % len(words)] for j in range(n_words))
        tasks.append(
            BenchTask(
                text=text,
                prompt_wav=wav,
                max_new_tokens=max_new_choices[i % len(max_new_choices)],
            )
        )
    return tasks


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", default=None)
    parser.add_argument(
        "--hf_dataset", default=None,
        help="seed_tts-protocol huggingface dataset name or load_from_disk "
        "path (reference client_grpc.py --huggingface-dataset); replaces the "
        "synthetic manifest",
    )
    parser.add_argument("--hf_split", default="wenetspeech4tts")
    parser.add_argument("--tasks", type=int, default=24)
    parser.add_argument("--out", default="BENCH_DATASET.json")
    parser.add_argument("--tiny", action="store_true", help="tiny CPU config")
    parser.add_argument("--offline_conc", default="1,2,4")
    parser.add_argument("--streaming_conc", default="1,2,4")
    parser.add_argument("--max_slots", type=int, default=8)
    parser.add_argument(
        "--grpc_conc", default="1",
        help="comma-separated concurrencies for the gRPC-transport streaming "
        "sweep ('' disables)",
    )
    parser.add_argument(
        "--http_conc", default="",
        help="comma-separated concurrencies for the REAL-HTTP streaming sweep "
        "(chunked transfer through serve_http + stdlib client; '' disables). "
        "The continuous_streaming rows measure the in-process engine; these "
        "add the full network stack like the reference's Triton HTTP front",
    )
    parser.add_argument(
        "--longform_requests", type=int, default=8,
        help="number of longform (3-segment) streaming requests to record "
        "(0 disables)",
    )
    parser.add_argument("--no_int8_lm", action="store_true")
    parser.add_argument("--no_warmup", action="store_true")
    parser.add_argument(
        "--no_vocode_batch", action="store_true",
        help="disable cross-stream batched vocoding in the continuous "
        "server (A/B lever; default on, as in production)",
    )
    parser.add_argument(
        "--stream_vocode_bucket", type=int, default=125,
        help="finer vocoder padding bucket for the STREAMING phase: chunk "
        "vocodes pad to this granularity instead of the full budget, cutting "
        "first-chunk latency (offline keeps the single full-budget bucket "
        "so EOS-dependent lengths can't compile mid-run)",
    )
    args = parser.parse_args()

    import jax


    import jax.numpy as jnp
    import numpy as np

    from sparktts_tpu.bench.harness import run_continuous_benchmark
    from sparktts_tpu.pipeline import SparkTTSPipeline

    if args.tiny:
        pipe = SparkTTSPipeline(max_new_tokens=32, prompt_bucket=32)
        max_new_choices = (16, 24, 32)
        prompt_secs = (1,)
    else:
        from sparktts_tpu.config import SparkTTSConfig

        pipe = SparkTTSPipeline(
            model_dir=args.model_dir,
            config=None if args.model_dir else SparkTTSConfig(),
            max_new_tokens=500,
        )
        max_new_choices = (200, 350, 500)
        prompt_secs = (3, 6)
        if not args.no_int8_lm:
            from sparktts_tpu.lm.quant import quantize_qwen_int8

            pipe.llm_params = jax.tree.map(
                jnp.asarray, quantize_qwen_int8(pipe.llm_params)
            )

    # one vocoder program per budget regardless of where EOS lands — vocode
    # lengths are sampling-dependent, so fine buckets mean nondeterministic
    # compiles inside timed runs
    pipe.vocode_bucket = max(max_new_choices)

    if args.hf_dataset:
        from sparktts_tpu.bench.harness import load_hf_dataset_tasks

        tasks = load_hf_dataset_tasks(args.hf_dataset, args.hf_split)[: args.tasks]
    else:
        tasks = make_tasks(args.tasks, max_new_choices, prompt_secs)
    results = {
        "tasks": len(tasks),
        "dataset": args.hf_dataset or "synthetic",
        "backend": jax.default_backend(),
        "runs": [],
    }

    offline_concs = [int(c) for c in args.offline_conc.split(",") if c]
    streaming_concs = [int(c) for c in args.streaming_conc.split(",") if c]

    # warmup: populate every XLA program bucket so recorded numbers measure
    # execution, not compilation.  The aligned path's batch composition is
    # timing-dependent, so warm generate/vocode for EVERY batch size up to
    # the max concurrency x every budget deterministically.
    if not args.no_warmup:
        t0 = time.time()
        # warm every dispatch-ladder decode program of the continuous engine
        # (the server sizes dispatches adaptively, so ALL rungs can appear
        # mid-run; a cold rung would land a compile inside a timed request)
        from sparktts_tpu.lm.continuous import DISPATCH_LADDER
        from sparktts_tpu.serve.continuous_server import ContinuousTTSServer

        warm_server = ContinuousTTSServer(pipe, max_slots=args.max_slots)
        eng = warm_server.engine
        # request mode is a traced flag, so one submit warms both modes.
        # Re-submit whenever the warm request finishes mid-sweep (early EOS
        # or a small budget) — eng.step() is a no-op with no active slots,
        # which would silently leave later rungs cold.
        rungs = [n for n in DISPATCH_LADDER if n <= warm_server.steps]
        if warm_server.steps not in rungs:
            rungs.append(warm_server.steps)  # the cap itself is a dispatch size
        for n in rungs:
            if all(o is None for o in eng.owner):
                eng.submit(
                    list(range(10, 10 + pipe.prompt_bucket // 2)),
                    max_new_tokens=max(max_new_choices),
                    mode="clone",
                )
            eng.step(n)
        for slot, owner in enumerate(eng.owner):
            if owner is not None:
                eng.release_slot(slot)
        del warm_server, eng
        # warm batched-admission executables for every distinct signature ×
        # ladder size ≤ the max concurrency (a timed burst otherwise
        # compiles its batch program inline — same trap as cold vocode
        # batch signatures)
        from sparktts_tpu.serve.continuous_server import warm_admit_batches

        warm_b = ContinuousTTSServer(pipe, max_slots=args.max_slots, fused_warm="sync")
        n_ab = warm_admit_batches(
            warm_b, tasks,
            min(args.max_slots, max(offline_concs + streaming_concs, default=1)),
        )
        print(f"warmed {n_ab} batched-admission executables", file=sys.stderr)
        del warm_b
        # warm real prompt-bucket admission + chunk vocode shapes through
        # both continuous modes
        run_continuous_benchmark(
            pipe, tasks[: max(3, len(max_new_choices) * len(prompt_secs))],
            concurrency=2, streaming=False, max_slots=args.max_slots,
            vocode_batch=not args.no_vocode_batch,
        )
        run_continuous_benchmark(
            pipe, tasks[: max(3, len(max_new_choices) * len(prompt_secs))],
            concurrency=2, streaming=True, max_slots=args.max_slots,
            vocode_batch=not args.no_vocode_batch,
        )
        if not args.no_vocode_batch:
            # pay the batched-vocoder compiles for every window shape the
            # warm passes routed, so timed runs batch from the first drain
            # instead of racing the background warm thread
            from sparktts_tpu.serve.continuous_server import (
                warm_vocode_batches_seen,
            )

            max_conc = max(offline_concs + streaming_concs, default=1)
            # 2×: a drain holds ≤1 job per stream but a backlogged stream's
            # job can plan several same-shape windows, so the wanted batch
            # size can exceed the concurrency — warm one rung past it
            n_voc = warm_vocode_batches_seen(pipe, min(args.max_slots, 2 * max_conc))
            print(f"warmed {n_voc} batched-vocode signatures", file=sys.stderr)
        # warm the offline server's fused clone path (tokenize →
        # device assembly → generate+vocode) at every XLA shape signature
        # the timed runs can produce.  The compile surface is
        # (batch, prompt t_pad bucket) for the fused generate and
        # (t_pad, wav-duration bucket) for tokenize/assembly — enumerate the
        # signatures actually present in THIS task set and warm each once
        # (a missed combo is a 5-10 s relay compile inside a timed request).
        # Calling _execute_batch directly pins the exact window composition
        # (the asyncio batching window is timing-dependent); distinct seeds
        # exercise the per-row-key program the timed runs compile.
        from sparktts_tpu.prompt import clone_prompt_scaffold
        from sparktts_tpu.serve.server import TTSRequest, TTSServer

        warm_srv = TTSServer(pipe)

        def _warm_window(idxs):
            reqs = [
                TTSRequest(
                    text=tasks[i].text,
                    prompt_wav=tasks[i].prompt_wav,
                    prompt_text=tasks[i].prompt_text,
                    seed=i,
                )
                for i in idxs
            ]
            outs = warm_srv._execute_batch(reqs)
            for o in outs:
                if isinstance(o, Exception):
                    raise o

        n_glob = pipe.config.bicodec.speaker_encoder.token_num
        tpad_of, dur_of = {}, {}
        for i, t in enumerate(tasks):
            # signature computed as the server does (synthetic tasks carry no
            # prompt_text, so the scaffold has no semantic-token section)
            _, plen, _, _ = clone_prompt_scaffold(
                pipe.tokenizer, t.text, n_glob, 0, t.prompt_text
            )
            tpad_of[i] = -(-plen // pipe.prompt_bucket) * pipe.prompt_bucket
            dur_of[i] = len(t.prompt_wav)
        max_conc = max(offline_concs, default=1)
        buckets = sorted(set(tpad_of.values()))
        durs = sorted(set(dur_of.values()))
        n_warm = 0
        for b in range(1, max_conc + 1):
            for tp in buckets:
                for d in durs:
                    # a runtime window with max t_pad == tp and max wav
                    # bucket == d needs an anchor for each; fill the rest
                    # from tasks at-or-below both
                    both = next(
                        (i for i in tpad_of
                         if tpad_of[i] == tp and dur_of[i] == d), None,
                    )
                    if both is not None:
                        anchors = [both]
                    else:
                        a_t = next(
                            (i for i in tpad_of
                             if tpad_of[i] == tp and dur_of[i] <= d), None,
                        )
                        a_d = next(
                            (i for i in dur_of
                             if dur_of[i] == d and tpad_of[i] <= tp), None,
                        )
                        if a_t is None or a_d is None:
                            continue  # combo unreachable at runtime too
                        anchors = [a_t, a_d]
                    if len(anchors) > b:
                        continue  # needs a bigger window than this phase uses
                    window = anchors + [
                        i for i in tpad_of
                        if i not in anchors and tpad_of[i] <= tp and dur_of[i] <= d
                    ]
                    if len(window) >= b:
                        _warm_window(window[:b])
                        n_warm += 1
        del warm_srv
        print(
            f"warmup done in {time.time() - t0:.1f}s "
            f"({n_warm} fused windows over t_pad={buckets}, wav={durs})",
            file=sys.stderr,
        )

    # relay-health probe (VERDICT r04 item 2): every recorded run carries the
    # blocking-round-trip tax measured in ITS OWN window, so a win/loss cell
    # is interpretable without trusting an environment_note paragraph
    from sparktts_tpu.bench.relay_probe import probe_record

    results["dispatch_tax_session_start"] = probe_record("session start")
    print(f"relay probe: {results['dispatch_tax_session_start']}", file=sys.stderr)

    def record(stats):
        # checkpoint after EVERY timed run: the TPU relay in this environment
        # can wedge mid-session, and a 20-minute run must not lose its
        # completed measurements to a hang in a later phase
        stats["dispatch_tax"] = probe_record()
        print(json.dumps(stats), file=sys.stderr)
        results["runs"].append(stats)
        Path(args.out + ".partial").write_text(json.dumps(results, indent=2) + "\n")

    for conc in offline_concs:
        # aligned window-batching server: one whole-generation XLA program
        # per batch — the strongest offline configuration (bench.py's path)
        from sparktts_tpu.bench.harness import run_offline_benchmark

        record(run_offline_benchmark(pipe, tasks, concurrency=conc))
        record(
            run_continuous_benchmark(
                pipe, tasks, concurrency=conc, streaming=False,
                max_slots=args.max_slots,
                vocode_batch=not args.no_vocode_batch,
            )
        )

    if streaming_concs and args.stream_vocode_bucket:
        # streaming phase: finer vocode buckets (chunk lengths follow the
        # deterministic chunk schedule, so the bucket set stays small); warm
        # the new bucket programs before the timed runs
        pipe.vocode_bucket = args.stream_vocode_bucket
        if not args.no_warmup:
            run_continuous_benchmark(
                pipe, tasks[:4], concurrency=2, streaming=True,
                max_slots=args.max_slots,
                vocode_batch=not args.no_vocode_batch,
            )
            if not args.no_vocode_batch:
                # finer bucket = new window shapes; re-warm the batched set
                from sparktts_tpu.serve.continuous_server import (
                    warm_vocode_batches_seen,
                )

                n_voc = warm_vocode_batches_seen(
                    pipe, min(args.max_slots, 2 * max(streaming_concs))
                )
                print(
                    f"warmed {n_voc} batched-vocode signatures "
                    f"(stream bucket {pipe.vocode_bucket})", file=sys.stderr,
                )
    if streaming_concs and not args.no_warmup:
        # the vocode window cap closes the SCALAR streaming shape set; warm
        # all of it so no sampled generation length lands a detokenize
        # compile inside a timed drain (the first conc-4 r03 recording ate
        # one 6.7 s compile exactly this way).  Runs whether or not a finer
        # stream bucket is in play (ADVICE r03: a base-bucket streaming run
        # pays the same mid-drain compile otherwise).
        from sparktts_tpu.serve.continuous_server import (
            default_stream_ctx,
            vocode_window_cap,
            warm_spec_chains,
            warm_stream_windows,
        )

        n_win = warm_stream_windows(
            pipe, vocode_window_cap(pipe) + default_stream_ctx(pipe)
        )
        print(
            f"warmed {n_win} new scalar stream-window signatures "
            f"(stream bucket {pipe.vocode_bucket})", file=sys.stderr,
        )
        # speculative first-chunk chain programs: one per (batch, target,
        # dispatch rung) signature — the first conc-4 r05 recording ate a
        # 13 s compile exactly here
        warm_c = ContinuousTTSServer(pipe, max_slots=args.max_slots)
        n_spec = warm_spec_chains(
            warm_c, min(args.max_slots, max(streaming_concs, default=1))
        )
        print(f"warmed {n_spec} speculative-chain programs", file=sys.stderr)
        del warm_c
    for conc in streaming_concs:
        if conc > 2 and not args.no_warmup:
            # warm at the TIMED concurrency too (bench_first_chunk r03
            # postmortem): batch composition / state-commitment patterns
            # first produced at this concurrency otherwise land their
            # compiles inside the timed run
            run_continuous_benchmark(
                pipe, tasks[: min(len(tasks), 2 * conc)], concurrency=conc,
                streaming=True, max_slots=args.max_slots,
                vocode_batch=not args.no_vocode_batch,
            )
        record(
            run_continuous_benchmark(
                pipe, tasks, concurrency=conc, streaming=True,
                max_slots=args.max_slots,
                vocode_batch=not args.no_vocode_batch,
            )
        )

    if args.longform_requests:
        # longform row (VERDICT r03 item 7): 3-segment texts (~3× the token
        # budget) through synthesize_streaming_long — voice-stable segment
        # chaining with globals-only re-admission.  Segment shapes reuse the
        # already-warm prompt buckets (same texts, same budgets); the
        # globals-only admission signature warms inside the first request —
        # run one unrecorded warm request first so the timed rows measure
        # steady state like every other phase
        from sparktts_tpu.bench.harness import run_longform_benchmark

        if not args.no_warmup:
            run_longform_benchmark(
                pipe, tasks, n_requests=1, segments=3, max_slots=args.max_slots
            )
        record(
            run_longform_benchmark(
                pipe, tasks, n_requests=args.longform_requests, segments=3,
                max_slots=args.max_slots,
            )
        )

    if args.grpc_conc:
        # gRPC front-end sweep: the transport analogue of the reference's
        # decoupled-gRPC benchmark (client_grpc.py:332-433) — first-chunk
        # latency through a real socket + protobuf framing
        from sparktts_tpu.bench.harness import run_grpc_streaming_benchmark

        for conc in [int(c) for c in args.grpc_conc.split(",") if c]:
            record(
                run_grpc_streaming_benchmark(
                    pipe, tasks, concurrency=conc, max_slots=args.max_slots
                )
            )

    if args.http_conc:
        # real-HTTP sweep: chunked-transfer /tts_stream through serve_http
        # and the stdlib client (role of the reference's Triton HTTP front,
        # `client_http.py`) — the in-process rows above skip the network
        import threading

        from sparktts_tpu.bench.harness import run_network_streaming_benchmark
        from sparktts_tpu.serve.server import serve_http

        control: dict = {}
        th = threading.Thread(
            target=serve_http,
            kwargs=dict(
                pipeline=pipe, host="127.0.0.1", port=0,
                stream_max_slots=args.max_slots, control=control,
            ),
            daemon=True,
        )
        th.start()
        for _ in range(600):
            if "httpd" in control:
                break
            time.sleep(0.1)
        port = control["httpd"].server_address[1]
        try:
            # warm the embedded continuous server's signatures once
            run_network_streaming_benchmark(
                "127.0.0.1", port, tasks[:4], concurrency=2
            )
            for conc in [int(c) for c in args.http_conc.split(",") if c]:
                record(
                    run_network_streaming_benchmark(
                        "127.0.0.1", port, tasks, concurrency=conc
                    )
                )
        finally:
            control["stop"]()

    # quality metrics (BASELINE.md parity bar): codec round-trip mel distance
    # and speaker similarity on a few prompts — catches codec/quantization
    # regressions by artifact diffing (role of the reference's seed_tts
    # WER/similarity evaluation).  With random weights the absolute values
    # are meaningless but stable for a fixed seed/config.
    from sparktts_tpu.bench.metrics import (
        mel_distance,
        semantic_consistency,
        speaker_similarity,
    )

    qual = []
    for t in tasks[:3]:
        g, s = pipe.tokenize_audio(t.prompt_wav)
        recon = pipe.detokenize(g, s)
        n = min(len(recon), len(t.prompt_wav))
        ref = np.asarray(t.prompt_wav[:n], np.float32)
        qual.append(
            {
                "mel_distance_l1": round(mel_distance(ref, recon[:n]), 4),
                "speaker_similarity": round(speaker_similarity(pipe, ref, recon[:n]), 4),
                "semantic_consistency": round(semantic_consistency(pipe, t.prompt_wav), 4),
            }
        )
    results["codec_quality"] = {
        "per_prompt": qual,
        "mel_distance_l1_mean": round(float(np.mean([q["mel_distance_l1"] for q in qual])), 4),
        "speaker_similarity_mean": round(float(np.mean([q["speaker_similarity"] for q in qual])), 4),
    }
    print(json.dumps(results["codec_quality"]), file=sys.stderr)

    results["dispatch_tax_session_end"] = probe_record("session end")
    out = json.dumps(results, indent=2)
    Path(args.out).write_text(out + "\n")
    print(out)


if __name__ == "__main__":
    main()
