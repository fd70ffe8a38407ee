"""End-to-end HTTP server + client test (stdlib threading server)."""

import threading
import time

import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve import client as C


@pytest.fixture(scope="module")
def server_port():
    import dataclasses
    import socket

    from sparktts_tpu.config import StreamingConfig, tiny_test_config

    # pick a free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    # tiny chunk schedule (2 tokens/chunk) so a 12-token generation produces
    # multiple streamed chunks over the wire
    cfg = dataclasses.replace(
        tiny_test_config(),
        streaming=StreamingConfig(
            audio_chunk_duration=0.04,
            max_audio_chunk_duration=0.2,
            audio_chunk_size_scale_factor=2.0,
            audio_chunk_overlap_duration=0.0,
        ),
    )
    pipe = SparkTTSPipeline(config=cfg, max_new_tokens=12, prompt_bucket=32)

    control = {}
    t = threading.Thread(
        target=lambda: __import__("sparktts_tpu.serve.server", fromlist=["serve_http"]).serve_http(
            pipe, host="127.0.0.1", port=port, max_batch=2,
            stream_steps_per_dispatch=4, control=control,
        ),
        daemon=True,
    )
    t.start()
    time.sleep(1.0)
    yield port
    # shut the server down so its loop/worker threads don't stay live for
    # the rest of the pytest session (leaked serving stacks accumulate
    # threads against later tests' XLA compiles)
    if "stop" in control:
        control["stop"]()


def test_http_roundtrip(server_port):
    sr = 16000
    tt = np.arange(sr) / sr
    prompt = (0.3 * np.sin(2 * np.pi * 240 * tt)).astype(np.float32)
    wav, rate, stats = C.synthesize(
        "127.0.0.1", server_port, "hello over http", prompt_wav=prompt
    )
    assert rate == 16000
    assert np.isfinite(wav).all()
    assert "infer_ms" in stats


def test_http_stats_and_health(server_port):
    stats = C.get_stats("127.0.0.1", server_port)
    assert stats["requests"] >= 1
    import json
    import urllib.request

    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/health", timeout=10) as r:
        assert json.loads(r.read())["healthy"] is True


def test_http_streaming_chunks(server_port):
    """≥2 audio chunks must arrive over the chunked-transfer /tts_stream
    endpoint (reference capability: Triton decoupled transactions,
    `model_repo/spark_tts/1/model.py:347-399`)."""
    sr = 16000
    tt = np.arange(sr) / sr
    prompt = (0.3 * np.sin(2 * np.pi * 240 * tt)).astype(np.float32)
    chunks = []
    for chunk, rate in C.synthesize_stream(
        "127.0.0.1",
        server_port,
        "hello streaming",
        prompt_wav=prompt,
        max_new_tokens=48,
        timeout=300,
    ):
        assert rate == 16000
        assert np.isfinite(chunk).all()
        chunks.append(chunk)
    assert len(chunks) >= 2, f"expected multiple streamed chunks, got {len(chunks)}"
    assert sum(len(c) for c in chunks) > 0


def test_network_streaming_benchmark(server_port):
    from sparktts_tpu.bench.harness import BenchTask, run_network_streaming_benchmark

    sr = 16000
    tt = np.arange(sr) / sr
    prompt = (0.25 * np.sin(2 * np.pi * 200 * tt)).astype(np.float32)
    tasks = [BenchTask(text=f"bench {i}", prompt_wav=prompt) for i in range(2)]
    stats = run_network_streaming_benchmark("127.0.0.1", server_port, tasks, concurrency=2)
    assert stats["num_tasks"] == 2
    assert stats["first_chunk_p50_ms"] > 0
    assert stats["mode"] == "network_streaming"


def test_webui_gated_without_gradio():
    from sparktts_tpu.webui import build_ui

    with pytest.raises(ImportError, match="gradio"):
        build_ui(None)


def test_profiling_stats():
    from sparktts_tpu.utils.profiling import StageStats, stage

    s = StageStats()
    with stage("x", s):
        time.sleep(0.01)
    with stage("x", s):
        pass
    summary = s.summary()
    assert summary["x"]["count"] == 2
    assert summary["x"]["max_ms"] >= 10
    assert "x" in s.report()


def test_triton_v2_infer_endpoint(server_port):
    """The reference's own Triton v2 HTTP client payload must work unchanged
    (reference runtime/triton_trtllm/client_http.py:83-141)."""
    import json
    import urllib.request

    host, port = "127.0.0.1", server_port
    rng = np.random.default_rng(0)
    wav = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    data = {
        "inputs": [
            {
                "name": "reference_wav",
                "shape": [1, len(wav)],
                "datatype": "FP32",
                "data": wav.reshape(1, -1).tolist(),
            },
            {
                "name": "reference_wav_len",
                "shape": [1, 1],
                "datatype": "INT32",
                "data": [[len(wav)]],
            },
            {
                "name": "reference_text",
                "shape": [1, 1],
                "datatype": "BYTES",
                "data": ["reference words"],
            },
            {
                "name": "target_text",
                "shape": [1, 1],
                "datatype": "BYTES",
                "data": ["hello from the v2 protocol"],
            },
        ]
    }
    req = urllib.request.Request(
        f"http://{host}:{port}/v2/models/spark_tts/infer?request_id=0",
        data=json.dumps(data).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=300) as rsp:
        result = json.loads(rsp.read())
    out = result["outputs"][0]
    assert out["name"] == "waveform" and out["datatype"] == "FP32"
    audio = np.asarray(out["data"], np.float32)
    assert audio.size > 0 and np.isfinite(audio).all()

    # health surface
    with urllib.request.urlopen(f"http://{host}:{port}/v2/health/ready", timeout=30) as r:
        assert r.status == 200


def test_v2_endpoint_robustness(server_port):
    """Malformed v2 payloads return 400 (not a dropped connection); nested
    BYTES data (KServe-legal) works; health responses carry Content-Length."""
    import json
    import urllib.error
    import urllib.request

    base = f"http://127.0.0.1:{server_port}"

    def post(body):
        req = urllib.request.Request(
            f"{base}/v2/models/spark_tts/infer", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as rsp:
                return rsp.status, json.loads(rsp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    # not a dict
    code, _ = post([])
    assert code == 400
    # empty text data list
    code, _ = post({"inputs": [
        {"name": "reference_wav", "shape": [1, 4], "datatype": "FP32",
         "data": [[0.0, 0.0, 0.0, 0.0]]},
        {"name": "target_text", "shape": [1, 1], "datatype": "BYTES", "data": []},
    ]})
    assert code == 400

    # nested BYTES data, the same nesting the spec allows for FP32
    rng = np.random.default_rng(1)
    wav = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    code, result = post({"inputs": [
        {"name": "reference_wav", "shape": [1, len(wav)], "datatype": "FP32",
         "data": wav.reshape(1, -1).tolist()},
        {"name": "target_text", "shape": [1, 1], "datatype": "BYTES",
         "data": [["nested text data"]]},
    ]})
    assert code == 200
    assert len(result["outputs"][0]["data"]) > 0

    # empty reference_text == no transcript (the clone prompt changes shape
    # on transcript presence; reference clients send [""] when absent)
    code, result = post({"inputs": [
        {"name": "reference_wav", "shape": [1, len(wav)], "datatype": "FP32",
         "data": wav.reshape(1, -1).tolist()},
        {"name": "reference_text", "shape": [1, 1], "datatype": "BYTES",
         "data": [""]},
        {"name": "target_text", "shape": [1, 1], "datatype": "BYTES",
         "data": ["no transcript"]},
    ]})
    assert code == 200 and len(result["outputs"][0]["data"]) > 0

    # health endpoints must be body-delimited on keep-alive connections
    with urllib.request.urlopen(f"{base}/v2/health/live", timeout=30) as r:
        assert r.status == 200
        assert r.read() == b""  # returns immediately — Content-Length: 0


def test_http_bad_base64_gets_400(server_port):
    """Malformed prompt_wav_b64 must produce a 400 JSON error, not a dropped
    connection (the native endpoints used to raise out of do_POST)."""
    import json
    import urllib.error
    import urllib.request

    body = json.dumps({"text": "hi", "prompt_wav_b64": "!!!not-base64!!!"}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{server_port}/tts", data=body,
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400
    assert "error" in json.loads(e.value.read())


def test_http_bad_request_does_not_poison_cobatched_neighbor(server_port):
    """A request with unusable prompt audio must fail ALONE; a good request
    sharing its dynamic-batch window still synthesizes."""
    import base64
    import json
    import urllib.error
    import urllib.request

    results = {}

    def post(name, payload):
        body = json.dumps(payload).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{server_port}/tts", data=body,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                results[name] = json.loads(r.read())
        except urllib.error.HTTPError as e:
            results[name] = e.code

    good_wav = (0.1 * np.sin(np.arange(4000) / 10)).astype(np.float32)
    bad = {"text": "bad", "prompt_wav_b64": base64.b64encode(b"").decode()}  # empty audio
    good = {
        "text": "good",
        "prompt_wav_b64": base64.b64encode(good_wav.tobytes()).decode(),
    }
    threads = [
        threading.Thread(target=post, args=("bad", bad)),
        threading.Thread(target=post, args=("good", good)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert results.get("bad") == 500 or isinstance(results.get("bad"), int)
    assert isinstance(results.get("good"), dict) and "wav_b64" in results["good"]


def test_native_ui_page(server_port):
    """GET / serves the dependency-free browser UI (role of the reference's
    gradio webui.py tabs, reference webui.py:94-269): both tabs, the 1-5
    slider-level mapping, and the server's sample rate baked into the JS."""
    import urllib.request

    with urllib.request.urlopen(f"http://127.0.0.1:{server_port}/", timeout=10) as r:
        assert r.headers["Content-Type"].startswith("text/html")
        page = r.read().decode()
    assert "Voice Clone" in page and "Voice Creation" in page
    assert "const SR = 16000" in page
    # reference LEVELS_MAP_UI surface (webui.py:38-45): sliders 1..5
    for level in ("very_low", "moderate", "very_high"):
        assert level in page
    # the page drives the same endpoints every other client uses
    assert "/tts_stream" in page and '"/tts"' in page
    # longform toggles on both tabs
    assert "clone-longform" in page and "create-longform" in page


def test_warmup_servers_compiles_and_resets():
    """serve_http's warmup: pays the offline + streaming + fused-admission
    compiles up front, then resets stats so production metrics start clean."""
    import asyncio

    from sparktts_tpu.config import tiny_test_config
    from sparktts_tpu.serve.continuous_server import ContinuousTTSServer
    from sparktts_tpu.serve.server import TTSServer, warmup_servers

    pipe = SparkTTSPipeline(
        config=tiny_test_config(), max_new_tokens=12, prompt_bucket=32
    )
    server = TTSServer(pipe, max_batch=2)
    cserver = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=4)
    loop = asyncio.new_event_loop()

    def loop_thread():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(server.start())
        loop.run_until_complete(cserver.start())
        loop.run_forever()

    t = threading.Thread(target=loop_thread, daemon=True)
    t.start()
    try:
        warmup_servers(pipe, server, cserver, loop, timeout=600)
        # fused-admission executable compiled for the warm shape signature
        assert cserver.engine._fused_exe, "fused admission never warmed"
        # counters reset: a fresh request is counted from zero
        assert server.stats["requests"] == 0
        assert cserver.stats["requests"] == 0
        assert cserver.stage_stats.summary() == {}
    finally:
        asyncio.run_coroutine_threadsafe(server.stop(), loop).result(60)
        asyncio.run_coroutine_threadsafe(cserver.stop(), loop).result(60)
        loop.call_soon_threadsafe(loop.stop)


def test_http_and_grpc_share_one_engine():
    """serve_http(grpc_port=...) serves gRPC from the SAME continuous engine
    as /tts_stream: requests from both transports land in one decode batch
    (checked via the shared /stats streaming counters)."""
    import dataclasses
    import json as _json
    import socket
    import urllib.request

    from sparktts_tpu.config import StreamingConfig, tiny_test_config
    from sparktts_tpu.serve.grpc_server import grpc_synthesize_stream

    pytest.importorskip("grpc")

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    http_port, grpc_port = free_port(), free_port()
    cfg = dataclasses.replace(
        tiny_test_config(),
        streaming=StreamingConfig(
            audio_chunk_duration=0.04,
            max_audio_chunk_duration=0.2,
            audio_chunk_size_scale_factor=2.0,
            audio_chunk_overlap_duration=0.0,
        ),
    )
    pipe = SparkTTSPipeline(config=cfg, max_new_tokens=12, prompt_bucket=32)
    control = {}
    t = threading.Thread(
        target=lambda: __import__(
            "sparktts_tpu.serve.server", fromlist=["serve_http"]
        ).serve_http(
            pipe, host="127.0.0.1", port=http_port, max_batch=2,
            stream_steps_per_dispatch=4, grpc_port=grpc_port, control=control,
        ),
        daemon=True,
    )
    t.start()
    deadline = time.time() + 60
    healthy = False
    while time.time() < deadline:
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{http_port}/health", timeout=2)
            healthy = True
            break
        except Exception:
            time.sleep(0.5)
    assert healthy, "server failed to come up within 60 s"

    try:
        wav = np.zeros(4000, np.float32)
        wav[::50] = 0.2
        # one stream over gRPC...
        chunks = list(
            grpc_synthesize_stream("127.0.0.1", grpc_port, "over grpc", prompt_wav=wav)
        )
        total = np.concatenate([c for c, _ in chunks]) if chunks else np.zeros(0)
        assert np.isfinite(total).all()
        # ...and one over HTTP, then both must show in the SHARED stats
        got = list(
            C.synthesize_stream("127.0.0.1", http_port, "over http", prompt_wav=wav)
        )
        assert got and all(np.isfinite(c).all() for c, _ in got)
        stats = _json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{http_port}/stats", timeout=10).read()
        )
        assert stats["streaming"]["requests"] == 2
        assert stats["streaming"]["completed"] == 2
    finally:
        # serve_http's graceful-shutdown handle: without it the daemon
        # thread, gRPC server and loop would pin the pipeline (and ports)
        # for the rest of the pytest session.  Guarded: if the server died
        # before populating `control`, the real startup failure must not be
        # masked by a KeyError from this cleanup.
        if "stop" in control:
            control["stop"]()
            assert not t.is_alive()
