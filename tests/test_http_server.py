"""End-to-end HTTP server + client test (stdlib threading server)."""

import threading
import time

import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve import client as C


@pytest.fixture(scope="module")
def server_port():
    import asyncio
    import socket
    from http.server import ThreadingHTTPServer

    # pick a free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    pipe = SparkTTSPipeline(max_new_tokens=12, prompt_bucket=32)

    t = threading.Thread(
        target=lambda: __import__("sparktts_tpu.serve.server", fromlist=["serve_http"]).serve_http(
            pipe, host="127.0.0.1", port=port, max_batch=2
        ),
        daemon=True,
    )
    t.start()
    time.sleep(1.0)
    return port


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
