"""OpenAI-compatible speech endpoint + voice registry over a live server.

The reference has no equivalent surface (its fronts are Triton gRPC/HTTP);
this is an ≥ addition so off-the-shelf OpenAI SDK clients can drive the
server.  Exercises /v1/audio/speech (offline wav + pcm, streamed wav),
/v1/voices register/list/delete, and the OpenAI error envelope.
"""

import base64
import http.client
import json
import struct
import threading
import time

import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve.voices import (
    VoiceRegistry,
    openai_speed_level,
    wav_bytes,
)


@pytest.fixture(scope="module")
def server_port():
    import dataclasses
    import socket

    from sparktts_tpu.config import StreamingConfig, tiny_test_config
    from sparktts_tpu.serve.server import serve_http

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

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
        target=lambda: serve_http(
            pipe, host="127.0.0.1", port=port, max_batch=2,
            stream_steps_per_dispatch=4, control=control,
        ),
        daemon=True,
    )
    t.start()
    time.sleep(1.0)
    yield port
    if "stop" in control:
        control["stop"]()


def _post(port, path, payload, method="POST"):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    body = json.dumps(payload).encode() if payload is not None else b""
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    data = resp.read()
    headers = dict(resp.getheaders())
    conn.close()
    return resp.status, headers, data


def _parse_wav(data: bytes):
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    sr = struct.unpack_from("<I", data, 24)[0]
    pcm = np.frombuffer(data[44:], dtype="<i2")
    return sr, pcm


def test_speech_offline_wav(server_port):
    status, headers, data = _post(
        server_port,
        "/v1/audio/speech",
        {"input": "hello openai surface", "voice": "female", "speed": 1.0},
    )
    assert status == 200
    assert headers["Content-Type"] == "audio/wav"
    sr, pcm = _parse_wav(data)
    assert sr > 0 and len(pcm) > 0
    # declared RIFF size must match the actual body (offline = known length)
    assert struct.unpack_from("<I", data, 4)[0] == len(data) - 8


def test_speech_offline_pcm(server_port):
    status, headers, data = _post(
        server_port,
        "/v1/audio/speech",
        {"input": "pcm please", "voice": "male", "response_format": "pcm"},
    )
    assert status == 200
    assert headers["Content-Type"] == "audio/pcm"
    assert len(data) > 0 and len(data) % 2 == 0


def test_voice_register_clone_delete(server_port):
    sr = 16000
    tt = np.arange(sr) / sr
    prompt = (0.3 * np.sin(2 * np.pi * 240 * tt)).astype(np.float32)
    status, _, data = _post(
        server_port,
        "/v1/voices",
        {"name": "narrator", "wav_b64": base64.b64encode(prompt.tobytes()).decode()},
    )
    assert status == 200
    assert json.loads(data)["name"] == "narrator"

    status, _, data = _post(server_port, "/v1/voices", None, method="GET")
    names = [v["name"] for v in json.loads(data)["voices"]]
    assert {"female", "male", "narrator"} <= set(names)

    status, headers, data = _post(
        server_port,
        "/v1/audio/speech",
        {"input": "cloned by name", "voice": "narrator"},
    )
    assert status == 200
    sr_out, pcm = _parse_wav(data)
    assert len(pcm) > 0

    status, _, data = _post(
        server_port, "/v1/voices/narrator", None, method="DELETE"
    )
    assert status == 200
    status, _, data = _post(
        server_port,
        "/v1/audio/speech",
        {"input": "gone", "voice": "narrator"},
    )
    assert status == 404
    err = json.loads(data)["error"]
    assert err["type"] == "invalid_request_error" and "narrator" in err["message"]


def test_speech_streamed_wav(server_port):
    status, headers, data = _post(
        server_port,
        "/v1/audio/speech",
        {"input": "stream me", "voice": "female", "stream": True},
    )
    assert status == 200
    assert headers["Content-Type"] == "audio/wav"
    assert headers.get("Transfer-Encoding") == "chunked"
    # streamed header declares read-to-EOF length; body still decodes as PCM
    assert data[:4] == b"RIFF"
    pcm = np.frombuffer(data[44:], dtype="<i2")
    assert len(pcm) > 0


def test_openai_error_envelope(server_port):
    for payload, needle in [
        ({"voice": "female"}, "input"),
        ({"input": "x", "response_format": "opus"}, "response_format"),
        ({"input": "x", "speed": 9.0}, "speed"),
    ]:
        status, _, data = _post(server_port, "/v1/audio/speech", payload)
        assert status == 400
        err = json.loads(data)["error"]
        assert err["type"] == "invalid_request_error"
        assert needle in err["message"]


def test_openai_longform_explicit(server_port):
    status, headers, data = _post(
        server_port,
        "/v1/audio/speech",
        {
            "input": "one two three. four five six. seven eight nine.",
            "voice": "female",
            "longform": True,
            "max_segment_chars": 16,
        },
    )
    assert status == 200
    sr, pcm = _parse_wav(data)
    assert len(pcm) > 0
    status, _, data = _post(server_port, "/stats", None, method="GET")
    streaming = json.loads(data)["streaming"]
    assert streaming.get("longform_segments", 0) >= 2


def test_tts_stream_longform_ndjson(server_port):
    sr = 16000
    tt = np.arange(sr) / sr
    prompt = (0.3 * np.sin(2 * np.pi * 200 * tt)).astype(np.float32)
    status, headers, data = _post(
        server_port,
        "/tts_stream",
        {
            "text": "alpha beta. gamma delta. epsilon zeta.",
            "prompt_wav_b64": base64.b64encode(prompt.tobytes()).decode(),
            "longform": True,
            "max_segment_chars": 14,
        },
    )
    assert status == 200
    lines = [json.loads(x) for x in data.decode().splitlines() if x.strip()]
    assert lines[-1] == {"done": True}
    wav_lines = [x for x in lines if "wav_b64" in x]
    assert len(wav_lines) >= 2  # at least one chunk per segment


def test_models_listing(server_port):
    status, _, data = _post(server_port, "/v1/models", None, method="GET")
    assert status == 200
    body = json.loads(data)
    assert body["object"] == "list" and body["data"][0]["id"] == "spark-tts"


def test_speed_level_mapping():
    assert openai_speed_level(0.25) == "very_low"
    assert openai_speed_level(1.0) == "moderate"
    assert openai_speed_level(4.0) == "very_high"
    with pytest.raises(ValueError):
        openai_speed_level(0.1)


def test_registry_limits_and_builtin_collision():
    reg = VoiceRegistry(max_voices=1)
    wav = np.zeros(16, np.float32)
    with pytest.raises(ValueError):
        reg.register("female", wav)  # built-in name
    reg.register("a", wav)
    reg.register("a", np.ones(16, np.float32))  # re-register same name ok
    with pytest.raises(ValueError):
        reg.register("b", wav)  # full
    assert reg.remove("a") and not reg.remove("a")


def test_wav_bytes_roundtrip():
    sr = 8000
    audio = np.sin(np.linspace(0, 20, 400)).astype(np.float32) * 0.5
    data = wav_bytes(audio, sr)
    sr2, pcm = _parse_wav(data)
    assert sr2 == sr and len(pcm) == len(audio)
    np.testing.assert_allclose(pcm / 32767.0, audio, atol=2e-4)
