"""gRPC front-end tests.

Two transports, same protobuf messages and decoupled chunk/final-flag
semantics: the real grpcio server (skipped automatically where grpcio is
absent) and the dependency-free framed transport over a raw TCP socket
(gRPC DATA-frame layout).
"""

import numpy as np
import pytest

from sparktts_tpu.config import StreamingConfig, tiny_test_config
from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve.grpc_server import (
    FramedSocketServer,
    framed_synthesize,
    framed_synthesize_stream,
)
from sparktts_tpu.serve.protos import sparktts_pb2 as pb


@pytest.fixture(scope="module")
def pipe():
    import dataclasses

    cfg = dataclasses.replace(
        tiny_test_config(),
        streaming=StreamingConfig(
            audio_chunk_duration=0.04,
            max_audio_chunk_duration=0.2,
            audio_chunk_size_scale_factor=2.0,
            audio_chunk_overlap_duration=0.0,
        ),
    )
    return SparkTTSPipeline(config=cfg, max_new_tokens=16, prompt_bucket=32)


@pytest.fixture(scope="module")
def server(pipe):
    srv = FramedSocketServer(pipe, max_slots=2, steps_per_dispatch=4)
    yield srv
    srv.close()


def _wav(seed=0, n=4000):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(n)).astype(np.float32)


def test_proto_roundtrip():
    req = pb.SynthesisRequest(text="hi", prompt_wav=_wav().tobytes(), max_new_tokens=8)
    req2 = pb.SynthesisRequest.FromString(req.SerializeToString())
    assert req2.text == "hi" and req2.max_new_tokens == 8
    np.testing.assert_array_equal(
        np.frombuffer(req2.prompt_wav, "<f4"), _wav()
    )


def test_streaming_through_real_socket(server, pipe):
    """Bidirectional streaming synthesis through a real TCP socket: multiple
    chunks before the final flag, all audio accounted for."""
    chunks = list(
        framed_synthesize_stream(
            server.host, server.port, "stream over the wire", prompt_wav=_wav(1)
        )
    )
    assert len(chunks) >= 2, "expected chunked (decoupled) delivery"
    total = np.concatenate([c for c, _ in chunks])
    assert total.size > 0 and np.isfinite(total).all()
    assert all(sr == pipe.sample_rate for _, sr in chunks)


def test_longform_streaming_through_real_socket(server, pipe):
    """Longform flag: sentence-segmented synthesis over the same transport,
    one stable voice across segments (globals-only clone continuations)."""
    chunks = list(
        framed_synthesize_stream(
            server.host, server.port, "seg one here. seg two here. seg three.",
            prompt_wav=_wav(3), longform=True, max_segment_chars=14,
        )
    )
    assert len(chunks) >= 2
    total = np.concatenate([c for c, _ in chunks])
    assert total.size > 0 and np.isfinite(total).all()
    assert server.backend.server.stats.get("longform_segments", 0) >= 2


def test_unary_through_real_socket(server, pipe):
    wav, sr = framed_synthesize(
        server.host, server.port, "offline over the wire", prompt_wav=_wav(2)
    )
    assert wav.size > 0 and np.isfinite(wav).all()
    assert sr == pipe.sample_rate


def test_concurrent_streams_share_batch(server):
    """Two concurrent socket streams must both complete (they share the
    continuous decode batch server-side)."""
    import threading

    results = {}

    def one(name, seed):
        got = list(
            framed_synthesize_stream(
                server.host, server.port, f"concurrent {name}", prompt_wav=_wav(seed)
            )
        )
        results[name] = np.concatenate([c for c, _ in got]) if got else np.zeros(0)

    threads = [threading.Thread(target=one, args=(f"t{i}", i)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    # both streams must COMPLETE (final flag received).  A single stream may
    # legitimately carry zero chunks when the tiny random model samples EOS
    # immediately, so assert on completion + combined audio, not per-stream.
    assert set(results) == {"t0", "t1"}
    assert sum(v.size for v in results.values()) > 0
    stats = server.backend.server.stats
    assert stats["completed"] >= 2


def test_unknown_method_yields_error_chunk(server):
    import socket

    from sparktts_tpu.serve.grpc_server import _read_frame, _write_frame

    with socket.create_connection((server.host, server.port)) as sock:
        r, w = sock.makefile("rb"), sock.makefile("wb")
        _write_frame(w, b"/sparktts.SparkTTS/NoSuchMethod")
        _write_frame(w, pb.SynthesisRequest(text="x").SerializeToString())
        chunk = pb.AudioChunk.FromString(_read_frame(r))
    assert chunk.final and "unknown method" in chunk.error


def test_grpcio_transport_if_available(pipe):
    grpc = pytest.importorskip("grpc")  # noqa: F841
    from sparktts_tpu.serve.grpc_server import grpc_synthesize_stream, serve_grpc

    server, backend = serve_grpc(pipe, host="127.0.0.1", port=0, max_slots=2,
                                 steps_per_dispatch=4)
    try:
        chunks = list(
            grpc_synthesize_stream(
                "127.0.0.1", server.bound_port, "real grpc", prompt_wav=_wav(3)
            )
        )
        assert chunks and np.concatenate([c for c, _ in chunks]).size > 0
    finally:
        server.stop(0)
        backend.close()


def test_client_disconnect_frees_decode_slot(server):
    """Dropping the socket mid-stream must cancel the backend request (pump
    cancellation → async generator close → slot reaped) instead of decoding
    to budget end for nobody."""
    import socket
    import time as _time

    from sparktts_tpu.serve.grpc_server import _read_frame, _write_frame

    backend = server.backend
    max_slots = len(backend.server.engine.owner)
    req = pb.SynthesisRequest(
        text="abandon me", prompt_wav=_wav(9).tobytes(), max_new_tokens=16
    )
    sock = socket.create_connection((server.host, server.port))
    r, w = sock.makefile("rb"), sock.makefile("wb")
    _write_frame(w, b"/sparktts.SparkTTS/SynthesizeStream")
    _write_frame(w, req.SerializeToString())
    chunk = pb.AudioChunk.FromString(_read_frame(r))  # first chunk arrives
    assert not chunk.error
    sock.close()  # drop mid-stream

    deadline = _time.time() + 60
    while _time.time() < deadline:
        if backend.server.engine.free_slots() == max_slots and not backend.server.inflight:
            break
        _time.sleep(0.1)
    assert backend.server.engine.free_slots() == max_slots
    assert not backend.server.inflight
