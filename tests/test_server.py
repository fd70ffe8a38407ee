"""Serving layer tests: dynamic batching groups concurrent requests into one
program; results come back per-request."""

import asyncio

import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve.server import TTSRequest, TTSServer


@pytest.fixture(scope="module")
def pipe():
    return SparkTTSPipeline(max_new_tokens=16, prompt_bucket=32)


def _prompt_wav():
    sr = 16000
    t = np.arange(sr) / sr
    return (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)


def test_batched_requests(pipe):
    async def run():
        server = TTSServer(pipe, max_batch=4, batch_window_ms=200.0)
        await server.start()
        wav = _prompt_wav()
        reqs = [
            TTSRequest(text=f"utterance {i}", prompt_wav=wav, seed=i) for i in range(3)
        ]
        results = await asyncio.gather(*(server.synthesize(r) for r in reqs))
        await server.stop()
        return server, results

    server, results = asyncio.new_event_loop().run_until_complete(run())
    assert len(results) == 3
    for res in results:
        assert res.sample_rate == 16000
        assert np.isfinite(res.wav).all()
    # the window should have batched them together
    stats = server.stats_summary()
    assert stats["requests"] == 3
    assert stats["batches"] <= 2


def test_controllable_request(pipe):
    async def run():
        server = TTSServer(pipe, max_batch=2, batch_window_ms=5.0)
        await server.start()
        res = await server.synthesize(
            TTSRequest(text="hi", gender="male", pitch="low", speed="moderate")
        )
        await server.stop()
        return res

    res = asyncio.new_event_loop().run_until_complete(run())
    assert np.isfinite(res.wav).all()


def test_controllable_requests_use_control_constraint(pipe):
    """Regression: the batch path must pass mode='control' for gender
    requests — the clone-mode guided constraint makes global/control tokens
    unsampleable (wrong-voice audio)."""
    import asyncio

    from sparktts_tpu.serve.server import TTSRequest, TTSServer

    seen = []
    orig = pipe.generate_tokens_batch

    def spy(prompts, **kw):
        seen.append(kw.get("mode", "clone"))
        return orig(prompts, **kw)

    pipe.generate_tokens_batch = spy
    try:
        async def run():
            # fused_clone off: this regression pins the HOST batch path's
            # mode routing (the fused path is clone-only by construction and
            # covered by test_device_admission)
            server = TTSServer(pipe, max_batch=4, batch_window_ms=30, fused_clone=False)
            await server.start()
            res = await asyncio.gather(
                server.synthesize(TTSRequest(text="a", prompt_wav=_prompt_wav())),
                server.synthesize(TTSRequest(
                    text="b", gender="female", pitch="moderate", speed="moderate"
                )),
            )
            await server.stop()
            return res

        res = asyncio.new_event_loop().run_until_complete(run())
    finally:
        pipe.generate_tokens_batch = orig
    assert "control" in seen and "clone" in seen
    assert all(np.isfinite(r.wav).all() for r in res)
