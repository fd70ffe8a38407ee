"""Randomized soak of the continuous server: mixed modes, jittered arrivals,
mid-stream abandonment and slot pressure in ONE run.

The per-behavior tests (tests/test_continuous_server.py, tests/test_paged.py)
each isolate one mechanism; this test interleaves them the way live traffic
does — the role of a staging soak against the reference's Triton deployment
(SURVEY.md §3.5) — and then asserts the server drained to a clean state:
every slot free, no inflight bookkeeping left behind, accounting consistent.
"""

import asyncio
import random

import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve.continuous_server import ContinuousTTSServer


@pytest.fixture(scope="module")
def pipe():
    return SparkTTSPipeline(max_new_tokens=16, prompt_bucket=32)


def _wav(freq):
    sr = 16000
    t = np.arange(sr) / sr
    return 0.3 * np.sin(2 * np.pi * freq * t)


# (kind, kwargs) templates; texts stay short so every prompt shares one
# 32-token bucket and the soak exercises scheduling, not compilation
def _requests(rng):
    reqs = []
    for i in range(12):
        kind = rng.choice(["clone_off", "clone_stream", "ctrl_off",
                           "ctrl_stream", "clone_text", "abandon"])
        base = dict(text=f"soak {i}", max_new_tokens=12)
        if kind in ("clone_off", "clone_stream", "abandon"):
            base["prompt_wav"] = _wav(200 + 20 * (i % 5))
        elif kind == "clone_text":
            base["prompt_wav"] = _wav(260)
            base["prompt_text"] = "short transcript"
        else:
            base.update(gender=rng.choice(["male", "female"]),
                        pitch="moderate", speed="moderate")
        reqs.append((kind, base))
    return reqs


def test_randomized_soak_drains_clean(pipe):
    rng = random.Random(7)
    reqs = _requests(rng)

    async def drive(server, kind, kw):
        await asyncio.sleep(rng.random() * 0.8)  # jittered arrival
        if kind in ("clone_stream", "ctrl_stream"):
            chunks = []
            async for c in server.synthesize_streaming(**kw):
                chunks.append(c)
            return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        if kind == "abandon":
            agen = server.synthesize_streaming(**kw)
            async for _c in agen:
                break  # walk away after first audio
            await agen.aclose()
            return None
        return await server.synthesize(**kw)

    async def run():
        # 3 slots for 12 requests → constant queue pressure + slot recycling;
        # cache sized so transcript clones (longest prompts) fit a slot
        server = ContinuousTTSServer(
            pipe, max_slots=3, steps_per_dispatch=4, cache_len=512
        )
        await server.start()
        results = await asyncio.gather(
            *(drive(server, kind, kw) for kind, kw in reqs),
            return_exceptions=True,
        )
        # drain: every slot free again within a bounded wait
        for _ in range(200):
            if server.engine.free_slots() == server.engine.max_slots:
                break
            await asyncio.sleep(0.05)
        state = dict(
            free=server.engine.free_slots(),
            max_slots=server.engine.max_slots,
            inflight=len(server.inflight),
            stats=dict(server.stats),
        )
        await server.stop()
        return results, state

    results, state = asyncio.new_event_loop().run_until_complete(run())

    errors = [r for r in results if isinstance(r, Exception)]
    assert not errors, errors
    n_abandoned = sum(1 for kind, _ in reqs if kind == "abandon")
    finished = [r for r in results if isinstance(r, np.ndarray)]
    assert len(finished) == len(reqs) - n_abandoned
    for w in finished:
        assert np.isfinite(w).all() and w.size > 0

    # clean drain: no slot leaked, no request bookkeeping left behind
    assert state["free"] == state["max_slots"], state
    assert state["inflight"] == 0, state
    # accounting: every non-abandoned request completed
    assert state["stats"]["completed"] >= len(reqs) - n_abandoned
    assert state["stats"]["requests"] == len(reqs)


def test_request_too_long_rejected_cleanly(pipe):
    """A prompt+budget that can NEVER fit a slot is rejected with
    RequestTooLong (no capacity assert, no doomed fused-warm compile), and
    the server keeps serving afterwards."""
    from sparktts_tpu.lm.continuous import RequestTooLong

    async def run():
        server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=4)
        await server.start()
        cap = server._slot_capacity()
        with pytest.raises(RequestTooLong):
            # transcript clone inflates the prompt past the tiny cache
            await server.synthesize(
                "way too much", prompt_wav=_wav(250),
                prompt_text="long transcript " * 4,
                max_new_tokens=cap,
            )
        # no fused executable was compiled for the doomed signature
        assert not getattr(server.engine, "_fused_exe", {})
        # the server still serves a fitting request
        wav = await server.synthesize("still fine", prompt_wav=_wav(300))
        await server.stop()
        return wav

    wav = asyncio.new_event_loop().run_until_complete(run())
    assert np.isfinite(wav).all() and wav.size > 0


def test_randomized_soak_paged_engine(pipe):
    """Same soak over the PAGED engine (page reservation + deferral path
    under the same mixed load), small page pool to force deferrals."""
    rng = random.Random(11)
    # transcript clones need a larger per-slot capacity than the tiny paged
    # table; their fit/reject behavior is covered above
    reqs = [(k, kw) for k, kw in _requests(rng) if k != "clone_text"][:8]

    async def drive(server, kind, kw):
        await asyncio.sleep(rng.random() * 0.5)
        if kind == "abandon":
            # mid-stream abandonment over the PAGED engine: reserved pages
            # must come back to the pool (asserted via reserved==0 below)
            agen = server.synthesize_streaming(**kw)
            async for _c in agen:
                break
            await agen.aclose()
            return None
        if kind in ("clone_stream", "ctrl_stream"):
            chunks = []
            async for c in server.synthesize_streaming(**kw):
                chunks.append(c)
            return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        return await server.synthesize(**kw)

    async def run():
        server = ContinuousTTSServer(
            pipe, max_slots=3, steps_per_dispatch=4, paged=True, page_size=32
        )
        await server.start()
        results = await asyncio.gather(
            *(drive(server, kind, kw) for kind, kw in reqs),
            return_exceptions=True,
        )
        for _ in range(200):
            if server.engine.free_slots() == server.engine.max_slots:
                break
            await asyncio.sleep(0.05)
        state = dict(
            free=server.engine.free_slots(),
            max_slots=server.engine.max_slots,
            pages_free=len(server.engine.free_pages),
            reserved=int(server.engine.reserved.sum()),
            stats=dict(server.stats),
        )
        await server.stop()
        return results, state

    results, state = asyncio.new_event_loop().run_until_complete(run())
    errors = [r for r in results if isinstance(r, Exception)]
    assert not errors, errors
    n_abandoned = sum(1 for kind, _ in reqs if kind == "abandon")
    finished = [r for r in results if isinstance(r, np.ndarray)]
    assert len(finished) == len(reqs) - n_abandoned
    for w in finished:
        assert np.isfinite(w).all()
    assert state["free"] == state["max_slots"], state
    # every reserved page returned to the pool (incl. abandoned streams)
    assert state["reserved"] == 0, state
