"""Continuous-batching server tests: concurrent + staggered requests."""

import asyncio

import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve.continuous_server import ContinuousTTSServer


@pytest.fixture(scope="module")
def pipe():
    return SparkTTSPipeline(max_new_tokens=16, prompt_bucket=32)


def _wav(freq=300.0):
    sr = 16000
    t = np.arange(sr) / sr
    return 0.3 * np.sin(2 * np.pi * freq * t)


def test_concurrent_requests(pipe):
    async def run():
        server = ContinuousTTSServer(pipe, max_slots=4, steps_per_dispatch=6)
        await server.start()
        wavs = await asyncio.gather(
            server.synthesize("first utterance", prompt_wav=_wav(220)),
            server.synthesize("second utterance", prompt_wav=_wav(330)),
            server.synthesize("third one", gender="female", pitch="moderate", speed="moderate"),
        )
        await server.stop()
        return server, wavs

    server, wavs = asyncio.new_event_loop().run_until_complete(run())
    assert len(wavs) == 3
    for w in wavs:
        assert np.isfinite(w).all()
    assert server.stats["completed"] == 3


def test_staggered_requests_join_running_batch(pipe):
    async def run():
        server = ContinuousTTSServer(pipe, max_slots=4, steps_per_dispatch=4)
        await server.start()
        first = asyncio.create_task(server.synthesize("early request", prompt_wav=_wav()))
        await asyncio.sleep(0.5)  # let it start decoding
        second = asyncio.create_task(server.synthesize("late request", prompt_wav=_wav(440)))
        w1, w2 = await asyncio.gather(first, second)
        await server.stop()
        return server, w1, w2

    server, w1, w2 = asyncio.new_event_loop().run_until_complete(run())
    assert np.isfinite(w1).all() and np.isfinite(w2).all()
    assert server.stats["completed"] == 2


def test_streaming_over_continuous_batch(pipe):
    async def run():
        server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=4)
        await server.start()

        chunks = []

        async def consume():
            async for chunk in server.synthesize_streaming(
                "stream me", prompt_wav=_wav(260), max_new_tokens=14
            ):
                chunks.append(chunk)

        offline_task = asyncio.create_task(
            server.synthesize("offline neighbor", prompt_wav=_wav(500), max_new_tokens=14)
        )
        await consume()
        offline = await offline_task
        await server.stop()
        return server, chunks, offline

    server, chunks, offline = asyncio.new_event_loop().run_until_complete(run())
    assert len(chunks) >= 1
    total = np.concatenate(chunks) if chunks else np.zeros(0)
    assert np.isfinite(total).all()
    assert np.isfinite(offline).all()
    assert server.stats["completed"] == 2


def test_failure_containment(pipe):
    """A request whose admission fails (bad prompt audio) must not take down
    the server or other requests."""

    async def run():
        server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=4)
        await server.start()
        bad = asyncio.create_task(
            server.synthesize("bad", prompt_wav=np.zeros(100))  # silence → ValueError... or tiny wav
        )
        good = asyncio.create_task(
            server.synthesize("good", gender="male", pitch="low", speed="low", max_new_tokens=8)
        )
        bad_exc = None
        try:
            await bad
        except Exception as e:
            bad_exc = e
        wav = await good
        await server.stop()
        return bad_exc, wav

    bad_exc, wav = asyncio.new_event_loop().run_until_complete(run())
    # the bad request either errored or synthesized garbage; the good one is fine
    assert np.isfinite(wav).all()


def test_paged_server_matches_dense(pipe):
    """The server on the paged engine must produce the same waveforms as the
    dense engine for identical requests.  Greedy decode is used because the
    two engines' attention kernels (dense einsum vs paged Pallas) differ at
    the ulp level — sampled top-p boundaries can legitimately flip, argmax
    cannot (the sampled chain's distribution equality is covered by
    tests/test_paged.py at matched shapes)."""

    async def run(paged):
        # vocode_batch off: batched-vs-scalar vocode adds float noise and is
        # timing-dependent; this test asserts BIT equality of the engines
        server = ContinuousTTSServer(
            pipe, max_slots=4, steps_per_dispatch=6, paged=paged, greedy=True,
            vocode_batch=False,
        )
        await server.start()
        wavs = await asyncio.gather(
            server.synthesize("paged check one", prompt_wav=_wav(250)),
            server.synthesize("paged check two", prompt_wav=_wav(350)),
        )
        await server.stop()
        return wavs

    dense = asyncio.new_event_loop().run_until_complete(run(False))
    paged = asyncio.new_event_loop().run_until_complete(run(True))
    assert len(paged) == 2
    for a, b in zip(dense, paged):
        np.testing.assert_array_equal(a, b)


def test_engine_failure_contained_and_server_survives(pipe):
    """Requests the page pool cannot cover must fail with an exception while
    the server keeps serving.  With admission-time worst-case reservation,
    oversized requests are rejected UP FRONT (the round-2 behavior — pool
    exhaustion mid-decode failing the whole batch — can no longer happen)."""

    async def run():
        server = ContinuousTTSServer(
            pipe, max_slots=2, steps_per_dispatch=4, paged=True, n_pages=3,
            page_size=32,
        )
        await server.start()
        # each 48-token-budget request needs 3 reserved pages; the pool has
        # 2 usable — both are refused at admission
        results = await asyncio.gather(
            server.synthesize("exhaust one", prompt_wav=_wav(220), max_new_tokens=48),
            server.synthesize("exhaust two", prompt_wav=_wav(330), max_new_tokens=48),
            return_exceptions=True,
        )
        assert any(isinstance(r, Exception) for r in results), results
        # the loop must still be alive: a small follow-up request succeeds
        wav = await server.synthesize("recovery", prompt_wav=_wav(250), max_new_tokens=8)
        await server.stop()
        return wav

    wav = asyncio.new_event_loop().run_until_complete(run())
    assert np.isfinite(wav).all()


def test_abandoned_stream_frees_slot(pipe):
    """Closing a streaming consumer early must release the decode slot."""

    async def run():
        server = ContinuousTTSServer(pipe, max_slots=1, steps_per_dispatch=2)
        await server.start()
        agen = server.synthesize_streaming("abandoned", prompt_wav=_wav(220),
                                           max_new_tokens=64)
        first = None
        async for chunk in agen:
            first = chunk
            break          # abandon after the first chunk
        await agen.aclose()
        # the single slot must come free without draining the whole budget
        for _ in range(200):
            if server.engine.free_slots() == 1:
                break
            await asyncio.sleep(0.05)
        assert server.engine.free_slots() == 1
        # and the slot is reusable
        wav = await server.synthesize("after abandon", prompt_wav=_wav(300),
                                      max_new_tokens=8)
        await server.stop()
        return first, wav

    first, wav = asyncio.new_event_loop().run_until_complete(run())
    assert first is not None and np.isfinite(wav).all()


def test_control_streaming_uses_emitted_globals(pipe):
    """Controllable-mode STREAMING must condition the vocoder on the same
    LLM-emitted speaker tokens the offline path extracts.  Regression: the
    chunk-vocode path used to extract globals only from the increment that
    triggered the chunk, so globals delivered in an earlier micro-batch were
    dropped and chunks rendered with a zero speaker embedding."""

    def record_detok(p):
        calls = []
        orig = p.detokenize

        def spy(g, s):
            calls.append(np.array(g))
            return orig(g, s)

        return calls, spy

    kwargs = dict(text="spoken identity", gender="female", pitch="moderate",
                  speed="moderate", max_new_tokens=12)

    async def run_offline():
        calls, spy = record_detok(pipe)
        server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=4)
        orig = pipe.detokenize
        pipe.detokenize = spy
        try:
            await server.start()
            await server.synthesize(**{k: v for k, v in kwargs.items() if k != "text"},
                                    text=kwargs["text"])
            await server.stop()
        finally:
            pipe.detokenize = orig
        return calls

    async def run_stream():
        calls, spy = record_detok(pipe)
        server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=4)
        orig = pipe.detokenize
        pipe.detokenize = spy
        try:
            await server.start()
            async for _ in server.synthesize_streaming(**kwargs):
                pass
            await server.stop()
        finally:
            pipe.detokenize = orig
        return calls

    # identically-seeded fresh servers → identical sampled token streams, so
    # the globals the vocoder sees must agree between the two paths
    off_calls = asyncio.new_event_loop().run_until_complete(run_offline())
    str_calls = asyncio.new_event_loop().run_until_complete(run_stream())
    if not off_calls:
        pytest.skip("request produced no vocoder call (immediate EOS)")
    assert str_calls, "streaming produced no vocoder call but offline did"
    for g in str_calls:
        np.testing.assert_array_equal(g, off_calls[0])


def test_requested_steps_first_chunk_only(pipe):
    """Dispatch sizing caps at a stream's FIRST chunk distance only; once the
    first chunk's tokens are covered the slot asks for its whole remaining
    budget (later chunks emit from whatever lands), and >1 active stream
    halves the cap so mid-dispatch arrivals never wait out a max dispatch."""
    from sparktts_tpu.serve.continuous_server import _Pending

    server = ContinuousTTSServer(pipe, max_slots=4, steps_per_dispatch=64)
    eng = server.engine

    stream = _Pending(
        text="x", prompt_wav=None, prompt_text=None, gender=None, pitch=None,
        speed=None, max_new_tokens=100, future=None,
        chunk_queue=asyncio.Queue(), stream_target=5, first_target=5,
    )
    eng.owner[0] = 1
    eng.budget[0] = 100
    server.inflight[1] = stream
    # lone pre-first-chunk stream: the need is pre-snapped UP to the covering
    # ladder rung (within 2x) so the whole first chunk rides one dispatch
    assert server._requested_steps() == 8      # first chunk pending (5 -> 8)
    stream.loop_tokens = 3
    assert server._requested_steps() == 4      # partial coverage (2 -> 4)
    stream.loop_tokens = 5
    assert server._requested_steps() == 100    # covered: full budget

    offline = _Pending(
        text="y", prompt_wav=None, prompt_text=None, gender=None, pitch=None,
        speed=None, max_new_tokens=80, future=None,
    )
    eng.owner[1] = 2
    eng.budget[1] = 80
    server.inflight[2] = offline
    assert server._requested_steps() == 32     # two active: cap steps//2
    stream.loop_tokens = 0
    assert server._requested_steps() == 5      # fresh first chunk still wins

    # arrival anticipation: a lone stream that had concurrent company within
    # arrival_window_s keeps a quarter-ladder cap so the NEXT closed-loop
    # arrival never waits out a budget-length dispatch
    eng.owner[1] = None
    server.inflight.pop(2)
    stream.loop_tokens = 5                     # first chunk covered
    assert server._requested_steps() == 16     # recent concurrency: steps//4
    server._last_concurrent = float("-inf")    # window expired
    assert server._requested_steps() == 100    # single-stream: full budget


def test_co_dispatch_caps_are_absolute(pipe):
    """Raising the dispatch ceiling to the 512 ladder top must NOT raise how
    long a mid-flight admission waits: with company (or expected company) the
    dispatch caps stay at the absolute 64/32 steps the 128-cap configuration
    recorded, while a lone deadline-free slot gets its whole budget in one
    dispatch (the relay round-trip amortization the top rungs exist for)."""
    from sparktts_tpu.lm.continuous import DISPATCH_LADDER, snap_to_ladder
    from sparktts_tpu.serve.continuous_server import _Pending

    assert DISPATCH_LADDER[-1] == 512
    # overshoot-aware snapping: round up only when the overshot steps cost
    # less than the dispatch they save (the scan EXECUTES overshot steps)
    assert snap_to_ladder(129, 512) == 128   # 256 would waste 127 steps
    assert snap_to_ladder(500, 512) == 512   # 12-step overshoot is fine
    assert snap_to_ladder(350, 512) == 256   # tail rides a later dispatch
    assert snap_to_ladder(500, 128) == 128   # explicit caps still bind
    # a NON-RUNG cap is itself a rung: the warm walk compiles eng.step(cap),
    # so snapping must resolve to it — both the warm call itself and a
    # runtime request near the cap (otherwise the cap-sized program compiles
    # cold inside a live stream, the exact stall the warm exists to prevent)
    assert snap_to_ladder(200, 200) == 200   # the warm walk's own call
    assert snap_to_ladder(230, 200) == 200   # capped request hits warm size
    assert snap_to_ladder(130, 200) == 128   # ladder rungs still preferred
    assert snap_to_ladder(180, 200) == 200   # 20-step overshoot onto the cap

    server = ContinuousTTSServer(pipe, max_slots=4, steps_per_dispatch=512)
    assert server.co_dispatch_cap == 64
    assert server.anticipation_cap == 32
    eng = server.engine

    a = _Pending(
        text="x", prompt_wav=None, prompt_text=None, gender=None, pitch=None,
        speed=None, max_new_tokens=500, future=None,
    )
    eng.owner[0] = 1
    eng.budget[0] = 500
    server.inflight[1] = a
    # lone offline slot: full budget -> one 512-step dispatch
    assert server._requested_steps() == 500
    assert snap_to_ladder(server._requested_steps(), server.steps) == 512

    b = _Pending(
        text="y", prompt_wav=None, prompt_text=None, gender=None, pitch=None,
        speed=None, max_new_tokens=500, future=None,
    )
    eng.owner[1] = 2
    eng.budget[1] = 500
    server.inflight[2] = b
    assert server._requested_steps() == 64     # company: absolute cap
    eng.owner[1] = None
    server.inflight.pop(2)
    assert server._requested_steps() == 32     # anticipation: absolute cap


def test_stop_midstep_commits_and_delivers(pipe):
    """stop() racing a decode dispatch must both COMMIT the step (device
    cache already advanced) and DELIVER its tokens: a stream surviving a
    stop()/start() restart produces exactly the audio an uninterrupted run
    produces.  Regression: commit-on-cancel used to drop the committed
    increments, leaving a silent gap in (or truncating) surviving streams."""
    import threading

    text, wav_freq, budget = "restart survivor", 260, 14

    async def run(interrupt):
        server = ContinuousTTSServer(
            pipe, max_slots=2, steps_per_dispatch=4, greedy=True
        )
        engine = server.engine
        real_fetch = engine.step_fetch
        loop = asyncio.get_running_loop()
        fetch_started = asyncio.Event()
        release = threading.Event()

        def slow_fetch(handle):
            loop.call_soon_threadsafe(fetch_started.set)
            release.wait(timeout=600)
            return real_fetch(handle)

        if interrupt:
            engine.step_fetch = slow_fetch
        await server.start()
        chunks = []

        async def consume():
            async for chunk in server.synthesize_streaming(
                text, prompt_wav=_wav(wav_freq), max_new_tokens=budget
            ):
                chunks.append(chunk)

        task = asyncio.create_task(consume())
        if interrupt:
            # guarantee stop() lands MID-STEP: the decode fetch is gated on
            # `release`, so the loop task is parked awaiting it when the
            # cancel arrives.  stop() blocks the event loop inside the
            # commit-on-cancel fetch, so the gate opens from a plain thread.
            await asyncio.wait_for(fetch_started.wait(), timeout=600)
            threading.Timer(1.0, release.set).start()
            await server.stop()
            engine.step_fetch = real_fetch  # restart decodes normally
            await server.start()
        await asyncio.wait_for(task, timeout=600)
        await server.stop()
        return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

    loop_ = asyncio.new_event_loop()
    base = loop_.run_until_complete(run(False))
    survived = loop_.run_until_complete(run(True))
    assert survived.shape == base.shape, (
        f"restart lost audio: {survived.shape} vs uninterrupted {base.shape}"
    )
    np.testing.assert_allclose(survived, base, atol=1e-5)


def test_admission_overlaps_inflight_fetch(pipe):
    """A request arriving while a decode fetch blocks its worker thread is
    admitted BEFORE the fetch completes (its tokenize/prefill dispatches
    enqueue behind the in-flight decode program)."""
    import threading

    async def run():
        server = ContinuousTTSServer(pipe, max_slots=4, steps_per_dispatch=4)
        engine = server.engine
        real_fetch = engine.step_fetch
        loop = asyncio.get_running_loop()
        fetch_started = asyncio.Event()
        release = threading.Event()
        admitted_during_fetch = []

        def slow_fetch(handle):
            loop.call_soon_threadsafe(fetch_started.set)
            release.wait(timeout=600)
            return real_fetch(handle)

        real_admit = server._admit

        def admit_spy(pending):
            admitted_during_fetch.append(
                fetch_started.is_set() and not release.is_set()
            )
            return real_admit(pending)

        engine.step_fetch = slow_fetch
        server._admit = admit_spy

        await server.start()
        t1 = asyncio.create_task(server.synthesize("first", prompt_wav=_wav()))
        # generous bounds: first admission + dispatch cold-compile on a
        # 1-CPU box can take minutes before the fetch thread even starts
        await asyncio.wait_for(fetch_started.wait(), timeout=600)
        t2 = asyncio.create_task(server.synthesize("second", prompt_wav=_wav(440)))
        deadline = asyncio.get_running_loop().time() + 300
        while (
            len(admitted_during_fetch) < 2
            and asyncio.get_running_loop().time() < deadline
        ):
            await asyncio.sleep(0.05)
        release.set()
        w1, w2 = await asyncio.gather(t1, t2)
        await server.stop()
        return admitted_during_fetch, w1, w2

    admitted, w1, w2 = asyncio.new_event_loop().run_until_complete(run())
    assert np.isfinite(w1).all() and np.isfinite(w2).all()
    assert len(admitted) >= 2 and admitted[1], (
        "second request was not admitted while the fetch was in flight"
    )


def test_detokenize_receptive_field_bound(pipe):
    """The RF helper returns a finite, plausible bound: big enough to cover
    the deepest conv stack, far smaller than a long stream (otherwise the
    windowed vocode would never save anything)."""
    from sparktts_tpu.codec.bicodec import detokenize_receptive_field
    from sparktts_tpu.config import BiCodecConfig

    rf_full = detokenize_receptive_field(BiCodecConfig())
    assert 40 <= rf_full <= 200, rf_full
    rf_tiny = detokenize_receptive_field(pipe.config.bicodec)
    assert 0 < rf_tiny <= rf_full


def test_receptive_field_covers_empirical_reach_large_ratio():
    """detokenize_receptive_field must UPPER-bound the measured forward
    influence of one input frame even with sampler ratios >= 4, where the
    prenet deconv's one-sided reach is (2r-1-⌈r/2⌉)/r > 1 input frames
    (regression: a constant 1-frame-per-sampler term undercounted there,
    which would let the windowed streaming vocode emit chunks that differ
    from the full-prefix recompute).  Measures reach by perturbing single
    semantic frames at several stride phases and locating the last changed
    output sample."""
    import dataclasses

    from sparktts_tpu.codec.bicodec import detokenize_receptive_field
    from sparktts_tpu.config import tiny_test_config

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        bicodec=dataclasses.replace(
            cfg.bicodec,
            prenet=dataclasses.replace(
                cfg.bicodec.prenet, sample_ratios=(4, 2)
            ),
        ),
    )
    p = SparkTTSPipeline(config=cfg, max_new_tokens=16, prompt_bucket=32)
    rf = detokenize_receptive_field(cfg.bicodec)
    up = p._wave_upsample
    n_glob = cfg.bicodec.speaker_encoder.token_num
    glob = np.zeros((1, n_glob), np.int32)
    rng = np.random.default_rng(0)
    codebook = cfg.bicodec.quantizer.codebook_size
    T = rf + 48  # room to the right of every probe
    sem = rng.integers(0, codebook, (1, T)).astype(np.int32)
    base = p.detokenize(glob, sem)
    worst = 0.0
    for j in (8, 9, 10, 11):  # cover the stride-4 sampler's input phases
        pert = sem.copy()
        pert[0, j] = (pert[0, j] + 1) % codebook
        out = p.detokenize(glob, pert)
        diff = np.nonzero(base != out)[0]
        assert diff.size, "perturbed token had no effect"
        worst = max(worst, diff[-1] / up - j)
    assert worst <= rf, (worst, rf)


def test_stream_context_window_matches_full_prefix(pipe):
    """Windowed streaming vocode (left context >= codec receptive field)
    must emit samples matching the full-prefix recompute.  Drives the vocode
    job runner directly with a fixed token stream so the window start is
    provably > 0 for later chunks.  vocode_batch off: each 40-token increment
    plans TWO same-shape windows, and batched-vs-scalar execution is float
    noise — this test asserts BIT equality of the windowing math."""
    import itertools

    from sparktts_tpu.serve.continuous_server import _Pending

    server = ContinuousTTSServer(
        pipe, max_slots=2, steps_per_dispatch=4, vocode_batch=False
    )
    tok = pipe.tokenizer
    n_glob = pipe.config.bicodec.speaker_encoder.token_num
    rng = np.random.default_rng(0)
    raw = (tok.semantic_base + rng.integers(0, tok.n_semantic, 160)).astype(np.int32)

    def run(ctx: int):
        server.stream_ctx = ctx
        p = _Pending(
            text="", prompt_wav=None, prompt_text=None, gender=None,
            pitch=None, speed=None, max_new_tokens=0, future=None,
        )
        p.chunk_queue = object()  # marks it as a streaming request
        p.global_tokens = np.zeros((1, n_glob), np.int32)
        p.stream_target = 20
        p.stream_schedule = itertools.repeat(20)
        chunks = []
        for start in range(0, len(raw), 40):
            final = start + 40 >= len(raw)
            res = server._run_vocode_jobs(
                [[p, raw[start : start + 40], final, False]]
            )[0]
            assert res["error"] is None
            chunks += res["chunks"]
            if final:
                assert res["final"]
        # windowing must actually have engaged for the later chunks
        assert p.stream_emitted > ctx or ctx >= len(raw)
        return np.concatenate(chunks)

    full = run(10**6)  # full-prefix recompute (window never truncates)
    windowed = run(server_ctx_default(pipe))
    assert full.shape == windowed.shape
    # bit-equal: bucket-aligned window start keeps the right pad identical,
    # and the left context covers the receptive field
    np.testing.assert_array_equal(windowed, full)


def test_vocode_window_cap_splits_and_matches_full_prefix(pipe):
    """max_vocode_window bounds every planned window's span (closing the
    detokenize shape set the warmup enumerates) by SPLITTING oversized
    windows; each piece carries its own receptive-field prefix, so the
    emitted samples are bit-equal to the uncapped plan.  Exercises the giant
    final-tail case that produced an unwarmed-t_pad compile inside the
    conc-4 dataset recording."""
    import itertools

    from sparktts_tpu.serve.continuous_server import _Pending

    tok = pipe.tokenizer
    n_glob = pipe.config.bicodec.speaker_encoder.token_num
    bucket = pipe.vocode_bucket
    rng = np.random.default_rng(7)
    raw = (tok.semantic_base + rng.integers(0, tok.n_semantic, 7 * bucket + 13)).astype(
        np.int32
    )
    ctx = server_ctx_default(pipe)

    def mk_pending():
        p = _Pending(
            text="", prompt_wav=None, prompt_text=None, gender=None,
            pitch=None, speed=None, max_new_tokens=0, future=None,
        )
        p.chunk_queue = object()
        p.global_tokens = np.zeros((1, n_glob), np.int32)
        # schedule never triggers: the whole stream arrives as one final tail
        p.stream_target = 10**6
        p.stream_schedule = itertools.repeat(10**6)
        return p

    def run(cap: int):
        server = ContinuousTTSServer(
            pipe, max_slots=2, steps_per_dispatch=4, vocode_batch=False,
            max_vocode_window=cap,
        )
        p = mk_pending()
        q = mk_pending()
        windows = server._plan_stream_chunks(q, raw, final=True)
        res = server._run_vocode_jobs([[p, raw, True, False]])[0]
        assert res["error"] is None
        return server, windows, np.concatenate(res["chunks"])

    server, windows, capped = run(ctx + 2 * bucket)  # smallest legal cap
    assert len(windows) > 1, "cap must have split the final tail"
    prev_upto = 0
    for start, emitted, upto, render in windows:
        assert upto - start <= server.max_vocode_window
        assert render - start <= server.max_vocode_window + server.stream_ctx
        assert upto <= render <= len(raw)
        assert start % bucket == 0
        assert emitted == prev_upto  # contiguous emission
        prev_upto = upto
    assert prev_upto == len(raw)
    # every split cut carries full look-ahead (only the schedule boundary
    # itself may truncate it)
    for start, emitted, upto, render in windows[:-1]:
        assert render == min(upto + server.stream_ctx, len(raw))

    _, full_windows, full = run(10**6)
    assert len(full_windows) == 1
    assert capped.shape == full.shape
    np.testing.assert_array_equal(capped, full)


def test_vocode_window_cap_floor_and_alignment(pipe):
    """The resolved cap is bucket-aligned and never below ctx + 2 buckets —
    a smaller cap could not advance emission past its own context prefix."""
    from sparktts_tpu.serve.continuous_server import vocode_window_cap

    bucket = pipe.vocode_bucket
    ctx = server_ctx_default(pipe)
    assert vocode_window_cap(pipe) % bucket == 0
    assert vocode_window_cap(pipe, max_vocode_window=1) == ctx + 2 * bucket
    big = vocode_window_cap(pipe, max_vocode_window=17 * bucket + 1)
    assert big == 18 * bucket and big % bucket == 0


def server_ctx_default(pipe) -> int:
    """The auto context the server derives: RF rounded up to the bucket."""
    from sparktts_tpu.codec.bicodec import detokenize_receptive_field

    rf = detokenize_receptive_field(pipe.config.bicodec)
    return -(-rf // pipe.vocode_bucket) * pipe.vocode_bucket


def test_vocode_drain_merges_and_prioritizes():
    """The vocode queue drain (a) coalesces queued increments of the same
    stream into one job, (b) orders streams still waiting for FIRST audio
    ahead of steady-state chunks, (c) preserves per-stream order and drops
    cancelled work.  Pure host logic — no pipeline needed."""
    import asyncio as aio

    from sparktts_tpu.serve.continuous_server import _Pending

    server = object.__new__(ContinuousTTSServer)
    server._vocode_q = aio.Queue()
    server.stats = {}

    def mk(streaming: bool, emitted: int = 0):
        p = _Pending(
            text="", prompt_wav=None, prompt_text=None, gender=None,
            pitch=None, speed=None, max_new_tokens=0, future=None,
        )
        if streaming:
            p.chunk_queue = object()
            p.stream_emitted = emitted
        return p

    established = mk(True, emitted=20)   # already emitted its first chunk
    fresh = mk(True, emitted=0)          # still waiting for first audio
    offline = mk(False)
    gone = mk(True)
    gone.cancelled = True

    t = lambda *ids: np.asarray(ids, np.int32)
    items = [
        (established, t(1, 2), False, False),
        (offline, t(9), True, True),
        (gone, t(7), False, False),
        (established, t(3), False, False),   # merges into the first job
        (fresh, t(4), False, False),
        (fresh, t(5), True, False),          # merges, carries final
    ]
    for it in items[1:]:
        server._vocode_q.put_nowait(it)
    jobs = server._drain_vocode_jobs(items[0])

    assert len(jobs) == 3  # cancelled dropped, two merges applied
    assert server.stats["vocode_merged"] == 2
    assert jobs[0][0] is fresh  # first-audio work jumps the queue
    np.testing.assert_array_equal(jobs[0][1], [4, 5])
    assert jobs[0][2] is True  # merged job keeps the final flag
    by_pending = {id(j[0]): j for j in jobs}
    np.testing.assert_array_equal(by_pending[id(established)][1], [1, 2, 3])
    assert by_pending[id(offline)][3] is True


def test_pick_vocode_batch_warms_tight_size(pipe):
    """An oversized warm batch may cover a drain's n windows, but the TIGHT
    size must still be background-compiled — otherwise one congested drain
    that warmed (say) 8 locks every later n=2 drain into 4x the MXU rows
    forever (the cover early-return used to skip the warm kick)."""
    from sparktts_tpu.serve.continuous_server import _voc_state

    server = ContinuousTTSServer(
        pipe, max_slots=8, steps_per_dispatch=4, vocode_batch=True
    )
    st = _voc_state(pipe)
    saved = set(st["warm"])
    kicks = []
    server._warm_vocode_batch_bg = lambda b, t: kicks.append((b, t))
    t_pad = 10**6  # a shape no other test warms
    try:
        st["warm"].add((8, t_pad))
        assert server._pick_vocode_batch(2, t_pad) == 8  # covers now...
        assert kicks == [(2, t_pad)]                     # ...but warms tight
        st["warm"].add((2, t_pad))
        kicks.clear()
        assert server._pick_vocode_batch(2, t_pad) == 2  # tight wins once warm
        assert kicks == []
    finally:
        st["warm"] -= st["warm"] - saved


def test_vocode_drain_survives_nonjob_exception(pipe):
    """An exception raised OUTSIDE the per-window guards (here: the warm
    kick's Thread.start stand-in) must not escape _run_vocode_jobs — it
    would kill the vocode task and hang every later request.  All jobs in
    the drain fail cleanly and are still delivered."""
    from sparktts_tpu.serve.continuous_server import _Pending, _voc_state

    server = ContinuousTTSServer(
        pipe, max_slots=4, steps_per_dispatch=4, vocode_batch=True
    )

    def boom(b, t_pad):
        raise RuntimeError("can't start new thread")

    server._warm_vocode_batch_bg = boom
    tok = pipe.tokenizer
    n_glob = pipe.config.bicodec.speaker_encoder.token_num
    jobs = []
    for _ in range(2):  # two same-shape windows → the batch picker runs
        p = _Pending(
            text="", prompt_wav=None, prompt_text=None, gender=None,
            pitch=None, speed=None, max_new_tokens=0, future=None,
        )
        p.global_tokens = np.zeros((1, n_glob), np.int32)
        toks = (tok.semantic_base + np.arange(24)).astype(np.int32)
        jobs.append([p, toks, True, True])
    # swap in an all-cold warm state so the picker must kick the warm
    st = _voc_state(pipe)
    saved = {k: set(v) for k, v in st.items()}
    st["warm"].clear()
    st["warming"].clear()
    try:
        delivered = []
        results = server._run_vocode_jobs(jobs, deliver=delivered.append)
    finally:
        for k, v in saved.items():
            st[k] |= v
    assert len(delivered) == len(jobs) == 2
    assert all(r["error"] is not None for r in results)


def test_split_first_audio_defers_steady_state_once():
    """First-chunk-priority vocode scheduling (_vocode_loop): a drain mixing
    a new stream's first chunk with steady-state chunks runs only the
    first-audio jobs and defers the rest ONE cycle — a deferred job is never
    deferred twice (underrun guard)."""
    from types import SimpleNamespace

    from sparktts_tpu.serve.continuous_server import _split_first_audio

    def stream(emitted):
        return SimpleNamespace(chunk_queue=object(), stream_emitted=emitted)

    new = [stream(0), np.arange(3), False, False]
    old1 = [stream(10), np.arange(3), False, False]
    old2 = [stream(7), np.arange(2), True, False]

    run, backlog, deferred = _split_first_audio([old1, new, old2], set())
    assert run == [new]
    assert [j[0] for j in backlog] == [old1[0], old2[0]]
    assert deferred == {id(old1[0]), id(old2[0])}

    # next cycle: the deferred jobs rejoin along with ANOTHER first-audio
    # job — they must NOT be deferred again
    new2 = [stream(0), np.arange(4), False, False]
    jobs2 = [list(j) for j in backlog] + [new2]
    run2, backlog2, deferred2 = _split_first_audio(jobs2, deferred)
    assert run2 == jobs2 and backlog2 == [] and deferred2 == set()

    # pure steady-state drain: untouched
    run3, backlog3, _ = _split_first_audio([old1, old2], set())
    assert run3 == [old1, old2] and backlog3 == []

    # offline jobs are never deferred (ADVICE r04): their caller holds no
    # buffered audio, so they run alongside the first-audio work
    off = [SimpleNamespace(chunk_queue=None, stream_emitted=0), np.arange(3), False, True]
    run4, backlog4, _ = _split_first_audio([off, new, old1], set())
    assert off in run4 and new in run4
    assert [j[0] for j in backlog4] == [old1[0]]


def test_pipelined_dispatch_depth_matches_serial(pipe):
    """The double-buffered decode cadence (dispatch_depth=2) must be exactly
    behavior-preserving vs the serialized cadence (depth=1): same tokens ->
    same audio for offline AND streaming requests sharing the batch, and the
    planned-token ledger must drain to zero.  Greedy + scalar vocode pin the
    nondeterminism that is PRE-EXISTING under concurrency (the shared rng
    stream and batched-vocode composition are timing-dependent at any depth);
    what this asserts is that the pipelined window itself changes nothing."""
    def run(depth):
        server = ContinuousTTSServer(
            pipe, max_slots=2, steps_per_dispatch=6, dispatch_depth=depth,
            greedy=True, vocode_batch=False,
        )

        async def go():
            await server.start()
            off_task = asyncio.create_task(
                server.synthesize("offline words", prompt_wav=_wav(250))
            )
            chunks = []
            async for c in server.synthesize_streaming(
                "stream words", prompt_wav=_wav(330)
            ):
                chunks.append(c)
            off = await off_task
            await server.stop()
            return off, chunks

        out = asyncio.new_event_loop().run_until_complete(go())
        assert all(v == 0 for v in server._planned_ahead), server._planned_ahead
        return out

    off1, chunks1 = run(1)
    off2, chunks2 = run(2)
    np.testing.assert_array_equal(off1, off2)
    assert len(chunks1) == len(chunks2)
    for a, b in zip(chunks1, chunks2):
        np.testing.assert_array_equal(a, b)


def test_pipelined_paged_pages_cover_inflight_window(pipe):
    """Paged engine under dispatch_depth=2: page growth must account for the
    dispatched-but-uncommitted window (steps_inflight), and results must
    match the dense engine's token streams."""
    def run(paged):
        server = ContinuousTTSServer(
            pipe, max_slots=2, steps_per_dispatch=4, dispatch_depth=2,
            paged=paged, page_size=32,
        )

        async def go():
            await server.start()
            wavs = await asyncio.gather(
                server.synthesize("page one", prompt_wav=_wav(220)),
                server.synthesize("page two", prompt_wav=_wav(440)),
            )
            await server.stop()
            return wavs

        wavs = asyncio.new_event_loop().run_until_complete(go())
        if paged:
            assert all(int(v) == 0 for v in server.engine.steps_inflight)
        return wavs

    dense = run(False)
    paged = run(True)
    for a, b in zip(dense, paged):
        assert a.shape == b.shape
        assert np.isfinite(a).all() and np.isfinite(b).all()
