"""Device-chained admission + speculative first-chunk rendering.

These paths exist to kill host syncs on the streaming critical path (each
sync costs a relay round-trip on a tunneled TPU); they must be EXACTLY
behavior-preserving: same prompt ids as host assembly, bit-identical
streamed audio vs the plain vocode-worker path.
"""

import asyncio
import dataclasses

import numpy as np
import pytest

from sparktts_tpu.config import tiny_test_config
from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.prompt import build_clone_prompt, clone_prompt_scaffold
from sparktts_tpu.serve.continuous_server import ContinuousTTSServer, _Pending


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_test_config()
    # small first chunk (4 tokens) so a 16-token budget spans several chunks
    cfg = dataclasses.replace(
        cfg, streaming=dataclasses.replace(cfg.streaming, frame_rate=4)
    )
    return SparkTTSPipeline(config=cfg, max_new_tokens=16, prompt_bucket=32)


def _wav(freq=300.0):
    sr = 16000
    t = np.arange(sr) / sr
    return 0.3 * np.sin(2 * np.pi * freq * t)


@pytest.mark.parametrize("with_prompt_text", [False, True])
def test_device_assembled_prompt_matches_host(pipe, with_prompt_text):
    prompt_text = "transcript words" if with_prompt_text else None
    g_dev, s_dev, n_sem = pipe.tokenize_audio_device(_wav())
    g = np.asarray(g_dev)
    s = np.asarray(s_dev)[:, :n_sem]

    host_ids = build_clone_prompt(
        pipe.tokenizer, "hello world", g, s if with_prompt_text else None, prompt_text
    )
    use_sem = n_sem if with_prompt_text else 0
    scaffold, prompt_len, g_off, s_off = clone_prompt_scaffold(
        pipe.tokenizer, "hello world", g.shape[1], use_sem, prompt_text
    )
    assert prompt_len == len(host_ids)
    t_pad = -(-prompt_len // 32) * 32
    scaffold = np.pad(
        scaffold, (0, t_pad - prompt_len), constant_values=pipe.tokenizer.pad_id
    )
    dev_ids = np.asarray(
        pipe.assemble_clone_ids(scaffold, g_dev, s_dev, g_off, s_off, use_sem)
    )
    np.testing.assert_array_equal(dev_ids[0, :prompt_len], np.asarray(host_ids))
    assert (dev_ids[0, prompt_len:] == pipe.tokenizer.pad_id).all()


def _stream_chunks(server, **kw):
    async def run():
        await server.start()
        chunks = []
        async for c in server.synthesize_streaming(
            "stream this text", prompt_wav=_wav(260), **kw
        ):
            chunks.append(c)
        await server.stop()
        return chunks

    return asyncio.new_event_loop().run_until_complete(run())


def test_spec_first_chunk_bit_identical_to_plain_path(pipe):
    fast = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=8,
                               fused_warm="sync")
    plain = ContinuousTTSServer(
        pipe,
        max_slots=2,
        steps_per_dispatch=8,
        device_admission=False,
        spec_first_chunk=False,
    )
    c_fast = _stream_chunks(fast)
    c_plain = _stream_chunks(plain)
    assert fast.stats.get("spec_chunks", 0) >= 1, "speculative path never triggered"
    assert len(c_fast) == len(c_plain)
    for a, b in zip(c_fast, c_plain):
        np.testing.assert_array_equal(a, b)


def test_offline_device_admission_matches_plain(pipe):
    fast = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=8,
                               fused_warm="sync")
    plain = ContinuousTTSServer(
        pipe, max_slots=2, steps_per_dispatch=8, device_admission=False
    )

    def run(server):
        async def go():
            await server.start()
            wav = await server.synthesize("same text", prompt_wav=_wav(410))
            await server.stop()
            return wav

        return asyncio.new_event_loop().run_until_complete(go())

    np.testing.assert_array_equal(run(fast), run(plain))


def test_fused_generate_vocode_bit_identical(pipe):
    """Pipeline-level: generate_and_vocode_batch (one fetch) is bit-identical
    to generate_tokens_batch + host extraction + detokenize_batch at the same
    batch composition."""
    from sparktts_tpu.prompt import build_clone_prompt, extract_semantic_ids

    tok = pipe.tokenizer
    wavs = [_wav(250), _wav(390)]
    texts = ["clone one", "clone two"]
    ptexts = [None, "said"]
    host = pipe.tokenize_audio_batch(wavs)
    prompts = [
        build_clone_prompt(
            tok, texts[j], host[j][0], host[j][1] if ptexts[j] else None, ptexts[j]
        )
        for j in range(2)
    ]
    outs = pipe.generate_tokens_batch(prompts, seed=0, mode="clone")
    sems = [extract_semantic_ids(tok, o) for o in outs]
    glob_rows = np.stack([np.asarray(host[j][0]).reshape(-1) for j in range(2)])
    ref_wavs = pipe.detokenize_batch(
        glob_rows, [s if s.size else np.zeros(1, np.int32) for s in sems]
    )

    longest = max(len(p) for p in prompts)
    t_pad = -(-longest // 32) * 32
    ids = np.full((2, t_pad), tok.pad_id, np.int32)
    mask = np.zeros((2, t_pad), bool)
    for i, p in enumerate(prompts):
        ids[i, t_pad - len(p):] = p
        mask[i, t_pad - len(p):] = True
    fused_wavs, fused_toks = pipe.generate_and_vocode_batch(ids, mask, glob_rows, seed=0)
    for j in range(2):
        np.testing.assert_array_equal(outs[j], fused_toks[j])
        np.testing.assert_array_equal(ref_wavs[j], fused_wavs[j])


def test_fused_window_batch_matches_host_path(pipe):
    """Server-level: the fused offline window path agrees with the host path
    on a mixed clone+control window.  Tokens are deterministic either way;
    waveforms are compared with a float tolerance because the two paths
    vocode under different BATCH COMPOSITIONS (fused groups clone requests
    separately from control ones) and XLA programs of different batch sizes
    reduce in different orders — a pre-existing property of detokenize_batch,
    not introduced by fusion (bit-exactness at equal composition is covered
    by test_fused_generate_vocode_bit_identical)."""
    from sparktts_tpu.serve.server import TTSRequest, TTSServer

    def run(fused):
        server = TTSServer(pipe, max_batch=4, fused_clone=fused)
        reqs = [
            TTSRequest(text="clone one", prompt_wav=_wav(250)),
            TTSRequest(text="clone two", prompt_wav=_wav(390), prompt_text="said"),
            TTSRequest(
                text="created", gender="female", pitch="moderate", speed="moderate"
            ),
        ]

        async def go():
            await server.start()
            res = await asyncio.gather(*(server.synthesize(r) for r in reqs))
            await server.stop()
            return res

        return asyncio.new_event_loop().run_until_complete(go())

    r_fused = run(True)
    r_host = run(False)
    for a, b in zip(r_fused, r_host):
        assert a.wav.size > 0
        assert a.wav.shape == b.wav.shape
        np.testing.assert_allclose(a.wav, b.wav, rtol=1e-4, atol=1e-5)


def _mk_stream_pending(gender=None, globals_known=True):
    p = _Pending(
        text="x", prompt_wav=None, prompt_text=None, gender=gender,
        pitch="moderate" if gender else None,
        speed="moderate" if gender else None,
        max_new_tokens=8, future=None,
        chunk_queue=asyncio.Queue(), stream_target=2,
        stream_schedule=iter([4, 8, 16]),
    )
    if globals_known:
        p.global_tokens = np.zeros((1, 4), np.int32)
    return p


def test_apply_spec_rejects_non_semantic_head(pipe):
    """EOS (or any non-semantic id) inside the speculated window must fall
    back to the normal vocode path — the chained render used garbage."""
    server = ContinuousTTSServer(pipe, max_slots=1, steps_per_dispatch=8)
    tok = pipe.tokenizer
    up = pipe._wave_upsample

    wav_bits = np.arange(2 * up, dtype=np.float32).view(np.int32)

    # head contains EOS → rejected, no bookkeeping
    p = _mk_stream_pending()
    server.inflight = {7: p}
    bad = np.asarray([tok.semantic_base, tok.eos_ids[0], tok.semantic_base + 1])
    entries = [(7, 0, 2, 0, False)]
    assert server._apply_specs((entries, None), wav_bits, {7: bad}) == set()
    assert p.stream_emitted == 0 and not p.stream_buf

    # all-semantic head → accepted, chunk pushed, schedule advanced
    p = _mk_stream_pending()
    server.inflight = {9: p}
    good = np.asarray(
        [tok.semantic_base + 5, tok.semantic_base + 6, tok.semantic_base + 7]
    )
    entries = [(9, 0, 2, 0, False)]
    assert server._apply_specs((entries, None), wav_bits, {9: good}) == {9}
    assert p.stream_emitted == 2
    assert p.stream_buf == [5, 6, 7]
    assert p.stream_target == 4
    chunk = p.chunk_queue.get_nowait()
    np.testing.assert_array_equal(chunk, wav_bits.view(np.float32))


def test_apply_specs_multi_slot_split_and_partial_miss(pipe):
    """A multi-slot plan's chained bits are split per entry IN ORDER, and a
    miss in one row must not poison its neighbors' slices."""
    server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=8)
    tok = pipe.tokenizer
    up = pipe._wave_upsample

    a, b = _mk_stream_pending(), _mk_stream_pending()
    server.inflight = {1: a, 2: b}
    wav_a = np.arange(2 * up, dtype=np.float32)
    wav_b = np.arange(2 * up, dtype=np.float32) + 1000.0
    chained = np.concatenate([wav_a, wav_b]).view(np.int32)
    good = np.asarray([tok.semantic_base + 1, tok.semantic_base + 2])
    bad = np.asarray([tok.eos_ids[0], tok.semantic_base + 3])
    entries = [(1, 0, 2, 0, False), (2, 1, 2, 0, False)]

    consumed = server._apply_specs((entries, None), chained, {1: bad, 2: good})
    assert consumed == {2}
    assert a.stream_emitted == 0 and not a.stream_buf
    # B got ITS slice (the second), not A's
    np.testing.assert_array_equal(b.chunk_queue.get_nowait(), wav_b)


def test_apply_specs_control_layout(pipe):
    """Controllable-mode spec: the trained emission layout (start marker,
    token_num globals, end marker, semantics) validates, extracts the
    speaker identity inline, and a layout deviation falls back."""
    server = ContinuousTTSServer(pipe, max_slots=1, steps_per_dispatch=8)
    tok = pipe.tokenizer
    tn = pipe.config.bicodec.speaker_encoder.token_num
    up = pipe._wave_upsample
    start_id = tok.token_id("<|start_global_token|>")
    end_id = tok.token_id("<|end_global_token|>")
    wav_bits = np.arange(2 * up, dtype=np.float32).view(np.int32)
    layout = (
        [start_id]
        + [tok.global_base + i for i in range(tn)]
        + [end_id, tok.semantic_base + 5, tok.semantic_base + 6]
    )
    entries = [(4, 0, 2, tn + 2, True)]

    p = _mk_stream_pending(gender="female", globals_known=False)
    server.inflight = {4: p}
    consumed = server._apply_specs((entries, None), wav_bits, {4: np.asarray(layout)})
    assert consumed == {4}
    np.testing.assert_array_equal(
        p.global_tokens, np.arange(tn, dtype=np.int32)[None, :]
    )
    assert p.stream_emitted == 2 and p.stream_buf == [5, 6]

    # deviant layout (missing end marker) → miss, no identity extracted
    p = _mk_stream_pending(gender="female", globals_known=False)
    server.inflight = {4: p}
    broken = list(layout)
    broken[1 + tn] = tok.semantic_base  # end marker replaced
    consumed = server._apply_specs((entries, None), wav_bits, {4: np.asarray(broken)})
    assert consumed == set()
    assert p.global_tokens is None and p.stream_emitted == 0


def test_spec_two_concurrent_streams_not_garbled(pipe):
    """Two streaming requests admitted together: the speculative planner must
    not misidentify request B as 'first chunk still pending' while B's first
    increment sits unprocessed in the vocode queue (state it would read is
    mutated on the vocode WORKER thread) — that would render B's SECOND
    increment as its first chunk and permanently garble the stream.  The
    planner keys off the event-loop-owned increment count instead; both
    concurrent streams must match the plain path bit-for-bit (greedy pins
    the token streams across batch compositions)."""

    def run(spec):
        # vocode_batch off: whether a chunk renders batched or scalar is
        # timing-dependent and shifts samples by float noise — this test
        # asserts BIT equality of the spec-planner path
        server = ContinuousTTSServer(
            pipe, max_slots=2, steps_per_dispatch=8, greedy=True,
            device_admission=spec, spec_first_chunk=spec, vocode_batch=False,
        )

        async def consume(text, wav):
            chunks = []
            async for c in server.synthesize_streaming(text, prompt_wav=wav):
                chunks.append(c)
            return np.concatenate(chunks) if chunks else np.zeros(0, np.float32)

        async def go():
            await server.start()
            a, b = await asyncio.gather(
                consume("first stream text", _wav(260)),
                consume("second stream text here", _wav(410)),
            )
            await server.stop()
            return a, b

        return asyncio.new_event_loop().run_until_complete(go())

    fast_a, fast_b = run(True)
    plain_a, plain_b = run(False)
    np.testing.assert_array_equal(fast_a, plain_a)
    np.testing.assert_array_equal(fast_b, plain_b)


def test_fused_admission_matches_three_program_chain(pipe):
    """The ONE-dispatch fused admission (tokenize+assembly+prefill inlined,
    lm/continuous.admit_prefill_fused) must produce exactly the audio of the
    three-program device-admission chain, offline AND streaming."""
    fused = ContinuousTTSServer(
        pipe, max_slots=2, steps_per_dispatch=8, greedy=True, fused_warm="sync"
    )
    chain = ContinuousTTSServer(
        pipe, max_slots=2, steps_per_dispatch=8, greedy=True, fused_admission=False
    )

    def run(server):
        async def go():
            await server.start()
            off = await server.synthesize("fused admission", prompt_wav=_wav(330))
            chunks = []
            async for c in server.synthesize_streaming(
                "fused streaming", prompt_wav=_wav(410)
            ):
                chunks.append(c)
            await server.stop()
            return off, np.concatenate(chunks) if chunks else np.zeros(0)

        return asyncio.new_event_loop().run_until_complete(go())

    f_off, f_stream = run(fused)
    c_off, c_stream = run(chain)
    assert fused.stats.get("fused_admissions", 0) == 2, "fused path never ran"
    assert "fused_admissions" not in chain.stats
    np.testing.assert_array_equal(f_off, c_off)
    np.testing.assert_array_equal(f_stream, c_stream)


def test_fused_admission_background_warm(pipe):
    """Default warm policy: a first-seen shape signature takes the chained
    path (no on-loop compile stall) while the fused executable compiles on a
    daemon thread; once warm, the same signature admits fused — and both
    admissions of the same request produce identical audio."""
    server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=8, greedy=True)
    assert server.fused_warm == "background"

    # a COLD shape signature: 2 s prompt wav lands in a wav bucket no other
    # test in this module uses, so neither the engine-local nor the
    # process-global executable cache can satisfy it instantly
    def wav2s():
        sr = 16000
        t = np.arange(2 * sr) / sr
        return 0.3 * np.sin(2 * np.pi * 330.0 * t)

    async def go():
        await server.start()
        first = await server.synthesize("warm me up", prompt_wav=wav2s())
        # the first admission must have fallen back to the chained path
        assert server.stats.get("fused_admissions", 0) == 0
        # wait until the background compile lands (same shapes → same key)
        fn, tok_args, _n, _s = pipe.tokenize_host_prep(wav2s())
        n_glob = pipe.config.bicodec.speaker_encoder.token_num
        _sc, prompt_len, _g, _o = clone_prompt_scaffold(
            pipe.tokenizer, "warm me up", n_glob, 0, None
        )
        bucket = server.engine.prompt_pad
        t_pad = -(-prompt_len // bucket) * bucket
        for _ in range(600):
            if server.engine.fused_ready(tok_args, t_pad):
                break
            await asyncio.sleep(0.05)
        assert server.engine.fused_ready(tok_args, t_pad), "warm never finished"
        second = await server.synthesize("warm me up", prompt_wav=wav2s())
        assert server.stats.get("fused_admissions", 0) == 1
        await server.stop()
        return first, second

    first, second = asyncio.new_event_loop().run_until_complete(go())
    np.testing.assert_array_equal(first, second)


def test_fused_admission_global_token_count_assumption(pipe):
    """The fused path sizes the scaffold from config token_num BEFORE the
    tokenize program runs; that must equal the tokenizer's actual global
    token width."""
    g, _s = pipe.tokenize_audio(_wav(260))
    assert g.shape[1] == pipe.config.bicodec.speaker_encoder.token_num


def test_fused_admission_with_prompt_text(pipe):
    """Prompt-transcript clone (semantic tokens included in the prompt)
    through the fused path matches the host-assembly path."""
    # transcript clones carry the prompt's semantic ids in the prompt, so the
    # tiny default cache (prompt_bucket*4 + budget) is too small — size it up
    fused = ContinuousTTSServer(
        pipe, max_slots=2, steps_per_dispatch=8, greedy=True, cache_len=512,
        fused_warm="sync",
    )
    plain = ContinuousTTSServer(
        pipe, max_slots=2, steps_per_dispatch=8, greedy=True, cache_len=512,
        device_admission=False, spec_first_chunk=False,
    )

    def run(server):
        async def go():
            await server.start()
            wav = await server.synthesize(
                "with transcript", prompt_wav=_wav(330), prompt_text="the prompt says this"
            )
            await server.stop()
            return wav

        return asyncio.new_event_loop().run_until_complete(go())

    np.testing.assert_array_equal(run(fused), run(plain))


def test_fused_exe_shared_across_engines(pipe):
    """The fused-admission executable compiles ONCE per process for a given
    signature: a fresh engine over the same pipeline (bench runs build one
    server per timed run) adopts the already-compiled executable from the
    process-global cache instead of recompiling inside its timed region."""

    def run(server):
        async def go():
            await server.start()
            out = await server.synthesize("shared exe", prompt_wav=_wav(300))
            await server.stop()
            return out

        return asyncio.new_event_loop().run_until_complete(go())

    kw = dict(max_slots=2, steps_per_dispatch=8, greedy=True, fused_warm="sync")
    s1 = ContinuousTTSServer(pipe, **kw)
    w1 = run(s1)
    assert s1.engine._fused_exe, "first server never compiled a fused exe"
    key, exe = next(iter(s1.engine._fused_exe.items()))

    s2 = ContinuousTTSServer(pipe, **kw)
    w2 = run(s2)
    # same signature → the SAME executable object, adopted not recompiled
    assert s2.engine._fused_exe.get(key) is exe
    np.testing.assert_array_equal(w1, w2)
