"""Longform synthesis: text segmentation, voice-stable multi-segment
synthesis offline and through the continuous server (an ≥ capability — the
reference truncates text at the generation budget)."""

import asyncio

import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.serve.continuous_server import ContinuousTTSServer
from sparktts_tpu.utils.textseg import pack_segments, split_sentences


# ---------------------------------------------------------------- textseg


def test_split_sentences_basic():
    assert split_sentences("One. Two! Three?") == ["One. ", "Two! ", "Three?"]


def test_split_sentences_terminator_runs():
    assert split_sentences("Wait... really?! Yes.") == ["Wait... ", "really?! ", "Yes."]


def test_split_sentences_no_terminator():
    assert split_sentences("no punctuation at all") == ["no punctuation at all"]


def test_split_sentences_cjk():
    assert split_sentences("你好。再见！") == ["你好。", "再见！"]


def test_pack_segments_greedy():
    text = "aaaa. bbbb. cccc. dddd."
    segs = pack_segments(text, max_chars=12)
    assert segs == ["aaaa. bbbb.", "cccc. dddd."]
    # nothing dropped
    assert "".join(segs).replace(" ", "") == text.replace(" ", "")


def test_pack_segments_overlong_sentence_soft_break():
    text = "alpha beta gamma delta epsilon"
    segs = pack_segments(text, max_chars=12)
    assert all(len(s) <= 12 for s in segs)
    assert " ".join(segs) == text


def test_pack_segments_unbroken_run():
    text = "x" * 30
    segs = pack_segments(text, max_chars=12)
    assert segs == ["x" * 12, "x" * 12, "x" * 6]


def test_pack_segments_validates():
    with pytest.raises(ValueError):
        pack_segments("hi", max_chars=0)
    assert pack_segments("", 10) == []
    assert pack_segments("   \n  ", 10) == []


# ------------------------------------------------------------- pipeline


@pytest.fixture(scope="module")
def pipe():
    return SparkTTSPipeline(max_new_tokens=12, prompt_bucket=32)


def _wav(freq=300.0):
    sr = 16000
    t = np.arange(sr) / sr
    return 0.3 * np.sin(2 * np.pi * freq * t)


def test_inference_long_clone_voice_stable(pipe, tmp_path):
    from sparktts_tpu.io.audio import write_wav

    p = tmp_path / "prompt.wav"
    write_wav(p, _wav(), 16000)

    calls = []
    orig = pipe._synthesize_segment

    def spy(text, **kw):
        calls.append(kw)
        return orig(text, **kw)

    pipe._synthesize_segment = spy
    try:
        wav = pipe.inference_long(
            "first sentence here. second sentence here. third sentence here.",
            prompt_speech_path=str(p),
            max_segment_chars=25,
            inter_segment_silence_s=0.05,
        )
    finally:
        pipe._synthesize_segment = orig

    assert len(calls) >= 2
    assert wav.size > 0 and np.isfinite(wav).all()
    # first segment tokenizes the prompt; continuations clone by globals only
    assert calls[0].get("speaker_globals") is None
    first_globals = None
    for kw in calls[1:]:
        g = kw.get("speaker_globals")
        assert g is not None
        if first_globals is None:
            first_globals = np.asarray(g)
        np.testing.assert_array_equal(np.asarray(g), first_globals)
    # inter-segment silence present when ≥2 segments produced audio
    assert wav.size >= int(16000 * 0.05)


def test_inference_long_control_captures_globals(pipe):
    calls = []
    orig = pipe._synthesize_segment

    def spy(text, **kw):
        calls.append(kw)
        return orig(text, **kw)

    pipe._synthesize_segment = spy
    try:
        wav = pipe.inference_long(
            "short one. short two. short three.",
            gender="female",
            pitch="moderate",
            speed="moderate",
            max_segment_chars=12,
        )
    finally:
        pipe._synthesize_segment = orig

    assert len(calls) >= 2
    assert np.isfinite(wav).all()
    assert calls[0].get("gender") == "female"
    # continuations must NOT re-run control mode (voice would resample)
    for kw in calls[1:]:
        assert kw.get("speaker_globals") is not None
        assert kw.get("gender") is None


def test_inference_long_single_segment_passthrough(pipe, tmp_path):
    from sparktts_tpu.io.audio import write_wav

    p = tmp_path / "prompt.wav"
    write_wav(p, _wav(), 16000)
    wav = pipe.inference_long(
        "tiny", prompt_speech_path=str(p), max_segment_chars=400, seed=3
    )
    ref = pipe.inference("tiny", prompt_speech_path=str(p), seed=3)
    np.testing.assert_array_equal(wav, ref)


# ------------------------------------------------- continuous server


def test_streaming_long_clone(pipe):
    async def run():
        server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=4)
        await server.start()
        chunks = []
        async for chunk in server.synthesize_streaming_long(
            "seg one here. seg two here. seg three here.",
            prompt_wav=_wav(260),
            max_segment_chars=14,
            max_new_tokens=10,
        ):
            chunks.append(chunk)
        stats = dict(server.stats)
        await server.stop()
        return chunks, stats

    chunks, stats = asyncio.new_event_loop().run_until_complete(run())
    assert stats.get("longform_segments", 0) >= 2
    assert stats["completed"] == stats["longform_segments"]
    total = np.concatenate(chunks)
    assert total.size > 0 and np.isfinite(total).all()


def test_streaming_long_control_globals_reused(pipe):
    async def run():
        server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=4)
        await server.start()
        admitted = []
        orig = server._admit

        def spy(pending):
            admitted.append(pending)
            return orig(pending)

        server._admit = spy
        chunks = []
        async for chunk in server.synthesize_streaming_long(
            "one two. three four. five six.",
            gender="female",
            pitch="moderate",
            speed="moderate",
            max_segment_chars=10,
            max_new_tokens=10,
        ):
            chunks.append(chunk)
        await server.stop()
        return admitted, chunks

    admitted, chunks = asyncio.new_event_loop().run_until_complete(run())
    assert len(admitted) >= 2
    assert admitted[0].gender == "female" and admitted[0].speaker_globals is None
    for p in admitted[1:]:
        assert p.gender is None and p.speaker_globals is not None
    assert np.isfinite(np.concatenate(chunks)).all()


def test_synthesize_long_offline(pipe):
    async def run():
        server = ContinuousTTSServer(pipe, max_slots=2, steps_per_dispatch=4)
        await server.start()
        wav = await server.synthesize_long(
            text="alpha beta. gamma delta.",
            prompt_wav=_wav(300),
            max_segment_chars=12,
            max_new_tokens=10,
        )
        await server.stop()
        return wav

    wav = asyncio.new_event_loop().run_until_complete(run())
    assert wav.size > 0 and np.isfinite(wav).all()
