"""Streaming synthesis tests: chunk schedule, cross-fade, end-to-end stream
equivalence with the tiny pipeline."""

import numpy as np
import pytest

from sparktts_tpu.config import StreamingConfig
from sparktts_tpu.serve.streaming import (
    StreamingSynthesizer,
    chunk_sizes,
    cross_fade,
    overlap_tokens,
)


def test_chunk_schedule_matches_reference():
    # reference run.sh defaults: 1 s start, ×8, cap 30 s, 50 Hz
    cfg = StreamingConfig()
    gen = chunk_sizes(cfg)
    assert next(gen) == 50
    assert next(gen) == 400
    assert next(gen) == 1500  # capped at 30 s * 50
    assert next(gen) == 1500
    assert overlap_tokens(cfg) == 5


def test_cross_fade_energy_preserving():
    prev = np.ones(100, np.float32)
    nxt = np.ones(80, np.float32)
    emit, carry = cross_fade(prev, nxt, 10)
    # constant signal should stay constant through the fade
    np.testing.assert_allclose(emit, 1.0, atol=1e-6)
    assert len(emit) == 100
    assert len(carry) == 70


def test_cross_fade_zero_overlap():
    prev = np.ones(10, np.float32)
    nxt = np.zeros(5, np.float32)
    emit, carry = cross_fade(prev, nxt, 0)
    assert len(emit) == 10 and len(carry) == 5


@pytest.fixture(scope="module")
def pipe():
    from sparktts_tpu.pipeline import SparkTTSPipeline

    return SparkTTSPipeline(max_new_tokens=40, prompt_bucket=32)


@pytest.fixture(scope="module")
def prompt_wav(tmp_path_factory):
    from sparktts_tpu.io.audio import write_wav

    sr = 16000
    t = np.arange(sr) / sr
    wav = 0.3 * np.sin(2 * np.pi * 330 * t)
    path = tmp_path_factory.mktemp("audio") / "p.wav"
    write_wav(path, wav, sr)
    return path


def test_stream_produces_audio(pipe, prompt_wav):
    # fast schedule so the tiny model emits multiple chunks
    scfg = StreamingConfig(
        audio_chunk_duration=0.2,  # 10 tokens
        max_audio_chunk_duration=1.0,
        audio_chunk_size_scale_factor=2.0,
        audio_chunk_overlap_duration=0.04,  # 2 tokens
    )
    syn = StreamingSynthesizer(pipe, scfg, steps_per_dispatch=8)
    chunks = list(syn.stream("hello", prompt_speech_path=prompt_wav, seed=0))
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert np.isfinite(total).all()
    assert len(total) > 0
