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


def test_chunk_boundary_quality_vs_full_context_vocode(pipe, prompt_wav):
    """VERDICT weak-7: the streaming path vocodes each chunk with only
    `overlap` tokens of left context and hides the seam with a cross-fade.
    Measure the boundary artifact: streamed audio vs one full-context vocode
    of the SAME token sequence must stay within a small log-mel distance."""
    from sparktts_tpu.bench.metrics import mel_distance
    from sparktts_tpu.prompt import build_clone_prompt, extract_semantic_ids

    from sparktts_tpu.io.audio import write_wav

    scfg = StreamingConfig(
        audio_chunk_duration=0.2,        # 10 tokens per chunk → several seams
        max_audio_chunk_duration=0.4,
        audio_chunk_size_scale_factor=2.0,
        audio_chunk_overlap_duration=0.04,  # 2 tokens
    )
    # noise prompt: a pure tone can tokenize to the FSQ mid-code global token,
    # whose code vector is exactly 0 — at random init that zeroes the whole
    # waveform (zero AdaLN biases) and makes every distance vacuously 0
    rng = np.random.default_rng(41)
    noise = (0.3 * rng.standard_normal(16000)).astype(np.float32)
    noise_path = prompt_wav.parent / "noise.wav"
    write_wav(noise_path, noise, 16000)

    syn = StreamingSynthesizer(pipe, scfg, steps_per_dispatch=8)
    chunks = list(syn.stream("hello world", prompt_speech_path=noise_path, seed=3))
    assert len(chunks) >= 3, "need multiple chunks to exercise seams"
    streamed = np.concatenate(chunks)

    # reproduce the identical token sequence offline (same prompt, same rng
    # threading through prefill/decode), then vocode it in ONE call
    tok = pipe.tokenizer
    g, s = pipe.tokenize_audio(noise_path)
    ids = build_clone_prompt(tok, "hello world", g, None, None)
    gen = pipe.generate_tokens(ids, seed=3)
    sem = extract_semantic_ids(tok, gen)
    full = pipe.detokenize(g, sem[None, :])
    assert np.abs(full).max() > 0, "degenerate (all-zero) vocode — test is vacuous"

    # streamed output covers the same tokens end-to-end, sample-exact in
    # length (no duplicated or dropped seam audio)
    assert len(streamed) == len(full)
    d = mel_distance(streamed, full, pipe.config.bicodec.mel_params)
    # identical vocode would be 0; seams with 2 tokens of left context must
    # stay small relative to typical inter-utterance distances (~1.0+).
    # measured 0.035 at random init — 0.1 leaves margin without going vacuous
    assert d < 0.1, f"chunk-boundary mel distance too high: {d}"
