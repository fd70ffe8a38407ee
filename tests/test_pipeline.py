"""End-to-end pipeline tests with the tiny config: voice cloning + controllable
modes, prompt building, and token extraction (reference `cli/SparkTTS.py`
behaviors with random weights + the synthetic tokenizer)."""

import numpy as np
import pytest

from sparktts_tpu.pipeline import SparkTTSPipeline
from sparktts_tpu.prompt import (
    SyntheticSparkTokenizer,
    build_clone_prompt,
    build_control_prompt,
    extract_global_ids,
    extract_semantic_ids,
)


@pytest.fixture(scope="module")
def pipe():
    return SparkTTSPipeline(max_new_tokens=24, prompt_bucket=32)


@pytest.fixture(scope="module")
def prompt_wav(tmp_path_factory):
    from sparktts_tpu.io.audio import write_wav

    sr = 16000
    t = np.arange(int(1.5 * sr)) / sr
    wav = 0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    path = tmp_path_factory.mktemp("audio") / "prompt.wav"
    write_wav(path, wav, sr)
    return path


def test_tokenizer_roundtrip():
    tok = SyntheticSparkTokenizer(n_semantic=64, n_global=64)
    s = "<|task_tts|><|start_content|>hello world<|end_content|><|bicodec_semantic_5|><|bicodec_global_7|>"
    ids = tok.encode(s)
    assert tok.decode(ids) == s
    assert tok.token_id("<|bicodec_semantic_5|>") == tok.semantic_base + 5


def test_prompt_builders_and_extraction():
    tok = SyntheticSparkTokenizer(n_semantic=64, n_global=64)
    g = np.array([1, 2, 3])
    s = np.array([10, 11, 12, 13])
    ids = np.array(build_clone_prompt(tok, "hi", g, s, prompt_text="yo"))
    np.testing.assert_array_equal(extract_global_ids(tok, ids), g)
    np.testing.assert_array_equal(extract_semantic_ids(tok, ids), s)

    ids2 = build_control_prompt(tok, "hi", "female", "moderate", "high")
    assert extract_semantic_ids(tok, np.array(ids2)).size == 0


def test_tokenize_audio_shapes(pipe, prompt_wav):
    global_t, semantic = pipe.tokenize_audio(prompt_wav)
    assert global_t.shape == (1, pipe.config.bicodec.speaker_encoder.token_num)
    # exact contract: wav2vec2 conv frames ÷ encoder downsample
    from sparktts_tpu.nn.wav2vec2 import feature_lengths

    expected = feature_lengths(pipe.config.wav2vec2, int(1.5 * 16000)) // pipe._enc_ratio
    assert semantic.shape[1] == expected
    assert semantic.min() >= 0
    assert semantic.max() < pipe.config.bicodec.quantizer.codebook_size


def test_detokenize_length(pipe):
    n = 13
    sem = np.random.default_rng(0).integers(0, 64, size=(1, n)).astype(np.int32)
    glob = np.zeros((1, pipe.config.bicodec.speaker_encoder.token_num), np.int32)
    wav = pipe.detokenize(glob, sem)
    assert wav.shape == (n * pipe._wave_upsample,)
    assert np.isfinite(wav).all()


def test_inference_voice_clone(pipe, prompt_wav):
    wav = pipe.inference("hello there", prompt_speech_path=prompt_wav, seed=1)
    assert wav.dtype == np.float32
    assert np.isfinite(wav).all()


def test_inference_voice_clone_with_prompt_text(pipe, prompt_wav):
    wav = pipe.inference(
        "hello there", prompt_speech_path=prompt_wav, prompt_text="prompt transcript", seed=2
    )
    assert np.isfinite(wav).all()


def test_inference_controllable(pipe):
    wav = pipe.inference("hello there", gender="female", pitch="moderate", speed="moderate", seed=3)
    assert np.isfinite(wav).all()


def test_greedy_inference_deterministic(pipe, prompt_wav):
    w1 = pipe.inference("same text", prompt_speech_path=prompt_wav, greedy=True)
    w2 = pipe.inference("same text", prompt_speech_path=prompt_wav, greedy=True)
    np.testing.assert_array_equal(w1, w2)


def test_tokenize_audio_batch_matches_single(pipe, prompt_wav):
    from sparktts_tpu.io.audio import load_audio

    wav1 = load_audio(prompt_wav, sampling_rate=16000, volume_normalize=True)
    wav2 = wav1[: len(wav1) // 2]
    out = pipe.tokenize_audio_batch([wav1, wav2])
    assert len(out) == 2
    g1, s1 = out[0]
    g2, s2 = out[1]
    # single-path result for the longer wav must match the batch result
    g_ref, s_ref = pipe.tokenize_audio(wav1)
    np.testing.assert_array_equal(g1, g_ref)
    # both paths mask padded frames and share the pad length → exact match
    np.testing.assert_array_equal(s1, s_ref)
    assert s2.shape[1] < s1.shape[1]


def test_speculative_pipeline_end_to_end(prompt_wav):
    """speculative_k > 0 routes generation through draft-and-verify; greedy
    output must equal the vanilla pipeline's greedy output exactly."""
    from sparktts_tpu.pipeline import SparkTTSPipeline

    base = SparkTTSPipeline(max_new_tokens=16, prompt_bucket=32)
    spec = SparkTTSPipeline(
        max_new_tokens=16, prompt_bucket=32, speculative_k=3, draft_layers=1
    )
    w1 = base.inference("spec check", prompt_speech_path=prompt_wav, greedy=True)
    w2 = spec.inference("spec check", prompt_speech_path=prompt_wav, greedy=True)
    np.testing.assert_array_equal(w1, w2)

    # sampled path runs end-to-end and produces audio
    w3 = spec.inference("spec check", prompt_speech_path=prompt_wav, seed=1)
    assert np.isfinite(w3).all() and len(w3) > 0
