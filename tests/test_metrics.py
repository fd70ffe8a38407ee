"""Quality metric tests."""

import numpy as np
import pytest

from sparktts_tpu.bench.metrics import mel_distance, speaker_similarity
from sparktts_tpu.config import MelParams


def _tone(freq, seconds=1.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    return 0.3 * np.sin(2 * np.pi * freq * t)


def test_mel_distance_zero_for_identical():
    wav = _tone(220)
    assert mel_distance(wav, wav, MelParams(num_mels=32)) == 0.0


def test_mel_distance_orders_signals():
    a = _tone(220)
    near = _tone(225)
    far = _tone(880)
    mp = MelParams(num_mels=32)
    assert mel_distance(a, near, mp) < mel_distance(a, far, mp)


def test_mel_distance_l2_geq_l1_monotonicity():
    a, b = _tone(220), _tone(440)
    mp = MelParams(num_mels=32)
    assert mel_distance(a, b, mp, order=2) >= 0
    assert mel_distance(a, b, mp, order=1) > 0


def test_speaker_similarity_bounds():
    from sparktts_tpu.pipeline import SparkTTSPipeline

    pipe = SparkTTSPipeline(max_new_tokens=8)
    a, b = _tone(220), _tone(700)
    s_same = speaker_similarity(pipe, a, a)
    s_diff = speaker_similarity(pipe, a, b)
    assert s_same == pytest.approx(1.0, abs=1e-4)
    assert -1.0 <= s_diff <= 1.0
    assert s_diff < s_same


def test_semantic_consistency():
    """Round-trip token preservation metric: 1.0 when detokenize→tokenize
    reproduces the token stream, and bounded in [0, 1]."""
    from sparktts_tpu.bench.metrics import semantic_consistency
    from sparktts_tpu.pipeline import SparkTTSPipeline

    pipe = SparkTTSPipeline(max_new_tokens=16, prompt_bucket=32)
    rng = np.random.default_rng(3)
    wav = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    v = semantic_consistency(pipe, wav)
    assert 0.0 <= v <= 1.0
