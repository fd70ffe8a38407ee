"""Numeric tests for the host DSP utilities (volume normalize, silence trim).

The volume-normalize oracle here is written independently of
`sparktts_tpu/io/audio.py` (full-sort formulation vs the library's
partial-partition one) so the test checks the behavior contract, not the
implementation.
"""

import numpy as np
import pytest

from sparktts_tpu.io import audio as A


def _oracle_volume_normalize(audio, coeff=0.2):
    """Sorted-slice formulation of the loudness contract (reference
    `sparktts/utils/audio.py:33-73` semantics)."""
    mags = np.sort(np.abs(audio))
    out = audio
    if mags[-1] < 0.1:
        out = audio / max(mags[-1], 1e-3) * 0.1
    sig = mags[mags > 0.01]
    if sig.size <= 10:
        return out
    band = sig[int(0.9 * sig.size) : int(0.99 * sig.size)]
    out = out * np.clip(coeff / band.mean(), 0.1, 10)
    peak = np.abs(out).max()
    return out / peak if peak > 1 else out


@pytest.mark.parametrize("seed,scale", [(0, 0.5), (1, 0.05), (2, 3.0), (3, 0.008)])
def test_volume_normalize_matches_oracle(seed, scale):
    rng = np.random.default_rng(seed)
    x = scale * rng.standard_normal(16000)
    np.testing.assert_allclose(
        A.audio_volume_normalize(x), _oracle_volume_normalize(x), rtol=1e-10, atol=1e-12
    )


def test_volume_normalize_invariants():
    rng = np.random.default_rng(4)
    x = 0.5 * rng.standard_normal(16000)
    y = A.audio_volume_normalize(x, coeff=0.2)
    assert np.abs(y).max() <= 1.0
    # the 90-99th percentile band of the output should sit near coeff
    sig = np.sort(np.abs(y))
    sig = sig[sig > 0.01]
    band = sig[int(0.9 * sig.size) : int(0.99 * sig.size)]
    assert 0.1 < band.mean() < 0.4


def test_volume_normalize_quiet_input_rescaled_to_point_one():
    x = np.full(100, 0.004)  # peak < 0.1 and too few significant samples
    y = A.audio_volume_normalize(x)
    np.testing.assert_allclose(np.abs(y).max(), 0.1, rtol=1e-12)


def test_volume_normalize_sparse_signal_untouched():
    # fewer than 10 samples above 0.01 and peak >= 0.1: returned unchanged
    x = np.zeros(1000)
    x[::250] = 0.5
    np.testing.assert_array_equal(A.audio_volume_normalize(x), x)


def test_frame_rms_matches_direct_computation():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(4321)
    frame, hop = 160, 16
    got = A.frame_rms(x, frame, hop)
    want = [
        np.sqrt(np.mean(x[s : s + frame] ** 2))
        for s in range(0, len(x) - frame + 1, hop)
    ]
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-9, atol=1e-12)


def _tone_with_silence(sr=16000, lead=0.5, speech=1.0, trail=0.7, amp=0.3):
    t = np.arange(int(speech * sr)) / sr
    tone = amp * np.sin(2 * np.pi * 220.0 * t)
    return np.concatenate(
        [np.zeros(int(lead * sr)), tone, np.zeros(int(trail * sr))]
    ), sr


def test_detect_speech_boundaries_brackets_the_tone():
    wav, sr = _tone_with_silence()
    start, end = A.detect_speech_boundaries(wav, sr)
    # margin is 2 windows = 0.2 s, and a frame overlapping the tone edge by a
    # few samples already clears the threshold, so the bracket can extend one
    # extra window (0.1 s) beyond the margin on each side
    tone_start, tone_end = int(0.5 * sr), int(1.5 * sr)
    assert tone_start - int(0.35 * sr) <= start <= tone_start
    assert tone_end <= end <= tone_end + int(0.35 * sr)


def test_detect_speech_boundaries_all_silence_raises():
    with pytest.raises(ValueError, match="only silence"):
        A.detect_speech_boundaries(np.zeros(16000), 16000)


def test_remove_silence_trims_both_ends():
    wav, sr = _tone_with_silence(lead=0.8, trail=0.9)
    trimmed = A.remove_silence_on_both_ends(wav, sr)
    assert len(trimmed) < len(wav)
    # the trimmed signal keeps (at least) all of the tone's energy
    assert np.sum(trimmed**2) >= 0.999 * np.sum(wav**2)
    # and drops most of the pure-silence padding (keeps <= margin + one
    # window each side)
    assert len(trimmed) <= int((1.0 + 2 * 0.35) * sr)


def test_random_select_audio_segment_length_and_determinism():
    rng = np.random.default_rng(7)
    x = np.arange(1000, dtype=np.float64)
    seg = A.random_select_audio_segment(x, 100, rng=np.random.default_rng(0))
    seg2 = A.random_select_audio_segment(x, 100, rng=np.random.default_rng(0))
    assert seg.shape == (100,)
    np.testing.assert_array_equal(seg, seg2)
    # short input is zero-padded to length
    padded = A.random_select_audio_segment(np.ones(10), 50, rng=rng)
    assert padded.shape == (50,)
    assert padded[:10].sum() == 10


def test_load_audio_remove_silence_and_segment(tmp_path):
    wav, sr = _tone_with_silence()
    p = tmp_path / "tone.wav"
    A.write_wav(p, wav, sr)
    trimmed = A.load_audio(p, sampling_rate=sr, remove_silence=True)
    assert len(trimmed) < len(wav)
    seg = A.load_audio(p, sampling_rate=sr, segment_duration=0.25, rng=np.random.default_rng(0))
    assert seg.shape == (int(0.25 * sr),)
