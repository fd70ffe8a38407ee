"""Host-side audio I/O and DSP.

Pure-numpy reimplementation of the reference's host audio path (reference
`sparktts/utils/audio.py:33-271`).  The reference uses soundfile (libsndfile)
for I/O and soxr VHQ for resampling; here we use scipy's wav reader and a
kaiser-windowed polyphase resampler — both host-side and off the TPU hot path.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple, Union

import numpy as np

PathLike = Union[str, Path]


def read_wav(path: PathLike) -> Tuple[np.ndarray, int]:
    """Read a wav file to float64 mono in [-1, 1].  First channel only, like
    the reference (`audio.py:97-99`).  Uses the native C++ reader when built
    (`csrc/sparktts_audio.cpp`), scipy otherwise."""
    from sparktts_tpu.io import native

    res = native.read_wav(path)
    if res is not None:
        return res

    from scipy.io import wavfile

    sr, data = wavfile.read(str(path))
    if data.ndim > 1:
        data = data[:, 0]
    if data.dtype == np.int16:
        audio = data.astype(np.float64) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float64) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float64) - 128.0) / 128.0
    else:  # float32/float64 wavs
        audio = data.astype(np.float64)
    return audio, int(sr)


def write_wav(path: PathLike, audio: np.ndarray, sample_rate: int) -> None:
    """Write float audio in [-1, 1] as 16-bit PCM wav (native writer when
    available)."""
    from sparktts_tpu.io import native

    if native.write_wav(path, np.asarray(audio, dtype=np.float64), sample_rate):
        return

    from scipy.io import wavfile

    audio = np.asarray(audio, dtype=np.float64)
    clipped = np.clip(audio, -1.0, 1.0)
    wavfile.write(str(path), sample_rate, (clipped * 32767.0).astype(np.int16))


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample (stand-in for soxr VHQ, reference `audio.py:102`)."""
    if orig_sr == target_sr:
        return audio
    from math import gcd

    g = gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g

    from sparktts_tpu.io import native

    res = native.resample(audio, up, down)
    if res is not None:
        return res

    from scipy.signal import resample_poly

    return resample_poly(audio, up, down)


def audio_volume_normalize(audio: np.ndarray, coeff: float = 0.2) -> np.ndarray:
    """Top-decile volume normalization (parity with reference `audio.py:33-73`)."""
    temp = np.sort(np.abs(audio))

    if temp[-1] < 0.1:
        scaling_factor = max(temp[-1], 1e-3)
        audio = audio / scaling_factor * 0.1

    temp = temp[temp > 0.01]
    L = temp.shape[0]
    if L <= 10:
        return audio

    volume = np.mean(temp[int(0.9 * L) : int(0.99 * L)])
    audio = audio * np.clip(coeff / volume, a_min=0.1, a_max=10)

    max_value = np.max(np.abs(audio))
    if max_value > 1:
        audio = audio / max_value
    return audio


def load_audio(
    adfile: PathLike,
    sampling_rate: int | None = None,
    length: int | None = None,
    volume_normalize: bool = False,
) -> np.ndarray:
    """Load + resample + (optionally) volume-normalize, matching the behavior
    of reference `audio.py:76-119`."""
    audio, sr = read_wav(adfile)
    if sampling_rate is not None and sr != sampling_rate:
        audio = resample(audio, sr, sampling_rate)
        sr = sampling_rate
    if volume_normalize:
        audio = audio_volume_normalize(audio)
    if length is not None:
        assert abs(audio.shape[0] - length) < 1000
        if audio.shape[0] > length:
            audio = audio[:length]
        else:
            audio = np.pad(audio, (0, int(length - audio.shape[0])))
    return audio


def get_ref_clip(
    wav: np.ndarray, sample_rate: int, ref_segment_duration: float, latent_hop_length: int
) -> np.ndarray:
    """6 s reference clip, tiled if the wav is shorter, truncated to a multiple
    of the latent hop (parity with reference `audio_tokenizer.py:57-70`)."""
    ref_segment_length = (
        int(sample_rate * ref_segment_duration) // latent_hop_length * latent_hop_length
    )
    wav_length = len(wav)
    if ref_segment_length > wav_length:
        wav = np.tile(wav, ref_segment_length // wav_length + 1)
    return wav[:ref_segment_length]


def detect_speech_boundaries(
    wav: np.ndarray,
    sample_rate: int,
    window_duration: float = 0.1,
    energy_threshold: float = 0.01,
    margin_factor: int = 2,
) -> Tuple[int, int]:
    """RMS-energy speech boundary detection (parity with reference
    `audio.py:186-225`)."""
    from numpy.lib.stride_tricks import sliding_window_view

    window_size = int(window_duration * sample_rate)
    margin = margin_factor * window_size
    step_size = window_size // 10

    windows = sliding_window_view(wav, window_size)[::step_size]
    energy = np.sqrt(np.mean(windows**2, axis=1))
    speech_mask = energy >= energy_threshold

    if not np.any(speech_mask):
        raise ValueError("No speech detected in audio (only silence)")

    start = max(0, np.argmax(speech_mask) * step_size - margin)
    end = min(
        len(wav),
        (len(speech_mask) - 1 - np.argmax(speech_mask[::-1])) * step_size + margin,
    )
    return start, end


def remove_silence_on_both_ends(
    wav: np.ndarray,
    sample_rate: int,
    window_duration: float = 0.1,
    volume_threshold: float = 0.01,
) -> np.ndarray:
    start, end = detect_speech_boundaries(wav, sample_rate, window_duration, volume_threshold)
    return wav[start:end]
