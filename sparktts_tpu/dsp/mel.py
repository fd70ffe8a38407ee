"""On-device mel spectrogram as a framed matmul-RFFT.

TPU-native replacement for the reference's torchaudio MelSpectrogram frontend
(reference `sparktts/models/bicodec.py:191-211`: power=1, slaney norm, slaney
mel scale, center=True, reflect pad).  The frame → window → RFFT-by-matmul →
mel-filterbank decomposition keeps the whole transform inside one XLA program
and puts the FLOPs on the MXU; the reference itself validates this exact
recipe in its ONNX export wrapper (`export_sparktts_onnx.py:123-212`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import MelParams


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))


def _hz_to_mel_slaney(freq):
    """Slaney-style hz→mel: linear below 1 kHz, log above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """Slaney-normalized slaney-scale triangular filterbank, (n_freqs, n_mels).

    Matches torchaudio.functional.melscale_fbanks(norm='slaney',
    mel_scale='slaney') used by the reference mel transform."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)

    m_min = _hz_to_mel_slaney(f_min)
    m_max = _hz_to_mel_slaney(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    # slaney normalization: scale each filter by 2 / bandwidth
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb


class MelBasis(NamedTuple):
    """Precomputed constants for the on-device mel transform."""

    window: np.ndarray        # (n_fft,) — win_length window center-padded to n_fft
    rfft_real: np.ndarray     # (n_fft, n_freqs)
    rfft_imag: np.ndarray     # (n_fft, n_freqs)
    mel_fb: np.ndarray        # (n_freqs, n_mels)
    n_fft: int
    hop_length: int


@functools.lru_cache(maxsize=8)
def make_mel_basis(params: MelParams) -> MelBasis:
    n_fft = params.n_fft
    n_freqs = n_fft // 2 + 1
    f_max = params.mel_fmax if params.mel_fmax is not None else params.sample_rate / 2.0

    # torch.stft center-pads the window to n_fft and frames with length n_fft.
    win = hann_window(params.win_length)
    left = (n_fft - params.win_length) // 2
    window = np.zeros(n_fft)
    window[left : left + params.win_length] = win

    k = np.arange(n_freqs)[:, None]
    n = np.arange(n_fft)[None, :]
    angle = -2.0 * np.pi * k * n / n_fft
    rfft_real = np.cos(angle).T  # (n_fft, n_freqs)
    rfft_imag = np.sin(angle).T

    mel_fb = mel_filterbank(n_freqs, params.mel_fmin, f_max, params.num_mels, params.sample_rate)

    return MelBasis(
        window=window.astype(np.float32),
        rfft_real=rfft_real.astype(np.float32),
        rfft_imag=rfft_imag.astype(np.float32),
        mel_fb=mel_fb.astype(np.float32),
        n_fft=n_fft,
        hop_length=params.hop_length,
    )


def frame_signal(wav: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """(B, T) → (B, num_frames, n_fft) with center=True reflect padding."""
    pad = n_fft // 2
    wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    t_padded = wav.shape[1]
    num_frames = (t_padded - n_fft) // hop_length + 1
    # Gather frames as a strided slice stack; XLA fuses this into the matmul.
    starts = np.arange(num_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]  # (F, n_fft) static
    return wav[:, idx]


def mel_spectrogram(wav: jax.Array, basis: MelBasis) -> jax.Array:
    """(B, T) float32 → (B, num_frames, n_mels) magnitude mel (power=1).

    Equivalent to the reference mel transform transposed to channels-last; the
    reference's (B, n_mels, T) layout is `out.transpose(1, 2)`.
    """
    frames = frame_signal(wav.astype(jnp.float32), basis.n_fft, basis.hop_length)
    frames = frames * jnp.asarray(basis.window)
    real = jnp.matmul(frames, jnp.asarray(basis.rfft_real), precision=jax.lax.Precision.HIGHEST)
    imag = jnp.matmul(frames, jnp.asarray(basis.rfft_imag), precision=jax.lax.Precision.HIGHEST)
    magnitude = jnp.sqrt(real * real + imag * imag + 1e-12)
    return jnp.matmul(magnitude, jnp.asarray(basis.mel_fb), precision=jax.lax.Precision.HIGHEST)
