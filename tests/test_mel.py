"""Mel frontend parity: framed matmul-RFFT vs torch.stft reference semantics."""

import jax.numpy as jnp
import numpy as np
import torch

from sparktts_tpu.config import MelParams
from sparktts_tpu.dsp import mel as M


def _torch_stft_mag(wav: np.ndarray, p: MelParams) -> np.ndarray:
    """torch.stft magnitude the way torchaudio.Spectrogram(power=1) computes it."""
    x = torch.from_numpy(wav).float()
    window = torch.hann_window(p.win_length, periodic=True)
    spec = torch.stft(
        x,
        n_fft=p.n_fft,
        hop_length=p.hop_length,
        win_length=p.win_length,
        window=window,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    return spec.abs().numpy()  # (B, n_freqs, frames)


def test_stft_magnitude_matches_torch():
    rng = np.random.default_rng(0)
    p = MelParams()
    wav = rng.standard_normal((2, 16000)).astype(np.float32)
    ref = _torch_stft_mag(wav, p)

    basis = M.make_mel_basis(p)
    frames = M.frame_signal(jnp.asarray(wav), basis.n_fft, basis.hop_length)
    frames = frames * jnp.asarray(basis.window)
    real = jnp.matmul(frames, jnp.asarray(basis.rfft_real))
    imag = jnp.matmul(frames, jnp.asarray(basis.rfft_imag))
    mag = np.asarray(jnp.sqrt(real**2 + imag**2))  # (B, frames, n_freqs)

    assert mag.shape == (2, ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(np.transpose(mag, (0, 2, 1)), ref, rtol=1e-3, atol=1e-3)


def test_rfft_matrices_match_numpy_fft():
    p = MelParams()
    basis = M.make_mel_basis(p)
    rng = np.random.default_rng(1)
    frame = rng.standard_normal(p.n_fft)
    ref = np.fft.rfft(frame)
    real = frame @ basis.rfft_real
    imag = frame @ basis.rfft_imag
    np.testing.assert_allclose(real, ref.real, atol=1e-2)
    np.testing.assert_allclose(imag, ref.imag, atol=1e-2)


def test_mel_filterbank_properties():
    p = MelParams()
    fb = M.mel_filterbank(p.n_fft // 2 + 1, p.mel_fmin, 8000.0, p.num_mels, p.sample_rate)
    assert fb.shape == (513, 128)
    # every filter has support, non-negative, unimodal triangles
    assert (fb >= 0).all()
    assert (fb.sum(axis=0) > 0).all()
    # slaney normalization: peak height shrinks as bandwidth grows
    peaks = fb.max(axis=0)
    assert peaks[0] > peaks[-1]


def test_mel_spectrogram_shapes_and_finite():
    p = MelParams()
    basis = M.make_mel_basis(p)
    wav = jnp.asarray(np.random.default_rng(2).standard_normal((1, 96000)), dtype=jnp.float32)
    mel = M.mel_spectrogram(wav, basis)
    # center=True: frames = 1 + T // hop
    assert mel.shape == (1, 1 + 96000 // p.hop_length, p.num_mels)
    assert np.isfinite(np.asarray(mel)).all()
