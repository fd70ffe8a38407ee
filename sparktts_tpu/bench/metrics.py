"""Synthesis quality metrics: mel distance and speaker similarity.

BASELINE.md's parity bar is "mel-distance / speaker-similarity parity vs the
PyTorch fp32 reference".  These metrics make that measurable:

  * `mel_distance`   — L1/L2 distance between log-mel spectrograms (the usual
    mel-cepstral-style reconstruction metric)
  * `speaker_similarity` — cosine similarity of ECAPA x-vectors computed with
    the codec's own speaker encoder weights
"""

from __future__ import annotations

from typing import Literal

import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import MelParams
from sparktts_tpu.dsp.mel import make_mel_basis, mel_spectrogram


def mel_distance(
    wav_a: np.ndarray,
    wav_b: np.ndarray,
    mel_params: MelParams | None = None,
    order: Literal[1, 2] = 1,
    log_floor: float = 1e-5,
) -> float:
    """Mean L1 (or L2) distance between log-mel spectrograms.  Signals are
    truncated to the common length."""
    mel_params = mel_params or MelParams()
    n = min(len(wav_a), len(wav_b))
    if n < mel_params.n_fft:
        raise ValueError("signals too short for a mel frame")
    basis = make_mel_basis(mel_params)
    wavs = jnp.stack(
        [jnp.asarray(wav_a[:n], jnp.float32), jnp.asarray(wav_b[:n], jnp.float32)]
    )
    mels = mel_spectrogram(wavs, basis)
    log_mels = jnp.log(jnp.maximum(mels, log_floor))
    diff = log_mels[0] - log_mels[1]
    if order == 1:
        return float(jnp.mean(jnp.abs(diff)))
    return float(jnp.sqrt(jnp.mean(diff**2)))


def x_vector(pipeline, wav: np.ndarray) -> np.ndarray:
    """ECAPA x-vector of a waveform using the pipeline's speaker encoder."""
    from sparktts_tpu.nn.ecapa import ecapa_tdnn_apply

    cfg = pipeline.config.bicodec
    basis = make_mel_basis(cfg.mel_params)
    mel = mel_spectrogram(jnp.asarray(wav, jnp.float32)[None, :], basis)
    vec, _ = ecapa_tdnn_apply(
        pipeline.bicodec_params["speaker_encoder"]["speaker_encoder"], mel
    )
    return np.asarray(vec[0])


def speaker_similarity(pipeline, wav_a: np.ndarray, wav_b: np.ndarray) -> float:
    """Cosine similarity of x-vectors (1.0 = same-speaker identical)."""
    va, vb = x_vector(pipeline, wav_a), x_vector(pipeline, wav_b)
    denom = np.linalg.norm(va) * np.linalg.norm(vb)
    if denom == 0:
        return 0.0
    return float(np.dot(va, vb) / denom)


def semantic_consistency(pipeline, wav: np.ndarray) -> float:
    """Fraction of semantic tokens preserved by one synthesis round trip:
    tokenize(detokenize(tokenize(wav))) vs tokenize(wav).  An ASR-free proxy
    for the reference benchmark's WER check (no ASR model ships in this
    environment): content-destroying codec/quant regressions drop it."""
    g, s = pipeline.tokenize_audio(np.asarray(wav, np.float32))
    recon = pipeline.detokenize(g, s)
    _, s2 = pipeline.tokenize_audio(recon)
    n = min(s.shape[1], s2.shape[1])
    if n == 0:
        return 0.0
    return float(np.mean(np.asarray(s)[0, :n] == np.asarray(s2)[0, :n]))
