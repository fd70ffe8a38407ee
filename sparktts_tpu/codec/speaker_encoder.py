"""Speaker encoder: ECAPA x-vector + Perceiver latents + ResidualFSQ tokens.

TPU rebuild of reference `sparktts/modules/speaker/speaker_encoder.py:29-112`.
Global speaker tokens are canonically (B, token_num) int32 here — the
reference's (B, 1, T)/(B, Q, N) transposition dance collapses because
num_quantizers is 1 in every shipped config.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sparktts_tpu.codec.fsq import (
    init_residual_fsq,
    residual_fsq_apply,
    residual_fsq_output_from_indices,
)
from sparktts_tpu.config import SpeakerEncoderConfig
from sparktts_tpu.nn.ecapa import ecapa_tdnn_apply, init_ecapa_tdnn
from sparktts_tpu.nn.layers import init_linear, linear_apply
from sparktts_tpu.nn.perceiver import init_perceiver_resampler, perceiver_resampler_apply


def init_speaker_encoder(key, cfg: SpeakerEncoderConfig):
    k_ecapa, k_perc, k_fsq, k_proj = jax.random.split(key, 4)
    return {
        "speaker_encoder": init_ecapa_tdnn(
            k_ecapa,
            cfg.input_dim,
            cfg.out_dim,
            cfg.ecapa_channels,
            latent_dim=cfg.perceiver_dim_context,
        ),
        "perceiver_sampler": init_perceiver_resampler(
            k_perc,
            dim=cfg.latent_dim,
            dim_context=cfg.perceiver_dim_context,
            num_latents=cfg.token_num,
            depth=cfg.perceiver_depth,
            dim_head=cfg.perceiver_dim_head,
            heads=cfg.perceiver_heads,
            ff_mult=cfg.perceiver_ff_mult,
        ),
        "quantizer": init_residual_fsq(
            k_fsq, cfg.fsq_levels, cfg.fsq_num_quantizers, cfg.latent_dim
        ),
        "project": init_linear(k_proj, cfg.latent_dim * cfg.token_num, cfg.out_dim),
    }


def _latents(p, mels, cfg: SpeakerEncoderConfig) -> Tuple[jax.Array, jax.Array]:
    """mels (B, T, n_mels) → (x_vector, perceiver latents (B, token_num, latent_dim))."""
    x_vector, features = ecapa_tdnn_apply(p["speaker_encoder"], mels)
    latents = perceiver_resampler_apply(p["perceiver_sampler"], features, cfg.perceiver_heads)
    return x_vector, latents


def speaker_encoder_forward(p, mels, cfg: SpeakerEncoderConfig):
    """(x_vector, d_vector) (reference `speaker_encoder.py:81-98`).

    Note: the reference flattens zq channel-first ((latent, token) order,
    `speaker_encoder.py:95`); we flatten (token, latent).  The checkpoint
    converter permutes `project.w` rows to compensate, so d_vectors match.
    """
    x_vector, latents = _latents(p, mels, cfg)
    zq, _ = residual_fsq_apply(p["quantizer"], latents, cfg.fsq_levels, cfg.fsq_num_quantizers)
    d_vector = linear_apply(p["project"], zq.reshape(zq.shape[0], -1))
    return x_vector, d_vector


def speaker_encoder_tokenize(p, mels, cfg: SpeakerEncoderConfig) -> jax.Array:
    """mels (B, T, n_mels) → global token ids (B, token_num) int32
    (reference `speaker_encoder.py:100-105`)."""
    _, latents = _latents(p, mels, cfg)
    _, indices = residual_fsq_apply(p["quantizer"], latents, cfg.fsq_levels, cfg.fsq_num_quantizers)
    return indices[..., 0] if cfg.fsq_num_quantizers == 1 else indices


def speaker_encoder_detokenize(p, indices, cfg: SpeakerEncoderConfig) -> jax.Array:
    """(B, token_num) ids → d_vector (B, out_dim)
    (reference `speaker_encoder.py:107-112`)."""
    if indices.ndim == 2:
        indices = indices[..., None]  # (B, N, Q=1)
    zq = residual_fsq_output_from_indices(
        p["quantizer"], indices, cfg.fsq_levels, cfg.fsq_num_quantizers
    )
    return linear_apply(p["project"], zq.reshape(zq.shape[0], -1))


def speaker_encoder_get_codes_from_indices(p, indices, cfg: SpeakerEncoderConfig):
    """(B, token_num) ids → unprojected scaled codes (B, token_num, levels)
    (API parity with reference `speaker_encoder.py:71-73`)."""
    from sparktts_tpu.codec.fsq import fsq_indices_to_codes, residual_fsq_scales

    if indices.ndim == 2:
        indices = indices[..., None]
    scales = residual_fsq_scales(cfg.fsq_levels, cfg.fsq_num_quantizers)
    total = None
    for q in range(cfg.fsq_num_quantizers):
        codes = fsq_indices_to_codes(indices[..., q], cfg.fsq_levels) * jnp.asarray(scales[q])
        total = codes if total is None else total + codes
    return total


def speaker_encoder_get_indices(p, mels, cfg: SpeakerEncoderConfig) -> jax.Array:
    """mels → quantizer indices (API parity with reference
    `speaker_encoder.py:75-79`)."""
    return speaker_encoder_tokenize(p, mels, cfg)
