"""Feat decoder (prenet/postnet): latents → features with optional AdaLN
speaker conditioning.

TPU rebuild of reference `sparktts/modules/encoder_decoder/feat_decoder.py`.
Channels-last: (B, T, input_channels) → (B, T * prod(ratios), out_channels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparktts_tpu.config import DecoderConfig
from sparktts_tpu.nn.layers import init_linear, linear_apply
from sparktts_tpu.nn.sampling import init_sampling_block, sampling_block_apply
from sparktts_tpu.nn.vocos import init_vocos_backbone, vocos_backbone_apply


def init_feat_decoder(key, cfg: DecoderConfig):
    keys = jax.random.split(key, 3 + 2 * len(cfg.sample_ratios))
    return {
        "linear_pre": init_linear(keys[0], cfg.input_channels, cfg.vocos_dim),
        "upsample": [
            {
                "sampler": init_sampling_block(
                    keys[3 + 2 * i], cfg.vocos_dim, groups=cfg.vocos_dim, upsample_scale=ratio
                ),
                "vocos": init_vocos_backbone(
                    keys[4 + 2 * i],
                    cfg.vocos_dim,
                    cfg.vocos_dim,
                    cfg.vocos_intermediate_dim,
                    2,
                ),
            }
            for i, ratio in enumerate(cfg.sample_ratios)
        ],
        "vocos_backbone": init_vocos_backbone(
            keys[1],
            cfg.vocos_dim,
            cfg.vocos_dim,
            cfg.vocos_intermediate_dim,
            cfg.vocos_num_layers,
            condition_dim=cfg.condition_dim,
        ),
        "linear": init_linear(keys[2], cfg.vocos_dim, cfg.out_channels),
    }


def feat_decoder_apply(p, x, cfg: DecoderConfig, cond=None):
    """x: (B, T, input_channels), cond: (B, condition_dim) or None
    → (B, T', out_channels) (reference `feat_decoder.py:78-94`)."""
    x = linear_apply(p["linear_pre"], x)
    for stage, ratio in zip(p["upsample"], cfg.sample_ratios):
        x = sampling_block_apply(
            stage["sampler"], x, cfg.vocos_dim, cfg.vocos_dim, upsample_scale=ratio
        )
        x = vocos_backbone_apply(stage["vocos"], x)
    x = vocos_backbone_apply(p["vocos_backbone"], x, cond)
    x = linear_apply(p["linear"], x)
    if cfg.use_tanh_at_final:
        x = jnp.tanh(x)
    return x
