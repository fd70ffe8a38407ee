"""Feat encoder: wav2vec2 features → quantizer-ready latents.

TPU rebuild of reference `sparktts/modules/encoder_decoder/feat_encoder.py`.
Channels-last throughout: (B, T, 1024) → (B, T / prod(ratios), out_channels).
"""

from __future__ import annotations

import jax

from sparktts_tpu.config import EncoderConfig
from sparktts_tpu.nn.layers import init_linear, linear_apply
from sparktts_tpu.nn.sampling import init_sampling_block, sampling_block_apply
from sparktts_tpu.nn.vocos import init_vocos_backbone, vocos_backbone_apply


def init_feat_encoder(key, cfg: EncoderConfig):
    keys = jax.random.split(key, 2 + 2 * len(cfg.sample_ratios))
    p = {
        "encoder": init_vocos_backbone(
            keys[0],
            cfg.input_channels,
            cfg.vocos_dim,
            cfg.vocos_intermediate_dim,
            cfg.vocos_num_layers,
        ),
        "downsample": [
            {
                "sampler": init_sampling_block(
                    keys[2 + 2 * i], cfg.vocos_dim, groups=cfg.vocos_dim, downsample_scale=ratio
                ),
                "vocos": init_vocos_backbone(
                    keys[3 + 2 * i],
                    cfg.vocos_dim,
                    cfg.vocos_dim,
                    cfg.vocos_intermediate_dim,
                    2,
                ),
            }
            for i, ratio in enumerate(cfg.sample_ratios)
        ],
        "project": init_linear(keys[1], cfg.vocos_dim, cfg.out_channels),
    }
    return p


def feat_encoder_apply(p, x, cfg: EncoderConfig):
    """x: (B, T, input_channels) → (B, T', out_channels)
    (reference `feat_encoder.py:76-87`)."""
    x = vocos_backbone_apply(p["encoder"], x)
    for stage, ratio in zip(p["downsample"], cfg.sample_ratios):
        x = sampling_block_apply(
            stage["sampler"], x, cfg.vocos_dim, cfg.vocos_dim, downsample_scale=ratio
        )
        x = vocos_backbone_apply(stage["vocos"], x)
    return linear_apply(p["project"], x)
