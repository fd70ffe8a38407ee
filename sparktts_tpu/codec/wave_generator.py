"""WaveGenerator vocoder: DAC-style transposed-conv upsampling stack.

TPU rebuild of reference `sparktts/modules/encoder_decoder/wave_generator.py`
and its Snake/ResidualUnit layers (`blocks/layers.py:24-73`).  Channels-last;
weight norm folded at load.  This is the second-hottest path after LLM decode
(×prod(rates) upsampling, e.g. ×320), so everything is expressed as
NWC convs + elementwise snake that XLA fuses.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from sparktts_tpu.config import WaveGeneratorConfig
from sparktts_tpu.nn.layers import (
    conv1d_apply,
    conv_transpose1d_apply,
    init_conv1d,
    init_conv_transpose1d,
    init_snake,
    snake_apply,
)


DILATIONS = (1, 3, 9)  # reference `wave_generator.py:47-49`


def _init_residual_unit(key, dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "snake1": init_snake(dim),
        "conv1": init_conv1d(k1, dim, dim, 7),
        "snake2": init_snake(dim),
        "conv2": init_conv1d(k2, dim, dim, 1),
    }


def _vocoder_kernel_mode() -> str:
    """ResidualUnit implementation: 'xla' (snake + shifted-matmul convs),
    'carry' (fused Pallas unit reading x from HBM exactly once — the halo
    strip rides VMEM scratch across grid steps), or 'tiles' (fused unit,
    prev/cur/next tile reads).  Both kernels collapse the XLA path's one HBM
    round-trip per op/tap into a single pass — the bandwidth fix for the
    late decoder blocks (kernels/vocoder_fusion.py).

    SPARKTTS_VOCODER_KERNEL=1/carry/tiles/0 forces; 'auto' (default)
    selects XLA everywhere: the 2026-08-19 v5e A/B measured both fused
    variants ~20% SLOWER than the shifted-matmul XLA path on the late
    decoder blocks (full vocoder 13.5 ms XLA vs 16.2/16.5 ms carry/tiles —
    BENCH_NOTES "Fused vocoder ResidualUnit kernel").  Parity is pinned by
    tests/test_vocoder_kernel.py; kept for future hardware generations."""
    v = os.environ.get("SPARKTTS_VOCODER_KERNEL", "auto").lower()
    if v in ("1", "true", "kernel", "carry"):
        return "carry"
    if v == "tiles":
        return "tiles"
    return "xla"


def _residual_unit_apply(p, x, dilation: int):
    """Snake → dilated conv k7 → Snake → conv k1, residual
    (reference `layers.py:51-67`; padding preserves length so no crop)."""
    mode = _vocoder_kernel_mode()
    if mode != "xla" and "w" in p["conv1"]:
        from sparktts_tpu.kernels.vocoder_fusion import fused_residual_unit

        return fused_residual_unit(p, x, dilation, variant=mode)
    y = snake_apply(p["snake1"], x)
    y = conv1d_apply(p["conv1"], y, padding=3 * dilation, dilation=dilation)
    y = snake_apply(p["snake2"], y)
    y = conv1d_apply(p["conv2"], y)
    return x + y


def _init_decoder_block(key, input_dim: int, output_dim: int, kernel_size: int):
    k_up, k_r1, k_r2, k_r3 = jax.random.split(key, 4)
    return {
        "snake": init_snake(input_dim),
        "upsample": init_conv_transpose1d(k_up, input_dim, output_dim, kernel_size),
        "res_units": [_init_residual_unit(k, output_dim) for k in (k_r1, k_r2, k_r3)],
    }


def _decoder_block_apply(p, x, kernel_size: int, stride: int):
    """(reference `wave_generator.py:29-53`)."""
    y = snake_apply(p["snake"], x)
    y = conv_transpose1d_apply(
        p["upsample"], y, stride=stride, padding=(kernel_size - stride) // 2
    )
    for ru, dil in zip(p["res_units"], DILATIONS):
        y = _residual_unit_apply(ru, y, dil)
    return y


def init_wave_generator(key, cfg: WaveGeneratorConfig):
    n_blocks = len(cfg.rates)
    keys = jax.random.split(key, n_blocks + 2)
    blocks = []
    output_dim = cfg.channels
    for i, kernel_size in enumerate(cfg.kernel_sizes):
        input_dim = cfg.channels // 2**i
        output_dim = cfg.channels // 2 ** (i + 1)
        blocks.append(_init_decoder_block(keys[1 + i], input_dim, output_dim, kernel_size))
    return {
        "conv_in": init_conv1d(keys[0], cfg.input_channel, cfg.channels, 7),
        "blocks": blocks,
        "snake_out": init_snake(output_dim),
        "conv_out": init_conv1d(keys[-1], output_dim, cfg.d_out, 7),
    }


def wave_generator_apply(p, x, cfg: WaveGeneratorConfig = None):
    """x: (B, T, input_channel) → (B, T * prod(rates), d_out) waveform in
    [-1, 1] (reference `wave_generator.py:56-88`)."""
    if cfg is None:
        raise ValueError("wave_generator_apply requires cfg for static rates")
    x = conv1d_apply(p["conv_in"], x, padding=3)
    for blk, k, s in zip(p["blocks"], cfg.kernel_sizes, cfg.rates):
        x = _decoder_block_apply(blk, x, k, s)
    x = snake_apply(p["snake_out"], x)
    x = conv1d_apply(p["conv_out"], x, padding=3)
    return jnp.tanh(x)
