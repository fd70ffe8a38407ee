"""Vocos / ConvNeXt-1D backbone (channels-last).

TPU rebuild of reference `sparktts/modules/blocks/vocos.py:26-335`
(ConvNeXtBlock, AdaLayerNorm, VocosBackbone).  Operating in (B, T, C) means
the two pointwise convs are plain matmuls on the MXU and the depthwise k=7
conv is a cheap VPU op; XLA fuses norm + GELU + layer-scale into them.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sparktts_tpu.nn.layers import (
    ada_layer_norm_apply,
    conv1d_apply,
    gelu,
    init_ada_layer_norm,
    init_conv1d,
    init_layer_norm,
    init_linear,
    layer_norm_apply,
    linear_apply,
)


def init_convnext_block(
    key,
    dim: int,
    intermediate_dim: int,
    layer_scale_init_value: float,
    condition_dim: Optional[int] = None,
):
    k_dw, k_norm, k_pw1, k_pw2 = jax.random.split(key, 4)
    p = {
        "dwconv": init_conv1d(k_dw, dim, dim, 7, groups=dim),
        "pwconv1": init_linear(k_pw1, dim, intermediate_dim),
        "pwconv2": init_linear(k_pw2, intermediate_dim, dim),
    }
    if condition_dim:
        p["norm"] = init_ada_layer_norm(k_norm, condition_dim, dim)
    else:
        p["norm"] = init_layer_norm(dim)
    if layer_scale_init_value > 0:
        p["gamma"] = layer_scale_init_value * jnp.ones((dim,))
    return p


def convnext_block_apply(p, x, cond=None):
    """x: (B, T, C) → (B, T, C) (reference `vocos.py:65-84`)."""
    residual = x
    x = conv1d_apply(p["dwconv"], x, padding=3, groups=x.shape[-1])
    if cond is not None:
        x = ada_layer_norm_apply(p["norm"], x, cond)
    else:
        x = layer_norm_apply(p["norm"], x)
    x = linear_apply(p["pwconv1"], x)
    x = gelu(x)
    x = linear_apply(p["pwconv2"], x)
    if "gamma" in p:
        x = p["gamma"] * x
    return residual + x


def init_vocos_backbone(
    key,
    input_channels: int,
    dim: int,
    intermediate_dim: int,
    num_layers: int,
    layer_scale_init_value: Optional[float] = None,
    condition_dim: Optional[int] = None,
):
    keys = jax.random.split(key, num_layers + 2)
    lsiv = layer_scale_init_value or 1.0 / num_layers
    p = {
        "embed": init_conv1d(keys[0], input_channels, dim, 7),
        "blocks": [
            init_convnext_block(keys[2 + i], dim, intermediate_dim, lsiv, condition_dim)
            for i in range(num_layers)
        ],
        "final_layer_norm": init_layer_norm(dim),
    }
    if condition_dim:
        p["norm"] = init_ada_layer_norm(keys[1], condition_dim, dim)
    else:
        p["norm"] = init_layer_norm(dim)
    return p


def vocos_backbone_apply(p, x, cond=None):
    """x: (B, T, C_in) → (B, T, dim) (reference `vocos.py:324-335`)."""
    x = conv1d_apply(p["embed"], x, padding=3)
    if cond is not None:
        x = ada_layer_norm_apply(p["norm"], x, cond)
    else:
        x = layer_norm_apply(p["norm"], x)
    for blk in p["blocks"]:
        x = convnext_block_apply(blk, x, cond)
    return layer_norm_apply(p["final_layer_norm"], x)
