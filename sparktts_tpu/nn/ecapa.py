"""ECAPA-TDNN speaker x-vector network (channels-last).

TPU rebuild of reference `sparktts/modules/speaker/ecapa_tdnn.py:28-250` with
the ASTP pooling of `pooling_layers.py:92-149` (global-context variant, the
one the 0.5B checkpoint uses via the GLOB_c512 factory).  All convs are NWC;
BatchNorm is inference-form.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sparktts_tpu.nn.layers import (
    batch_norm_apply,
    conv1d_apply,
    init_batch_norm,
    init_conv1d,
    init_linear,
    linear_apply,
)

RES2_SCALE = 8  # reference `ecapa_tdnn.py:166-174`


def _init_conv_relu_bn(key, cin, cout, k):
    return {"conv": init_conv1d(key, cin, cout, k), "bn": init_batch_norm(cout)}


def _conv_relu_bn_apply(p, x, padding=0, dilation=1):
    """conv → relu → bn (reference `ecapa_tdnn.py:89-108`)."""
    x = conv1d_apply(p["conv"], x, padding=padding, dilation=dilation)
    return batch_norm_apply(p["bn"], jax.nn.relu(x))


def _init_res2(key, channels, k):
    width = channels // RES2_SCALE
    nums = RES2_SCALE - 1
    keys = jax.random.split(key, nums)
    return {
        "convs": [init_conv1d(keys[i], width, width, k) for i in range(nums)],
        "bns": [init_batch_norm(width) for _ in range(nums)],
    }


def _res2_apply(p, x, padding, dilation):
    """Multi-scale res2 convolutions (reference `ecapa_tdnn.py:67-82`)."""
    width = x.shape[-1] // RES2_SCALE
    splits = [x[..., i * width : (i + 1) * width] for i in range(RES2_SCALE)]
    out = []
    sp = splits[0]
    for i, (conv, bn) in enumerate(zip(p["convs"], p["bns"])):
        if i >= 1:
            sp = sp + splits[i]
        sp = conv1d_apply(conv, sp, padding=padding, dilation=dilation)
        sp = batch_norm_apply(bn, jax.nn.relu(sp))
        out.append(sp)
    out.append(splits[-1])
    return jnp.concatenate(out, axis=-1)


def _init_se(key, channels, bottleneck=128):
    k1, k2 = jax.random.split(key)
    return {"l1": init_linear(k1, channels, bottleneck), "l2": init_linear(k2, bottleneck, channels)}


def _se_apply(p, x):
    """Squeeze-excite over time (reference `ecapa_tdnn.py:115-128`)."""
    s = jnp.mean(x, axis=1)  # (B, C)
    s = jax.nn.relu(linear_apply(p["l1"], s))
    s = jax.nn.sigmoid(linear_apply(p["l2"], s))
    return x * s[:, None, :]


def _init_se_res2_block(key, channels, k):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "in_conv": _init_conv_relu_bn(k1, channels, channels, 1),
        "res2": _init_res2(k2, channels, k),
        "out_conv": _init_conv_relu_bn(k3, channels, channels, 1),
        "se": _init_se(k4, channels),
    }


def _se_res2_block_apply(p, x, padding, dilation):
    """Residual SE-Res2 block (reference `ecapa_tdnn.py:135-149`)."""
    y = _conv_relu_bn_apply(p["in_conv"], x)
    y = _res2_apply(p["res2"], y, padding, dilation)
    y = _conv_relu_bn_apply(p["out_conv"], y)
    y = _se_apply(p["se"], y)
    return x + y


def init_astp(key, in_dim, bottleneck=128):
    """Attentive statistics pooling with global context
    (reference `pooling_layers.py:92-117`)."""
    k1, k2 = jax.random.split(key)
    return {
        "linear1": init_linear(k1, in_dim * 3, bottleneck),
        "linear2": init_linear(k2, bottleneck, in_dim),
    }


def astp_apply(p, x):
    """x: (B, T, F) → (B, 2F) attentive mean‖std (reference
    `pooling_layers.py:119-144`)."""
    mean = jnp.mean(x, axis=1, keepdims=True)
    # torch.var defaults to the UNBIASED estimator (correction=1) — matching
    # it matters: biased var here is a ~2% error at T≈40 frames
    var = jnp.var(x, axis=1, keepdims=True, ddof=1)
    std = jnp.sqrt(var + 1e-7)
    t = x.shape[1]
    x_in = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
    )
    alpha = jnp.tanh(linear_apply(p["linear1"], x_in))
    alpha = jax.nn.softmax(linear_apply(p["linear2"], alpha), axis=1)  # over time
    pooled_mean = jnp.sum(alpha * x, axis=1)
    pooled_var = jnp.sum(alpha * x * x, axis=1) - pooled_mean**2
    pooled_std = jnp.sqrt(jnp.clip(pooled_var, min=1e-7))
    return jnp.concatenate([pooled_mean, pooled_std], axis=-1)


def init_ecapa_tdnn(key, feat_dim: int, embed_dim: int, channels: int = 512, latent_dim: int = 1536):
    """GLOB_c512 topology (reference `ecapa_tdnn.py:152-189,242-250`).
    latent_dim is the hardcoded 512*3 of the reference (`ecapa_tdnn.py:177`),
    configurable here so tests can shrink the whole stack."""
    keys = jax.random.split(key, 8)
    out_channels = latent_dim
    return {
        "layer1": _init_conv_relu_bn(keys[0], feat_dim, channels, 5),
        "layer2": _init_se_res2_block(keys[1], channels, 3),
        "layer3": _init_se_res2_block(keys[2], channels, 3),
        "layer4": _init_se_res2_block(keys[3], channels, 3),
        "conv": init_conv1d(keys[4], channels * 3, out_channels, 1),
        "pool": init_astp(keys[5], out_channels),
        "bn": init_batch_norm(out_channels * 2),
        "linear": init_linear(keys[6], out_channels * 2, embed_dim),
    }


def ecapa_tdnn_apply(p, x) -> Tuple[jax.Array, jax.Array]:
    """x: (B, T, feat_dim) mels → (x_vector (B, embed_dim), latent (B, T, 1536))
    (reference `ecapa_tdnn.py:191-208` with return_latent=True)."""
    out1 = _conv_relu_bn_apply(p["layer1"], x, padding=2)
    out2 = _se_res2_block_apply(p["layer2"], out1, padding=2, dilation=2)
    out3 = _se_res2_block_apply(p["layer3"], out2, padding=3, dilation=3)
    out4 = _se_res2_block_apply(p["layer4"], out3, padding=4, dilation=4)

    out = jnp.concatenate([out2, out3, out4], axis=-1)
    latent = jax.nn.relu(conv1d_apply(p["conv"], out))
    pooled = batch_norm_apply(p["bn"], astp_apply(p["pool"], latent))
    x_vector = linear_apply(p["linear"], pooled)
    return x_vector, latent
