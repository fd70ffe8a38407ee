"""Up/down sampling block (reference `sparktts/modules/blocks/samper.py:22-100`).

Channels-last rebuild: the grouped (de)convs become depthwise NWC convs, the
repeat-interleave upsampler and avg-pool skip paths are cheap VPU reshapes
XLA fuses into the surrounding ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from sparktts_tpu.nn.layers import (
    conv1d_apply,
    conv_transpose1d_apply,
    init_conv1d,
    init_conv_transpose1d,
    leaky_relu,
)


def init_sampling_block(
    key,
    dim: int,
    groups: int = 1,
    upsample_scale: int = 1,
    downsample_scale: int = 1,
):
    p = {}
    if upsample_scale > 1:
        p["de_conv_upsampler"] = init_conv_transpose1d(
            key, dim, dim, kernel_size=upsample_scale * 2, groups=groups
        )
    if downsample_scale > 1:
        p["conv_downsampler"] = init_conv1d(
            key, dim, dim, kernel_size=2 * downsample_scale, groups=groups
        )
    return p


def repeat_upsample(x, scale: int):
    """(B, T, C) repeat-interleave along time (reference `samper.py:71-73`)."""
    b, t, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (b, t, scale, c)).reshape(b, t * scale, c)


def avg_pool_downsample(x, scale: int):
    """(B, T, C) avg-pool k=s stride=s (reference `samper.py:75-77`)."""
    b, t, c = x.shape
    t_out = t // scale
    return jnp.mean(x[:, : t_out * scale].reshape(b, t_out, scale, c), axis=2)


def sampling_block_apply(
    p,
    x,
    dim: int,
    groups: int,
    upsample_scale: int = 1,
    downsample_scale: int = 1,
):
    """x: (B, T, C) → (B, T * up / down, C) (reference `samper.py:79-100`)."""
    if upsample_scale > 1:
        repeat_res = repeat_upsample(x, upsample_scale)
        deconv_res = conv_transpose1d_apply(
            p["de_conv_upsampler"],
            leaky_relu(x, 0.2),
            stride=upsample_scale,
            padding=upsample_scale // 2 + upsample_scale % 2,
            output_padding=upsample_scale % 2,
            groups=groups,
        )
        upmerge_res = repeat_res + deconv_res
    else:
        upmerge_res = x
        repeat_res = x

    if downsample_scale > 1:
        conv_res = conv1d_apply(
            p["conv_downsampler"],
            leaky_relu(upmerge_res, 0.2),
            stride=downsample_scale,
            padding=downsample_scale // 2 + downsample_scale % 2,
            groups=groups,
        )
        skip2_res = avg_pool_downsample(upmerge_res, downsample_scale)
        skip1_res = avg_pool_downsample(repeat_res, downsample_scale)
    else:
        conv_res = upmerge_res
        skip2_res = upmerge_res
        skip1_res = repeat_res

    return conv_res + skip1_res + skip2_res
