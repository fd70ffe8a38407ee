"""wav2vec2-large-xlsr-53 forward pass in JAX (hidden-state extractor).

TPU rebuild of the HF `Wav2Vec2Model` the reference uses as its semantic
feature extractor (reference `sparktts/models/audio_tokenizer.py:49-55,85-99`:
output_hidden_states=True, features = mean of hidden states 11/14/16).

xlsr-53 specifics honored here: layer-normed conv feature encoder
(feat_extract_norm="layer"), stable-layer-norm transformer encoder (pre-LN +
final LN), grouped weight-normed positional conv (k=128, groups=16, trailing
sample trimmed for even kernels).  hidden_states[i] is the INPUT to encoder
layer i (i = 0..23); index 24 is the final layer-normed output — matching HF's
indexing so the 11/14/16 mix is bit-comparable.

The conv frontend runs in fp32 (SURVEY.md §7.3: group/layer-norm conv
frontend is bf16-sensitive); the transformer may run in bf16.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sparktts_tpu.config import Wav2Vec2Config
from sparktts_tpu.nn.layers import (
    conv1d_apply,
    gelu,
    init_conv1d,
    init_layer_norm,
    init_linear,
    layer_norm_apply,
    linear_apply,
)


def init_wav2vec2(key, cfg: Wav2Vec2Config):
    n_convs = len(cfg.conv_dim)
    keys = jax.random.split(key, n_convs + cfg.num_hidden_layers + 4)

    conv_layers = []
    in_c = 1
    for i in range(n_convs):
        conv_layers.append(
            {
                "conv": init_conv1d(keys[i], in_c, cfg.conv_dim[i], cfg.conv_kernel[i], bias=cfg.conv_bias),
                "ln": init_layer_norm(cfg.conv_dim[i]),
            }
        )
        in_c = cfg.conv_dim[i]

    h = cfg.hidden_size
    layers = []
    for i in range(cfg.num_hidden_layers):
        k = keys[n_convs + i]
        ks = jax.random.split(k, 6)
        layers.append(
            {
                "ln1": init_layer_norm(h),
                "q": init_linear(ks[0], h, h),
                "k": init_linear(ks[1], h, h),
                "v": init_linear(ks[2], h, h),
                "o": init_linear(ks[3], h, h),
                "ln2": init_layer_norm(h),
                "ff_in": init_linear(ks[4], h, cfg.intermediate_size),
                "ff_out": init_linear(ks[5], cfg.intermediate_size, h),
            }
        )

    return {
        "conv_layers": conv_layers,
        "fp_ln": init_layer_norm(cfg.conv_dim[-1]),
        "fp_proj": init_linear(keys[-3], cfg.conv_dim[-1], h),
        "pos_conv": init_conv1d(
            keys[-2],
            h,
            h,
            cfg.num_conv_pos_embeddings,
            groups=cfg.num_conv_pos_embedding_groups,
        ),
        "layers": layers,
        "final_ln": init_layer_norm(h),
    }


def feature_lengths(cfg: Wav2Vec2Config, input_length: int) -> int:
    """Output frame count of the conv feature encoder for a given wav length."""
    length = input_length
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        length = (length - k) // s + 1
    return length


def _feature_encoder(p, wav: jax.Array, cfg: Wav2Vec2Config) -> jax.Array:
    """wav (B, T) → features (B, T', conv_dim[-1]); fp32."""
    x = wav.astype(jnp.float32)[..., None]  # (B, T, 1)
    for layer, k, s in zip(p["conv_layers"], cfg.conv_kernel, cfg.conv_stride):
        x = conv1d_apply(layer["conv"], x, stride=s)
        if cfg.feat_extract_norm == "layer":
            x = layer_norm_apply(layer["ln"], x, eps=cfg.layer_norm_eps)
        x = gelu(x)
    return x


def _pos_conv_embed(p, x: jax.Array, cfg: Wav2Vec2Config) -> jax.Array:
    """Grouped positional conv, same-pad with trailing trim for even kernels."""
    k = cfg.num_conv_pos_embeddings
    y = conv1d_apply(p["pos_conv"], x, padding=k // 2, groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        y = y[:, :-1, :]
    return gelu(y)


def _attention(layer, x: jax.Array, cfg: Wav2Vec2Config, mask_bias: Optional[jax.Array]) -> jax.Array:
    b, t, h = x.shape
    nh = cfg.num_attention_heads
    hd = h // nh
    q = linear_apply(layer["q"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3) * (hd**-0.5)
    k = linear_apply(layer["k"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    v = linear_apply(layer["v"], x).reshape(b, t, nh, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    if mask_bias is not None:
        scores = scores + mask_bias  # (B, 1, 1, T) additive -inf on pads
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, v).transpose(0, 2, 1, 3).reshape(b, t, h)
    return linear_apply(layer["o"], out)


def wav2vec2_hidden_states(
    p,
    wav: jax.Array,
    cfg: Wav2Vec2Config,
    feature_mask: Optional[jax.Array] = None,
) -> List[jax.Array]:
    """wav (B, T) → list of hidden states [(B, T', H)] with HF indexing.

    feature_mask: optional (B, T') bool, True for valid frames (only needed
    for padded batches).
    """
    feats = _feature_encoder(p, wav, cfg)
    x = layer_norm_apply(p["fp_ln"], feats, eps=cfg.layer_norm_eps)
    x = linear_apply(p["fp_proj"], x)

    mask_bias = None
    if feature_mask is not None:
        x = x * feature_mask[..., None].astype(x.dtype)
        mask_bias = jnp.where(feature_mask, 0.0, -1e9)[:, None, None, :]

    x = x + _pos_conv_embed(p, x, cfg)

    hidden_states = [x]
    for layer in p["layers"]:
        residual = x
        y = layer_norm_apply(layer["ln1"], x, eps=cfg.layer_norm_eps)
        x = residual + _attention(layer, y, cfg, mask_bias)
        y = layer_norm_apply(layer["ln2"], x, eps=cfg.layer_norm_eps)
        y = gelu(linear_apply(layer["ff_in"], y))
        x = x + linear_apply(layer["ff_out"], y)
        hidden_states.append(x)
    # HF indexing: entries 0..N-1 are inputs to layers 0..N-1; the final entry
    # is the layer-normed last output (it REPLACES the raw last output).
    hidden_states[-1] = layer_norm_apply(p["final_ln"], x, eps=cfg.layer_norm_eps)
    return hidden_states


def wav2vec2_features(
    p,
    wav: jax.Array,
    cfg: Wav2Vec2Config,
    feature_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """The reference's feature mix: mean of hidden_states[11, 14, 16]
    (reference `audio_tokenizer.py:94-97`)."""
    hs = wav2vec2_hidden_states(p, wav, cfg, feature_mask)
    mix = sum(hs[i] for i in cfg.hidden_state_mix) / len(cfg.hidden_state_mix)
    return mix


def normalize_input(wav: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Host-side Wav2Vec2FeatureExtractor do_normalize: per-utterance zero
    mean, unit variance (the reference's `processor(...)`,
    `audio_tokenizer.py:87-93`)."""
    mean = wav.mean(axis=-1, keepdims=True)
    var = wav.var(axis=-1, keepdims=True)
    return (wav - mean) / np.sqrt(var + eps)
