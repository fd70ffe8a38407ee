"""Checkpoint conversion: torch/safetensors state dicts → JAX pytrees.

One-time converters from the reference checkpoint layout (reference
`bicodec.py:69-111` safetensors, `cli/SparkTTS.py:48-49` HF LLM/wav2vec2) to
this package's channels-last functional params.  Conversions performed here so
the runtime graphs stay free of layout shims:

  * torch Linear (out, in)            → (in, out)
  * torch Conv1d (Cout, Cin/g, K)     → lax WIO (K, Cin/g, Cout)
  * torch ConvTranspose1d (Cin, Cout/g, K) → equivalent forward-conv WIO
    kernel for the lhs-dilated form (flip K, regroup channels)
  * weight_norm (g, v)                → folded plain weight (reference folds
    at load too: `bicodec.py:109` remove_weight_norm)
  * BatchNorm running stats           → inference-form params
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np

Array = np.ndarray
State = Dict[str, Array]


def load_safetensors(path: str | Path) -> State:
    from safetensors import numpy as st_numpy

    return dict(st_numpy.load_file(str(path)))


def torch_state_to_numpy(module) -> State:
    """Convert a torch module's state_dict to numpy (test helper)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# primitive converters
# ---------------------------------------------------------------------------


def t_linear(state: State, prefix: str) -> dict:
    p = {"w": state[f"{prefix}.weight"].T.copy()}
    if f"{prefix}.bias" in state:
        p["b"] = state[f"{prefix}.bias"].copy()
    return p


def t_conv1d(state: State, prefix: str) -> dict:
    p = {"w": np.ascontiguousarray(state[f"{prefix}.weight"].transpose(2, 1, 0))}
    if f"{prefix}.bias" in state:
        p["b"] = state[f"{prefix}.bias"].copy()
    return p


def _wn_weight(state: State, prefix: str, dim: int) -> Array:
    """Fold weight_norm g*v/||v|| (norm over all dims except `dim`)."""
    for g_key, v_key in (
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
        (
            f"{prefix}.parametrizations.weight.original0",
            f"{prefix}.parametrizations.weight.original1",
        ),
    ):
        if g_key in state:
            g, v = state[g_key], state[v_key]
            axes = tuple(i for i in range(v.ndim) if i != dim)
            norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
            return (g.astype(np.float64) / norm * v.astype(np.float64)).astype(v.dtype)
    return state[f"{prefix}.weight"]


def t_wn_conv1d(state: State, prefix: str, dim: int = 0) -> dict:
    w = _wn_weight(state, prefix, dim)
    p = {"w": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{prefix}.bias" in state:
        p["b"] = state[f"{prefix}.bias"].copy()
    return p


def convT_to_wio(w: Array, groups: int = 1) -> Array:
    """torch ConvTranspose1d weight → forward-conv WIO kernel (see
    `sparktts_tpu/nn/layers.py:conv_transpose1d_apply`)."""
    cin, cout_g, k = w.shape
    cin_g = cin // groups
    w = w.reshape(groups, cin_g, cout_g, k)[..., ::-1]
    w = w.transpose(3, 1, 0, 2).reshape(k, cin_g, groups * cout_g)
    return np.ascontiguousarray(w)


def t_conv_transpose1d(state: State, prefix: str, groups: int = 1) -> dict:
    p = {"w": convT_to_wio(state[f"{prefix}.weight"], groups)}
    if f"{prefix}.bias" in state:
        p["b"] = state[f"{prefix}.bias"].copy()
    return p


def t_wn_conv_transpose1d(state: State, prefix: str, groups: int = 1, dim: int = 1) -> dict:
    """Weight-normed ConvTranspose1d (torch weight_norm dim=1 ≡ per-out-channel
    for transposed convs is dim 1; DAC uses default dim=0 on the (Cin, Cout, K)
    tensor — caller passes the dim torch used)."""
    w = _wn_weight(state, prefix, dim)
    p = {"w": convT_to_wio(w, groups)}
    if f"{prefix}.bias" in state:
        p["b"] = state[f"{prefix}.bias"].copy()
    return p


def t_layer_norm(state: State, prefix: str) -> dict:
    return {"gamma": state[f"{prefix}.weight"].copy(), "beta": state[f"{prefix}.bias"].copy()}


def t_batch_norm(state: State, prefix: str) -> dict:
    return {
        "gamma": state[f"{prefix}.weight"].copy(),
        "beta": state[f"{prefix}.bias"].copy(),
        "mean": state[f"{prefix}.running_mean"].copy(),
        "var": state[f"{prefix}.running_var"].copy(),
    }


# ---------------------------------------------------------------------------
# wav2vec2
# ---------------------------------------------------------------------------


def convert_wav2vec2(state: State, cfg) -> dict:
    """HF Wav2Vec2Model state_dict → `sparktts_tpu.nn.wav2vec2` params."""
    n_convs = len(cfg.conv_dim)
    conv_layers = []
    for i in range(n_convs):
        pre = f"feature_extractor.conv_layers.{i}"
        layer = {"conv": t_conv1d(state, f"{pre}.conv")}
        if f"{pre}.layer_norm.weight" in state:
            layer["ln"] = t_layer_norm(state, f"{pre}.layer_norm")
        else:
            layer["ln"] = {"gamma": np.ones(cfg.conv_dim[i]), "beta": np.zeros(cfg.conv_dim[i])}
        conv_layers.append(layer)

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}"
        layers.append(
            {
                "ln1": t_layer_norm(state, f"{pre}.layer_norm"),
                "q": t_linear(state, f"{pre}.attention.q_proj"),
                "k": t_linear(state, f"{pre}.attention.k_proj"),
                "v": t_linear(state, f"{pre}.attention.v_proj"),
                "o": t_linear(state, f"{pre}.attention.out_proj"),
                "ln2": t_layer_norm(state, f"{pre}.final_layer_norm"),
                "ff_in": t_linear(state, f"{pre}.feed_forward.intermediate_dense"),
                "ff_out": t_linear(state, f"{pre}.feed_forward.output_dense"),
            }
        )

    return {
        "conv_layers": conv_layers,
        "fp_ln": t_layer_norm(state, "feature_projection.layer_norm"),
        "fp_proj": t_linear(state, "feature_projection.projection"),
        # HF uses weight_norm(conv, dim=2) for the positional conv
        "pos_conv": t_wn_conv1d(state, "encoder.pos_conv_embed.conv", dim=2),
        "layers": layers,
        "final_ln": t_layer_norm(state, "encoder.layer_norm"),
    }


# ---------------------------------------------------------------------------
# Qwen2.5 LM
# ---------------------------------------------------------------------------


def convert_qwen(state: State, cfg) -> dict:
    """HF Qwen2ForCausalLM state_dict → `sparktts_tpu.lm.qwen` params."""
    pfx = "model." if "model.embed_tokens.weight" in state else ""
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"{pfx}layers.{i}"
        layers.append(
            {
                "ln1": {"gamma": state[f"{pre}.input_layernorm.weight"].copy()},
                "q": t_linear(state, f"{pre}.self_attn.q_proj"),
                "k": t_linear(state, f"{pre}.self_attn.k_proj"),
                "v": t_linear(state, f"{pre}.self_attn.v_proj"),
                "o": t_linear(state, f"{pre}.self_attn.o_proj"),
                "ln2": {"gamma": state[f"{pre}.post_attention_layernorm.weight"].copy()},
                "gate": t_linear(state, f"{pre}.mlp.gate_proj"),
                "up": t_linear(state, f"{pre}.mlp.up_proj"),
                "down": t_linear(state, f"{pre}.mlp.down_proj"),
            }
        )
    params = {
        "embed": state[f"{pfx}embed_tokens.weight"].copy(),
        "layers": layers,
        "final_ln": {"gamma": state[f"{pfx}norm.weight"].copy()},
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in state:
        params["lm_head"] = t_linear(state, "lm_head")
    return params
