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
    """HF Qwen2ForCausalLM state_dict → `sparktts_tpu.lm.qwen` params
    (layers stacked along a leading L dim for the scan-over-layers forward)."""
    import jax

    pfx = "model." if "model.embed_tokens.weight" in state else ""
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"{pfx}layers.{i}"
        q, k, v = (t_linear(state, f"{pre}.self_attn.{n}_proj") for n in ("q", "k", "v"))
        gate = t_linear(state, f"{pre}.mlp.gate_proj")
        up = t_linear(state, f"{pre}.mlp.up_proj")
        layers.append(
            {
                "ln1": {"gamma": state[f"{pre}.input_layernorm.weight"].copy()},
                "qkv": {
                    "w": np.concatenate([q["w"], k["w"], v["w"]], axis=1),
                    "b": np.concatenate([q["b"], k["b"], v["b"]]),
                },
                "o": t_linear(state, f"{pre}.self_attn.o_proj"),
                "ln2": {"gamma": state[f"{pre}.post_attention_layernorm.weight"].copy()},
                "gateup": {"w": np.concatenate([gate["w"], up["w"]], axis=1)},
                "down": t_linear(state, f"{pre}.mlp.down_proj"),
            }
        )
    params = {
        "embed": state[f"{pfx}embed_tokens.weight"].copy(),
        "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
        "final_ln": {"gamma": state[f"{pfx}norm.weight"].copy()},
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in state:
        params["lm_head"] = t_linear(state, "lm_head")
    return params


# ---------------------------------------------------------------------------
# BiCodec
# ---------------------------------------------------------------------------


def _t_conv1x1_as_linear(state: State, prefix: str, weight_normed: bool = False) -> dict:
    """1x1 Conv1d (possibly weight-normed) → linear params (in, out)."""
    w = _wn_weight(state, prefix, 0) if weight_normed else state[f"{prefix}.weight"]
    p = {"w": np.ascontiguousarray(w[:, :, 0].T)}
    if f"{prefix}.bias" in state:
        p["b"] = state[f"{prefix}.bias"].copy()
    return p


def _t_convnext_block(state: State, pre: str, conditioned: bool) -> dict:
    p = {
        "dwconv": t_conv1d(state, f"{pre}.dwconv"),
        "pwconv1": t_linear(state, f"{pre}.pwconv1"),
        "pwconv2": t_linear(state, f"{pre}.pwconv2"),
    }
    if conditioned:
        p["norm"] = {
            "scale": t_linear(state, f"{pre}.norm.scale"),
            "shift": t_linear(state, f"{pre}.norm.shift"),
        }
    else:
        p["norm"] = t_layer_norm(state, f"{pre}.norm")
    if f"{pre}.gamma" in state:
        p["gamma"] = state[f"{pre}.gamma"].copy()
    return p


def _t_vocos_backbone(state: State, pre: str, num_layers: int, conditioned: bool = False) -> dict:
    p = {
        "embed": t_conv1d(state, f"{pre}.embed"),
        "blocks": [
            _t_convnext_block(state, f"{pre}.convnext.{i}", conditioned)
            for i in range(num_layers)
        ],
        "final_layer_norm": t_layer_norm(state, f"{pre}.final_layer_norm"),
    }
    if conditioned:
        p["norm"] = {
            "scale": t_linear(state, f"{pre}.norm.scale"),
            "shift": t_linear(state, f"{pre}.norm.shift"),
        }
    else:
        p["norm"] = t_layer_norm(state, f"{pre}.norm")
    return p


def _t_sampling_block(state: State, pre: str, groups: int, upsample: bool) -> dict:
    """SamplingBlock: Sequential(LeakyReLU, (de)conv) → index 1 holds weights
    (reference `samper.py:44-69`).  No weight norm on these."""
    p = {}
    if upsample and f"{pre}.de_conv_upsampler.1.weight" in state:
        p["de_conv_upsampler"] = t_conv_transpose1d(state, f"{pre}.de_conv_upsampler.1", groups)
    if not upsample and f"{pre}.conv_downsampler.1.weight" in state:
        p["conv_downsampler"] = t_conv1d(state, f"{pre}.conv_downsampler.1")
    return p


def _t_feat_encoder(state: State, pre: str, cfg) -> dict:
    return {
        "encoder": _t_vocos_backbone(state, f"{pre}.encoder", cfg.vocos_num_layers),
        "downsample": [
            {
                "sampler": _t_sampling_block(state, f"{pre}.downsample.{j}.0", cfg.vocos_dim, False),
                "vocos": _t_vocos_backbone(state, f"{pre}.downsample.{j}.1", 2),
            }
            for j in range(len(cfg.sample_ratios))
        ],
        "project": t_linear(state, f"{pre}.project"),
    }


def _t_feat_decoder(state: State, pre: str, cfg) -> dict:
    conditioned = cfg.condition_dim is not None
    return {
        "linear_pre": t_linear(state, f"{pre}.linear_pre"),
        "upsample": [
            {
                "sampler": _t_sampling_block(state, f"{pre}.downsample.{j}.0", cfg.vocos_dim, True),
                "vocos": _t_vocos_backbone(state, f"{pre}.downsample.{j}.1", 2),
            }
            for j in range(len(cfg.sample_ratios))
        ],
        "vocos_backbone": _t_vocos_backbone(
            state, f"{pre}.vocos_backbone", cfg.vocos_num_layers, conditioned
        ),
        "linear": t_linear(state, f"{pre}.linear"),
    }


def _t_snake(state: State, key: str) -> dict:
    return {"alpha": state[key].reshape(-1).copy()}  # (1, C, 1) → (C,)


def _t_residual_unit(state: State, pre: str) -> dict:
    """ResidualUnit: block = Sequential(Snake, WNConv1d, Snake, WNConv1d)
    (reference `layers.py:51-60`)."""
    return {
        "snake1": _t_snake(state, f"{pre}.block.0.alpha"),
        "conv1": t_wn_conv1d(state, f"{pre}.block.1"),
        "snake2": _t_snake(state, f"{pre}.block.2.alpha"),
        "conv2": t_wn_conv1d(state, f"{pre}.block.3"),
    }


def _t_wave_generator(state: State, pre: str, cfg) -> dict:
    """WaveGenerator: model = [WNConv1d, DecoderBlock × n, Snake, WNConv1d,
    Tanh] (reference `wave_generator.py:56-85`).  DecoderBlock.block =
    [Snake, WNConvTranspose1d, ResidualUnit × 3]."""
    n_blocks = len(cfg.rates)
    blocks = []
    for i in range(n_blocks):
        bpre = f"{pre}.model.{1 + i}.block"
        blocks.append(
            {
                "snake": _t_snake(state, f"{bpre}.0.alpha"),
                "upsample": t_wn_conv_transpose1d(state, f"{bpre}.1", groups=1, dim=0),
                "res_units": [_t_residual_unit(state, f"{bpre}.{2 + r}") for r in range(3)],
            }
        )
    return {
        "conv_in": t_wn_conv1d(state, f"{pre}.model.0"),
        "blocks": blocks,
        "snake_out": _t_snake(state, f"{pre}.model.{n_blocks + 1}.alpha"),
        "conv_out": t_wn_conv1d(state, f"{pre}.model.{n_blocks + 2}"),
    }


def _t_fvq(state: State, pre: str, cfg) -> dict:
    p = {"codebook": state[f"{pre}.codebook.weight"].copy()}
    if cfg.input_dim != cfg.codebook_dim:
        p["in_project"] = _t_conv1x1_as_linear(state, f"{pre}.in_project", weight_normed=True)
        p["out_project"] = _t_conv1x1_as_linear(state, f"{pre}.out_project", weight_normed=True)
    return p


def _t_conv_relu_bn(state: State, pre: str) -> dict:
    return {"conv": t_conv1d(state, f"{pre}.conv"), "bn": t_batch_norm(state, f"{pre}.bn")}


def _t_se_res2_block(state: State, pre: str) -> dict:
    """SE_Res2Block: se_res2block = Sequential(Conv1dReluBn, Res2Conv1dReluBn,
    Conv1dReluBn, SE_Connect) (reference `ecapa_tdnn.py:135-146`)."""
    n_res2 = 7  # scale 8 → 7 convs (reference `ecapa_tdnn.py:47`)
    return {
        "in_conv": _t_conv_relu_bn(state, f"{pre}.se_res2block.0"),
        "res2": {
            "convs": [t_conv1d(state, f"{pre}.se_res2block.1.convs.{i}") for i in range(n_res2)],
            "bns": [t_batch_norm(state, f"{pre}.se_res2block.1.bns.{i}") for i in range(n_res2)],
        },
        "out_conv": _t_conv_relu_bn(state, f"{pre}.se_res2block.2"),
        "se": {
            "l1": t_linear(state, f"{pre}.se_res2block.3.linear1"),
            "l2": t_linear(state, f"{pre}.se_res2block.3.linear2"),
        },
    }


def _t_ecapa(state: State, pre: str) -> dict:
    return {
        "layer1": _t_conv_relu_bn(state, f"{pre}.layer1"),
        "layer2": _t_se_res2_block(state, f"{pre}.layer2"),
        "layer3": _t_se_res2_block(state, f"{pre}.layer3"),
        "layer4": _t_se_res2_block(state, f"{pre}.layer4"),
        "conv": t_conv1d(state, f"{pre}.conv"),
        "pool": {
            "linear1": _t_conv1x1_as_linear(state, f"{pre}.pool.linear1"),
            "linear2": _t_conv1x1_as_linear(state, f"{pre}.pool.linear2"),
        },
        "bn": t_batch_norm(state, f"{pre}.bn"),
        "linear": t_linear(state, f"{pre}.linear"),
    }


def _t_mhastp(state: State, pre: str, layer_num: int = 2, head_num: int = 2) -> dict:
    """MHASTP pooling (reference `pooling_layers.py:150-213`): per-head 1x1
    conv attention stacks → linears."""
    return {
        "heads": [
            [
                _t_conv1x1_as_linear(state, f"{pre}.heads_att_trans.{h}.att_{i}")
                for i in range(layer_num)
            ]
            for h in range(head_num)
        ]
    }


def _t_mqmhastp(
    state: State, pre: str, layer_num: int = 2, query_num: int = 2, head_num: int = 8
) -> dict:
    """MQMHASTP pooling (reference `pooling_layers.py:216-285`)."""
    return {
        "queries": [
            _t_mhastp(state, f"{pre}.n_query.{q}", layer_num, head_num)
            for q in range(query_num)
        ]
    }


def _t_perceiver(state: State, pre: str, depth: int) -> dict:
    p = {
        "latents": state[f"{pre}.latents"].copy(),
        "layers": [
            {
                "attn": {
                    "to_q": t_linear(state, f"{pre}.layers.{i}.0.to_q"),
                    "to_kv": t_linear(state, f"{pre}.layers.{i}.0.to_kv"),
                    "to_out": t_linear(state, f"{pre}.layers.{i}.0.to_out"),
                },
                # FeedForward = Sequential(Linear, GEGLU, Linear) → idx 0, 2
                "ff": {
                    "w1": t_linear(state, f"{pre}.layers.{i}.1.0"),
                    "w2": t_linear(state, f"{pre}.layers.{i}.1.2"),
                },
            }
            for i in range(depth)
        ],
        "norm": {"gamma": state[f"{pre}.norm.gamma"].copy()},
    }
    if f"{pre}.proj_context.weight" in state:
        p["proj_context"] = t_linear(state, f"{pre}.proj_context")
    return p


def _speaker_project_permuted(state: State, prefix: str, latent_dim: int, token_num: int) -> dict:
    """The reference flattens zq channel-first (latent, token); this package
    flattens (token, latent) — permute the Linear's input rows to match
    (see `sparktts_tpu/codec/speaker_encoder.py`)."""
    w = state[f"{prefix}.weight"].T  # (latent_dim * token_num, out) torch col order d*N+n
    out_dim = w.shape[1]
    w = w.reshape(latent_dim, token_num, out_dim).transpose(1, 0, 2).reshape(-1, out_dim)
    p = {"w": np.ascontiguousarray(w)}
    if f"{prefix}.bias" in state:
        p["b"] = state[f"{prefix}.bias"].copy()
    return p


def _t_speaker_encoder(state: State, pre: str, cfg) -> dict:
    p = {
        "speaker_encoder": _t_ecapa(state, f"{pre}.speaker_encoder"),
        "perceiver_sampler": _t_perceiver(state, f"{pre}.perceiver_sampler", cfg.perceiver_depth),
        "quantizer": {},
        "project": _speaker_project_permuted(
            state, f"{pre}.project", cfg.latent_dim, cfg.token_num
        ),
    }
    if len(cfg.fsq_levels) != cfg.latent_dim:
        p["quantizer"] = {
            "project_in": t_linear(state, f"{pre}.quantizer.project_in"),
            "project_out": t_linear(state, f"{pre}.quantizer.project_out"),
        }
    return p


def convert_bicodec(state: State, cfg) -> dict:
    """Reference BiCodec `model.safetensors` state_dict → params pytree
    (key layout per reference `bicodec.py:31-111` module tree)."""
    return {
        "encoder": _t_feat_encoder(state, "encoder", cfg.encoder),
        "quantizer": _t_fvq(state, "quantizer", cfg.quantizer),
        "speaker_encoder": _t_speaker_encoder(state, "speaker_encoder", cfg.speaker_encoder),
        "prenet": _t_feat_decoder(state, "prenet", cfg.prenet),
        "postnet": _t_feat_decoder(state, "postnet", cfg.postnet),
        "decoder": _t_wave_generator(state, "decoder", cfg.decoder),
    }


# ---------------------------------------------------------------------------
# converted-params cache (SURVEY.md §5.4: one-time converter + orbax cache)
# ---------------------------------------------------------------------------


def save_param_cache(cache_dir: str | Path, tree) -> None:
    """Persist a converted params pytree so subsequent loads skip the
    torch-layout conversion entirely."""
    import orbax.checkpoint as ocp

    path = Path(cache_dir).absolute()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ocp.PyTreeCheckpointer().save(str(path), tree)


def load_param_cache(cache_dir: str | Path):
    """Restore a previously saved params pytree (None if absent)."""
    import orbax.checkpoint as ocp

    path = Path(cache_dir).absolute()
    if not path.exists():
        return None
    return ocp.PyTreeCheckpointer().restore(str(path))
