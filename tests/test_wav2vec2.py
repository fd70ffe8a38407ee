"""wav2vec2 parity: JAX forward vs HF transformers Wav2Vec2Model (random
weights, tiny xlsr-style config with stable layer norm)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sparktts_tpu import checkpoint as CKPT
from sparktts_tpu.config import Wav2Vec2Config
from sparktts_tpu.nn.wav2vec2 import (
    feature_lengths,
    normalize_input,
    wav2vec2_features,
    wav2vec2_hidden_states,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=32,
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        conv_bias=True,
        feat_extract_norm="layer",
        do_stable_layer_norm=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        layer_norm_eps=1e-5,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    model = Wav2Vec2Model(hf_cfg).eval()
    cfg = Wav2Vec2Config(
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=128,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        hidden_state_mix=(1, 2, 3),
    )
    params = CKPT.convert_wav2vec2(CKPT.torch_state_to_numpy(model), cfg)
    return model, cfg, params


def test_hidden_states_match_hf(hf_pair):
    model, cfg, params = hf_pair
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 2000)).astype(np.float32)

    with torch.no_grad():
        out = model(torch.from_numpy(wav), output_hidden_states=True)
    hs_ref = [h.numpy() for h in out.hidden_states]

    hs = wav2vec2_hidden_states(params, jnp.asarray(wav), cfg)
    assert len(hs) == len(hs_ref)
    for i, (a, b) in enumerate(zip(hs, hs_ref)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-3, atol=2e-4, err_msg=f"layer {i}")


def test_feature_mix_matches_hf(hf_pair):
    model, cfg, params = hf_pair
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((1, 3200)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(wav), output_hidden_states=True)
    ref = ((out.hidden_states[1] + out.hidden_states[2] + out.hidden_states[3]) / 3).numpy()
    mix = wav2vec2_features(params, jnp.asarray(wav), cfg)
    np.testing.assert_allclose(np.asarray(mix), ref, rtol=1e-3, atol=2e-4)


def test_feature_lengths(hf_pair):
    model, cfg, params = hf_pair
    for t in (400, 2000, 3217):
        wav = jnp.zeros((1, t))
        hs = wav2vec2_hidden_states(params, wav, cfg)
        assert hs[0].shape[1] == feature_lengths(cfg, t)


def test_normalize_input():
    rng = np.random.default_rng(2)
    wav = 3.0 + 2.0 * rng.standard_normal((2, 1000))
    normed = normalize_input(wav)
    np.testing.assert_allclose(normed.mean(axis=-1), 0.0, atol=1e-6)
    np.testing.assert_allclose(normed.std(axis=-1), 1.0, atol=1e-3)
